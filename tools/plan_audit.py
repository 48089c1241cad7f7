"""Physical-plan hygiene audit (SURVEY §4; north-star scale posture).

For each headline query, prints the formatted plan and greps for the
properties that matter at 100 TB:

- PushedFilters reaching the parquet scan (predicate pushdown)
- ReadSchema narrower than the table (column pruning)
- BroadcastHashJoin where a dimension table is joined (no shuffle)
- WholeStageCodegen coverage (JVM-side execution, no Python in hot path)

Usage: python tools/plan_audit.py [--scans] [sf_dir] [query ...]

``--scans`` (anywhere in argv) runs the registry-wide duplicate-scan
audit instead of the headline plan audit.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from bigdata_capstone_spark.catalog import QUERIES  # noqa: E402
from bigdata_capstone_spark.session import build_session  # noqa: E402


def audit(name: str, plan: str) -> list[str]:
    notes = []
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nonempty = [p for p in pushed if p.strip()]
    if pushed:
        # NOTE: counts TEXTUAL scan nodes, which includes the child-plan
        # descriptions embedded in InMemoryRelation (cached frames) — a
        # query whose branches share a cached frame shows every branch's
        # lineage here but executes the parquet read once per cache
        # materialization. Cross-check with the InMemoryRelation count
        # before treating a high number as scan amplification.
        notes.append(f"scans={len(pushed)} pushed_filters={len(nonempty)}")
    # emitted unconditionally: a plan whose scans are ALL behind
    # InMemoryRelation has no PushedFilters line, and the cache count is
    # exactly the signal that explains the missing scan count
    notes.append(f"cached_relations={plan.count('InMemoryRelation')}")
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if reads:
        widths = [len(r.split(",")) for r in reads]
        notes.append(f"read_widths={widths}")
    notes.append(f"broadcast_joins={plan.count('BroadcastHashJoin')}")
    notes.append(f"smj={plan.count('SortMergeJoin')}")
    notes.append(f"exchanges={plan.count('Exchange')}")
    # formatted mode omits codegen markers; caller passes the simple-mode
    # plan separately as `plan_simple` via the "\n--simple--\n" separator
    codegen_ids = set(re.findall(r"\*\((\d+)\)", plan))
    notes.append(f"codegen_stages={len(codegen_ids)}")
    if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
        notes.append("!! PYTHON-IN-PLAN")
    return notes


def duplicate_scans(qe, jvm) -> dict[str, int]:
    """Parquet relations appearing MORE THAN ONCE as leaves of the
    optimized plan (post cache substitution — cached frames show up as
    InMemoryRelation, so their population recipe is not double-counted).
    A table listed here is physically scanned N times by one query: either
    cache the shared derivation (see round-4 scan-dedup commit) or confirm
    the second scan is inherent (e.g. a threshold computed over the same
    table that then filters it)."""
    leaves = qe.optimizedPlan().collectLeaves()
    counts: dict[str, int] = {}
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        cls = leaf.getClass().getSimpleName()
        if cls != "LogicalRelation":
            continue
        try:
            paths = leaf.relation().location().rootPaths()
            key = paths.apply(0).toString().rsplit("/", 1)[-1]
        except Exception:
            key = cls
        counts[key] = counts.get(key, 0) + 1
    return {k: v for k, v in counts.items() if v > 1}


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--scans"]
    scans_mode = len(argv) != len(sys.argv) - 1
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or HEADLINE
    if scans_mode:
        # registry-wide duplicate-scan audit
        spark = build_session(app_name="plan_audit_scans")
        for name in sorted(QUERIES):
            try:
                df = QUERIES[name](spark, sf_dir)
                dups = duplicate_scans(
                    df._jdf.queryExecution(), spark._jvm
                )
            except Exception as exc:
                print(f"{name:40s} ERROR {type(exc).__name__}")
                continue
            if dups:
                print(f"{name:40s} {dups}")
            spark.catalog.clearCache()
        return 0
    spark = build_session(app_name="plan_audit")
    verbose = os.environ.get("PLAN_AUDIT_VERBOSE") == "1"
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        plan = qe.explainString(mode.fromString("formatted"))
        plan += "\n--simple--\n" + qe.explainString(mode.fromString("simple"))
        print(f"\n=== {name} ===")
        print("  " + "  ".join(audit(name, plan)))
        if verbose:
            print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
