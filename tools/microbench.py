"""Micro-bench: time a named subset of registry queries, n times each.

Usage: python tools/microbench.py q1,q2[,q3...] [n_runs]

Same measurement discipline as bench.py (noop sink, clearCache + GC
between queries, warm-up job first) but scoped to the named queries so
an A/B across git trees is cheap. Prints one JSON line with medians AND
raw samples (bisects need the spread, not just the median).

Runs against $SPARK_GRAFT_SF_DIR (default sf0.1). Never writes
BENCH_LOCAL_* — this is an adjudication tool, not the record.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bigdata_capstone_spark.catalog import QUERIES  # noqa: E402
from bigdata_capstone_spark.session import build_session  # noqa: E402


def main() -> int:
    names = [s for s in sys.argv[1].split(",") if s]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = build_session(app_name="microbench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").collect()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for run in range(n_runs):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            samples[name].append(dt)
            print(f"# run{run + 1} {name}: {dt}s", file=sys.stderr, flush=True)
            spark.catalog.clearCache()
            spark._jvm.System.gc()

    print(
        json.dumps(
            {
                "medians": {
                    n: round(statistics.median(v), 3)
                    for n, v in samples.items()
                },
                "samples": samples,
                "sf_dir": sf_dir,
                "runs": n_runs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
