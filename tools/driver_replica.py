"""Replica of the external driver: smoke entry(), then run every
queries() entry at sf0.01 and hash-compare against oracle_sql() via DuckDB.

Usage: python tools/driver_replica.py [sf_dir] [name_substring ...]
Prints one line per query: OK / MISMATCH / ROWS-ONLY / ERROR. Extra args
filter the query set (substring match) for cheap single-query iteration.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    # Adversarial-session knobs (SCALE.md "Adversarial-session invariance"):
    #   REPLICA_TZ_POISON=America/New_York  - poison session TZ before EVERY
    #       query; each builder must re-pin UTC itself (ensure_utc)
    #   REPLICA_SHUFFLE=7   - odd, small shuffle partition count; surfaces
    #       any reduction-order / partition-count dependence
    #   REPLICA_THREADS=16  - different parallelism than the default 32
    tz_poison = os.environ.get("REPLICA_TZ_POISON")
    threads = os.environ.get(
        "REPLICA_THREADS", os.environ.get("SPARK_GRAFT_CPUS", "*")
    )

    # deliberately a plain session (driver won't use our build_session)
    builder = (
        SparkSession.builder.master(f"local[{threads}]")
        .appName("driver_replica")
    )
    if os.environ.get("REPLICA_SHUFFLE"):
        builder = builder.config(
            "spark.sql.shuffle.partitions", os.environ["REPLICA_SHUFFLE"]
        )
    # REPLICA_DRIVER_MEM: the plain session defaults to a 1g driver heap
    # (matching the external driver, which only runs sf0.01); larger SFs
    # need more, e.g. REPLICA_DRIVER_MEM=8g for the sf0.1 invariance run.
    if os.environ.get("REPLICA_DRIVER_MEM"):
        builder = builder.config(
            "spark.driver.memory", os.environ["REPLICA_DRIVER_MEM"]
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from bigdata_capstone_spark.testing import check_query_against_oracle

    t0 = time.time()
    rows = entrymod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s  schema OK")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if len(sys.argv) > 2:
        pats = sys.argv[2:]
        queries = {
            n: f for n, f in queries.items() if any(p in n for p in pats)
        }
    failures = 0
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            if tz_poison:
                spark.conf.set("spark.sql.session.timeZone", tz_poison)
            df = fn(spark, sf_dir)
            if name in oracles:
                problems = check_query_against_oracle(df, oracles[name], sf_dir)
                status = "OK" if not problems else f"MISMATCH: {problems}"
                failures += bool(problems)
            else:
                n = df.count()
                status = f"ROWS-ONLY ({n} rows)"
        except Exception as exc:  # driver records errors per query
            status = f"ERROR: {type(exc).__name__}: {exc}"
            failures += 1
        # Session-scoped caches are per-query state here: the full
        # registry (171 queries) accumulates cached intermediates in the
        # plain 1g heap until GC thrashes (observed: GCLocker OOM inside
        # a localCheckpoint at query ~40, killing the executor pool and
        # cascading RejectedExecution "failures" into every later
        # query). The external driver runs only the ~50 pinned keys, so
        # it never reaches that pressure; clearing between queries keeps
        # the replica's per-query behavior identical (each builder
        # repopulates its own caches) while bounding heap at one query's
        # working set.
        spark.catalog.clearCache()
        print(f"{name:40s} {time.time()-t0:6.1f}s  {status}")
    print(f"\n{len(queries)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
