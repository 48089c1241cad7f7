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

    # deliberately a plain session (driver won't use our build_session)
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .appName("driver_replica")
        .getOrCreate()
    )
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
        print(f"{name:40s} {time.time()-t0:6.1f}s  {status}")
    print(f"\n{len(queries)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
