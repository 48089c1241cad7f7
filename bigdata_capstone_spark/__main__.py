"""Command-line entry point.

    python -m bigdata_capstone_spark list
    python -m bigdata_capstone_spark run <query> [--sf-dir DIR] [--limit N]
    python -m bigdata_capstone_spark explain <query> [--sf-dir DIR]
    python -m bigdata_capstone_spark sql "SELECT ..." [--sf-dir DIR]

Gives the catalog a usable face: run any registered query against a
test-data directory, print its physical plan, or run ad-hoc SQL over the
registered table views — the replacement for the reference's five
edit-and-rerun driver scripts.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bigdata_capstone_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (* = DuckDB oracle)")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)

    p = sub.add_parser("sql", help="ad-hoc SQL over the registered views")
    p.add_argument("statement")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    from bigdata_capstone_spark.catalog import ORACLE_SQL, QUERIES, register_views
    from bigdata_capstone_spark.session import build_session

    if args.cmd == "list":
        for name in sorted(QUERIES):
            mark = "*" if name in ORACLE_SQL else " "
            print(f"{mark} {name}")
        return 0

    spark = build_session(app_name=f"cli:{args.cmd}")
    try:
        if args.cmd == "sql":
            register_views(spark, args.sf_dir)
            spark.sql(args.statement).show(args.limit, truncate=False)
            return 0
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
