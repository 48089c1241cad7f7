"""Every SQL-expressible catalog query must match its DuckDB oracle.

This mirrors the driver's t2 correctness gate (row-count + schema +
order-insensitive values) at sf0.001 for speed; the driver runs sf0.01.
Set SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 to run at driver scale.
"""

from __future__ import annotations

import os

import pytest

from bigdata_capstone_spark.catalog import ORACLE_SQL, QUERIES
from bigdata_capstone_spark.testing import check_query_against_oracle

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    problems = check_query_against_oracle(df, ORACLE_SQL[name], SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.slow  # whole-registry smoke (~10 min): the per-query
# oracle suite above already executes every oracle-backed entry
def test_all_queries_return_rows(spark):
    """Rows-only smoke for every registered query (including non-oracle'd)."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_driver_pinned_keys_all_registered():
    """The external driver replays a pinned set of query keys each round
    (the CORRECTNESS_r* files record them): every pinned key must
    resolve in queries(), or the driver records an unresolvable-key
    failure we would never see locally. (Round 4 nearly shipped exactly
    that by retiring embedding_ann_ivf.)"""
    import glob
    import json

    from bigdata_capstone_spark.catalog import QUERIES

    pinned: set[str] = set()
    for path in glob.glob("CORRECTNESS_r*.json"):
        pinned.update(json.load(open(path)).keys())
    assert pinned, "no CORRECTNESS files found (driver not yet run?)"
    missing = sorted(k for k in pinned if k not in QUERIES)
    assert not missing, f"pinned driver keys missing from registry: {missing}"
