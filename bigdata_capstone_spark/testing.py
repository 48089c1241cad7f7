"""Local replica of the driver's DuckDB-oracle correctness gate.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same Parquet, then compares row-count + schema +
order-insensitive value-hash. This module reproduces that comparison so the
test suite catches mismatches (float drift, tie nondeterminism, TZ skew,
alias typos) before a round is submitted.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from bigdata_capstone_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the ten test tables registered as views (the
    driver's pre-registered-view contract, __spark_entry__.py:33-35)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns (order-insensitive)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort", na_position="last")
    return pdf.reset_index(drop=True)


def _values_equal(a, b, rel_tol: float, abs_tol: float) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=rel_tol, abs_tol=abs_tol)
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=abs_tol)
        except (TypeError, ValueError):
            return False
    return a == b


def compare_frames(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    rel_tol: float = 0.0,
    abs_tol: float = 0.0,
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match).

    Defaults to BIT-EXACT comparison: the driver's gate is a value hash,
    so any tolerance here would hide failures the driver will flag. The
    determinism contract (decimal sums, pre-rank rounding, PRF hashes)
    makes exactness achievable; pass tolerances only for known
    order-dependent diagnostics.

    HARD INVARIANT for catalog queries — round BEFORE any double
    aggregation whose accumulation order is engine-dependent: a double
    that is averaged (e.g. avg of per-pair correlations, avg of per-user
    metrics) must be ``round(x, 6)``-ed at the per-row stage, so both
    engines average the SAME 6-decimal values and the final avg differs
    by at most n·ulp — far below the 6-decimal output rounding. Rounding
    only the final avg is NOT safe: a value landing within float-sum
    drift of a 0.5e-6 boundary would flake the gate nondeterministically.
    Exact (decimal) sums need no rounding; plain double sums/avgs do.
    """
    problems: list[str] = []
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"column sets differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row counts differ: spark={len(a)} oracle={len(b)}"]
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, bv))
            if not _values_equal(x, y, rel_tol, abs_tol)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {col!r}: {len(bad)}/{len(av)} values differ; "
                f"first at sorted row {i}: spark={x!r} oracle={y!r}"
            )
    return problems


def check_query_against_oracle(
    spark_df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
    rel_tol: float = 0.0,
    abs_tol: float = 0.0,
) -> list[str]:
    """Run the oracle SQL on DuckDB and diff against the Spark result."""
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.sql(oracle_sql).df()
    finally:
        con.close()
    spark_pdf = spark_df.toPandas()
    return compare_frames(spark_pdf, oracle_pdf, rel_tol=rel_tol, abs_tol=abs_tol)
