"""Portable column expressions shared by operators and their DuckDB oracles."""

from bigdata_capstone_spark.functions.portable import (
    MD5_LONG_MAX,
    cosine_similarity_col,
    dot_product_col,
    exact_avg,
    exact_sum,
    md5_long,
    md5_long_sql,
    salted_md5_long,
    salted_md5_long_sql,
)

__all__ = [
    "MD5_LONG_MAX",
    "cosine_similarity_col",
    "dot_product_col",
    "exact_avg",
    "exact_sum",
    "md5_long",
    "md5_long_sql",
    "salted_md5_long",
    "salted_md5_long_sql",
]
