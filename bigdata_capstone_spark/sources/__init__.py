"""Sources & sinks (SURVEY §2.1 S1-S5).

The reference read CSVs with ``inferSchema=True`` (an extra full scan per
read, splitting_data.py:13 et al.). Here every table has an explicit
``StructType`` and Parquet is the default format so Catalyst gets pushdown
and pruning for free and no inference job ever runs.
"""

from bigdata_capstone_spark.sources.tables import (
    TABLE_NAMES,
    TABLE_SCHEMAS,
    load_table,
    load_tables,
    read_csv,
    register_views,
)
from bigdata_capstone_spark.sources.sinks import write_csv, write_parquet
from bigdata_capstone_spark.sources.ratings import synthetic_ratings

__all__ = [
    "TABLE_NAMES",
    "TABLE_SCHEMAS",
    "load_table",
    "load_tables",
    "read_csv",
    "register_views",
    "write_csv",
    "write_parquet",
    "synthetic_ratings",
]
