"""bigdata_capstone_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of ``bellaachang/bigdata-capstone`` (see SURVEY.md), packaged
as a reusable operator library:

- ``sources``   — schema'd Parquet/CSV readers and sinks (SURVEY §2.1)
- ``operators`` — relational core, grouped statistics, splits, recommenders,
  ranking metrics, similarity/dedup, text analysis (SURVEY §2.2-2.9)
- ``functions`` — portable column expressions (engine-agnostic hashing,
  exact decimal sums, cosine similarity) shared by operators and oracles
- ``plans``     — physical-plan hygiene helpers (pushdown/broadcast asserts)
- ``streaming`` — event-time windowing, batch and Structured Streaming

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, and join selection; Python UDFs are avoided on hot paths.
"""

from bigdata_capstone_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
