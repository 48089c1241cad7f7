"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

A reader for MovieLens-shaped synthetic ratings, exposed as a real Spark
data source: ``spark.read.format("synthetic_ratings").option(...)``.
The reference's pipelines all start from ratings CSVs on HDFS
(splitting_data.py:13); this source generates the same shape on demand —
schema'd, seeded, and *partitioned*: each Spark task generates its own
id-range independently, so the source scales horizontally like a real
connector (no driver-side materialization, no single-file bottleneck).

Values are md5-derived from (seed, id) — the same portable-hash contract
as the rest of the engine — so any (seed, n_rows) pair yields identical
data on any cluster, partition count, or engine.

Usage::

    spark.dataSource.register(SyntheticRatingsDataSource)
    df = (spark.read.format("synthetic_ratings")
          .option("n_rows", 10000).option("seed", 42)
          .option("n_partitions", 8).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

RATINGS_DDL = "userId BIGINT, movieId BIGINT, rating DOUBLE, timestamp BIGINT"


def _h(seed: int, i: int, field: str) -> int:
    d = hashlib.md5(f"{seed}:{i}:{field}".encode()).hexdigest()
    return int(d[:15], 16)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRatingsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", max(self.n_rows // 20, 1)))
        self.n_movies = int(options.get("n_movies", max(self.n_rows // 50, 1)))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        per = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        s = self.seed
        for i in range(partition.start, partition.end):
            yield (
                _h(s, i, "u") % self.n_users,
                _h(s, i, "m") % self.n_movies,
                0.5 * (1 + (_h(s, i, "r") % 10)),   # 0.5 .. 5.0 in half-steps
                1_500_000_000 + (_h(s, i, "t") % 100_000_000),
            )


class SyntheticRatingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ratings"

    def schema(self) -> StructType | str:
        return RATINGS_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticRatingsReader(self.options)
