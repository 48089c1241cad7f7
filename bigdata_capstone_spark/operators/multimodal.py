"""Multimodal (image/audio/video) column plumbing (north star; BASELINE.json).

Media assets are opaque ``binary`` columns + typed metadata structs; all
heavy per-asset work runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through the driver and never become Python objects row-by-row.

The decode kernels themselves are STUBBED — this container ships no
image/audio codecs — behind :data:`DECODERS`. ``deterministic_fake``
produces a stable feature vector from the md5 of the bytes (so tests can
assert end-to-end plumbing: schema, batching, partitioning, join-back),
and ``strict`` raises NotImplementedError at the point a real codec
(Pillow/torchaudio/ffmpeg) would be called on a cluster image.

Scale notes: assets are large blobs — partition by size not count
(``maxPartitionBytes``), keep metadata in a separate narrow table joined
by asset_id so planning/filtering never touches bytes, and push filters
(mime/type/size) onto the metadata table before the decode stage runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(data: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-dim pseudo-feature vector from
    md5("{i}:" + hex(bytes)).

    Stands in for a real decode→embed kernel; stable across runs/engines so
    the distributed plumbing is testable without codecs. Hashing the HEX
    encoding of the payload (rather than the raw bytes) is deliberate:
    SQL engines' md5() typically takes strings, so the kernel output is
    reproducible as ``md5(i || ':' || lower(hex(media)))`` — which lets the
    driver hash-compare the whole mapInPandas pipeline against a DuckDB
    oracle instead of a weaker rows-only check.
    """
    hx = data.hex().encode()
    out = []
    for i in range(FEATURE_DIM):
        h = hashlib.md5(f"{i}:".encode() + hx).digest()
        out.append(int.from_bytes(h[:4], "big") / 2**32 - 0.5)
    return out


def _strict_decode(data: bytes) -> list[float]:
    raise NotImplementedError(
        "media decode requires codec libraries (Pillow/torchaudio/ffmpeg) "
        "not present in this container; install them on the cluster image "
        "and register a real kernel in DECODERS"
    )


DECODERS = {
    "deterministic_fake": _fake_features,
    "strict": _strict_decode,
}


def synthetic_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Small deterministic asset table (binary payloads derived from md5)
    for exercising the plumbing."""
    rows = []
    for i in range(n):
        blob = hashlib.md5(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        # every 3rd asset is a "video" with a deterministic duration so the
        # frame-sampling planner has real fan-out to cost
        is_video = i % 3 == 0
        rows.append(
            (
                i,
                bytearray(blob),
                "video/fake" if is_video else "image/fake",
                8 + i % 32,
                8 + (i * 3) % 32,
                500 * (1 + i % 9) if is_video else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def extract_features(
    assets: DataFrame, decoder: str = "deterministic_fake", batch_size_hint: int = 256
) -> DataFrame:
    """Decode/feature-extract each asset via Arrow-batched mapInPandas.

    The UDF sees pandas batches of (asset_id, media); bytes stay in Arrow
    buffers between JVM and Python. Output is the narrow FEATURES_SCHEMA —
    blobs are dropped as early as possible.
    """
    kernel = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(bytes(b)) if b is not None else None for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["media"]],
                    "features": feats,
                }
            )

    return assets.select("asset_id", "media").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) the decode
    stage would extract — metadata-only, no bytes touched, so the expensive
    stage's fan-out is known (and costable) before any decoding."""
    return (
        assets.filter(F.col("duration_ms").isNotNull())
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def resize_targets(
    assets: DataFrame, max_dim: int = 224
) -> DataFrame:
    """Resize *planning* (aspect-preserving fit into max_dim×max_dim):
    target dimensions are pure JVM arithmetic over the metadata columns —
    no bytes touched, no Python. The pixel work itself belongs in the
    decode kernel (``extract_features``); planning separately lets the
    expensive stage be filtered/costed first (e.g. skip assets already
    small enough)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest(F.col("width"), F.col("height")),
    )

    # explicit HALF-UP via floor(x + 0.5): engines disagree on round(DOUBLE)
    # midpoint direction, floor does not — keeps the plan oracle-replayable
    def half_up(c):
        return F.floor(c + F.lit(0.5)).cast("int")

    return assets.filter(
        F.col("width").isNotNull() & F.col("height").isNotNull()
    ).select(
        "asset_id",
        "width",
        "height",
        F.greatest(half_up(F.col("width") * scale), F.lit(1)).alias(
            "target_width"
        ),
        F.greatest(half_up(F.col("height") * scale), F.lit(1)).alias(
            "target_height"
        ),
        (scale < 1.0).alias("needs_resize"),
    )


def shard_packing_plan(
    assets: DataFrame,
    budget_bytes: int,
    id_col: str = "asset_id",
    bytes_col: str = "n_bytes",
    seed: int = 13,
) -> DataFrame:
    """WebDataset-style shard packing *plan*: assets are laid out in a
    deterministic PRF order and packed CONTIGUOUSLY into byte-budgeted
    shards — ``shard = floor(bytes_before_me / budget)``, so an asset that
    straddles a budget boundary belongs to the shard where it started
    (streaming first-fit, same contract as ``textops.pack_sequences``).
    Metadata-only: the plan costs one window over (id, n_bytes); the
    byte-moving write stage consumes it afterwards, already knowing every
    shard's exact membership and size.

    Scale shape: the global PRF-ordered running sum is the one
    sort+window; at 100 TB pre-split by a PRF super-shard first (exactly
    like pack_sequences' n_shards dial) so each window partition is
    bounded, then pack within super-shards — contiguity within a
    super-shard is preserved and no coordination crosses them.
    """
    from bigdata_capstone_spark.functions.portable import salted_md5_long
    from pyspark.sql.window import Window

    h = salted_md5_long(F.col(id_col).cast("string"), seed)
    before = (
        Window.orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        assets.withColumn("__h", h)
        .withColumn(
            "__before",
            F.coalesce(F.sum(bytes_col).over(before), F.lit(0)).cast("long"),
        )
        .withColumn(
            "shard", F.floor(F.col("__before") / budget_bytes).cast("int")
        )
    )
    pos = Window.partitionBy("shard").orderBy("__h", id_col)
    return packed.withColumn(
        "pos", F.row_number().over(pos).cast("int")
    ).select(id_col, "shard", "pos", bytes_col)
