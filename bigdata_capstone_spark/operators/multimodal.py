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


def _pixel_features(w: int, h: int, pixels: list[tuple[int, int, int]]) -> list[float]:
    """FEATURE_DIM-dim feature vector from decoded RGB pixels (row-major).

    All statistics accumulate in exact integers before one final float
    division, so the vector is bit-deterministic across platforms:
    [w, h, mean_rgb×3, first_pixel×3, last_pixel×3, min/max/mean gray,
    var_gray, n_pixels] — first/last pixel exposure is what lets tests
    value-check the decode against the raw image bytes.
    """
    if w <= 0 or h <= 0:
        # w=0 / h=0 headers are syntactically valid PPM/BMP; fail with the
        # loud ValueError the strict decoder promises, not ZeroDivisionError
        raise ValueError(f"zero-pixel image: {w}x{h}")
    n = len(pixels)
    sr = sum(p[0] for p in pixels)
    sg = sum(p[1] for p in pixels)
    sb = sum(p[2] for p in pixels)
    grays = [p[0] + p[1] + p[2] for p in pixels]  # 0..765 ints
    sgray = sum(grays)
    s2gray = sum(g * g for g in grays)
    var = (s2gray / n) - (sgray / n) ** 2
    return [
        float(w),
        float(h),
        sr / n / 255.0,
        sg / n / 255.0,
        sb / n / 255.0,
        pixels[0][0] / 255.0,
        pixels[0][1] / 255.0,
        pixels[0][2] / 255.0,
        pixels[-1][0] / 255.0,
        pixels[-1][1] / 255.0,
        pixels[-1][2] / 255.0,
        min(grays) / 765.0,
        max(grays) / 765.0,
        sgray / n / 765.0,
        var / (765.0 * 765.0),
        float(n),
    ]


def _ppm_features(data: bytes) -> list[float]:
    """REAL image decode: binary PPM (P6, maxval 255) — the one raster
    format parseable with zero codec dependencies. Header tokens may be
    separated by any whitespace/comments per the netpbm spec."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval (comments start '#')
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} != 255 unsupported")
    raster = data[i : i + 3 * w * h]
    if len(raster) != 3 * w * h:
        raise ValueError("truncated PPM raster")
    pixels = [
        (raster[3 * p], raster[3 * p + 1], raster[3 * p + 2])
        for p in range(w * h)
    ]
    return _pixel_features(w, h, pixels)


def _bmp_features(data: bytes) -> list[float]:
    """REAL image decode: uncompressed 24-bit BI_RGB BMP (the Windows
    default). Rows are stored bottom-up, BGR, padded to 4 bytes — decoded
    here to the same row-major RGB pixel list as the PPM path, so the
    same image in either container yields the identical feature vector
    (asserted in tests)."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    pixels = []
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = off + src_row * stride
        for x in range(w):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            pixels.append((r, g, b))
    return _pixel_features(w, h, pixels)


def _strict_decode(data: bytes) -> list[float]:
    """Decode REAL formats implementable without codec libraries (binary
    PPM, uncompressed 24-bit BMP); raise for anything needing Pillow/
    torchaudio/ffmpeg — strict mode turns a silently-fake feature into a
    loud error on a cluster missing codecs."""
    if data.startswith(b"P6"):
        return _ppm_features(data)
    if data.startswith(b"BM"):
        return _bmp_features(data)
    raise NotImplementedError(
        "media decode beyond PPM/BMP requires codec libraries "
        "(Pillow/torchaudio/ffmpeg) not present in this container; "
        "install them on the cluster image and register a real kernel "
        "in DECODERS"
    )


DECODERS = {
    "deterministic_fake": _fake_features,
    "ppm": _ppm_features,
    "bmp": _bmp_features,
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


def synthetic_ppm_assets(
    spark: SparkSession, n: int = 16, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL binary PPM (P6) images with
    deterministic md5-derived pixels — the fixture for the strict-mode
    decode path (no codec library needed to parse P6)."""
    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 4
        raster = bytearray()
        for p in range(w * h):
            raster += hashlib.md5(f"{seed}:{i}:{p}".encode()).digest()[:3]
        blob = f"P6\n{w} {h}\n255\n".encode() + bytes(raster)
        rows.append((i, bytearray(blob), "image/x-portable-pixmap", w, h, None))
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
    num_partitions: int = 32,
) -> DataFrame:
    """WebDataset-style shard packing *plan*: assets are laid out in a
    deterministic PRF order and packed CONTIGUOUSLY into byte-budgeted
    shards — ``shard = floor(bytes_before_me / budget)``, so an asset that
    straddles a budget boundary belongs to the shard where it started
    (streaming first-fit, same contract as ``textops.pack_sequences``).
    Metadata-only: the plan costs one prefix sum over (id, n_bytes); the
    byte-moving write stage consumes it afterwards, already knowing every
    shard's exact membership and size.

    Scale shape: the global PRF-ordered running sum is a DISTRIBUTED
    prefix sum (``relational.partitioned_prefix_sum``: range-partitioned
    slices + broadcast slice offsets), NOT a single-partition window — so
    the GLOBAL contiguous packing semantics survive unchanged at any asset
    count; ``num_partitions`` bounds the per-task sort. This supersedes
    the earlier super-shard design (which bounded the window by giving up
    cross-super-shard contiguity): exact byte sums make the distributed
    prefix bit-identical to the sequential layout, so no semantics trade
    is needed. The per-shard ``pos`` window is partitioned by shard —
    bounded by budget/min-asset-size rows per partition.
    """
    from bigdata_capstone_spark.functions.portable import salted_md5_long
    from bigdata_capstone_spark.operators.relational import (
        partitioned_prefix_sum,
    )
    from pyspark.sql.window import Window

    h = salted_md5_long(F.col(id_col).cast("string"), seed)
    packed = partitioned_prefix_sum(
        assets.withColumn("__h", h),
        [F.col("__h"), F.col(id_col)],
        F.col(bytes_col).cast("long"),
        "__before",
        num_partitions=num_partitions,
        inclusive=False,
    ).withColumn(
        "shard", F.floor(F.col("__before") / budget_bytes).cast("int")
    )
    pos = Window.partitionBy("shard").orderBy("__h", id_col)
    return packed.withColumn(
        "pos", F.row_number().over(pos).cast("int")
    ).select(id_col, "shard", "pos", bytes_col)
