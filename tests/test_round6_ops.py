"""Round-6 operator tests: reliable-checkpoint closure, span excision,
PNG decode, IVF-PQ incremental maintenance.

The catalog entries for these get their value check from the DuckDB
oracle via the driver contract; these tests cover the semantics the
oracle can't see (checkpoint-mechanism equivalence, storage-mode
parity, batch-split independence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_capstone_spark.sources.tables import load_table


def test_dedup_clusters_reliable_checkpoint(spark, sf_small, tmp_path):
    """`dedup_clusters(checkpoint_dir=...)` must route the iterative
    closure through reliable `checkpoint()` (files actually land in the
    directory) and produce the IDENTICAL clustering as the
    localCheckpoint default — the mechanism changes, the fixpoint
    doesn't."""
    from bigdata_capstone_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    ckpt = str(tmp_path / "ckpt")
    local = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(docs, min_jaccard=0.35).collect()
    }
    reliable = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(
            docs, min_jaccard=0.35, checkpoint_dir=ckpt
        ).collect()
    }
    assert reliable == local
    assert local, "fixture corpus should produce clusters"
    # reliable checkpoint really wrote to the provided directory
    ckpt_files = list((tmp_path / "ckpt").rglob("*"))
    assert ckpt_files, "checkpoint dir should contain RDD checkpoint data"


def test_png_decode_matches_ppm_and_value_checks(spark):
    """The PNG kernel (zlib inflate + scanline unfilter) must produce the
    IDENTICAL feature vector as the PPM parser for the same pixels —
    both fixtures derive pixel p of asset i from md5("42:{i}:{p}")[:3] —
    and first/last pixel values must equal the raw md5 bytes (the BMP
    value-check pattern). Odd assets are RGBA: equality with the RGB PPM
    twin proves alpha is dropped, not composited."""
    import hashlib

    from bigdata_capstone_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        synthetic_png_assets,
        synthetic_ppm_assets,
    )

    n = 12  # dims cycle every lcm(5,4)=20; 12 covers all five filters
    png = {
        r["asset_id"]: r["features"]
        for r in extract_features(
            synthetic_png_assets(spark, n=n, seed=42), decoder="strict"
        ).collect()
    }
    ppm = {
        r["asset_id"]: r["features"]
        for r in extract_features(
            synthetic_ppm_assets(spark, n=n, seed=42), decoder="strict"
        ).collect()
    }
    assert len(png) == n
    assert png == ppm  # bit-identical across containers
    for i in (0, 7, 11):
        w, h = 4 + i % 5, 3 + i % 4
        first = hashlib.md5(f"42:{i}:0".encode()).digest()[:3]
        last = hashlib.md5(f"42:{i}:{w * h - 1}".encode()).digest()[:3]
        feats = png[i]
        assert len(feats) == FEATURE_DIM
        assert (feats[0], feats[1], feats[15]) == (w, h, w * h)
        assert [round(f * 255) for f in feats[5:8]] == list(first)
        assert [round(f * 255) for f in feats[8:11]] == list(last)


def test_png_unsupported_variants_raise():
    """Palette/gray/16-bit/interlaced PNGs and corrupt streams raise the
    honest errors the strict contract promises — never a fake vector."""
    import zlib

    import pytest

    from bigdata_capstone_spark.operators.multimodal import DECODERS

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    def png(bit_depth=8, color_type=2, interlace=0, idat=None, w=1, h=1):
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes((bit_depth, color_type, 0, 0, interlace))
        )
        if idat is None:
            idat = zlib.compress(b"\x00" + b"\x01\x02\x03" * w * h)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
        )

    assert DECODERS["strict"](png())[15] == 1.0  # 1x1 RGB decodes
    with pytest.raises(NotImplementedError):
        DECODERS["strict"](png(color_type=3))  # palette
    with pytest.raises(NotImplementedError):
        DECODERS["strict"](png(color_type=0))  # grayscale
    with pytest.raises(NotImplementedError):
        DECODERS["strict"](png(bit_depth=16))
    with pytest.raises(NotImplementedError):
        DECODERS["strict"](png(interlace=1))  # Adam7
    with pytest.raises(ValueError):
        DECODERS["strict"](png(idat=b"\x00garbage-not-deflate"))
    with pytest.raises(ValueError):  # truncated raster (2x1 data for 1x1)
        DECODERS["strict"](
            png(idat=zlib.compress(b"\x00" + b"\x01\x02\x03" * 2))
        )


def test_connected_components_checkpoint_dir_chain(spark, tmp_path):
    """A long chain graph (propagation distance >> 1) converges to one
    component under the reliable-checkpoint path — exercising multiple
    checkpointed rounds, not just the trivial first iteration."""
    from bigdata_capstone_spark.operators.dedup import connected_components

    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["idA", "idB"]
    )
    comp = connected_components(
        edges, checkpoint_dir=str(tmp_path / "cc")
    ).collect()
    assert len(comp) == n + 1
    assert {r["component"] for r in comp} == {0}
