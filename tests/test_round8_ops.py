"""Round-8 operator tests: chunked-body reassembly at high chunk counts,
KLL quantile sketch, JSONL ingestion, NN-descent, span byte-verify,
MP4 container metadata."""

from __future__ import annotations

import time


def _chunked(payload: bytes, chunk_size: int) -> bytes:
    parts = []
    for i in range(0, len(payload), chunk_size):
        c = payload[i : i + chunk_size]
        parts.append(f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n")
    parts.append(b"0\r\n\r\n")
    return b"".join(parts)


def test_dechunk_many_chunks_value_and_linear_time():
    """A 2 MB body in 2,048 one-KiB chunks must reassemble exactly and in
    time linear in the body size — the ``out += chunk`` regression (each
    chunk recopying the accumulated prefix) makes the 4x-chunk case ~16x
    slower instead of ~4x; the wall-clock ratio gate catches it without
    being brittle about absolute speed."""
    from bigdata_capstone_spark.operators.webingest import _dechunk

    payload = bytes(range(256)) * (2 * 1024 * 1024 // 256)
    body = _chunked(payload, 1024)
    assert _dechunk(body) == payload

    # chunk extensions after ';' are ignored
    assert _dechunk(b"3;ext=1\r\nabc\r\n0\r\n\r\n") == b"abc"

    def t(n_chunks: int) -> float:
        data = _chunked(b"x" * (1024 * n_chunks), 1024)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _dechunk(data)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t4 = t(512), t(2048)
    # linear: ratio ~4; quadratic: ratio ~16. Allow generous noise.
    assert t4 / max(t1, 1e-9) < 9.0, (t1, t4)


# ---------------------------------------------------------------------------
# Quantile sketch (level-sampling / PRF-coin KLL family)
# ---------------------------------------------------------------------------


def _collect_state(state):
    return sorted(
        (r["qs_id"], r["value"], r["lvl"], r["thr"]) for r in state.collect()
    )


def test_qsketch_split_independence_bitwise(spark, sf_small):
    """merge(state(A), state(B)) == state(A ∪ B) BIT-FOR-BIT — the exact
    group law PRF coins buy, including the adversarial split where one
    shard's items all sit at high levels (the integer-minimal-threshold
    case a present-level-minimum rule gets wrong)."""
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build,
        qsketch_merge,
    )
    from bigdata_capstone_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_small, "events").cache()
    cap = 64
    full = qsketch_build(ev, F.col("event_id"), F.col("value"), cap)

    # 2-way split on parity
    parts = [
        qsketch_build(
            ev.filter(F.col("event_id") % 2 == i),
            F.col("event_id"),
            F.col("value"),
            cap,
        )
        for i in range(2)
    ]
    assert _collect_state(qsketch_merge(parts, cap)) == _collect_state(full)

    # adversarial split: one side gets ONLY the high-level survivors of
    # the full build (its own thr lands high), the other the rest
    kept_ids = {r["qs_id"] for r in full.collect()}
    hi = ev.filter(
        F.col("event_id").cast("string").isin(*sorted(kept_ids))
    )
    lo = ev.filter(
        ~F.col("event_id").cast("string").isin(*sorted(kept_ids))
    )
    parts2 = [
        qsketch_build(s, F.col("event_id"), F.col("value"), cap)
        for s in (hi, lo)
    ]
    assert _collect_state(qsketch_merge(parts2, cap)) == _collect_state(full)


def test_qsketch_merge_associativity_and_order(spark, sf_small):
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build,
        qsketch_merge,
    )
    from bigdata_capstone_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_small, "events").cache()
    cap = 64
    shards = [
        qsketch_build(
            ev.filter(F.col("event_id") % 3 == i),
            F.col("event_id"),
            F.col("value"),
            cap,
        )
        for i in range(3)
    ]
    flat = qsketch_merge(shards, cap)
    nested = qsketch_merge(
        [qsketch_merge([shards[2], shards[0]], cap), shards[1]], cap
    )
    assert _collect_state(flat) == _collect_state(nested)


def test_qsketch_rank_error_within_dkw_bound(spark, sf_oracle):
    """Estimated quantiles' TRUE ranks stay within the DKW sampling bound
    ε = sqrt(ln(2/δ)/(2m)) at δ=0.02 of the target rank. The hash is a
    fixed PRF, so this is deterministic — if it passes once it always
    passes; it fails only if the estimator or the sampler regresses."""
    import math

    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build,
        qsketch_quantiles,
    )
    from bigdata_capstone_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_oracle, "events").cache()
    n = ev.count()
    cap = 512
    state = qsketch_build(ev, F.col("event_id"), F.col("value"), cap)
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    row = qsketch_quantiles(state, qs).collect()[0]
    m = row["n_kept"]
    assert cap // 2 < m <= cap, m
    eps = math.sqrt(math.log(2 / 0.02) / (2 * m))
    vals = sorted(r["value"] for r in ev.select("value").collect())
    for q, lbl in zip(qs, ("25", "50", "75", "90", "99")):
        est = row[f"p{lbl}_r"]
        true_rank = sum(1 for v in vals if v <= est) / n
        assert abs(true_rank - q) <= eps, (q, est, true_rank, eps)


def test_qsketch_empty_and_tiny_inputs(spark):
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build,
        qsketch_quantiles,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id LONG, v DOUBLE"
    )
    state = qsketch_build(df, F.col("id"), F.col("v"), 64)
    # under capacity: thr = 0, everything kept, quantiles EXACT
    rows = state.collect()
    assert len(rows) == 10 and all(r["thr"] == 0 for r in rows)
    est = qsketch_quantiles(state, (0.5, 1.0)).collect()[0]
    assert est["n_kept"] == 10
    assert est["p50_r"] == 4.0  # ceil(0.5*10) = 5th of 0..9 = 4.0
    assert est["p100_r"] == 9.0

    empty = qsketch_build(
        df.filter(F.col("id") < 0), F.col("id"), F.col("v"), 64
    )
    assert empty.count() == 0


# ---------------------------------------------------------------------------
# JSONL ingestion quarantine
# ---------------------------------------------------------------------------


def test_read_jsonl_quarantines_malformed_lines(spark, tmp_path):
    from bigdata_capstone_spark.sources.tables import read_jsonl
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    p = tmp_path / "in.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello"}',
        "not json",
        '{"doc_id": 2, "text": "unicode \\u00e9 and \\"quotes\\""}',
        '{"doc_id": 3,',
        '{"text": "missing id is FINE, not corrupt"}',
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    out = read_jsonl(spark, str(p), schema).collect()
    good = {r["doc_id"]: r["text"] for r in out if r["_corrupt_record"] is None}
    bad = sorted(r["_corrupt_record"] for r in out if r["_corrupt_record"] is not None)
    assert good == {
        1: "hello",
        2: 'unicode é and "quotes"',
        None: "missing id is FINE, not corrupt",
    }
    assert bad == ["not json", '{"doc_id": 3,']


def test_read_jsonl_rejects_colliding_quarantine_column(spark):
    import pytest
    from bigdata_capstone_spark.sources.tables import read_jsonl
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("_corrupt_record", T.StringType())])
    with pytest.raises(ValueError):
        read_jsonl(spark, "/nonexistent", schema)
