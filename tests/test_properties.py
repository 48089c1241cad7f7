"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures — the cheap way to catch semantic edge cases
(empty docs, ties, single-token texts) the example tests miss."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

TOKENS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "data", "spark", "x9"]),
    min_size=0, max_size=12,
)
DOCS = st.lists(TOKENS, min_size=1, max_size=8)

_set = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=DOCS)
@_set
def test_minhash_equal_token_sets_equal_signatures(spark, docs):
    from bigdata_capstone_spark.operators.dedup import minhash_signatures

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    # a permuted copy of each doc: same token SET ⇒ same signature
    rows += [
        (1000 + i, " ".join(sorted(toks, reverse=True)))
        for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r["doc_id"]: tuple(r[f"h{p}"] for p in range(4))
        for r in minhash_signatures(df, n_perm=4, shingle_n=1).collect()
    }
    for i, toks in enumerate(docs):
        if set(toks):
            assert sigs[i] == sigs[1000 + i]
        else:
            assert i not in sigs  # empty docs yield no shingles, no row


@given(docs=DOCS)
@_set
def test_ngram_jaccard_bounds_and_symmetry(spark, docs):
    from bigdata_capstone_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(
        df, shingle_n=1, min_jaccard=0.0, text_col="text", id_col="doc_id"
    ).collect()
    for r in pairs:
        assert 0.0 < r["jaccard"] <= 1.0 + 1e-12
        assert r["idA"] < r["idB"]
        a, b = set(docs[r["idA"]]), set(docs[r["idB"]])
        expect = len(a & b) / len(a | b)
        assert math.isclose(r["jaccard"], expect, rel_tol=1e-9), (r, expect)


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1, max_size=20,
    )
)
@_set
def test_ewma_bounded_by_extremes(spark, vals):
    from bigdata_capstone_spark.operators.temporal import ewma_by_key

    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    df = df.withColumn("ts", F.timestamp_micros(F.col("ts") * 1_000_000))
    out = ewma_by_key(df, "user_id").collect()
    assert len(out) == 1
    assert out[0]["n_points"] == len(vals)
    assert min(vals) - 1e-6 <= out[0]["ewma"] <= max(vals) + 1e-6


def test_incremental_dedup_disjoint_and_complete(spark, sf_small):
    from bigdata_capstone_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )
    from bigdata_capstone_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs  # half overlaps the seen corpus
    seen = exact_dedup(old).select(F.col("text_hash"))
    surv = incremental_exact_dedup(new, seen).collect()
    seen_set = {r["text_hash"] for r in seen.collect()}
    surv_hashes = [r["text_hash"] for r in surv]
    # nothing already seen survives; survivors are hash-unique
    assert not (set(surv_hashes) & seen_set)
    assert len(surv_hashes) == len(set(surv_hashes))
    # completeness: every unseen hash in the batch survives exactly once
    all_new = {
        r["text_hash"]
        for r in new.select(F.md5("text").alias("text_hash")).collect()
    }
    assert set(surv_hashes) == all_new - seen_set


def test_zorder_key_matches_python_reference(spark):
    """Spark's generated bit-interleave equals a direct Python Morton
    encode for every (x, y) in a 32x32 grid, and the key de-interleaves
    back to the inputs (bijectivity on the truncated domain)."""
    from pyspark.sql import functions as F

    from bigdata_capstone_spark.operators.zorder import zorder_key

    def morton(x: int, y: int, bits: int = 8) -> int:
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    grid = [(x, y) for x in range(0, 256, 8) for y in range(0, 256, 8)]
    df = spark.createDataFrame(grid, ["x", "y"]).withColumn(
        "z", zorder_key([F.col("x"), F.col("y")], bits=8)
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    seen = set()
    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)
        assert z not in seen
        seen.add(z)


@given(
    vals=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
    ),
    nparts=st.sampled_from([1, 3, 8, 32]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_partitioned_prefix_sum_equals_sequential(spark, vals, nparts):
    """The distributed prefix sum must equal a sequential Python prefix
    sum over the same total order, for ANY partition count — the
    bit-identity contract every no-single-partition-window rewrite
    relies on. Duplicate order keys get a unique tie-break id, values
    may repeat and be zero."""
    from bigdata_capstone_spark.operators.relational import (
        partitioned_prefix_sum,
    )

    rows = [(i, k, v) for i, (k, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "k", "v"])
    got = {
        r["id"]: (r["cum"], r["before"])
        for r in partitioned_prefix_sum(
            df,
            [F.desc("k"), F.col("id")],
            F.col("v").cast("long"),
            "cum",
            num_partitions=nparts,
        )
        .join(
            partitioned_prefix_sum(
                df,
                [F.desc("k"), F.col("id")],
                F.col("v").cast("long"),
                "before",
                num_partitions=nparts,
                inclusive=False,
            ).select("id", "before"),
            on="id",
        )
        .collect()
    }
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    run = 0
    for i, _, v in ordered:
        assert got[i] == (run + v, run), (i, got[i], run, v)
        run += v


def test_partitioned_row_number_rank_is_long(spark):
    """ADVICE r4: the distributed row_number must keep the rank as LONG —
    an int rank silently overflows past ~2.1B rows, contradicting the
    'directly on unbounded input' contract."""
    from pyspark.sql import functions as F

    from bigdata_capstone_spark.operators.relational import (
        partitioned_row_number,
    )

    df = spark.range(10).select(F.col("id"))
    out = partitioned_row_number(df, [F.col("id")], "rk", num_partitions=3)
    assert dict(out.dtypes)["rk"] == "bigint"
    assert [r["rk"] for r in out.orderBy("id").collect()] == list(range(1, 11))
