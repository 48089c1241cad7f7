"""Semantic invariants for the round-5 wave-2 operators (BM25 retrieval,
NB classifier curation, DSIR selection, repeated-span dedup, PSI drift)
— planted-fixture recovery beyond the value-hash oracle the replica gate
already applies to every registered entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_capstone_spark.operators.dedup import repeated_span_stats
from bigdata_capstone_spark.operators.drift import psi_by_group
from bigdata_capstone_spark.operators.retrieval import bm25_topk
from bigdata_capstone_spark.operators.selection import (
    dsir_log_weights,
    nb_source_margin,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------------ spans


def test_repeated_span_stats_recovers_planted_run(spark):
    """A 10-token run shared verbatim by two docs must surface as ONE
    merged span covering exactly those 10 tokens in each doc; a doc with
    no cross-doc 8-gram must be absent."""
    shared = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, shared + " uA uB"),                      # run at pos 1..10, dl=12
        (2, "xA xB " + shared),                      # run at pos 3..12, dl=12
        (3, " ".join(f"z{i}" for i in range(12))),   # unique, long enough
    ]
    out = {
        r["doc_id"]: r
        for r in repeated_span_stats(_docs(spark, rows), k=8).collect()
    }
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_hits"] == 3          # 8-grams at 3 positions
        assert out[d]["n_spans"] == 1         # merged into one island
        assert out[d]["covered_tokens"] == 10
        assert abs(out[d]["covered_frac"] - round(10 / 12, 6)) < 1e-9


def test_repeated_span_stats_splits_distant_repeats(spark):
    """Two repeats separated by more than k unique tokens form TWO spans."""
    runA = " ".join(f"a{i}" for i in range(8))
    runB = " ".join(f"b{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(12))
    rows = [
        (1, runA + " " + gap + " " + runB),
        (2, runA + " qqq " + runB),
    ]
    out = {
        r["doc_id"]: r
        for r in repeated_span_stats(_docs(spark, rows), k=8).collect()
    }
    assert out[1]["n_spans"] == 2
    assert out[1]["covered_tokens"] == 16
    assert out[2]["n_spans"] == 2


# ------------------------------------------------------------------- bm25


def test_bm25_ranks_term_sharing_doc_first(spark):
    """The query doc's rare terms retrieve the doc sharing them at rank 1,
    ahead of a doc sharing only one term; unrelated docs score nothing."""
    rows = [
        (1, "quark lepton boson filler1 filler2"),          # query
        (2, "quark lepton boson other stuff entirely"),     # 3 shared
        (3, "quark unrelated words here now indeed"),       # 1 shared
        (4, "totally disjoint vocabulary right here"),      # 0 shared
        (5, "more disjoint words beyond that too"),
    ]
    out = bm25_topk(
        _docs(spark, rows), n_queries=1, k=3, stop_df_top=0
    ).collect()
    by_rank = {r["rk"]: r for r in out if r["query_doc"] == 1}
    assert by_rank[1]["doc_id"] == 2
    assert by_rank[1]["n_terms"] == 3
    assert by_rank[2]["doc_id"] == 3
    assert 4 not in {r["doc_id"] for r in out}


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    """Equal tf of the query term: the shorter candidate scores higher
    (the b=0.75 length penalty)."""
    rows = [
        (1, "needle alpha"),
        (2, "needle beta gamma"),                            # short match
        (3, "needle " + " ".join(f"pad{i}" for i in range(30))),  # long
    ]
    out = bm25_topk(
        _docs(spark, rows), n_queries=1, k=2, stop_df_top=0
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rk"])]
    assert ranked[0] == 2 and ranked[1] == 3


# ------------------------------------------------------------ nb / dsir


def test_nb_margin_separates_planted_sources(spark):
    """Curated sources share a marker token, crawl sources another: the
    classifier must predict every doc's class from its text alone."""
    rows = [
        (i, f"curated quality prose sample{i}", "en", "src0", 0)
        for i in range(1, 6)
    ] + [
        (i, f"crawl noisy scrape sample{i}", "en", "src5", 0)
        for i in range(6, 11)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = nb_source_margin(docs, curated_sources=("src0",)).collect()
    assert len(out) == 10
    for r in out:
        assert r["pred_curated"] == r["is_curated"], r


def test_dsir_weights_favor_target_language_docs(spark):
    """Docs drawn from the target (en) vocabulary must average a higher
    importance log-ratio than docs from a disjoint vocabulary."""
    rows = [
        (i, "alpha beta gamma delta common", "en", "src0", 0)
        for i in range(1, 6)
    ] + [
        (i, "uno dos tres cuatro common", "es", "src0", 0)
        for i in range(6, 11)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = dsir_log_weights(docs, target_lang="en").collect()
    en = [r["dsir_logratio_r"] for r in out if r["doc_id"] <= 5]
    es = [r["dsir_logratio_r"] for r in out if r["doc_id"] > 5]
    assert min(en) > max(es)
    assert all(r["selected"] == (r["dsir_logratio_r"] > 0) for r in out)


# -------------------------------------------------------------------- psi


def test_psi_flags_shifted_distribution_only(spark):
    """Identical per-period distributions → PSI ≈ 0; a hard location
    shift → PSI above the 0.25 'shifted' alerting bar."""
    rows = []
    for i in range(400):
        p2 = i >= 200
        # 'same': value depends only on i % 10 → identical per period
        rows.append(("same", p2, float(i % 10) * 50.0))
        # 'shift': period 1 low bins, period 2 pinned to the top bin
        rows.append(("shift", p2, 450.0 if p2 else float(i % 3) * 50.0))
    df = spark.createDataFrame(rows, "grp string, p2 boolean, value double")
    out = {
        r["grp"]: r
        for r in psi_by_group(
            df, F.col("p2"), value_col="value", group_cols=("grp",)
        ).collect()
    }
    assert out["same"]["psi_r"] < 0.05
    assert out["shift"]["psi_r"] > 0.25
    assert out["same"]["n1"] == out["same"]["n2"] == 200


# -------------------------------------------------------------------- acf


def test_acf_alternating_series_is_anticorrelated_at_lag1(spark):
    """A strictly alternating series has lag-1 ACF -1 and lag-2 ACF +1;
    a monotone ramp has every lag's ACF +1 (corr is shift-invariant)."""
    from bigdata_capstone_spark.operators.temporal import acf_by_key

    rows = []
    for i in range(40):
        rows.append(("alt", i, 1.0 if i % 2 == 0 else -1.0))
        rows.append(("ramp", i, float(i)))
    df = spark.createDataFrame(rows, "k string, t long, value double")
    out = {
        (r["k"], r["lag"]): r["acf_r"]
        for r in acf_by_key(df, ["k"], ["t"], "value", max_lag=2).collect()
    }
    assert abs(out[("alt", 1)] + 1.0) < 1e-6
    assert abs(out[("alt", 2)] - 1.0) < 1e-6
    assert abs(out[("ramp", 1)] - 1.0) < 1e-6
    assert abs(out[("ramp", 2)] - 1.0) < 1e-6


def test_acf_constant_series_filtered_out(spark):
    """Zero-variance series yield null corr → filtered, not an error
    (the try_divide discipline, not ANSI corr's division-by-zero)."""
    from bigdata_capstone_spark.operators.temporal import acf_by_key

    rows = [("c", i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, value double")
    assert acf_by_key(df, ["k"], ["t"], "value", max_lag=2).count() == 0


# ------------------------------------------------------------- curriculum


def test_curriculum_stages_order_and_budget(spark, sf_small):
    """Stages must be monotone in the difficulty order (easiest-first =
    highest avg_logprob first) and each stage's token budget within one
    max-doc-length of total/4."""
    from bigdata_capstone_spark.catalog_train import docs_curriculum_stages

    rows = docs_curriculum_stages(spark, sf_small).collect()
    by_order = sorted(rows, key=lambda r: (-r["avg_logprob_r"], r["doc_id"]))
    stages = [r["stage"] for r in by_order]
    assert stages == sorted(stages), "stage must be monotone in order"
    assert set(stages) == {0, 1, 2, 3}
    total = sum(r["n_tokens"] for r in rows)
    max_doc = max(r["n_tokens"] for r in rows)
    for s in range(4):
        st = sum(r["n_tokens"] for r in rows if r["stage"] == s)
        assert abs(st - total / 4) <= max_doc
    # prefix sums are exclusive: first doc of the order starts at 0
    assert by_order[0]["cum_tokens"] == 0


# ------------------------------------------------------- label outliers


def test_label_outliers_flag_planted_inverse_vector(spark):
    """A vector pointing AWAY from its label's tight cluster must be the
    label's rank-1 outlier (lowest cosine to the centroid direction)."""
    from bigdata_capstone_spark.catalog_train import embedding_label_outliers
    import os
    import tempfile

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    rows = []
    for i in range(1, 11):
        # label 0: tight cluster along +e1, with tiny per-vector jitter
        v = list(base)
        v[1] = 0.01 * i
        rows.append((i, v, 0))
    inv = [-x for x in base]
    rows.append((99, inv, 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = embedding_label_outliers(spark, d).collect()
    ranked = sorted(
        [r for r in out if r["label"] == 0], key=lambda r: r["rk"]
    )
    assert ranked[0]["vec_id"] == 99
    assert ranked[0]["cos_centroid_r"] < 0
    assert all(r["cos_centroid_r"] > 0.9 for r in ranked[1:])


def test_psi_contingency_is_mergeable_state(spark):
    """Folding per-shard partial contingency counts (counts ADD) and
    handing the merged table to psi_from_contingency must equal
    psi_by_group on the unsplit input — the merge law the streaming
    maintenance twin (streaming_drift_psi) relies on."""
    from bigdata_capstone_spark.operators.drift import (
        fixed_width_bin,
        psi_from_contingency,
    )

    rows = [
        ("g", i % 3 == 0, float((i * 37) % 500)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, p2 boolean, value double")
    direct = psi_by_group(
        df, F.col("p2"), value_col="value", group_cols=("grp",)
    ).collect()

    def cont_of(part):
        return (
            part.select(
                "grp", "p2", fixed_width_bin(F.col("value"), 50.0, 10).alias("bin")
            )
            .groupBy("grp", "bin")
            .agg(
                F.sum(F.when(F.col("p2"), 0).otherwise(1)).alias("c1"),
                F.sum(F.when(F.col("p2"), 1).otherwise(0)).alias("c2"),
            )
        )
    a = cont_of(df.filter(F.col("value") < 250.0))
    b = cont_of(df.filter(F.col("value") >= 250.0))
    merged = (
        a.unionByName(b)
        .groupBy("grp", "bin")
        .agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
    )
    via_merge = psi_from_contingency(merged, ["grp"], 10).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_merge))


# ---------------------------------------------------------------- entropy


def test_token_entropy_extremes(spark):
    """All-distinct tokens → H = log2(n) and TTR = 1; a single repeated
    token → H = 0 and TTR = 1/n."""
    import math
    import os
    import tempfile

    rows = [
        (1, "a b c d e f g h", "en", "src0", 0),     # 8 distinct
        (2, "x x x x x x x x", "en", "src0", 0),     # 1 type
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from bigdata_capstone_spark.catalog_etl import doc_token_entropy

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r for r in doc_token_entropy(spark, d).collect()}
    assert abs(out[1]["entropy_r"] - 3.0) < 1e-5          # log2(8)
    assert out[1]["type_token_ratio_r"] == 1.0
    assert out[2]["entropy_r"] == 0.0
    assert abs(out[2]["type_token_ratio_r"] - 0.125) < 1e-9
    assert math.isclose(out[1]["n_tokens"], 8)


def test_source_lang_composition_entropy(spark):
    """A 50/50 two-language source has entropy 1 bit and dominant share
    0.5; a monolingual source has entropy 0 and share 1."""
    import os
    import tempfile

    rows = (
        [(i, "t", "en", "mixed", 0) for i in range(10)]
        + [(i + 10, "t", "fr", "mixed", 0) for i in range(10)]
        + [(i + 20, "t", "en", "mono", 0) for i in range(7)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from bigdata_capstone_spark.catalog_etl import source_lang_composition

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["source"]: r
            for r in source_lang_composition(spark, d).collect()
        }
    assert abs(out["mixed"]["lang_entropy_r"] - 1.0) < 1e-6
    assert out["mixed"]["dominant_share_r"] == 0.5
    assert out["mixed"]["n_langs"] == 2
    assert out["mono"]["lang_entropy_r"] == 0.0
    assert out["mono"]["dominant_share_r"] == 1.0


def test_rank_ensemble_keep_is_top_half_borda(spark, sf_small):
    """keep must equal (q_rank + lm_rank <= n_docs); roughly half the
    corpus is kept; ranks are permutations of 1..n."""
    from bigdata_capstone_spark.catalog_train import (
        docs_quality_rank_ensemble,
    )

    rows = docs_quality_rank_ensemble(spark, sf_small).collect()
    n = len(rows)
    assert sorted(r["q_rank"] for r in rows) == list(range(1, n + 1))
    assert sorted(r["lm_rank"] for r in rows) == list(range(1, n + 1))
    for r in rows:
        assert r["keep"] == (r["q_rank"] + r["lm_rank"] <= n)
        assert r["mean_rank_r"] == (r["q_rank"] + r["lm_rank"]) / 2.0
    kept = sum(r["keep"] for r in rows)
    assert 0.3 * n < kept < 0.7 * n
