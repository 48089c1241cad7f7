"""Model-based data selection for training corpora.

Two published selection families, both expressed as pure JVM DataFrame
plans (no Python in the hot path) so they survive 100 TB:

1. **Classifier-based curation** (GPT-3 / PaLM style): train a Naive
   Bayes classifier to separate "curated" sources from the rest, score
   every document with its log-odds margin, and keep what looks
   curated. NB is the closed-form member of that family — training IS
   an aggregation (per-class token counts), so the whole train+score
   loop is two corpus passes with no iterative solver.

2. **DSIR** (Data Selection with Importance Resampling, Xie et al.
   2023): hashed unigram features, importance weight = sum over token
   occurrences of log(p_target(bucket) / p_raw(bucket)). The feature
   space is a FIXED, tiny bucket table (default 256 rows), so the
   scoring join is a broadcast regardless of corpus size.

Scale shape shared by both: one explode pass builds per-doc token (or
bucket) counts; the model table (per-class token counts / bucket
distributions) is vocabulary- or bucket-bounded and broadcasts onto
the per-doc counts; the per-doc score is a map-side-combinable sum.
Nothing corpus-sized ever shuffles twice.

Determinism (oracle contract): all probabilities are add-one-smoothed
ratios of exact integers (bit-identical doubles in both engines); the
one transcendental (log10) is rounded to 6 dp per term, and per-doc
totals accumulate in integer micro-units — the discipline of
catalog_etl.doc_unigram_logprob, extended to classifier margins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_capstone_spark.functions.portable import md5_long
from bigdata_capstone_spark.operators.relational import fan_out
from bigdata_capstone_spark.operators.textops import tokens_col


def _doc_token_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, token, tc): one explode pass, map-side combined."""
    return (
        fan_out(docs)
        .select("doc_id", F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tc"))
    )


def nb_source_margin(
    docs: DataFrame,
    curated_sources: Sequence[str] = ("src0", "src1"),
    text_col: str = "text",
) -> DataFrame:
    """Naive-Bayes log-odds margin "does this doc look curated?".

    Label: curated iff ``source`` is in ``curated_sources``. Model:
    multinomial NB with add-1 smoothing over the shared vocabulary;
    margin(d) = sum over token occurrences of
    log10 P(w|curated) - log10 P(w|rest)  +  log10 prior-odds,
    where P(w|c) = (count_c(w) + 1) / (tokens_c + V).

    Returns (doc_id, n_tokens, nb_margin_r, pred_curated, is_curated).
    Self-training on the full corpus is deliberate — the op demonstrates
    the train+score plan; a held-out split composes via operators/split.

    Scale: the per-class count table is vocabulary-bounded (cached);
    scoring joins it onto the token stream on the token key — a SHUFFLE
    join, since a web-scale vocabulary is past broadcast limits (AQE
    broadcasts when it fits); the margin is one map-side-combinable
    sum. Priors and totals are scalar-sized crossJoin broadcasts.
    """
    cur = F.col("source").isin(*curated_sources)
    tok = (
        fan_out(docs)
        .select(
            "doc_id",
            cur.alias("is_curated"),
            F.explode(tokens_col(text_col)).alias("token"),
        )
        .cache()
    )
    # Vocabulary-bounded model table: token count per class.
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("is_curated"), 1).otherwise(0)).alias("c_cur"),
        F.sum(F.when(F.col("is_curated"), 0).otherwise(1)).alias("c_rest"),
    ).cache()
    totals = counts.agg(
        F.sum("c_cur").alias("n_cur"),
        F.sum("c_rest").alias("n_rest"),
        F.count(F.lit(1)).alias("v"),
    )
    priors = docs.agg(
        F.sum(F.when(cur, 1).otherwise(0)).alias("d_cur"),
        F.sum(F.when(cur, 0).otherwise(1)).alias("d_rest"),
    )
    # Per-token 6dp-rounded log-likelihood ratio.
    llr = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.round(
            F.log10(
                (F.col("c_cur") + 1.0) / (F.col("n_cur") + F.col("v"))
            )
            - F.log10(
                (F.col("c_rest") + 1.0) / (F.col("n_rest") + F.col("v"))
            ),
            6,
        ).alias("llr"),
    )
    # Token-keyed SHUFFLE join, not a broadcast: the llr model table is
    # vocabulary-sized — bounded, but at web-corpus scale the vocabulary
    # is far past broadcast limits. Same shape as the unigram-LM scoring
    # join (catalog_etl.doc_unigram_logprob); AQE broadcasts it when it
    # genuinely fits and handles the stopword skew when it doesn't.
    scored = (
        tok.join(llr, "token")
        .groupBy("doc_id", "is_curated")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.round(F.col("llr") * 1_000_000, 0).cast("long")).alias(
                "m_micro"
            ),
        )
    )
    return (
        scored.crossJoin(F.broadcast(priors))
        .select(
            "doc_id",
            "n_tokens",
            (
                (
                    F.col("m_micro")
                    + F.round(
                        F.round(
                            F.log10(F.col("d_cur") / F.col("d_rest").cast("double")),
                            6,
                        )
                        * 1_000_000,
                        0,
                    ).cast("long")
                )
                / F.lit(1_000_000.0)
            ).alias("nb_margin_r"),
            "is_curated",
        )
        .withColumn("pred_curated", F.col("nb_margin_r") > 0)
        .select("doc_id", "n_tokens", "nb_margin_r", "pred_curated", "is_curated")
    )


def dsir_log_weights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """DSIR hashed-unigram importance log-weights against an in-corpus
    target (documents whose ``lang`` equals ``target_lang``).

    Feature: bucket(w) = md5_long(w) mod ``n_buckets`` (engine-portable
    hash). Distributions: add-1 smoothed bucket frequencies of the
    target slice (p_t) and the full corpus (p_r). Per-doc weight =
    sum over token occurrences of round(log10(p_t(b)/p_r(b)), 6),
    accumulated in micro-units.

    Returns (doc_id, n_tokens, dsir_logratio_r, selected) where
    ``selected`` = logratio > 0 — the importance-resampling acceptance
    rule with a fixed threshold (a PRF-Gumbel draw composes on top via
    operators/sampling for the stochastic variant).

    Scale: the model is TWO ``n_buckets``-row distributions — broadcast
    no matter how large the corpus; one explode pass; the per-doc sum
    combines map-side. The bucket table is also corpus-shard mergeable
    (counts add), so target/raw stats maintain incrementally.
    """
    toks = (
        fan_out(docs)
        .select(
            "doc_id",
            (F.col("lang") == target_lang).alias("is_target"),
            F.explode(tokens_col(text_col)).alias("token"),
        )
        .select(
            "doc_id",
            "is_target",
            (md5_long(F.col("token")) % n_buckets).alias("bucket"),
        )
        .cache()
    )
    bcounts = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
        F.count(F.lit(1)).alias("c_r"),
    )
    btotals = bcounts.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    lr = bcounts.crossJoin(F.broadcast(btotals)).select(
        "bucket",
        F.round(
            F.log10((F.col("c_t") + 1.0) / (F.col("n_t") + F.lit(float(n_buckets))))
            - F.log10((F.col("c_r") + 1.0) / (F.col("n_r") + F.lit(float(n_buckets)))),
            6,
        ).alias("lr"),
    )
    return (
        toks.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.round(F.col("lr") * 1_000_000, 0).cast("long"))
                / F.lit(1_000_000.0)
            ).alias("dsir_logratio_r"),
        )
        .withColumn("selected", F.col("dsir_logratio_r") > 0)
    )


def fair_budget_allocation(
    supplies: DataFrame,
    budget_frac: float = 0.6,
    key_col: str = "src",
    supply_col: str = "sup",
) -> DataFrame:
    """Max-min fair (water-filling) division of a token budget across
    sources: every source gets min(its supply, L) where the water level
    L is the unique value making the allocations sum to the budget —
    the exact-fairness dial the temperature/cap heuristics approximate
    (caps pick the cutoff per source by fiat; water-filling derives the
    one level that spends the budget with no source favored).

    Returns (source, supply, alloc_r, saturated): ``saturated`` sources
    are CLIPPED at the water level (supply > L); the rest sit below the
    line and keep their full supply. When the budget covers total
    supply there is no level and every source keeps its supply,
    saturated = false.

    Scale shape: the closed form needs each source's EXCLUSIVE prefix
    of the supply-sorted order — ``partitioned_prefix_sum`` +
    ``partitioned_row_number`` over the |sources| frame (no
    single-task sort even at millions of domains); the bracket search
    L_i = (B - prefix_i) / remaining_i <= sup_i is a filter + min_by,
    and the level broadcasts back as a scalar. All counts BIGINT; L is
    the only double, produced by one fixed expression.
    """
    from bigdata_capstone_spark.operators.relational import (
        partitioned_prefix_sum,
        partitioned_row_number,
    )

    sup = supplies.select(
        F.col(key_col).alias("src"), F.col(supply_col).alias("sup")
    )
    tot = sup.agg(
        F.sum("sup").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        F.floor(F.col("total") * budget_frac).cast("long").alias("b"),
        "n",
    )
    ordered = partitioned_prefix_sum(
        sup,
        order_by=[F.col("sup"), F.col("src")],
        value=F.col("sup"),
        alias="cum_excl",
        inclusive=False,
    )
    ordered = partitioned_row_number(
        ordered, order_by=[F.col("sup"), F.col("src")], alias="idx"
    )
    lvl = ordered.crossJoin(F.broadcast(tot)).withColumn(
        "li",
        (F.col("b") - F.col("cum_excl"))
        / (F.col("n") - F.col("idx") + 1.0),
    ).cache()  # two consumers: bracket search + final allocation
    sat = lvl.filter(F.col("li") <= F.col("sup") * 1.0).agg(
        F.min_by("li", F.col("idx")).alias("L")
    )
    return lvl.crossJoin(F.broadcast(sat)).select(
        F.col("src").alias("source"),
        F.col("sup").alias("supply"),
        F.round(
            F.when(F.col("L").isNull(), F.col("sup") * 1.0).otherwise(
                F.least(F.col("sup") * 1.0, F.col("L"))
            ),
            6,
        ).alias("alloc_r"),
        (F.col("L").isNotNull() & (F.col("sup") * 1.0 > F.col("L"))).alias(
            "saturated"
        ),
    )


def lr_source_classifier(
    docs: DataFrame,
    curated_sources: Sequence[str] = ("src0", "src1"),
    rounds: int = 3,
    learn_rate: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Logistic-regression curation classifier trained by ``rounds``
    full-batch gradient-descent iterations INSIDE the engine — the
    trainable upgrade of :func:`nb_source_margin`'s closed-form model
    (fastText-style quality filters are exactly this shape: a linear
    model over cheap document statistics).

    Features per doc (all exact rationals rounded to 6 dp): x1 =
    n_tokens/100, x2 = type-token ratio, x3 = mean token length, plus
    bias. Label: curated iff ``source`` in ``curated_sources``. Update:
    w <- round(w - lr * grad/n, 8) with grad components accumulated as
    DECIMAL(28,14) — the one cross-row float reduction, made
    order-independent so a serial engine replays training bit-for-bit.
    Per-doc sigmoid rounds to 6 dp on a margin itself rounded to 6 dp
    (the transcendental discipline the BM25/unigram-LM family uses).
    Zero-token docs carry no features and are excluded (same
    N-semantics note as BM25).

    Returns (doc_id, n_tokens, lr_margin_r, pred_curated, is_curated).
    Self-training on the full corpus is deliberate (train+score plan
    demo); a held-out split composes via operators/split.

    Scale shape: ONE feature-extraction pass (cached — it feeds every
    GD round and the final scoring); per round one broadcast of the
    1-row weight frame, one map-side-combinable 5-aggregate reduction;
    nothing wider than the corpus scan ever shuffles, and the weights
    never touch the driver (crossJoin of 1-row frames, no collect)."""
    toks = tokens_col(text_col)
    feats = (
        fan_out(docs)
        .select(
            "doc_id",
            F.col("source").isin(*curated_sources).alias("is_curated"),
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc + F.length(t),
            ).alias("n_chars"),
        )
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "is_curated",
            "n_tokens",
            F.round(F.col("n_tokens") / 100.0, 6).alias("x1"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("x2"),
            F.round(F.col("n_chars") / F.col("n_tokens"), 6).alias("x3"),
        )
        .cache()
    )

    def margin_col() -> F.Column:
        return F.round(
            F.col("x1") * F.col("w1")
            + F.col("x2") * F.col("w2")
            + F.col("x3") * F.col("w3")
            + F.col("w4"),
            6,
        )

    w = docs.sparkSession.range(1).select(
        *(F.lit(0.0).alias(f"w{j}") for j in (1, 2, 3, 4))
    )
    for _ in range(rounds):
        scored = feats.crossJoin(F.broadcast(w))
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin_col())), 6)
        err = p - F.when(F.col("is_curated"), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        grad = scored.agg(
            F.sum((err * F.col("x1")).cast("decimal(28,14)")).alias("g1"),
            F.sum((err * F.col("x2")).cast("decimal(28,14)")).alias("g2"),
            F.sum((err * F.col("x3")).cast("decimal(28,14)")).alias("g3"),
            F.sum(err.cast("decimal(28,14)")).alias("g4"),
            F.count(F.lit(1)).alias("n"),
        )
        w = grad.crossJoin(F.broadcast(w)).select(
            *[
                F.round(
                    F.col(f"w{j}")
                    - learn_rate
                    * (F.col(f"g{j}").cast("double") / F.col("n")),
                    8,
                ).alias(f"w{j}")
                for j in (1, 2, 3, 4)
            ]
        )

    return feats.crossJoin(F.broadcast(w)).select(
        "doc_id",
        "n_tokens",
        margin_col().alias("lr_margin_r"),
        (margin_col() > 0).alias("pred_curated"),
        "is_curated",
    )
