"""Distributed evaluation metrics for model-based data selection.

The selection family (operators/selection.py — NB classifier margins,
DSIR importance weights) produces per-document scores and accept flags;
this module measures how good those scores ARE, with the same
scale-and-determinism discipline as the scorers themselves:

- **ROC-AUC** via the rank-sum identity, computed on the distinct-score
  LEVEL table: AUC = Σ_levels pos_at·(neg_below + neg_at/2) / (n_pos·n_neg).
  The level frame is |distinct scores|-sized; the cumulative negative
  count comes from ``partitioned_prefix_sum`` (operators/relational.py),
  so nothing ever sorts in a single task — the corpus-sized input is
  touched exactly once by one map-side-combinable groupBy.
- **Calibration bands**: fixed-width margin bins (a pure map, like
  operators/drift.fixed_width_bin) → per-band document count, positive
  count, and exact-integer positive rate. One shuffle.
- **Cohen's kappa**: one global aggregate building the 2×2 agreement
  table in exact integers; kappa is a fixed scalar double expression of
  those four counts (bit-identical across engines).
- **Spearman rank correlation**: average ranks materialized as exact
  INTEGER double-ranks (2·rank avoids the .5 of midranks:
  r2 = 2·count_below + count_at + 1), built per column from the level
  table + prefix sum, then Pearson on the integer ranks with BIGINT
  moment sums and one final scalar double expression.

Determinism contract: every sum that crosses a shuffle is BIGINT (counts
and integer double-ranks — never raw doubles, whose addition order would
diverge from a sequential oracle); doubles appear only in the final
scalar expression over already-exact aggregates, rounded to 6 dp.

Exactness bound (documented, not silent): the Spearman moment sums hold
Σ r2², bounded by 4n³ — exact in BIGINT up to n ≈ 1.3e6 evaluation rows.
Evaluation sets are samples/holdouts by construction (operators/split,
operators/sampling compose in front); for corpus-scale n the sums would
need DECIMAL(38,0) widening.

No analogue in the reference (reference has no model-based selection at
all); metric definitions follow Hand & Till (2001) for rank-sum AUC and
Cohen (1960) for kappa.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_capstone_spark.operators.relational import (
    partitioned_prefix_sum,
)


def roc_auc(
    scored: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Threshold-free ranking quality of ``score_col`` against the
    boolean ``label_col``: the probability a random positive outranks a
    random negative, ties counting half (Hand & Till 2001).

    Returns a single row (n_pos, n_neg, auc_r). Why AUC and not
    accuracy: a margin scorer whose threshold is miscalibrated (e.g.
    the NB margin at small SF, where every margin is negative) can
    still RANK perfectly — AUC measures exactly that.

    Scale shape: one map-side-combinable groupBy collapses the corpus
    to the distinct-score level table; the cumulative negative count is
    a ``partitioned_prefix_sum`` over that level table (range-partition
    parallel, never a single-task sort); the numerator
    Σ pos_at·(2·neg_below + neg_at) accumulates in exact BIGINT halves
    (the ×2 avoids fractional tie terms) and the single division
    happens once, on the final scalar row.
    """
    lv = (
        scored.groupBy(F.col(score_col).alias("s"))
        .agg(
            F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias(
                "pos_at"
            ),
            F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias(
                "neg_at"
            ),
        )
    )
    lv = partitioned_prefix_sum(
        lv,
        order_by=[F.col("s")],
        value=F.col("neg_at"),
        alias="neg_below",
        inclusive=False,
    )
    return lv.agg(
        F.sum("pos_at").cast("long").alias("n_pos"),
        F.sum("neg_at").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos_at")
            * (2 * F.col("neg_below") + F.col("neg_at"))
        )
        .cast("long")
        .alias("num2"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("num2")
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc_r"),
    )


def margin_calibration(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    lo: float = -3.0,
    width: float = 0.5,
    n_bins: int = 8,
) -> DataFrame:
    """Reliability table of a margin scorer: fixed-width margin bands →
    (band, n_docs, n_pos, pos_rate_r, avg_margin_r). A well-calibrated
    scorer's empirical positive rate rises monotonically with the band.

    Binning is a pure map (same clamp-to-edges shape as
    operators/drift.fixed_width_bin, shifted by ``lo`` so negative
    margins band correctly); the whole metric is one groupBy. The band
    mean margin accumulates in integer micro-units (the scorer's own
    representation — ``score·1e6`` is integral by construction for the
    NB/DSIR family), so the per-band average is exact-integer division
    rounded once.
    """
    band = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(score_col) - lo) / width).cast("int"),
        ),
    )
    return (
        scored.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col(label_col), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum(
                F.round(F.col(score_col) * 1_000_000, 0).cast("long")
            ).alias("m_micro"),
        )
        .select(
            "band",
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_pos",
            F.round(F.col("n_pos") / F.col("n_docs").cast("double"), 6).alias(
                "pos_rate_r"
            ),
            F.round(
                F.col("m_micro")
                / F.col("n_docs").cast("double")
                / 1_000_000.0,
                6,
            ).alias("avg_margin_r"),
        )
        .orderBy("band")
    )


def cohens_kappa(
    df: DataFrame, a_col: Column, b_col: Column
) -> DataFrame:
    """Cohen's kappa (1960) between two boolean raters: agreement
    beyond chance, from the 2×2 contingency built in ONE global
    aggregate of exact integers. Returns a single row
    (n, n_both, n_a_only, n_b_only, n_neither, kappa_r).

    kappa = (p_o - p_e) / (1 - p_e) with p_o the observed agreement and
    p_e the marginal-product chance agreement — a fixed scalar double
    expression of the four counts, so both engines compute bit-identical
    values. Degenerate case p_e = 1 (both raters constant) yields NULL
    rather than a division blow-up.
    """
    a = a_col.cast("boolean")
    b = b_col.cast("boolean")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(a & b, 1).otherwise(0)).cast("long").alias("n_both"),
        F.sum(F.when(a & ~b, 1).otherwise(0))
        .cast("long")
        .alias("n_a_only"),
        F.sum(F.when(~a & b, 1).otherwise(0))
        .cast("long")
        .alias("n_b_only"),
        F.sum(F.when(~a & ~b, 1).otherwise(0))
        .cast("long")
        .alias("n_neither"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n_both") + F.col("n_neither")) / n
    pe = (
        (F.col("n_both") + F.col("n_a_only"))
        * (F.col("n_both") + F.col("n_b_only"))
        + (F.col("n_b_only") + F.col("n_neither"))
        * (F.col("n_a_only") + F.col("n_neither"))
    ) / (n * n)
    return agg.select(
        "n",
        "n_both",
        "n_a_only",
        "n_b_only",
        "n_neither",
        F.round(
            F.when(pe < 1.0, (po - pe) / (1.0 - pe)),
            6,
        ).alias("kappa_r"),
    )


def _integer_double_ranks(
    df: DataFrame, value_col: str, alias: str
) -> DataFrame:
    """Attach the exact-integer DOUBLE-RANK (2·average tie rank) of
    ``value_col``: r2 = 2·count_below + count_at + 1 — an integer even
    under ties (midrank 2.5 becomes 5), so rank moments sum exactly in
    BIGINT. Built from the distinct-value level table + a
    ``partitioned_prefix_sum`` (no single-task global sort), then a
    value-keyed join back (level-table-sized build side; AQE broadcasts
    it when it fits)."""
    lv = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    lv = partitioned_prefix_sum(
        lv,
        order_by=[F.col("__v")],
        value=F.col("__cnt"),
        alias="__below",
        inclusive=False,
    )
    lv = lv.select(
        F.col("__v").alias(value_col),
        (2 * F.col("__below") + F.col("__cnt") + 1)
        .cast("long")
        .alias(alias),
    )
    return df.join(lv, value_col)


def spearman_rho(
    scored: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Spearman rank correlation between two score columns: Pearson on
    average tie ranks, materialized as exact-integer double-ranks (see
    ``_integer_double_ranks`` — the common 2× scaling of both variables
    cancels in the correlation). Returns a single row (n, rho_r).

    All five moment sums (Σx, Σy, Σxy, Σx², Σy²) are BIGINT over
    integers — exact, shuffle-order-independent — and the correlation is
    one final scalar double expression rounded to 6 dp. Exactness bound:
    Σx² ≤ 4n³, BIGINT-exact to n ≈ 1.3e6 evaluation rows (see module
    docstring).
    """
    # Each ranking pass reads its input twice (level table + join-back)
    # and they nest — uncached, the scorer's lineage would replicate 4x
    # through the plan (observed: 91 scans / 42 sort-merge joins on the
    # NB x DSIR composition). Both frames are evaluation-set-sized.
    scored = scored.select(col_a, col_b).cache()
    ranked = _integer_double_ranks(
        _integer_double_ranks(scored, col_a, "__ra").cache(),
        col_b,
        "__rb",
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__ra").cast("long").alias("sx"),
        F.sum("__rb").cast("long").alias("sy"),
        F.sum(F.col("__ra") * F.col("__rb")).cast("long").alias("sxy"),
        F.sum(F.col("__ra") * F.col("__ra")).cast("long").alias("sxx"),
        F.sum(F.col("__rb") * F.col("__rb")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    dx = n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return m.select(
        "n",
        F.round(
            F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)),
            6,
        ).alias("rho_r"),
    )


def roc_auc_by_group(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group ROC-AUC — one row (group, n_pos, n_neg, auc_r) per
    group; auc_r is NULL for degenerate groups (no positives or no
    negatives), not a division blow-up.

    Scale shape: the obvious per-group cumulative (a window PARTITION
    BY group ORDER BY score) puts each group's ENTIRE level table in
    one task — fatal when a handful of groups hold most of the corpus
    (languages do). Instead the within-group cumulative is derived
    from a single GLOBAL ``partitioned_prefix_sum`` over the (group,
    score) lexicographic total order minus each group's exclusive
    offset: neg_below(g, s) = cum_excl(g, s) - goff(g). The offset
    needs NO second prefix pass (r10 left this open; r11 closed it):
    a group's rows are contiguous in the (g, s) order and ``cum_excl``
    is non-decreasing along it, so the group's FIRST row carries
    exactly the sum of all previous groups' negatives — i.e.
    goff(g) = min(cum_excl) within g — and the numerator expands
    algebraically so one aggregation computes everything:

        Σ pos_at·(2·neg_below + neg_at)
      = 2·Σ pos_at·cum_excl − 2·goff·Σ pos_at + Σ pos_at·neg_at

    All terms are exact BIGINT sums (bound: n_pos(g)·n_neg_total per
    group — same order as the old n_pos(g)·n_neg(g) bound, exact to
    ~3e9 positives × 3e9 negatives). ONE prefix-sum materialization,
    ONE shuffle-free-reusable aggregation; no offsets join, no cache
    (the level table now has a single consumer).
    """
    lv = scored.groupBy(
        F.col(group_col).alias("g"), F.col(score_col).alias("s")
    ).agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("pos_at"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("neg_at"),
    )
    lv = partitioned_prefix_sum(
        lv,
        order_by=[F.col("g"), F.col("s")],
        value=F.col("neg_at"),
        alias="cum_excl",
        inclusive=False,
    )
    out = lv.groupBy("g").agg(
        F.sum("pos_at").cast("long").alias("n_pos"),
        F.sum("neg_at").cast("long").alias("n_neg"),
        F.sum(F.col("pos_at") * F.col("cum_excl"))
        .cast("long")
        .alias("__spc"),
        F.sum(F.col("pos_at") * F.col("neg_at"))
        .cast("long")
        .alias("__spn"),
        F.min("cum_excl").cast("long").alias("__goff"),
    )
    num2 = (
        2 * (F.col("__spc") - F.col("__goff") * F.col("n_pos"))
        + F.col("__spn")
    )
    return out.select(
        F.col("g").alias(group_col),
        "n_pos",
        "n_neg",
        F.round(
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                num2 / (2.0 * F.col("n_pos") * F.col("n_neg")),
            ),
            6,
        ).alias("auc_r"),
    )


def pr_threshold_sweep(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float] = (-2.5, -2.0, -1.5, -1.0, -0.5, 0.0),
) -> DataFrame:
    """Precision / recall / F1 at each decision threshold — the table
    that picks an operating point once AUC says the ranking is good.
    Returns (thr, tp, pp, n_pos, precision_r, recall_r, f1_r); empty
    prediction sets yield NULL precision, never a blow-up. F1 uses the
    integer identity 2·TP / (PP + P) so the only doubles are final
    divisions of exact counts.

    Scale shape: the threshold grid is a literal handful of rows
    crossJoined (broadcast) onto the scored frame — |thresholds|×|docs|
    map volume for ONE shuffle keyed on thr; no per-threshold pass."""
    thr = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("thr")
    lab = F.col(label_col)
    pred = F.col(score_col) > F.col("thr")
    return (
        scored.select(F.col(score_col), lab.alias("__lab"), thr)
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("__lab") & pred, 1).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("pp"),
            F.sum(F.when(F.col("__lab"), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
        )
        .select(
            "thr",
            "tp",
            "pp",
            "n_pos",
            F.round(
                F.when(F.col("pp") > 0, F.col("tp") / (F.col("pp") * 1.0)),
                6,
            ).alias("precision_r"),
            F.round(
                F.when(
                    F.col("n_pos") > 0,
                    F.col("tp") / (F.col("n_pos") * 1.0),
                ),
                6,
            ).alias("recall_r"),
            F.round(
                F.when(
                    (F.col("pp") + F.col("n_pos")) > 0,
                    (2 * F.col("tp"))
                    / ((F.col("pp") + F.col("n_pos")) * 1.0),
                ),
                6,
            ).alias("f1_r"),
        )
    )


def token_label_chi2_topk(
    docs: DataFrame,
    label: Column,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k tokens by chi-square association between document-level
    token PRESENCE and a boolean document label — which words the
    curated/rest split actually hinges on (the feature-selection and
    interpretability companion to the NB scorer). Returns (token, a, b,
    chi2_r, label_enriched) where a/b are labeled/unlabeled doc counts
    containing the token and label_enriched says which side the token
    leans; ordering is (chi2_r DESC, token) — rounded before ranking so
    ties break identically in any engine.

    Scale shape: one explode over per-doc DISTINCT tokens (presence,
    not counts) map-side-combines to the vocabulary-sized (a, b) table;
    doc totals are a scalar broadcast; chi2 is a fixed scalar double
    expression (the integer n^5 numerator would overflow BIGINT at
    corpus scale, so ad-bc stays exact in BIGINT and the square happens
    in double); top-k is a TakeOrdered, never a global sort."""
    from bigdata_capstone_spark.operators.relational import top_k
    from bigdata_capstone_spark.operators.textops import tokens_col

    pres = docs.select(
        label.alias("__lab"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("token"),
    )
    counts = pres.groupBy("token").agg(
        F.sum(F.when(F.col("__lab"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("__lab"), 0).otherwise(1))
        .cast("long")
        .alias("b"),
    )
    totals = docs.agg(
        F.sum(F.when(label, 1).otherwise(0)).cast("long").alias("n_lab"),
        F.sum(F.when(label, 0).otherwise(1)).cast("long").alias("n_rest"),
    )
    c = F.col("n_lab") - F.col("a")
    d = F.col("n_rest") - F.col("b")
    det = F.col("a") * d - F.col("b") * c  # exact BIGINT (<= n^2)
    n = (F.col("n_lab") + F.col("n_rest")) * 1.0
    # double from the first factor on: the BIGINT 4-way product would
    # overflow past ~55k docs; left-associated double product is the
    # same fixed expression in both engines
    denom = (
        (F.col("a") + F.col("b")) * 1.0
        * (c + d)
        * F.col("n_lab")
        * F.col("n_rest")
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "a",
        "b",
        F.round(
            F.when(denom > 0, n * (det * 1.0) * (det * 1.0) / denom),
            6,
        ).alias("chi2_r"),
        (det > 0).alias("label_enriched"),
    )
    return top_k(
        scored,
        [F.col("chi2_r").desc(), F.col("token")],
        k,
    )
