"""Seeded distributed sampling (SURVEY §2.9 M9, §2.12 Q4).

The reference sampled 100 random user pairs *on the driver* with unseeded
``random.sample`` over a collected user list (customer_segmentation_2.py:
62-72) — O(users) collect, irreproducible, and a scale wall. Here sampling
is distributed and keyed by a seeded md5 hash, so it is deterministic for a
given seed, independent of partitioning, and never collects the population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_capstone_spark.functions.portable import salted_md5_long


def seeded_sample_n(df: DataFrame, key_col: str, n: int, seed: int = 42) -> DataFrame:
    """Deterministic n-row sample: order by a seeded hash of the key and
    take n. Plans as TakeOrderedAndProject — no global sort materialized."""
    return df.orderBy(
        salted_md5_long(F.col(key_col).cast("string"), seed), F.col(key_col)
    ).limit(n)


def seeded_random_pairs(
    population: DataFrame, key_col: str, n_pairs: int, seed: int = 42
) -> DataFrame:
    """n disjoint random (a, b) pairs with a < b, fully distributed.

    Takes 2n hash-sampled rows, indexes them with a DISTRIBUTED row_number
    over the hash order (relational.partitioned_row_number — no
    single-partition WindowExec even on the bounded sample), and mates row
    2i with row 2i+1 — the distributed replacement for the reference's
    driver-side ``random.sample(users, 2)`` loop, with an explicit seed
    (Q4 fix).
    """
    from bigdata_capstone_spark.operators.relational import (
        partitioned_row_number,
    )

    sample = seeded_sample_n(population.select(key_col).distinct(), key_col, 2 * n_pairs, seed)
    hashed = sample.withColumn(
        "__h", salted_md5_long(F.col(key_col).cast("string"), seed)
    )
    indexed = (
        partitioned_row_number(
            hashed, [F.col("__h"), F.col(key_col)], "__rn"
        )
        .withColumn("__idx", F.col("__rn") - 1)
        .drop("__h", "__rn")
    )
    left = indexed.filter(F.col("__idx") % 2 == 0).select(
        (F.col("__idx") / 2).cast("long").alias("__pair"),
        F.col(key_col).alias("a"),
    )
    right = indexed.filter(F.col("__idx") % 2 == 1).select(
        ((F.col("__idx") - 1) / 2).cast("long").alias("__pair"),
        F.col(key_col).alias("b"),
    )
    pairs = left.join(right, on="__pair").select(
        F.least("a", "b").alias("userA"), F.greatest("a", "b").alias("userB")
    )
    return pairs


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle + fixed sharding for training export.

    Training runs need the corpus in a random-but-REPRODUCIBLE order,
    pre-split into a fixed number of shards (one per output file /
    reader). Both decisions are pure functions of a seeded PRF hash of
    the key: ``shard = h % n_shards``, ``pos`` = the row's rank within
    its shard by (h, key). No RNG state, independent of input
    partitioning, and any engine can replay it — rerunning the export
    yields byte-identical shard files.

    Scale shape: ONE hash shuffle on ``shard`` + a per-shard sort (the
    window). Shard count is the parallelism dial: at 100 TB you run
    thousands of shards (shard ~ output file of a few GB), so each
    per-shard sort fits an executor; writing is then
    ``partitionBy(shard)`` with zero further movement.
    """
    h = salted_md5_long(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .drop("__h")
    )


def epoch_repeat_factors(
    df: DataFrame,
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Repeat-factor epoch mixture: UP-sample low-resource groups to the
    size of the largest one, fractionally — the complement of the
    temperature DOWN-sampling dial (`docs_temperature_rebalance`). Each
    group's repeat factor is ``f = sqrt(n_max / n_group)`` (>= 1; 1 for
    the largest group; sqrt = alpha=0.5 damping, pinned because sqrt is
    correctly-rounded IEEE in every engine while pow is not). A document
    is emitted ``floor(f)`` times plus one more iff its per-doc PRF
    micro-unit draw falls under ``frac(f)`` — so group totals land
    within 1 of ``n_group * f`` in expectation with zero RNG state.

    Scale shape: group sizes are a tiny aggregate broadcast back onto the
    scan; the copy decision is a map-side expression — no shuffle of the
    corpus at any size. Returns per-doc (key, group, n_copies,
    repeat_factor_r); materializing the copies is
    ``explode(sequence(1, n_copies))`` at write time.
    """
    # sizes materialized once (|groups| rows, eager localCheckpoint —
    # not .cache(), so a loop caller holds no pinned entry; ADVICE r9):
    # nmax and factors both reuse it — unmaterialized, each reuse
    # re-scans the corpus
    sizes = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    nmax = sizes.agg(F.max("__n").alias("__nmax"))
    factors = sizes.crossJoin(F.broadcast(nmax)).select(
        group_col,
        (F.sqrt(F.col("__nmax").cast("double") / F.col("__n").cast("double"))
         ).alias("__f"),
    )
    draw = F.pmod(
        salted_md5_long(F.col(key_col).cast("string"), seed), F.lit(1000000)
    )
    return (
        df.join(F.broadcast(factors), on=group_col)
        .select(
            key_col,
            group_col,
            (
                F.floor("__f")
                + F.when(
                    draw
                    < F.floor((F.col("__f") - F.floor("__f")) * 1e6).cast(
                        "long"
                    ),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_copies"),
            F.round("__f", 6).alias("repeat_factor_r"),
        )
    )


def hamilton_quotas(
    sizes: DataFrame, stratum_col: str, total_n: int
) -> DataFrame:
    """Largest-remainder (Hamilton) seat apportionment over a
    (stratum, __ns) size frame → (stratum, quota): floor(total_n*n_s/N)
    seats up front, leftover seats to the largest integer remainders
    (tie: stratum value ASC). All integer arithmetic on the
    |strata|-sized frame; the one ranking window runs under the
    constant-scope cache barrier. Shared by the batch sample and the
    streaming panel pick so the two can never drift."""
    tot = sizes.agg(F.sum("__ns").cast("long").alias("__n"))
    # integer-exact floor: (t*ns - t*ns % n) / n divides exactly, so the
    # double intermediate is integral — no float-floor boundary risk
    seats = F.lit(total_n) * F.col("__ns")
    rem = seats % F.col("__n")
    base = sizes.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        "__ns",
        rem.alias("__rem"),
        ((seats - rem) / F.col("__n")).cast("long").alias("__floor_q"),
    )
    from bigdata_capstone_spark.operators.relational import constant_scope

    base = constant_scope(base)
    leftover = base.agg(
        (F.lit(total_n) - F.sum("__floor_q")).cast("long").alias("__left")
    )
    w = Window.partitionBy("__s").orderBy(
        F.desc("__rem"), F.col(stratum_col)
    )
    return (
        base.crossJoin(F.broadcast(leftover))
        .withColumn("__seat_rank", F.row_number().over(w))
        .select(
            stratum_col,
            (
                F.col("__floor_q")
                + F.when(
                    F.col("__seat_rank") <= F.col("__left"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    total_n: int,
    seed: int = 42,
    safety: int = 8,
) -> DataFrame:
    """Deterministic PROPORTIONAL stratified sample of ``total_n`` rows:
    each stratum's quota is its exact proportional share apportioned by
    the largest-remainder (Hamilton) method — floor(total_n * n_s / N)
    seats up front, leftover seats to the largest integer remainders
    (tie: stratum value ASC) — then the quota is filled by the seeded
    PRF order (md5 of the key, key tie-break) WITHIN the stratum. Every
    decision is integer arithmetic or a hash order, so any engine
    replays the exact member set: the reproducible eval-panel /
    annotation-batch constructor (a panel that drifts when the corpus
    is re-partitioned is useless as a benchmark).

    Returns the sampled rows: (stratum, key, quota, pick_rank).
    Empty-stratum note: quotas derive from the observed strata, so the
    sample always has exactly ``total_n`` rows when N >= total_n
    (Hamilton seats sum to total_n by construction).

    Scale shape — TWO-PHASE THRESHOLD PICK (re-planned per the r8
    verdict: the previous single window partitioned by a
    low-cardinality stratum column funneled each stratum's ENTIRE row
    set through one task's sort — a single-task sort of billions of
    rows at 100x). Phase 1: stratum sizes are one map-side-combined
    groupBy; all Hamilton seat arithmetic runs on that |strata|-sized
    frame, which is then COLLECTED driver-side (metadata-sized — the
    same stats-then-plan move AQE makes) to derive a per-stratum hash
    cutoff ≈ MD5_LONG_MAX * quota/n_s * safety. Phase 2: a broadcast
    map-side filter ``h < cutoff`` keeps ~quota*safety rows per
    stratum; the exact-rank window runs over ONLY those survivors, so
    its largest partition is ~quota*safety rows regardless of corpus
    size. Strata with n_s <= quota*safety keep every row (cutoff =
    MAX) — they are quota-bounded by definition. The picked set is
    UNCHANGED: if >= quota rows clear the cutoff, the quota smallest
    (h, key) rows of the whole stratum all clear it too, so ranks
    below the quota agree with the full-stratum ranks; a survivor
    shortfall (hash fluctuation beyond the safety factor) is detected
    by one per-stratum count and retried with safety x8 — the RESULT
    is identical for every safety, only the plan changes."""
    # |strata| rows, read by the total, the seat arithmetic and the
    # driver-side cutoff collect below — eager localCheckpoint, not
    # .cache() (no pinned entry per call; ADVICE r9)
    sizes = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__ns"))
        .localCheckpoint(eager=True)
    )
    quotas = hamilton_quotas(sizes, stratum_col, total_n)
    # ---- phase 2: broadcast per-stratum hash cutoff, exact-rank only
    # the survivors. stats collect is |strata| rows (metadata-sized).
    from pyspark.sql.types import LongType, StructField, StructType

    from bigdata_capstone_spark.functions.portable import MD5_LONG_MAX

    spark = df.sparkSession
    stats = {
        r[stratum_col]: (int(r["quota"]), int(r["__ns"]))
        for r in quotas.join(sizes, on=stratum_col).collect()
    }
    cut_schema = StructType(
        [
            df.select(stratum_col).schema.fields[0],
            StructField("quota", LongType(), False),
            StructField("__cutoff", LongType(), False),
        ]
    )
    hcol = salted_md5_long(F.col(key_col).cast("string"), seed)
    cur_safety = {s: int(safety) for s in stats}

    def cutoff_frame() -> DataFrame:
        rows = []
        for s, (q, ns) in stats.items():
            if q <= 0:
                cut = 0  # no seats: drop the stratum map-side
            elif q * cur_safety[s] >= ns:
                cut = MD5_LONG_MAX  # whole stratum <= quota*safety rows
            else:
                cut = -(-MD5_LONG_MAX * q * cur_safety[s] // ns)  # ceil
            rows.append((s, q, cut))
        return spark.createDataFrame(rows, cut_schema)

    while True:
        cuts = cutoff_frame()
        surv = (
            df.select(stratum_col, F.col(key_col), hcol.alias("__h"))
            .join(F.broadcast(cuts), on=stratum_col)
            .filter(F.col("__h") < F.col("__cutoff"))
        )
        # shortfall check: one map-side-filtered count per stratum.
        # MAX-cutoff strata cannot be short (every row survives; quota
        # <= n_s by Hamilton), so only thresholded strata are checked.
        counts = {
            r[stratum_col]: r["__c"]
            for r in surv.groupBy(stratum_col)
            .agg(F.count(F.lit(1)).alias("__c"))
            .collect()
        }
        short = [
            s
            for s, (q, ns) in stats.items()
            if 0 < q * cur_safety[s] < ns and counts.get(s, 0) < q
        ]
        if not short:
            break
        for s in short:  # hash fluctuation beyond safety: widen & retry
            cur_safety[s] *= 8
    picked = surv.withColumn(
        "pick_rank",
        F.row_number().over(
            Window.partitionBy(stratum_col).orderBy("__h", key_col)
        ),
    )
    return (
        picked.filter(F.col("pick_rank") <= F.col("quota"))
        .select(
            stratum_col,
            key_col,
            "quota",
            F.col("pick_rank").cast("long").alias("pick_rank"),
        )
    )


# ---------------------------------------------------------------------------
# STREAMING eval-panel maintenance (r9): the stratified sample as a
# MERGEABLE STATE — the seventh mergeable-state family (HLL / CMS /
# Bloom / bins / PSI contingency / quantile sketch / this). Hamilton
# quotas depend on GLOBAL stratum sizes, which a stream only knows at
# read time; but any stratum's quota is <= total_n, so keeping (a)
# per-stratum exact sizes (mergeable counts) and (b) the total_n
# smallest (h, key) rows per stratum (mergeable under union +
# re-truncate) is sufficient state to answer the EXACT batch sample at
# any point. State is |strata| * (total_n + 1) rows however many
# documents stream through; the pick replays the batch arithmetic, so
# the drained snapshot shares the batch oracle bit-for-bit.
# ---------------------------------------------------------------------------


def stratified_panel_state(
    batch: DataFrame,
    stratum_col: str,
    key_col: str,
    total_n: int,
    seed: int = 42,
) -> DataFrame:
    """Bounded panel state for one batch: size rows (key NULL, ns =
    batch count per stratum) + pool rows (the batch's total_n smallest
    (h, key) per stratum, key/h set, ns NULL). The pool pick uses the
    two-phase grouped top-k, so no whole-stratum single-task sort even
    when one micro-batch is large.

    REQUIREMENT (beside the key-uniqueness contract): ``key_col`` must
    be non-NULL — ``key IS NULL`` is the state's size-vs-pool row
    discriminator, so a NULL item key would corrupt both the counts
    and the pool (ADVICE r9). NULL-key rows are filtered out here, at
    state-build time, so they can never enter the state; callers that
    need them sampled must assign a surrogate key first."""
    from bigdata_capstone_spark.operators.relational import (
        grouped_top_k_twophase,
    )

    hashed = batch.filter(F.col(key_col).isNotNull()).select(
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(key_col).cast("string").alias("key"),
        salted_md5_long(F.col(key_col).cast("string"), seed).alias("__h"),
    )
    sizes = hashed.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("ns")
    ).select(
        "stratum",
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("long").alias("__h"),
        "ns",
    )
    pool = grouped_top_k_twophase(
        hashed, ["stratum"], [F.col("__h"), F.col("key")], total_n,
        sub_key=["key"],
    ).select(
        "stratum", "key", "__h", F.lit(None).cast("long").alias("ns")
    )
    return sizes.unionByName(pool)


def stratified_panel_merge(
    states: "list[DataFrame]", total_n: int
) -> DataFrame:
    """Merge panel states over DISJOINT item sets: sizes add; pools
    union and re-truncate to the total_n smallest per stratum. Both
    parts are canonical functions of the item multiset, so shard trees
    and streaming folds land on identical state (associative +
    commutative). All inputs are state-sized."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    u = u.cache()
    sizes = (
        u.filter(F.col("key").isNull())
        .groupBy("stratum")
        .agg(F.sum("ns").cast("long").alias("ns"))
        .select(
            "stratum",
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("long").alias("__h"),
            "ns",
        )
    )
    pool = (
        u.filter(F.col("key").isNotNull())
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("stratum").orderBy("__h", "key")
            ),
        )
        .filter(F.col("__rk") <= total_n)
        .select(
            "stratum", "key", "__h", F.lit(None).cast("long").alias("ns")
        )
    )
    merged = sizes.unionByName(pool).localCheckpoint(eager=True)
    u.unpersist()
    return merged


def stratified_panel_pick(
    state: DataFrame, total_n: int
) -> DataFrame:
    """The EXACT batch stratified sample from a panel state: Hamilton
    quotas from the folded sizes, picks from the pool's hash order —
    identical rows to :func:`stratified_sample` over the union of every
    batch (quota <= total_n guarantees the pool holds every potential
    pick). Window runs over the bounded state."""
    sizes = state.filter(F.col("key").isNull()).select(
        F.col("stratum"), F.col("ns").alias("__ns")
    )
    quotas = hamilton_quotas(sizes, "stratum", total_n)
    picked = (
        state.filter(F.col("key").isNotNull())
        .withColumn(
            "pick_rank",
            F.row_number().over(
                Window.partitionBy("stratum").orderBy("__h", "key")
            ),
        )
        .join(F.broadcast(quotas), on="stratum")
        .filter(F.col("pick_rank") <= F.col("quota"))
    )
    return picked.select(
        "stratum",
        "key",
        "quota",
        F.col("pick_rank").cast("long").alias("pick_rank"),
    )
