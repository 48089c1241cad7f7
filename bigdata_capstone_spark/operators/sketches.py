"""Deterministic cardinality / frequency sketches as pure DataFrame ops.

The north star asks for "a novel sketch" implemented Spark-first. Spark
ships approx_count_distinct (HLL++) and count_min_sketch, but their
results depend on engine-internal hash functions and are therefore not
oracle-checkable. These versions re-derive both sketches from the
engine's portable md5 hash family (functions/portable.py), making every
register value — and the final estimate — bit-identical between Spark
and DuckDB while keeping the exact scale behavior that makes sketches
worth using:

- HyperLogLog: any input size collapses to m=2^b integer registers per
  group (map-side combinable ``max``); the shuffle carries at most
  groups×m tiny rows.
- Count-Min: any input size collapses to a fixed d×w counter grid
  (map-side combinable ``count``); point queries are a broadcast join
  against that grid.

Floating-point discipline: the HLL harmonic sum folds ``2^-rho`` terms
in bucket order via a left fold seeded with 0.0 — ``0.0 + x == x``
exactly in IEEE — so Spark's ``aggregate`` and DuckDB's ``list_reduce``
(which seeds with the first element) produce the same double. Both
engines then round once at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_capstone_spark.functions.portable import md5_long, md5_long_sql

# alpha for m=64 registers (0.7213 / (1 + 1.079/m), fixed by definition so
# both engines embed the identical literal).
HLL_ALPHA_64 = 0.709
HLL_M_BITS = 6  # m = 64 registers
HLL_M = 1 << HLL_M_BITS
# md5_long is 60 bits; after the 6 bucket bits, 54 value bits remain.
_VALUE_BITS = 60 - HLL_M_BITS


def hll_bucket_rho(key_col: Column) -> tuple[Column, Column]:
    """(bucket, rho) columns for one key — the map-side HLL observation.
    Exposed so STREAMING register maintenance can compute per-batch
    partials with the identical expressions the batch sketch uses."""
    h = md5_long(key_col)
    v = F.shiftright(h, HLL_M_BITS)
    rho = F.lit(_VALUE_BITS + 1) - F.length(F.bin(v))
    return (h % HLL_M), rho


def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: Column
) -> DataFrame:
    """Per-group HLL registers: (group..., bucket, rho_max).

    bucket = low 6 bits of md5_long(key); rho = leading-zero count of the
    remaining 54 bits + 1, computed portably as ``55 - length(bin(v))``
    (``bin`` drops leading zeros in both engines, ``bin(0) = '0'``).
    The ``max`` aggregate is map-side combinable, so at 100 TB each
    executor emits at most groups×64 rows into the shuffle.
    """
    bucket, rho = hll_bucket_rho(key_col)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(
    df: DataFrame, group_cols: list[str], key_col: Column
) -> DataFrame:
    """Per-group raw-HLL distinct estimate (no small/large-range
    correction — the correction branch is part of the sketch definition
    and both engines would need the same one; raw HLL keeps the oracle
    1:1). Empty registers contribute 2^0 = 1 to the harmonic sum.
    """
    regs = hll_registers(df, group_cols, key_col)
    return hll_estimate_from_registers(regs, group_cols)


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Estimate from an existing (group..., bucket, rho_max) register
    table — the read side of register-state maintenance: registers merge
    under max (associative+commutative), so a snapshot folded from any
    batch split estimates identically to one batch pass.

    Zero registers (an all-empty stream through the GLOBAL group_cols=[]
    path — grouped paths simply emit no row) estimate 0, not the
    alpha*m^2/m ≈ 45 artifact raw HLL would produce from 64 phantom empty
    registers; the oracle twin pins the same rule."""
    terms = F.transform(
        F.sort_array(F.collect_list(F.struct("bucket", "rho_max"))),
        lambda s: F.pow(F.lit(2.0), -s["rho_max"]),
    )
    z = F.aggregate(terms, F.lit(0.0), lambda a, x: a + x) + (
        F.lit(float(HLL_M)) - F.size(terms)
    )
    n_regs = F.count(F.lit(1))
    est = F.when(
        n_regs > 0, F.round(F.lit(HLL_ALPHA_64 * HLL_M * HLL_M) / z, 4)
    ).otherwise(F.lit(0.0))
    return regs.groupBy(*group_cols).agg(
        est.alias("hll_estimate"),
        n_regs.alias("n_registers"),
    )


def hll_estimate_sql(table: str, group_col: str, key_expr: str) -> str:
    """DuckDB twin of :func:`hll_estimate` over ``table``."""
    h = md5_long_sql(key_expr)
    return f"""
    WITH regs AS (
      SELECT {group_col}, ({h}) % {HLL_M} AS bucket,
             max({_VALUE_BITS + 1} - length(bin(({h}) >> {HLL_M_BITS}))) AS rho_max
      FROM {table}
      GROUP BY 1, 2
    )
    SELECT {group_col},
           round({HLL_ALPHA_64} * {HLL_M * HLL_M} /
                 (list_reduce(list(power(2.0, -rho_max) ORDER BY bucket),
                              (a, x) -> a + x)::DOUBLE
                  + ({HLL_M} - count(*))::DOUBLE), 4) AS hll_estimate,
           count(*)::BIGINT AS n_registers
    FROM regs
    GROUP BY {group_col}
    """


def _cms_slot(digest: Column, r: Column | int) -> Column:
    """Slot for CMS row r: byte r of the md5 digest (hex chars 2r+1..2r+2).

    One digest serves all d rows — distinct md5 output bytes are
    independent, so this quarters the per-row hash cost vs. d salted
    hashes (same economy as portable.perm_md5_long). Fixes w = 256.
    """
    start = (
        F.lit(1 + 2 * r) if isinstance(r, int) else F.lit(1) + F.col("r") * 2
    )
    return F.conv(digest.substr(start, F.lit(2)), 16, 10).cast("int")


def cms_counters(df: DataFrame, key_col: Column, d: int) -> DataFrame:
    """Count-Min counter grid: (r, slot, cnt) with d rows × 256 slots.

    The output is at most d×256 rows no matter the input size — the
    explode multiplies the fact table by d, but the partial
    hash-aggregate collapses it map-side before any shuffle.
    """
    if not 1 <= d <= 16:
        raise ValueError(f"d must be in [1, 16] (md5 has 16 bytes), got {d}")
    rows = df.select(
        F.md5(key_col).alias("__h"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    return (
        rows.select("r", _cms_slot(F.col("__h"), F.col("r")).alias("slot"))
        .groupBy("r", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    counters: DataFrame, keys: DataFrame, key_col: str, d: int
) -> DataFrame:
    """CMS point query for every row of ``keys``: min over the d counters
    the key hashes into. The counter grid (≤ d×256 rows) is broadcast, so
    probing N keys is a map-only pass."""
    probes = keys.withColumn(
        "__h", F.md5(F.col(key_col).cast("string"))
    ).withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(d - 1)))
    ).withColumn("slot", _cms_slot(F.col("__h"), F.col("r")))
    others = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(counters), ["r", "slot"])
        .groupBy(*others)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter — broadcastable set membership for semi-join
# pruning. At 100 TB the use is: build the filter over the SMALL side's
# keys (one map-side-combinable bit_or aggregate), broadcast the ~8 KB
# bitmap, and drop non-members from the BIG side before it ever reaches
# the shuffle of an exact semi-join. False positives survive the probe
# and are removed by the exact join, so results are identical to the
# plain semi-join — the filter only changes how many rows pay the
# shuffle. All bit positions are md5 slices: deterministic, engine-
# portable, no RNG.
# ---------------------------------------------------------------------------


def _bloom_positions(key_col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions per key: 4-hex-char (16-bit) slices of the md5
    digest, masked down to m_bits. One digest serves all k probes."""
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in [1, 8] (8 x 4 hex chars), got {k}")
    if not 6 <= m_bits <= 16:
        raise ValueError(f"m_bits must be in [6, 16], got {m_bits}")
    digest = F.md5(key_col)
    m = 1 << m_bits
    return [
        (F.conv(digest.substr(1 + 4 * i, 4), 16, 10).cast("long") % m)
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: Column, m_bits: int = 16, k: int = 4
) -> DataFrame:
    """One-row DataFrame holding the bitmap: (bloom: array<long>, 2^m_bits
    bits packed 64 per word). The bit_or aggregate combines map-side, so
    the shuffle carries at most partitions × (2^m_bits / 64) words."""
    pos = df.select(
        F.explode(F.array(*_bloom_positions(key_col, m_bits, k))).alias("pos")
    )
    entries = (
        pos.select(
            F.shiftright("pos", 6).cast("int").alias("widx"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("word"))
    )
    return bloom_entries_to_bitmap(entries, m_bits)


def bloom_entries_to_bitmap(entries: DataFrame, m_bits: int) -> DataFrame:
    """Assemble sparse (widx, word) entries into the dense 1-row bitmap
    array ``bloom_probe`` consumes. Exposed so STREAMING maintenance can
    keep the entries as mergeable state (words merge under bitwise OR)
    and densify only at read time."""
    n_words = (1 << m_bits) >> 6
    # element_at on a MAP looks up BY KEY (unlike the 1-based positional
    # lookup on arrays): dense array slot i must read map key i, so that
    # the probe's 1-based element_at(bloom, widx + 1) lands on word widx.
    return entries.agg(
        F.map_from_entries(F.collect_list(F.struct("widx", "word"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at("m", i), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def bloom_probe(
    df: DataFrame, bitmap: DataFrame, key_col: Column, m_bits: int = 16, k: int = 4
) -> DataFrame:
    """Rows of ``df`` whose key is PROBABLY in the built set (no false
    negatives). The 1-row bitmap is broadcast; the probe is pure integer
    column arithmetic — no shuffle, no UDF."""
    probed = df.crossJoin(F.broadcast(bitmap.withColumnRenamed("bloom", "__bloom")))
    for i, pos in enumerate(_bloom_positions(key_col, m_bits, k)):
        probed = probed.withColumn(f"__p{i}", pos)
    cond = " AND ".join(
        f"((shiftright(element_at(__bloom, CAST(shiftright(__p{i}, 6) AS INT) + 1),"
        f" CAST(__p{i} % 64 AS INT)) & 1) = 1)"
        for i in range(k)
    )
    return probed.filter(F.expr(cond)).drop(
        "__bloom", *[f"__p{i}" for i in range(k)]
    )


# ---------------------------------------------------------------------------
# Portable quantile sketch — fixed-width bin histogram (fourth mergeable
# family: HLL merges under max, CMS under +, Bloom under |, quantile bins
# under +). Bin counts are exact BIGINTs, so the sketch is deterministic,
# engine-portable, and batch-split-independent; quantile answers are
# discrete order statistics over the bins (error <= bin_width, one-sided:
# the reported value is the upper edge of the bin holding the target
# rank). At 100 TB the sketch is |groups| x |occupied bins| rows however
# many values stream through — the per-group value distribution
# dashboard at constant state. Pick bin_width a power of two (0.25,
# 0.5 ...) so value/width and (bin+1)*width are EXACT float ops in every
# engine.
# ---------------------------------------------------------------------------


def quantile_bins(
    df: DataFrame, group_cols: list[str], value_col: Column, bin_width: float
) -> DataFrame:
    """Per-group fixed-width histogram: (group..., bin, cnt) with
    ``bin = floor(value / bin_width)``. The map-side-combined count is
    the whole sketch; merging two sketches is adding counts per bin."""
    b = F.floor(value_col / F.lit(bin_width)).cast("long")
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _quantile_label(q: float) -> str:
    """Collision-free column label for quantile ``q``: ``0.5 -> '50'``,
    ``0.999 -> '99_9'``, ``0.0005 -> '0_05'`` (the old ``int(q*100)``
    truncation mapped 0.999 and 0.99 both to 99)."""
    return f"{q * 100:g}".replace(".", "_").replace("-", "m")


def quantiles_from_bins(
    bins: DataFrame,
    group_cols: list[str],
    bin_width: float,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from a bin sketch: for each q, the
    upper edge of the first bin whose cumulative count reaches
    ``ceil(q * total)``. The cumsum window partitions by group (bounded
    by occupied bins per group); totals broadcast back as a tiny
    aggregate. The bin frame feeds both consumers, so it is cached
    (sketch-sized by definition) — without this the upstream fact scan
    would run TWICE (once for the cumsum, once for the totals).

    ``group_cols`` must be non-empty: an empty list would plan
    ``Window.partitionBy()`` — the single-partition WindowExec this repo
    bans. For a global sketch, add a constant group column (the bins
    frame is sketch-sized, so one group is still tiny) — see
    ``event_value_quantiles_global`` in the catalog.
    """
    from pyspark.sql.window import Window

    if not group_cols:
        raise ValueError(
            "quantiles_from_bins requires non-empty group_cols (an empty "
            "partitionBy would plan a single-partition window); add a "
            "constant group column for the global case"
        )
    labels = [_quantile_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide for qs={qs!r}: {labels}")

    bins = bins.cache()
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("cum", F.sum("cnt").over(w))
    totals = bins.groupBy(*group_cols).agg(F.sum("cnt").alias("total"))
    j = cum.join(F.broadcast(totals), on=group_cols)
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("total")),
                F.col("bin"),
            )
        ).alias(f"__b{lbl}")
        for q, lbl in zip(qs, labels)
    ]
    out = j.groupBy(*group_cols).agg(*aggs, F.max("total").alias("n_rows"))
    for lbl in labels:
        out = out.withColumn(
            f"p{lbl}",
            F.round((F.col(f"__b{lbl}") + 1) * F.lit(bin_width), 6),
        ).drop(f"__b{lbl}")
    return out


def hll_set_overlap(
    df_a: DataFrame, df_b: DataFrame, key_col: Column
) -> DataFrame:
    """HLL SET ALGEBRA: estimated audience overlap |A∩B| between two
    keyed sets by inclusion-exclusion over MERGED registers —
    est(A) + est(B) − est(A∪B), where the union's registers are the
    element-wise max of the two sides' registers (the same merge law
    the streaming snapshots rely on, applied as set algebra; HLL has no
    native intersection, inclusion-exclusion IS the standard estimator).

    Returns one row: (est_a, est_b, est_union, est_overlap), each
    rounded to 4 dp (overlap computed FROM the rounded estimates, so
    any engine replays it). Scale shape: each side collapses to ≤ 64
    register rows map-side; the merge is a 128-row groupBy; the three
    harmonic folds and the subtraction are scalar work. Estimating
    overlap across two 100 TB event streams costs two corpus scans and
    bytes of shuffle."""
    regs_a = hll_registers(df_a, [], key_col)
    regs_b = hll_registers(df_b, [], key_col)
    merged = (
        regs_a.unionByName(regs_b)
        .groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )

    def est(regs: DataFrame, name: str) -> DataFrame:
        return hll_estimate_from_registers(regs, []).select(
            F.col("hll_estimate").alias(name)
        )

    return (
        est(regs_a, "est_a")
        .crossJoin(est(regs_b, "est_b"))
        .crossJoin(est(merged, "est_union"))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_overlap"),
        )
    )


def cms_join_size_estimate(
    df_a: DataFrame,
    key_a: Column,
    df_b: DataFrame,
    key_b: Column,
    d: int = 4,
) -> DataFrame:
    """Join-cardinality estimate as SKETCH ALGEBRA (the AMS/Count-Min
    inner product, Cormode & Muthukrishnan §4.2): |A ⋈ B| on a key is
    sum over keys of cnt_A(k)·cnt_B(k), estimated as the MIN over the d
    CMS rows of the row-wise dot product of the two sides' counter
    grids — an upper bound that never reads either table again once the
    two ≤ d×256-row sketches exist. This is the statistic a
    cost-based optimizer wants before committing to a join strategy,
    and both grids are the same mergeable CMS the heavy-hitter path
    maintains per shard (counters add), so the estimate is available
    incrementally at 100 TB for the price of two map-side-combined
    passes — or zero, if the sketches are already maintained.

    Returns one row: (est_join_size BIGINT). All-integer arithmetic
    (long products, long sums, min) — no float anywhere."""
    ca = cms_counters(df_a, key_a, d)
    cb = cms_counters(df_b, key_b, d)
    dots = (
        ca.join(
            cb.select(
                "r", "slot", F.col("cnt").alias("__cnt_b")
            ),
            on=["r", "slot"],
        )
        .groupBy("r")
        .agg(F.sum(F.col("cnt") * F.col("__cnt_b")).alias("__dot"))
    )
    # a CMS row with NO slot overlap has dot 0 — it must win the min
    # (disjoint key sets estimate 0), not vanish from the aggregate
    salts = df_a.sparkSession.range(d).select(F.col("id").cast("int").alias("r"))
    return (
        salts.join(dots, "r", "left")
        .select(F.coalesce(F.col("__dot"), F.lit(0)).alias("__dot"))
        .agg(F.min("__dot").cast("long").alias("est_join_size"))
    )


# ---------------------------------------------------------------------------
# Bounded-error mergeable quantile sketch — the SIXTH mergeable-state
# family (HLL: max, CMS/bins: +, Bloom: OR, PSI contingency: +, and now
# level-sampling: union-and-recompact), and the first with a rank-error
# guarantee over an UNKNOWN, unbounded value domain (the fixed-width bin
# sketch above needs a bin width — i.e. a domain — a priori).
#
# Design: a KLL-style compactor cascade where the per-item compaction
# "coin" is a PRF of the item key instead of an RNG draw. Item i sits at
# level lvl(i) = trailing-zero-bits of md5_long('qs:' || key) — i.e. the
# item survives compaction 1..ℓ iff its first ℓ hash bits are zero. The
# sketch state is every item with lvl >= thr plus the threshold itself,
# where thr is the MINIMAL integer making the kept count fit `capacity`.
# PRF coins make the state a CANONICAL function of the item SET:
#   compact(state(A) ∪ state(B)) == state(A ∪ B)   (bit-for-bit)
# — an exact merge group law true randomized KLL cannot have (its state
# depends on arrival order), which is what lets shard-merge and
# streaming maintenance share ONE oracle with the batch build, like the
# five families before it. The trade: kept items form a uniform
# 2^-thr-rate hash sample, so the rank error is the sampling bound
# ε ≈ sqrt(ln(2/δ) / (2·m)) of DKW (m = kept rows) rather than
# randomized-KLL's O(1/m) — ~3% of n at m=512, the monitoring regime
# this engine's drift/quality dashboards run in. Reference framing:
# Karnin-Lang-Liberty (FOCS'16) for the compactor cascade; the PRF-coin
# canonicalization follows the engine's seeded-PRF discipline
# (functions/portable.py) so DuckDB replays every decision.
#
# Scale shape: lvl is a map-side expression; thr derives from a ≤41-row
# (lvl, count) contingency; the state is ≤`capacity` rows however many
# values stream through; merge = union + one recompact over state-sized
# frames, O(batch) for streaming ingest.
# ---------------------------------------------------------------------------

QSKETCH_MAX_LVL = 40


def qsketch_lvl_col(key_col: Column) -> Column:
    """Compaction level of an item: trailing-zero-bits of its 60-bit PRF
    hash, capped at QSKETCH_MAX_LVL (P(cap) = 2^-40 — unreachable in
    practice, but keeps the expression total). Pure integer indicators
    (h % 2^j == 0), identical in any engine — no log2/float bit tricks
    whose libm rounding could differ."""
    h = md5_long(F.concat(F.lit("qs:"), key_col.cast("string")))
    lvl = F.lit(0)
    for j in range(1, QSKETCH_MAX_LVL + 1):
        lvl = lvl + F.when(h % F.lit(1 << j) == 0, 1).otherwise(0)
    return lvl.cast("int")


def qsketch_lvl_sql(hash_col: str = "__h") -> str:
    """DuckDB twin of :func:`qsketch_lvl_col` over a precomputed 60-bit
    hash COLUMN (default ``__h`` — materialize ``md5('qs:' || key)``
    once; inlining the md5 40 times re-hashes per indicator). The
    parameter names that hash column and is interpolated verbatim."""
    terms = " + ".join(
        f"CASE WHEN {hash_col} % {1 << j} = 0 THEN 1 ELSE 0 END"
        for j in range(1, QSKETCH_MAX_LVL + 1)
    )
    return f"({terms})::INT"


def qsketch_items(df: DataFrame, key_col: Column, value_col: Column) -> DataFrame:
    """(qs_id, value, lvl) item rows — the sketch's raw input. ``key_col``
    must be unique per row (the PRF coin is per-item; duplicate keys
    would correlate their coins and bias the sample)."""
    return df.select(
        key_col.cast("string").alias("qs_id"),
        value_col.cast("double").alias("value"),
    ).withColumn("lvl", qsketch_lvl_col(F.col("qs_id")))


def qsketch_compact(
    items: DataFrame, capacity: int, floor: DataFrame | None = None
) -> DataFrame:
    """Canonical compaction: keep items with lvl >= thr, where thr is
    the minimal INTEGER (not merely minimal present level — integer
    minimality is what makes the merge law exact when one shard's items
    all happen to sit high) such that the kept count <= capacity:
    thr = max over levels L with count(lvl >= L) > capacity of (L+1),
    or 0 when everything fits. Returns (qs_id, value, lvl, thr) with
    thr constant across rows — the state carries its own threshold so a
    merge can floor at max(thr_a, thr_b) before recompacting.

    ``floor`` (a 1-row (__floor) frame, used by :func:`qsketch_merge`)
    marks that ``items`` were already filtered to lvl >= __floor: the
    recomputed threshold is then max(__floor, minimal-over-items).
    Without this clamp the merge law breaks EXACTLY when the carried
    floor already equals the from-scratch threshold — the floored
    survivors fit capacity, no level exceeds it, and the recompaction
    would record thr = 0 while the from-scratch build records the
    floor (the kept ROWS still matched, which is why small-split tests
    passed; a 4-shard sequential fold caught the thr column drift).

    The (lvl, count) contingency is <=41 rows; its cumulative count runs
    under a constant scope key via the cache-barrier recipe
    (relational.constant_scope) so no unpartitioned window ever touches
    item rows."""
    from pyspark.sql.window import Window

    from bigdata_capstone_spark.operators.relational import constant_scope

    per = constant_scope(
        items.groupBy("lvl").agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("__s")
        .orderBy(F.desc("lvl"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select("lvl", F.sum("cnt").over(w).alias("cum"))
    cand = cum.agg(
        F.coalesce(
            F.max(F.when(F.col("cum") > capacity, F.col("lvl") + 1)),
            F.lit(0),
        )
        .cast("int")
        .alias("__cand")
    )
    if floor is not None:
        thr = cand.crossJoin(F.broadcast(floor)).select(
            F.greatest(F.col("__cand"), F.col("__floor"))
            .cast("int")
            .alias("thr")
        )
    else:
        thr = cand.select(F.col("__cand").alias("thr"))
    return (
        items.crossJoin(F.broadcast(thr))
        .filter(F.col("lvl") >= F.col("thr"))
        .select("qs_id", "value", "lvl", "thr")
    )


def qsketch_build(
    df: DataFrame, key_col: Column, value_col: Column, capacity: int
) -> DataFrame:
    """Batch build: items -> canonical compaction. The source is scanned
    TWICE (threshold contingency, then the keep filter), both scans
    column-pruned to (key, value) — the honest cost of a canonical
    batch state; the streaming twin never rescans (each micro-batch
    builds its own bounded partial and folds)."""
    return qsketch_compact(qsketch_items(df, key_col, value_col), capacity)


def qsketch_partials_onepass(
    df: DataFrame, key_col: Column, value_col: Column, capacity: int
) -> DataFrame:
    """Per-partition sketch partials in ONE corpus pass, ZERO shuffle:
    hashing and level assignment stay JVM-side (whole-stage codegen);
    an Arrow ``mapInPandas`` kernel then folds each partition's items
    into a bounded local state — ``state = compact(state ∪ batch)``
    per Arrow batch, so memory is O(capacity + batch) however large
    the partition. Emits (qs_id, value, lvl, thr) partial states, one
    per input partition, each a valid canonical state of its own item
    subset (the incremental fold equals the partition's one-shot
    compaction by the same floor-clamp argument as
    :func:`qsketch_compact`: for t >= thr(A), counts over
    state(A) ∪ B_{lvl>=thr(A)} equal counts over A ∪ B).

    This is the scale answer to the batch build's two scans (r8
    verdict Missing #2): the declarative build must scan once for the
    threshold contingency and again for the keep filter, because the
    threshold is a function of all items; the local fold sidesteps
    that by keeping its running threshold in kernel memory."""
    items = qsketch_items(df, key_col, value_col)
    cap = int(capacity)

    def fold(batches):
        import numpy as np
        import pandas as pd

        cur = pd.DataFrame(
            {
                "qs_id": pd.Series(dtype=object),
                "value": pd.Series(dtype="float64"),
                "lvl": pd.Series(dtype="int32"),
            }
        )
        thr = 0
        for pdf in batches:
            keep = pdf["lvl"].to_numpy() >= thr
            if keep.any():
                cur = pd.concat(
                    [cur, pdf.loc[keep, ["qs_id", "value", "lvl"]]],
                    ignore_index=True,
                )
            if len(cur) > cap:
                lv = cur["lvl"].to_numpy()
                cnt = np.bincount(lv, minlength=QSKETCH_MAX_LVL + 1)
                suffix = cnt[::-1].cumsum()[::-1]  # suffix[t] = #{lvl>=t}
                over = np.nonzero(suffix > cap)[0]
                cand = int(over.max()) + 1 if len(over) else 0
                if cand > thr:
                    thr = cand
                    cur = cur[cur["lvl"].to_numpy() >= thr]
        out = cur.copy()
        out["lvl"] = out["lvl"].astype("int32")
        out["thr"] = np.int32(thr)
        yield out

    return items.mapInPandas(
        fold, "qs_id string, value double, lvl int, thr int"
    )


def qsketch_partials_onepass_keyed(
    df: DataFrame,
    shard_col: Column,
    key_col: Column,
    value_col: Column,
    capacity: int,
) -> DataFrame:
    """Per-(partition, shard) sketch partials in ONE corpus pass — the
    multi-shard sibling of :func:`qsketch_partials_onepass` (r10
    optimization): a shard-merge entry that simulates S shards by
    filtering the same table S times pays S full scans and S sequential
    eager materializations; this kernel keeps one bounded fold state
    PER SHARD inside the single Arrow pass, so the scan count drops to
    one however many shards the demonstration carves. Emits
    (__shard, qs_id, value, lvl, thr): the rows with ``__shard == s``
    form a valid canonical partial state of shard s's item subset
    (each shard's fold never sees another shard's items, so the
    floor-clamp exactness argument applies per shard unchanged), and
    any downstream :func:`qsketch_merge` lands on the same bits as the
    per-shard-scan build by the tested canonical-state merge law."""
    items = df.select(
        shard_col.cast("int").alias("__shard"),
        key_col.cast("string").alias("qs_id"),
        value_col.cast("double").alias("value"),
    ).withColumn("lvl", qsketch_lvl_col(F.col("qs_id")))
    cap = int(capacity)

    def fold(batches):
        import numpy as np
        import pandas as pd

        states: dict[int, tuple[int, pd.DataFrame]] = {}
        empty = pd.DataFrame(
            {
                "qs_id": pd.Series(dtype=object),
                "value": pd.Series(dtype="float64"),
                "lvl": pd.Series(dtype="int32"),
            }
        )
        for pdf in batches:
            for shard, part in pdf.groupby("__shard"):
                thr, cur = states.get(int(shard), (0, empty))
                keep = part["lvl"].to_numpy() >= thr
                if keep.any():
                    cur = pd.concat(
                        [cur, part.loc[keep, ["qs_id", "value", "lvl"]]],
                        ignore_index=True,
                    )
                if len(cur) > cap:
                    lv = cur["lvl"].to_numpy()
                    cnt = np.bincount(lv, minlength=QSKETCH_MAX_LVL + 1)
                    suffix = cnt[::-1].cumsum()[::-1]
                    over = np.nonzero(suffix > cap)[0]
                    cand = int(over.max()) + 1 if len(over) else 0
                    if cand > thr:
                        thr = cand
                        cur = cur[cur["lvl"].to_numpy() >= thr]
                states[int(shard)] = (thr, cur)
        for shard in sorted(states):
            thr, cur = states[shard]
            out = cur.copy()
            out.insert(0, "__shard", np.int32(shard))
            out["lvl"] = out["lvl"].astype("int32")
            out["thr"] = np.int32(thr)
            yield out

    return items.mapInPandas(
        fold, "__shard int, qs_id string, value double, lvl int, thr int"
    )


def qsketch_build_onepass(
    df: DataFrame, key_col: Column, value_col: Column, capacity: int
) -> DataFrame:
    """One-scan batch build: per-partition partials (zero shuffle) +
    :func:`qsketch_merge`. The partials are eagerly materialized with
    ``localCheckpoint`` so the ONLY job that touches the source is the
    single partial pass; the merge then runs over the bounded
    (n_partitions x capacity) checkpointed rows. Bit-identical to
    :func:`qsketch_build` by the tested canonical-state merge law —
    the state is a pure function of the item SET, independent of how
    the items were split."""
    partial = qsketch_partials_onepass(df, key_col, value_col, capacity)
    partial = partial.localCheckpoint(eager=True)
    return qsketch_merge([partial], capacity)


def qsketch_merge(states: list[DataFrame], capacity: int) -> DataFrame:
    """Merge sketches built over DISJOINT item sets: union the state
    rows, floor at the max carried threshold (a row another shard
    already compacted away must not resurrect — dropping below-floor
    rows first is what keeps the recompacted threshold identical to the
    from-scratch build's), then recompact. O(sum of state sizes);
    associative and commutative, so shard trees and streaming folds
    land on the same bits."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    # cache the union: bounded by len(states)*capacity rows BY DESIGN,
    # and read twice here (floor aggregate + the floor filter) plus
    # twice more inside the recompaction — without it every consumer
    # re-executes each shard's full build lineage
    u = u.cache()
    floor = u.agg(F.max("thr").alias("__floor"))
    items = (
        u.crossJoin(F.broadcast(floor))
        .filter(F.col("lvl") >= F.col("__floor"))
        .select("qs_id", "value", "lvl")
    )
    # floor passed through: the recompacted threshold must never fall
    # below the carried floor (see qsketch_compact)
    merged = qsketch_compact(items, capacity, floor=floor)
    # materialize the <=capacity-row result eagerly, then RELEASE the
    # union cache: via start_state_fold_maintenance this merge runs once
    # per micro-batch, and an un-unpersisted cache per epoch accumulates
    # without bound over a stream's lifetime (ADVICE r8). localCheckpoint
    # also truncates the fold's lineage to the bounded state.
    merged = merged.localCheckpoint(eager=True)
    u.unpersist()
    return merged


def qsketch_quantiles(
    state: DataFrame, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Quantile estimates from a sketch state: the kept rows are a
    uniform hash sample, so the q-quantile estimate is the sample's
    order statistic at rank ceil(q*m) (ties broken by qs_id — every
    pick integer-deterministic, so any engine replays it). Returns one
    row: (n_kept, thr, p{label}_r ...). Ranking runs over the
    <=capacity-row state under the constant-scope cache barrier."""
    from pyspark.sql.window import Window

    from bigdata_capstone_spark.operators.relational import constant_scope

    labels = [_quantile_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide for qs={qs!r}: {labels}")
    s = constant_scope(state.select("qs_id", "value", "thr"))
    w_rank = Window.partitionBy("__s").orderBy("value", "qs_id")
    w_tot = Window.partitionBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = s.select(
        "__s",
        "value",
        "thr",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_tot).alias("m"),
    )
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("rn")
                    >= F.greatest(
                        F.lit(1), F.ceil(F.lit(q) * F.col("m"))
                    ),
                    F.col("value"),
                )
            ),
            6,
        ).alias(f"p{lbl}_r")
        for q, lbl in zip(qs, labels)
    ]
    return (
        ranked.groupBy("__s")
        .agg(
            F.max("m").cast("long").alias("n_kept"),
            F.max("thr").cast("int").alias("thr"),
            *aggs,
        )
        .drop("__s")
    )


def qsketch_grouped_build(
    df: DataFrame,
    group_cols: list[str],
    key_col: Column,
    value_col: Column,
    capacity: int,
) -> DataFrame:
    """PER-GROUP level-sampling sketches in one pass — the production
    shape of the quantile family (a value-distribution dashboard per
    event type / language / source): every group gets its own canonical
    <=capacity-row state, all built from a single scan + one grouped
    contingency. The merge law holds per group (states over disjoint
    item sets union-and-recompact groupwise), so shard partials fold
    exactly like the global sketch's.

    Returns (group..., qs_id, value, lvl, thr). Unlike the global
    build, every window here partitions by REAL group columns — no
    constant-scope barrier needed; state is |groups| x capacity rows
    however many values stream through."""
    items = df.select(
        *group_cols,
        key_col.cast("string").alias("qs_id"),
        value_col.cast("double").alias("value"),
    ).withColumn("lvl", qsketch_lvl_col(F.col("qs_id")))
    from pyspark.sql.window import Window

    per = items.groupBy(*group_cols, "lvl").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.desc("lvl"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thr = (
        per.select(*group_cols, "lvl", F.sum("cnt").over(w).alias("cum"))
        .groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.max(
                    F.when(F.col("cum") > capacity, F.col("lvl") + 1)
                ),
                F.lit(0),
            )
            .cast("int")
            .alias("thr")
        )
    )
    return (
        items.join(F.broadcast(thr), on=group_cols)
        .filter(F.col("lvl") >= F.col("thr"))
        .select(*group_cols, "qs_id", "value", "lvl", "thr")
    )


def qsketch_grouped_quantiles(
    state: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from grouped sketch states: one row
    per group — (group..., n_kept, thr, p{label}_r ...), each pick the
    group's sample order statistic at rank ceil(q*m) with the qs_id
    tie-break. Ranking windows partition by the group columns over the
    |groups| x capacity state."""
    from pyspark.sql.window import Window

    labels = [_quantile_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide for qs={qs!r}: {labels}")
    w_rank = Window.partitionBy(*group_cols).orderBy("value", "qs_id")
    w_tot = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = state.select(
        *group_cols,
        "value",
        "thr",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_tot).alias("m"),
    )
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("rn")
                    >= F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("m"))),
                    F.col("value"),
                )
            ),
            6,
        ).alias(f"p{lbl}_r")
        for q, lbl in zip(qs, labels)
    ]
    return ranked.groupBy(*group_cols).agg(
        F.max("m").cast("long").alias("n_kept"),
        F.max("thr").cast("int").alias("thr"),
        *aggs,
    )


def qsketch_grouped_merge(
    states: list[DataFrame], group_cols: list[str], capacity: int
) -> DataFrame:
    """Groupwise merge of per-group sketch states built over DISJOINT
    item sets: union, floor each group at its max carried threshold,
    recompact per group — the grouped twin of :func:`qsketch_merge`,
    with the identical exactness argument applied within every group.
    O(sum of state sizes); associative and commutative."""
    from pyspark.sql.window import Window

    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    # bounded by len(states) * |groups| * capacity rows by design; read
    # by the floor aggregate, the floor filter, and the recompaction
    u = u.cache()
    floor = u.groupBy(*group_cols).agg(F.max("thr").alias("__floor"))
    items = (
        u.join(F.broadcast(floor), on=group_cols)
        .filter(F.col("lvl") >= F.col("__floor"))
        .select(*group_cols, "qs_id", "value", "lvl")
    )
    per = items.groupBy(*group_cols, "lvl").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.desc("lvl"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = (
        per.select(*group_cols, "lvl", F.sum("cnt").over(w).alias("cum"))
        .groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.max(F.when(F.col("cum") > capacity, F.col("lvl") + 1)),
                F.lit(0),
            )
            .cast("int")
            .alias("__cand")
        )
    )
    # clamp at the carried floor, groupwise (see qsketch_compact): a
    # group whose floored survivors fit capacity must keep thr = floor,
    # not reset to 0 — the 4-shard sequential fold drifts otherwise
    thr = cand.join(F.broadcast(floor), on=group_cols).select(
        *group_cols,
        F.greatest(F.col("__cand"), F.col("__floor"))
        .cast("int")
        .alias("thr"),
    )
    merged = (
        items.join(F.broadcast(thr), on=group_cols)
        .filter(F.col("lvl") >= F.col("thr"))
        .select(*group_cols, "qs_id", "value", "lvl", "thr")
    )
    # same cache-release discipline as qsketch_merge: materialize the
    # bounded (|groups| x capacity) result, then free the union cache so
    # per-epoch streaming folds do not leak one cached frame per batch
    merged = merged.localCheckpoint(eager=True)
    u.unpersist()
    return merged


def qsketch_cdf(
    state: DataFrame, probes: "list[float]"
) -> DataFrame:
    """The INVERSE query on a sketch state — estimated CDF at given
    probe values: est_cdf(v) = |kept <= v| / m over the uniform hash
    sample (same DKW rank-error bound as the quantile direction; a
    sketch API needs both directions — quantile answers "what value
    sits at rank q", CDF answers "what fraction sits below v", the SLO
    question). Returns one row per probe: (probe_v, n_kept, est_cdf_r).

    One aggregate over the <=capacity-row state computes every probe's
    count map-side (no probe join, no explode); the 1-row result is
    cached and unpivoted."""
    if not probes:
        raise ValueError("probes must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("__m")] + [
        F.sum(F.when(F.col("value") <= F.lit(p), 1).otherwise(0))
        .cast("long")
        .alias(f"__le_{i}")
        for i, p in enumerate(probes)
    ]
    row = state.agg(*aggs).cache()
    out = None
    for i, p in enumerate(probes):
        r = row.select(
            F.lit(float(p)).alias("probe_v"),
            F.col("__m").alias("n_kept"),
            F.when(
                F.col("__m") > 0,
                F.round(F.col(f"__le_{i}") / F.col("__m"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("est_cdf_r"),
        )
        out = r if out is None else out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# WEIGHTED level-sampling quantile sketch (r8 verdict Missing #5): the
# qsketch family's weight rung. Corpus dashboards want TOKEN-weighted
# value distributions (a 10-token doc and a 10k-token doc must not count
# equally); the unweighted sketch samples items uniformly. Design: the
# per-item PRF coin becomes a 60-bit uniform u, and the item survives
# threshold t iff u < w * 2^(60-t) — inclusion probability
# min(1, w/2^t), evaluated with pure integer shifts ((u >> (60-t)) < w,
# no overflow, identical in any engine). A kept item carries the
# Horvitz-Thompson weight est_w = max(w, 2^thr) — integer-exact. The
# threshold rule, canonical-state property, merge group law, and floor
# clamp are IDENTICAL to the unweighted family (the level is still a
# pure per-item PRF), so shard-merge and streaming folds share one
# oracle with the batch build.
# ---------------------------------------------------------------------------


def wqsketch_wlvl_col(key_col: Column, w_col: Column) -> Column:
    """Weighted compaction level: the largest threshold the item's
    60-bit PRF draw survives, wlvl = #{t in 1..40 : (u >> (60-t)) < w}
    — survival is monotone decreasing in t, so the count IS the max
    surviving level. Items with w <= 0 must be filtered by the caller
    (they survive nothing)."""
    u = md5_long(F.concat(F.lit("wqs:"), key_col.cast("string")))
    w = w_col.cast("long")
    lvl = F.lit(0)
    for t in range(1, QSKETCH_MAX_LVL + 1):
        lvl = lvl + F.when(F.shiftright(u, 60 - t) < w, 1).otherwise(0)
    return lvl.cast("int")


def wqsketch_wlvl_sql(w_expr: str = "w", hash_col: str = "__h") -> str:
    """DuckDB twin of :func:`wqsketch_wlvl_col` over a precomputed
    60-bit hash column (materialize ``md5('wqs:' || key)`` once)."""
    terms = " + ".join(
        f"CASE WHEN ({hash_col} >> {60 - t}) < {w_expr} THEN 1 ELSE 0 END"
        for t in range(1, QSKETCH_MAX_LVL + 1)
    )
    return f"({terms})::INT"


def wqsketch_items(
    df: DataFrame, key_col: Column, value_col: Column, weight_col: Column
) -> DataFrame:
    """(qs_id, value, w, lvl) weighted item rows; non-positive weights
    are dropped (a zero-weight item contributes nothing to any weighted
    rank). ``key_col`` must be unique per row (per-item PRF coins)."""
    return (
        df.select(
            key_col.cast("string").alias("qs_id"),
            value_col.cast("double").alias("value"),
            weight_col.cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)
        .withColumn("lvl", wqsketch_wlvl_col(F.col("qs_id"), F.col("w")))
    )


def wqsketch_compact(
    items: DataFrame, capacity: int, floor: DataFrame | None = None
) -> DataFrame:
    """Canonical compaction, weighted state: identical integer-minimal
    threshold rule and floor clamp as :func:`qsketch_compact` (the
    level is a per-item PRF, so the same canonicality argument holds);
    the kept rows carry their raw weight — the Horvitz-Thompson
    estimator est_w = max(w, 2^thr) is applied at QUERY time so the
    state stays merge-closed (a merge may raise thr, which re-scales
    est_w for ALL survivors)."""
    from pyspark.sql.window import Window

    from bigdata_capstone_spark.operators.relational import constant_scope

    per = constant_scope(
        items.groupBy("lvl").agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("__s")
        .orderBy(F.desc("lvl"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select("lvl", F.sum("cnt").over(w).alias("cum"))
    cand = cum.agg(
        F.coalesce(
            F.max(F.when(F.col("cum") > capacity, F.col("lvl") + 1)),
            F.lit(0),
        )
        .cast("int")
        .alias("__cand")
    )
    if floor is not None:
        thr = cand.crossJoin(F.broadcast(floor)).select(
            F.greatest(F.col("__cand"), F.col("__floor"))
            .cast("int")
            .alias("thr")
        )
    else:
        thr = cand.select(F.col("__cand").alias("thr"))
    return (
        items.crossJoin(F.broadcast(thr))
        .filter(F.col("lvl") >= F.col("thr"))
        .select("qs_id", "value", "w", "lvl", "thr")
    )


def wqsketch_build(
    df: DataFrame,
    key_col: Column,
    value_col: Column,
    weight_col: Column,
    capacity: int,
) -> DataFrame:
    """Weighted batch build (declarative two-scan twin; the one-pass
    kernel recipe of :func:`qsketch_build_onepass` applies verbatim
    when the second scan matters)."""
    return wqsketch_compact(
        wqsketch_items(df, key_col, value_col, weight_col), capacity
    )


def wqsketch_merge(states: list[DataFrame], capacity: int) -> DataFrame:
    """Merge weighted sketch states over DISJOINT item sets: union,
    floor at the max carried threshold, recompact — the exact group
    law of :func:`qsketch_merge`, weights riding along."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    u = u.cache()
    floor = u.agg(F.max("thr").alias("__floor"))
    items = (
        u.crossJoin(F.broadcast(floor))
        .filter(F.col("lvl") >= F.col("__floor"))
        .select("qs_id", "value", "w", "lvl")
    )
    merged = wqsketch_compact(items, capacity, floor=floor)
    merged = merged.localCheckpoint(eager=True)
    u.unpersist()
    return merged


def wqsketch_quantiles(
    state: DataFrame, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """WEIGHTED quantile estimates: survivors get the Horvitz-Thompson
    weight est_w = max(w, 2^thr); the q-quantile estimate is the first
    value (order: value, qs_id) whose running est_w total reaches
    q * total_est_w. est_w and its prefix sums are exact BIGINTs; only
    the final q * W product is double (q literal, W < 2^53 — the same
    IEEE value in any engine). Returns one row:
    (n_kept, thr, est_total_w, p{label}_r ...)."""
    from pyspark.sql.window import Window

    from bigdata_capstone_spark.operators.relational import constant_scope

    labels = [_quantile_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide for qs={qs!r}: {labels}")
    s = constant_scope(
        state.select(
            "qs_id",
            "value",
            "thr",
            # shiftleft's python wrapper takes only a literal shift;
            # the SQL form accepts a column
            F.greatest(
                F.col("w"), F.expr("shiftleft(CAST(1 AS BIGINT), thr)")
            ).alias("__ew"),
        )
    )
    w_run = (
        Window.partitionBy("__s")
        .orderBy("value", "qs_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = s.select(
        "__s",
        "value",
        "thr",
        F.sum("__ew").over(w_run).cast("long").alias("cum_w"),
        F.sum("__ew").over(w_tot).cast("long").alias("tot_w"),
        F.count(F.lit(1)).over(w_tot).alias("m"),
    )
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("cum_w").cast("double")
                    >= F.lit(q) * F.col("tot_w").cast("double"),
                    F.col("value"),
                )
            ),
            6,
        ).alias(f"p{lbl}_r")
        for q, lbl in zip(qs, labels)
    ]
    return (
        ranked.groupBy("__s")
        .agg(
            F.max("m").cast("long").alias("n_kept"),
            F.max("thr").cast("int").alias("thr"),
            F.max("tot_w").cast("long").alias("est_total_w"),
            *aggs,
        )
        .drop("__s")
    )


def wqsketch_partials_onepass(
    df: DataFrame,
    key_col: Column,
    value_col: Column,
    weight_col: Column,
    capacity: int,
) -> DataFrame:
    """Weighted twin of :func:`qsketch_partials_onepass`: weighted
    levels stay JVM-side; the Arrow kernel folds each partition into a
    bounded local state with the weight column riding along. Same
    incremental-fold exactness argument (the weighted level is a pure
    per-item PRF)."""
    items = wqsketch_items(df, key_col, value_col, weight_col)
    cap = int(capacity)

    def fold(batches):
        import numpy as np
        import pandas as pd

        cur = pd.DataFrame(
            {
                "qs_id": pd.Series(dtype=object),
                "value": pd.Series(dtype="float64"),
                "w": pd.Series(dtype="int64"),
                "lvl": pd.Series(dtype="int32"),
            }
        )
        thr = 0
        for pdf in batches:
            keep = pdf["lvl"].to_numpy() >= thr
            if keep.any():
                cur = pd.concat(
                    [cur, pdf.loc[keep, ["qs_id", "value", "w", "lvl"]]],
                    ignore_index=True,
                )
            if len(cur) > cap:
                lv = cur["lvl"].to_numpy()
                cnt = np.bincount(lv, minlength=QSKETCH_MAX_LVL + 1)
                suffix = cnt[::-1].cumsum()[::-1]
                over = np.nonzero(suffix > cap)[0]
                cand = int(over.max()) + 1 if len(over) else 0
                if cand > thr:
                    thr = cand
                    cur = cur[cur["lvl"].to_numpy() >= thr]
        out = cur.copy()
        out["lvl"] = out["lvl"].astype("int32")
        out["w"] = out["w"].astype("int64")
        out["thr"] = np.int32(thr)
        yield out

    return items.mapInPandas(
        fold, "qs_id string, value double, w bigint, lvl int, thr int"
    )


def wqsketch_partials_onepass_keyed(
    df: DataFrame,
    shard_col: Column,
    key_col: Column,
    value_col: Column,
    weight_col: Column,
    capacity: int,
) -> DataFrame:
    """Weighted twin of :func:`qsketch_partials_onepass_keyed`: one
    corpus pass maintaining a bounded fold state PER SHARD (weights
    riding along), so an S-shard merge demonstration costs one scan
    instead of S. Emits (__shard, qs_id, value, w, lvl, thr); per-shard
    exactness and the downstream merge law carry over unchanged."""
    items = (
        df.select(
            shard_col.cast("int").alias("__shard"),
            key_col.cast("string").alias("qs_id"),
            value_col.cast("double").alias("value"),
            weight_col.cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)
        .withColumn("lvl", wqsketch_wlvl_col(F.col("qs_id"), F.col("w")))
    )
    cap = int(capacity)

    def fold(batches):
        import numpy as np
        import pandas as pd

        states: dict[int, tuple[int, pd.DataFrame]] = {}
        empty = pd.DataFrame(
            {
                "qs_id": pd.Series(dtype=object),
                "value": pd.Series(dtype="float64"),
                "w": pd.Series(dtype="int64"),
                "lvl": pd.Series(dtype="int32"),
            }
        )
        for pdf in batches:
            for shard, part in pdf.groupby("__shard"):
                thr, cur = states.get(int(shard), (0, empty))
                keep = part["lvl"].to_numpy() >= thr
                if keep.any():
                    cur = pd.concat(
                        [cur, part.loc[keep, ["qs_id", "value", "w", "lvl"]]],
                        ignore_index=True,
                    )
                if len(cur) > cap:
                    lv = cur["lvl"].to_numpy()
                    cnt = np.bincount(lv, minlength=QSKETCH_MAX_LVL + 1)
                    suffix = cnt[::-1].cumsum()[::-1]
                    over = np.nonzero(suffix > cap)[0]
                    cand = int(over.max()) + 1 if len(over) else 0
                    if cand > thr:
                        thr = cand
                        cur = cur[cur["lvl"].to_numpy() >= thr]
                states[int(shard)] = (thr, cur)
        for shard in sorted(states):
            thr, cur = states[shard]
            out = cur.copy()
            out.insert(0, "__shard", np.int32(shard))
            out["lvl"] = out["lvl"].astype("int32")
            out["w"] = out["w"].astype("int64")
            out["thr"] = np.int32(thr)
            yield out

    return items.mapInPandas(
        fold,
        "__shard int, qs_id string, value double, w bigint, lvl int, thr int",
    )


def wqsketch_build_onepass(
    df: DataFrame,
    key_col: Column,
    value_col: Column,
    weight_col: Column,
    capacity: int,
) -> DataFrame:
    """One-scan weighted batch build: per-partition partials (zero
    shuffle) + :func:`wqsketch_merge` — bit-identical to
    :func:`wqsketch_build` by the family's canonical-state law."""
    partial = wqsketch_partials_onepass(
        df, key_col, value_col, weight_col, capacity
    )
    partial = partial.localCheckpoint(eager=True)
    return wqsketch_merge([partial], capacity)


def wqsketch_grouped_build(
    df: DataFrame,
    group_cols: "list[str]",
    key_col: Column,
    value_col: Column,
    weight_col: Column,
    capacity: int,
) -> DataFrame:
    """PER-GROUP weighted sketches in one pass — the grouped dimension
    of the weighted family (per-language token-weighted length
    dashboards): every group gets its own canonical <=capacity-row
    weighted state from a single scan + one grouped contingency, the
    same shape as :func:`qsketch_grouped_build` with the weighted level
    and the weight column riding along. Returns
    (group..., qs_id, value, w, lvl, thr)."""
    from pyspark.sql.window import Window

    items = (
        df.select(
            *group_cols,
            key_col.cast("string").alias("qs_id"),
            value_col.cast("double").alias("value"),
            weight_col.cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)
        .withColumn("lvl", wqsketch_wlvl_col(F.col("qs_id"), F.col("w")))
    )
    per = items.groupBy(*group_cols, "lvl").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.desc("lvl"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thr = (
        per.select(*group_cols, "lvl", F.sum("cnt").over(w).alias("cum"))
        .groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.max(
                    F.when(F.col("cum") > capacity, F.col("lvl") + 1)
                ),
                F.lit(0),
            )
            .cast("int")
            .alias("thr")
        )
    )
    return (
        items.join(F.broadcast(thr), on=group_cols)
        .filter(F.col("lvl") >= F.col("thr"))
        .select(*group_cols, "qs_id", "value", "w", "lvl", "thr")
    )


def wqsketch_grouped_quantiles(
    state: DataFrame,
    group_cols: "list[str]",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group WEIGHTED quantile estimates: one row per group —
    (group..., n_kept, thr, est_total_w, p{label}_r ...), each pick the
    first value whose running Horvitz-Thompson weight reaches
    q * group_total. Windows partition by the group columns over the
    |groups| x capacity state."""
    from pyspark.sql.window import Window

    labels = [_quantile_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide for qs={qs!r}: {labels}")
    s = state.select(
        *group_cols,
        "qs_id",
        "value",
        "thr",
        F.greatest(
            F.col("w"), F.expr("shiftleft(CAST(1 AS BIGINT), thr)")
        ).alias("__ew"),
    )
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy("value", "qs_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = s.select(
        *group_cols,
        "value",
        "thr",
        F.sum("__ew").over(w_run).cast("long").alias("cum_w"),
        F.sum("__ew").over(w_tot).cast("long").alias("tot_w"),
        F.count(F.lit(1)).over(w_tot).alias("m"),
    )
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("cum_w").cast("double")
                    >= F.lit(q) * F.col("tot_w").cast("double"),
                    F.col("value"),
                )
            ),
            6,
        ).alias(f"p{lbl}_r")
        for q, lbl in zip(qs, labels)
    ]
    return ranked.groupBy(*group_cols).agg(
        F.max("m").cast("long").alias("n_kept"),
        F.max("thr").cast("int").alias("thr"),
        F.max("tot_w").cast("long").alias("est_total_w"),
        *aggs,
    )
