"""ETL / warehouse-history / graph-shape catalog extension.

Shapes any production data platform runs daily that the earlier catalogs
did not yet cover:

- SCD2 history build (``scd2_user_tiers``) — turn an event stream into a
  type-2 slowly-changing dimension: run-length compress consecutive equal
  attribute values per key into validity intervals (valid_from / valid_to /
  is_current). The standard warehouse dimension-maintenance pattern
  (generalizes the reference's per-user state aggregation,
  popularity_model.py:52-56, into temporal versions).
- Markov transition counts (``event_transition_matrix``) — consecutive
  event-type bigrams per user (lead over event time), the clickstream
  next-step model input.
- multi-granularity time rollup (``events_time_rollup``) — hour/day/month
  continuous-aggregate hierarchy in one GROUPING SETS pass (the timeseries
  "hypertable rollup" shape).
- triangle enumeration (``dedup_triangles``) — closed triples in the
  near-dup document graph; the classic graph-analytics join beyond
  pairwise similarity (pairs ⇒ cliques evidence).
- share-of-part dominance (``dominant_part_suppliers``) — TPC-H Q20-style
  correlated-aggregate filter: suppliers shipping more than half of a
  part's total quantity.

Scale rules follow catalog_ds.py: broadcast dimensions, decimal money
sums, deterministic tie-breaks, no driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_capstone_spark.catalog import register
from bigdata_capstone_spark.operators.relational import fan_out
from bigdata_capstone_spark.operators.textops import (
    LETTER_REGEX,
    NON_LETTER_REGEX,
)
from bigdata_capstone_spark.session import ensure_utc
from bigdata_capstone_spark.shared_sql import (
    DSIR_CTES,
    HYBRID_RRF_CTES,
    NB_MARGIN_CTES,
    UNIGRAM_LP_CTES,
)
from bigdata_capstone_spark.sources.tables import load_table

_TIER_SQL = "CASE WHEN value < 30 THEN 'low' WHEN value < 70 THEN 'mid' ELSE 'high' END"


@register(
    "scd2_user_tiers",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id, {_TIER_SQL} AS tier
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id, tier,
             CASE WHEN lag(tier) OVER w IS NULL
                    OR lag(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, tier,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ),
    hist AS (
      SELECT user_id, version, min(tier) AS tier, min(ts) AS valid_from,
             count(*) AS n_events
      FROM runs GROUP BY user_id, version
    )
    SELECT user_id, version::BIGINT AS version, tier, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to,
           (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
              IS NULL) AS is_current,
           n_events::BIGINT AS n_events
    FROM hist
    """,
)
def scd2_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD build from the event stream: per user, run-length
    compress consecutive equal value-tiers into versioned validity
    intervals (valid_from, valid_to, is_current).

    Scale shape: ONE shuffle on user_id serves the lag window, the
    running-sum window, the run groupBy, and the interval lead window —
    Spark chains all four in a single Exchange because every step is
    partitioned by the same key. The classic warehouse dimension-
    maintenance job, expressed without any self-join.

    Every window orders by the tie-broken (ts, event_id) so both engines
    agree on run boundaries even for equal timestamps.
    """
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value") < 30, "low")
        .when(F.col("value") < 70, "mid")
        .otherwise("high")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "event_id", tier.alias("tier")
    ).withColumn(
        "chg",
        F.when(
            F.lag("tier").over(w).isNull() | (F.lag("tier").over(w) != F.col("tier")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "version",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    hist = runs.groupBy("user_id", "version").agg(
        F.min("tier").alias("tier"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return hist.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "tier",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        F.col("n_events").cast("long").alias("n_events"),
    )


_SCD2_CTES = f"""
    e AS (
      SELECT user_id, ts, event_id, {_TIER_SQL} AS tier
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id, tier,
             CASE WHEN lag(tier) OVER w IS NULL
                    OR lag(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, tier,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ),
    hist AS (
      SELECT user_id, version, min(tier) AS tier, min(ts) AS valid_from,
             count(*) AS n_events
      FROM runs GROUP BY user_id, version
    ),
    dim AS (
      SELECT user_id, tier, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to
      FROM hist
    )
"""


@register(
    "events_scd2_enrichment",
    oracle=f"""
    WITH {_SCD2_CTES}
    SELECT d.tier, ev.event_type,
           count(*)::BIGINT AS n,
           sum(CAST(ev.value AS DECIMAL(18,2)))::DOUBLE AS value_sum
    FROM events ev
    JOIN dim d
      ON d.user_id = ev.user_id
     AND ev.ts >= d.valid_from
     AND (d.valid_to IS NULL OR ev.ts < d.valid_to)
    GROUP BY d.tier, ev.event_type
    """,
)
def events_scd2_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the OTHER half of the SCD2
    story: ``scd2_user_tiers`` builds the versioned dimension; this
    entry joins a fact row to the version VALID AT ITS TIMESTAMP
    (ts ∈ [valid_from, valid_to)), the canonical as-of enrichment every
    warehouse runs against a type-2 dimension. Summarized per (tier,
    event_type) with a DECIMAL-exact value sum.

    Scale shape: equi-join on user_id (both sides hash-partition once —
    the dimension is user-grain, never broadcast at warehouse scale)
    with the interval containment as a post-join predicate over that
    user's handful of versions. No theta-join against the fact ever
    plans; the window chain reuses the single user_id Exchange the SCD2
    build documents."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events").cache()
    # the dimension derives from the same events scan; cache so the
    # corpus scans once across the build + the enrichment probe
    tier = (
        F.when(F.col("value") < 30, "low")
        .when(F.col("value") < 70, "mid")
        .otherwise("high")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "event_id", tier.alias("tier")
    ).withColumn(
        "chg",
        F.when(
            F.lag("tier").over(w).isNull()
            | (F.lag("tier").over(w) != F.col("tier")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "version",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    hist = runs.groupBy("user_id", "version").agg(
        F.min("tier").alias("tier"),
        F.min("ts").alias("valid_from"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    dim = hist.select(
        "user_id",
        "tier",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    )
    from bigdata_capstone_spark.functions.portable import exact_sum

    fact = events.select("user_id", "ts", "event_type", "value")
    joined = fact.join(
        dim,
        on=(fact["user_id"] == dim["user_id"])
        & (fact["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (fact["ts"] < dim["valid_to"])),
    )
    return joined.groupBy("tier", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value", 2).alias("value_sum"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*)::BIGINT AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts: consecutive event-type bigrams per user in
    event-time order — the next-action model input. One shuffle on user_id
    for the lead window, then a short-key (type, type) hash-agg."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "events_time_rollup",
    oracle="""
    SELECT date_trunc('month', ts) AS month,
           date_trunc('day', ts)   AS day,
           date_trunc('hour', ts)  AS hour,
           count(*)::BIGINT AS n_events,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
    FROM events
    GROUP BY GROUPING SETS (
      (date_trunc('month', ts)),
      (date_trunc('month', ts), date_trunc('day', ts)),
      (date_trunc('month', ts), date_trunc('day', ts), date_trunc('hour', ts))
    )
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour→day→month continuous-aggregate hierarchy in ONE pass (the
    timeseries-DB "hypertable rollup" shape) via ROLLUP over derived
    truncations. At scale this replaces three separate scans with one;
    the rollup's partial aggregation reuses the finest granularity's
    map-side combine."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    derived = events.select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    # GROUPING SETS ((m),(m,d),(m,d,h)) ≡ ROLLUP(m,d,h) minus the grand
    # total. Identify the grand-total row by grouping_id() == 7 (all three
    # keys aggregated away), NOT by `month IS NULL`: a null-ts event row
    # would produce a REAL null-month group that the oracle's GROUPING
    # SETS keeps, and keying on nullness would silently drop it here.
    return (
        derived.rollup("month", "day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.grouping_id().alias("__gid"),
        )
        .filter(F.col("__gid") != 7)
        .drop("__gid")
    )


@register(
    "dedup_triangles",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS idA, b.doc_id AS idB,
             max(sa.n) AS nA, max(sb.n) AS nB, count(*) AS common
      FROM sh a
      JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      JOIN sizes sa ON sa.doc_id = a.doc_id
      JOIN sizes sb ON sb.doc_id = b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT idA, idB FROM common
      WHERE common * 1.0 / (nA + nB - common) >= 0.2
    )
    SELECT e1.idA AS a, e1.idB AS b, e2.idB AS c
    FROM edges e1
    JOIN edges e2 ON e2.idA = e1.idB
    JOIN edges e3 ON e3.idA = e1.idA AND e3.idB = e2.idB
    """,
)
def dedup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed triples (a<b<c) in the exact near-dup document graph
    (3-gram Jaccard ≥ 0.2) — pairwise similarity promoted to clique
    evidence, the standard triangle-join graph analytic.

    Scale shape: with edges ordered a<b the triangle join degenerates to
    two equi-joins on single node keys; edge lists are narrow (two longs),
    and the near-dup graph is a union of small cliques, so the e1⋈e2
    fan-out stays bounded by the largest cluster, not the corpus. The
    edge frame is cached — it feeds all three join legs.
    """
    from bigdata_capstone_spark.operators.dedup import ngram_jaccard_pairs

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        ngram_jaccard_pairs(docs, shingle_n=3, min_jaccard=0.2)
        .select("idA", "idB")
        .cache()
    )
    e1 = edges.select(F.col("idA").alias("a"), F.col("idB").alias("b"))
    e2 = edges.select(F.col("idA").alias("b"), F.col("idB").alias("c"))
    e3 = edges.select(F.col("idA").alias("a"), F.col("idB").alias("c"))
    return e1.join(e2, on="b").join(e3, on=["a", "c"]).select("a", "b", "c")


@register(
    "dominant_part_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ),
    tot AS (SELECT l_partkey, sum(qty) AS total FROM sp GROUP BY l_partkey)
    SELECT s_suppkey, s_name, count(*)::BIGINT AS n_dominated_parts
    FROM sp
    JOIN tot ON sp.l_partkey = tot.l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE 2 * qty > total
    GROUP BY s_suppkey, s_name
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style correlated-aggregate filter: suppliers shipping
    more than half of some part's total quantity, with how many parts
    they dominate. The share predicate is ``2·qty > total`` in DECIMAL —
    exact integer-like arithmetic, no 0.5·double boundary drift.

    Scale shape: one (supp, part) hash-agg over the fact table, a part-key
    re-aggregate for totals, then an equi-join back on part — both shuffle
    keys are natural fact keys; the supplier dimension broadcasts.
    """
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    tot = sp.groupBy("l_partkey").agg(F.sum("qty").alias("total"))
    dominated = (
        sp.join(tot, on="l_partkey")
        .filter(F.lit(2) * F.col("qty") > F.col("total"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )
    return (
        dominated.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            dominated.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "n_dominated_parts")
    )


@register(
    "doc_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf_r
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf_r, term_rank FROM (
      SELECT doc_id, tok, tfidf_r,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf_r DESC, tok) AS term_rank
      FROM scored
    )
    WHERE term_rank <= 5 AND doc_id < 100
    """,
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (docs 0-99): term frequency ×
    ln(N/df), rounded BEFORE ranking so the per-doc order is engine-stable
    (ties then break on the term itself).

    Scale shape: one token explode feeds both the per-doc tf agg and the
    document-frequency agg; idf joins back on the token (short-key
    shuffle) and N arrives as a broadcast scalar. Document bodies never
    shuffle. The doc_id filter prunes the OUTPUT, deliberately after
    scoring — idf must see the whole corpus.
    """
    from bigdata_capstone_spark.operators.relational import grouped_top_k
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # the exploded token frame is cached (memory-and-disk, spills at
    # scale) so tokenize+explode runs once for the tf and df branches —
    # same discipline as dedup's shingle cache
    toks = fan_out(docs).select(
        "doc_id", F.explode(tokens_col("text")).alias("tok")
    ).cache()
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, on="tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf_r"),
        )
    )
    ranked = grouped_top_k(
        scored,
        ["doc_id"],
        [F.desc("tfidf_r"), F.col("tok")],
        5,
        rank_col="term_rank",
    ).withColumn("term_rank", F.col("term_rank").cast("long"))
    return ranked.filter(F.col("doc_id") < 100).select(
        "doc_id", "tok", "tfidf_r", "term_rank"
    )


@register(
    "stratified_event_sample",
    oracle="""
    WITH frac AS (
      SELECT *, CASE event_type WHEN 'view' THEN 50
                                WHEN 'click' THEN 200
                                ELSE 1000 END AS keep_permille
      FROM events
    ),
    kept AS (
      SELECT event_type, value FROM frac
      WHERE ('0x' || substr(md5('samp:' || event_id::VARCHAR), 1, 15))::BIGINT
              % 1000 < keep_permille
    )
    SELECT event_type, count(*)::BIGINT AS n_sampled,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
    FROM kept GROUP BY event_type
    """,
)
def stratified_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling — the training-data
    rebalancing op: per-stratum keep fractions (views 5%, clicks 20%,
    everything else 100%) decided by a PRF on the row key, so the sample
    is exactly reproducible on any engine, any partitioning, any rerun —
    unlike ``sampleBy``, whose RNG stream is Spark-internal.

    Scale shape: a pure map-side filter (no shuffle, no state); the
    verification aggregate here is just the stable summary. At 100 TB the
    same predicate runs inside the scan and composes with partition
    pruning."""
    from bigdata_capstone_spark.functions.portable import md5_long

    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    keep = (
        F.when(F.col("event_type") == "view", 50)
        .when(F.col("event_type") == "click", 200)
        .otherwise(1000)
    )
    h = md5_long(F.concat(F.lit("samp:"), F.col("event_id")))
    kept = events.filter(h % 1000 < keep)
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


@register(
    "record_breaking_events",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prior_high
      FROM events
    )
    SELECT user_id, event_id, value, prior_high
    FROM w WHERE prior_high IS NULL OR value > prior_high
    """,
)
def record_breaking_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events that set a new per-user value high-watermark (a user's first
    event always qualifies, prior_high null). This is the BATCH TWIN of
    the arbitrary-stateful streaming detector
    (streaming/stateful.high_value_alerts) — identical row set, so the
    custom applyInPandasWithState operator is value-checked through this
    oracle plus the stream≡batch test. One shuffle on user_id; the running
    max is a frame-bounded window, no self-join."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = events.select(
        "user_id", "event_id", "value", F.max("value").over(w).alias("prior_high")
    )
    return flagged.filter(
        F.col("prior_high").isNull() | (F.col("value") > F.col("prior_high"))
    )


@register(
    "benchmark_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+7], ' ')
                                   for i in range(1, len(t) - 6)])) AS sh
      FROM toks WHERE len(t) >= 8
    ),
    bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
    train AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 20),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, count(*) AS n_shared
      FROM train t JOIN bench b ON t.sh = b.sh
      GROUP BY t.doc_id
    )
    SELECT h.doc_id, h.n_shared::BIGINT AS n_shared,
           s.n_shingles::BIGINT AS n_shingles,
           round(h.n_shared * 1.0 / s.n_shingles, 6) AS contamination_r
    FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan — the eval-leakage check every
    training corpus needs: training docs (doc_id ≥ 20) sharing any word
    8-gram with the benchmark set (doc_id < 20), with the shared-shingle
    ratio. 8-grams are the standard decontamination unit (long enough to
    be distinctive, short enough to catch paraphrase-free reuse).

    Scale shape: one shingle explode feeds both sides (cached); the
    benchmark shingle set is tiny by definition (eval suites, not corpora)
    → broadcast, so contamination is a MAP-SIDE semi-join against the
    training corpus — no shuffle of corpus shingles; the only shuffle is
    the per-doc count aggregation.
    """
    from bigdata_capstone_spark.operators.dedup import exploded_shingles

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    sh = exploded_shingles(docs, "text", "doc_id", 8).cache()
    bench = sh.filter(F.col("doc_id") < 20).select("sh").distinct()
    train = sh.filter(F.col("doc_id") >= 20)
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train.join(F.broadcast(bench), on="sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.join(sizes, on="doc_id").select(
        "doc_id",
        "n_shared",
        "n_shingles",
        F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias(
            "contamination_r"
        ),
    )


def _cluster_split_oracle() -> str:
    from bigdata_capstone_spark.catalog import _clusters_oracle

    return f"""
    SELECT split, count(*)::BIGINT AS n_docs,
           count(DISTINCT cluster_id)::BIGINT AS n_clusters
    FROM (
      SELECT cluster_id,
             CASE WHEN ('0x' || substr(md5('split:' || cluster_id::VARCHAR),
                                       1, 15))::BIGINT % 100 < 80
                  THEN 'train' ELSE 'val' END AS split
      FROM ({_clusters_oracle()}) labeled
    )
    GROUP BY split
    """


@register("cluster_aware_split", oracle=_cluster_split_oracle())
def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val split: the split key is the NEAR-DUP CLUSTER
    id, not the document id, so near-duplicates of a validation document
    can never land in train — the failure mode a row-wise randomSplit
    (splitting_data.py:24) cannot prevent on near-duplicated corpora.
    Assignment is a md5 PRF on cluster_id (~80/20), so the split is
    deterministic, engine-portable, and stable under repartitioning —
    the whole pipeline (LSH pairs → connected components → PRF split) is
    value-checked through the recursive-CTE oracle.

    Scale shape: adds ONE map-side hash + a 2-row aggregate on top of the
    clusters pipeline; the split itself shuffles nothing.
    """
    from bigdata_capstone_spark.functions.portable import md5_long
    from bigdata_capstone_spark.operators.dedup import dedup_clusters

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    labeled = dedup_clusters(
        docs, n_perm=8, bands=4, min_jaccard=0.5, max_bucket_size=100
    )
    split = F.when(
        md5_long(F.concat(F.lit("split:"), F.col("cluster_id"))) % 100 < 80,
        "train",
    ).otherwise("val")
    return (
        labeled.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("cluster_id").alias("n_clusters"),
        )
    )


@register(
    "streaming_hourly_windows",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURED STREAMING run through the value gate: the events parquet
    is replayed as a file-source stream, the watermarked 1-hour tumbling
    aggregation (streaming/windows.py) drains to completion into the
    memory sink, and the sink table is returned — hash-compared against
    the plain batch SQL. This promotes the stream≡batch property from a
    library test to a driver-checked oracle result.

    Scale shape: identical to the batch twin (one shuffle keyed by
    (window, type)); streaming adds watermark-bounded state, sized by
    windows-in-flight × types, not event volume."""
    from bigdata_capstone_spark.streaming.windows import (
        hourly_tumbling_agg,
        run_stream_to_memory,
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    stream = stream_events_from_parquet(spark, sf_dir)
    agg = hourly_tumbling_agg(stream)
    run_stream_to_memory(agg, "streaming_hourly_windows_sink", "complete")
    return spark.table("streaming_hourly_windows_sink")


@register(
    "streaming_late_data",
    oracle="""
    WITH b1 AS (
      SELECT * FROM events
      WHERE ts < TIMESTAMP '2024-01-15' AND event_id % 5 <> 0
    ),
    b2 AS (
      SELECT * FROM events
      WHERE NOT (ts < TIMESTAMP '2024-01-15' AND event_id % 5 <> 0)
    ),
    wm1 AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM b1),
    kept AS (
      SELECT * FROM b1
      UNION ALL
      SELECT b2.* FROM b2, wm1
      WHERE date_trunc('hour', b2.ts) + INTERVAL 1 HOUR > wm1.w
    )
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value
    FROM kept GROUP BY 1, 2
    """,
)
def streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK LATE-DATA SEMANTICS through the value gate: events replay
    in two controlled micro-batches — batch 1 is the "on-time" flow
    (everything before Jan 15 except each 5th event), batch 2 mixes the
    genuinely-new tail with the held-back stragglers, whose windows mostly
    closed long ago. With a 2-hour watermark, batch 2 is judged against
    W1 = max(batch-1 event time) − 2h (Spark finalizes the watermark at
    the END of a batch and applies it to the NEXT): straggler rows whose
    1-hour window end <= W1 are DROPPED; rows in still-open windows are
    folded in. Two far-future nudge rows then push the watermark past
    every real window so append mode emits all finalized windows (the
    nudges' own windows never finalize and never appear). The drained
    sink hash-matches the batch twin minus exactly the provably-late
    rows — the drop/keep boundary is value-checked, not assumed.

    Scale shape: identical to streaming_hourly_windows; the point here is
    STATE CORRECTNESS — the watermark is what bounds state at 100 TB/day,
    and this pins the exact boundary it enforces."""
    import tempfile
    from datetime import timedelta

    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.windows import hourly_tumbling_agg

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_late_")
    indir = f"{work}/in"
    ev = load_table(spark, sf_dir, "events")
    on_time = (F.col("ts") < F.to_timestamp(F.lit("2024-01-15"))) & (
        F.col("event_id") % 5 != 0
    )
    ev.filter(on_time).coalesce(1).write.mode("append").parquet(indir)
    stream = spark.readStream.schema(TABLE_SCHEMAS["events"]).parquet(indir)
    agg = hourly_tumbling_agg(stream, watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("streaming_late_data_sink")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 -> watermark W1
        ev.filter(~on_time).coalesce(1).write.mode("append").parquet(indir)
        q.processAllAvailable()  # batch 2: stragglers judged against W1
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        # nudge 1 advances the watermark past every real window; nudge 2
        # (SAME timestamp — no further advance, so the nudge window itself
        # never finalizes) triggers the batch that applies it and flushes
        # the finalized windows into the append sink
        for i in (1, 2):
            spark.createDataFrame(
                [
                    (
                        -i,
                        max_ts + timedelta(hours=10),
                        -1,
                        "late_nudge",
                        0.0,
                        None,
                    )
                ],
                TABLE_SCHEMAS["events"],
            ).coalesce(1).write.mode("append").parquet(indir)
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("streaming_late_data_sink")


@register(
    "streaming_sliding_windows",
    oracle="""
    SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 900000000
                          - k * 900000000) AS window_start,
           make_timestamp(epoch_us(ts) - epoch_us(ts) % 900000000
                          - k * 900000000 + 3600000000) AS window_end,
           event_type,
           count(*)::BIGINT AS n_events
    FROM events CROSS JOIN generate_series(0, 3) g(k)
    GROUP BY 1, 2, 3
    """,
)
def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h window / 15 min slide) DRAINED AS A
    REAL STREAM through the value gate: each event lands in window/slide=4
    panes; the oracle replays Spark's epoch-aligned pane assignment in
    microsecond arithmetic (pane k start = ts - ts mod slide - k·slide),
    so the streamed sink is hash-compared pane-for-pane.

    Scale shape: the pane fan-out is a map-side explode (×4 rows), then
    one shuffle keyed by (window, type); watermark bounds state to
    (watermark + window)/slide panes per type."""
    from bigdata_capstone_spark.streaming.windows import (
        run_stream_to_memory,
        sliding_window_agg,
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    stream = stream_events_from_parquet(spark, sf_dir)
    agg = sliding_window_agg(stream, "1 hour", "15 minutes")
    run_stream_to_memory(agg, "streaming_sliding_windows_sink", "complete")
    return spark.table("streaming_sliding_windows_sink")


@register(
    "streaming_session_windows",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(CASE WHEN prev IS NULL
                        OR epoch_us(ts) - epoch_us(prev) >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*)::BIGINT AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (30-min gap) DRAINED AS A REAL STREAM
    through the value gate. The oracle replays gap-close semantics with
    the islands formulation — note ``>=`` on the gap: Spark's session
    interval is [start, last_event + gap), so an event landing exactly at
    the gap boundary opens a NEW session (the batch-twin `user_sessions`
    query deliberately uses ``>``; the two differ only on exact-boundary
    events, absent from µs-random data). session_end = last event + gap.

    Scale shape: one shuffle on user_id; streaming state = open sessions
    per user, closed by the watermark."""
    from bigdata_capstone_spark.streaming.windows import (
        run_stream_to_memory,
        session_window_agg,
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    stream = stream_events_from_parquet(spark, sf_dir)
    agg = session_window_agg(stream, "30 minutes")
    run_stream_to_memory(agg, "streaming_session_windows_sink", "complete")
    return spark.table("streaming_session_windows_sink")


@register(
    "streaming_view_purchase_join",
    oracle="""
    SELECT a.user_id AS key,
           a.event_id AS a_id, b.event_id AS b_id,
           a.ts AS a_ts, b.ts AS b_ts
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
)
def streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join through the value gate: views and
    purchases replayed as two file-source streams, joined on user with a
    30-min range bound (streaming/joins.followed_within), drained in
    append mode, hash-compared against the plain batch theta-join.

    Scale shape: both streams shuffle on user_id; the range bound + both
    watermarks cap per-key join state at (watermark + Δt) of events —
    without the bound, stream-stream join state grows forever."""
    from bigdata_capstone_spark.streaming.joins import followed_within
    from bigdata_capstone_spark.streaming.windows import (
        run_stream_to_memory,
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    views = stream_events_from_parquet(spark, sf_dir).filter(
        F.col("event_type") == "view"
    )
    purchases = stream_events_from_parquet(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = followed_within(views, purchases, gap="30 minutes")
    run_stream_to_memory(joined, "streaming_view_purchase_sink", "append")
    return spark.table("streaming_view_purchase_sink")


@register(
    "streaming_high_value_alerts",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prior_high
      FROM events
    )
    SELECT user_id, event_id, value,
           coalesce(prior_high, '-infinity'::DOUBLE) AS prior_high
    FROM ordered
    WHERE prior_high IS NULL OR value > prior_high
    """,
)
def streaming_high_value_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (applyInPandasWithState) through
    the value gate: the per-user record-breaker detector (alert whenever
    an event sets a new value high-watermark) drained in append mode and
    hash-compared against the running-max window formulation — promoting
    the arbitrary-stateful API from batch-twin tests to a driver-checked
    oracle result.

    Scale shape: state is one double per user, partitioned like a
    groupBy; event volume never accumulates in state."""
    from bigdata_capstone_spark.streaming.stateful import high_value_alerts
    from bigdata_capstone_spark.streaming.windows import (
        run_stream_to_memory,
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    stream = stream_events_from_parquet(spark, sf_dir)
    alerts = high_value_alerts(stream)
    run_stream_to_memory(alerts, "streaming_high_value_alerts_sink", "append")
    return spark.table("streaming_high_value_alerts_sink")


@register(
    "docs_lang_rebalance",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n_before FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT sum(n_before) AS total, count(*) AS n_langs FROM counts
    ),
    fracs AS (
      SELECT lang, n_before,
             least(1.0, (total * 1.0 / n_langs) / n_before) AS frac
      FROM counts CROSS JOIN tot
    ),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN fracs f ON f.lang = d.lang
      WHERE (('0x' || substr(md5('mix:' || d.doc_id), 1, 15))::BIGINT)
              % 1000000 < round(f.frac * 1000000)::BIGINT
    )
    SELECT f.lang, f.n_before::BIGINT AS n_before,
           count(k.lang)::BIGINT AS n_kept,
           round(f.frac, 6) AS frac_r
    FROM fracs f LEFT JOIN kept k ON k.lang = f.lang
    GROUP BY f.lang, f.n_before, f.frac
    """,
)
def docs_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMAIN-MIXTURE rebalancing — the down-sampling step that hits a
    target language (or source/domain) mixture before training: target =
    uniform share per language; per-language keep fraction =
    min(1, target/actual); membership decided by a md5 PRF on doc_id, so
    the sample is deterministic, engine-portable, and stable under
    repartitioning. The fixture's langs are skewed (en ~3× fr), so the
    fractions genuinely bite.

    Scale shape: one tiny groupBy for the counts, broadcast of the
    |langs|-row fraction table onto the doc scan, map-side PRF filter —
    the sample itself shuffles NOTHING at any corpus size."""
    from bigdata_capstone_spark.functions.portable import md5_long

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # counts cached (|langs| rows): mn/tot + fracs + the result join all
    # reuse it — uncached, each reuse re-scans the documents corpus
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_before")
    ).cache()
    tot = counts.agg(
        F.sum("n_before").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    fracs = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_before",
        F.least(
            F.lit(1.0),
            (F.col("total") / F.col("n_langs")) / F.col("n_before"),
        ).alias("frac"),
    )
    kept = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(fracs), on="lang")
        .filter(
            md5_long(F.concat(F.lit("mix:"), F.col("doc_id"))) % 1_000_000
            < F.round(F.col("frac") * 1_000_000, 0).cast("long")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return fracs.join(kept, on="lang", how="left").select(
        "lang",
        "n_before",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.round("frac", 6).alias("frac_r"),
    )


@register(
    "doc_unigram_logprob",
    # single source of truth: shared_sql.UNIGRAM_LP_CTES (also feeds the
    # catalog_train curriculum/rank-ensemble oracles, which reuse this
    # entry's Spark plan — one constant so the copies can't desync)
    oracle=UNIGRAM_LP_CTES
    + "\n    SELECT doc_id, n_tokens, avg_logprob_r FROM scored",
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM fluency proxy — the poor man's perplexity filter
    a pretraining pipeline runs when no trained LM is available: score =
    mean log10 corpus frequency of the document's tokens (gibberish and
    rare-token spam score low, ordinary prose scores high).

    Determinism: per-token logprobs are rounded to 6dp, then summed as
    exact integer micro-units (the decimal-sum discipline), so the
    per-document mean is reduction-order independent and bit-equal in
    both engines despite being a double average. The mean itself is
    rounded in INTEGER micro-unit space (round(s/n) then /1e6), not with
    round(x, 6) on the fraction: when s/n lands exactly on k+0.5 micro
    units the half-case is an exactly-representable double and both
    engines round it away from zero, whereas decimal rounding of the
    k/1e6 fraction diverges across engines at that boundary (hit once at
    sf0.001).

    Scale shape: one token explode feeding both the frequency table and
    the scoring join (both shuffle on the token key); the 1-row total is
    a broadcast cross join. The frequency join is the classic vocab-sized
    shuffle — AQE handles the stopword skew."""
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # cached: the frequency table and the scoring join share one
    # tokenize+explode (see doc_tfidf_top_terms)
    toks = fan_out(docs).select(
        "doc_id", F.explode(tokens_col("text")).alias("tok")
    ).cache()
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("nf"))
    tot = freq.agg(F.sum("nf").alias("total"))
    scored = (
        toks.join(freq, on="tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log10(F.col("nf") / F.col("total")), 6).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.round(
                F.sum(F.round(F.col("lp") * 1_000_000, 0).cast("long"))
                / F.count(F.lit(1)),
                0,
            ).cast("long")
            / F.lit(1_000_000.0)
        ).alias("avg_logprob_r"),
    )


def _sample_weights_oracle() -> str:
    from bigdata_capstone_spark.catalog import _clusters_oracle

    return f"""
    SELECT doc_id, cluster_id,
           round(1.0 / cluster_size, 6) AS weight_r
    FROM ({_clusters_oracle()})
    """


@register("dedup_sample_weights", oracle=_sample_weights_oracle())
def dedup_sample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware TRAINING WEIGHTS: instead of hard-dropping near
    duplicates, weight each document by 1/|its near-dup cluster| so every
    distinct content item contributes equally to the loss — the soft
    alternative to dedup-then-train (common when near-dups carry real
    signal, e.g. quoted news). Built on the value-checked clusters
    pipeline (LSH pairs → connected components), so the weights are
    oracle-exact through the recursive-CTE closure.

    Scale shape: identical to dedup_clusters_minhash plus one map-side
    division — no extra shuffle."""
    from bigdata_capstone_spark.operators.dedup import dedup_clusters

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    labeled = dedup_clusters(
        docs, n_perm=8, bands=4, min_jaccard=0.5, max_bucket_size=100
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight_r"),
    )


@register(
    "doc_pii_scrub",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
             AS n_emails,
           len(regexp_extract_all(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '[0-9]{9,}'))::BIGINT AS n_long_numbers,
           md5(regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                 '[0-9]{9,}', '<NUM>', 'g')) AS scrub_hash
    FROM documents
    """,
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, long digit runs → typed placeholders) with
    per-document redaction counts — the scrub step a pretraining pipeline
    runs before tokenization. The scrubbed text is value-checked via its
    md5 in the oracle, so the driver verifies the actual redaction output
    byte-for-byte, not just the counts. Narrow JVM regexp map, no
    shuffle."""
    from bigdata_capstone_spark.operators.textops import pii_scrub

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return pii_scrub(docs)


@register(
    "docs_gopher_rules",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS w,
             list_filter(string_split(text, chr(10)),
                         x -> trim(x) <> '') AS l
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             len(w)::BIGINT AS n_words,
             round(CASE WHEN len(w) > 0 THEN
               list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w)
               ELSE 0 END, 6) AS mean_word_len_r,
             round(CASE WHEN len(w) > 0 THEN
               ((length(text) - length(replace(text, '#', '')))
                + (len(string_split(text, '...')) - 1)
                + (length(text) - length(replace(text, chr(8230), ''))))
               * 1.0 / len(w) ELSE 0 END, 6) AS symbol_ratio_r,
             round(CASE WHEN len(l) > 0 THEN
               len(list_filter(l, x -> ltrim(x) LIKE '- %'
                                    OR ltrim(x) LIKE '* %'
                                    OR ltrim(x) LIKE chr(8226) || ' %'))
               * 1.0 / len(l) ELSE 0 END, 6) AS bullet_line_frac_r,
             round(CASE WHEN len(l) > 0 THEN
               len(list_filter(l, x -> rtrim(x) LIKE '%...'
                                    OR rtrim(x) LIKE '%' || chr(8230)))
               * 1.0 / len(l) ELSE 0 END, 6) AS ellipsis_line_frac_r,
             round(CASE WHEN len(w) > 0 THEN
               len(list_filter(w, x -> regexp_matches(x, '{LETTER_REGEX}')))
               * 1.0 / len(w) ELSE 0 END, 6) AS alpha_word_frac_r,
             len(list_intersect(
               list_distinct(list_transform(w, x -> lower(x))),
               ['the','be','to','of','and','that','have','with']
             ))::BIGINT AS n_stop_hits
      FROM base
    )
    SELECT *,
           (n_words >= 50 AND n_words <= 100000) AS r_word_count,
           (mean_word_len_r >= 3.0 AND mean_word_len_r <= 10.0)
             AS r_mean_word_len,
           (symbol_ratio_r <= 0.1) AS r_symbol_ratio,
           (bullet_line_frac_r <= 0.9) AS r_bullet_lines,
           (ellipsis_line_frac_r <= 0.3) AS r_ellipsis_lines,
           (alpha_word_frac_r >= 0.8) AS r_alpha_words,
           (n_stop_hits >= 2) AS r_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len_r >= 3.0 AND mean_word_len_r <= 10.0
            AND symbol_ratio_r <= 0.1 AND bullet_line_frac_r <= 0.9
            AND ellipsis_line_frac_r <= 0.3 AND alpha_word_frac_r >= 0.8
            AND n_stop_hits >= 2) AS passes_gopher
    FROM feat
    """,
)
def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule bundle (Rae et al. 2021 §A1.1, the
    DataTrove/RefinedWeb curation filter): per-document rule FLAGS
    (word count, mean word length, symbol ratio, bullet/ellipsis line
    fractions, alpha-word fraction, stopword presence) plus the overall
    pass — so a curation run can report WHICH rule rejected a document,
    not just a blended score (`doc_quality` keeps the blended-score
    shape). Fractions round to 6 dp BEFORE thresholding in both
    engines. Pure JVM higher-order folds over one token/line
    materialization — no shuffle, no Python."""
    from bigdata_capstone_spark.operators.textops import (
        gopher_quality_rules,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_rules(docs)


@register(
    "docs_line_dedup",
    oracle="""
    WITH ids AS (SELECT unnest(range(64)) AS i),
    docs AS (SELECT i AS doc_id, 5 + i % 6 AS L FROM ids),
    kept AS (
      SELECT doc_id, L,
             ['line ' || substr(md5('42:l:' || doc_id || ':' || j), 1, 12)
              for j in range(0, L) if j % 3 <> 2] AS kl
      FROM docs
    )
    SELECT doc_id::INT AS doc_id,
           L::BIGINT AS n_lines,
           len(kl)::BIGINT AS kept_lines,
           (L - len(kl))::BIGINT AS removed_lines,
           md5(array_to_string(kl, chr(10))) AS clean_hash
    FROM kept
    """,
)
def docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document line dedup (RefinedWeb/CCNet line cleaning): keep
    the first occurrence of each distinct line per document — the
    nav-menu/footer repetition cleaner that cross-document dedup
    (exact, MinHash, spans) never touches. Runs on the planted
    multi-line fixture (the parquet documents are single-line); the
    oracle regenerates the expected kept lines and the md5 of the
    cleaned text from the generative formula, so the first-occurrence
    semantics and emitted bytes are value-checked. Pure JVM map over
    one line materialization; nothing shuffles."""
    from bigdata_capstone_spark.operators.textops import (
        dedup_doc_lines,
        synthetic_lined_docs,
    )

    ensure_utc(spark)
    docs = synthetic_lined_docs(spark, n=64)
    return dedup_doc_lines(docs)


@register(
    "streaming_dedup_events",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE over an at-least-once feed, through the value gate:
    the events file is replayed as TWO unioned streams (every event
    arrives twice — the retry/replay duplication a real feed produces),
    stateful ``dropDuplicates`` on event_id keeps the first occurrence,
    and the drained sink must equal the original table exactly — the
    dedup state machine is hash-verified, not just row-counted.

    Scale shape: state is one marker per event id, hash-partitioned by
    id; the bounded-memory production variant is
    dropDuplicatesWithinWatermark (streaming/dedup.py), same plan shape
    with watermark-evicted state."""
    from bigdata_capstone_spark.streaming.dedup import dedup_events_exact
    from bigdata_capstone_spark.streaming.windows import (
        run_stream_to_memory,
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    cols = ["event_id", "user_id", "event_type", "value"]
    s1 = stream_events_from_parquet(spark, sf_dir).select(*cols)
    s2 = stream_events_from_parquet(spark, sf_dir).select(*cols)
    deduped = dedup_events_exact(s1.unionByName(s2), ["event_id"])
    run_stream_to_memory(deduped, "streaming_dedup_events_sink", "append")
    return spark.table("streaming_dedup_events_sink")


@register(
    "streaming_running_totals",
    oracle="""
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           (sum(round(value * 100)::BIGINT) / 100.0)::DOUBLE AS sum_value,
           max(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL running totals (applyInPandasWithState, update
    mode) through the value gate: per-user (count, exact cents-sum, max)
    accumulated across micro-batches; the FINAL emission per user (update
    mode re-emits a key whenever it appears — the row with the highest
    n_events is the complete state) must equal the plain batch groupBy
    the oracle runs. State is integer cents, so cross-batch accumulation
    is order-independent and engine-portable.

    Scale shape: state is 3 numbers per user, hash-partitioned like a
    groupBy; emission volume is keys-per-batch, not event volume."""
    from pyspark.sql.window import Window

    from bigdata_capstone_spark.streaming.stateful import running_user_totals
    from bigdata_capstone_spark.streaming.windows import (
        run_stream_to_memory,
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    stream = stream_events_from_parquet(spark, sf_dir)
    totals = running_user_totals(stream)
    run_stream_to_memory(totals, "streaming_running_totals_sink", "update")
    sink = spark.table("streaming_running_totals_sink")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "sum_value", "max_value")
    )


@register(
    "lang_id_confusion",
    oracle="""
    WITH scores AS (
      SELECT doc_id, lang,
        len(list_intersect(list_distinct(list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '')),
            ['the','and','of','to','a','in','is','that','it','for'])) AS s_en,
        len(list_intersect(list_distinct(list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '')),
            ['el','la','de','que','y','en','un','por','con','los'])) AS s_es,
        len(list_intersect(list_distinct(list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '')),
            ['der','die','und','das','nicht','von','ist','mit','den','zu'])) AS s_de,
        len(list_intersect(list_distinct(list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '')),
            ['le','la','et','les','des','en','un','du','une','est'])) AS s_fr
      FROM documents
    ),
    guessed AS (
      SELECT lang,
             CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                  WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                  ELSE 'fr' END AS lang_guess
      FROM scores
    )
    SELECT lang, lang_guess, count(*)::BIGINT AS n_docs
    FROM guessed GROUP BY lang, lang_guess
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality report: confusion counts of the declared ``lang``
    column against the function-word heuristic's guess — the accuracy
    check a curation pipeline runs before trusting either label. Pure
    map over the text column + a tiny (lang × guess) hash-agg."""
    from bigdata_capstone_spark.operators.textops import lang_id_heuristic

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    guessed = lang_id_heuristic(docs).join(
        docs.select("doc_id", "lang"), on="doc_id"
    )
    return guessed.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def _lang_id_trained_oracle(n: int = 2) -> str:
    """Full replay of the trained char-bigram NB lang-ID chain
    (operators/selection.py:nb_char_lang_predictions) on the
    deterministic fixture: gram explode, per-(lang, gram) counts,
    add-one smoothing, unseen fallback, priors, micro-unit sums, and
    the argmax with lang-ASC tie-break — training AND inference are
    both hash-verified. The fixture VALUES are generated from the SAME
    module constants the Spark entry uses."""
    from bigdata_capstone_spark.operators.selection import (
        synthetic_lang_corpus_rows,
    )

    vals = ", ".join(
        f"({i}, '{lang}', '{text}')"
        for i, lang, text in synthetic_lang_corpus_rows()
    )
    g = (
        "unnest(list_transform("
        f"generate_series(1, length(lower(text)) - {n - 1}), "
        f"i -> substring(lower(text), i, {n}))) AS g"
    )
    return f"""
    WITH docs(doc_id, lang, text) AS (VALUES {vals}),
    train AS (SELECT * FROM docs WHERE doc_id % 100 < 12),
    test AS (SELECT * FROM docs WHERE doc_id % 100 >= 12),
    tg AS (SELECT lang, {g} FROM train),
    counts AS (SELECT lang, g, count(*) AS c FROM tg GROUP BY 1, 2),
    tot AS (SELECT lang, sum(c) AS n_l FROM counts GROUP BY 1),
    vocab AS (SELECT count(DISTINCT g) AS v FROM counts),
    prior AS (
      SELECT lang,
             round(log10(count(*) * 1.0 /
                         (SELECT count(*) FROM train)), 6) AS pr
      FROM train GROUP BY 1
    ),
    ll AS (
      SELECT c.lang, c.g,
             round(log10((c.c + 1.0) / (t.n_l + v.v)), 6) AS ll
      FROM counts c JOIN tot t USING (lang) CROSS JOIN vocab v
    ),
    unseen AS (
      SELECT t.lang, round(log10(1.0 / (t.n_l + v.v)), 6) AS ull
      FROM tot t CROSS JOIN vocab v
    ),
    sg AS (SELECT doc_id, lang AS lang_true, {g} FROM test),
    scored AS (
      SELECT s.doc_id, s.lang_true, u.lang,
             sum(round(coalesce(l.ll, u.ull) * 1000000)::BIGINT)
               + any_value(round(p.pr * 1000000)::BIGINT) AS score
      FROM sg s
      CROSS JOIN unseen u
      LEFT JOIN ll l ON l.lang = u.lang AND l.g = s.g
      JOIN prior p ON p.lang = u.lang
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, lang_true, lang AS lang_pred FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT lang_true AS lang, lang_pred, count(*)::BIGINT AS n_docs
    FROM pred GROUP BY 1, 2
    """


@register("lang_id_trained_confusion", oracle=_lang_id_trained_oracle())
def lang_id_trained_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED language ID (r9 verdict Missing #1): confusion counts of
    a char-bigram multiclass Naive Bayes classifier
    (operators/selection.py:nb_char_lang_predictions) on a held-out
    slice of the deterministic six-language fixture — the
    CCNet/fastText step a multilingual pipeline runs first. The fixture
    includes ru AND uk: same Cyrillic script, different languages —
    the case the stopword heuristic (four Latin dictionaries → 'und')
    and script routing ('cyrillic', which one?) both cannot decide, and
    the within-script separation a char-n-gram model exists for. A test
    pins the trained model's held-out accuracy ABOVE the heuristic's on
    the same docs (test_round10_ops).

    Training is aggregation (per-(lang, gram) counts; char-gram vocab
    is |alphabet|^n-bounded, so the model table broadcasts at ANY
    corpus scale), inference is one explode + broadcast join + per-doc
    argmax — two passes total, no iterative solver."""
    from bigdata_capstone_spark.operators.selection import (
        nb_char_lang_predictions,
        synthetic_lang_corpus_rows,
    )

    ensure_utc(spark)
    docs = spark.createDataFrame(
        synthetic_lang_corpus_rows(), ["doc_id", "lang", "text"]
    )
    train = docs.filter(F.col("doc_id") % 100 < 12)
    test = docs.filter(F.col("doc_id") % 100 >= 12)
    preds = nb_char_lang_predictions(train, test, n=2)
    return preds.groupBy(
        F.col("lang_true").alias("lang"), "lang_pred"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "streaming_lang_id_model", oracle=_lang_id_trained_oracle()
)
def streaming_lang_id_model(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING maintenance of the NB language-ID model state (the
    9th mergeable family's stream twin): training documents arrive in
    4 micro-batches; each batch's (lang, gram, count) state folds into
    the persisted state by exact integer sums
    (selection.nb_char_lang_state / _merge), and inference from the
    drained state must equal the monolithic train+score BIT-FOR-BIT —
    same oracle as `lang_id_trained_confusion`. This is the
    "classifier stays current under arrivals" serving shape: no
    retraining pass, O(batch) state delta per trigger, state bounded
    by |langs| × |gram vocab| (|alphabet|^n)."""
    import tempfile

    from bigdata_capstone_spark.operators.selection import (
        nb_char_lang_predictions_from_state,
        nb_char_lang_state,
        nb_char_lang_state_merge,
        synthetic_lang_corpus_rows,
    )
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_state_fold_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_langid_")
    docs = spark.createDataFrame(
        synthetic_lang_corpus_rows(), ["doc_id", "lang", "text"]
    )
    train = docs.filter(F.col("doc_id") % 100 < 12)
    test = docs.filter(F.col("doc_id") % 100 >= 12)
    train.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema("doc_id BIGINT, lang STRING, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
    )
    q = start_state_fold_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        partial_fn=lambda b: nb_char_lang_state(b, n=2),
        fold_fn=lambda old, new: nb_char_lang_state_merge([old, new]),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = read_latest_snapshot_or_empty(
        spark, f"{work}/state", "lang STRING, g STRING, c BIGINT"
    )
    preds = nb_char_lang_predictions_from_state(state, test, n=2)
    return preds.groupBy(
        F.col("lang_true").alias("lang"), "lang_pred"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def _lang_id_shard_merge_oracle(n: int = 2, n_shards: int = 3) -> str:
    """The trained-lang-ID oracle with the TRAINING COUNTS explicitly
    decomposed into per-shard states and re-summed — the merge group
    law of the mergeable NB state (counts over disjoint shards add to
    the union's counts, exactly), replayed hash-exactly end-to-end
    through inference."""
    base = _lang_id_trained_oracle(n)
    shard_counts = " UNION ALL ".join(
        f"""SELECT lang, g, count(*) AS c FROM (
             SELECT t.lang, unnest(list_transform(
               generate_series(1, length(lower(t.text)) - {n - 1}),
               i -> substring(lower(t.text), i, {n}))) AS g
             FROM train t WHERE t.doc_id % {n_shards} = {s}
           ) GROUP BY lang, g"""
        for s in range(n_shards)
    )
    decomposed = f"""counts AS (
      SELECT lang, g, sum(c) AS c FROM ({shard_counts}) GROUP BY lang, g
    ),"""
    # replace the monolithic counts CTE with the shard-merged one
    import re as _re

    out, n_sub = _re.subn(
        r"counts AS \(SELECT lang, g, count\(\*\) AS c FROM tg "
        r"GROUP BY 1, 2\),",
        lambda _m: decomposed,
        base,
    )
    if n_sub != 1:
        raise AssertionError("counts CTE not found for shard decomposition")
    return out


@register(
    "lang_id_model_shard_merge", oracle=_lang_id_shard_merge_oracle()
)
def lang_id_model_shard_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classifier training as a MERGEABLE AGGREGATION — the 9th
    mergeable-state family (operators/selection.py:nb_char_lang_state /
    _merge / _predictions_from_state): the NB language model's state is
    one (lang, gram, count) frame (+ g-NULL doc-count rows, the panel
    discriminator convention); states over disjoint document shards
    merge by integer sums, EXACTLY equal to training on the union (no
    approximation in the law — pinned bit-exact in test_round10_ops).
    This entry trains three shard states (doc_id % 3), merges them, and
    scores the held-out slice — the oracle replays the decomposition
    (per-shard counts, the re-sum, then the full inference chain), and
    its confusion must equal `lang_id_trained_confusion`'s.

    At 100 TB this is HOW the classifier trains: per-partition map-side
    count states, one exact merge — and how it stays current under
    arrivals (merge the new batch's state in; no retraining pass)."""
    from bigdata_capstone_spark.operators.selection import (
        nb_char_lang_predictions_from_state,
        nb_char_lang_state,
        nb_char_lang_state_merge,
        synthetic_lang_corpus_rows,
    )

    ensure_utc(spark)
    docs = spark.createDataFrame(
        synthetic_lang_corpus_rows(), ["doc_id", "lang", "text"]
    )
    train = docs.filter(F.col("doc_id") % 100 < 12)
    test = docs.filter(F.col("doc_id") % 100 >= 12)
    states = [
        nb_char_lang_state(train.filter(F.col("doc_id") % 3 == s), n=2)
        for s in range(3)
    ]
    merged = nb_char_lang_state_merge(states)
    preds = nb_char_lang_predictions_from_state(merged, test, n=2)
    return preds.groupBy(
        F.col("lang_true").alias("lang"), "lang_pred"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): the curated-corpus → dense training
# batches step. pack_sequences (operators/textops.py) PRF-shards each lang
# stream so the running-token-sum window is bounded per partition; this
# entry reports per-pack occupancy, which is what a data loader consumes
# and what an engineer inspects for fill-ratio regressions.
# --------------------------------------------------------------------------

@register(
    "doc_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> ''))::BIGINT AS n_tokens,
             (('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 15))::BIGINT)
               % 8 AS shard
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, shard, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM t
    )
    SELECT lang, shard, (cum_before // 512)::BIGINT AS pack_id,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS pack_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c
    GROUP BY lang, shard, pack_id
    """,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per-(lang, shard) token streams cut
    into 512-token packs; one row per pack with doc count, token occupancy
    and the covering doc-id range. PRF sharding keeps every window
    partition bounded (scale knob: n_shards), so the assignment is one
    shuffle however large the corpus."""
    from bigdata_capstone_spark.operators.textops import pack_sequences

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, capacity=512, n_shards=8)
    return packed.groupBy("lang", "shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# Corpus health report: exact-duplication rate per source. The number a
# data-acquisition team watches per crawl/source — distinct digests vs
# rows. Shuffles 32-char digests only, never bodies; the ratio of two
# exact BIGINTs divides identically in both engines (no rounding needed).
# --------------------------------------------------------------------------

@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT md5(text))::BIGINT AS n_unique,
           1.0 - count(DISTINCT md5(text)) / (count(*) * 1.0) AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplication rate per source: 1 - distinct(md5(text))/count.
    The per-crawl corpus-health number; digests shuffle, bodies do not."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    uniq = F.countDistinct(F.md5("text"))
    return docs.groupBy("source").agg(
        n.alias("n_docs"),
        uniq.alias("n_unique"),
        (F.lit(1.0) - uniq / (n * F.lit(1.0))).alias("dup_rate"),
    )


# --------------------------------------------------------------------------
# Global-quantile length-band filter: drop the shortest 5% and longest 5%
# of documents by n_chars — the outlier-trim a quality pipeline applies
# before training. Thresholds are DISCRETE order statistics computed from
# the length HISTOGRAM (distinct n_chars values), not a global row sort:
# the cumulative-count frame is |distinct lengths| rows however many
# documents exist, so the "global sort" is over a tiny domain and the
# thresholds are integer-exact in both engines (no percentile
# interpolation ulp hazards). At 100 TB this beats approx_percentile:
# exact AND cheaper when the value domain is bounded.
# --------------------------------------------------------------------------

@register(
    "doc_length_band_filter",
    oracle="""
    WITH hist AS (
      SELECT n_chars, count(*) AS cnt FROM documents GROUP BY n_chars
    ),
    cum AS (
      SELECT n_chars,
             sum(cnt) OVER (ORDER BY n_chars) AS cum_cnt,
             sum(cnt) OVER () AS total
      FROM hist
    ),
    thresholds AS (
      SELECT min(CASE WHEN cum_cnt >= ceil(0.05 * total) THEN n_chars END)
               AS lo,
             min(CASE WHEN cum_cnt >= ceil(0.95 * total) THEN n_chars END)
               AS hi
      FROM cum
    )
    SELECT lang, lo, hi,
           count(*)::BIGINT AS n_kept,
           sum(d.n_chars)::BIGINT AS kept_chars
    FROM documents d CROSS JOIN thresholds
    WHERE d.n_chars BETWEEN lo AND hi
    GROUP BY lang, lo, hi
    """,
)
def doc_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P05-P95 length-band filter via discrete order statistics over the
    length histogram; per-lang kept counts with the integer thresholds.
    The histogram cumsum runs over |distinct n_chars| rows (bounded
    domain), then the 1-row threshold frame broadcasts onto the scan."""
    from bigdata_capstone_spark.operators.relational import (
        partitioned_prefix_sum,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # hist is cached: it feeds the cumsum AND the total — uncached, the
    # documents scan would run twice
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt")).cache()
    # distributed histogram cumsum (exact BIGINT) + a broadcast 1-row
    # total — no unpartitioned window even over the bounded length domain
    total = hist.agg(F.sum("cnt").alias("total"))
    cum = partitioned_prefix_sum(
        hist, [F.col("n_chars")], F.col("cnt"), "cum_cnt"
    ).crossJoin(F.broadcast(total))
    thresholds = cum.agg(
        F.min(
            F.when(
                F.col("cum_cnt") >= F.ceil(F.lit(0.05) * F.col("total")),
                F.col("n_chars"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("cum_cnt") >= F.ceil(F.lit(0.95) * F.col("total")),
                F.col("n_chars"),
            )
        ).alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(thresholds))
        .filter(F.col("n_chars").between(F.col("lo"), F.col("hi")))
        .groupBy("lang", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


# --------------------------------------------------------------------------
# MERGE / upsert (operators/merge.py): SCD1 dimension refresh as one
# full-outer join — what Delta/Iceberg MERGE executes underneath. The
# changeset here is derived from events: purchase totals ADD to existing
# customer balances (combine override), signup totals create NEW customers
# under a staged key range (insert branch); untouched customers pass
# through. Both MERGE branches are value-checked by the oracle.
# --------------------------------------------------------------------------

# Shared with catalog_train's changelog/reconciliation oracles via the
# leaf module shared_sql (import-order-safe: see shared_sql docstring).
from bigdata_capstone_spark.shared_sql import (  # noqa: E402
    MERGED_CUSTOMER_CTES as _MERGED_CUSTOMER_CTES,
    REPEATED_SPAN_CTES as _REPEATED_SPAN_CTES,
)


@register(
    "customer_balance_merge",
    oracle=f"""
    WITH {_MERGED_CUSTOMER_CTES}
    SELECT * FROM merged
    """,
)
def customer_balance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE of an event-derived changeset into the customer dimension:
    purchase totals add to matched balances, signups insert staged new
    customers, everyone else passes through. One full-outer join on the
    key (broadcast — changesets are small); both branches oracle-checked."""
    from bigdata_capstone_spark.functions.portable import exact_sum
    from bigdata_capstone_spark.operators.merge import merge_upsert

    ensure_utc(spark)
    # cached: the dimension feeds the staged-key max, the merge target,
    # and (in the changelog/reconciliation variants) the before-image.
    # The events fact is NOT cached — at 100 TB that would materialize
    # the whole corpus to executor disk; instead ONE aggregation pass
    # (filter to the two changeset types, group by user+type) produces a
    # per-user frame bounded by |users|, and THAT small changeset is
    # cached for its two consumers (purchase deltas / signup inserts).
    cust = load_table(spark, sf_dir, "customer").cache()
    changes = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("user_id", "event_type")
        .agg(exact_sum("value", 2).alias("total"))
        .cache()
    )
    purch = changes.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_custkey"), F.col("total").alias("delta")
    )
    # staged new-customer ids allocated after the current max key, so the
    # insert branch can never collide with an existing customer at any SF
    # (a fixed offset did exactly that at sf0.1 — caught by the 10x gate)
    mx = cust.agg(F.max("c_custkey").alias("mx"))
    signup = (
        changes.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("total").alias("c_acctbal"))
        .crossJoin(F.broadcast(mx))
        .withColumn("c_custkey", F.col("mx") + 1 + F.col("user_id"))
        .select(
            "c_custkey",
            F.concat(F.lit("NEW#"), F.col("c_custkey").cast("string")).alias(
                "c_name"
            ),
            (F.col("user_id") % 25).cast("int").alias("c_nationkey"),
            "c_acctbal",
            F.lit("SIGNUP").alias("c_mktsegment"),
        )
    )
    # matched-update rows carry the DELTA in c_acctbal; the combine lambda
    # adds it to the target balance at merge time
    upd = purch.select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.col("delta").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    ).unionByName(signup)
    return merge_upsert(
        cust,
        upd,
        on=["c_custkey"],
        combine={
            "c_acctbal": lambda t, u: t + u,
            "c_name": lambda t, u: t,
            "c_nationkey": lambda t, u: t,
            "c_mktsegment": lambda t, u: t,
        },
        broadcast_updates=True,
    )


# --------------------------------------------------------------------------
# Incremental aggregate maintenance: prove the partial-state merge. Daily
# stats are computed per ingest batch (PRF split of events), the partial
# states merged (count+count, sum+sum, min/min, max/max), and the oracle
# recomputes the same stats in ONE direct pass — value-checking the
# mergeable-state property every incremental/streaming aggregation at
# 100 TB depends on (new batches fold into yesterday's state; nothing is
# ever recomputed from raw history).
# --------------------------------------------------------------------------

@register(
    "events_incremental_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           count(value)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY day
    """,
)
def events_incremental_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event stats maintained INCREMENTALLY: per-batch partial states
    (PRF batch split) merged state-by-state; the oracle computes the same
    stats directly, so the merge's correctness is hash-checked. Decimal
    sums make the partial merge exact (order/assignment independent)."""
    from bigdata_capstone_spark.functions.portable import md5_long

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    batch = F.pmod(md5_long(F.col("event_id").cast("string")), F.lit(2))
    partials = (
        ev.withColumn("batch", batch)
        .groupBy("day", "batch")
        .agg(
            F.count("value").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
    )
    return partials.groupBy("day").agg(
        F.sum("n").alias("n"),
        F.sum("s").cast("double").alias("total_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )


# --------------------------------------------------------------------------
# Streaming maintenance through the value gate (streaming/upsert.py): the
# CDC → serving-table snapshot and the incrementally-maintained aggregate
# table, both drained as REAL streams into versioned parquet snapshots and
# hash-compared against direct batch SQL.
# --------------------------------------------------------------------------

@register(
    "streaming_upsert_snapshot",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC)
               AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def streaming_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC → serving table: the event stream drained through the
    foreachBatch last-write-wins upsert sink into an epoch-versioned
    parquet snapshot (streaming/upsert.py — the MVCC pattern ACID table
    formats package); the final snapshot is one row per user (their
    latest event by ts, unique in this dataset) and is hash-compared
    against the direct argmax SQL."""
    import tempfile

    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot,
        start_upsert_snapshot,
    )
    from bigdata_capstone_spark.streaming.windows import (
        stream_events_from_parquet,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="upsert_snapshot_")
    stream = stream_events_from_parquet(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    q = start_upsert_snapshot(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["user_id"],
        order_col="ts",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_latest_snapshot(spark, f"{work}/state").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )


@register(
    "streaming_incremental_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           count(value)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY day
    """,
)
def streaming_incremental_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance, value-checked: events are
    re-sharded into 4 files and streamed one file per micro-batch; each
    batch's PARTIAL daily states (count / decimal sum / min / max) fold
    into the previous snapshot via merge_upsert with associative+
    commutative combines, so the final table is independent of the batch
    split — and hash-equal to the oracle's one direct pass. The state
    table is |days| rows however many events stream through."""
    import tempfile

    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_aggregate_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="incr_daily_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        .select(F.date_trunc("day", F.col("ts")).alias("day"), "value")
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["day"],
        partial_aggs=[
            F.count("value").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ],
        combines={
            "n": lambda t, u: t + u,
            "s": lambda t, u: t + u,
            "min_value": lambda t, u: F.least(t, u),
            "max_value": lambda t, u: F.greatest(t, u),
        },
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_latest_snapshot_or_empty(
        spark,
        f"{work}/state",
        "day TIMESTAMP, n BIGINT, s DECIMAL(28,2), "
        "min_value DOUBLE, max_value DOUBLE",
    ).select(
        "day",
        "n",
        F.col("s").cast("double").alias("total_value"),
        "min_value",
        "max_value",
    )


# --------------------------------------------------------------------------
# Reconciliation (operators/reconcile.py): row-level diff of two snapshot
# versions — the "did the backfill/migration preserve the data" report.
# Here: customer dimension before vs after the MERGE changeset; the oracle
# rebuilds the merged snapshot in SQL and diffs with IS DISTINCT FROM
# (the null-safe twin of eqNullSafe).
# --------------------------------------------------------------------------

@register(
    "customer_merge_reconciliation",
    oracle=f"""
    WITH {_MERGED_CUSTOMER_CTES},
    d AS (
      SELECT CASE WHEN c.c_custkey IS NULL THEN 'added'
                  WHEN m.c_custkey IS NULL THEN 'removed'
                  WHEN m.c_name       IS DISTINCT FROM c.c_name
                    OR m.c_nationkey  IS DISTINCT FROM c.c_nationkey
                    OR m.c_acctbal    IS DISTINCT FROM c.c_acctbal
                    OR m.c_mktsegment IS DISTINCT FROM c.c_mktsegment
                  THEN 'changed' ELSE 'unchanged' END AS status
      FROM customer c FULL OUTER JOIN merged m USING (c_custkey)
    )
    SELECT status, count(*)::BIGINT AS n_rows FROM d GROUP BY status
    """,
)
def customer_merge_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation report for the MERGE: null-safe row diff of the
    customer dimension against its post-changeset snapshot — counts of
    added / changed / unchanged keys (removed would flag a MERGE bug; the
    oracle confirms none appear). One key-shuffle full-outer join."""
    from bigdata_capstone_spark.operators.reconcile import (
        snapshot_diff_summary,
    )

    ensure_utc(spark)
    cust = load_table(spark, sf_dir, "customer")
    merged = customer_balance_merge(spark, sf_dir)
    return snapshot_diff_summary(cust, merged, on=["c_custkey"])


# --------------------------------------------------------------------------
# One-pass data profiling: the table-health report (null fractions, exact
# cardinalities, ranges) a platform publishes per ingest. Multiple exact
# count(DISTINCT) in one aggregate costs one Expand pass (input ×k) —
# acceptable for a profiling job; at 100 TB swap exact distincts for the
# HLL sketch (operators/sketches.py) column by column.
# --------------------------------------------------------------------------

@register(
    "events_profile",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           count(DISTINCT user_id)::BIGINT AS user_id_distinct,
           count(DISTINCT event_type)::BIGINT AS event_type_distinct,
           (count(*) - count(value))::BIGINT AS value_nulls,
           min(value) AS value_min,
           max(value) AS value_max,
           (count(*) - count(ts))::BIGINT AS ts_nulls,
           min(ts) AS ts_min,
           max(ts) AS ts_max
    FROM events
    """,
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass profiling row for the events table: row count, exact
    per-column cardinalities, null counts, value/time ranges."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    return ev.agg(
        n.alias("n_rows"),
        F.countDistinct("user_id").alias("user_id_distinct"),
        F.countDistinct("event_type").alias("event_type_distinct"),
        (n - F.count("value")).alias("value_nulls"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        (n - F.count("ts")).alias("ts_nulls"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )


# --------------------------------------------------------------------------
# Z-order clustering key (operators/zorder.py): the Morton interleave is
# value-checked here — per z-tile stats prove each bucket covers one small
# 2-D tile of the (orderkey, partkey) plane (ranges ≤ 16 per side for
# 8-bit keys bucketed by the top 8 bits), which is exactly the property
# that makes multi-column file pruning work.
# --------------------------------------------------------------------------

def _zorder_oracle() -> str:
    from bigdata_capstone_spark.operators.zorder import zorder_key_sql

    z = zorder_key_sql(["l_orderkey % 256", "l_partkey % 256"], bits=8)
    return f"""
    WITH keyed AS (
      SELECT (l_orderkey % 256) AS x, (l_partkey % 256) AS y,
             {z} AS z
      FROM lineitem
    )
    SELECT (z >> 8)::BIGINT AS z_bucket,
           count(*)::BIGINT AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM keyed GROUP BY z_bucket
    """


@register("lineitem_zorder_buckets", oracle=_zorder_oracle())
def lineitem_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over (orderkey, partkey) truncated
    to 8 bits each, bucketed by the top 8 key bits: per-bucket row counts
    and per-dimension min/max prove each bucket is one 16x16 tile — the
    2-D locality that lets footer stats prune files on EITHER column.
    Cluster-write on this key via write_clustered_parquet for the real
    pruning path (footer test in test_storage.py)."""
    from bigdata_capstone_spark.operators.zorder import zorder_key

    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        (F.col("l_orderkey") % 256).alias("x"),
        (F.col("l_partkey") % 256).alias("y"),
    ).withColumn("z", zorder_key([F.col("x"), F.col("y")], bits=8))
    return keyed.groupBy(
        F.shiftright("z", 8).cast("long").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )


# --------------------------------------------------------------------------
# Bucketed co-located join: orders and lineitem hash-bucketed by the join
# key into managed tables → the fact⋈fact join AND the follow-on groupBy
# on the same key run with ZERO exchange (plan-pinned). Bucketing is the
# layout lever that amortizes across queries: at 100 TB every repeated
# orderkey join stops shuffling both fact tables.
# --------------------------------------------------------------------------

@register(
    "bucketed_order_revenue",
    oracle="""
    SELECT o.o_orderkey,
           max(o.o_totalprice) AS o_totalprice,
           count(*)::BIGINT AS n_items,
           sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4)))::DOUBLE AS net_revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    """,
)
def bucketed_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order net revenue off BUCKETED fact tables: orders and
    lineitem are written ``bucketBy(orderkey) + sortBy`` as managed
    tables, and the sort-merge join (hinted — a broadcast would hide the
    point) plus the groupBy on the bucket key both reuse the on-disk
    hash distribution: the WHOLE plan has zero shuffle Exchange and zero
    explicit Sort (pinned by test_bucketed_join_no_exchange). The same
    aggregation over flat files is the oracle — layout must never change
    values."""
    from bigdata_capstone_spark.sources.sinks import write_bucketed_table

    ensure_utc(spark)
    write_bucketed_table(
        load_table(spark, sf_dir, "orders"),
        "bucketed_orders",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem"),
        "bucketed_lineitem",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    o = spark.table("bucketed_orders").select("o_orderkey", "o_totalprice")
    li = spark.table("bucketed_lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).cast("decimal(18,4)").alias("net"),
    )
    joined = o.hint("merge").join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return joined.groupBy("o_orderkey").agg(
        F.max("o_totalprice").alias("o_totalprice"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("net").cast("double").alias("net_revenue"),
    )


# --------------------------------------------------------------------------
# Temperature-damped mixture (alpha = 0.5): the multilingual-pretraining
# sampling scheme — downsample common languages toward the rarest with a
# square-root damping, so the mixture flattens WITHOUT collapsing to
# uniform (rare langs keep 1.0, a 9x-bigger lang keeps 1/3, not 1/9).
# alpha is pinned at 0.5 deliberately: sqrt is correctly-rounded IEEE in
# every engine while pow(x, alpha) is not, so the keep fractions (and the
# micro-unit PRF thresholds derived from them) are bit-identical in Spark
# and DuckDB with no cross-group float sums anywhere.
# --------------------------------------------------------------------------

@register(
    "docs_temperature_rebalance",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n_before FROM documents GROUP BY lang
    ),
    mn AS (SELECT min(n_before) AS n_min FROM counts),
    fracs AS (
      SELECT lang, n_before,
             least(1.0, sqrt(n_min * 1.0 / n_before)) AS frac
      FROM counts CROSS JOIN mn
    ),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN fracs f ON f.lang = d.lang
      WHERE (('0x' || substr(md5('temp:' || d.doc_id), 1, 15))::BIGINT)
              % 1000000 < round(f.frac * 1000000)::BIGINT
    )
    SELECT f.lang, f.n_before::BIGINT AS n_before,
           count(k.lang)::BIGINT AS n_kept,
           round(f.frac, 6) AS frac_r
    FROM fracs f LEFT JOIN kept k ON k.lang = f.lang
    GROUP BY f.lang, f.n_before, f.frac
    """,
)
def docs_temperature_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-damped (alpha=0.5) language rebalance: keep fraction
    min(1, sqrt(n_min/n_lang)) per language, membership by md5 PRF —
    deterministic, engine-portable, shuffle-free (broadcast of the
    |langs|-row fraction table onto the scan). The sqrt keeps the mixture
    between natural and uniform, the standard multilingual-pretraining
    dial."""
    from bigdata_capstone_spark.functions.portable import md5_long

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # counts cached (|langs| rows) — see docs_lang_rebalance
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_before")
    ).cache()
    mn = counts.agg(F.min("n_before").alias("n_min"))
    fracs = counts.crossJoin(F.broadcast(mn)).select(
        "lang",
        "n_before",
        F.least(
            F.lit(1.0), F.sqrt(F.col("n_min") / F.col("n_before"))
        ).alias("frac"),
    )
    kept = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(fracs), on="lang")
        .filter(
            md5_long(F.concat(F.lit("temp:"), F.col("doc_id"))) % 1_000_000
            < F.round(F.col("frac") * 1_000_000, 0).cast("long")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return fracs.join(kept, on="lang", how="left").select(
        "lang",
        "n_before",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.round("frac", 6).alias("frac_r"),
    )


# --------------------------------------------------------------------------
# Quality-weighted (soft) sampling: keep probability = the document's
# quality score instead of a hard threshold — the softer curation dial
# that keeps a long tail of mid-quality text instead of cliff-dropping
# it. Membership is the same PRF mechanism as the mixture rebalances, but
# the threshold is PER-DOCUMENT (round(quality * 1e6) micro-units, exact
# in both engines because the score itself is gate-proven 6dp-identical).
# --------------------------------------------------------------------------

def _quality_sample_oracle() -> str:
    from bigdata_capstone_spark.catalog import ORACLE_SQL

    return f"""
    WITH qual AS ({ORACLE_SQL["doc_quality"]}),
    base AS (
      SELECT d.doc_id, d.lang, q.quality
      FROM documents d JOIN qual q USING (doc_id)
    ),
    kept AS (
      SELECT * FROM base
      WHERE (('0x' || substr(md5('qs:' || doc_id), 1, 15))::BIGINT)
              % 1000000 < round(quality * 1000000)::BIGINT
    )
    SELECT b.lang,
           count(DISTINCT b.doc_id)::BIGINT AS n_docs,
           count(DISTINCT k.doc_id)::BIGINT AS n_kept,
           sum(CAST(k.quality AS DECIMAL(18,6)))::DOUBLE AS kept_quality_sum
    FROM base b LEFT JOIN kept k ON k.doc_id = b.doc_id
    GROUP BY b.lang
    """


@register("docs_quality_weighted_sample", oracle=_quality_sample_oracle())
def docs_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft quality curation: each document is kept with probability equal
    to its composite quality score (PRF vs per-doc micro-unit threshold)
    — no cliff at an arbitrary cutoff. Per-lang report: corpus size, kept
    size, exact decimal sum of kept quality. Map-side filter; nothing
    shuffles but the |langs|-row summary."""
    from bigdata_capstone_spark.functions.portable import exact_sum, md5_long
    from bigdata_capstone_spark.operators.textops import quality_score

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # base cached: the totals branch and the kept branch both consume the
    # joined quality frame — uncached, the corpus scan + quality scoring
    # run twice
    base = (
        docs.select("doc_id", "lang")
        .join(quality_score(docs), on="doc_id")
        .cache()
    )
    kept = base.filter(
        md5_long(F.concat(F.lit("qs:"), F.col("doc_id"))) % 1_000_000
        < F.round(F.col("quality") * 1_000_000, 0).cast("long")
    )
    totals = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_agg = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        exact_sum("quality", 6).alias("kept_quality_sum"),
    )
    return totals.join(kept_agg, on="lang", how="left").select(
        "lang",
        "n_docs",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("kept_quality_sum"), F.lit(0.0)).alias(
            "kept_quality_sum"
        ),
    )


# --------------------------------------------------------------------------
# Embedding-space dedup clusters: the cosine near-dup pair graph closed
# under transitivity with the SAME iterative min-label components the
# minhash clusters use — semantic dedup's final step (drop all but one
# per embedding cluster). Composition of two independently gate-checked
# pieces; the oracle closes the same graph with a recursive CTE.
# --------------------------------------------------------------------------

def _embedding_clusters_oracle() -> str:
    from bigdata_capstone_spark.catalog import _embedding_cosine_oracle

    pairs = _embedding_cosine_oracle(6, 2, 64, 0.3)
    return f"""
    WITH RECURSIVE pairs AS ({pairs}),
    edges(src, dst) AS (
      SELECT idA, idB FROM pairs UNION ALL SELECT idB, idA FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(a, b) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    comp AS (SELECT a AS vec_id, min(b) AS cluster_id FROM reach GROUP BY a),
    labeled AS (
      SELECT e.vec_id, coalesce(c.cluster_id, e.vec_id) AS cluster_id
      FROM embeddings e LEFT JOIN comp c ON c.vec_id = e.vec_id
    ),
    sizes AS (
      SELECT cluster_id, count(*)::BIGINT AS cluster_size
      FROM labeled GROUP BY cluster_id
    )
    SELECT l.vec_id, l.cluster_id, s.cluster_size
    FROM labeled l JOIN sizes s ON s.cluster_id = l.cluster_id
    """


@register("embedding_dup_clusters", oracle=_embedding_clusters_oracle())
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup clusters: hyperplane-LSH cosine
    near-dup pairs closed under transitivity via the iterative min-label
    components — every vector labeled with its cluster id (= min vec_id)
    and cluster size. Same scale shape as the minhash closure: pair graph
    edges shuffle as (id, id); rounds = component diameter."""
    from bigdata_capstone_spark.operators.dedup import connected_components
    from bigdata_capstone_spark.operators.simsearch import (
        embedding_near_dup_pairs,
    )

    ensure_utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(
        emb, dim=64, min_cosine=0.3, n_planes=6, n_tables=2
    )
    comp = connected_components(pairs, a_col="idA", b_col="idB")
    labeled = emb.select("vec_id").join(
        comp.withColumnRenamed("node", "vec_id"), on="vec_id", how="left"
    ).select(
        "vec_id",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, on="cluster_id").select(
        "vec_id", "cluster_id", "cluster_size"
    )


# --------------------------------------------------------------------------
# Streaming SKETCH-state maintenance: HLL registers are mergeable state
# (max per bucket — associative+commutative), so a distinct-count sketch
# can be kept current per micro-batch exactly like the daily aggregates
# above, and the batch oracle value-checks the drained snapshot.
# --------------------------------------------------------------------------

def _streaming_hll_oracle() -> str:
    from bigdata_capstone_spark.functions.portable import md5_long_sql
    from bigdata_capstone_spark.operators.sketches import (
        HLL_ALPHA_64,
        HLL_M,
        HLL_M_BITS,
    )

    h = md5_long_sql("user_id::VARCHAR")
    value_bits = 60 - HLL_M_BITS
    return f"""
    WITH regs AS (
      SELECT ({h}) % {HLL_M} AS bucket,
             max({value_bits + 1} - length(bin(({h}) >> {HLL_M_BITS})))
               AS rho_max
      FROM events
      GROUP BY 1
    )
    SELECT CASE WHEN count(*) = 0 THEN 0.0 ELSE
             round({HLL_ALPHA_64} * {HLL_M * HLL_M} /
                   (list_reduce(list(power(2.0, -rho_max) ORDER BY bucket),
                                (a, x) -> a + x)::DOUBLE
                    + ({HLL_M} - count(*))::DOUBLE), 4) END AS hll_estimate,
           count(*)::BIGINT AS n_registers
    FROM regs
    """


@register("streaming_distinct_users_hll", oracle=_streaming_hll_oracle())
def streaming_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-count sketch maintenance, value-checked: events
    stream in 4 micro-batches; each batch computes its partial HLL
    registers (bucket -> max rho, a 64-row state) which fold into the
    snapshot via merge_upsert with greatest() — register merge is
    associative+commutative, so the drained sketch is independent of the
    batch split and hash-equal to the oracle's one-pass batch HLL. This
    is how a 100 TB pipeline keeps cardinality dashboards current:
    constant-size state, O(batch) updates, no distinct shuffle ever."""
    import tempfile

    from bigdata_capstone_spark.operators.sketches import (
        hll_bucket_rho,
        hll_estimate_from_registers,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_aggregate_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_hll_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        .select(bucket.alias("bucket"), rho.alias("rho"))
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["bucket"],
        partial_aggs=[F.max("rho").alias("rho_max")],
        combines={"rho_max": lambda t, u: F.greatest(t, u)},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    regs = read_latest_snapshot_or_empty(
        spark, f"{work}/state", "bucket BIGINT, rho_max INT"
    )
    return hll_estimate_from_registers(regs, [])


def _streaming_cms_oracle(d: int = 4, top_n: int = 20) -> str:
    return f"""
    WITH salts AS (SELECT unnest(generate_series(0, {d - 1})) AS r),
    counters AS (
      SELECT r,
             ('0x' || substr(md5(user_id::VARCHAR), 1 + 2 * r, 2))::INT AS slot,
             count(*) AS cnt
      FROM events CROSS JOIN salts
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT user_id, count(*)::BIGINT AS exact_cnt
      FROM events GROUP BY 1
      ORDER BY exact_cnt DESC, user_id LIMIT {top_n}
    ),
    probes AS (
      SELECT c.user_id, c.exact_cnt, s.r,
             ('0x' || substr(md5(c.user_id::VARCHAR), 1 + 2 * s.r, 2))::INT
               AS slot
      FROM cand c CROSS JOIN salts s
    )
    SELECT p.user_id, p.exact_cnt, min(ct.cnt)::BIGINT AS cms_estimate
    FROM probes p
    JOIN counters ct ON ct.r = p.r AND ct.slot = p.slot
    GROUP BY 1, 2
    """


@register("streaming_heavy_hitters_cms", oracle=_streaming_cms_oracle())
def streaming_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitter sketch maintenance, value-checked: the
    Count-Min counter grid is mergeable state under ADDITION — each
    micro-batch contributes its partial (r, slot) counts, folded into the
    4x256 snapshot via merge_upsert(+). Like the HLL twin, the drained
    grid is batch-split independent, so the oracle's one-pass batch CMS
    probes it hash-exactly. Probed for the top-20 users by exact count
    (the candidate set a real pipeline gets from a per-batch top-k or an
    external list). Constant ~1k-row state however many events stream."""
    import tempfile

    from bigdata_capstone_spark.operators.sketches import (
        _cms_slot,
        cms_point_estimates,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_aggregate_maintenance,
    )

    d = 4
    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_cms_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        .select(
            F.md5(F.col("user_id").cast("string")).alias("__h"),
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
        )
        .select("r", _cms_slot(F.col("__h"), F.col("r")).alias("slot"))
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["r", "slot"],
        partial_aggs=[F.count(F.lit(1)).alias("cnt")],
        combines={"cnt": lambda t, u: t + u},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counters = read_latest_snapshot_or_empty(
        spark, f"{work}/state", "r INT, slot INT, cnt BIGINT"
    )
    cand = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.col("user_id"))
        .limit(20)
    )
    return cms_point_estimates(counters, cand, "user_id", d)


def _streaming_bloom_oracle(m_bits: int = 12, k: int = 4,
                            n_probe: int = 300) -> str:
    m = 1 << m_bits
    return f"""
    WITH pos AS (
      SELECT unnest(list_transform(generate_series(0, {k - 1}),
             i -> ('0x' || substr(md5(user_id::VARCHAR), 1 + 4 * i, 4))::BIGINT
                  % {m})) AS pos
      FROM events
    ),
    words AS (
      SELECT (pos // 64)::INT AS widx,
             bit_or(CASE WHEN (pos % 64) = 63
                         THEN (-9223372036854775807 - 1)::BIGINT
                         ELSE 1::BIGINT << (pos % 64)::INT END) AS word
      FROM pos GROUP BY 1
    ),
    cand AS (SELECT unnest(range({n_probe}))::BIGINT AS probe_id),
    pp AS (
      SELECT c.probe_id,
             ('0x' || substr(md5(c.probe_id::VARCHAR), 1 + 4 * i.i, 4))::BIGINT
               % {m} AS pos
      FROM cand c CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS i) i
    ),
    hit AS (
      SELECT p.probe_id,
             coalesce((w.word >> (p.pos % 64)::INT) & 1, 0) AS bit
      FROM pp p LEFT JOIN words w ON w.widx = (p.pos // 64)::INT
    )
    SELECT probe_id FROM hit GROUP BY probe_id HAVING min(bit) = 1
    """


@register("streaming_bloom_users", oracle=_streaming_bloom_oracle())
def streaming_bloom_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom-filter maintenance, value-checked — the third
    mergeable-sketch family (HLL: max, CMS: +, Bloom: bitwise OR): each
    micro-batch contributes its partial (word-index, word) bit entries,
    folded via merge_upsert(|). The drained filter probes a 300-id
    candidate list with zero false negatives; the oracle replays bit
    positions, word packing, OR-merge, and the probe, so membership is
    hash-exact. The production use is shuffle pruning: build over the
    small side's keys per batch, broadcast ~KBs, drop big-side rows
    before they pay the shuffle."""
    import tempfile

    from bigdata_capstone_spark.operators.sketches import (
        _bloom_positions,
        bloom_entries_to_bitmap,
        bloom_probe,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_aggregate_maintenance,
    )

    m_bits, k = 12, 4
    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_bloom_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    pos_cols = _bloom_positions(F.col("user_id").cast("string"), m_bits, k)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        .select(F.explode(F.array(*pos_cols)).alias("pos"))
        .select(
            F.shiftright("pos", 6).cast("int").alias("widx"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["widx"],
        partial_aggs=[
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("word")
        ],
        combines={"word": lambda t, u: t.bitwiseOR(u)},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    bitmap = bloom_entries_to_bitmap(
        read_latest_snapshot_or_empty(
            spark, f"{work}/state", "widx INT, word BIGINT"
        ),
        m_bits,
    )
    cand = spark.range(300).withColumnRenamed("id", "probe_id")
    return bloom_probe(
        cand, bitmap, F.col("probe_id").cast("string"), m_bits, k
    )


# --------------------------------------------------------------------------
# Quantile-bin sketch (operators/sketches.py, fourth mergeable family):
# exact fixed-width bin counts, quantiles as discrete order statistics
# over the bins — batch entry + streaming maintenance twin, both
# hash-exact vs DuckDB because every count is an exact BIGINT and the
# bin edges are powers of two (exact float ops in any engine).
# --------------------------------------------------------------------------

_QUANTILE_ORACLE = """
    WITH bins AS (
      SELECT event_type, floor(value / 2.0)::BIGINT AS bin,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM bins
    )
    SELECT event_type,
           max(total)::BIGINT AS n_rows,
           round((min(CASE WHEN cum >= ceil(0.5 * total) THEN bin END) + 1)
                 * 2.0, 6) AS p50,
           round((min(CASE WHEN cum >= ceil(0.9 * total) THEN bin END) + 1)
                 * 2.0, 6) AS p90,
           round((min(CASE WHEN cum >= ceil(0.99 * total) THEN bin END) + 1)
                 * 2.0, 6) AS p99
    FROM cum GROUP BY event_type
    """


@register("event_value_quantiles", oracle=_QUANTILE_ORACLE)
def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per type via the QUANTILE-BIN sketch
    (bin width 2.0): the per-type latency/value dashboard computed from
    |types| x |occupied bins| rows of constant state instead of a
    per-type sort. Error is one-sided and bounded by the bin width (the
    reported value is the holding bin's upper edge); counts are exact,
    so the sketch — unlike t-digest — is deterministic and
    engine-replayable."""
    from bigdata_capstone_spark.operators.sketches import (
        quantile_bins,
        quantiles_from_bins,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    bins = quantile_bins(ev, ["event_type"], F.col("value"), 2.0)
    return quantiles_from_bins(bins, ["event_type"], 2.0, (0.5, 0.9, 0.99))


@register("streaming_value_quantiles", oracle=_QUANTILE_ORACLE)
def streaming_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile-sketch maintenance, value-checked: per-batch
    partial bin counts fold into the snapshot via merge_upsert(+) —
    bin counts are mergeable state exactly like CMS counters, so the
    drained sketch is batch-split independent and the one-pass batch
    oracle reads it hash-exactly. Constant |types| x |bins| state
    however many events stream; this is how a value-distribution
    dashboard stays current at 100 TB/day without ever sorting."""
    import tempfile

    from bigdata_capstone_spark.operators.sketches import (
        quantiles_from_bins,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_aggregate_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_quant_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        .select(
            "event_type",
            F.floor(F.col("value") / F.lit(2.0)).cast("long").alias("bin"),
        )
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["event_type", "bin"],
        partial_aggs=[F.count(F.lit(1)).alias("cnt")],
        combines={"cnt": lambda t, u: t + u},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    bins = read_latest_snapshot_or_empty(
        spark, f"{work}/state", "event_type STRING, bin BIGINT, cnt BIGINT"
    )
    return quantiles_from_bins(bins, ["event_type"], 2.0, (0.5, 0.9, 0.99))


@register(
    "event_p99_outliers",
    oracle="""
    WITH bins AS (
      SELECT event_type, floor(value / 2.0)::BIGINT AS bin,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM bins
    ),
    thresh AS (
      SELECT event_type,
             (min(CASE WHEN cum >= ceil(0.99 * total) THEN bin END) + 1)
               * 2.0 AS p99
      FROM cum GROUP BY event_type
    )
    SELECT e.event_type, t.p99 AS p99_threshold,
           count(*)::BIGINT AS n_outliers,
           round(max(e.value), 2) AS max_value
    FROM events e JOIN thresh t ON t.event_type = e.event_type
    WHERE e.value > t.p99
    GROUP BY 1, 2
    """,
)
def event_p99_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-latency-style outlier scan COMPOSED from the quantile-bin
    sketch: per-type p99 thresholds come from the (cached, mergeable)
    bin sketch — never a per-type sort — and broadcast back onto the
    scan as a plain filter. This is the production shape for 'alert on
    values above p99' at 100 TB: the sketch is constant-size state the
    streaming twin keeps current, and the detection pass is one
    filtered scan. Oracle replays bins -> threshold -> filter exactly
    (the z-score variant `event_value_anomalies` is the parametric
    cousin; this one is distribution-free)."""
    from bigdata_capstone_spark.operators.sketches import (
        quantile_bins,
        quantiles_from_bins,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    thresh = quantiles_from_bins(
        quantile_bins(ev, ["event_type"], F.col("value"), 2.0),
        ["event_type"],
        2.0,
        (0.99,),
    ).select("event_type", F.col("p99").alias("p99_threshold"))
    return (
        ev.join(F.broadcast(thresh), on="event_type")
        .filter(F.col("value") > F.col("p99_threshold"))
        .groupBy("event_type", "p99_threshold")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


# --------------------------------------------------------------------------
# Round-5 text-quality additions: corpus bigram LM scoring and cross-doc
# boilerplate detection — the two curation signals between the unigram
# fluency proxy (doc_unigram_logprob) and full near-dup dedup.
# --------------------------------------------------------------------------

@register(
    "doc_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
        SELECT doc_id,
               unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                       for i in range(1, len(t))]) AS p
        FROM toks WHERE len(t) >= 2
      )
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
    vocab AS (SELECT count(DISTINCT w2) AS v FROM c12),
    probs AS (
      SELECT c12.w1, c12.w2,
             round(log10((c12.c12 + 0.5) / (c1.c1 + 0.5 * vocab.v)), 6)
               AS lp
      FROM c12 JOIN c1 USING (w1) CROSS JOIN vocab
    ),
    scored AS (
      SELECT p.doc_id, pr.lp
      FROM pairs p JOIN probs pr ON pr.w1 = p.w1 AND pr.w2 = p.w2
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_bigrams,
           round(sum(round(lp * 1000000)::BIGINT) * 1.0
                 / count(*))::BIGINT / 1000000.0 AS avg_logprob_r
    FROM scored GROUP BY doc_id
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM fluency score with add-k smoothing — the next
    rung above `doc_unigram_logprob`: per-doc mean log10 of
    P(w2|w1) = (c(w1,w2) + 0.5) / (c(w1·) + 0.5·V), where c(w1·) is
    w1's bigram-history count and V the successor vocabulary. Word-salad
    with plausible unigrams but improbable transitions (the spam class
    the unigram proxy misses) scores low.

    Determinism follows the unigram entry exactly: the smoothed ratio is
    built from exact integers (so the double division is bit-identical
    in both engines), per-pair logprobs round to 6dp, the per-doc mean
    sums integer micro-units and rounds in integer space.

    Scale shape: ONE pair-explode pass feeds everything; bigram counts
    are a map-side-combined groupBy; history counts and the successor
    vocabulary derive from the (vocab²-bounded, cached) bigram-count
    table, never from a second corpus scan; scoring is one shuffle join
    on the (w1, w2) key (AQE absorbs the stopword-pair skew). Docs with
    fewer than 2 tokens have no transitions and are absent by design."""
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # cached: the bigram frame feeds the count table and the scoring
    # join (same shared-tokenize rationale as doc_unigram_logprob)
    pair = lambda i: F.struct(  # noqa: E731
        F.element_at(F.col("t"), i).alias("w1"),
        F.element_at(F.col("t"), i + 1).alias("w2"),
    )
    bg = (
        fan_out(docs).select("doc_id", tokens_col("text").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(F.sequence(F.lit(1), F.size("t") - 1), pair)
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .cache()
    )
    # vocab²-bounded count table: history counts and successor vocab both
    # derive from it, so the corpus is scanned once for all LM statistics
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).cache()
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = c12.agg(F.countDistinct("w2").alias("v"))
    probs = (
        c12.join(c1, on="w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log10(
                    (F.col("c12") + 0.5) / (F.col("c1") + 0.5 * F.col("v"))
                ),
                6,
            ).alias("lp"),
        )
    )
    return (
        bg.join(probs, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.round(
                    F.sum(F.round(F.col("lp") * 1_000_000, 0).cast("long"))
                    / F.count(F.lit(1)),
                    0,
                ).cast("long")
                / F.lit(1_000_000.0)
            ).alias("avg_logprob_r"),
        )
    )


def _boilerplate_oracle(min_docs: int = 3) -> str:
    from bigdata_capstone_spark.catalog import _SHINGLE_CTES
    from bigdata_capstone_spark.functions.portable import md5_long_sql

    return f"""
    WITH {_SHINGLE_CTES},
    hashed AS (SELECT doc_id, {md5_long_sql("sh")} AS shh FROM sh),
    dfreq AS (SELECT shh, count(*) AS dfc FROM hashed GROUP BY shh)
    SELECT h.doc_id,
           count(*)::BIGINT AS n_shingles,
           sum(CASE WHEN d.dfc >= {min_docs} THEN 1 ELSE 0 END)::BIGINT
             AS n_common,
           round(sum(CASE WHEN d.dfc >= {min_docs} THEN 1 ELSE 0 END)
                 * 1000000.0 / count(*))::BIGINT / 1000000.0
             AS common_frac
    FROM hashed h JOIN dfreq d ON d.shh = h.shh
    GROUP BY h.doc_id
    """


@register("doc_boilerplate_shingles", oracle=_boilerplate_oracle(3))
def doc_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate exposure: fraction of distinct word 3-gram
    shingles shared with >= 3 documents corpus-wide (C4/RefinedWeb-style
    template detection — catches licence blurbs and navigation chrome
    that survive document-level dedup because the surrounding text
    differs). See operators/dedup.py boilerplate_shingle_stats for the
    scale shape (digest-only shuffles, one cached hashed-shingle frame
    feeding frequency count + join-back)."""
    from bigdata_capstone_spark.operators.dedup import (
        boilerplate_shingle_stats,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = boilerplate_shingle_stats(docs, shingle_n=3, min_docs=3)
    # micro-unit integer rounding for the fraction (the half-case rule
    # from doc_unigram_logprob's docstring)
    return out.select(
        "doc_id",
        "n_shingles",
        F.col("n_common").cast("long").alias("n_common"),
        (
            F.round(F.col("n_common") * 1_000_000 / F.col("n_shingles"), 0)
            .cast("long")
            / F.lit(1_000_000.0)
        ).alias("common_frac"),
    )


@register(
    "event_value_quantiles_global",
    oracle="""
    WITH bins AS (
      SELECT 'all' AS scope, floor(value / 2.0)::BIGINT AS bin,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT scope, bin, cnt,
             sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY scope) AS total
      FROM bins
    )
    SELECT scope,
           max(total)::BIGINT AS n_rows,
           round((min(CASE WHEN cum >= ceil(0.5 * total) THEN bin END) + 1)
                 * 2.0, 6) AS p50,
           round((min(CASE WHEN cum >= ceil(0.9 * total) THEN bin END) + 1)
                 * 2.0, 6) AS p90,
           round((min(CASE WHEN cum >= ceil(0.999 * total) THEN bin END) + 1)
                 * 2.0, 6) AS p99_9
    FROM cum GROUP BY scope
    """,
)
def event_value_quantiles_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL quantiles (p50/p90/p99.9) via the bin sketch with a constant
    group column — the sanctioned route for corpus-wide order statistics
    after quantiles_from_bins started rejecting empty group_cols (an
    empty partitionBy would plan the banned single-partition window over
    the RAW rows; the constant column keeps the window over the
    sketch-sized bin frame only, which is bounded by value-range/width
    however large the corpus). Also exercises the sub-percent quantile
    labels (p99_9) the round-4 advice flagged as collision-prone."""
    from bigdata_capstone_spark.operators.sketches import (
        quantile_bins,
        quantiles_from_bins,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").withColumn("scope", F.lit("all"))
    bins = quantile_bins(ev, ["scope"], F.col("value"), 2.0)
    return quantiles_from_bins(bins, ["scope"], 2.0, (0.5, 0.9, 0.999))


# --------------------------------------------------------------------------
# Round-5 wave 2: model-based selection (classifier curation, DSIR),
# lexical retrieval (BM25), and exact-substring-span dedup — the four
# published data-curation families the suite did not yet cover.
# --------------------------------------------------------------------------

@register(
    "doc_bm25_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS token FROM toks)
      GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS dfc
              FROM tf GROUP BY token),
    stop AS (SELECT token FROM dfreq ORDER BY dfc DESC, token LIMIT 50),
    qdocs AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5),
    qterms AS (
      SELECT tf.doc_id AS query_doc, tf.token
      FROM tf JOIN qdocs USING (doc_id)
      WHERE tf.token NOT IN (SELECT token FROM stop)
    ),
    scored AS (
      SELECT q.query_doc, p.doc_id,
             round(ln(1.0 + (s.n_docs - d.dfc + 0.5) / (d.dfc + 0.5))
                   * (p.tf * (1.2 + 1.0))
                   / (p.tf + 1.2 * (0.25 + 0.75 * l.dl
                        / (s.total_len * 1.0 / s.n_docs))), 6) AS s
      FROM tf p
      JOIN qterms q ON p.token = q.token
      JOIN dfreq d ON d.token = p.token
      JOIN dl l ON l.doc_id = p.doc_id
      CROSS JOIN stats s
      WHERE p.doc_id <> q.query_doc
    ),
    pp AS (
      SELECT query_doc, doc_id, count(*)::BIGINT AS n_terms,
             sum(round(s * 1000000)::BIGINT) / 1000000.0 AS bm25_r
      FROM scored GROUP BY query_doc, doc_id
    )
    SELECT query_doc, doc_id, n_terms, bm25_r, rk FROM (
      SELECT pp.*, row_number() OVER (
               PARTITION BY query_doc ORDER BY bm25_r DESC, doc_id) AS rk
      FROM pp
    ) WHERE rk <= 5
    """,
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical top-k retrieval (BM25, Lucene idf) — the inverted-index
    counterpart to the embedding ANN ladder: the 5 lowest doc_ids act as
    queries (their non-stopword terms, top-50-df stopword cut) and each
    retrieves its top-5 neighbors by length-normalized term overlap.

    Scale shape (operators/retrieval.py): ONE corpus scan builds the
    cached postings table; doc lengths, document frequencies, the
    stopword cut (bounded TakeOrdered) and the query terms all derive
    from it; the query-term table BROADCASTS onto the postings so only
    postings of query terms survive — the inverted-index lookup as a
    join. The per-(query, candidate) aggregation and top-k window touch
    only the bounded candidate set. Transcendental discipline: per-term
    score rounds to 6 dp, per-pair totals sum integer micro-units."""
    from bigdata_capstone_spark.operators.retrieval import bm25_topk

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, n_queries=5, k=5, stop_df_top=50)
    return out.withColumn("rk", F.col("rk").cast("int"))


@register(
    "bm25_incremental_dfreq",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM documents
    )
    SELECT token, count(DISTINCT doc_id)::BIGINT AS dfc
    FROM toks GROUP BY token
    """,
)
def bm25_incremental_dfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the LEXICAL index's statistics: the
    document-frequency table is computed per ingest shard (base corpus
    doc_id < 250, two arrival batches 250-374 and >= 375 modeling
    independent shards) and MERGED by addition — df over disjoint doc
    sets adds, so keeping the BM25 index current costs O(batch), the
    lexical twin of embedding_ivfpq_incremental. The oracle recomputes
    df over the FULL corpus in one pass: merged-from-shards must equal
    recomputed-from-scratch exactly, which is precisely the mergeable-
    state law the sketch family proves (HLL max / CMS + / Bloom OR /
    df +).

    Scale shape (operators/retrieval.py:merge_dfreq): each shard's
    dfreq is one map-side-combined groupBy over its own postings; the
    merge is a union + re-aggregate on vocabulary-sized frames — no
    corpus re-scan, no coordination between shards."""
    from bigdata_capstone_spark.operators.retrieval import (
        dfreq_table,
        merge_dfreq,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    # 3 version/shard slices re-read the wide text column;
    # cache so the corpus scans once (same policy as
    # docs_token_budget_fill)
    base = docs.filter(F.col("doc_id") < 250)
    d1 = docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 375))
    d2 = docs.filter(F.col("doc_id") >= 375)
    return merge_dfreq(
        dfreq_table(base), dfreq_table(d1), dfreq_table(d2)
    )


@register(
    "corpus_recrawl_diff",
    oracle="""
    WITH v1 AS (SELECT doc_id, text FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
               AS text
      FROM documents WHERE doc_id >= 50
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             'new crawl doc ' || doc_id::VARCHAR AS text
      FROM documents WHERE doc_id < 30
    )
    SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.text IS NOT DISTINCT FROM v2.text
                  THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    """,
)
def corpus_recrawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-crawl diff: classify every document across two corpus
    versions as added / removed / changed / unchanged by content
    compare — the incremental-ingest primitive that decides which
    documents re-enter the dedup/quality/tokenize pipeline after a new
    crawl (everything 'unchanged' skips recomputation entirely). The
    second version is derived deterministically (head trimmed, every
    7th doc revised, 30 new arrivals) so the oracle replays the whole
    classification.

    Scale shape (operators/reconcile.py:snapshot_diff): ONE full-outer
    join keyed on doc_id; the compare is a narrow JVM expression. At
    crawl scale both sides hash-partition on the key once — and the
    'changed' set this emits is exactly the O(delta) input the
    incremental twins (bm25 df, IVF-PQ encode) consume."""
    from bigdata_capstone_spark.operators.reconcile import snapshot_diff

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    # 3 version/shard slices re-read the wide text column;
    # cache so the corpus scans once (same policy as
    # docs_token_budget_fill)
    v1 = docs.select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") >= 50)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 30).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(
                    F.lit("new crawl doc "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    return snapshot_diff(v1, v2, on=["doc_id"], compare_cols=["text"])


@register(
    "corpus_data_card",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang, source, n_chars,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS n_toks,
             md5(text) AS h,
             (0.3 * least(len(list_filter(string_split_regex(lower(text),
                  '\\s+'), x -> x <> '')) / 200.0, 1.0)
            + 0.3 * (len(list_distinct(list_filter(string_split_regex(
                  lower(text), '\\s+'), x -> x <> ''))) * 1.0
                / len(list_filter(string_split_regex(lower(text), '\\s+'),
                      x -> x <> '')))
            + 0.2 * (length(regexp_replace(text, '{NON_LETTER_REGEX}', '', 'g'))
                * 1.0 / length(text))
            + 0.2 * (len(list_intersect(list_distinct(list_filter(
                  string_split_regex(lower(text), '\\s+'), x -> x <> '')),
                  ['the','and','of','to','a','in','is','that','it','for']))
                / 10.0)) AS q
      FROM documents
    ),
    per_lang AS (
      SELECT lang, count(*) AS n_docs,
             count(DISTINCT source) AS n_sources,
             sum(n_toks) AS total_tokens,
             sum(n_chars) AS total_chars,
             count(DISTINCT h) AS distinct_texts,
             sum(CAST(q AS DECIMAL(18,12))) AS qsum
      FROM per_doc GROUP BY lang
    ),
    tot AS (SELECT sum(total_tokens) AS all_tokens FROM per_lang)
    SELECT lang,
           n_docs::BIGINT AS n_docs,
           n_sources::BIGINT AS n_sources,
           total_tokens::BIGINT AS total_tokens,
           total_chars::BIGINT AS total_chars,
           round(1.0 - distinct_texts * 1.0 / n_docs, 6) AS dup_rate_r,
           round(qsum::DOUBLE / n_docs, 6) AS mean_quality_r,
           round(total_tokens * 1.0
                 / (SELECT all_tokens FROM tot), 6) AS token_share_r
    FROM per_lang
    """,
)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-language corpus DATA CARD — the one-page summary every
    released training set ships (docs, sources, token/char volume,
    exact-duplicate rate, mean quality, token share of the corpus) —
    composed from the same expressions the per-doc entries check
    individually, in ONE pass over the text column.

    Determinism: the quality composite aggregates as DECIMAL(18,12)
    (order-independent) and only the final mean rounds; duplicate rate
    counts distinct md5(text). The corpus-total token share comes from
    a broadcast 1-row aggregate, not a global window — no
    single-partition stage anywhere."""
    from bigdata_capstone_spark.operators.textops import (
        quality_score_col,
        tokens_col,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(tokens_col("text")).alias("n_toks"),
        F.md5("text").alias("h"),
        quality_score_col("text").alias("q"),
    )
    per_lang = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("h").alias("distinct_texts"),
        F.sum(F.col("q").cast("decimal(18,12)")).alias("qsum"),
    ).cache()
    # cache the language-grain aggregate (a handful of rows): the
    # corpus-total branch would otherwise recompute it — i.e. scan the
    # wide text column a second time (caught by the plan_audit --scans
    # sweep)
    tot = per_lang.agg(F.sum("total_tokens").alias("all_tokens"))
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_sources",
        "total_tokens",
        "total_chars",
        F.round(
            1.0 - F.col("distinct_texts") / F.col("n_docs"), 6
        ).alias("dup_rate_r"),
        F.round(
            F.col("qsum").cast("double") / F.col("n_docs"), 6
        ).alias("mean_quality_r"),
        F.round(
            F.col("total_tokens") / F.col("all_tokens"), 6
        ).alias("token_share_r"),
    )


def _incremental_batch_oracle(
    n_perm: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.35,
    max_bucket_size: int = 100,
) -> str:
    """Replays the full incremental near-dup path: the recrawl batch
    (added + changed under the corpus_recrawl_diff v2 derivation), batch
    shingles/signatures/buckets, the corpus index (shingles, sizes, band
    buckets with the CORPUS-ONLY hot-bucket cap), the batch×index
    candidate join, and the exact-Jaccard verify — hash-for-hash with
    the Spark plan."""
    rows = n_perm // bands
    mins = ",\n             ".join(
        f"min(('0x' || substr(md5('{p // 2}:' || sh), "
        f"{1 + 15 * (p % 2)}, 15))::BIGINT) AS h{p}"
        for p in range(n_perm)
    )

    def band_selects(sigs: str) -> str:
        return "\n      UNION ALL ".join(
            f"SELECT doc_id, ('0x' || substr(md5('{b}:' || "
            + " || ':' || ".join(
                f"h{b * rows + r}::VARCHAR" for r in range(rows)
            )
            + f"), 1, 15))::BIGINT AS bucket FROM {sigs}"
            for b in range(bands)
        )

    return f"""
    WITH batch AS (
      SELECT doc_id, text || ' rev2' AS text FROM documents
      WHERE doc_id >= 50 AND doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             'new crawl doc ' || doc_id::VARCHAR AS text
      FROM documents WHERE doc_id < 30
    ),
    c_toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    c_sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM c_toks WHERE len(t) >= 3
    ),
    b_toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM batch
    ),
    b_sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM b_toks WHERE len(t) >= 3
    ),
    c_sizes AS (SELECT doc_id, count(*) AS n FROM c_sh GROUP BY doc_id),
    b_sizes AS (SELECT doc_id, count(*) AS n FROM b_sh GROUP BY doc_id),
    c_sigs AS (
      SELECT doc_id,
             {mins}
      FROM c_sh GROUP BY doc_id
    ),
    b_sigs AS (
      SELECT doc_id,
             {mins}
      FROM b_sh GROUP BY doc_id
    ),
    c_raw_buckets AS (
      {band_selects('c_sigs')}
    ),
    c_bucket_sizes AS (
      SELECT bucket, count(*) AS bn FROM c_raw_buckets GROUP BY bucket
    ),
    c_buckets AS (
      SELECT rb.doc_id, rb.bucket
      FROM c_raw_buckets rb
      JOIN c_bucket_sizes bs ON bs.bucket = rb.bucket
      WHERE bs.bn <= {max_bucket_size}
    ),
    b_buckets AS (
      {band_selects('b_sigs')}
    ),
    cands AS (
      SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
      FROM b_buckets b JOIN c_buckets c ON b.bucket = c.bucket
    ),
    common AS (
      SELECT cd.batch_id, cd.corpus_id, max(sa.n) AS nA, max(sb.n) AS nB,
             count(*) AS n_common
      FROM cands cd
      JOIN b_sh a ON a.doc_id = cd.batch_id
      JOIN c_sh b ON b.doc_id = cd.corpus_id AND b.sh = a.sh
      JOIN b_sizes sa ON sa.doc_id = cd.batch_id
      JOIN c_sizes sb ON sb.doc_id = cd.corpus_id
      GROUP BY 1, 2
    )
    SELECT batch_id, corpus_id,
           round(n_common * 1.0 / (nA + nB - n_common), 6) AS jaccard_r
    FROM common
    WHERE n_common * 1.0 / (nA + nB - n_common) >= {min_jaccard}
    """


@register("streaming_decontamination", oracle=_incremental_batch_oracle())
def streaming_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-FLIGHT decontamination through the value gate: the arriving
    documents stream as micro-batches, each micro-batch is LSH-deduped
    against the STATIC corpus index inside foreachBatch
    (incremental_near_dup_pairs — only the micro-batch is ever
    shingled/banded), and the drained union of per-trigger results must
    equal the one-shot batch run EXACTLY — the oracle IS
    dedup_incremental_batch's. This is the batch-split-independence law
    (corpus-only bucket cap) exercised on real Structured Streaming
    triggers: the filter a crawl pipeline runs against eval benchmarks
    while data is still arriving.

    Scale shape: per trigger O(micro-batch) shingling + a bucket-keyed
    join against the persisted index; no cross-trigger state at all —
    the index is the state, and it lives in tables, not in the stream."""
    import tempfile

    from bigdata_capstone_spark.operators.dedup import (
        incremental_near_dup_pairs,
        near_dup_index,
    )
    from bigdata_capstone_spark.operators.reconcile import snapshot_diff

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    v1 = docs.select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") >= 50)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 30).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(
                    F.lit("new crawl doc "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    diff = snapshot_diff(v1, v2, on=["doc_id"], compare_cols=["text"])
    arriving = v2.join(
        diff.filter(F.col("status").isin("added", "changed")).select(
            "doc_id"
        ),
        on="doc_id",
        how="left_semi",
    )
    bk, sh, sz = near_dup_index(v1, n_perm=8, bands=4, shingle_n=3)
    # the persisted-index stand-in: cache all three relations so every
    # trigger probes the SAME materialized index instead of re-deriving
    # it from the corpus scan
    index = (bk.cache(), sh.cache(), sz.cache())
    work = tempfile.mkdtemp(prefix="stream_decon_")
    arriving.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
    )
    out_dir = f"{work}/out"

    def apply(mb: DataFrame, epoch_id: int) -> None:
        incremental_near_dup_pairs(
            index,
            mb,
            n_perm=8,
            bands=4,
            shingle_n=3,
            min_jaccard=0.35,
            max_bucket_size=100,
        ).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = spark.read.parquet(out_dir)
    return res.select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard_r")
    )


@register("dedup_incremental_batch", oracle=_incremental_batch_oracle())
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup of an ARRIVING batch against the
    EXISTING corpus LSH index — the composition the recrawl diff was
    built for, and the last index family to gain an O(batch)
    maintenance twin (exact-dup digests, BM25 df, PQ, IVF-PQ already
    have one). The re-crawl's added/changed set (snapshot_diff over the
    corpus_recrawl_diff v2 derivation) IS the batch; only the batch is
    shingled/minhashed/banded at arrival, the corpus contributes its
    persisted index relations untouched — history is never re-banded.
    Changed docs (v1 text + ' rev2') near-duplicate their own previous
    version, so the batch→corpus hit structure is planted and the
    oracle replays banding, the corpus-only hot-bucket cap, candidate
    generation, and the exact-Jaccard verify hash-for-hash.

    Scale shape (operators/dedup.py:incremental_near_dup_pairs): the
    cap counts corpus-side members only — a stable property of the
    persisted index that also makes the result batch-split independent
    (pairs(b1 ∪ b2) == pairs(b1) ∪ pairs(b2), tested) — and per-batch
    work is bounded by batch size × cap."""
    from bigdata_capstone_spark.operators.dedup import (
        incremental_near_dup_pairs,
        near_dup_index,
    )
    from bigdata_capstone_spark.operators.reconcile import snapshot_diff

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    # same 2-slice v2 derivation as corpus_recrawl_diff (cache: the wide
    # text column scans once across the v1/v2 slices)
    v1 = docs.select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") >= 50)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 30).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(
                    F.lit("new crawl doc "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    diff = snapshot_diff(v1, v2, on=["doc_id"], compare_cols=["text"])
    batch = v2.join(
        diff.filter(F.col("status").isin("added", "changed")).select(
            "doc_id"
        ),
        on="doc_id",
        how="left_semi",
    )
    index = near_dup_index(v1, n_perm=8, bands=4, shingle_n=3)
    out = incremental_near_dup_pairs(
        index,
        batch,
        n_perm=8,
        bands=4,
        shingle_n=3,
        min_jaccard=0.35,
        max_bucket_size=100,
    )
    return out.select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard_r")
    )


def _index_delta_oracle(n_perm: int = 8, bands: int = 4) -> str:
    """Recomputes the near-dup index over v2 FROM SCRATCH and collapses
    it to per-doc checksums (shingle count, mod-sum of shingle hashes,
    band-bucket count, mod-sum of bucket keys). The Spark side builds
    v1's index, applies the recrawl delta, and summarizes identically —
    delta-maintained must equal recomputed, the same group law the BM25
    df and (IVF-)PQ twins obey."""
    rows = n_perm // bands
    mins = ",\n             ".join(
        f"min(('0x' || substr(md5('{p // 2}:' || sh), "
        f"{1 + 15 * (p % 2)}, 15))::BIGINT) AS h{p}"
        for p in range(n_perm)
    )
    band_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, ('0x' || substr(md5('{b}:' || "
        + " || ':' || ".join(f"h{b * rows + r}::VARCHAR" for r in range(rows))
        + "), 1, 15))::BIGINT AS bucket FROM sigs"
        for b in range(bands)
    )
    return f"""
    WITH v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
               AS text
      FROM documents WHERE doc_id >= 50
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             'new crawl doc ' || doc_id::VARCHAR AS text
      FROM documents WHERE doc_id < 30
    ),
    toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM v2
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks WHERE len(t) >= 3
    ),
    sigs AS (
      SELECT doc_id,
             {mins}
      FROM sh GROUP BY doc_id
    ),
    buckets AS (
      {band_selects}
    ),
    sh_sum AS (
      SELECT doc_id, count(*)::BIGINT AS n_shingles,
             sum(('0x' || substr(md5(sh), 1, 15))::BIGINT
                 % 1000000007)::BIGINT AS shingle_sum
      FROM sh GROUP BY doc_id
    ),
    bk_sum AS (
      SELECT doc_id, count(*)::BIGINT AS n_buckets,
             sum(bucket % 1000000007)::BIGINT AS bucket_sum
      FROM buckets GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_shingles, s.shingle_sum,
           b.n_buckets, b.bucket_sum
    FROM sh_sum s JOIN bk_sum b ON b.doc_id = s.doc_id
    """


@register("dedup_index_delta", oracle=_index_delta_oracle())
def dedup_index_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE maintenance of the persisted near-dup LSH index under a
    re-crawl: v1's index minus the removed/changed docs' old rows plus
    freshly-shingled rows for the added/changed batch — and the result
    must equal the index REBUILT from v2, doc by doc (the oracle
    recomputes it from scratch; the Spark side only ever shingles the
    delta). Completes the incremental near-dup story:
    ``dedup_incremental_batch`` answers "which arrivals duplicate the
    corpus", this keeps the index itself current in O(delta).

    Scale shape (operators/dedup.py:apply_near_dup_index_delta): one
    anti-join per persisted relation keyed on doc id (lakehouse MERGE
    shape — id-partitioned index tables rewrite only touched
    partitions); minhash/banding runs over the delta only. Output is a
    per-doc checksum projection (counts + mod-sums of shingle hashes
    and bucket keys), hash-comparable engine-to-engine."""
    from bigdata_capstone_spark.functions.portable import md5_long
    from bigdata_capstone_spark.operators.dedup import (
        apply_near_dup_index_delta,
        near_dup_index,
    )
    from bigdata_capstone_spark.operators.reconcile import snapshot_diff

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    v1 = docs.select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") >= 50)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 30).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(
                    F.lit("new crawl doc "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    diff = snapshot_diff(v1, v2, on=["doc_id"], compare_cols=["text"])
    removed = diff.filter(
        F.col("status").isin("removed", "changed")
    ).select("doc_id")
    batch = v2.join(
        diff.filter(F.col("status").isin("added", "changed")).select(
            "doc_id"
        ),
        on="doc_id",
        how="left_semi",
    )
    index_v1 = near_dup_index(v1, n_perm=8, bands=4, shingle_n=3)
    bk, sh, sz = apply_near_dup_index_delta(
        index_v1, batch, removed, n_perm=8, bands=4, shingle_n=3
    )
    m = 1000000007
    sh_sum = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(md5_long(F.col("sh")) % m).alias("shingle_sum"),
    )
    bk_sum = bk.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.col("bucket") % m).alias("bucket_sum"),
    )
    return sh_sum.join(bk_sum, on="doc_id").select(
        "doc_id", "n_shingles", "shingle_sum", "n_buckets", "bucket_sum"
    )


@register(
    "streaming_bm25_dfreq",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM documents
    )
    SELECT token, count(DISTINCT doc_id)::BIGINT AS dfc
    FROM toks GROUP BY token
    """,
)
def streaming_bm25_dfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the BM25 document-frequency table: the
    streaming twin of ``bm25_incremental_dfreq``. Documents arrive as
    micro-batches; each batch's partial df (docs in THIS batch
    containing the token — one groupBy over the batch's distinct
    per-doc tokens) folds into the snapshot by ADDITION via
    merge_upsert, the same mergeable-counts law as the PSI contingency
    family. The drained table must equal a from-scratch full-corpus
    recompute — the oracle IS bm25_incremental_dfreq's.

    Scale shape: state is vocabulary-sized (never corpus-sized); each
    trigger touches O(batch tokens); no history re-scan. This is how a
    retrieval index's idf stays current under continuous ingest.
    """
    import tempfile

    from bigdata_capstone_spark.operators.textops import tokens_col
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_aggregate_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_dfreq_")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        # a document's rows never split across files, so per-batch
        # distinct (doc, token) pairs are disjoint across batches and
        # the df counts ADD
        .select(
            "doc_id",
            F.explode(F.array_distinct(tokens_col("text"))).alias(
                "token"
            ),
        )
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["token"],
        partial_aggs=[F.count(F.lit(1)).alias("dfc")],
        combines={"dfc": lambda t, u: t + u},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_latest_snapshot_or_empty(
        spark, f"{work}/state", "token STRING, dfc BIGINT"
    )


@register(
    "bm25_delta_dfreq",
    oracle="""
    WITH v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
               AS text
      FROM documents WHERE doc_id >= 50
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             'new crawl doc ' || doc_id::VARCHAR AS text
      FROM documents WHERE doc_id < 30
    ),
    toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM v2
    )
    SELECT token, count(DISTINCT doc_id)::BIGINT AS dfc
    FROM toks GROUP BY token
    """,
)
def bm25_delta_dfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index maintenance under UPDATES and DELETES — the half of
    incremental ingest that append-only merges can't cover: starting
    from the v1 corpus's df table, apply the re-crawl delta (the same
    v2 derivation as ``corpus_recrawl_diff``: head removed, every 7th
    doc revised, 30 arrivals) as df(v1) − df(leaving) + df(arriving),
    with zero-count tokens dropping out. The oracle recomputes df over
    v2 FROM SCRATCH: delta-maintained must equal recomputed exactly —
    the group-under-addition law that makes a BM25 index updatable in
    O(delta) at 100 TB, composed with the diff that finds the delta.

    Scale shape (operators/retrieval.py:apply_dfreq_delta): three
    vocabulary-sized frames union + one re-aggregate on the token key;
    the corpus is scanned only for the delta slices."""
    from bigdata_capstone_spark.operators.retrieval import (
        apply_dfreq_delta,
        dfreq_table,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    # 4 version/shard slices re-read the wide text column;
    # cache so the corpus scans once (same policy as
    # docs_token_budget_fill)
    v1 = docs.select("doc_id", "text")
    changed_new = (
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") % 7 == 0))
        .select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" rev2")).alias("text"),
        )
    )
    arrivals = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.lit("new crawl doc "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    leaving = v1.filter(
        (F.col("doc_id") < 50)
        | ((F.col("doc_id") >= 50) & (F.col("doc_id") % 7 == 0))
    )
    return apply_dfreq_delta(
        dfreq_table(v1),
        dfreq_table(leaving),
        dfreq_table(changed_new.unionByName(arrivals)),
    )


@register(
    "doc_quality_classifier_nb",
    # Single source of truth for the NB-margin chain: shared_sql
    # (also feeds the selection-evaluation oracles below).
    oracle="WITH " + NB_MARGIN_CTES + """
    SELECT doc_id, n_tokens, nb_margin_r, pred_curated, is_curated
    FROM nb_scored
    """,
)
def doc_quality_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based curation (GPT-3/PaLM family), closed-form member:
    multinomial Naive Bayes separating "curated" sources (src0/src1)
    from the rest, scoring every document with its add-1-smoothed
    log-odds margin. Training IS an aggregation — the per-class token
    count table — so train+score is two passes with no solver.

    Scale shape (operators/selection.py): one explode pass (cached, two
    consumers); the model table is vocabulary-bounded and BROADCAST onto
    the token stream; priors/totals are scalar crossJoin broadcasts; the
    margin is a map-side-combinable micro-unit sum."""
    from bigdata_capstone_spark.operators.selection import nb_source_margin

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return nb_source_margin(docs, curated_sources=("src0", "src1"))


@register(
    "docs_dsir_weights",
    # Single source of truth for the DSIR chain: shared_sql (also
    # feeds the selection-evaluation oracles below).
    oracle="WITH " + DSIR_CTES + """
    SELECT doc_id, n_tokens, dsir_logratio_r, selected
    FROM dsir_scored
    """,
)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed-unigram (256
    md5-derived buckets) importance log-ratio of the in-corpus English
    target distribution vs the raw corpus, per document, with the
    fixed-threshold acceptance flag. The model is two 256-row
    distributions — broadcast at any corpus size, incrementally
    mergeable across ingest shards (bucket counts add).

    Scale shape (operators/selection.py): one explode pass; bucketing is
    a pure map (md5 mod); the scoring join is a 256-row broadcast; the
    per-doc weight sum combines map-side."""
    from bigdata_capstone_spark.operators.selection import dsir_log_weights

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dsir_log_weights(docs, target_lang="en", n_buckets=256)


@register(
    "selection_roc_auc",
    oracle="WITH " + NB_MARGIN_CTES + """,
    lv AS (
      SELECT nb_margin_r AS s,
             sum(CASE WHEN is_curated THEN 1 ELSE 0 END) AS pos_at,
             sum(CASE WHEN is_curated THEN 0 ELSE 1 END) AS neg_at
      FROM nb_scored GROUP BY nb_margin_r
    ),
    cum AS (
      SELECT pos_at, neg_at,
             coalesce(sum(neg_at) OVER (
                 ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS neg_below
      FROM lv
    )
    SELECT sum(pos_at)::BIGINT AS n_pos,
           sum(neg_at)::BIGINT AS n_neg,
           round(sum(pos_at * (2 * neg_below + neg_at))
                 / (2.0 * sum(pos_at) * sum(neg_at)), 6) AS auc_r
    FROM cum
    """,
)
def selection_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free quality of the NB curation scorer: rank-sum
    ROC-AUC of the margin against the curated label. The metric the
    classifier-based curation family is actually judged by — at small
    SF every margin is negative (pred_curated uniformly false), yet
    the RANKING can still separate curated from rest, and AUC measures
    exactly that.

    Scale shape (operators/evaluation.py:roc_auc): corpus collapses to
    the distinct-score level table in one map-side-combined groupBy;
    the cumulative negative count is a partitioned_prefix_sum over that
    level table (never a single-task global sort — the oracle's bare
    ORDER BY window is the DuckDB-side luxury this engine refuses);
    the numerator accumulates in exact BIGINT doubled units."""
    from bigdata_capstone_spark.operators.evaluation import roc_auc
    from bigdata_capstone_spark.operators.selection import nb_source_margin

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    nb = nb_source_margin(docs, curated_sources=("src0", "src1"))
    return roc_auc(nb, "nb_margin_r", "is_curated")


@register(
    "selection_roc_auc_by_lang",
    oracle="WITH " + NB_MARGIN_CTES + """,
    lv AS (
      SELECT d.lang, nb_margin_r AS s,
             sum(CASE WHEN is_curated THEN 1 ELSE 0 END) AS pos_at,
             sum(CASE WHEN is_curated THEN 0 ELSE 1 END) AS neg_at
      FROM nb_scored JOIN documents d USING (doc_id)
      GROUP BY d.lang, nb_margin_r
    ),
    cum AS (
      SELECT lang, pos_at, neg_at,
             coalesce(sum(neg_at) OVER (
                 PARTITION BY lang ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS neg_below
      FROM lv
    )
    SELECT lang, sum(pos_at)::BIGINT AS n_pos,
           sum(neg_at)::BIGINT AS n_neg,
           round(CASE WHEN sum(pos_at) > 0 AND sum(neg_at) > 0
                 THEN sum(pos_at * (2 * neg_below + neg_at))
                      / (2.0 * sum(pos_at) * sum(neg_at)) END, 6)
             AS auc_r
    FROM cum GROUP BY lang
    """,
)
def selection_roc_auc_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language ROC-AUC of the NB curation margin: does the scorer
    rank curated-vs-rest equally well in every language slice, or does
    its quality signal only work for the dominant language (the classic
    failure mode of English-trained quality classifiers applied to a
    multilingual corpus)? Degenerate slices yield NULL, not a blow-up.

    Scale shape (operators/evaluation.py:roc_auc_by_group): the naive
    per-group cumulative (window PARTITION BY lang) would put a whole
    language's level table in one task — fatal under language skew.
    Instead: ONE global partitioned_prefix_sum over the (lang, score)
    lexicographic order minus each group's exclusive offset from the
    tiny per-group totals frame; both passes range-partition parallel.
    The oracle's PARTITION BY window is the DuckDB-side luxury."""
    from bigdata_capstone_spark.operators.evaluation import (
        roc_auc_by_group,
    )
    from bigdata_capstone_spark.operators.selection import nb_source_margin

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    nb = nb_source_margin(docs, curated_sources=("src0", "src1"))
    scored = nb.join(docs.select("doc_id", "lang"), "doc_id")
    return roc_auc_by_group(
        scored, "lang", "nb_margin_r", "is_curated"
    )


@register(
    "selection_margin_calibration",
    oracle="WITH " + NB_MARGIN_CTES + """,
    banded AS (
      SELECT least(7, greatest(0,
               floor((nb_margin_r - (-3.0)) / 0.5)::INT)) AS band,
             is_curated, nb_margin_r
      FROM nb_scored
    )
    SELECT band, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN is_curated THEN 1 ELSE 0 END)::BIGINT AS n_pos,
           round(sum(CASE WHEN is_curated THEN 1 ELSE 0 END)
                 / (count(*) * 1.0), 6) AS pos_rate_r,
           round(sum(round(nb_margin_r * 1000000)::BIGINT)
                 / (count(*) * 1.0) / 1000000.0, 6) AS avg_margin_r
    FROM banded GROUP BY band
    """,
)
def selection_margin_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability table of the NB margin: fixed-width margin bands
    (8 bands of 0.5 from -3.0, clamped at the edges) with per-band
    document count, curated count, empirical curated rate, and mean
    margin — the monotonicity of pos_rate_r across bands is what
    'the margin is informative' means operationally, and the table is
    what picks a deployment threshold when the prior-driven zero
    cut-off is miscalibrated (as it is at small SF).

    Scale shape (operators/evaluation.py:margin_calibration): binning
    is a pure map; the whole metric is ONE groupBy with exact-integer
    accumulators (band mean margin in micro-units)."""
    from bigdata_capstone_spark.operators.evaluation import (
        margin_calibration,
    )
    from bigdata_capstone_spark.operators.selection import nb_source_margin

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    nb = nb_source_margin(docs, curated_sources=("src0", "src1"))
    return margin_calibration(
        nb, "nb_margin_r", "is_curated", lo=-3.0, width=0.5, n_bins=8
    )


@register(
    "selection_pr_curve",
    oracle="WITH " + NB_MARGIN_CTES + """,
    thr AS (SELECT unnest([-2.5, -2.0, -1.5, -1.0, -0.5,
                           0.0]::DOUBLE[]) AS thr)
    SELECT thr,
           sum(CASE WHEN is_curated AND nb_margin_r > thr
               THEN 1 ELSE 0 END)::BIGINT AS tp,
           sum(CASE WHEN nb_margin_r > thr THEN 1 ELSE 0 END)::BIGINT
             AS pp,
           sum(CASE WHEN is_curated THEN 1 ELSE 0 END)::BIGINT AS n_pos,
           round(CASE WHEN sum(CASE WHEN nb_margin_r > thr
                                    THEN 1 ELSE 0 END) > 0
                 THEN sum(CASE WHEN is_curated AND nb_margin_r > thr
                          THEN 1 ELSE 0 END)
                      / (sum(CASE WHEN nb_margin_r > thr
                             THEN 1 ELSE 0 END) * 1.0) END, 6)
             AS precision_r,
           round(CASE WHEN sum(CASE WHEN is_curated
                                    THEN 1 ELSE 0 END) > 0
                 THEN sum(CASE WHEN is_curated AND nb_margin_r > thr
                          THEN 1 ELSE 0 END)
                      / (sum(CASE WHEN is_curated
                             THEN 1 ELSE 0 END) * 1.0) END, 6)
             AS recall_r,
           round(CASE WHEN (sum(CASE WHEN nb_margin_r > thr
                                     THEN 1 ELSE 0 END)
                            + sum(CASE WHEN is_curated
                                  THEN 1 ELSE 0 END)) > 0
                 THEN (2 * sum(CASE WHEN is_curated AND nb_margin_r > thr
                               THEN 1 ELSE 0 END))
                      / ((sum(CASE WHEN nb_margin_r > thr
                              THEN 1 ELSE 0 END)
                          + sum(CASE WHEN is_curated
                                THEN 1 ELSE 0 END)) * 1.0) END, 6)
             AS f1_r
    FROM nb_scored CROSS JOIN thr GROUP BY thr
    """,
)
def selection_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 of the NB curation margin at a grid of
    decision thresholds — the operating-point table that complements
    the threshold-free AUC (and shows concretely why the prior-driven
    zero cut-off is useless at small SF: every margin sits below it).
    F1 uses the integer identity 2·TP/(PP+P).

    Scale shape (operators/evaluation.py:pr_threshold_sweep): the
    6-row literal threshold grid crossJoins (broadcast) onto the scored
    frame for ONE shuffle keyed on thr — never a per-threshold pass."""
    from bigdata_capstone_spark.operators.evaluation import (
        pr_threshold_sweep,
    )
    from bigdata_capstone_spark.operators.selection import nb_source_margin

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    nb = nb_source_margin(docs, curated_sources=("src0", "src1"))
    return pr_threshold_sweep(nb, "nb_margin_r", "is_curated")


@register(
    "selection_token_chi2",
    oracle="""
    WITH lab AS (
      SELECT (source IN ('src0', 'src1')) AS lab, text FROM documents
    ),
    pres AS (
      SELECT lab,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'),
               x -> x <> ''))) AS token
      FROM lab
    ),
    counts AS (
      SELECT token,
             sum(CASE WHEN lab THEN 1 ELSE 0 END)::BIGINT AS a,
             sum(CASE WHEN lab THEN 0 ELSE 1 END)::BIGINT AS b
      FROM pres GROUP BY token
    ),
    tot AS (
      SELECT sum(CASE WHEN (source IN ('src0', 'src1'))
                 THEN 1 ELSE 0 END)::BIGINT AS n_lab,
             sum(CASE WHEN (source IN ('src0', 'src1'))
                 THEN 0 ELSE 1 END)::BIGINT AS n_rest
      FROM documents
    ),
    scored AS (
      SELECT token, a, b,
             round(CASE WHEN ((a + b) * 1.0 * ((n_lab - a) + (n_rest - b))
                              * n_lab * n_rest) > 0
                   THEN ((n_lab + n_rest) * 1.0)
                        * ((a * (n_rest - b) - b * (n_lab - a)) * 1.0)
                        * ((a * (n_rest - b) - b * (n_lab - a)) * 1.0)
                        / ((a + b) * 1.0 * ((n_lab - a) + (n_rest - b))
                           * n_lab * n_rest)
                   END, 6) AS chi2_r,
             ((a * (n_rest - b) - b * (n_lab - a)) > 0)
               AS label_enriched
      FROM counts CROSS JOIN tot
    )
    SELECT token, a, b, chi2_r, label_enriched
    FROM scored ORDER BY chi2_r DESC, token LIMIT 20
    """,
)
def selection_token_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by chi-square association between document-level
    token presence and the curated label — WHICH words the NB curation
    split actually hinges on (feature selection / interpretability for
    the classifier family; Yang & Pedersen 1997's chi-square criterion).
    label_enriched marks the direction of the lean.

    Scale shape (operators/evaluation.py:token_label_chi2_topk): one
    explode over per-doc DISTINCT tokens map-side-combines to the
    vocabulary-sized (a, b) table; doc totals broadcast; det = ad-bc
    stays exact BIGINT while the 4-way denominator product runs in
    double (the integer form would overflow past ~55k docs); top-k is
    a TakeOrdered on (chi2_r DESC, token), never a global sort."""
    from bigdata_capstone_spark.operators.evaluation import (
        token_label_chi2_topk,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return token_label_chi2_topk(
        docs, F.col("source").isin("src0", "src1"), k=20
    )


@register(
    "selection_agreement_kappa",
    oracle="WITH " + DSIR_CTES + """,
    j AS (
      SELECT s.selected AS a, (d.lang = 'en') AS b
      FROM dsir_scored s JOIN documents d USING (doc_id)
    ),
    c AS (
      SELECT count(*)::BIGINT AS n,
             sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n_both,
             sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT
               AS n_a_only,
             sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT
               AS n_b_only,
             sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT
               AS n_neither
      FROM j
    )
    SELECT n, n_both, n_a_only, n_b_only, n_neither,
           round(CASE WHEN ((n_both + n_a_only) * (n_both + n_b_only)
                            + (n_b_only + n_neither)
                              * (n_a_only + n_neither))
                           / ((n * 1.0) * (n * 1.0)) < 1.0
                 THEN ((n_both + n_neither) / (n * 1.0)
                       - ((n_both + n_a_only) * (n_both + n_b_only)
                          + (n_b_only + n_neither)
                            * (n_a_only + n_neither))
                         / ((n * 1.0) * (n * 1.0)))
                      / (1.0 - ((n_both + n_a_only) * (n_both + n_b_only)
                                + (n_b_only + n_neither)
                                  * (n_a_only + n_neither))
                               / ((n * 1.0) * (n * 1.0)))
                 END, 6) AS kappa_r
    FROM c
    """,
)
def selection_agreement_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohen's kappa between DSIR's fixed-threshold acceptance and
    membership in its own target slice (lang = 'en'): chance-corrected
    'does importance resampling actually recover the distribution it
    was pointed at?'. Raw agreement would be inflated by the ~56%
    non-English majority both raters reject; kappa subtracts exactly
    that.

    Scale shape (operators/evaluation.py:cohens_kappa): the doc_id
    join, then ONE global aggregate building the 2x2 table in exact
    integers; kappa is a fixed scalar double expression of the four
    counts (bit-identical across engines)."""
    from bigdata_capstone_spark.operators.evaluation import cohens_kappa
    from bigdata_capstone_spark.operators.selection import dsir_log_weights

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    dsir = dsir_log_weights(docs, target_lang="en", n_buckets=256)
    joined = dsir.join(
        docs.select(
            "doc_id", (F.col("lang") == "en").alias("is_target")
        ),
        "doc_id",
    )
    return cohens_kappa(joined, F.col("selected"), F.col("is_target"))


@register(
    "selection_rank_corr_spearman",
    oracle="WITH " + NB_MARGIN_CTES + ",\n" + DSIR_CTES + """,
    j AS (
      SELECT n.nb_margin_r AS a, s.dsir_logratio_r AS b
      FROM nb_scored n JOIN dsir_scored s USING (doc_id)
    ),
    la AS (SELECT a, count(*) AS cnt FROM j GROUP BY a),
    ra AS (
      SELECT a,
             2 * coalesce(sum(cnt) OVER (
                   ORDER BY a
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) + cnt + 1 AS r2a
      FROM la
    ),
    lb AS (SELECT b, count(*) AS cnt FROM j GROUP BY b),
    rb AS (
      SELECT b,
             2 * coalesce(sum(cnt) OVER (
                   ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) + cnt + 1 AS r2b
      FROM lb
    ),
    rk AS (SELECT r2a, r2b FROM j JOIN ra USING (a) JOIN rb USING (b)),
    m AS (
      SELECT count(*)::BIGINT AS n,
             sum(r2a)::BIGINT AS sx, sum(r2b)::BIGINT AS sy,
             sum(r2a * r2b)::BIGINT AS sxy,
             sum(r2a * r2a)::BIGINT AS sxx,
             sum(r2b * r2b)::BIGINT AS syy
      FROM rk
    )
    SELECT n,
           round(CASE WHEN ((n * 1.0) * sxx - (sx * 1.0) * sx) > 0
                       AND ((n * 1.0) * syy - (sy * 1.0) * sy) > 0
                 THEN ((n * 1.0) * sxy - (sx * 1.0) * sy)
                      / sqrt(((n * 1.0) * sxx - (sx * 1.0) * sx)
                             * ((n * 1.0) * syy - (sy * 1.0) * sy))
                 END, 6) AS rho_r
    FROM m
    """,
)
def selection_rank_corr_spearman(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation between the two selection families'
    per-document scores (NB curation margin vs DSIR importance
    log-ratio): do classifier-based curation and importance resampling
    RANK the corpus similarly, or are they complementary signals worth
    ensembling (docs_quality_rank_ensemble)?

    Scale shape (operators/evaluation.py:spearman_rho): average tie
    ranks materialized as exact-integer double-ranks from each score's
    level table + partitioned_prefix_sum (no single-task sort — the
    oracle's bare ORDER BY windows are DuckDB-side only); Pearson on
    the integer ranks with BIGINT moment sums and one final scalar
    double expression."""
    from bigdata_capstone_spark.operators.evaluation import spearman_rho
    from bigdata_capstone_spark.operators.selection import (
        dsir_log_weights,
        nb_source_margin,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    nb = nb_source_margin(docs, curated_sources=("src0", "src1")).select(
        "doc_id", "nb_margin_r"
    )
    dsir = dsir_log_weights(docs, target_lang="en", n_buckets=256).select(
        "doc_id", "dsir_logratio_r"
    )
    return spearman_rho(
        nb.join(dsir, "doc_id"), "nb_margin_r", "dsir_logratio_r"
    )


@register(
    "dedup_repeated_spans",
    oracle=_REPEATED_SPAN_CTES + """
    SELECT doc_id,
           sum(hits_in_span)::BIGINT AS n_hits,
           count(*)::BIGINT AS n_spans,
           sum(e - s + 1)::BIGINT AS covered_tokens,
           round(sum(e - s + 1) / (dl * 1.0), 6) AS covered_frac
    FROM spans GROUP BY doc_id, dl
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup via positional k-gram anchors (Lee et al.):
    any cross-doc repeated substring of >= 8 tokens contains a repeated
    token 8-gram, so hashing every POSITIONAL 8-gram, keeping those seen
    in >= 2 docs, and merging overlapping hit positions into spans finds
    every long verbatim repeat — the coverage signal; the transform that
    removes the spans is ``dedup_excise_spans``.

    Scale shape (operators/dedup.py:repeated_span_stats): digest-only
    cross-doc frequency table (60-bit gram hashes), hash-key hit join,
    span-merge windows PARTITIONED BY doc (bounded by doc length). The
    gram frame is cached once for its two consumers."""
    from bigdata_capstone_spark.operators.dedup import repeated_span_stats

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return repeated_span_stats(docs, k=8, min_docs=2)


@register(
    "dedup_excise_spans",
    oracle=_REPEATED_SPAN_CTES + """,
    sp AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp
           FROM spans GROUP BY doc_id),
    kept AS (
      SELECT t.doc_id, t.t,
             CASE WHEN sp.sp IS NULL THEN t.t
                  ELSE list_filter(t.t, (x, i) ->
                         NOT len(list_filter(sp.sp,
                                z -> z.s <= i AND i <= z.e)) > 0)
             END AS kt
      FROM toks t LEFT JOIN sp USING (doc_id)
    )
    SELECT doc_id,
           len(t)::BIGINT AS n_tokens,
           len(kt)::BIGINT AS kept_tokens,
           (len(t) - len(kt))::BIGINT AS excised_tokens,
           md5(coalesce(array_to_string(kt, ' '), '')) AS clean_hash
    FROM kept
    """,
)
def dedup_excise_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span EXCISION — every document re-emitted with its cross-document
    repeated spans REMOVED (Lee et al. exact-substring dedup's actual
    consumable; ``dedup_repeated_spans`` only reports coverage). The
    cleaned text is value-checked byte-for-byte: the oracle replays the
    span discovery AND the token-level excision in SQL and compares the
    md5 of the emitted text, the ``doc_pii_scrub`` scrubbed-bytes
    pattern. Every input doc appears exactly once — untouched docs pass
    through with excised_tokens = 0, fully-boilerplate docs survive as
    empty text.

    Scale shape (operators/dedup.py:excise_repeated_spans): span
    discovery is the digest-only anchor pipeline; excision is one LEFT
    join against the bounded per-doc span list plus a per-row
    higher-order filter — no position explode, no Python, no extra
    shuffle beyond the span groupBy."""
    from bigdata_capstone_spark.operators.dedup import (
        excise_repeated_spans,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return excise_repeated_spans(docs, k=8, min_docs=2)


def _streaming_psi_oracle() -> str:
    from bigdata_capstone_spark.shared_sql import PSI_EVENTS_ORACLE

    return PSI_EVENTS_ORACLE


@register("streaming_drift_psi", oracle=_streaming_psi_oracle())
def streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI-drift maintenance, value-checked: the per-(type,
    bin) period contingency counts are mergeable state (counts ADD, the
    fifth mergeable family after HLL max / CMS + / Bloom OR / quantile
    bins +), so each micro-batch folds its partial counts into the
    snapshot via merge_upsert and the drained table feeds the exact
    same PSI fold as the batch op — the oracle IS event_drift_psi's.
    Constant |types| x |bins| state however many events stream: this is
    how an ingest monitor keeps between-epoch drift current at
    100 TB/day without re-scanning history."""
    import tempfile

    from bigdata_capstone_spark.operators.drift import (
        fixed_width_bin,
        psi_from_contingency,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_aggregate_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_psi_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        .select(
            "event_type",
            fixed_width_bin(F.col("value"), 50.0, 10).alias("bin"),
            (
                F.col("ts") >= F.to_timestamp(F.lit("2024-01-16"))
            ).alias("p2"),
        )
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["event_type", "bin"],
        partial_aggs=[
            F.sum(F.when(F.col("p2"), 0).otherwise(1)).alias("c1"),
            F.sum(F.when(F.col("p2"), 1).otherwise(0)).alias("c2"),
        ],
        combines={
            "c1": lambda t, u: t + u,
            "c2": lambda t, u: t + u,
        },
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    cont = read_latest_snapshot_or_empty(
        spark,
        f"{work}/state",
        "event_type STRING, bin INT, c1 BIGINT, c2 BIGINT",
    )
    return psi_from_contingency(cont, ["event_type"], 10)


@register(
    "doc_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, sum(c) AS n FROM counts GROUP BY doc_id),
    terms AS (
      SELECT c.doc_id, d.n,
             round(-(c.c * 1.0 / d.n) * log2(c.c * 1.0 / d.n), 6) AS h
      FROM counts c JOIN dl d USING (doc_id)
    )
    SELECT doc_id,
           max(n)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_types,
           round(count(*) * 1.0 / max(n), 6) AS type_token_ratio_r,
           sum(round(h * 1000000)::BIGINT) / 1000000.0 AS entropy_r
    FROM terms GROUP BY doc_id
    """,
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document Shannon entropy of the token distribution (bits)
    plus type-token ratio — the information-theoretic lexical-diversity
    diagnostic completing the text-quality family: repetition measures
    the worst n-gram, quality measures surface ratios, entropy measures
    the whole distribution (template spam and keyword stuffing score
    low; varied prose scores near log2(n_types)).

    Scale shape: one explode pass -> per-(doc, token) counts (map-side
    combined); doc lengths derive from the counts frame (never a second
    corpus scan); the entropy fold joins counts to lengths ON THE DOC
    KEY and aggregates per doc — all JVM expressions. Determinism: each
    term -(p)log2(p) rounds to 6 dp, totals accumulate in integer
    micro-units (the engine's transcendental discipline)."""
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        fan_out(docs)
        .select("doc_id", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    dl = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    terms = counts.join(dl, "doc_id").select(
        "doc_id",
        "n",
        F.round(
            -(F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n")), 6
        ).alias("h"),
    )
    return terms.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.max("n"), 6).alias("type_token_ratio_r"),
        (
            F.sum(F.round(F.col("h") * 1_000_000, 0).cast("long"))
            / F.lit(1_000_000.0)
        ).alias("entropy_r"),
    )


@register(
    "source_lang_composition",
    oracle="""
    WITH cl AS (
      SELECT source, lang, count(*) AS c
      FROM documents GROUP BY source, lang
    ),
    st AS (SELECT source, sum(c) AS n FROM cl GROUP BY source),
    terms AS (
      SELECT cl.source, st.n,
             cl.c,
             round(-(cl.c * 1.0 / st.n) * log2(cl.c * 1.0 / st.n), 6) AS h
      FROM cl JOIN st USING (source)
    )
    SELECT source,
           max(n)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_langs,
           round(max(c) * 1.0 / max(n), 6) AS dominant_share_r,
           sum(round(h * 1000000)::BIGINT) / 1000000.0 AS lang_entropy_r
    FROM terms GROUP BY source
    """,
)
def source_lang_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture health per source: language count, dominant-
    language share, and Shannon entropy of the language distribution —
    the composition dashboard a curation pipeline reads before applying
    the language-rebalance / temperature dials (a source whose entropy
    collapsed between snapshots changed its crawl mix).

    Scale shape: the |sources| x |langs| contingency table is ONE
    map-side-combined groupBy (mergeable across shards — counts add,
    same maintenance story as the PSI table); everything after runs on
    that bounded frame. Same micro-unit entropy discipline as
    doc_token_entropy."""
    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    cl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    st = cl.groupBy("source").agg(F.sum("c").alias("n"))
    terms = cl.join(st, "source").select(
        "source",
        "n",
        "c",
        F.round(
            -(F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n")), 6
        ).alias("h"),
    )
    return terms.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.round(F.max("c") / F.max("n"), 6).alias("dominant_share_r"),
        (
            F.sum(F.round(F.col("h") * 1_000_000, 0).cast("long"))
            / F.lit(1_000_000.0)
        ).alias("lang_entropy_r"),
    )


@register(
    "small_file_compaction_plan",
    oracle="""
    WITH files AS (
      SELECT date_trunc('month', o_orderdate) AS part_key,
             (o_custkey % 8)::INT AS file_id,
             (sum(strlen(o_orderpriority)) + 128 * count(*))::BIGINT
               AS bytes
      FROM orders GROUP BY 1, 2
    ),
    c AS (
      SELECT part_key, file_id, bytes,
             coalesce(sum(bytes) OVER (
               PARTITION BY part_key ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM files
    )
    SELECT part_key, file_id, bytes,
           (cum_before // 8192)::INT AS group_id
    FROM c
    """,
)
def small_file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (the first stage of Delta
    OPTIMIZE / Iceberg rewrite_data_files): a per-partition file
    inventory is packed into deterministic compaction groups of ~8 KiB
    target size by fixed-quota sequential packing — group = exclusive
    cumulative bytes DIV target, all-BIGINT arithmetic, so the oracle
    replays the assignment bit-for-bit. The inventory here is derived
    from orders (month partitions × 8 writer buckets, bytes =
    priority-payload + 128/row overhead) because the planner's input is
    a metadata frame, not table rows — in production it comes from the
    filesystem listing / Delta log, one row per file.

    Scale shape (operators/maintenance.py:compaction_plan): ONE window
    partitioned by the table-partition key, whose width is bounded by
    the writer's task count (the very quantity being repaired); the
    rewrite stage downstream is one task per group. No floats anywhere
    in the decision."""
    from bigdata_capstone_spark.operators.maintenance import (
        compaction_plan,
    )

    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("part_key"),
        (F.col("o_custkey") % 8).cast("int").alias("file_id"),
    ).agg(
        (
            F.sum(F.octet_length("o_orderpriority"))
            + F.lit(128) * F.count(F.lit(1))
        )
        .cast("long")
        .alias("bytes")
    )
    return compaction_plan(files, target_bytes=8192)


# --------------------------------------------------------------------------
# Round-7 eighth wave: hybrid retrieval fusion (RRF) and file key-range
# overlap depth (the when-to-recluster metric beside the compaction plan).
# --------------------------------------------------------------------------

@register(
    "hybrid_retrieval_rrf",
    oracle="WITH " + HYBRID_RRF_CTES + """
    SELECT query_doc, doc_id, lex_rk, dense_rk, rrf_r, fused_rk
    FROM rrf_ranked WHERE fused_rk <= 10
    """,
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 and embedding-cosine top-20 for the
    same 5 query ids, merged by reciprocal-rank fusion (rrf = sum of
    1/(60+rank), Cormack et al. 2009) — the standard lexical x dense
    ensemble production RAG stacks serve. Candidates found by only one
    system report 0 in the other's rank column. The oracle replays BOTH
    retrieval chains (postings/idf/stopword-cut BM25 and the full
    cosine scan) plus the fusion join and re-rank.

    Scale shape: each side is k-bounded per query before the merge, so
    the full-outer join and final top-k touch |Q| x k rows; the
    corpus-sized work is exactly the two underlying retrieval plans
    (operators/retrieval.py + simsearch.py, audited separately)."""
    from bigdata_capstone_spark.operators.retrieval import bm25_topk, rrf_fuse
    from bigdata_capstone_spark.operators.simsearch import brute_force_topk

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, n_queries=5, k=20, stop_df_top=50).select(
        "query_doc", "doc_id", F.col("rk").alias("lex_rk")
    )
    dense = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=20
    ).select(
        F.col("query_id").alias("query_doc"),
        F.col("vec_id").alias("doc_id"),
        F.col("rank").alias("dense_rk"),
    )
    return rrf_fuse(lex, dense, k=10, c=60)


@register(
    "file_overlap_depth",
    oracle="""
    WITH files AS (
      SELECT date_trunc('month', o_orderdate) AS part_key,
             (o_custkey % 8)::INT AS file_id,
             min(o_orderkey) AS min_key,
             max(o_orderkey) AS max_key
      FROM orders GROUP BY 1, 2
    ),
    ev AS (
      SELECT part_key, min_key AS point, 1 AS delta FROM files
      UNION ALL
      SELECT part_key, max_key AS point, -1 AS delta FROM files
    ),
    sweep AS (
      SELECT part_key,
             sum(delta) OVER (PARTITION BY part_key
                              ORDER BY point, delta DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS depth
      FROM ev
    )
    SELECT part_key,
           (count(*) / 2)::BIGINT AS n_files,
           max(depth)::INT AS max_depth
    FROM sweep GROUP BY part_key
    """,
)
def file_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-range overlap depth per table partition — the
    when-to-recluster metric beside `small_file_compaction_plan`'s
    how-to-group: max number of files whose [min_key, max_key] ranges
    cover one key point (Iceberg/Delta read-amplification; depth 1 =
    perfectly clustered, depth = n_files = every point lookup opens
    every file). Inventory derived from orders (month partition x 8
    writer buckets, o_orderkey ranges) — bucketing by customer makes
    the key ranges overlap heavily, exactly the layout an OPTIMIZE
    ZORDER pass repairs.

    Scale shape (operators/maintenance.py:key_overlap_depth): classic
    +1/-1 sweep; ONE window partitioned by the table-partition key over
    2 x files rows (metadata-sized); all-integer arithmetic; ties at a
    point process starts before ends so touching ranges count as
    overlapping."""
    from bigdata_capstone_spark.operators.maintenance import (
        key_overlap_depth,
    )

    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("part_key"),
        (F.col("o_custkey") % 8).cast("int").alias("file_id"),
    ).agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
    return key_overlap_depth(files)


def _lr_ctes(rounds: int = 3, lr: float = 0.5) -> str:
    """The LR training CTE chain (no WITH, no final SELECT), ending in
    ``lr_scored`` (doc_id, n_tokens, lr_margin_r, is_curated) — shared
    by the classifier oracle and the model-comparison oracle so an
    edit cannot desync them."""
    parts = ["""
    feats AS (
      SELECT doc_id, is_curated, n_tokens,
             round(n_tokens / 100.0, 6) AS x1,
             round(n_distinct * 1.0 / n_tokens, 6) AS x2,
             round(n_chars * 1.0 / n_tokens, 6) AS x3
      FROM (
        SELECT doc_id, source IN ('src0', 'src1') AS is_curated,
               len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct,
               list_sum(list_transform(t, x -> length(x))) AS n_chars
        FROM (SELECT doc_id, source,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
              FROM documents)
      ) WHERE n_tokens > 0
    ),
    w0 AS (SELECT 0.0::DOUBLE AS w1, 0.0::DOUBLE AS w2,
                  0.0::DOUBLE AS w3, 0.0::DOUBLE AS w4)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    s{r} AS (
      SELECT f.*,
             round(1.0 / (1.0 + exp(-round(
               f.x1 * w.w1 + f.x2 * w.w2 + f.x3 * w.w3 + w.w4, 6))), 6)
             - (CASE WHEN f.is_curated THEN 1.0 ELSE 0.0 END) AS err
      FROM feats f CROSS JOIN w{r - 1} w
    ),
    g{r} AS (
      SELECT sum((err * x1)::DECIMAL(28,14)) AS g1,
             sum((err * x2)::DECIMAL(28,14)) AS g2,
             sum((err * x3)::DECIMAL(28,14)) AS g3,
             sum(err::DECIMAL(28,14)) AS g4,
             count(*) AS n
      FROM s{r}
    ),
    w{r} AS (
      SELECT round(w.w1 - {lr} * (g.g1::DOUBLE / g.n), 8) AS w1,
             round(w.w2 - {lr} * (g.g2::DOUBLE / g.n), 8) AS w2,
             round(w.w3 - {lr} * (g.g3::DOUBLE / g.n), 8) AS w3,
             round(w.w4 - {lr} * (g.g4::DOUBLE / g.n), 8) AS w4
      FROM w{r - 1} w CROSS JOIN g{r} g
    )""")
    parts.append(f""",
    lr_scored AS (
      SELECT f.doc_id, f.n_tokens,
             round(f.x1 * w.w1 + f.x2 * w.w2 + f.x3 * w.w3 + w.w4, 6)
               AS lr_margin_r,
             round(f.x1 * w.w1 + f.x2 * w.w2 + f.x3 * w.w3 + w.w4, 6) > 0
               AS pred_curated,
             f.is_curated
      FROM feats f CROSS JOIN w{rounds} w
    )""")
    return "".join(parts)


def _lr_oracle(rounds: int = 3, lr: float = 0.5) -> str:
    """Unrolled-GD replay of selection.lr_source_classifier: feature
    extraction, per-round margin/sigmoid (both rounded 6 dp),
    DECIMAL(28,14) gradient accumulation, round(w - lr*grad/n, 8)
    updates, and the final scoring pass."""
    return (
        "WITH "
        + _lr_ctes(rounds, lr)
        + """
    SELECT doc_id, n_tokens, lr_margin_r, pred_curated, is_curated
    FROM lr_scored"""
    )


@register("doc_quality_classifier_lr", oracle=_lr_oracle(3, 0.5))
def doc_quality_classifier_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based curation, TRAINED member: logistic regression
    over cheap document statistics (n_tokens/100, type-token ratio,
    mean token length, bias), fit by 3 full-batch gradient-descent
    iterations entirely inside the engine — the fastText-style quality
    filter beside the closed-form NB. The oracle replays TRAINING
    itself: every margin, every 6-dp sigmoid, every DECIMAL-exact
    gradient sum, every round(w - lr*grad/n, 8) update, then the final
    scoring pass — distributed multi-round optimization value-checked
    end to end.

    Scale shape (operators/selection.py:lr_source_classifier): one
    cached feature pass; per round ONE broadcast of the 1-row weight
    frame and one map-side-combinable 5-aggregate reduction; the
    weights never touch the driver (1-row crossJoins, no collect)."""
    from bigdata_capstone_spark.operators.selection import (
        lr_source_classifier,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return lr_source_classifier(
        docs, curated_sources=("src0", "src1"), rounds=3, learn_rate=0.5
    )


@register(
    "zone_map_pruning_stats",
    oracle="""
    WITH bucket_files AS (
      SELECT 'bucket_custkey' AS layout,
             date_trunc('month', o_orderdate) AS part_key,
             (o_custkey % 8)::INT AS file_id,
             min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders GROUP BY 2, 3
    ),
    range_files AS (
      SELECT 'range_orderkey' AS layout, part_key, file_id,
             min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM (
        SELECT date_trunc('month', o_orderdate) AS part_key,
               ntile(8) OVER (PARTITION BY date_trunc('month', o_orderdate)
                              ORDER BY o_orderkey) AS file_id,
               o_orderkey
        FROM orders
      ) GROUP BY 1, 2, 3
    ),
    files AS (SELECT * FROM bucket_files UNION ALL SELECT * FROM range_files),
    probes AS (
      SELECT o_orderkey AS probe_key FROM orders WHERE o_orderkey % 997 = 0
    ),
    np AS (SELECT count(*) AS n_probes FROM probes),
    per_layout AS (
      SELECT layout, count(*) AS n_files FROM files GROUP BY layout
    ),
    hits AS (
      SELECT f.layout, count(*) AS files_opened
      FROM files f JOIN probes p
        ON p.probe_key >= f.min_key AND p.probe_key <= f.max_key
      GROUP BY f.layout
    )
    SELECT pl.layout, pl.n_files::BIGINT AS n_files,
           np.n_probes::BIGINT AS n_probes,
           coalesce(h.files_opened, 0)::BIGINT AS files_opened,
           round(coalesce(h.files_opened, 0) * 1.0 / np.n_probes, 6)
             AS avg_files_opened_r,
           round(1.0 - coalesce(h.files_opened, 0) * 1.0
                 / (np.n_probes * pl.n_files), 6) AS pruned_frac_r
    FROM per_layout pl
    LEFT JOIN hits h ON h.layout = pl.layout
    CROSS JOIN np
    """,
)
def zone_map_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning effectiveness, measured — the experiment that
    justifies a re-cluster: the SAME orders data laid out two ways
    (customer-bucketed files vs orderkey-range files, 8 per month) and
    probed with the same deterministic point-lookup panel
    (o_orderkey % 997 = 0). A probe must open every file whose
    [min, max] contains it — Parquet row-group stats / Iceberg manifest
    / Delta data-skipping semantics. Orderkeys are uncorrelated with
    order month, so every month still contributes candidates — but the
    range layout opens ~1 file per month partition while the bucket
    layout opens all 8 (measured at sf0.01: 69 vs 535 of 634 files,
    89% vs 16% pruned) — the quantified version of what
    `file_overlap_depth` diagnoses structurally, and the before/after
    measurement an OPTIMIZE ZORDER pass would show.

    Scale shape (operators/maintenance.py:zone_map_probe_stats): the
    probe panel is bounded and broadcast; the file inventory is
    metadata-sized; zero-hit probes still count (left join);
    all-integer until the two reported ratios."""
    from pyspark.sql.window import Window

    from bigdata_capstone_spark.operators.maintenance import (
        zone_map_probe_stats,
    )

    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders").cache()
    month = F.date_trunc("month", "o_orderdate")
    bucket_files = orders.groupBy(
        month.alias("part_key"),
        (F.col("o_custkey") % 8).cast("int").alias("file_id"),
    ).agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    ).select(F.lit("bucket_custkey").alias("layout"), "*")
    w = Window.partitionBy(month).orderBy("o_orderkey")
    range_files = (
        orders.select(
            month.alias("part_key"),
            F.ntile(8).over(w).alias("file_id"),
            "o_orderkey",
        )
        .groupBy("part_key", "file_id")
        .agg(
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .select(F.lit("range_orderkey").alias("layout"), "*")
    )
    probes = orders.filter(F.col("o_orderkey") % 997 == 0).select(
        F.col("o_orderkey").alias("probe_key")
    )
    return zone_map_probe_stats(
        bucket_files.unionByName(range_files), probes
    )


# --------------------------------------------------------------------------
# Unigram-LM tokenizer family (SentencePiece's other family, next to BPE):
# substring-frequency vocabulary + Viterbi segmentation, the DP unrolled
# position-by-position in the oracle.
# --------------------------------------------------------------------------

_UNIGRAM_VOCAB_CTES = """
    toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    words AS (SELECT word, count(*) AS wcnt FROM toks GROUP BY word),
    starts AS (
      -- start positions bounded by the word ITSELF, mirroring the Spark
      -- operator's F.sequence(1, length(word)) (textops.py
      -- unigram_piece_vocab). A fixed literal here silently drops
      -- substrings of words longer than the literal and desyncs every
      -- downstream unigram score (generate_series can't take a lateral
      -- column arg in DuckDB; unnest(range(...)) can).
      SELECT word, wcnt,
             unnest(range(1, length(word)::BIGINT + 1)) AS s
      FROM words
    ),
    subs AS (
      -- the "4" literals are max_piece_len, shared with the Spark
      -- operator's default — change both together
      SELECT substr(st.word, st.s::INT, pl.l::INT) AS piece, st.wcnt
      FROM starts st,
           generate_series(1, 4) AS pl(l)
      WHERE pl.l <= least(4, length(st.word) - st.s + 1)
    ),
    counts AS (SELECT piece, sum(wcnt) AS cnt FROM subs GROUP BY piece),
    vocab0 AS (
      SELECT * FROM counts WHERE length(piece) = 1
      UNION ALL
      SELECT * FROM (
        SELECT * FROM counts WHERE length(piece) >= 2
        ORDER BY cnt DESC, piece LIMIT 50
      )
    ),
    tot AS (SELECT sum(cnt) AS t FROM vocab0),
    vocab AS (
      SELECT piece, cnt::BIGINT AS cnt,
             round(log10(cnt * 1.0 / t) * 1000000)::BIGINT AS score_micro
      FROM vocab0 CROSS JOIN tot
    )"""


def _unigram_dp_oracle(max_word_len: int = 8, max_piece_len: int = 4) -> str:
    """Viterbi unrolled position-by-position: b{j} holds the per-word
    best (score, path, n_pieces) ending at position j, tie-break
    (score DESC, piece length DESC, piece ASC) — the exact rule the
    Spark DP applies each step."""
    # MATERIALIZED: DuckDB inlines CTEs, and the DP references vocab
    # and words up to 4 x max_word_len times — uninlined, the corpus
    # substring pipeline re-ran per reference (52s oracle; 0.3s
    # materialized). Values unchanged — purely the oracle's own plan.
    ctes = _UNIGRAM_VOCAB_CTES.replace(
        "words AS (", "words AS MATERIALIZED (", 1
    ).replace("vocab AS (", "vocab AS MATERIALIZED (", 1)
    parts = [
        "WITH " + ctes + """,
    b0 AS (
      SELECT word, length(word) AS wl, 0::BIGINT AS score,
             '' AS path, 0 AS np
      FROM words
    )"""
    ]
    for j in range(1, max_word_len + 1):
        exts = []
        for plen in range(1, min(max_piece_len, j) + 1):
            i = j - plen
            exts.append(f"""
        SELECT b.word, b.wl, b.score + v.score_micro AS score,
               CASE WHEN b.path = '' THEN v.piece
                    ELSE b.path || ' ' || v.piece END AS path,
               b.np + 1 AS np, length(v.piece) AS plen, v.piece
        FROM b{i} b JOIN vocab v
          ON length(v.piece) = {plen}
         AND substr(b.word, {i + 1}, {plen}) = v.piece
        WHERE b.wl >= {j}""")
        union = "\n        UNION ALL".join(exts)
        parts.append(f""",
    b{j} AS (
      SELECT word, wl, score, path, np FROM (
        SELECT c.*, row_number() OVER (
                 PARTITION BY word
                 ORDER BY score DESC, plen DESC, piece) AS rn
        FROM ({union}
        ) c
      ) WHERE rn = 1
    )""")
    finals = "\n      UNION ALL ".join(
        f"SELECT * FROM b{j} WHERE wl = {j}"
        for j in range(1, max_word_len + 1)
    )
    parts.append(f"""
    SELECT word, path AS pieces, np::INT AS n_pieces,
           score AS score_micro
    FROM ({finals})""")
    return "".join(parts)


@register(
    "unigram_piece_vocab",
    oracle="WITH " + _UNIGRAM_VOCAB_CTES + """
    SELECT piece, cnt, score_micro FROM vocab
    """,
)
def unigram_piece_vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-tokenizer VOCABULARY (SentencePiece's other family, next
    to the BPE artifacts): every single character plus the top-50
    multi-character substrings (length <= 4) by corpus frequency, each
    scored with its micro-unit log10 unigram probability over the
    selected inventory — deterministic (no EM, no RNG), so the oracle
    replays counting, the bounded top-k cut, and every score.

    Scale shape (operators/textops.py:unigram_piece_vocab): the corpus
    collapses to (word, wcnt) first; substring enumeration explodes the
    DISTINCT-WORD frame only; the top-k is a bounded TakeOrdered."""
    from bigdata_capstone_spark.operators.textops import (
        unigram_piece_vocab,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return unigram_piece_vocab(docs, max_piece_len=4, top_k=50)


@register("unigram_viterbi_segments", oracle=_unigram_dp_oracle(8, 4))
def unigram_viterbi_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-likelihood unigram segmentation of every distinct corpus
    word — VITERBI AS AN ITERATIVE DATAFRAME DP, value-checked: the DP
    state at position j is a |words|-row frame, each step unions <= 4
    candidate extensions (broadcast joins of state j-len against the
    vocabulary on substring equality) and keeps the per-word argmax
    under the deterministic tie-break (score DESC, piece length DESC,
    piece ASC). The oracle unrolls the SAME dynamic program position by
    position (b1..b8), so the chosen path, piece count, and micro-unit
    score of every word are hash-compared — a nontrivial algorithm, not
    just an aggregate, replayed stage-for-stage in SQL.

    Scale shape (operators/textops.py:viterbi_segment_words):
    segmentation runs on DISTINCT words (vocabulary-sized, like the BPE
    encode path), so the loop cost is independent of corpus size;
    applying it to a 100 TB corpus is this DP plus one broadcast join
    of the segmentation table onto the token stream."""
    from bigdata_capstone_spark.operators.textops import (
        unigram_piece_vocab,
        viterbi_segment_words,
        word_frequencies,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    vocab = unigram_piece_vocab(docs, max_piece_len=4, top_k=50).cache()
    words = word_frequencies(docs).select("word")
    return viterbi_segment_words(
        words, vocab, max_piece_len=4, max_word_len=8
    )


@register(
    "bm25_prf_expansion",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS token FROM toks)
      GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS dfc
              FROM tf GROUP BY token),
    stop AS MATERIALIZED (
      SELECT token FROM dfreq ORDER BY dfc DESC, token LIMIT 50
    ),
    qdocs AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5),
    qterms AS MATERIALIZED (
      SELECT tf.doc_id AS query_doc, tf.token
      FROM tf JOIN qdocs USING (doc_id)
      WHERE tf.token NOT IN (SELECT token FROM stop)
    ),
    scored AS (
      SELECT q.query_doc, p.doc_id,
             round(ln(1.0 + (s.n_docs - d.dfc + 0.5) / (d.dfc + 0.5))
                   * (p.tf * (1.2 + 1.0))
                   / (p.tf + 1.2 * (0.25 + 0.75 * l.dl
                        / (s.total_len * 1.0 / s.n_docs))), 6) AS s
      FROM tf p
      JOIN qterms q ON p.token = q.token
      JOIN dfreq d ON d.token = p.token
      JOIN dl l ON l.doc_id = p.doc_id
      CROSS JOIN stats s
      WHERE p.doc_id <> q.query_doc
    ),
    pp AS (
      SELECT query_doc, doc_id,
             sum(round(s * 1000000)::BIGINT) / 1000000.0 AS bm25_r
      FROM scored GROUP BY query_doc, doc_id
    ),
    fb AS MATERIALIZED (
      SELECT query_doc, doc_id FROM (
        SELECT pp.*, row_number() OVER (
                 PARTITION BY query_doc ORDER BY bm25_r DESC, doc_id) AS rk
        FROM pp
      ) WHERE rk <= 5
    ),
    allq AS (
      SELECT tf.doc_id AS query_doc, tf.token
      FROM tf JOIN qdocs USING (doc_id)
    ),
    mined AS (
      SELECT f.query_doc, p.token, sum(p.tf)::BIGINT AS fb_tf
      FROM tf p
      JOIN fb f ON f.doc_id = p.doc_id
      WHERE p.token NOT IN (SELECT token FROM stop)
        AND NOT EXISTS (SELECT 1 FROM allq q
                        WHERE q.query_doc = f.query_doc
                          AND q.token = p.token)
      GROUP BY f.query_doc, p.token
    )
    SELECT query_doc, token, fb_tf, expansion_rank FROM (
      SELECT *, (row_number() OVER (PARTITION BY query_doc
                   ORDER BY fb_tf DESC, token))::INT AS expansion_rank
      FROM mined
    ) WHERE expansion_rank <= 5
    """,
)
def bm25_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM1-lite / Rocchio):
    each query's BM25 top-5 acts as the feedback set, and the 5
    strongest NEW terms (summed tf across feedback docs; stopwords and
    the query's own vocabulary excluded) become the expansion — the
    recall lever classical IR stacks pull before a second retrieval
    pass. The oracle replays the whole chain: postings, idf, the
    feedback retrieval, both exclusion sets, the mining aggregate, and
    the ranked cut.

    Note the exclusion asymmetry, deliberately pinned: the ORIGINAL
    query-term exclusion uses the query's FULL vocabulary (including
    its stopwords — an expansion must not resurface a term the query
    already had in any form), while retrieval's qterms drop stopwords
    first.

    Scale shape (operators/retrieval.py:prf_expansion_terms): one
    cached postings pass feeds everything; the feedback set is |Q| x 5
    doc ids broadcast onto postings, so mining touches only those
    documents' rows."""
    from bigdata_capstone_spark.operators.retrieval import (
        prf_expansion_terms,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return prf_expansion_terms(
        docs, n_queries=5, fb_k=5, n_terms=5, stop_df_top=50
    )


def _model_comparison_oracle() -> str:
    def auc(scored: str, score: str, tag: str) -> str:
        return f"""
    lv_{tag} AS (
      SELECT {score} AS s,
             sum(CASE WHEN is_curated THEN 1 ELSE 0 END) AS pos_at,
             sum(CASE WHEN is_curated THEN 0 ELSE 1 END) AS neg_at
      FROM {scored} GROUP BY {score}
    ),
    cum_{tag} AS (
      SELECT pos_at, neg_at,
             coalesce(sum(neg_at) OVER (
                 ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS neg_below
      FROM lv_{tag}
    ),
    auc_{tag} AS (
      SELECT '{tag}' AS model,
             sum(pos_at)::BIGINT AS n_pos,
             sum(neg_at)::BIGINT AS n_neg,
             round(sum(pos_at * (2 * neg_below + neg_at))
                   / (2.0 * sum(pos_at) * sum(neg_at)), 6) AS auc_r
      FROM cum_{tag}
    )"""

    return (
        "WITH "
        + NB_MARGIN_CTES
        + ","
        + _lr_ctes(3, 0.5)
        + ","
        + auc("nb_scored", "nb_margin_r", "nb")
        + ","
        + auc("lr_scored", "lr_margin_r", "lr")
        + """
    SELECT * FROM auc_nb UNION ALL SELECT * FROM auc_lr
    """
    )


@register("selection_model_comparison", oracle=_model_comparison_oracle())
def selection_model_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL SELECTION for the curation filter, as one query: ROC-AUC of
    the closed-form Naive Bayes margin and the GD-trained logistic
    regression side by side on the same labels — the comparison a
    curation team actually runs before picking which scorer gates the
    corpus. The oracle replays BOTH model chains (the NB count tables
    and all three LR training rounds) plus both Hand-&-Till AUC
    computations, so the comparison itself — not just each member — is
    value-checked. On the fixture the verdict is real: NB's token-level
    evidence ranks at AUC ~0.73 while the LR's three dense statistics
    carry no class signal at this SF (~0.38) — which is exactly the
    decision signal this query exists to surface.

    Scale shape: both scorers collapse the corpus map-side (NB to
    vocabulary-sized count tables, LR to a 4-weight state), and each
    AUC works on the distinct-score level table with the offset
    prefix-sum mechanism — nothing corpus-sized crosses an exchange
    twice. The two chains are INDEPENDENT until the final union, and
    each pays eager prefix-sum materializations during construction —
    so they are built from a 2-thread pool (guide §2.6 job overlap:
    Spark schedules concurrent jobs FIFO, the second chain's tasks
    back-fill executors the first chain's barriers leave idle).
    Results are unaffected — each chain is deterministic and they
    share no mutable state."""
    from concurrent.futures import ThreadPoolExecutor

    from bigdata_capstone_spark.operators.evaluation import roc_auc
    from bigdata_capstone_spark.operators.selection import (
        lr_source_classifier,
        nb_source_margin,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    with ThreadPoolExecutor(max_workers=2) as pool:
        fnb = pool.submit(
            lambda: roc_auc(nb_source_margin(docs), "nb_margin_r", "is_curated")
        )
        flr = pool.submit(
            lambda: roc_auc(lr_source_classifier(docs), "lr_margin_r", "is_curated")
        )
        nb = fnb.result().select(F.lit("nb").alias("model"), "*")
        lr = flr.result().select(F.lit("lr").alias("model"), "*")
    return nb.unionByName(lr)


# --------------------------------------------------------------------------
# Round-8: bounded-error mergeable quantile sketch (the sixth mergeable-
# state family — see operators/sketches.py qsketch_* for the design).
# Three entries, ONE oracle: batch build, 4-shard merge, and streaming
# maintenance must all land on identical bits, which is the family's
# whole point.
# --------------------------------------------------------------------------

_QSKETCH_CAPACITY = 512
_QSKETCH_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _qsketch_state_ctes(capacity: int = _QSKETCH_CAPACITY) -> str:
    """The build chain up to the kept state — SHARED by the quantile
    oracle and the CDF oracle, so the two query directions can never
    drift from the same sketch construction."""
    from bigdata_capstone_spark.functions.portable import md5_long_sql
    from bigdata_capstone_spark.operators.sketches import qsketch_lvl_sql

    h = md5_long_sql("'qs:' || event_id::VARCHAR")
    return f"""hashed AS (
      SELECT event_id::VARCHAR AS qs_id, value::DOUBLE AS value,
             {h} AS __h
      FROM events
    ),
    items AS (
      SELECT qs_id, value, {qsketch_lvl_sql()} AS lvl FROM hashed
    ),
    lv AS (SELECT lvl, count(*) AS cnt FROM items GROUP BY 1),
    cum AS (
      SELECT lvl, sum(cnt) OVER (ORDER BY lvl DESC) AS cum FROM lv
    ),
    thr AS (
      SELECT coalesce(max(CASE WHEN cum > {capacity} THEN lvl + 1 END),
                      0)::INT AS thr
      FROM cum
    ),
    state AS (
      SELECT qs_id, value FROM items CROSS JOIN thr WHERE lvl >= thr
    )"""


def _qsketch_oracle(
    capacity: int = _QSKETCH_CAPACITY, qs: tuple[float, ...] = _QSKETCH_QS
) -> str:
    """Full DuckDB replay of build + estimate: PRF levels, the integer-
    minimal threshold, the kept sample, and every order-statistic pick.
    Because the state is a canonical function of the item set, this one
    SQL string is also the oracle for the shard-merge and streaming
    entries — the merge law is driver-gated, not just unit-tested."""
    from bigdata_capstone_spark.operators.sketches import _quantile_label

    picks = ",\n           ".join(
        f"round(min(CASE WHEN rn >= greatest(1, ceil({q} * m)) "
        f"THEN value END), 6) AS p{_quantile_label(q)}_r"
        for q in qs
    )
    return f"""
    WITH {_qsketch_state_ctes(capacity)},
    ranked AS (
      SELECT value, row_number() OVER (ORDER BY value, qs_id) AS rn,
             count(*) OVER () AS m
      FROM state
    )
    SELECT max(m)::BIGINT AS n_kept,
           (SELECT thr FROM thr) AS thr,
           {picks}
    FROM ranked
    """


@register("event_value_quantile_sketch", oracle=_qsketch_oracle())
def event_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of the event value distribution from the LEVEL-SAMPLING
    sketch (operators/sketches.py qsketch_*): a KLL-style compactor
    cascade whose compaction coins are item PRFs, giving a canonical
    <=512-row mergeable state over an UNKNOWN value domain — the
    capability gap the fixed-width bin sketch (event_value_quantiles)
    leaves open, since bins need a width chosen a priori. Every decision
    (levels, the integer-minimal threshold, each rank pick) is integer-
    deterministic, so the oracle replays the whole construction.

    Scale shape: level assignment is a map-side expression; the
    threshold derives from a <=41-row contingency; ranking runs over the
    <=capacity-row state under the constant-scope cache barrier. State
    stays <=512 rows however many values stream through."""
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build,
        qsketch_quantiles,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    state = qsketch_build(
        ev, F.col("event_id"), F.col("value"), _QSKETCH_CAPACITY
    )
    return qsketch_quantiles(state, _QSKETCH_QS)


@register("event_value_quantile_sketch_onepass", oracle=_qsketch_oracle())
def event_value_quantile_sketch_onepass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ONE-SCAN batch build of the quantile sketch (r8 verdict Missing
    #2): levels JVM-side, then an Arrow mapInPandas kernel folds each
    partition into a bounded local state — zero shuffle, one pass —
    and the tested canonical merge law recompacts the partials to the
    IDENTICAL bits as the declarative two-scan build (same oracle as
    `event_value_quantile_sketch`, which stays registered as the
    SQL-expressible twin). At 100 TB the second full scan is the
    difference between a usable ANALYZE pass and not."""
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build_onepass,
        qsketch_quantiles,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    state = qsketch_build_onepass(
        ev, F.col("event_id"), F.col("value"), _QSKETCH_CAPACITY
    )
    return qsketch_quantiles(state, _QSKETCH_QS)


@register("quantile_sketch_shard_merge", oracle=_qsketch_oracle())
def quantile_sketch_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARD-MERGE law for the quantile sketch, driver-gated: four
    disjoint event shards each build their own sketch; the merged
    sketch must equal the one-shot build BIT-FOR-BIT (same oracle as
    `event_value_quantile_sketch`). PRF compaction coins are what make
    this exact — randomized-KLL merges are only error-bounded, not
    replayable. This is how 1000 executors maintain one corpus-wide
    quantile dashboard: per-shard states (<=512 rows each) union and
    recompact, never re-scanning the data. All four shard states come
    out of ONE corpus pass (r10: the keyed one-pass kernel keeps a
    bounded fold state per shard, so the entry costs 1 scan + 1
    materialization where the per-shard builds cost 4 of each — the
    r9 per-shard one-pass form had already cut it from 8 scans); the
    merge over the four genuine per-shard states is unchanged, and the
    merged bits equal the one-shot build by the tested canonical-state
    law."""
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_merge,
        qsketch_partials_onepass_keyed,
        qsketch_quantiles,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    partials = qsketch_partials_onepass_keyed(
        ev,
        F.col("event_id") % 4,
        F.col("event_id"),
        F.col("value"),
        _QSKETCH_CAPACITY,
    ).localCheckpoint(eager=True)
    states = [
        partials.filter(F.col("__shard") == i).drop("__shard")
        for i in range(4)
    ]
    merged = qsketch_merge(states, _QSKETCH_CAPACITY)
    return qsketch_quantiles(merged, _QSKETCH_QS)


@register("streaming_quantile_sketch", oracle=_qsketch_oracle())
def streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING maintenance twin of the quantile sketch (the sixth
    mergeable-state family's stream side, like HLL/CMS/Bloom/bins/PSI
    before it): events stream in 4 micro-batches; each batch builds its
    partial sketch and folds into the snapshot via union + canonical
    recompaction (start_state_fold_maintenance — the generalization of
    keyed-column upsert to states whose merge is a recompaction). The
    drained snapshot is batch-split independent, so the one-pass batch
    oracle value-checks it hash-exactly. O(batch) per trigger, <=512-row
    state forever — the unknown-domain quantile dashboard kept current
    at ingest time."""
    import tempfile

    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build,
        qsketch_merge,
        qsketch_quantiles,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_state_fold_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_qsketch_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
    )
    q = start_state_fold_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        partial_fn=lambda b: qsketch_build(
            b, F.col("event_id"), F.col("value"), _QSKETCH_CAPACITY
        ),
        fold_fn=lambda old, new: qsketch_merge(
            [old, new], _QSKETCH_CAPACITY
        ),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = read_latest_snapshot_or_empty(
        spark,
        f"{work}/state",
        "qs_id STRING, value DOUBLE, lvl INT, thr INT",
    )
    return qsketch_quantiles(state, _QSKETCH_QS)


_JSONL_BAD_LINES = (
    '{"doc_id": 12,',
    "not json at all",
    '{"doc_id": }',
)
_JSONL_MOD = 1_000_000_007


def _jsonl_ingest_oracle() -> str:
    from bigdata_capstone_spark.functions.portable import md5_long_sql

    bad_values = ", ".join(
        "('" + line.replace("'", "''") + "')" for line in _JSONL_BAD_LINES
    )
    good_h = md5_long_sql("doc_id::VARCHAR || ':' || text")
    bad_h = md5_long_sql("line")
    return f"""
    WITH g AS (
      SELECT count(*)::BIGINT AS n_good,
             sum({good_h} % {_JSONL_MOD})::BIGINT AS good_content_mod
      FROM documents
    ),
    b AS (
      SELECT count(*)::BIGINT AS n_quarantined,
             sum({bad_h} % {_JSONL_MOD})::BIGINT AS quarantine_mod
      FROM (VALUES {bad_values}) t(line)
    )
    SELECT n_good, good_content_mod, n_quarantined, quarantine_mod
    FROM g CROSS JOIN b
    """


@register("documents_jsonl_ingest", oracle=_jsonl_ingest_oracle())
def documents_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL INGESTION with a queryable quarantine (sources/tables.py
    read_jsonl) — the arrival format of most LLM corpora, which the
    engine previously only wrote (sinks.write_json), never read. The
    documents table round-trips through JSON lines with three
    deterministic malformed lines injected; the schema'd PERMISSIVE
    read must (a) recover every good row byte-exactly — proven by a
    content hash over (doc_id, text) that the oracle computes from the
    PARQUET side, so any JSON escaping/precision drift breaks the match
    — and (b) land exactly the malformed lines in the quarantine
    column raw, proven by hashing the quarantined strings against the
    fixture literals.

    Scale shape: JSONL splits by line, so even one giant file fans out
    across executors; the explicit schema avoids the eager inference
    scan (a second 100 TB read); the quarantine is a column, not a
    crash, so one bad byte cannot kill an ingest job, and the
    dead-letter count is a frame aggregate any monitor can alert on."""
    import os
    import tempfile

    from bigdata_capstone_spark.functions.portable import md5_long
    from bigdata_capstone_spark.sources.tables import (
        TABLE_SCHEMAS,
        read_jsonl,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="jsonl_ingest_")
    docs.write.mode("overwrite").json(f"{work}/in")
    with open(
        os.path.join(work, "in", "part-zz-malformed.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        fh.write("\n".join(_JSONL_BAD_LINES) + "\n")
    # cache before splitting: Spark disallows a query whose referenced
    # columns are ONLY the corrupt record (the parser would have to
    # re-parse with nothing to parse INTO); materializing the full parse
    # once is also the production shape — parse the landing zone one
    # time, then route good/bad from the materialized frame (at 100 TB,
    # a parquet staging write instead of a cache).
    out = read_jsonl(spark, f"{work}/in", TABLE_SCHEMAS["documents"]).cache()
    good = out.filter(F.col("_corrupt_record").isNull())
    bad = out.filter(F.col("_corrupt_record").isNotNull())
    g = good.agg(
        F.count(F.lit(1)).cast("long").alias("n_good"),
        F.sum(
            md5_long(
                F.concat(F.col("doc_id").cast("string"), F.lit(":"), "text")
            )
            % F.lit(_JSONL_MOD)
        )
        .cast("long")
        .alias("good_content_mod"),
    )
    b = bad.agg(
        F.count(F.lit(1)).cast("long").alias("n_quarantined"),
        F.sum(md5_long(F.col("_corrupt_record")) % F.lit(_JSONL_MOD))
        .cast("long")
        .alias("quarantine_mod"),
    )
    return g.crossJoin(b)


_CSV_BAD_LINES = (
    "notanumber,first malformed line,xx,bad,12",
    "7,second malformed line,en,web,notanumber",
    "notanumber,third malformed line,de,forum,notanumber",
)


def _csv_ingest_oracle() -> str:
    from bigdata_capstone_spark.functions.portable import md5_long_sql

    bad_values = ", ".join(
        "('" + line.replace("'", "''") + "')" for line in _CSV_BAD_LINES
    )
    flat = "replace(replace(text, chr(10), ' '), chr(13), ' ')"
    good_h = md5_long_sql(f"doc_id::VARCHAR || ':' || {flat}")
    bad_h = md5_long_sql("line")
    return f"""
    WITH g AS (
      SELECT count(*)::BIGINT AS n_good,
             sum({good_h} % {_JSONL_MOD})::BIGINT AS good_content_mod
      FROM documents WHERE text IS NOT NULL AND text <> ''
    ),
    b AS (
      SELECT count(*)::BIGINT AS n_quarantined,
             sum({bad_h} % {_JSONL_MOD})::BIGINT AS quarantine_mod
      FROM (VALUES {bad_values}) t(line)
    )
    SELECT n_good, good_content_mod, n_quarantined, quarantine_mod
    FROM g CROSS JOIN b
    """


@register("documents_csv_ingest", oracle=_csv_ingest_oracle())
def documents_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV INGESTION with a queryable quarantine (sources/tables.py
    read_csv_quarantine) — the PERMISSIVE + ``_corrupt_record``
    discipline of `documents_jsonl_ingest` applied to the reference's
    own arrival format (r8 verdict Missing #4). The documents table
    round-trips through line-splittable CSV (embedded newlines
    flattened to spaces before the write, hashed flattened on BOTH
    sides) with three deterministic type-malformed lines injected; the
    schema'd PERMISSIVE read must (a) recover every good row exactly —
    proven by a content hash over (doc_id, flattened text) the oracle
    computes from the PARQUET side, so any CSV quoting/escaping drift
    breaks the match — and (b) land exactly the malformed lines raw in
    the quarantine column. CSV PERMISSIVE quirk pinned by the fixture:
    only UNCASTABLE fields mark a record corrupt (token-count mismatch
    merely pads/drops), so every injected line carries a type failure.

    Scale shape: no multiLine, so one giant CSV still fans out across
    executors by line; the explicit schema avoids the eager inference
    scan; the quarantine is a column, not a crash."""
    import os
    import tempfile

    from bigdata_capstone_spark.functions.portable import md5_long
    from bigdata_capstone_spark.sources.tables import (
        TABLE_SCHEMAS,
        read_csv_quarantine,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    flat = docs.withColumn("text", F.translate("text", "\n\r", "  "))
    work = tempfile.mkdtemp(prefix="csv_ingest_")
    flat.write.mode("overwrite").csv(f"{work}/in")
    with open(
        os.path.join(work, "in", "part-zz-malformed.csv"),
        "w",
        encoding="utf-8",
    ) as fh:
        fh.write("\n".join(_CSV_BAD_LINES) + "\n")
    # same materialize-then-route shape as the JSONL twin (corrupt-
    # column-only queries are disallowed; one parse, then split)
    out = read_csv_quarantine(
        spark, f"{work}/in", TABLE_SCHEMAS["documents"]
    ).cache()
    good = out.filter(F.col("_corrupt_record").isNull())
    bad = out.filter(F.col("_corrupt_record").isNotNull())
    g = good.agg(
        F.count(F.lit(1)).cast("long").alias("n_good"),
        F.sum(
            md5_long(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.coalesce("text", F.lit("")),
                )
            )
            % F.lit(_JSONL_MOD)
        )
        .cast("long")
        .alias("good_content_mod"),
    )
    b = bad.agg(
        F.count(F.lit(1)).cast("long").alias("n_quarantined"),
        F.sum(md5_long(F.col("_corrupt_record")) % F.lit(_JSONL_MOD))
        .cast("long")
        .alias("quarantine_mod"),
    )
    return g.crossJoin(b)


def _qsketch_grouped_oracle(
    capacity: int = 256, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> str:
    from bigdata_capstone_spark.functions.portable import md5_long_sql
    from bigdata_capstone_spark.operators.sketches import (
        _quantile_label,
        qsketch_lvl_sql,
    )

    h = md5_long_sql("'qs:' || event_id::VARCHAR")
    picks = ",\n           ".join(
        f"round(min(CASE WHEN rn >= greatest(1, ceil({q} * m)) "
        f"THEN value END), 6) AS p{_quantile_label(q)}_r"
        for q in qs
    )
    return f"""
    WITH hashed AS (
      SELECT event_type, event_id::VARCHAR AS qs_id, value::DOUBLE AS value,
             {h} AS __h
      FROM events
    ),
    items AS (
      SELECT event_type, qs_id, value, {qsketch_lvl_sql()} AS lvl
      FROM hashed
    ),
    lv AS (
      SELECT event_type, lvl, count(*) AS cnt FROM items GROUP BY 1, 2
    ),
    thr AS (
      SELECT event_type,
             coalesce(max(CASE WHEN cum > {capacity} THEN lvl + 1 END),
                      0)::INT AS thr
      FROM (
        SELECT event_type, lvl,
               sum(cnt) OVER (PARTITION BY event_type
                              ORDER BY lvl DESC) AS cum
        FROM lv
      )
      GROUP BY 1
    ),
    state AS (
      SELECT i.event_type, i.qs_id, i.value, t.thr
      FROM items i JOIN thr t USING (event_type)
      WHERE i.lvl >= t.thr
    ),
    ranked AS (
      SELECT event_type, value, thr,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, qs_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM state
    )
    SELECT event_type, max(m)::BIGINT AS n_kept, max(thr)::INT AS thr,
           {picks}
    FROM ranked GROUP BY event_type
    """


@register(
    "event_type_value_quantile_sketch", oracle=_qsketch_grouped_oracle()
)
def event_type_value_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-GROUP quantile sketches in one pass (operators/sketches.py
    qsketch_grouped_*): every event type gets its own canonical
    <=256-row level-sampling state and its own p50/p90/p99 — the
    production shape of the family (a value-distribution dashboard per
    event type / language / source), where the global entry is the
    single-dial case. The per-group states obey the same exact merge
    law, so shard partials fold groupwise; every window partitions by
    the REAL group column (no constant-scope barrier needed), and the
    oracle replays levels, each group's integer-minimal threshold, and
    every per-group rank pick.

    Scale shape: one scan + one |groups| x 41 contingency; thresholds
    broadcast back; state is |groups| x capacity rows forever."""
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_grouped_build,
        qsketch_grouped_quantiles,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    state = qsketch_grouped_build(
        ev, ["event_type"], F.col("event_id"), F.col("value"), 256
    )
    return qsketch_grouped_quantiles(
        state, ["event_type"], (0.5, 0.9, 0.99)
    )


_PHRASE_SEARCH_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT array_to_string(t[i:i+2], ' ') AS phrase
      FROM (SELECT t, unnest(range(1, len(t)::BIGINT - 1)) AS i
            FROM toks WHERE len(t) >= 3)
    ),
    top2 AS (
      SELECT phrase FROM grams GROUP BY phrase
      ORDER BY count(*) DESC, phrase LIMIT 2
    ),
    terms AS (
      SELECT phrase, len(pts) AS m, u.idx AS term_idx, u.tok AS token
      FROM (SELECT phrase, string_split(phrase, ' ') AS pts FROM top2),
           unnest([struct_pack(idx := i, tok := pts[i])
                   for i in range(1, len(pts) + 1)]) AS s(u)
    ),
    post AS (
      SELECT doc_id, u.tok AS token, u.pos AS pos
      FROM (SELECT doc_id,
                   unnest([struct_pack(pos := i, tok := t[i])
                           for i in range(1, len(t) + 1)]) AS u
            FROM toks)
    ),
    votes AS (
      SELECT tm.phrase, tm.m, p.doc_id,
             p.pos - tm.term_idx + 1 AS anchor, tm.term_idx
      FROM post p JOIN terms tm USING (token)
      WHERE p.pos - tm.term_idx + 1 >= 1
    ),
    anchors AS (
      SELECT phrase, m, doc_id, anchor,
             count(DISTINCT term_idx) AS found
      FROM votes GROUP BY 1, 2, 3, 4
    )
    SELECT phrase, doc_id, count(*)::BIGINT AS n_matches,
           min(anchor)::BIGINT AS first_pos
    FROM anchors WHERE found = m
    GROUP BY phrase, doc_id
    """


@register("doc_phrase_search", oracle=_PHRASE_SEARCH_ORACLE)
def doc_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT PHRASE SEARCH over positional postings (operators/
    retrieval.py:phrase_search) — the quoted-query capability the BM25
    stack lacks, expressed as ONE broadcast join instead of an m-way
    self-join: each posting of a phrase term votes for anchor =
    pos - term_idx + 1, and an anchor holding all m distinct term
    indexes is a match. The query phrases are the corpus's own top-2
    most frequent trigrams (count DESC, phrase ASC), so the entry is
    fixture-literal-free and survives any SF; the oracle replays
    phrase derivation, the vote join, and the anchor test.

    Scale shape: the corpus-sized side is the positional postings
    table, touched once by the broadcast term join; only postings of
    phrase terms survive; the anchor groupBy is bounded by matching
    postings. At 100 TB the postings bucket by doc_id like every other
    index table here."""
    from bigdata_capstone_spark.operators.retrieval import (
        phrase_search,
        positional_postings,
        top_ngram_phrases,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    phrases = top_ngram_phrases(docs, n=3, k=2)
    return phrase_search(positional_postings(docs), phrases)


@register(
    "streaming_grouped_quantile_sketch", oracle=_qsketch_grouped_oracle()
)
def streaming_grouped_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING maintenance of the PER-GROUP quantile sketches — the
    grouped state gets its O(batch) twin like every other persisted
    index here: each micro-batch builds its own per-group partials and
    folds via groupwise union + recompaction
    (sketches.qsketch_grouped_merge through
    start_state_fold_maintenance). The drained snapshot is batch-split
    independent per group, so the one-pass grouped batch oracle
    value-checks it hash-exactly. State stays |groups| x capacity rows
    however long the stream runs — the per-event-type value dashboard
    maintained at ingest time."""
    import tempfile

    from bigdata_capstone_spark.operators.sketches import (
        qsketch_grouped_build,
        qsketch_grouped_merge,
        qsketch_grouped_quantiles,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_state_fold_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_gqsketch_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
    )
    q = start_state_fold_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        partial_fn=lambda b: qsketch_grouped_build(
            b, ["event_type"], F.col("event_id"), F.col("value"), 256
        ),
        fold_fn=lambda old, new: qsketch_grouped_merge(
            [old, new], ["event_type"], 256
        ),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = read_latest_snapshot_or_empty(
        spark,
        f"{work}/state",
        "event_type STRING, qs_id STRING, value DOUBLE, lvl INT, thr INT",
    )
    return qsketch_grouped_quantiles(
        state, ["event_type"], (0.5, 0.9, 0.99)
    )


def _column_stats_oracle() -> str:
    from bigdata_capstone_spark.functions.portable import md5_long_sql
    from bigdata_capstone_spark.operators.sketches import (
        HLL_ALPHA_64,
        HLL_M,
        HLL_M_BITS,
    )

    h = md5_long_sql("canon")
    vb = 60 - HLL_M_BITS
    return f"""
    WITH stacked AS (
      SELECT 'o_orderkey' AS col_name, o_orderkey::VARCHAR AS canon
      FROM orders
      UNION ALL
      SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus FROM orders
      UNION ALL
      SELECT 'o_totalprice', o_totalprice::DECIMAL(18,2)::VARCHAR
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ),
    base AS (
      SELECT col_name, count(*)::BIGINT AS n_rows,
             sum(CASE WHEN canon IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_nulls,
             count(DISTINCT canon)::BIGINT AS exact_ndv
      FROM stacked GROUP BY 1
    ),
    regs AS (
      SELECT col_name, ({h}) % {HLL_M} AS bucket,
             max({vb + 1} - length(bin(({h}) >> {HLL_M_BITS}))) AS rho_max
      FROM stacked WHERE canon IS NOT NULL
      GROUP BY 1, 2
    ),
    hll AS (
      SELECT col_name,
             round({HLL_ALPHA_64} * {HLL_M * HLL_M} /
                   (list_reduce(list(power(2.0, -rho_max) ORDER BY bucket),
                                (a, x) -> a + x)::DOUBLE
                    + ({HLL_M} - count(*))::DOUBLE), 4) AS hll_ndv
      FROM regs GROUP BY col_name
    ),
    minmax AS (
      SELECT 'o_orderkey' AS col_name, min(o_orderkey)::VARCHAR AS min_s,
             max(o_orderkey)::VARCHAR AS max_s FROM orders
      UNION ALL
      SELECT 'o_custkey', min(o_custkey)::VARCHAR,
             max(o_custkey)::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_orderstatus', min(o_orderstatus), max(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', min(o_totalprice::DECIMAL(18,2))::VARCHAR,
             max(o_totalprice::DECIMAL(18,2))::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_orderdate',
             strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
             strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders
      UNION ALL
      SELECT 'o_orderpriority', min(o_orderpriority),
             max(o_orderpriority) FROM orders
    )
    SELECT b.col_name, b.n_rows, b.n_nulls, b.exact_ndv, h.hll_ndv,
           m.min_s, m.max_s
    FROM base b JOIN hll h USING (col_name) JOIN minmax m USING (col_name)
    """


@register("orders_column_stats", oracle=_column_stats_oracle())
def orders_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics over the orders table
    (operators/maintenance.py:column_profile) — the stats collection a
    cost-based optimizer (and a data-quality monitor) runs before
    planning: per column, row/null counts, EXACT distinct count, the
    portable-HLL estimate beside it (estimation error visible, the
    sketch-family convention), and typed min/max. Canonical string
    encodings keep the HLL registers byte-identical across engines
    (doubles through DECIMAL(18,2), timestamps through a pinned
    strftime format — raw double/timestamp rendering differs between
    engines); min/max run on the TYPED columns, so numeric ordering is
    numeric.

    Scale shape: two column-pruned scans — the stacked explode feeding
    null counts/NDV/registers (all map-side combinable, |cols| x 64
    register rows in the shuffle), and one single-row min/max
    aggregate unpivoted from cache. At 100 TB this is exactly the
    ANALYZE TABLE job, and the HLL column is the one you keep when
    exact NDV's distinct shuffle becomes the bottleneck."""
    from bigdata_capstone_spark.operators.maintenance import column_profile

    ensure_utc(spark)
    o = load_table(spark, sf_dir, "orders")
    ts_s = F.date_format(F.col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    encoded = [
        ("o_orderkey", F.col("o_orderkey"), F.col("o_orderkey")),
        ("o_custkey", F.col("o_custkey"), F.col("o_custkey")),
        ("o_orderstatus", F.col("o_orderstatus"), F.col("o_orderstatus")),
        ("o_totalprice", price_dec, price_dec),
        ("o_orderdate", ts_s, ts_s),
        (
            "o_orderpriority",
            F.col("o_orderpriority"),
            F.col("o_orderpriority"),
        ),
    ]
    # exact_ndv_budget=None, pinned (ADVICE r9): the oracle above
    # always computes exact NDV, so the registered entry must too —
    # with the default 1M budget the two would silently diverge at any
    # scale where a column's NDV exceeds it. The budget gate itself is
    # covered by its own tests (test_round9_ops: budget-gated vs
    # ungated profiles).
    return column_profile(o, encoded, exact_ndv_budget=None)


def _stratified_sample_oracle(total_n: int = 100, seed: int = 42) -> str:
    from bigdata_capstone_spark.functions.portable import (
        salted_md5_long_sql,
    )

    h = salted_md5_long_sql("doc_id::VARCHAR", seed)
    return f"""
    WITH sizes AS (SELECT lang, count(*) AS ns FROM documents GROUP BY 1),
    tot AS (SELECT sum(ns) AS n FROM sizes),
    base AS (
      SELECT lang, ns, ({total_n} * ns) % n AS rem,
             ({total_n} * ns) // n AS floor_q
      FROM sizes CROSS JOIN tot
    ),
    seats_left AS (
      SELECT {total_n} - sum(floor_q) AS l FROM base
    ),
    quotas AS (
      SELECT lang,
             (floor_q + CASE WHEN seat_rank <= l THEN 1 ELSE 0 END)
               AS quota
      FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, lang)
                      AS seat_rank
            FROM base)
      CROSS JOIN seats_left
    ),
    picked AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {h}, doc_id) AS pick_rank
      FROM documents
    )
    SELECT p.lang, p.doc_id, q.quota::BIGINT AS quota,
           p.pick_rank::BIGINT AS pick_rank
    FROM picked p JOIN quotas q USING (lang)
    WHERE p.pick_rank <= q.quota
    """


@register(
    "documents_stratified_sample", oracle=_stratified_sample_oracle()
)
def documents_stratified_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic PROPORTIONAL stratified sample (operators/
    sampling.py:stratified_sample): a 100-document panel apportioned
    across languages by the largest-remainder (Hamilton) method —
    floor seats up front, leftovers to the biggest integer remainders
    (tie: lang ASC) — each stratum filled in seeded-PRF order. The
    reproducible eval-panel / annotation-batch constructor: every seat
    decision is integer arithmetic and every pick a hash order, so the
    exact member set replays in any engine, at any partitioning, at
    any SF (an eval panel that drifts when the corpus is re-sharded is
    useless as a benchmark).

    Scale shape (re-planned r9, verdict Wrong #1): stratum sizes are
    one map-side-combined groupBy; all seat arithmetic lives on the
    |strata|-sized frame (its one ranking window runs under the
    constant-scope barrier), then that frame is collected to derive a
    per-stratum HASH CUTOFF ≈ quota/n_s * safety. The pick filters
    ``h < cutoff`` map-side (broadcast join) and exact-ranks ONLY the
    ~quota*safety survivors — the ranking window's largest partition
    is survivor-sized regardless of corpus size, where the old plan
    sorted each stratum's ENTIRE row set in one task (a ~4-value
    stratum key at 100x = single-task sorts of billions of rows). A
    per-stratum survivor count guards the cutoff; the picked set is
    identical for every safety factor."""
    from bigdata_capstone_spark.operators.sampling import (
        stratified_sample,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "doc_id", 100, seed=42)


_CDF_PROBES = (50.0, 100.0, 200.0)


def _qsketch_cdf_oracle(
    capacity: int = _QSKETCH_CAPACITY,
    probes: tuple[float, ...] = _CDF_PROBES,
) -> str:
    """Sketch-CDF estimates beside the exact CDF, over the SHARED state
    CTE chain — the inverse-query direction value-checked against the
    same construction as the quantile direction."""
    # MATERIALIZED: each probe row references state via three scalar
    # subqueries — inlined, DuckDB re-runs the build chain per
    # reference (values unchanged; the unigram/NN-descent precedent)
    ctes = _qsketch_state_ctes(capacity).replace(
        "state AS (", "state AS MATERIALIZED (", 1
    )
    rows = "\n      UNION ALL ".join(
        f"""SELECT {p} AS probe_v,
             (SELECT count(*) FROM state)::BIGINT AS n_kept,
             round((SELECT count(*) FROM state WHERE value <= {p})
                   * 1.0 / (SELECT count(*) FROM state), 6) AS est_cdf_r,
             round((SELECT count(*) FROM events WHERE value <= {p})
                   * 1.0 / (SELECT count(*) FROM events), 6)
               AS exact_cdf_r"""
        for p in probes
    )
    return f"""
    WITH {ctes}
    {rows}
    """


@register("event_value_cdf_sketch", oracle=_qsketch_cdf_oracle())
def event_value_cdf_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INVERSE sketch query — estimated CDF at probe values
    (operators/sketches.py:qsketch_cdf) beside the EXACT CDF from a
    full scan, the sketch-family estimate-vs-exact convention: quantile
    answers "what value sits at rank q", CDF answers "what fraction of
    values sits below v" (the SLO question), and a sketch API needs
    both directions. Same DKW rank-error bound; the oracle composes
    the SHARED state CTE chain, so the two directions can never drift
    from the same construction.

    Scale shape: the estimate is one aggregate over the <=512-row
    state; the exact side is one column-pruned scan computing every
    probe's count map-side — both unpivoted from cached 1-row frames,
    no probe joins."""
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build,
        qsketch_cdf,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    state = qsketch_build(
        ev, F.col("event_id"), F.col("value"), _QSKETCH_CAPACITY
    )
    est = qsketch_cdf(state, list(_CDF_PROBES))
    exact_row = ev.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        *[
            F.sum(F.when(F.col("value") <= F.lit(p), 1).otherwise(0))
            .cast("long")
            .alias(f"__le_{i}")
            for i, p in enumerate(_CDF_PROBES)
        ],
    ).cache()
    exact = None
    for i, p in enumerate(_CDF_PROBES):
        r = exact_row.select(
            F.lit(float(p)).alias("probe_v"),
            F.round(F.col(f"__le_{i}") / F.col("__n"), 6).alias(
                "exact_cdf_r"
            ),
        )
        exact = r if exact is None else exact.unionByName(r)
    return est.join(F.broadcast(exact), on="probe_v").select(
        "probe_v", "n_kept", "est_cdf_r", "exact_cdf_r"
    )


_PROXIMITY_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT array_to_string(t[i:i+1], ' ') AS phrase
      FROM (SELECT t, unnest(range(1, len(t)::BIGINT)) AS i
            FROM toks WHERE len(t) >= 2)
    ),
    top2 AS (
      SELECT phrase FROM grams GROUP BY phrase
      ORDER BY count(*) DESC, phrase LIMIT 2
    ),
    pairs AS (
      SELECT string_split(phrase, ' ')[1] AS t1,
             string_split(phrase, ' ')[2] AS t2
      FROM top2
    ),
    post AS (
      SELECT doc_id, u.tok AS token, u.pos AS pos
      FROM (SELECT doc_id,
                   unnest([struct_pack(pos := i, tok := t[i])
                           for i in range(1, len(t) + 1)]) AS u
            FROM toks)
    ),
    hits AS (
      SELECT pr.t1, pr.t2, l.doc_id, l.pos AS p1, r.pos AS p2
      FROM pairs pr
      JOIN post l ON l.token = pr.t1
      JOIN post r ON r.token = pr.t2 AND r.doc_id = l.doc_id
      WHERE r.pos - l.pos BETWEEN 1 AND 3
    )
    SELECT t1, t2, doc_id, count(*)::BIGINT AS n_matches,
           min(p2 - p1)::BIGINT AS min_gap
    FROM hits GROUP BY t1, t2, doc_id
    """


@register("doc_proximity_search", oracle=_PROXIMITY_ORACLE)
def doc_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED PROXIMITY search (operators/retrieval.py:
    proximity_search) — the slop query between exact phrase and
    bag-of-words: the corpus's top-2 bigrams, split into (t1, t2)
    pairs, matched wherever t2 follows t1 within 3 positions. With
    window=1 this degenerates to the bigram phrase itself; window=3
    also finds the split occurrences ("t1 x t2", "t1 x y t2") a phrase
    query misses — the standard relevance signal for multi-word
    concepts. Query pairs derive from the corpus (no fixture
    literals); the oracle replays derivation, both inverted-index
    filters, and the gap test.

    Scale shape: postings filter by the broadcast term sets FIRST;
    the position pair-join runs per (pair, doc) over survivors only."""
    from bigdata_capstone_spark.operators.retrieval import (
        positional_postings,
        proximity_search,
        top_ngram_phrases,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").cache()
    pairs = top_ngram_phrases(docs, n=2, k=2).select(
        F.split("phrase", " ").getItem(0).alias("t1"),
        F.split("phrase", " ").getItem(1).alias("t2"),
    )
    return proximity_search(positional_postings(docs), pairs, window=3)


# --------------------------------------------------------------------------
# Round-9: Unicode text handling (r8 verdict Missing #1) — NFC
# normalization at the ingest boundary + \p{L}-class tokenization,
# value-checked across engines on a deliberately multilingual fixture.
# --------------------------------------------------------------------------

# Deterministic multilingual fixture literals (module constants so the
# Spark side and the oracle VALUES derive from the SAME bytes). Doc 6 is
# the DECOMPOSED form of doc 5's accents — after NFC the two must
# tokenize identically; doc 3 has no spaces (CJK), which under the old
# ASCII regex exploded into one token per character.
_MULTI_DOCS: tuple[tuple[int, str], ...] = (
    (1, "The quick brown fox jumps over 42 lazy dogs."),
    (2, "Привет, мир! Это тестовый документ номер 7."),
    (3, "你好世界。这是第三个测试文档！"),
    (4, "مرحبا بالعالم هذا نص تجريبي"),
    (5, "Café au lait — déjà vu, naïve résumé."),
    (6, "Café au lait — déjà vu, naïve résumé."),
    (7, "日本語のテキストと English mixed 123."),
    (8, "Ελληνικά και ελληνικό κείμενο εδώ."),
)


def _multilingual_oracle() -> str:
    from bigdata_capstone_spark.operators.textops import (
        NON_LETTER_REGEX as NL,
    )
    from bigdata_capstone_spark.operators.textops import TOKEN_REGEX

    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in _MULTI_DOCS
    )
    return f"""
    WITH raw(doc_id, text) AS (VALUES {vals}),
    norm AS (SELECT doc_id, nfc_normalize(text) AS text FROM raw)
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''))::BIGINT AS ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_REGEX}'))::BIGINT
             AS re_tokens,
           length(regexp_replace(text, '{NL}', '', 'g'))::BIGINT
             AS n_letter_chars,
           md5(text) AS norm_hash
    FROM norm
    ORDER BY doc_id
    """


@register("docs_multilingual_token_stats", oracle=_multilingual_oracle())
def docs_multilingual_token_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UNICODE tokenization + NFC normalization parity (r8 verdict
    Missing #1), value-checked across engines on a multilingual
    fixture: Latin, Cyrillic, CJK (no spaces), Arabic, Greek, and the
    same accented sentence in COMPOSED and DECOMPOSED forms. The
    ``norm_hash`` column proves both engines normalize to identical
    bytes (docs 5 and 6 must hash differently only in doc_id); the
    regex token count proves ``\\p{{L}}``-class letter RUNS — the old
    ASCII classes degenerated every non-Latin script to one token per
    character, silently poisoning BM25, shingle dedup, BPE and quality
    scores on real corpora. NFC is an Arrow pandas UDF (Spark has no
    built-in normalizer — the documented UDF exception); everything
    downstream is JVM built-ins.

    Scale shape: normalization + both token counts are one narrow map
    over the text column — no shuffle, pipelines into the scan."""
    from bigdata_capstone_spark.functions.portable import (  # noqa: F401
        md5_long,
    )
    from bigdata_capstone_spark.operators.textops import (
        NON_LETTER_REGEX,
        TOKEN_REGEX,
        nfc_normalize_col,
        tokens_col,
    )

    ensure_utc(spark)
    raw = spark.createDataFrame(
        list(_MULTI_DOCS), "doc_id INT, text STRING"
    )
    norm = raw.select(
        "doc_id", nfc_normalize_col("text").alias("text")
    )
    return norm.select(
        "doc_id",
        F.size(tokens_col("text")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("re_tokens"),
        F.length(F.regexp_replace("text", NON_LETTER_REGEX, ""))
        .cast("long")
        .alias("n_letter_chars"),
        F.md5(F.encode("text", "UTF-8")).alias("norm_hash"),
    )


# --------------------------------------------------------------------------
# Round-9: WEIGHTED quantile sketch (r8 verdict Missing #5) — the
# token-weighted value-distribution dashboard: documents weighted by
# their whitespace token count, value = n_chars. Two entries, ONE
# oracle (batch build and 4-shard merge must land on identical bits —
# the family's group law, now with weights riding along).
# --------------------------------------------------------------------------

_WQS_CAPACITY = 512
_WQS_QS = (0.5, 0.9, 0.99)
_WQS_W_SQL = (
    "len(list_filter(string_split_regex(lower(text), '\\s+'),"
    " x -> x <> ''))::BIGINT"
)


def _wqsketch_oracle(
    capacity: int = _WQS_CAPACITY, qs: tuple[float, ...] = _WQS_QS
) -> str:
    from bigdata_capstone_spark.functions.portable import md5_long_sql
    from bigdata_capstone_spark.operators.sketches import (
        _quantile_label,
        wqsketch_wlvl_sql,
    )

    h = md5_long_sql("'wqs:' || doc_id::VARCHAR")
    picks = ",\n           ".join(
        f"round(min(CASE WHEN cum_w::DOUBLE >= {q} * tot_w::DOUBLE "
        f"THEN value END), 6) AS p{_quantile_label(q)}_r"
        for q in qs
    )
    return f"""
    WITH hashed AS (
      SELECT doc_id::VARCHAR AS qs_id, n_chars::DOUBLE AS value,
             {_WQS_W_SQL} AS w, {h} AS __h
      FROM documents
    ),
    items AS (
      SELECT qs_id, value, w, {wqsketch_wlvl_sql("w")} AS lvl
      FROM hashed WHERE w > 0
    ),
    lv AS (SELECT lvl, count(*) AS cnt FROM items GROUP BY 1),
    cum AS (
      SELECT lvl, sum(cnt) OVER (ORDER BY lvl DESC) AS cum FROM lv
    ),
    thr AS (
      SELECT coalesce(max(CASE WHEN cum > {capacity} THEN lvl + 1 END),
                      0)::INT AS thr
      FROM cum
    ),
    state AS (
      SELECT qs_id, value, w, thr FROM items CROSS JOIN thr
      WHERE lvl >= thr
    ),
    ranked AS (
      SELECT value,
             sum(greatest(w, (1::BIGINT << thr)))
               OVER (ORDER BY value, qs_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               ::BIGINT AS cum_w,
             sum(greatest(w, (1::BIGINT << thr))) OVER ()::BIGINT AS tot_w,
             count(*) OVER () AS m
      FROM state
    )
    SELECT max(m)::BIGINT AS n_kept,
           (SELECT thr FROM thr) AS thr,
           max(tot_w)::BIGINT AS est_total_w,
           {picks}
    FROM ranked
    """


@register("docs_weighted_quantile_sketch", oracle=_wqsketch_oracle())
def docs_weighted_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOKEN-WEIGHTED quantiles of document length from the weighted
    level-sampling sketch (operators/sketches.py wqsketch_*; r8 verdict
    Missing #5): each document's PRF draw survives threshold t with
    probability min(1, tokens/2^t) — pure integer shifts — and kept
    docs carry the Horvitz-Thompson weight max(w, 2^thr), so the
    estimated quantiles answer "the median CHARACTER LENGTH weighted by
    tokens", not per-document medians (a 10-token and a 10k-token doc
    no longer count equally). Threshold rule, canonical state, and
    merge law are the unweighted family's, so the oracle replays the
    entire construction bit-for-bit.

    Scale shape: weighted level = map-side integer expression; the
    threshold derives from a <=41-row contingency; ranking runs over
    the <=capacity-row state under the constant-scope barrier."""
    from bigdata_capstone_spark.operators.sketches import (
        wqsketch_build,
        wqsketch_quantiles,
    )
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(tokens_col("text")).cast("long").alias("__w"),
    )
    state = wqsketch_build(
        docs, F.col("doc_id"), F.col("n_chars"), F.col("__w"),
        _WQS_CAPACITY,
    )
    return wqsketch_quantiles(state, _WQS_QS)


@register("weighted_quantile_sketch_shard_merge", oracle=_wqsketch_oracle())
def weighted_quantile_sketch_shard_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SHARD-MERGE law for the WEIGHTED quantile sketch, driver-gated:
    four disjoint document shards each build a weighted sketch; the
    merged sketch must equal the one-shot build BIT-FOR-BIT (same
    oracle as `docs_weighted_quantile_sketch`) — the weighted level is
    still a per-item PRF, so the canonical-state group law carries
    over with weights riding along. All four shard states come out of
    ONE corpus pass (r10: keyed one-pass kernel — 1 scan + 1
    materialization instead of 4 of each; see
    quantile_sketch_shard_merge)."""
    from bigdata_capstone_spark.operators.sketches import (
        wqsketch_merge,
        wqsketch_partials_onepass_keyed,
        wqsketch_quantiles,
    )
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(tokens_col("text")).cast("long").alias("__w"),
    )
    partials = wqsketch_partials_onepass_keyed(
        docs,
        F.col("doc_id") % 4,
        F.col("doc_id"),
        F.col("n_chars"),
        F.col("__w"),
        _WQS_CAPACITY,
    ).localCheckpoint(eager=True)
    states = [
        partials.filter(F.col("__shard") == i).drop("__shard")
        for i in range(4)
    ]
    merged = wqsketch_merge(states, _WQS_CAPACITY)
    return wqsketch_quantiles(merged, _WQS_QS)


def _multi_values_sql() -> str:
    """The multilingual fixture as a DuckDB VALUES list — shared by
    every multilingual entry so Spark and the oracle derive from the
    SAME bytes."""
    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in _MULTI_DOCS
    )
    return (
        f"raw(doc_id, text) AS (VALUES {vals}),\n"
        "    norm AS (SELECT doc_id, nfc_normalize(text) AS text FROM raw)"
    )


def _multi_docs_norm(spark: SparkSession) -> DataFrame:
    from bigdata_capstone_spark.operators.textops import nfc_normalize_col

    raw = spark.createDataFrame(
        list(_MULTI_DOCS), "doc_id INT, text STRING"
    )
    return raw.select("doc_id", nfc_normalize_col("text").alias("text"))


@register(
    "multilingual_shingle_dedup",
    oracle=f"""
    WITH {_multi_values_sql()},
    toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM norm
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS idA, b.doc_id AS idB,
             max(sa.n) AS nA, max(sb.n) AS nB, count(*) AS common
      FROM sh a
      JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      JOIN sizes sa ON sa.doc_id = a.doc_id
      JOIN sizes sb ON sb.doc_id = b.doc_id
      GROUP BY 1, 2
    )
    SELECT idA, idB,
           round(common * 1.0 / (nA + nB - common), 6) AS jaccard_r
    FROM common
    WHERE common * 1.0 / (nA + nB - common) >= 0.2
    """,
)
def multilingual_shingle_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHINGLE DEDUP on NON-LATIN text (r8 verdict Missing #1 'Done'
    criterion): exact word-3-gram Jaccard pairs over the NFC-normalized
    multilingual fixture. The composed and decomposed forms of the same
    accented sentence (docs 5 and 6) MUST dedup at jaccard 1.0 — without
    the NFC ingest boundary their shingle sets are byte-disjoint and
    every dedup family silently misses the pair. Oracle replays
    normalization, Unicode-lowercase tokenization, shingling, and the
    Jaccard threshold."""
    from bigdata_capstone_spark.operators.dedup import ngram_jaccard_pairs

    ensure_utc(spark)
    out = ngram_jaccard_pairs(
        _multi_docs_norm(spark), shingle_n=3, min_jaccard=0.2
    )
    return out.select(
        "idA", "idB", F.round("jaccard", 6).alias("jaccard_r")
    )


@register(
    "multilingual_bm25_topk",
    oracle=f"""
    WITH {_multi_values_sql()},
    toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM norm
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS token FROM toks)
      GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS dfc
              FROM tf GROUP BY token),
    stop AS (SELECT token FROM dfreq ORDER BY dfc DESC, token LIMIT 3),
    qdocs AS (SELECT doc_id FROM norm ORDER BY doc_id LIMIT 6),
    qterms AS (
      SELECT tf.doc_id AS query_doc, tf.token
      FROM tf JOIN qdocs USING (doc_id)
      WHERE tf.token NOT IN (SELECT token FROM stop)
    ),
    scored AS (
      SELECT q.query_doc, p.doc_id,
             round(ln(1.0 + (s.n_docs - d.dfc + 0.5) / (d.dfc + 0.5))
                   * (p.tf * (1.2 + 1.0))
                   / (p.tf + 1.2 * (0.25 + 0.75 * l.dl
                        / (s.total_len * 1.0 / s.n_docs))), 6) AS s
      FROM tf p
      JOIN qterms q ON p.token = q.token
      JOIN dfreq d ON d.token = p.token
      JOIN dl l ON l.doc_id = p.doc_id
      CROSS JOIN stats s
      WHERE p.doc_id <> q.query_doc
    ),
    pp AS (
      SELECT query_doc, doc_id, count(*)::BIGINT AS n_terms,
             sum(round(s * 1000000)::BIGINT) / 1000000.0 AS bm25_r
      FROM scored GROUP BY query_doc, doc_id
    )
    SELECT query_doc, doc_id, n_terms, bm25_r, rk FROM (
      SELECT pp.*, row_number() OVER (
               PARTITION BY query_doc ORDER BY bm25_r DESC, doc_id) AS rk
      FROM pp
    ) WHERE rk <= 3
    """,
)
def multilingual_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 on NON-LATIN text (r8 verdict Missing #1 'Done' criterion):
    lexical retrieval over the NFC-normalized multilingual fixture —
    the 6 lowest doc_ids as queries, top-3 each. The decomposed doc 6
    must retrieve its composed twin doc 5 as the TOP hit with maximal
    term overlap (every term matches after normalization) — without
    NFC their postings never join. Cyrillic/Greek/CJK terms flow
    through the same postings machinery; both engines lowercase and
    split identically on the normalized bytes."""
    from bigdata_capstone_spark.operators.retrieval import bm25_topk

    ensure_utc(spark)
    out = bm25_topk(
        _multi_docs_norm(spark), n_queries=6, k=3, stop_df_top=3
    )
    return out.withColumn("rk", F.col("rk").cast("int"))


@register(
    "streaming_weighted_quantile_sketch", oracle=_wqsketch_oracle()
)
def streaming_weighted_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING maintenance of the WEIGHTED quantile sketch: documents
    arrive in 4 micro-batches; each batch builds its bounded weighted
    partial and the fold recompacts under the tested group law — the
    drained snapshot must match the one-shot batch build BIT-FOR-BIT
    (same oracle as `docs_weighted_quantile_sketch`), completing the
    weighted family's batch / shard-merge / streaming triangle. State
    stays <=capacity rows however many documents stream through."""
    import tempfile

    from bigdata_capstone_spark.operators.sketches import (
        wqsketch_build,
        wqsketch_merge,
        wqsketch_quantiles,
    )
    from bigdata_capstone_spark.operators.textops import tokens_col
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_state_fold_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_wqsketch_")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
    )

    def weighted(b):
        return b.select(
            "doc_id",
            "n_chars",
            F.size(tokens_col("text")).cast("long").alias("__w"),
        )

    q = start_state_fold_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        partial_fn=lambda b: wqsketch_build(
            weighted(b), F.col("doc_id"), F.col("n_chars"),
            F.col("__w"), _WQS_CAPACITY,
        ),
        fold_fn=lambda old, new: wqsketch_merge(
            [old, new], _WQS_CAPACITY
        ),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = read_latest_snapshot_or_empty(
        spark,
        f"{work}/state",
        "qs_id STRING, value DOUBLE, w BIGINT, lvl INT, thr INT",
    )
    return wqsketch_quantiles(state, _WQS_QS)


def _script_profile_oracle() -> str:
    from bigdata_capstone_spark.operators.textops import script_profile_sql

    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in _MULTI_DOCS
    )
    body = script_profile_sql("raw")
    return f"WITH raw(doc_id, text) AS (VALUES {vals}),\n" + body.split(
        "WITH ", 1
    )[1]


@register("multilingual_script_profile", oracle=_script_profile_oracle())
def multilingual_script_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unicode SCRIPT routing profile (operators/textops.py:
    script_profile): per-document character counts for six script
    classes plus the dominant script — the signal a multilingual
    pipeline routes on BEFORE any per-language model (the stopword
    langid only separates Latin languages; Cyrillic/Han/Arabic/Greek
    need script routing first). Java regex spells script classes
    \\p{IsXxx}, RE2 spells \\p{Xxx} — same Unicode Script property, so
    the oracle replays every count and the struct-sort dominant pick.

    Scale shape: six regexp strips + one 6-element array sort, all
    map-side — pipelines into the scan."""
    from bigdata_capstone_spark.operators.textops import script_profile

    ensure_utc(spark)
    raw = spark.createDataFrame(
        list(_MULTI_DOCS), "doc_id INT, text STRING"
    )
    return script_profile(raw)


@register(
    "docs_weighted_quantile_sketch_onepass", oracle=_wqsketch_oracle()
)
def docs_weighted_quantile_sketch_onepass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ONE-SCAN build of the WEIGHTED quantile sketch: the r9 kernel
    recipe applied to the weighted family — weighted levels JVM-side,
    per-partition Arrow fold, canonical merge; bit-identical to the
    declarative build (same oracle as `docs_weighted_quantile_sketch`).
    """
    from bigdata_capstone_spark.operators.sketches import (
        wqsketch_build_onepass,
        wqsketch_quantiles,
    )
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(tokens_col("text")).cast("long").alias("__w"),
    )
    state = wqsketch_build_onepass(
        docs, F.col("doc_id"), F.col("n_chars"), F.col("__w"),
        _WQS_CAPACITY,
    )
    return wqsketch_quantiles(state, _WQS_QS)


@register(
    "streaming_stratified_panel", oracle=_stratified_sample_oracle()
)
def streaming_stratified_panel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING maintenance of the stratified eval panel
    (operators/sampling.py stratified_panel_*; the seventh
    mergeable-state family): Hamilton quotas need GLOBAL stratum sizes
    a stream only knows at read time, but any quota is <= total_n — so
    the state keeps per-stratum exact sizes plus the total_n
    smallest-hash rows per stratum, both mergeable, and the pick
    replays the batch arithmetic over the drained snapshot. Documents
    arrive in 4 micro-batches; the result must equal the BATCH
    `documents_stratified_sample` bit-for-bit (same oracle) — the
    eval panel stays frozen-by-construction while the corpus streams
    in. State is |strata| * (total_n + 1) rows however many documents
    arrive."""
    import tempfile

    from bigdata_capstone_spark.operators.sampling import (
        stratified_panel_merge,
        stratified_panel_pick,
        stratified_panel_state,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot_or_empty,
        start_state_fold_maintenance,
    )

    ensure_utc(spark)
    work = tempfile.mkdtemp(prefix="stream_panel_")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
    )
    q = start_state_fold_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        partial_fn=lambda b: stratified_panel_state(
            b, "lang", "doc_id", 100, seed=42
        ),
        fold_fn=lambda old, new: stratified_panel_merge(
            [old, new], 100
        ),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = read_latest_snapshot_or_empty(
        spark,
        f"{work}/state",
        "stratum STRING, key STRING, __h BIGINT, ns BIGINT",
    )
    return stratified_panel_pick(state, 100).select(
        F.col("stratum").alias("lang"),
        F.col("key").cast("long").alias("doc_id"),
        "quota",
        "pick_rank",
    )


def _qsketch_oracle_for(
    table: str,
    key_expr: str,
    value_expr: str,
    capacity: int,
    qs: tuple[float, ...],
) -> str:
    """Parametric twin of `_qsketch_oracle` for an arbitrary
    (table, key, value) — the sketch chain is column-generic; the
    events-specific oracle predates this and stays for the pinned
    entries."""
    from bigdata_capstone_spark.functions.portable import md5_long_sql
    from bigdata_capstone_spark.operators.sketches import (
        _quantile_label,
        qsketch_lvl_sql,
    )

    h = md5_long_sql(f"'qs:' || {key_expr}")
    picks = ",\n           ".join(
        f"round(min(CASE WHEN rn >= greatest(1, ceil({q} * m)) "
        f"THEN value END), 6) AS p{_quantile_label(q)}_r"
        for q in qs
    )
    return f"""
    WITH hashed AS (
      SELECT {key_expr} AS qs_id, {value_expr} AS value, {h} AS __h
      FROM {table}
    ),
    items AS (
      SELECT qs_id, value, {qsketch_lvl_sql()} AS lvl FROM hashed
    ),
    lv AS (SELECT lvl, count(*) AS cnt FROM items GROUP BY 1),
    cum AS (
      SELECT lvl, sum(cnt) OVER (ORDER BY lvl DESC) AS cum FROM lv
    ),
    thr AS (
      SELECT coalesce(max(CASE WHEN cum > {capacity} THEN lvl + 1 END),
                      0)::INT AS thr
      FROM cum
    ),
    state AS (
      SELECT qs_id, value FROM items CROSS JOIN thr WHERE lvl >= thr
    ),
    ranked AS (
      SELECT value, row_number() OVER (ORDER BY value, qs_id) AS rn,
             count(*) OVER () AS m
      FROM state
    )
    SELECT max(m)::BIGINT AS n_kept,
           (SELECT thr FROM thr) AS thr,
           {picks}
    FROM ranked
    """


_HIST_QS = (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)


@register(
    "orders_price_histogram",
    oracle=_qsketch_oracle_for(
        "orders", "o_orderkey::VARCHAR", "o_totalprice::DOUBLE",
        512, _HIST_QS,
    ),
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-HEIGHT HISTOGRAM boundaries for the ANALYZE family
    (companion to `orders_column_stats`): the classic CBO statistics
    trio is null/NDV counts + min/max + a histogram, and the third leg
    lands here — 8 equal-frequency buckets of o_totalprice, boundaries
    = the quantile sketch's order statistics at eighths, built with the
    one-scan kernel. Every boundary replays in the oracle (PRF levels,
    integer-minimal threshold, rank picks), so the histogram an
    optimizer would consume is value-checked, not approximated.

    Scale shape: one scan, zero shuffle (the one-pass kernel);
    boundary picks run over the <=512-row state."""
    from bigdata_capstone_spark.operators.sketches import (
        qsketch_build_onepass,
        qsketch_quantiles,
    )

    ensure_utc(spark)
    o = load_table(spark, sf_dir, "orders")
    state = qsketch_build_onepass(
        o, F.col("o_orderkey"), F.col("o_totalprice"), 512
    )
    return qsketch_quantiles(state, _HIST_QS)


def _incr_clusters_oracle(
    n_perm: int = 8,
    bands: int = 4,
    old_thr: float = 0.5,
    new_thr: float = 0.35,
    cap: int = 100,
) -> str:
    """Full replay of the incremental cluster maintenance: old-corpus
    LSH pairs (cap on old buckets, old_thr), batch↔corpus pairs
    (corpus-side cap, new_thr), within-batch pairs (no cap, new_thr),
    then ONE recursive closure over the union — which the contracted
    incremental path must equal exactly."""
    rows = n_perm // bands
    mins = ",\n             ".join(
        f"min(('0x' || substr(md5('{p // 2}:' || sh), "
        f"{1 + 15 * (p % 2)}, 15))::BIGINT) AS h{p}"
        for p in range(n_perm)
    )

    def band_selects(src: str) -> str:
        return "\n      UNION ALL ".join(
            "SELECT doc_id, ('0x' || substr(md5('"
            + str(b)
            + ":' || "
            + " || ':' || ".join(
                f"h{b * rows + r}::VARCHAR" for r in range(rows)
            )
            + "), 1, 15))::BIGINT AS bucket FROM " + src
            for b in range(bands)
        )

    def sh_cte(src: str) -> str:
        return f"""(
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   for i in range(1, len(t) - 1)])) AS sh
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS t
            FROM {src})
      WHERE len(t) >= 3
    )"""

    def verify(cands: str, sh_a: str, sz_a: str, sh_b: str, sz_b: str,
               ca: str, cb: str, thr: float) -> str:
        return f"""(
      SELECT {ca}, {cb},
             count(*) * 1.0 / (max(sa.n) + max(sb.n) - count(*)) AS j
      FROM {cands} c
      JOIN {sh_a} a ON a.doc_id = c.{ca}
      JOIN {sh_b} b ON b.doc_id = c.{cb} AND b.sh = a.sh
      JOIN {sz_a} sa ON sa.doc_id = c.{ca}
      JOIN {sz_b} sb ON sb.doc_id = c.{cb}
      GROUP BY 1, 2
      HAVING count(*) * 1.0 / (max(sa.n) + max(sb.n) - count(*))
             >= {thr}
    )"""

    return f"""
    WITH RECURSIVE batch AS (
      SELECT doc_id + 100000 AS doc_id, text
      FROM documents WHERE doc_id % 11 = 3
      UNION ALL
      SELECT d1.doc_id + 200000 AS doc_id,
             d1.text || ' ' || d2.text AS text
      FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      WHERE d1.doc_id % 17 = 5
    ),
    c_sh AS MATERIALIZED {sh_cte("documents")},
    b_sh AS MATERIALIZED {sh_cte("batch")},
    c_sizes AS (SELECT doc_id, count(*) AS n FROM c_sh GROUP BY doc_id),
    b_sizes AS (SELECT doc_id, count(*) AS n FROM b_sh GROUP BY doc_id),
    c_sigs AS (
      SELECT doc_id,
             {mins}
      FROM c_sh GROUP BY doc_id
    ),
    b_sigs AS (
      SELECT doc_id,
             {mins}
      FROM b_sh GROUP BY doc_id
    ),
    c_raw_buckets AS MATERIALIZED (
      {band_selects("c_sigs")}
    ),
    c_bucket_sizes AS (
      SELECT bucket, count(*) AS bn FROM c_raw_buckets GROUP BY bucket
    ),
    c_buckets AS MATERIALIZED (
      SELECT rb.doc_id, rb.bucket
      FROM c_raw_buckets rb
      JOIN c_bucket_sizes bs ON bs.bucket = rb.bucket
      WHERE bs.bn <= {cap}
    ),
    b_buckets AS MATERIALIZED (
      {band_selects("b_sigs")}
    ),
    o_cands AS (
      SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
      FROM c_buckets a JOIN c_buckets b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    o_pairs AS {verify("o_cands", "c_sh", "c_sizes", "c_sh", "c_sizes",
                       "idA", "idB", old_thr)},
    x_cands AS (
      SELECT DISTINCT b.doc_id AS idA, c.doc_id AS idB
      FROM b_buckets b JOIN c_buckets c ON b.bucket = c.bucket
    ),
    x_pairs AS {verify("x_cands", "b_sh", "b_sizes", "c_sh", "c_sizes",
                       "idA", "idB", new_thr)},
    i_cands AS (
      SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
      FROM b_buckets a JOIN b_buckets b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    i_pairs AS {verify("i_cands", "b_sh", "b_sizes", "b_sh", "b_sizes",
                       "idA", "idB", new_thr)},
    edges(src, dst) AS MATERIALIZED (
      SELECT idA, idB FROM o_pairs UNION SELECT idB, idA FROM o_pairs
      UNION SELECT idA, idB FROM x_pairs UNION SELECT idB, idA FROM x_pairs
      UNION SELECT idA, idB FROM i_pairs UNION SELECT idB, idA FROM i_pairs
    ),
    all_docs AS (
      SELECT doc_id FROM documents UNION ALL SELECT doc_id FROM batch
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM all_docs
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
    sizes AS (
      SELECT cluster_id, count(*)::BIGINT AS cluster_size
      FROM comp GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size
    FROM comp c JOIN sizes s ON s.cluster_id = c.cluster_id
    """


@register("dedup_clusters_incremental", oracle=_incr_clusters_oracle())
def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL CLUSTER MAINTENANCE (operators/dedup.py:
    incremental_dedup_clusters): a synthetic arrival batch — verbatim
    copies of every 11th document (must join their originals' clusters)
    plus BRIDGE documents concatenating two adjacent documents (must
    MERGE the two originals' clusters into one) — is folded into the
    persisted cluster assignment via batch↔index pairs, within-batch
    pairs, contraction of old endpoints to their cluster ids, and a
    closure over the BATCH-SIZED contracted graph. Untouched clusters
    pass through bit-identically. The oracle replays every pair stage
    and runs ONE recursive closure over the union — the strongest
    equality: incremental == full rebuild, value-checked.

    Scale shape: only the batch is shingled/banded at arrival; the
    closure graph has one node per TOUCHED cluster + batch docs; the
    relabel map is bounded and broadcast; the only corpus-sized step is
    writing the new assignment, which is the output."""
    from bigdata_capstone_spark.operators.dedup import (
        connected_components,
        incremental_dedup_clusters,
        near_dup_index,
        near_dup_pairs_from_index,
    )

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).cache()
    copies = docs.filter(F.col("doc_id") % 11 == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    d2 = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("t2")
    )
    bridges = (
        docs.filter(F.col("doc_id") % 17 == 5)
        .join(d2, on="doc_id")
        .select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat("text", F.lit(" "), "t2").alias("text"),
        )
    )
    batch = copies.unionByName(bridges)
    bk, sh, sz = near_dup_index(docs, n_perm=8, bands=4, shingle_n=3)
    index = (bk.cache(), sh.cache(), sz.cache())
    # the persisted assignment stand-in, derived FROM the index (the
    # corpus is never shingled twice): pairs from the persisted
    # relations -> closure -> every doc labeled (singletons = self)
    old_pairs = near_dup_pairs_from_index(
        index, min_jaccard=0.5, max_bucket_size=100
    )
    labels = connected_components(old_pairs, "idA", "idB")
    assignment = docs.select("doc_id").join(
        labels.select(F.col("node").alias("doc_id"), "component"),
        on="doc_id",
        how="left",
    ).select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
    )
    return incremental_dedup_clusters(
        assignment, index, batch, n_perm=8, bands=4, shingle_n=3,
        min_jaccard=0.35, max_bucket_size=100,
    )


def _wqsketch_grouped_oracle(
    capacity: int = 256, qs: tuple[float, ...] = (0.5, 0.9)
) -> str:
    from bigdata_capstone_spark.functions.portable import md5_long_sql
    from bigdata_capstone_spark.operators.sketches import (
        _quantile_label,
        wqsketch_wlvl_sql,
    )

    h = md5_long_sql("'wqs:' || doc_id::VARCHAR")
    picks = ",\n           ".join(
        f"round(min(CASE WHEN cum_w::DOUBLE >= {q} * tot_w::DOUBLE "
        f"THEN value END), 6) AS p{_quantile_label(q)}_r"
        for q in qs
    )
    return f"""
    WITH hashed AS (
      SELECT lang, doc_id::VARCHAR AS qs_id, n_chars::DOUBLE AS value,
             {_WQS_W_SQL} AS w, {h} AS __h
      FROM documents
    ),
    items AS (
      SELECT lang, qs_id, value, w, {wqsketch_wlvl_sql("w")} AS lvl
      FROM hashed WHERE w > 0
    ),
    lv AS (SELECT lang, lvl, count(*) AS cnt FROM items GROUP BY 1, 2),
    cum AS (
      SELECT lang, lvl,
             sum(cnt) OVER (PARTITION BY lang ORDER BY lvl DESC) AS cum
      FROM lv
    ),
    thr AS (
      SELECT lang,
             coalesce(max(CASE WHEN cum > {capacity} THEN lvl + 1 END),
                      0)::INT AS thr
      FROM cum GROUP BY lang
    ),
    state AS (
      SELECT i.lang, i.qs_id, i.value, i.w, t.thr
      FROM items i JOIN thr t ON t.lang = i.lang
      WHERE i.lvl >= t.thr
    ),
    ranked AS (
      SELECT lang, value,
             sum(greatest(w, (1::BIGINT << thr)))
               OVER (PARTITION BY lang ORDER BY value, qs_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               ::BIGINT AS cum_w,
             sum(greatest(w, (1::BIGINT << thr)))
               OVER (PARTITION BY lang)::BIGINT AS tot_w,
             count(*) OVER (PARTITION BY lang) AS m,
             max(thr) OVER (PARTITION BY lang) AS g_thr
      FROM state
    )
    SELECT lang,
           max(m)::BIGINT AS n_kept,
           max(g_thr)::INT AS thr,
           max(tot_w)::BIGINT AS est_total_w,
           {picks}
    FROM ranked GROUP BY lang
    """


@register(
    "lang_weighted_quantile_sketch", oracle=_wqsketch_grouped_oracle()
)
def lang_weighted_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-LANGUAGE token-weighted length quantiles from GROUPED
    weighted sketches (operators/sketches.py wqsketch_grouped_*) — the
    production shape of the weighted family: one dashboard row per
    language, each group its own canonical <=256-row weighted state
    from ONE scan + one grouped contingency, quantiles at the weighted
    ranks. Completes the weighted family's dimensions: global batch /
    one-pass / shard-merge / streaming / GROUPED, all on the same
    PRF-coin construction the oracle replays.

    Scale shape: weighted level is map-side; the grouped threshold is
    a <=41 x |langs| contingency; ranking windows partition by lang
    over the bounded state."""
    from bigdata_capstone_spark.operators.sketches import (
        wqsketch_grouped_build,
        wqsketch_grouped_quantiles,
    )
    from bigdata_capstone_spark.operators.textops import tokens_col

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        F.size(tokens_col("text")).cast("long").alias("__w"),
    )
    state = wqsketch_grouped_build(
        docs, ["lang"], F.col("doc_id"), F.col("n_chars"),
        F.col("__w"), 256,
    )
    return wqsketch_grouped_quantiles(state, ["lang"], (0.5, 0.9))
