"""Query catalog: named queries + their DuckDB oracle SQL.

This is the engine's public query registry (SURVEY §3.3: "a named query
registry as the public entry point"). ``__spark_entry__.py`` re-exports it
for the driver. Each entry is a ``(spark, sf_dir) -> DataFrame`` builder;
``ORACLE_SQL[name]`` is ANSI SQL DuckDB runs on the same Parquet for the
hash-compare. Names absent from ``ORACLE_SQL`` are genuinely
non-SQL-expressible (ML estimators, LSH, randomSplit) and get the driver's
rows-only check plus library tests.

Determinism contract (hash-oracle stable, SURVEY §5.2):
- every aggregate/computed column is aliased identically in both engines;
- money sums go through DECIMAL (order-independent) before double;
- order-dependent float stats (corr/variance/cosine) are rounded;
- every LIMIT/top-k has a unique-column tie-break;
- timestamps: session TZ pinned to UTC inside each query builder.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_capstone_spark.functions.portable import exact_sum
from bigdata_capstone_spark.operators import aggregates as agg
from bigdata_capstone_spark.operators import popularity as pop
from bigdata_capstone_spark.operators import relational as rel
from bigdata_capstone_spark.session import ensure_utc
from bigdata_capstone_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}

FLAGSHIP = "damped_part_popularity"


def register(name: str, oracle: str | None = None):
    """Decorator: add a query builder (and optionally its oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Flagship: damped popularity transplanted onto the driver tables
# (SURVEY §7.2 step 1). Per-part damped mean of lineitem extended price —
# the reference's Q9 formula avg·n/(n+β) ≡ sum/(n+β)
# (popularity_model.py:37) with β=100, top-50 by score with key tie-break.
# --------------------------------------------------------------------------

@register(
    FLAGSHIP,
    oracle="""
    SELECT l_partkey,
           count(l_extendedprice)::BIGINT AS rating_count,
           (sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE)
             / (count(l_extendedprice) + 100.0) AS popularity_score
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY popularity_score DESC, l_partkey
    LIMIT 50
    """,
)
def damped_part_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    scores = pop.damped_item_scores(
        li, damping=100.0, item_col="l_partkey", rating_col="l_extendedprice"
    )
    return scores.orderBy(F.desc("popularity_score"), F.col("l_partkey")).limit(50)


# --------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary (SURVEY §2.4 A1-A3 multi-aggregate; date
# predicate pushed to the parquet scan).
# --------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE      AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))::DOUBLE
                                                               AS sum_disc_price,
           sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    AS DECIMAL(18,4)))::DOUBLE                 AS sum_charge,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / count(*)      AS avg_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / count(*) AS avg_price,
           sum(CAST(l_discount AS DECIMAL(18,4)))::DOUBLE / count(*)      AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", 2).alias("sum_qty"),
            exact_sum("l_extendedprice", 2).alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,4)")).cast("double").alias("sum_charge"),
            (exact_sum("l_quantity", 2) / n).alias("avg_qty"),
            (exact_sum("l_extendedprice", 2) / n).alias("avg_price"),
            (exact_sum("l_discount", 4) / n).alias("avg_disc"),
            n.cast("long").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Relational core (SURVEY §2.2-2.3, §2.5-2.8)
# --------------------------------------------------------------------------

@register(
    "regional_revenue",
    oracle="""
    SELECT n_name,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))::DOUBLE
             AS revenue,
           count(*)::BIGINT AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join (J1/J2 generalized).

    Scale shape: lineitem⋈orders is the one big shuffle join (both sides
    huge, co-partitioned on orderkey by AQE); customer/nation/region are
    dimensions → explicit ``broadcast`` so no shuffle for them. The
    o_orderdate and r_name predicates push into the scans.
    """
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "segment_customers_with_orders",
    oracle="""
    SELECT c_mktsegment, count(*)::BIGINT AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def segment_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (J1 hardened per SURVEY Q5): customers having ≥1 order,
    counted per market segment. ``left_semi`` instead of the reference's
    inner-join-on-distinct idiom (splitting_data.py:27-34)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        rel.semi_join(customer, orders, on="c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (absent from the reference — SURVEY §2.3 notes no anti
    join existed; added as part of the relational core)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rel.anti_join(customer, orders, on="c_custkey").select("c_custkey", "c_name")


@register(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    )
    WHERE rank <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k, exact-k tie semantics (W1/O3; popularity_model.py:46
    idiom, with the SURVEY Q2 deterministic tie-break on o_orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    return rel.grouped_top_k(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        3,
        method="row_number",
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("int"))


@register(
    "top_lineitems_per_order_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, rank
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             rank() OVER (PARTITION BY l_orderkey
                          ORDER BY l_quantity DESC) AS rank
      FROM lineitem
    )
    WHERE rank <= 2
    """,
)
def top_lineitems_per_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rank()`` tie semantics: boundary ties are all kept (SURVEY Q3;
    als_recommendation.py:21-23). Quantities tie often, so this exercises
    the >k-rows-per-group case; the result set is still deterministic
    because rank() gives equal rows equal ranks."""
    li = load_table(spark, sf_dir, "lineitem")
    return rel.grouped_top_k(
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        ["l_orderkey"],
        [F.desc("l_quantity")],
        2,
        method="rank",
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("int"))


@register(
    "expensive_or_large_parts",
    oracle="""
    SELECT p_partkey, p_brand FROM part WHERE p_retailprice > 1500
    UNION
    SELECT p_partkey, p_brand FROM part WHERE p_size >= 40
    """,
)
def expensive_or_large_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-semantics union of two filtered projections (U1 + A8;
    splitting_data.py:35 positional union, hardened to unionByName +
    distinct)."""
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_retailprice") > 1500).select("p_partkey", "p_brand")
    b = part.filter(F.col("p_size") >= 40).select("p_partkey", "p_brand")
    return rel.union_distinct(a, b)


@register(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, count(*)::BIGINT AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-pushdown showcase (P8): both timestamp range and string
    inequality land in the parquet scan's PushedFilters."""
    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderstatus") != "F")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Grouped statistics (SURVEY §2.4)
# --------------------------------------------------------------------------

@register(
    "event_value_stats_by_type",
    oracle="""
    SELECT event_type,
           count(value)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(value) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def event_value_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate per group (A1-A3; popularity_model.py:28-31 idiom)."""
    events = load_table(spark, sf_dir, "events")
    return agg.grouped_stats(events, ["event_type"], "value", scale=2)


@register(
    "event_value_variance_by_user",
    oracle="""
    SELECT user_id, round(var_samp(value), 6) AS variance_r
    FROM events
    GROUP BY user_id
    HAVING var_samp(value) > 0 AND count(value) >= 5
    """,
)
def event_value_variance_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance per group + positive-variance filter (A4;
    customer_segmentation_2.py:58-59). Variance is reduction-order
    dependent → rounded to 6dp on both sides."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.variance("value").alias("v"), F.count("value").alias("n"))
        .filter((F.col("v") > 0) & (F.col("n") >= 5))
        .select("user_id", F.round("v", 6).alias("variance_r"))
    )


@register(
    "event_user_type_corr",
    oracle="""
    SELECT user_id, round(corr(value, epoch_us(ts)), 6) AS correlation_r,
           count(*)::BIGINT AS n_points
    FROM events
    GROUP BY user_id
    HAVING corr(value, epoch_us(ts)) IS NOT NULL AND count(*) >= 2
    """,
)
def event_user_type_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group, null-filtered (A5 + Q6;
    customer_segmentation_2.py:36-38): corr of event value against
    event-time microseconds per user. Integer microseconds on both sides
    (Spark unix_micros / DuckDB epoch_us) — ``unix_timestamp``/``epoch``
    disagree on fractional seconds across engines."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    with_ts = events.withColumn("ts_sec", F.unix_micros("ts").cast("double"))
    out = agg.pearson_by_group(with_ts, ["user_id"], "value", "ts_sec", min_points=2)
    return out.select(
        "user_id", F.round("correlation", 6).alias("correlation_r"), "n_points"
    )


@register(
    "user_event_history",
    oracle="""
    SELECT user_id,
           string_agg(event_id::VARCHAR, ',' ORDER BY ts, event_id) AS items
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically ordered collect_list (A6 + Q1 fix): per-user
    purchase history ordered by time, joined to a string so the oracle
    compare is array-free."""
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    collected = events.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("ts"), F.col("event_id")))
                ),
                lambda s: s["event_id"].cast("string"),
            ),
            ",",
        ).alias("items")
    )
    return collected


@register(
    "global_event_stats",
    oracle="""
    SELECT count(value)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS sum_value,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE / count(value) AS avg_value
    FROM events
    """,
)
def global_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global no-group aggregate (A7; customer_segmentation_2.py:41)."""
    events = load_table(spark, sf_dir, "events")
    return agg.global_stats(events, "value", scale=2)


# --------------------------------------------------------------------------
# Ranking metrics (SURVEY §2.9 M7; the reference's headline evaluation,
# popularity_model.py:61-67) — computed for a segment-popularity recommender
# over the driver tables, fully SQL-expressible for the oracle.
# --------------------------------------------------------------------------

@register(
    "ranking_metrics_popularity",
    oracle="""
    WITH sales AS (
      SELECT o_custkey AS cust, l_partkey AS part, c_mktsegment AS seg,
             l_extendedprice AS price, l_quantity AS qty
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
    ),
    seg_scores AS (
      SELECT seg, part,
             sum(CAST(price AS DECIMAL(18,2)))::DOUBLE / (count(*) + 100.0) AS score
      FROM sales GROUP BY seg, part
    ),
    preds AS (
      SELECT seg, part,
             row_number() OVER (PARTITION BY seg ORDER BY score DESC, part) - 1 AS pos
      FROM seg_scores
      QUALIFY pos < 20
    ),
    cust_mean AS (
      SELECT cust, sum(CAST(qty AS DECIMAL(18,2)))::DOUBLE / count(*) AS mq
      FROM sales GROUP BY cust
    ),
    labels AS (
      SELECT DISTINCT s.cust, s.part
      FROM sales s JOIN cust_mean m ON s.cust = m.cust
      WHERE s.qty > m.mq
    ),
    label_counts AS (SELECT cust, count(*) AS m FROM labels GROUP BY cust),
    cust_preds AS (
      SELECT c.c_custkey AS cust, p.part, p.pos
      FROM customer c JOIN preds p ON c.c_mktsegment = p.seg
    ),
    marked AS (
      SELECT cp.cust, cp.pos,
             CASE WHEN l.part IS NULL THEN 0 ELSE 1 END AS hit
      FROM cust_preds cp
      LEFT JOIN labels l ON cp.cust = l.cust AND cp.part = l.part
    ),
    scored AS (
      SELECT cust, hit,
             hit * (sum(hit) OVER (PARTITION BY cust ORDER BY pos)) / (pos + 1.0)
               AS ap_contrib,
             hit / ln(pos + 2.0) AS dcg_contrib
      FROM marked
    ),
    per_user0 AS (
      SELECT cust, sum(hit) AS hits, sum(ap_contrib) AS ap_num,
             sum(dcg_contrib) AS dcg
      FROM scored GROUP BY cust
    ),
    per_user AS (
      SELECT p.cust,
             hits / 20.0 AS prec,
             hits / (m * 1.0) AS rec,
             ap_num / least(m, 20) AS ap,
             dcg / list_sum([1.0/ln(x + 1) for x in range(1, least(m, 20) + 1)])
               AS ndcg
      FROM per_user0 p JOIN label_counts lc ON p.cust = lc.cust
    )
    SELECT count(*)::BIGINT AS n_users,
           round(avg(prec), 6) AS precision_at_k,
           round(avg(rec), 6)  AS recall_at_k,
           round(avg(ap), 6)   AS map_at_k,
           round(avg(ndcg), 6) AS ndcg_at_k
    FROM per_user
    """,
)
def ranking_metrics_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P@20/Recall@20/MAP@20/NDCG@20 of a segment-popularity recommender.

    Recommender: per market segment, top-20 parts by damped revenue score
    (Q9 formula). Ground truth per customer: parts bought with quantity
    strictly above the customer's own mean quantity (Q7 semantics,
    popularity_model.py:52-54). Metrics follow pinned mllib semantics (see
    operators/ranking_metrics.py); global means rounded to 6dp because a
    mean over users is reduction-order dependent.
    """
    from bigdata_capstone_spark.operators.ranking_metrics import ranking_metrics

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
            F.col("c_mktsegment").alias("seg"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").alias("qty"),
        )
    )
    seg_scores = sales.groupBy("seg", "part").agg(
        (exact_sum("price", 2) / (F.count(F.lit(1)) + F.lit(100.0))).alias("score")
    )
    preds = rel.grouped_top_k(
        seg_scores, ["seg"], [F.desc("score"), F.col("part")], 20, rank_col="rn"
    ).select("seg", "part", (F.col("rn") - 1).alias("pos"))
    cust_mean = sales.groupBy("cust").agg(
        (exact_sum("qty", 2) / F.count(F.lit(1))).alias("mq")
    )
    labels = (
        sales.join(cust_mean, on="cust")
        .filter(F.col("qty") > F.col("mq"))
        .select("cust", "part")
        .distinct()
    )
    cust_preds = customer.select(
        F.col("c_custkey").alias("cust"), F.col("c_mktsegment").alias("seg")
    ).join(F.broadcast(preds), on="seg").select("cust", "part", "pos")

    out = ranking_metrics(
        cust_preds, labels, 20, user_col="cust", item_col="part", pos_col="pos"
    )
    return out.select(
        "n_users",
        F.round("precision_at_k", 6).alias("precision_at_k"),
        F.round("recall_at_k", 6).alias("recall_at_k"),
        F.round("map_at_k", 6).alias("map_at_k"),
        F.round("ndcg_at_k", 6).alias("ndcg_at_k"),
    )
