"""Scale-path operators: salted join parity, approximate-aggregate error
bounds, popularity grid search (reference M8), stream-static enrichment.

The new catalog queries (quartiles/extremes/trend/text/salted) get their
value check from the DuckDB oracle via the driver contract; these tests
cover the operators whose semantics the oracle can't see (approximation
error, grid-search selection, streaming parity).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_capstone_spark.operators.aggregates import approx_stats
from bigdata_capstone_spark.operators.relational import salted_join
from bigdata_capstone_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf_small, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, on="l_orderkey")
    salted = salted_join(li, orders, on="l_orderkey", salt_buckets=4)
    assert salted.columns == plain.columns
    # compare as sorted multisets: the fixture lineitem has duplicate
    # (l_orderkey, l_linenumber) pairs, so no engine-side ORDER BY on
    # those keys is total and row order within ties is plan-dependent
    key = lambda r: tuple(  # noqa: E731
        (v is None, v) for v in r
    )
    assert sorted(map(tuple, salted.collect()), key=key) == sorted(
        map(tuple, plain.collect()), key=key
    )


def test_salted_left_join_keeps_misses(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "orphan")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "rv"])
    out = salted_join(left, right, on="k", how="left", salt_buckets=3)
    rows = {r["k"]: r["rv"] for r in out.collect()}
    assert rows == {1: "x", 2: "y", 99: None}


def test_approx_stats_error_bounds(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    approx = approx_stats(
        events, ["event_type"], "value", distinct_col="user_id"
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("nd"),
        F.expr("percentile(value, 0.5)").alias("p5"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    joined = {r["event_type"]: r for r in approx.join(exact, "event_type").collect()}
    assert joined
    for r in joined.values():
        # HLL++ at default rsd=5%: allow 15% slack; GK sketch at
        # accuracy=10000 is near-exact on sf0.001-sized groups
        assert abs(r["n_distinct_approx"] - r["nd"]) <= max(3, 0.15 * r["nd"])
        assert abs(r["p5_approx"] - r["p5"]) <= 0.05 * max(1.0, abs(r["p5"]))
        assert abs(r["p95_approx"] - r["p95"]) <= 0.05 * max(1.0, abs(r["p95"]))


def test_grid_search_damping_prefers_signal(spark):
    """On a fixture where low-damping overfits a rarely-rated-but-high item,
    the grid search returns the β with the best validation NDCG, and the
    result list covers the full grid."""
    from bigdata_capstone_spark.operators.popularity import grid_search_damping
    from bigdata_capstone_spark.sources.ratings import synthetic_ratings

    ratings = synthetic_ratings(spark).dropna(
        subset=["userId", "movieId", "rating"]
    )
    train, val = ratings.randomSplit([0.8, 0.2], seed=7)
    grid = [10.0, 100.0, 1000.0]
    best, results = grid_search_damping(train, val, grid, k=20)
    assert [r["damping"] for r in results] == grid
    assert best in grid
    best_row = max(results, key=lambda r: r["ndcg_at_k"])
    assert best_row["damping"] == best
    for r in results:
        assert 0.0 <= r["ndcg_at_k"] <= 1.0
        assert r["n_users"] > 0


def test_stream_static_join_matches_batch(spark, sf_small):
    from bigdata_capstone_spark.streaming.windows import (
        enrich_with_static,
        run_stream_to_memory,
        stream_events_from_parquet,
    )

    events_batch = load_table(spark, sf_small, "events")
    dim = (
        events_batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total_events"))
    )
    stream = stream_events_from_parquet(spark, sf_small)
    enriched = enrich_with_static(stream, dim, on="user_id").groupBy(
        "user_id", "user_total_events"
    ).agg(F.count(F.lit(1)).alias("n"))
    run_stream_to_memory(enriched, "enriched_counts", output_mode="complete")
    got = {
        (r["user_id"], r["user_total_events"], r["n"])
        for r in spark.sql("SELECT * FROM enriched_counts").collect()
    }
    want = {
        (r["user_id"], r["n"], r["n"])
        for r in dim.withColumnRenamed("user_total_events", "n").collect()
    }
    assert got == want


def test_boilerplate_storm_soak(spark, sf_small):
    """Dedup soak under a BOILERPLATE STORM (thousands of identical docs —
    the documented quadratic risk for LSH banding at 100 TB): the
    default-on hot-bucket cap must keep candidate generation bounded where
    the uncapped path explodes to ~N²/2 pairs, while near-dup recall on
    the clean part of the corpus is untouched. Measured wall-times for
    both paths are recorded in SCALE.md ("Round-3 dedup soak")."""
    import time

    from bigdata_capstone_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dup_pairs,
        minhash_signatures,
    )
    from bigdata_capstone_spark.sources.tables import load_table

    storm_n = 3000
    boiler = (
        "subscribe to our newsletter for the latest updates terms of "
        "service privacy policy all rights reserved contact us about"
    )
    storm = spark.range(storm_n).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(boiler).alias("text"),
    )
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    corpus = docs.unionByName(storm)

    sigs = minhash_signatures(corpus, n_perm=8, shingle_n=3).cache()
    sigs.count()

    t0 = time.time()
    uncapped_n = lsh_candidate_pairs(sigs, 8, 4).count()
    t_uncapped = time.time() - t0
    t0 = time.time()
    capped_n = lsh_candidate_pairs(sigs, 8, 4, max_bucket_size=2000).count()
    t_capped = time.time() - t0

    # every storm pair is a candidate uncapped: ≥ N·(N-1)/2
    assert uncapped_n >= storm_n * (storm_n - 1) // 2
    # capped: the storm bucket (3000 > 2000) is dropped entirely
    assert capped_n < 100_000
    print(
        f"\nsoak: uncapped {uncapped_n} cands in {t_uncapped:.1f}s; "
        f"capped {capped_n} cands in {t_capped:.1f}s"
    )

    # the PRODUCTION path with its default cap completes and still finds
    # the clean corpus's near-dup pairs (storm docs are identical — exact
    # dedup's job upstream, not LSH's)
    t0 = time.time()
    pairs = minhash_near_dup_pairs(
        corpus, n_perm=8, bands=4, min_jaccard=0.5
    )
    clean_pairs = pairs.filter(F.col("idA") < 10_000_000).count()
    t_prod = time.time() - t0
    baseline_pairs = minhash_near_dup_pairs(
        docs, n_perm=8, bands=4, min_jaccard=0.5
    ).count()
    assert clean_pairs == baseline_pairs
    print(f"soak: production path {t_prod:.1f}s, {clean_pairs} clean pairs")


def test_embedding_storm_knn_cap(spark, sf_small):
    """KNN-graph soak under an EMBEDDING STORM (thousands of identical
    vectors — e.g. a boilerplate page embedded once per crawl copy): all
    storm vectors land in ONE (table, bucket) per table, so the uncapped
    bucket self-join would generate ≥ n_tables·N·(N-1) candidate pairs;
    the default-on ``max_bucket`` cap (2000) must drop those buckets
    entirely — no storm vector appears in the graph — while clean-corpus
    vectors still get edges."""
    from bigdata_capstone_spark.operators.simsearch import (
        knn_graph,
        rp_lsh_buckets,
    )

    storm_n = 3000
    base = load_table(spark, sf_small, "embeddings").select(
        "vec_id", "embedding"
    )
    storm_vec = base.filter(F.col("vec_id") == 0).select("embedding")
    storm = spark.range(storm_n).crossJoin(F.broadcast(storm_vec)).select(
        (F.col("id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(storm).cache()

    # arithmetic uncapped bound from deterministic bucket sizes: the join
    # itself is never materialized (that blow-up is the point of the cap)
    sizes = (
        rp_lsh_buckets(corpus, dim=64, n_planes=6, n_tables=2)
        .groupBy("table", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    uncapped_bound = sizes.select(
        F.sum(F.col("n") * (F.col("n") - 1)).alias("c")
    ).collect()[0]["c"]
    assert uncapped_bound >= 2 * storm_n * (storm_n - 1)

    g = knn_graph(corpus, dim=64, k=5, n_planes=6, n_tables=2).cache()
    storm_rows = g.filter(
        (F.col("src") >= 10_000_000) | (F.col("dst") >= 10_000_000)
    ).count()
    assert storm_rows == 0
    assert g.count() > 0  # clean vectors still get edges
    corpus.unpersist()
    g.unpersist()


def test_pack_sequences_invariants(spark, sf_small):
    """Every doc lands in exactly one pack; packs within a (lang, shard)
    stream are contiguous from 0; a doc's pack is its first token's
    position div capacity (concat-and-chunk semantics)."""
    from bigdata_capstone_spark.operators.textops import pack_sequences

    docs = load_table(spark, sf_small, "documents")
    cap = 128
    packed = pack_sequences(docs, capacity=cap, n_shards=4).cache()

    assert packed.count() == docs.count()  # one row per doc, none dropped

    rows = packed.orderBy("lang", "shard", "doc_id").collect()
    streams: dict[tuple, list] = {}
    for r in rows:
        streams.setdefault((r["lang"], r["shard"]), []).append(r)
    for stream in streams.values():
        cum = 0
        for r in stream:
            assert r["pack_id"] == cum // cap
            assert r["pack_offset"] == cum % cap
            cum += r["n_tokens"]
    packed.unpersist()


def test_merge_upsert_branches(spark):
    """All three MERGE branches, including rows whose payload is
    legitimately NULL (presence flags, not value nullness, must drive
    the branch choice)."""
    from bigdata_capstone_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "c", None)],
        ["k", "name", "bal"],
    )
    updates = spark.createDataFrame(
        [(2, "b2", 5.0), (3, None, 7.0), (9, "new", 99.0)],
        ["k", "name", "bal"],
    )
    for broadcast in (False, True):  # full-outer and decomposed strategies
        out = {
            r["k"]: r
            for r in merge_upsert(
                target,
                updates,
                on=["k"],
                combine={"bal": lambda t, u: t + u},
                broadcast_updates=broadcast,
            ).collect()
        }
        assert set(out) == {1, 2, 3, 9}
        assert (out[1]["name"], out[1]["bal"]) == ("a", 10.0)   # kept
        assert (out[2]["name"], out[2]["bal"]) == ("b2", 25.0)  # update+combine
        assert out[3]["name"] is None and out[3]["bal"] is None # null + combine
        assert (out[9]["name"], out[9]["bal"]) == ("new", 99.0) # insert


@pytest.mark.slow  # 20k-vector soak (~1 min)
def test_pq_soak_20k_vectors(spark):
    """PQ soak at 10x the sf0.1 embedding count: 20k deterministic
    PRF-synthesized 64-dim vectors encode into 16x64 codebooks and serve
    an ADC+re-rank search — completes with full shape invariants (the
    wall-time envelope is recorded in SCALE.md; here we assert
    completion and structure, not timing)."""
    from pyspark.sql import functions as F

    from bigdata_capstone_spark.functions.portable import md5_long
    from bigdata_capstone_spark.operators.simsearch import (
        pq_codes_prf,
        pq_topk_prf,
    )

    n = 20_000
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (
                    md5_long(
                        F.concat(
                            F.lit("v:"),
                            F.col("id").cast("string"),
                            F.lit(":"),
                            i.cast("string"),
                        )
                    )
                    % 2000
                ).cast("double")
                / 1000.0
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
    ).cache()
    codes = pq_codes_prf(corpus, dim=64, m=16, k_codes=64)
    assert codes.count() == n * 16
    queries = corpus.filter(F.col("vec_id") < 10)
    out = pq_topk_prf(
        corpus, queries, k=10, dim=64, m=16, k_codes=64, rerank=100
    )
    rows = out.collect()
    assert len(rows) == 100  # 10 queries x top-10
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in by_q.values())
    corpus.unpersist()
