"""Inverted-index text retrieval (BM25) as DataFrame ops.

The curation counterpart to the embedding ANN ladder (simsearch.py):
lexical top-k retrieval over the corpus — the tool used for benchmark
decontamination by retrieval, nearest-neighbor quality probes, and
building retrieval-augmented training sets. Same engine discipline as
everything else: the "index" is a relational postings table, the
"search" is a join, Catalyst plans it.

Reference parity note: the reference has no retrieval operator — this
extends the engine's similarity family (SURVEY §2.9 M1-M3 treat docs as
token multisets; BM25 is the scored, length-normalized version of the
same representation).

Scale shape (the part that must survive 100 TB):
- The corpus is scanned ONCE into a term-frequency postings table
  (doc_id, token, tf) — a map-side-combined groupBy on the exploded
  tokens. Document lengths and document frequencies both derive from
  the cached postings frame, never from a second corpus scan.
- The query side is tiny (a handful of query documents' distinct
  terms). It picks up per-term document frequencies by broadcasting
  INTO the vocabulary-sized dfreq join (the vocabulary itself is never
  broadcast — at 100 TB it doesn't fit), then is BROADCAST onto the
  postings table, so the only rows that survive the join are postings
  of query terms — the inverted-index lookup, expressed relationally.
  Nothing ever shuffles on the full corpus after that join: the
  (query, candidate) aggregation is bounded by |matching postings|.
- Per-query top-k is a window over the bounded candidate set, never
  the whole corpus.

Determinism (oracle contract): idf and the tf saturation term are pure
arithmetic over exact integers (counts, lengths) plus one `ln`; the
per-(query, doc, term) score is rounded to 6 dp and the per-(query,
doc) total is summed in integer micro-units — the same discipline as
catalog_etl.doc_bigram_logprob, making Spark's partitioned partial
sums bit-identical to DuckDB's serial scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_capstone_spark.operators.relational import fan_out
from bigdata_capstone_spark.operators.textops import tokens_col


def postings_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token, tf) term-frequency postings — the inverted index
    as a relation. One explode pass; the groupBy combines map-side."""
    return (
        fan_out(docs)
        .select("doc_id", F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def dfreq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, dfc) document frequencies — the BM25 index statistic the
    idf term needs, derived from one postings pass."""
    return (
        postings_table(docs, text_col)
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("dfc"))
    )


def merge_dfreq(*dfreqs: DataFrame) -> DataFrame:
    """Merge document-frequency tables computed over DISJOINT document
    sets: counts ADD (a token's df over A ∪ B is df_A + df_B when A and
    B share no documents) — the property that makes the lexical index's
    statistics maintainable under continuous ingest with O(batch) work,
    exactly like the PQ/IVF-PQ side of the vector index: each ingest
    shard computes its own dfreq independently (no coordination), and
    the merge is a union + re-aggregate keyed on the token — one
    shuffle over vocabulary-sized frames, never a corpus re-scan.
    (Doc-length and corpus totals merge the same way; df is the one
    statistic queries actually join against, so it is the one
    registered.)"""
    merged = dfreqs[0]
    for d in dfreqs[1:]:
        merged = merged.unionByName(d)
    return merged.groupBy("token").agg(
        F.sum("dfc").cast("long").alias("dfc")
    )


def bm25_topk(
    docs: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    stop_df_top: int = 50,
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Deterministic BM25 retrieval demo: the ``n_queries`` lowest
    doc_ids act as query documents; each retrieves its top-``k`` other
    documents by BM25 over shared terms (the ``stop_df_top`` highest-
    document-frequency tokens are dropped from queries as stopwords).

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene's BM25+,
    always positive), score contribution of term t in doc d for query q:
    idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)).

    N-semantics: corpus stats (N and avgdl) derive from the postings
    frame, which has no rows for zero-token documents — so idf's N is
    "documents with >=1 token", not raw corpus row count, and empty docs
    dilute neither avgdl nor idf. A deliberate (and arguably better)
    deviation from textbook BM25 when empty docs exist; the oracle
    computes N the same way, so engines agree.

    Returns (query_doc, doc_id, n_terms, bm25_r, rk) with rk 1..k by
    (score DESC, doc_id) — ties broken on the key so the result is a
    deterministic set.

    ``postings`` lets a composing operator (prf_expansion_terms, the
    RAG pipeline) pass its own already-cached postings frame so the
    corpus is exploded and cached ONCE per composition instead of once
    per stage; when omitted, one is built and cached here.
    """
    post = (
        postings if postings is not None
        else postings_table(docs, text_col).cache()
    )

    # Corpus statistics — all derived from the cached postings frame.
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    dfreq = post.groupBy("token").agg(
        F.countDistinct("doc_id").alias("dfc")
    )

    # Stopword cut: the stop_df_top most-common tokens by (df DESC,
    # token) — a bounded TakeOrdered, broadcast back as an anti-join.
    stop = (
        dfreq.orderBy(F.desc("dfc"), "token").limit(stop_df_top).select("token")
    )

    # Query side: distinct non-stopword terms of the n_queries lowest
    # doc_ids. Bounded by a few documents' vocabulary -> broadcast.
    # Each query term picks up its document frequency HERE — broadcasting
    # the bounded query-term table into the vocabulary-sized dfreq join
    # (never the reverse: at 100 TB dfreq is the full corpus vocabulary
    # and must not be broadcast).
    qdocs = docs.select("doc_id").orderBy("doc_id").limit(n_queries)
    qterms = (
        post.join(F.broadcast(qdocs), "doc_id")
        .join(F.broadcast(stop), "token", "left_anti")
        .select(F.col("doc_id").alias("query_doc"), "token")
    )
    qstats = dfreq.join(F.broadcast(qterms), "token").select(
        "query_doc", "token", "dfc"
    )

    # The inverted-index lookup: broadcast query terms (now carrying
    # their df counts) onto postings. Only postings of query terms
    # survive; self-matches are excluded.
    cand = (
        post.join(F.broadcast(qstats), "token")
        .filter(F.col("doc_id") != F.col("query_doc"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )

    scored = cand.select(
        "query_doc",
        "doc_id",
        F.round(
            F.log(
                1.0
                + (F.col("n_docs") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
            )
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1
                * (
                    1.0
                    - b
                    + b * F.col("dl") / (F.col("total_len") / F.col("n_docs"))
                )
            ),
            6,
        ).alias("s"),
    )

    per_pair = scored.groupBy("query_doc", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (
            F.sum(F.round(F.col("s") * 1_000_000, 0).cast("long"))
            / F.lit(1_000_000.0)
        ).alias("bm25_r"),
    )

    w = Window.partitionBy("query_doc").orderBy(F.desc("bm25_r"), "doc_id")
    return (
        per_pair.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_doc", "doc_id", "n_terms", "bm25_r", "rk")
    )


def apply_dfreq_delta(
    base: DataFrame, removed: DataFrame, added: DataFrame
) -> DataFrame:
    """Maintain a document-frequency table under UPDATES and DELETES,
    not just appends: df(v2) = df(v1) - df(docs leaving) + df(docs
    arriving), where a changed document leaves with its OLD text and
    arrives with its NEW text. Counts over disjoint doc sets form a
    group under addition — the removal side merges with negated
    counts, and tokens whose df reaches zero drop out entirely
    (matching a from-scratch recompute bit-for-bit).

    ``removed``/``added`` are (token, dfc) frames from
    :func:`dfreq_table` over the leaving/arriving document slices.
    Scale: the merge is a union + re-aggregate on vocabulary-sized
    frames — O(delta vocabulary), never a corpus re-scan; composed
    with the re-crawl diff (corpus_recrawl_diff) this is the whole
    incremental-ingest index path."""
    neg = removed.select(
        "token", (-F.col("dfc")).cast("long").alias("dfc")
    )
    return merge_dfreq(base, neg, added).filter(F.col("dfc") > 0)


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of a lexical and a
    dense ranking: rrf(d) = sum over systems of 1/(c + rank_d), the
    standard hybrid-retrieval merge (BM25 x embedding ANN) production
    RAG stacks run. Inputs are rank lists (query_doc, doc_id, *_rk);
    candidates absent from one system contribute 0 from it (their rank
    column reports 0). Returns (query_doc, doc_id, lex_rk, dense_rk,
    rrf_r, fused_rk) with fused_rk 1..k by (rrf_r DESC, doc_id).

    Determinism: each RRF score is the fixed-order sum of at most two
    exact reciprocals, rounded to 6 dp BEFORE ranking. Scale shape: both
    inputs are k-bounded per query, so the full-outer merge join and
    the per-query top-k touch |Q| x k rows — nothing corpus-sized."""
    from bigdata_capstone_spark.operators.relational import grouped_top_k

    merged = lex.join(dense, ["query_doc", "doc_id"], "full_outer").select(
        "query_doc",
        "doc_id",
        F.coalesce(F.col("lex_rk"), F.lit(0)).cast("int").alias("lex_rk"),
        F.coalesce(F.col("dense_rk"), F.lit(0)).cast("int").alias("dense_rk"),
        F.round(
            F.when(
                F.col("lex_rk").isNotNull(), 1.0 / (F.col("lex_rk") + c)
            ).otherwise(0.0)
            + F.when(
                F.col("dense_rk").isNotNull(), 1.0 / (F.col("dense_rk") + c)
            ).otherwise(0.0),
            6,
        ).alias("rrf_r"),
    )
    return grouped_top_k(
        merged, ["query_doc"], [F.desc("rrf_r"), F.col("doc_id")], k,
        rank_col="fused_rk",
    ).withColumn("fused_rk", F.col("fused_rk").cast("int"))


def prf_expansion_terms(
    docs: DataFrame,
    n_queries: int = 5,
    fb_k: int = 5,
    n_terms: int = 5,
    stop_df_top: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM1-lite, the Rocchio/
    relevance-model recipe): retrieve each query's BM25 top-``fb_k``,
    then mine the ``n_terms`` strongest expansion terms from those
    feedback documents — term weight = summed tf across the feedback
    set, stopwords (top-``stop_df_top`` df) and the query's own terms
    excluded, ties on the token. The re-query step is then one more
    BM25 pass with the expanded term set; the mining is the part with
    new semantics, so it is what this operator (and its oracle) pins.

    Returns (query_doc, token, fb_tf, expansion_rank). Scale shape: one
    cached postings pass feeds retrieval, the stopword cut, query
    terms, and the feedback-term mining; the feedback set is
    |Q| x fb_k doc ids (broadcast), so mining touches only their
    postings rows."""
    post = postings_table(docs, text_col).cache()
    fb = bm25_topk(
        docs, n_queries=n_queries, k=fb_k, stop_df_top=stop_df_top,
        text_col=text_col, postings=post,
    ).select("query_doc", "doc_id")
    dfreq = post.groupBy("token").agg(
        F.countDistinct("doc_id").alias("dfc")
    )
    stop = (
        dfreq.orderBy(F.desc("dfc"), "token")
        .limit(stop_df_top)
        .select("token")
    )
    qdocs = docs.select("doc_id").orderBy("doc_id").limit(n_queries)
    qterms = post.join(F.broadcast(qdocs), "doc_id").select(
        F.col("doc_id").alias("query_doc"), "token"
    )
    mined = (
        post.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(stop), "token", "left_anti")
        .join(F.broadcast(qterms), ["query_doc", "token"], "left_anti")
        .groupBy("query_doc", "token")
        .agg(F.sum("tf").cast("long").alias("fb_tf"))
    )
    from bigdata_capstone_spark.operators.relational import grouped_top_k

    return grouped_top_k(
        mined, ["query_doc"], [F.desc("fb_tf"), F.col("token")], n_terms,
        rank_col="expansion_rank",
    ).withColumn("expansion_rank", F.col("expansion_rank").cast("int"))


def positional_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token, pos) POSITIONAL postings — the index shape phrase
    and proximity queries need (the tf postings above deliberately drop
    positions; BM25 never looks at them). One explode pass, 1-based
    positions matching the repeated-span convention."""
    return fan_out(docs).select(
        "doc_id",
        F.posexplode(tokens_col(text_col)).alias("pos0", "token"),
    ).select("doc_id", "token", (F.col("pos0") + 1).alias("pos"))


def top_ngram_phrases(
    docs: DataFrame, n: int = 3, k: int = 2, text_col: str = "text"
) -> DataFrame:
    """The corpus's top-``k`` most frequent word ``n``-grams (count DESC,
    phrase ASC) as (phrase, n_occurrences) — used to derive DETERMINISTIC
    query phrases from the corpus itself, so the phrase-search entry
    needs no literal fixture strings and survives any SF. Positional
    n-grams (not distinct per doc — occurrences are the point); one
    explode pass; the top-k is a bounded TakeOrdered."""
    toks = fan_out(docs).select(
        "doc_id", tokens_col(text_col).alias("toks")
    )
    grams = toks.filter(F.size("toks") >= n).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
            )
        ).alias("phrase")
    )
    return (
        grams.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "phrase")
        .limit(k)
    )


def phrase_search(
    postings: DataFrame, phrases: DataFrame
) -> DataFrame:
    """EXACT PHRASE SEARCH over positional postings — the quoted-query
    capability of the retrieval stack: a document matches phrase
    t1..tm at anchor position p iff token(p+j-1) = tj for every j.

    Expressed as ONE join instead of an m-way self-join: broadcast the
    (phrase, term_idx, token) terms onto the postings; every matching
    posting votes for anchor = pos - term_idx + 1; an anchor with all m
    DISTINCT term indexes present is a match (duplicate tokens inside a
    phrase work — each required index must be found at its own offset).
    Returns (phrase, doc_id, n_matches, first_pos).

    Scale shape: the corpus-sized side is the postings table, touched
    once by the broadcast join; only postings of phrase terms survive;
    the anchor groupBy is bounded by |matching postings|. This is the
    positional-index lookup expressed relationally — Catalyst plans it,
    and at 100 TB the postings bucket by doc_id like every other index
    table here."""
    terms = phrases.select(
        "phrase",
        F.posexplode(F.split("phrase", " ")).alias("idx0", "token"),
    ).select(
        "phrase",
        (F.col("idx0") + 1).alias("term_idx"),
        "token",
        F.size(F.split("phrase", " ")).alias("m"),
    )
    votes = postings.join(F.broadcast(terms), on="token").select(
        "phrase",
        "m",
        "doc_id",
        (F.col("pos") - F.col("term_idx") + 1).alias("anchor"),
        "term_idx",
    )
    anchors = (
        votes.filter(F.col("anchor") >= 1)
        .groupBy("phrase", "m", "doc_id", "anchor")
        .agg(F.countDistinct("term_idx").alias("found"))
        .filter(F.col("found") == F.col("m"))
    )
    return anchors.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("anchor").cast("long").alias("first_pos"),
    )


def proximity_search(
    postings: DataFrame, pairs: DataFrame, window: int
) -> DataFrame:
    """ORDERED PROXIMITY search over positional postings — the slop
    query between exact phrase and bag-of-words: (t1, t2) matches in a
    document wherever some occurrence of t2 follows an occurrence of t1
    by 1..``window`` positions. Returns (t1, t2, doc_id, n_matches,
    min_gap) counting the qualifying (p1, p2) position pairs.

    Scale shape: the corpus-sized postings table is FILTERED FIRST by
    the broadcast term sets (only postings of query terms survive —
    the inverted-index lookup), then the position pair-join runs per
    (pair, doc) over those survivors; at 100 TB frequent-term pairs
    bound their cost by the survivors' sizes, the same dial as the
    phrase anchor join."""
    left = postings.join(
        F.broadcast(pairs.select(F.col("t1").alias("token"), "t1", "t2")),
        on="token",
    ).select("t1", "t2", "doc_id", F.col("pos").alias("p1"))
    right = postings.join(
        F.broadcast(pairs.select(F.col("t2").alias("token"), "t1", "t2")),
        on="token",
    ).select("t1", "t2", "doc_id", F.col("pos").alias("p2"))
    hits = left.join(right, on=["t1", "t2", "doc_id"]).filter(
        (F.col("p2") - F.col("p1") >= 1)
        & (F.col("p2") - F.col("p1") <= window)
    )
    return hits.groupBy("t1", "t2", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min(F.col("p2") - F.col("p1")).cast("long").alias("min_gap"),
    )
