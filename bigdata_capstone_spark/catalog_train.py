"""Training-data pipeline catalog, wave 3: compressed-vector search,
tokenizer induction, training-export shuffling, and corpus-mixture dials.

The reference has no counterpart for any of these (its five scripts stop
at MovieLens recommendation — SURVEY §2); this module continues the
north-star extension (BASELINE.json: "LLM-data-pipeline operators
designed for scale") past the round-2/3 dedup + ANN + curation families:

- product quantization (the compressed-index ANN path the LSH/IVF
  entries lack: 64x smaller index, asymmetric-distance search);
- BPE merge-pair statistics (the counting core of tokenizer training);
- deterministic global shuffle + fixed sharding (training-export order);
- repeat-factor epoch mixture (up-sampling low-resource languages, the
  complement of the down-sampling `docs_temperature_rebalance`);
- per-source document caps (crawl-domain dominance control);
- Zipf rank-frequency statistics (corpus-health fingerprint).

Every entry is deterministic (PRF-keyed where sampling is involved) and
carries a DuckDB oracle that replays the full computation — including the
index structures themselves (PQ codebooks/codes), not just the output
arithmetic.

Scale notes (100 TB posture) are on each builder; the shared rules match
the other catalogs: broadcast anything bounded (codebooks, distance
tables, mixture thresholds), keep shuffles narrow (codes, ids, counts —
never text bodies), and make every sampling decision a pure function of
a PRF hash so re-runs and engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_capstone_spark.catalog import register
from bigdata_capstone_spark.functions.portable import md5_long, md5_long_sql
from bigdata_capstone_spark.session import ensure_utc
from bigdata_capstone_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Product quantization: codes + ADC search, both oracle-replayed.
# --------------------------------------------------------------------------

def _pq_sub_dist_sql(v: str, c: str, s: str, dsub: int) -> str:
    """DuckDB squared-L2 of subspace ``s`` (0-based) slices of ``v``/``c``
    — the engine twin of ``simsearch._sq_l2_col`` over ``F.slice``."""
    return (
        f"list_sum(list_transform(generate_series(1, {dsub}), "
        f"i -> ({v}[{s}*{dsub}+i] - {c}[{s}*{dsub}+i]) "
        f"* ({v}[{s}*{dsub}+i] - {c}[{s}*{dsub}+i])))"
    )


def _pq_topk_oracle(k: int, m: int, k_codes: int, dsub: int,
                    rerank: int) -> str:
    d = _pq_sub_dist_sql("e.v", "cb.center", "subs.s", dsub)
    qd = _pq_sub_dist_sql("q.v", "cb.center", "subs.s", dsub)
    cos = (
        "(list_sum(list_transform(generate_series(1, len(a)), "
        "i -> a[i] * b[i])) / "
        "(sqrt(list_sum(list_transform(generate_series(1, len(a)), "
        "i -> a[i] * a[i]))) * "
        "sqrt(list_sum(list_transform(generate_series(1, len(b)), "
        "i -> b[i] * b[i])))))"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
      SELECT (row_number() OVER (
                ORDER BY {md5_long_sql("'pq:' || vec_id")}, vec_id) - 1)::INT
               AS code,
             v AS center
      FROM e QUALIFY code < {k_codes}
    ),
    subs AS (SELECT unnest(generate_series(0, {m - 1})) AS s),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT e.vec_id, subs.s, cb.code,
               row_number() OVER (PARTITION BY e.vec_id, subs.s
                                  ORDER BY {d}, cb.code) AS rn
        FROM e CROSS JOIN cb CROSS JOIN subs
      ) WHERE rn = 1
    ),
    qtable AS (
      SELECT q.vec_id AS query_id, subs.s, cb.code, {qd} AS qd
      FROM e q CROSS JOIN cb CROSS JOIN subs
      WHERE q.vec_id < 5
    ),
    adc AS (
      SELECT t.query_id, c.vec_id,
             round(list_sum(list(t.qd ORDER BY t.s)), 6) AS adc_r
      FROM codes c JOIN qtable t ON t.s = c.s AND t.code = c.code
      WHERE c.vec_id <> t.query_id
      GROUP BY t.query_id, c.vec_id
    ),
    shortlist AS (
      SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_r, vec_id) AS srn
        FROM adc
      ) WHERE srn <= {rerank}
    ),
    reranked AS (
      SELECT s.query_id, s.vec_id, round({cos}, 6) AS cosine_r
      FROM shortlist s
      JOIN e q ON q.vec_id = s.query_id
      JOIN e c ON c.vec_id = s.vec_id,
      LATERAL (SELECT q.v AS a, c.v AS b) ab
    )
    SELECT query_id, vec_id, cosine_r, rank FROM (
      SELECT *, (row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_r DESC, vec_id))::INT
               AS rank
      FROM reranked
    ) WHERE rank <= {k}
    """


@register("embedding_pq_topk", oracle=_pq_topk_oracle(10, 16, 32, 4, 50))
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (IVFADC+re-rank shape): 16 subspaces x 32
    PRF-anchor codes over the 64-dim embeddings, queries = vec_id < 5,
    50-candidate ADC shortlist, exact-cosine re-rank to top-10. The
    oracle replays codebook selection, per-subspace code assignment, the
    query distance table, the ordered ADC fold, the shortlist cut, AND
    the re-rank — the whole compressed index is hash-verified. At 100 TB
    the scan side never touches the raw vectors: 16 small ints per corpus
    row replace 256 bytes of floats; raw floats are fetched only for the
    |Q| x 50 shortlist (the missing compression rung under the exact /
    LSH / IVF paths)."""
    from bigdata_capstone_spark.operators.simsearch import pq_topk_prf

    ensure_utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return pq_topk_prf(
        emb, queries, k=10, dim=64, m=16, k_codes=32, rerank=50
    )


# --------------------------------------------------------------------------
# Tokenizer induction + corpus fingerprint (vocabulary-collapsed counting).
# --------------------------------------------------------------------------

_TOKS_SQL = """
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents
"""


@register(
    "bpe_merge_pairs",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    vocab AS (SELECT w, count(*) AS freq FROM toks GROUP BY w),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                   i -> substring(w, i, 2))) AS pair,
             freq
      FROM vocab WHERE length(w) >= 2
    ),
    agg AS (SELECT pair, sum(freq)::BIGINT AS pair_count
            FROM pairs GROUP BY pair)
    SELECT pair, pair_count,
           (row_number() OVER (ORDER BY pair_count DESC, pair))::INT AS rank
    FROM agg QUALIFY rank <= 40
    """,
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 adjacent-symbol merge candidates — one BPE tokenizer-training
    counting iteration over the document corpus. The corpus collapses to
    its vocabulary before pair explosion, so the expensive stage is
    corpus-size-independent (see `textops.bpe_pair_counts`)."""
    from bigdata_capstone_spark.operators.textops import bpe_pair_counts

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, top_n=40)


@register(
    "corpus_zipf_slope",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL.replace('AS w', 'AS token')}),
    vocab AS (SELECT token, count(*) AS freq FROM toks GROUP BY token),
    ranked AS (
      SELECT token, freq,
             (row_number() OVER (ORDER BY freq DESC, token))::INT AS rank
      FROM vocab QUALIFY rank <= 100
    ),
    micro AS (
      SELECT *, round(log10(rank::DOUBLE) * 1e6)::BIGINT AS lr,
                round(log10(freq::DOUBLE) * 1e6)::BIGINT AS lf
      FROM ranked
    ),
    fit AS (
      SELECT round(
        (count(*) * sum(lr * lf) - sum(lr) * sum(lf))::DOUBLE /
        (count(*) * sum(lr * lr) - sum(lr) * sum(lr))::DOUBLE, 6)
        AS zipf_slope_r
      FROM micro
    )
    SELECT rank, token, freq,
           round(lr / 1e6, 6) AS log10_rank_r,
           round(lf / 1e6, 6) AS log10_freq_r,
           zipf_slope_r
    FROM micro CROSS JOIN fit WHERE rank <= 50
    """,
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency corpus fingerprint: top-50 tokens with log-log
    coordinates and the least-squares slope over the top-100 ranks. The
    regression runs on micro-unit integer logs with exact BIGINT sums, so
    both engines divide the same exact numerator/denominator (see
    `textops.zipf_rank_frequency`)."""
    from bigdata_capstone_spark.operators.textops import zipf_rank_frequency

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return zipf_rank_frequency(docs, top_n=50, fit_n=100)


# --------------------------------------------------------------------------
# Training-export order + mixture dials.
# --------------------------------------------------------------------------

@register(
    "docs_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {md5_long_sql("'7:' || doc_id")} AS h FROM documents
    )
    SELECT doc_id, (h % 8)::INT AS shard,
           (row_number() OVER (PARTITION BY h % 8
                               ORDER BY h, doc_id))::INT AS pos
    FROM h
    """,
)
def docs_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into 8 fixed training
    shards: shard assignment AND within-shard order are PRF functions of
    doc_id (seed 7), so the export replays byte-identically in any engine
    and at any partitioning (see `sampling.shuffle_shards`)."""
    from bigdata_capstone_spark.operators.sampling import shuffle_shards

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, "doc_id", n_shards=8, seed=7).select(
        "doc_id", "shard", "pos"
    )


@register(
    "docs_epoch_mixture",
    oracle=f"""
    WITH sizes AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    nmax AS (SELECT max(n) AS nmax FROM sizes),
    factors AS (
      SELECT lang, sqrt(nmax::DOUBLE / n::DOUBLE) AS f
      FROM sizes CROSS JOIN nmax
    )
    SELECT d.doc_id, d.lang,
           (floor(f) + CASE
              WHEN ({md5_long_sql("'11:' || d.doc_id")} % 1000000)
                   < floor((f - floor(f)) * 1e6)::BIGINT
              THEN 1 ELSE 0 END)::BIGINT AS n_copies,
           round(f, 6) AS repeat_factor_r
    FROM documents d JOIN factors USING (lang)
    """,
)
def docs_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-factor epoch mixture: up-sample every language toward the
    largest one with factor sqrt(n_max/n_lang) — integer copies plus a
    PRF fractional copy (seed 11). The up-sampling complement of
    `docs_temperature_rebalance` (see `sampling.epoch_repeat_factors`)."""
    from bigdata_capstone_spark.operators.sampling import epoch_repeat_factors

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return epoch_repeat_factors(docs, group_col="lang", key_col="doc_id",
                                seed=11)


@register(
    "docs_source_cap",
    oracle="""
    SELECT source, doc_id, n_chars, rn FROM (
      SELECT source, doc_id, n_chars,
             (row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id))::INT AS rn
      FROM documents
    ) WHERE rn <= 15
    """,
)
def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (crawl-domain dominance control): keep at
    most 15 docs per source, preferring the longest (n_chars DESC, doc_id
    tie-break). The standard guard against one domain flooding the
    mixture; a pure per-group top-k — many small groups, no global sort,
    no skew (the cap itself bounds every group)."""
    from bigdata_capstone_spark.operators.relational import grouped_top_k

    ensure_utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return grouped_top_k(
        docs.select("source", "doc_id", "n_chars"),
        ["source"],
        [F.desc("n_chars"), F.col("doc_id")],
        15,
        rank_col="rn",
    ).withColumn("rn", F.col("rn").cast("int"))
