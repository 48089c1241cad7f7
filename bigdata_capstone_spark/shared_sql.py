"""Shared DuckDB oracle SQL fragments used by more than one catalog
module. This module is a LEAF (imports nothing from the catalogs), so
any catalog module can be the process's first package import without
tripping the catalog <-> catalog_train/_etl/_ds initialization cycle
(catalog's tail imports every extension catalog; a decoration-time
from-import of a sibling catalog constant would see a partially
initialized module).
"""

from __future__ import annotations

# The merged-customer snapshot CTE chain shared by
# catalog_etl.customer_balance_merge and the catalog_train
# changelog/reconciliation oracles.
MERGED_CUSTOMER_CTES = """
    purch AS (
      SELECT user_id AS c_custkey,
             sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS delta
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    mx AS (SELECT max(c_custkey) AS mx FROM customer),
    signup AS (
      SELECT mx + 1 + user_id AS c_custkey,
             'NEW#' || (mx + 1 + user_id)::VARCHAR AS c_name,
             (user_id % 25)::INT AS c_nationkey,
             sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS c_acctbal,
             'SIGNUP' AS c_mktsegment
      FROM events CROSS JOIN mx
      WHERE event_type = 'signup' GROUP BY mx, user_id
    ),
    updates AS (
      SELECT p.c_custkey, c.c_name, c.c_nationkey,
             c.c_acctbal + p.delta AS c_acctbal, c.c_mktsegment
      FROM purch p JOIN customer c USING (c_custkey)
      UNION ALL
      SELECT * FROM signup
    ),
    merged AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM updates
      UNION ALL
      SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
             c.c_mktsegment
      FROM customer c
      WHERE c.c_custkey NOT IN (SELECT c_custkey FROM updates)
    )
"""

# The unigram-LM fluency CTE chain (ends in `scored`: doc_id, n_tokens,
# avg_logprob_r) shared by catalog_etl.doc_unigram_logprob and the
# catalog_train curriculum/rank-ensemble oracles, which reuse the same
# Spark plan — a single constant so an edit can't desync them.
UNIGRAM_LP_CTES = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, count(*) AS nf FROM toks GROUP BY tok),
    tot AS (SELECT sum(nf) AS total FROM freq),
    per_tok AS (
      SELECT t.doc_id,
             round(log10(f.nf * 1.0 / tot.total), 6) AS lp
      FROM toks t JOIN freq f ON f.tok = t.tok CROSS JOIN tot
    ),
    scored AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_tokens,
             round(sum(round(lp * 1000000)::BIGINT) * 1.0
                   / count(*))::BIGINT / 1000000.0 AS avg_logprob_r
      FROM per_tok GROUP BY doc_id
    )"""

# The repeated-span anchor CTE chain (positional 8-gram hits merged into
# per-document spans; ends in `spans`: doc_id, dl, island, hits_in_span,
# s, e) shared by catalog_etl.dedup_repeated_spans (span statistics) and
# catalog_etl.dedup_excise_spans (the cleaned-text transform) — both
# replay operators/dedup.py:_merged_hit_spans, so one constant keeps the
# two oracles from desyncing from the Spark plan they share.
REPEATED_SPAN_CTES = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, len(t) AS dl, p.pos AS pos, p.g AS g,
             (('0x' || substr(md5(p.g), 1, 15))::BIGINT) AS gh
      FROM (
        SELECT doc_id, t,
               unnest([struct_pack(pos := i,
                                   g := array_to_string(t[i:i+7], ' '))
                       for i in range(1, len(t) - 6)]) AS p
        FROM toks WHERE len(t) >= 8
      )
    ),
    dfreq AS (SELECT gh FROM grams
              GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
    cand AS (SELECT g.doc_id, g.dl, g.pos, g.gh, g.g
             FROM grams g JOIN dfreq USING (gh)),
    -- byte-verify: a candidate survives only if its ACTUAL gram text
    -- repeats across >= min_docs documents (discards digest collisions)
    verified AS (SELECT gh, g FROM cand
                 GROUP BY gh, g HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT c.doc_id, c.dl, c.pos
             FROM cand c JOIN verified v ON v.gh = c.gh AND v.g = c.g),
    i1 AS (
      SELECT doc_id, dl, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    i2 AS (
      SELECT doc_id, dl, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM i1
    ),
    spans AS (
      SELECT doc_id, dl, island, count(*) AS hits_in_span,
             min(pos) AS s, max(pos) + 7 AS e
      FROM i2 GROUP BY doc_id, dl, island
    )"""

# The events-PSI oracle shared by catalog_ds.event_drift_psi and its
# streaming maintenance twin catalog_etl.streaming_drift_psi.
PSI_EVENTS_ORACLE = """
    WITH b AS (
      SELECT event_type, (ts >= TIMESTAMP '2024-01-16') AS p2,
             least(9, greatest(0, floor(value / 50.0)::INT)) AS bin
      FROM events
    ),
    cont AS (
      SELECT event_type, bin,
             sum(CASE WHEN p2 THEN 0 ELSE 1 END) AS c1,
             sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS c2
      FROM b GROUP BY event_type, bin
    ),
    tot AS (SELECT event_type, sum(c1) AS n1, sum(c2) AS n2
            FROM cont GROUP BY event_type),
    terms AS (
      SELECT c.event_type, t.n1, t.n2,
             round(((c.c2 + 1.0) / (t.n2 + 10)
                    - (c.c1 + 1.0) / (t.n1 + 10))
                   * ln(((c.c2 + 1.0) / (t.n2 + 10))
                        / ((c.c1 + 1.0) / (t.n1 + 10))), 6) AS term
      FROM cont c JOIN tot t USING (event_type)
    )
    SELECT event_type, n1, n2,
           sum(round(term * 1000000)::BIGINT) / 1000000.0 AS psi_r
    FROM terms GROUP BY event_type, n1, n2
    """


# The Naive-Bayes curation-margin CTE chain (nb_-prefixed, NO leading
# WITH so it composes with other fragments; ends in `nb_scored`:
# doc_id, n_tokens, nb_margin_r, pred_curated, is_curated), shared by
# catalog_etl.doc_quality_classifier_nb and the selection-evaluation
# oracles (AUC / calibration / Spearman), which reuse the same Spark
# scoring plan — one constant so an edit cannot desync them.
NB_MARGIN_CTES = """
    nb_lab AS (
      SELECT doc_id, (source IN ('src0', 'src1')) AS is_curated, text
      FROM documents
    ),
    nb_tok AS (
      SELECT doc_id, is_curated,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM nb_lab
    ),
    nb_counts AS (
      SELECT token,
             sum(CASE WHEN is_curated THEN 1 ELSE 0 END) AS c_cur,
             sum(CASE WHEN is_curated THEN 0 ELSE 1 END) AS c_rest
      FROM nb_tok GROUP BY token
    ),
    nb_totals AS (SELECT sum(c_cur) AS n_cur, sum(c_rest) AS n_rest,
                         count(*) AS v
                  FROM nb_counts),
    nb_priors AS (SELECT sum(CASE WHEN is_curated THEN 1 ELSE 0 END)
                           AS d_cur,
                         sum(CASE WHEN is_curated THEN 0 ELSE 1 END)
                           AS d_rest
                  FROM nb_lab),
    nb_llr AS (
      SELECT token,
             round(log10((c_cur + 1.0) / (n_cur + v))
                   - log10((c_rest + 1.0) / (n_rest + v)), 6) AS llr
      FROM nb_counts CROSS JOIN nb_totals
    ),
    nb_sums AS (
      SELECT t.doc_id, t.is_curated, count(*)::BIGINT AS n_tokens,
             sum(round(l.llr * 1000000)::BIGINT) AS m_micro
      FROM nb_tok t JOIN nb_llr l USING (token)
      GROUP BY t.doc_id, t.is_curated
    ),
    nb_scored AS (
      SELECT doc_id, n_tokens,
             (m_micro + round(round(log10(d_cur / (d_rest * 1.0)), 6)
                              * 1000000)::BIGINT) / 1000000.0
               AS nb_margin_r,
             ((m_micro + round(round(log10(d_cur / (d_rest * 1.0)), 6)
                               * 1000000)::BIGINT) / 1000000.0) > 0
               AS pred_curated,
             is_curated
      FROM nb_sums CROSS JOIN nb_priors
    )"""

# The DSIR importance-weight CTE chain (dsir_-prefixed, composable;
# ends in `dsir_scored`: doc_id, n_tokens, dsir_logratio_r, selected),
# shared by catalog_etl.docs_dsir_weights and the selection-evaluation
# oracles (kappa / Spearman).
DSIR_CTES = """
    dsir_tok AS (
      SELECT doc_id, (lang = 'en') AS is_target,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    dsir_b AS (
      SELECT doc_id, is_target,
             (('0x' || substr(md5(token), 1, 15))::BIGINT) % 256 AS bucket
      FROM dsir_tok
    ),
    dsir_bc AS (
      SELECT bucket,
             sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t,
             count(*) AS c_r
      FROM dsir_b GROUP BY bucket
    ),
    dsir_bt AS (SELECT sum(c_t) AS n_t, sum(c_r) AS n_r FROM dsir_bc),
    dsir_lr AS (
      SELECT bucket,
             round(log10((c_t + 1.0) / (n_t + 256.0))
                   - log10((c_r + 1.0) / (n_r + 256.0)), 6) AS lr
      FROM dsir_bc CROSS JOIN dsir_bt
    ),
    dsir_scored AS (
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             sum(round(lr * 1000000)::BIGINT) / 1000000.0
               AS dsir_logratio_r,
             (sum(round(lr * 1000000)::BIGINT) / 1000000.0) > 0
               AS selected
      FROM dsir_b JOIN dsir_lr USING (bucket)
      GROUP BY doc_id
    )"""


# Hybrid BM25 x dense RRF chain (ends in `rrf_ranked`: query_doc,
# doc_id, lex_rk, dense_rk, rrf_r, fused_rk) - shared by the
# hybrid_retrieval_rrf oracle and the rag_serving_pipeline oracle so
# the fusion logic cannot desync.
HYBRID_RRF_CTES = """
    toks AS (
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
      SELECT query_doc, doc_id,
             sum(round(s * 1000000)::BIGINT) / 1000000.0 AS bm25_r
      FROM scored GROUP BY query_doc, doc_id
    ),
    lex AS (
      SELECT query_doc, doc_id, rk FROM (
        SELECT pp.*, (row_number() OVER (
                 PARTITION BY query_doc ORDER BY bm25_r DESC, doc_id))::INT
                 AS rk
        FROM pp
      ) WHERE rk <= 20
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id < 5),
    dscored AS (
      SELECT q.qid AS query_doc, c.vec_id AS doc_id,
             round(
               list_sum(list_transform(generate_series(1, len(q.qv)),
                        i -> q.qv[i]::DOUBLE * c.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
                        i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(
                        generate_series(1, len(c.embedding)),
                        i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))),
               6) AS cosine_r
      FROM q CROSS JOIN embeddings c
      WHERE q.qid <> c.vec_id
    ),
    dense AS (
      SELECT query_doc, doc_id, rk FROM (
        SELECT *, (row_number() OVER (PARTITION BY query_doc
                     ORDER BY cosine_r DESC, doc_id))::INT AS rk
        FROM dscored
      ) WHERE rk <= 20
    ),
    fused AS (
      SELECT coalesce(l.query_doc, d.query_doc) AS query_doc,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             coalesce(l.rk, 0)::INT AS lex_rk,
             coalesce(d.rk, 0)::INT AS dense_rk,
             round(coalesce(1.0 / (l.rk + 60), 0.0)
                   + coalesce(1.0 / (d.rk + 60), 0.0), 6) AS rrf_r
      FROM lex l FULL OUTER JOIN dense d
        ON l.query_doc = d.query_doc AND l.doc_id = d.doc_id
    ),
    rrf_ranked AS (
      SELECT *, (row_number() OVER (PARTITION BY query_doc
                   ORDER BY rrf_r DESC, doc_id))::INT AS fused_rk
      FROM fused
    )
"""
