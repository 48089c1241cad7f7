"""Deduplication suite for LLM-data pipelines (north star; BASELINE.json).

Five dedup families over ``documents``, each designed for the 100 TB path:

- :func:`exact_dedup` — md5(text) hash-groupBy; one shuffle on a short key.
- :func:`minhash_signatures` + :func:`lsh_candidate_pairs` — MinHash + LSH
  banding: shingle → n_perm min-hashes → band buckets → equi-join. The
  shuffle is on band keys, never on document pairs; candidate verification
  joins only within buckets.
- :func:`simhash_signatures` — 60-bit SimHash (per-bit majority vote of
  token hashes); equal-signature grouping or small-radius probing.
- :func:`ngram_jaccard_pairs` — exact word-n-gram Jaccard via co-occurrence
  join (the brute-force oracle for the approximate families).
- embedding cosine near-dup lives in :mod:`.simsearch` (same machinery as
  similarity search).

Hash portability: every hash is md5-derived (functions.portable) so DuckDB
oracles reproduce values bit-for-bit. At raw-throughput scale you'd swap
``xxhash64`` in via ``hash_expr`` — the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_capstone_spark.functions.portable import md5_long, perm_md5_long
from bigdata_capstone_spark.operators.relational import fan_out  # noqa: F401
from bigdata_capstone_spark.operators.textops import tokens_col


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: (keep_id = min id, text_hash, n_copies)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles_col(tok_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles over a MATERIALIZED token-array column.

    Takes the token array (not raw text) deliberately: if the ``split()``
    expression itself appears inside the per-element ``transform`` lambda,
    codegen re-tokenizes the document once per shingle — measured 40× slower
    at sf0.1 (18s → 0.3s). Callers materialize tokens in their own
    projection (:func:`tokenized`) and pass the attribute.

    Guarded for short texts: Spark's ``sequence(1, 0)`` would generate a
    *descending* [1, 0] rather than an empty range, so documents with fewer
    than n tokens explicitly yield an empty shingle set.
    """
    t = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(n)]
    )
    return F.when(F.size(t) >= n, F.array_distinct(
        F.transform(idx, gram)
    )).otherwise(F.array().cast("array<string>"))


def tokenized(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    tok_col: str = "toks",
) -> DataFrame:
    """(id, tok_col) projection with the token array materialized as its own
    attribute, so downstream per-element lambdas don't re-run the split."""
    return df.select(F.col(id_col), tokens_col(text_col).alias(tok_col))


def exploded_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """One (id, sh) row per distinct word n-gram shingle per document."""
    toks = tokenized(fan_out(df), text_col, id_col)
    return toks.select(
        F.col(id_col), F.explode(shingles_col("toks", shingle_n)).alias("sh")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, h0..h{n_perm-1}) MinHash signature over word shingles.

    One explode + one groupBy(id) with n_perm ``min`` aggregates — a single
    shuffle keyed by document id; partial aggregation keeps the map-side
    state at n_perm longs per doc.
    """
    exploded = exploded_shingles(df, text_col, id_col, shingle_n)
    return _signatures_from_shingles(exploded, id_col, n_perm)


def _signatures_from_shingles(
    sh: DataFrame, id_col: str, n_perm: int
) -> DataFrame:
    """Signature aggregation over an already-exploded (id, sh) frame."""
    return sh.groupBy(id_col).agg(
        *[
            F.min(perm_md5_long(F.col("sh"), p)).alias(f"h{p}")
            for p in range(n_perm)
        ]
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` groups of
    ``n_perm/bands`` rows; docs sharing any band bucket become a candidate
    pair (idA < idB, dedup'd across bands).

    Scale shape: explode to (band, bucket_key) — |docs|·bands rows — then a
    groupBy-join on the bucket key. Hot buckets (boilerplate docs, empty
    documents) are the quadratic blow-up risk: ``max_bucket_size`` drops
    buckets above the cap BEFORE the pair join, bounding the join fan-out
    at cap² per bucket. The cap is computed as a ``groupBy(bucket).count``
    + semi-join back — NOT a ``count(*) OVER (PARTITION BY bucket)``
    window, which would funnel every row of the hottest bucket into a
    single window task (the exact straggler the cap exists to defuse);
    the groupBy partial-aggregates map-side, so the hot key arrives at
    the reducer as a handful of partial counts, and the semi-join shares
    the bucket-key shuffle the pair join needs anyway. Documents in an
    over-full bucket still pair through their other bands; at high
    duplication rates a cap trades a little recall for quadratic cost,
    which is the standard production dial (the exact top-of-cluster pairs
    are recovered by the connected-components closure as long as SOME
    chain of capped buckets links them).
    """
    buckets = _band_buckets(sigs, n_perm, bands, id_col)
    if max_bucket_size is not None:
        small = (
            buckets.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__bucket_n"))
            .filter(F.col("__bucket_n") <= max_bucket_size)
            .select("bucket")
        )
        buckets = buckets.join(small, on="bucket", how="left_semi")
    a = buckets.select(F.col(id_col).alias("idA"), "bucket")
    b = buckets.select(F.col(id_col).alias("idB"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("idA") < F.col("idB"))
        .select("idA", "idB")
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline with exact verification: candidates
    from banding, then true shingle-Jaccard computed only for candidates
    (the verify join is bucket-local, never all-pairs).

    ``max_bucket_size`` (default 2000) is the hot-bucket cap threaded into
    :func:`lsh_candidate_pairs` — ON by default because this is the
    production entry point and an uncapped banding join is the documented
    quadratic risk at 100 TB (a boilerplate storm puts millions of docs in
    one bucket → cap² = bounded ~4M pairs instead of 10¹²). Pass ``None``
    to disable when the corpus is known clean.

    The exploded shingle frame feeds three consumers (signatures, sizes,
    the verify join's two sides) — it is cached (memory-and-disk, spills
    at scale) so tokenize/shingle/hash runs ONCE, not per branch
    (profiled at sf0.1: 398s uncached → ~20s cached).

    Measured dead end (round 4, n=5 at sf0.1): semi-joining the shingle
    frame down to candidate doc ids before the verify join — the
    "obvious" shuffle-volume cut — ran 4.4s steady vs 2.9s for this
    shape, because materializing candidates as a barrier stage costs
    more than the verify join's candidate-key-filtered shuffles save
    (the cands⋈a broadcast already prunes the probe side; only the
    b-side shingle shuffle is corpus-wide, and it overlaps other
    stages). Revisit only if profiling a REAL corpus shows the b-side
    shuffle dominating."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n).cache()
    sigs = _signatures_from_shingles(sh, id_col, n_perm)
    cands = lsh_candidate_pairs(sigs, n_perm, bands, id_col, max_bucket_size)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.join(sizes, on=id_col).select(
        F.col(id_col).alias("idA"), F.col("sh"), F.col("n").alias("nA")
    )
    b = sh.join(sizes, on=id_col).select(
        F.col(id_col).alias("idB"), F.col("sh"), F.col("n").alias("nB")
    )
    common = (
        cands.join(a, on="idA")
        .join(b, on=["idB", "sh"])
        .groupBy("idA", "idB", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return common.select(
        "idA",
        "idB",
        (F.col("common") / (F.col("nA") + F.col("nB") - F.col("common"))).alias(
            "jaccard"
        ),
    ).filter(F.col("jaccard") >= min_jaccard)


def _band_buckets(
    sigs: DataFrame, n_perm: int, bands: int, id_col: str
) -> DataFrame:
    """(id, bucket) rows: md5-derived bucket key per signature band."""
    rows = n_perm // bands
    band_keys = [
        md5_long(
            F.concat_ws(
                ":",
                F.lit(str(b)),
                *[F.col(f"h{b * rows + r}").cast("string") for r in range(rows)],
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    keyed = sigs.select(F.col(id_col), *band_keys)
    return keyed.select(
        id_col,
        F.explode(
            F.array(*[F.col(f"band{b}") for b in range(bands)])
        ).alias("bucket"),
    )


def cross_corpus_near_dup_pairs(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """MinHash-LSH near-dup join BETWEEN two corpora — the decontamination
    scale path: drop training documents that near-duplicate a held-out
    reference/eval set (``benchmark_contamination`` is the exact-8-gram
    twin; this catches paraphrase-level overlap the exact scan misses).

    Same banding/verify machinery as :func:`minhash_near_dup_pairs`, but
    the bucket join is corpus × reference (never corpus × corpus), so the
    fan-out is bounded by the reference side — usually tiny next to the
    training corpus. The hot-bucket cap counts BOTH sides' members per
    bucket (an empty-doc bucket is hot regardless of which side fills it).

    Returns (corpus_id, ref_id, jaccard) for verified pairs ≥ threshold.
    """
    sh_c = exploded_shingles(corpus, text_col, id_col, shingle_n).cache()
    sh_r = exploded_shingles(reference, text_col, id_col, shingle_n).cache()
    bk_c = _band_buckets(
        _signatures_from_shingles(sh_c, id_col, n_perm), n_perm, bands, id_col
    )
    bk_r = _band_buckets(
        _signatures_from_shingles(sh_r, id_col, n_perm), n_perm, bands, id_col
    )
    if max_bucket_size is not None:
        small = (
            bk_c.unionByName(bk_r)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__bucket_n"))
            .filter(F.col("__bucket_n") <= max_bucket_size)
            .select("bucket")
        )
        bk_c = bk_c.join(small, on="bucket", how="left_semi")
        bk_r = bk_r.join(small, on="bucket", how="left_semi")
    cands = (
        bk_c.select(F.col(id_col).alias("corpus_id"), "bucket")
        .join(bk_r.select(F.col(id_col).alias("ref_id"), "bucket"), on="bucket")
        .select("corpus_id", "ref_id")
        .distinct()
    )
    size_c = sh_c.groupBy(id_col).agg(F.count(F.lit(1)).alias("nA"))
    size_r = sh_r.groupBy(id_col).agg(F.count(F.lit(1)).alias("nB"))
    a = sh_c.join(size_c, on=id_col).select(
        F.col(id_col).alias("corpus_id"), "sh", "nA"
    )
    b = sh_r.join(size_r, on=id_col).select(
        F.col(id_col).alias("ref_id"), "sh", "nB"
    )
    common = (
        cands.join(a, on="corpus_id")
        .join(b, on=["ref_id", "sh"])
        .groupBy("corpus_id", "ref_id", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return common.select(
        "corpus_id",
        "ref_id",
        (
            F.col("common") / (F.col("nA") + F.col("nB") - F.col("common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


def near_dup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The PERSISTED MinHash-LSH index of a corpus — built once, then
    arriving batches dedup against it WITHOUT re-banding history
    (:func:`incremental_near_dup_pairs`). Returns three relations, each
    of which a production pipeline writes as a bucketed table:

    - ``buckets`` (id, bucket): band buckets for candidate generation;
    - ``shingles`` (id, sh): shingle digests for the exact-Jaccard
      verify step;
    - ``sizes`` (id, n): per-doc distinct-shingle counts (the Jaccard
      denominator), persisted so the verify never re-aggregates the
      corpus.

    This closes the last un-incremental index family: exact-dup
    digests, BM25 df, PQ, and IVF-PQ already have O(batch) maintenance
    twins; near-dup now does too.
    """
    sh = exploded_shingles(df, text_col, id_col, shingle_n)
    bk = _band_buckets(
        _signatures_from_shingles(sh, id_col, n_perm), n_perm, bands, id_col
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return bk, sh, sizes


def apply_near_dup_index_delta(
    corpus_index: tuple[DataFrame, DataFrame, DataFrame],
    batch: DataFrame,
    removed_ids: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """O(delta) maintenance of the persisted near-dup index under a
    re-crawl: drop the index rows of ``removed_ids`` (removed docs plus
    changed docs' OLD versions), append freshly-computed rows for
    ``batch`` (added docs plus changed docs' NEW text). The group law
    the other incremental twins obey (BM25 df, PQ, IVF-PQ):

        apply(index(v1), delta(v1→v2)) == index(v2), relation by
        relation, exactly — shingling/minhash/banding (the expensive
        work) runs over the DELTA only.

    The removal is an anti-join keyed on doc id over each persisted
    relation; with the index tables partitioned/bucketed by id (how
    :func:`near_dup_index` says to persist them) that is lakehouse
    MERGE shape — only touched partitions rewrite, history is never
    re-shingled. Compose upstream with reconcile.snapshot_diff: its
    'removed'+'changed' ids are ``removed_ids``, its 'added'+'changed'
    (new text) set is ``batch``.
    """
    bk, sh, sz = corpus_index
    rm = removed_ids.select(id_col).distinct()

    def keep(df: DataFrame) -> DataFrame:
        return df.join(rm, on=id_col, how="left_anti")

    b_bk, b_sh, b_sz = near_dup_index(
        batch, text_col, id_col, n_perm, bands, shingle_n
    )
    return (
        keep(bk).unionByName(b_bk),
        keep(sh).unionByName(b_sh),
        keep(sz).unionByName(b_sz),
    )


def incremental_near_dup_pairs(
    corpus_index: tuple[DataFrame, DataFrame, DataFrame],
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Near-dup pairs between an ARRIVING batch and an EXISTING corpus
    LSH index (:func:`near_dup_index`) — the O(batch) incremental twin
    of :func:`cross_corpus_near_dup_pairs`: only the batch is shingled,
    minhashed, and banded at arrival; the corpus contributes its three
    persisted relations untouched. Compose with the re-crawl diff
    (reconcile.snapshot_diff): its added/changed set IS the batch.

    Hot-bucket cap semantics differ deliberately from the cross-corpus
    join: the cap counts CORPUS-side members only, because (a) cap
    decisions must be a stable property of the persisted index, not of
    how arrivals happen to be batched, and (b) that is what makes the
    result BATCH-SPLIT INDEPENDENT — pairs(b1 ∪ b2) == pairs(b1) ∪
    pairs(b2) exactly, the invariant the incremental contract needs
    (combined-count capping would flip bucket verdicts with batch
    size). Per-batch fan-out stays bounded: each batch doc meets at
    most ``max_bucket_size`` corpus members per band bucket.

    Within-batch duplicates are out of scope here (run
    :func:`minhash_near_dup_pairs` on the batch itself — it is
    batch-sized); this operator answers "which arriving docs duplicate
    the EXISTING corpus".

    Scale shape: candidate generation is batch-buckets ⋈ index-buckets
    (hash join keyed on the bucket digest; probe side is batch-scale);
    the verify joins batch shingles against the persisted corpus
    shingle table keyed (id, sh) — at 100 TB that table is bucketed by
    id so the join co-locates, and the probe volume is candidate-pair ×
    shingle, never corpus².

    Returns (batch_id, corpus_id, jaccard) for verified pairs ≥
    threshold.
    """
    corpus_buckets, corpus_shingles, corpus_sizes = corpus_index
    sh_b = exploded_shingles(batch, text_col, id_col, shingle_n).cache()
    bk_b = _band_buckets(
        _signatures_from_shingles(sh_b, id_col, n_perm), n_perm, bands, id_col
    )
    cb = corpus_buckets
    if max_bucket_size is not None:
        small = (
            corpus_buckets.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__bucket_n"))
            .filter(F.col("__bucket_n") <= max_bucket_size)
            .select("bucket")
        )
        cb = corpus_buckets.join(small, on="bucket", how="left_semi")
    cands = (
        bk_b.select(F.col(id_col).alias("batch_id"), "bucket")
        .join(
            cb.select(F.col(id_col).alias("corpus_id"), "bucket"),
            on="bucket",
        )
        .select("batch_id", "corpus_id")
        .distinct()
    )
    size_b = sh_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("nA"))
    a = sh_b.join(size_b, on=id_col).select(
        F.col(id_col).alias("batch_id"), "sh", "nA"
    )
    b = corpus_shingles.join(corpus_sizes, on=id_col).select(
        F.col(id_col).alias("corpus_id"), "sh", F.col("n").alias("nB")
    )
    common = (
        cands.join(a, on="batch_id")
        .join(b, on=["corpus_id", "sh"])
        .groupBy("batch_id", "corpus_id", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return common.select(
        "batch_id",
        "corpus_id",
        (
            F.col("common") / (F.col("nA") + F.col("nB") - F.col("common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 60,
) -> DataFrame:
    """SimHash: bit j of the signature is the majority vote of bit j across
    the document's token hashes. 60 bits so the value stays a positive
    signed 64-bit long in both Spark and DuckDB.

    Bit j of a token = bit (j mod 4) of hex digit j//4 of md5(token). The
    oracle states that as per-bit string ops; Spark-side we fold the first
    15 hex chars into ONE 60-bit long (``conv``) and extract bits with
    shift/mask — mathematically identical (hex char i is the nibble at
    bits (14-i)·4, little-endian within the nibble), and one conv per
    token instead of 60 substring/instr calls (profiled 4× faster on the
    signature job). One explode + one groupBy(id) with 60 conditional-sum
    aggregates (map-side combined).
    """
    if n_bits > 60:
        raise ValueError("n_bits > 60 exceeds the 15-hex-char fold")
    df = fan_out(df)
    toks = F.array_distinct(tokens_col(text_col))
    exploded = df.select(F.col(id_col), F.explode(toks).alias("tok")).select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast("long")
        .alias("m"),
    )
    bit = lambda j: F.shiftright(  # noqa: E731
        F.col("m"), (14 - j // 4) * 4 + (j % 4)
    ).bitwiseAND(F.lit(1))
    votes = exploded.groupBy(id_col).agg(
        *[F.sum(bit(j) * 2 - 1).alias(f"v{j}") for j in range(n_bits)]
    )
    sig = None
    for j in range(n_bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over all co-occurring pairs — the brute-force
    oracle for the approximate dedup families. Co-occurrence join on the
    shingle: quadratic only within identical shingles. The exploded shingle
    frame is cached — it feeds sizes and both join sides (3 consumers), and
    recomputing the tokenize/shingle expression per branch is ~70× slower
    than the cached join (profiled at sf0.1)."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    withn = sh.join(sizes, on=id_col)
    a = withn.select(F.col(id_col).alias("idA"), "sh", F.col("n").alias("nA"))
    b = withn.select(F.col(id_col).alias("idB"), "sh", F.col("n").alias("nB"))
    common = (
        a.join(b, on="sh")
        .filter(F.col("idA") < F.col("idB"))
        .groupBy("idA", "idB", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return common.select(
        "idA",
        "idB",
        (F.col("common") / (F.col("nA") + F.col("nB") - F.col("common"))).alias(
            "jaccard"
        ),
    ).filter(F.col("jaccard") >= min_jaccard)


def connected_components(
    edges: DataFrame,
    a_col: str = "idA",
    b_col: str = "idB",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list — the transitive
    closure that turns pairwise near-dup hits into dedup CLUSTERS (a
    near-dups b, b near-dups c ⇒ {a,b,c} share one canonical id).

    Algorithm: iterative min-label propagation ("hash-to-min" style, the
    standard MapReduce/Spark formulation — see e.g. the large-star/
    small-star family, Kiveris et al., "Connected Components in MapReduce
    and Beyond"): every node starts labeled with its own id; each round
    every node adopts the minimum label in its neighborhood, then takes a
    POINTER-JUMP shortcut (the label of its label), which squares the
    propagation distance per round — convergence in O(log diameter)
    rounds instead of O(diameter). Dense near-dup cliques converge in
    2-3 rounds either way; the jump is what keeps long CHAIN components
    (e.g. embedding-space graphs near the similarity threshold, where a
    1000-node path is realistic) inside the iteration budget — a
    plain-propagation run at sf0.1 left exactly such a component
    unconverged at 20 rounds, caught by the 10x oracle gate.

    Scale shape per round: one join (labels ⋈ edges) + one groupBy(min) —
    both shuffle on node id, and AQE handles the skew of giant
    components. Labels are checkpoint-truncated every round so the
    lineage does not grow with iterations (the classic
    iterative-algorithm failure on Spark).

    ``checkpoint_dir`` selects the truncation mechanism. Default None
    uses ``localCheckpoint`` — fine for local mode, but its blocks live
    on executor storage, so ONE lost executor aborts the whole query
    instead of recomputing (observed in round 5 as a TorrentBroadcast
    store failure killing ``dedup_keep_best`` under contention). On a
    real cluster with preemption, pass a reliable directory (HDFS/S3):
    the per-round frames then use reliable ``checkpoint()`` — lineage
    truncation survives executor loss at the price of a distributed-FS
    write per round (labels are (node, component) rows — tiny relative
    to the edge list). The mechanism is the shared
    :func:`operators.ckpt.lineage_truncation` context manager, which
    saves and restores the session's prior checkpoint dir
    (``setCheckpointDir`` is session-global state — see ckpt.py for the
    concurrency caveat).

    Returns (node, component) with component = min node id in the
    component. Not SQL-expressible without recursive CTEs → rows-only
    oracle; correctness is asserted against a union-find in tests.
    """
    from bigdata_capstone_spark.operators.ckpt import lineage_truncation

    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    comp_type = dict(labels.dtypes)["component"]
    with lineage_truncation(edges.sparkSession, checkpoint_dir) as _ckpt:
        sym = _ckpt(sym)
        for _ in range(max_iter):
            # candidate labels flowing along edges: neighbor's current label
            neighbor_labels = (
                sym.join(labels, on=F.col("dst") == F.col("node"))
                .select(F.col("src").alias("node"), "component")
            )
            # Fold the convergence signal INTO the label aggregate: the self
            # row carries its current label as `old` (max() ignores the nulls
            # on neighbor rows), so after the groupBy each node knows both its
            # new and previous label. The changed-check is then a narrow scan
            # of the just-checkpointed partitions with a limit-1 early exit —
            # no second join job per round (previously: labels⋈new_labels +
            # count, a full extra shuffle per iteration).
            merged = labels.select(
                "node", "component", F.col("component").alias("old")
            ).unionByName(
                neighbor_labels.withColumn("old", F.lit(None).cast(comp_type))
            )
            propagated = merged.groupBy("node").agg(
                F.min("component").alias("component"),
                F.max("old").alias("old"),
            )
            # pointer jump: follow my label to ITS label (labels are node ids,
            # so the lookup table is `propagated` itself keyed by node). The
            # left join misses only when my label is already a component root
            # whose own row carries the same id — coalesce keeps it.
            lut = propagated.select(
                F.col("node").alias("component"),
                F.col("component").alias("component2"),
            )
            new_labels = (
                propagated.join(lut, on="component", how="left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("component2"), F.col("component")),
                    ).alias("component"),
                    "old",
                )
            )
            new_labels = _ckpt(new_labels)
            changed = (
                new_labels.filter(F.col("component") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = new_labels.drop("old")
            if changed == 0:
                break
    return labels


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
    max_iter: int = 20,
    max_bucket_size: int | None = 2000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup clusters: minhash-LSH pairs → connected components →
    (doc_id, cluster_id, cluster_size). Docs with no near-dup partner get
    their own singleton cluster. ``cluster_id`` is the minimum doc_id in
    the cluster — the canonical "keep" representative.

    ``max_bucket_size`` is the hot-bucket cap (ON by default, see
    :func:`minhash_near_dup_pairs`); the component closure recovers
    top-of-cluster links a capped bucket drops, as long as some chain of
    under-cap buckets connects them. ``checkpoint_dir`` enables reliable
    checkpointing in the iterative closure (see
    :func:`connected_components`) — set it on clusters with preemption."""
    pairs = minhash_near_dup_pairs(
        df, text_col, id_col, n_perm, bands, shingle_n, min_jaccard,
        max_bucket_size,
    )
    comp = connected_components(
        pairs.select("idA", "idB"), "idA", "idB", max_iter,
        checkpoint_dir=checkpoint_dir,
    )
    all_docs = df.select(F.col(id_col))
    labeled = all_docs.join(
        comp.withColumnRenamed("node", id_col), on=id_col, how="left"
    ).select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, on="cluster_id").select(
        id_col, "cluster_id", "cluster_size"
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental ingest dedup: drop new docs whose text hash is already
    in the seen-corpus hash table, then dedup within the batch (keep min
    id). Returns the surviving (id, text_hash) rows — the production
    shape where yesterday's corpus is a hash TABLE (narrow, bucketable),
    never the documents themselves. Anti-join on the 32-char digest: the
    shuffle carries hashes, not bodies; at 100 TB the seen-table is
    bucketed by hash so the anti-join is co-located."""
    hashed = new_docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_hash")
    )
    fresh = hashed.join(
        seen_hashes.select("text_hash"), on="text_hash", how="left_anti"
    )
    return (
        fresh.groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "text_hash")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 60,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius, without all-pairs:
    pigeonhole banding — split the ``n_bits`` signature into
    ``max_hamming + 1`` bands; two signatures within distance d must agree
    EXACTLY on at least one band, so candidates come from equi-joins on
    band values and only candidates pay the popcount verify
    (``bit_count(xor)``). The standard Manku/Jain/Das Sarma web-dedup
    shape: |docs|·bands bucket rows, never |docs|².
    """
    # the signature frame feeds bands consumers + both verify sides —
    # cache it or the 60-aggregate signature job runs (bands + 2) times
    sigs = simhash_signatures(df, text_col, id_col, n_bits).cache()
    return hamming_band_pairs(sigs, id_col, "simhash", n_bits, max_hamming)


def hamming_band_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    n_bits: int,
    max_hamming: int,
) -> DataFrame:
    """Generic pigeonhole-banded Hamming join over a precomputed bit
    signature column (SimHash, image dHash, any fixed-width sketch):
    split ``n_bits`` into ``max_hamming + 1`` bands; two signatures
    within distance d agree exactly on >= 1 band, so candidates come
    from equi-joins on band values and only candidates pay the popcount
    verify. Returns (idA, idB, hamming), idA < idB. The caller should
    cache ``sigs`` when its construction is expensive (it feeds bands
    bucket projections + both verify sides)."""
    bands = max_hamming + 1
    width = n_bits // bands
    if width * bands != n_bits:
        raise ValueError(f"n_bits={n_bits} not divisible into {bands} bands")
    mask = (1 << width) - 1
    parts = [
        sigs.select(
            F.col(id_col),
            F.lit(b).alias("band"),
            F.shiftright(F.col(sig_col), b * width).bitwiseAND(
                F.lit(mask)
            ).alias("key"),
        )
        for b in range(bands)
    ]
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    a = buckets.select(F.col(id_col).alias("idA"), "band", "key")
    b = buckets.select(F.col(id_col).alias("idB"), "band", "key")
    cands = (
        a.join(b, on=["band", "key"])
        .filter(F.col("idA") < F.col("idB"))
        .select("idA", "idB")
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("idA"), F.col(sig_col).alias("sA"))
    sb = sigs.select(F.col(id_col).alias("idB"), F.col(sig_col).alias("sB"))
    return (
        cands.join(sa, on="idA")
        .join(sb, on="idB")
        .select(
            "idA",
            "idB",
            F.expr("bit_count(sA ^ sB)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def boilerplate_shingle_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_docs: int = 3,
) -> DataFrame:
    """Per-document boilerplate exposure: the fraction of a doc's distinct
    word ``shingle_n``-gram shingles that also appear in at least
    ``min_docs`` documents corpus-wide — the C4/RefinedWeb-style signal
    for template/boilerplate text (headers, footers, licence blurbs) that
    survives exact AND near-dup dedup because the surrounding document
    differs. High-fraction docs are candidates for span-level cleaning or
    down-weighting in the curation mix.

    Returns (id, n_shingles, n_common, common_frac). Scale shape: the
    shuffle carries 60-bit md5 shingle hashes, never shingle text (same
    digest-only discipline as the MinHash family); doc-frequency is one
    map-side-combined groupBy over the hashed frame; the frame feeds both
    the frequency count and the join back, so it is cached (the same
    two-consumer rationale as minhash_near_dup_pairs' shingle cache).
    Docs with fewer than ``shingle_n`` tokens have no shingles and are
    absent from the output (they carry no boilerplate signal).
    """
    sh = (
        exploded_shingles(df, text_col, id_col, shingle_n)
        .select(F.col(id_col), md5_long(F.col("sh")).alias("shh"))
        .cache()
    )
    # exploded_shingles is distinct-per-doc, so count(*) per hash IS the
    # document frequency
    dfreq = sh.groupBy("shh").agg(F.count(F.lit(1)).alias("dfc"))
    return (
        sh.join(dfreq, on="shh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("dfc") >= min_docs, 1).otherwise(0)
            ).alias("n_common"),
        )
        .withColumn(
            "common_frac",
            F.round(F.col("n_common") / F.col("n_shingles"), 6),
        )
    )


def _merged_hit_spans(
    toks: DataFrame,
    id_col: str,
    k: int,
    min_docs: int,
    gram_digest=None,
) -> DataFrame:
    """Merged repeated-k-gram hit spans over a materialized (id, toks)
    frame: every POSITIONAL k-gram (not distinct — positions are the
    point) is hashed; a k-gram whose hash occurs in >= ``min_docs``
    distinct documents is a CANDIDATE hit; candidates are then
    BYTE-VERIFIED — the actual gram text is re-derived from the token
    frame and a candidate survives only if ITS OWN text occurs in >=
    ``min_docs`` distinct documents, so a digest collision (two
    different grams sharing a 60-bit hash) can no longer plant a false
    span — the false-positive window Lee et al.'s suffix-array method
    never had is now closed here too. Overlapping/abutting verified
    hits (position gap <= k) merge into spans. Returns one row per
    merged span: (id, dl, island, hits_in_span, span_start, span_end)
    with 1-based inclusive token positions. Shared core of
    :func:`repeated_span_stats` (statistics) and
    :func:`excise_repeated_spans` (the cleaned-text transform).

    ``gram_digest`` (default md5_long) is injectable so tests can force
    collisions with a degenerate digest and prove the verify join
    discards them — real md5-60bit collisions cannot be synthesized.

    Scale shape: one explode pass (n_tokens rows/doc); the cross-doc
    frequency table is digest-only (60-bit gram hashes, never gram
    text) and map-side combines; gram TEXT moves only for the candidate
    hit set (re-sliced from the cached token frame — bounded by real
    repeats plus collisions, never corpus-sized); the span merge
    windows are PARTITIONED BY doc (bounded by doc length, never
    global). ``toks`` must be cached by the caller — it feeds both the
    gram explode and the verify re-slice.
    """
    digest = gram_digest if gram_digest is not None else md5_long
    grams = (
        toks.filter(F.size("toks") >= k).select(
            F.col(id_col),
            F.size("toks").alias("dl"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, k)),
                )
            ).alias("pos0", "gram"),
        )
        .select(
            F.col(id_col),
            "dl",
            (F.col("pos0") + 1).alias("pos"),
            digest(F.col("gram")).alias("gh"),
        )
        .cache()
    )
    dfreq = grams.groupBy("gh").agg(
        F.countDistinct(id_col).alias("dfc")
    )
    cand = grams.join(
        dfreq.filter(F.col("dfc") >= min_docs).select("gh"), "gh"
    )
    # byte-verify: re-slice each candidate's actual gram text and require
    # min_docs distinct documents of THAT text (identical slice/concat
    # expression as construction, so equal text <=> equal bytes)
    cand_txt = cand.join(toks, on=id_col).select(
        id_col,
        "dl",
        "pos",
        "gh",
        F.concat_ws(" ", F.slice("toks", F.col("pos"), k)).alias("gram"),
    )
    verified = (
        cand_txt.groupBy("gh", "gram")
        .agg(F.countDistinct(id_col).alias("vdf"))
        .filter(F.col("vdf") >= min_docs)
        .select("gh", "gram")
    )
    hits = cand_txt.join(
        verified, on=["gh", "gram"], how="left_semi"
    ).select(id_col, "dl", "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        hits.withColumn(
            "brk",
            F.when(
                F.col("pos") - F.lag("pos").over(w) > k, 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(id_col, "dl", "island")
        .agg(
            F.count(F.lit(1)).alias("hits_in_span"),
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
        )
    )


def repeated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-substring span statistics via positional
    k-gram anchors — the scalable approximation of exact-substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better": any repeated substring of >= k tokens necessarily contains
    a repeated token k-gram, so k-gram anchors find every long repeat).

    Returns per-doc (doc_id, n_hits, n_spans, covered_tokens,
    covered_frac) — the doc-level filtering signal; the transform that
    actually removes the spans is :func:`excise_repeated_spans`. Docs
    shorter than k tokens have no k-grams and are absent by design.
    Scale shape: see :func:`_merged_hit_spans`.
    """
    # cached: feeds the gram explode AND the verify re-slice
    toks = tokenized(fan_out(df), text_col, id_col).cache()
    spans = _merged_hit_spans(toks, id_col, k, min_docs)
    return (
        spans.groupBy(id_col, "dl")
        .agg(
            F.sum("hits_in_span").cast("long").alias("n_hits"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.col("span_end") - F.col("span_start") + 1
            ).cast("long").alias("covered_tokens"),
        )
        .select(
            id_col,
            "n_hits",
            "n_spans",
            "covered_tokens",
            F.round(F.col("covered_tokens") / F.col("dl"), 6).alias(
                "covered_frac"
            ),
        )
    )


def excise_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Span EXCISION — emit every document with its cross-document
    repeated spans removed: the consumable output of exact-substring
    dedup (Lee et al.), where :func:`repeated_span_stats` only reports
    coverage. A token is excised iff its 1-based position falls inside
    any merged hit span; the cleaned text is the surviving tokens
    rejoined with single spaces (tokenization is whitespace-split +
    lowercase, so this is the canonical whitespace form — the same
    convention every downstream tokenize pass in this package applies).

    Returns one row per input document (including docs with nothing to
    excise and docs excised to emptiness):
    (doc_id, n_tokens, kept_tokens, excised_tokens, clean_hash) with
    ``clean_hash`` = md5 of the cleaned text, so an oracle can verify
    the actual emitted bytes, not just the counts (the
    ``doc_pii_scrub`` scrubbed-bytes pattern).

    Scale shape: span discovery is :func:`_merged_hit_spans` (digest-only
    shuffles, per-doc windows); the excision itself is a LEFT join of the
    token frame against the per-doc span list (spans are merged and
    disjoint, so the list is bounded by dl/k entries) followed by a pure
    per-row higher-order filter — no explode of token positions, no
    Python. The token frame is cached for its two consumers (span
    discovery, excision join).
    """
    toks = tokenized(fan_out(df), text_col, id_col).cache()
    spans = _merged_hit_spans(toks, id_col, k, min_docs)
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                F.col("span_end").alias("e"),
            )
        ).alias("sp")
    )
    joined = toks.join(sp, on=id_col, how="left")
    # Spark higher-order-function indices are 0-based; span positions are
    # 1-based (matching the oracle's DuckDB list semantics) — hence i + 1.
    kept = F.when(F.col("sp").isNull(), F.col("toks")).otherwise(
        F.filter(
            "toks",
            lambda x, i: ~F.exists(
                "sp",
                lambda z: (z["s"] <= i + 1) & (i + 1 <= z["e"]),
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias(
            "excised_tokens"
        ),
        F.md5(F.concat_ws(" ", kept)).alias("clean_hash"),
    )


def lsh_candidate_precision(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Index observability for the MinHash-LSH config: how much of the
    banding stage's candidate volume survives the exact-Jaccard verify —
    the precision side of the bands/rows dial (the recall side is the
    planted-twin recall gate in tests). Low precision means the verify
    join is paying for pairs the banding should have rejected (too few
    rows per band); tuning bands trades this against recall. This is
    the number an index operator watches before re-banding a 100 TB
    corpus, computed for the price of the dedup run itself.

    Returns one row: (n_candidates, n_verified, precision_r). Shares
    the cached shingle frame across signatures, sizes, and both verify
    sides exactly like the production pipeline; the two counts are
    frame aggregates combined by a 1-row crossJoin (no driver
    actions)."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n).cache()
    sigs = _signatures_from_shingles(sh, id_col, n_perm)
    cands = lsh_candidate_pairs(
        sigs, n_perm, bands, id_col, max_bucket_size
    ).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.join(sizes, on=id_col).select(
        F.col(id_col).alias("idA"), F.col("sh"), F.col("n").alias("nA")
    )
    b = sh.join(sizes, on=id_col).select(
        F.col(id_col).alias("idB"), F.col("sh"), F.col("n").alias("nB")
    )
    common = (
        cands.join(a, on="idA")
        .join(b, on=["idB", "sh"])
        .groupBy("idA", "idB", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    verified = common.filter(
        F.col("common") / (F.col("nA") + F.col("nB") - F.col("common"))
        >= min_jaccard
    )
    nc = cands.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    nv = verified.agg(F.count(F.lit(1)).cast("long").alias("n_verified"))
    # 0/0 pins to 1.0 (an empty candidate set wastes no verify work),
    # mirroring lsh_pair_recall's convention — a monitoring metric must
    # never be NULL.
    return nc.crossJoin(nv).select(
        "n_candidates",
        "n_verified",
        F.when(
            F.col("n_candidates") > 0,
            F.round(F.col("n_verified") / F.col("n_candidates"), 6),
        )
        .otherwise(F.lit(1.0))
        .alias("precision_r"),
    )


def lsh_pair_recall(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """The RECALL side of the LSH dial, as a registered metric beside
    :func:`lsh_candidate_precision`: of all TRUE near-dup pairs (exact
    shingle-Jaccard >= threshold over every co-occurring pair), how
    many does the banded-and-capped pipeline surface? Together the two
    metrics bracket the bands/rows/cap trade the way
    `embedding_ann_recall` brackets the ANN ladder.

    Returns one row: (n_true_pairs, n_hits, recall_r). The ground-truth
    side is the quadratic co-occurrence join — exact, and therefore the
    expensive path: at 100 TB you run it on a SAMPLED panel (the
    standard recall-estimation protocol, as the ANN recall row does);
    registered here at fixture scale where exact is affordable.
    Shares one cached shingle frame across ground truth, signatures,
    and both verify sides; counts are frame aggregates (no driver
    actions)."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.join(sizes, on=id_col).select(
        F.col(id_col).alias("idA"), F.col("sh"), F.col("n").alias("nA")
    )
    b = sh.join(sizes, on=id_col).select(
        F.col(id_col).alias("idB"), F.col("sh"), F.col("n").alias("nB")
    )
    truth = (
        a.join(b, on="sh")
        .filter(F.col("idA") < F.col("idB"))
        .groupBy("idA", "idB", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(
            F.col("common")
            / (F.col("nA") + F.col("nB") - F.col("common"))
            >= min_jaccard
        )
        .select("idA", "idB")
    )
    sigs = _signatures_from_shingles(sh, id_col, n_perm)
    cands = lsh_candidate_pairs(sigs, n_perm, bands, id_col, max_bucket_size)
    lsh_pairs = (
        cands.join(a, on="idA")
        .join(b, on=["idB", "sh"])
        .groupBy("idA", "idB", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(
            F.col("common")
            / (F.col("nA") + F.col("nB") - F.col("common"))
            >= min_jaccard
        )
        .select("idA", "idB")
    )
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
    nh = (
        truth.join(lsh_pairs, ["idA", "idB"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return nt.crossJoin(nh).select(
        "n_true_pairs",
        "n_hits",
        F.when(
            F.col("n_true_pairs") > 0,
            F.round(F.col("n_hits") / F.col("n_true_pairs"), 6),
        )
        .otherwise(F.lit(1.0))
        .alias("recall_r"),
    )


def incremental_dedup_clusters(
    assignment: DataFrame,
    corpus_index: tuple[DataFrame, DataFrame, DataFrame],
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = 2000,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """O(batch + affected) maintenance of a persisted NEAR-DUP CLUSTER
    assignment (r9) — the transitive-closure family's incremental twin,
    closing the one index family whose arrival path still meant a full
    rebuild: pairs, digests, BM25 df, PQ/IVF-PQ, the graph ANN and the
    sketches all had O(batch) maintenance; the cluster ASSIGNMENT (the
    thing dedup actually consumes) did not.

    Stages: (1) batch↔corpus pairs against the persisted LSH index
    (:func:`incremental_near_dup_pairs` — corpus-side bucket cap, the
    batch-split-independent convention) plus within-batch pairs
    (:func:`minhash_near_dup_pairs` over the batch alone); (2) CONTRACT
    old endpoints to their cluster ids — within-cluster connectivity is
    already known, so the closure graph has one node per touched
    cluster plus the batch docs, and |edges| = |new pairs|; (3)
    :func:`connected_components` over that batch-sized graph; (4)
    relabel: old rows join the (touched-cluster → new id) map (bounded,
    broadcast) — untouched clusters pass through BIT-IDENTICALLY; batch
    docs take their component label, or themselves as singletons.

    Correctness: a cluster id IS its component's minimum member id, so
    contracting a cluster to its id preserves both connectivity and the
    min — the merged component's label equals the full-rebuild closure
    over (old pairs ∪ new pairs). REQUIREMENT: batch ids must be
    disjoint from corpus ids (arrival ids always are); a batch id that
    collides with an existing id would conflate a contracted node.
    REQUIREMENT (ADVICE r9): ``assignment`` must COVER every id the
    persisted LSH index can emit — a corpus endpoint missing from the
    assignment has no cluster to contract to, and silently dropping
    the pair would lose real connectivity. The contraction join is
    therefore a LEFT join with an in-flow ``raise_error`` guard: an
    uncovered corpus id fails the job loudly (naming the id) instead
    of corrupting the closure, at zero extra cost on the covered path.

    Returns (id, cluster_id, cluster_size) over corpus ∪ batch. The
    size recount is one groupBy over the assignment table — the output
    relation itself, written anyway; everything upstream of it is
    batch-sized."""
    cross = incremental_near_dup_pairs(
        corpus_index, batch, text_col, id_col, n_perm, bands, shingle_n,
        min_jaccard, max_bucket_size,
    )
    internal = minhash_near_dup_pairs(
        batch, text_col, id_col, n_perm, bands, shingle_n, min_jaccard,
        max_bucket_size=None,
    )
    amap = assignment.select(
        F.col(id_col).alias("corpus_id"), F.col("cluster_id").alias("__c")
    )
    cross_c = cross.join(amap, on="corpus_id", how="left").select(
        F.col("batch_id").alias("idA"),
        F.when(
            F.col("__c").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "incremental_dedup_clusters: corpus id missing "
                        "from assignment (coverage REQUIREMENT): "
                    ),
                    F.col("corpus_id").cast("string"),
                )
            ),
        )
        .otherwise(F.col("__c"))
        .alias("idB"),
    )
    edges = cross_c.unionByName(internal.select("idA", "idB")).distinct()
    labels = connected_components(
        edges, "idA", "idB", max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    )
    cmap = labels.select(
        F.col("node").alias("cluster_id"), F.col("component").alias("__new")
    )
    old_re = assignment.join(
        F.broadcast(cmap), on="cluster_id", how="left"
    ).select(
        id_col,
        F.coalesce("__new", F.col("cluster_id")).alias("cluster_id"),
    )
    b_lab = labels.select(F.col("node").alias(id_col), F.col("component"))
    b_re = (
        batch.select(id_col)
        .join(F.broadcast(b_lab), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    full = old_re.unionByName(b_re)
    sizes = full.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return full.join(sizes, on="cluster_id").select(
        id_col, "cluster_id", "cluster_size"
    )


def near_dup_pairs_from_index(
    corpus_index: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Within-corpus near-dup pairs computed FROM the persisted index
    relations (:func:`near_dup_index`) — no re-shingling, no re-banding:
    the bucket self-join + exact-Jaccard verify read only (buckets,
    shingles, sizes). Semantically identical to
    :func:`minhash_near_dup_pairs` with the same parameters (same
    digests, same cap rule, same threshold); exists so a pipeline that
    already persists the index never tokenizes the corpus a second time
    to (re)build the cluster assignment."""
    bk, sh, sz = corpus_index
    b = bk
    if max_bucket_size is not None:
        small = (
            bk.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("bucket")
        )
        b = bk.join(small, on="bucket", how="left_semi")
    cands = (
        b.select(F.col(id_col).alias("idA"), "bucket")
        .join(b.select(F.col(id_col).alias("idB"), "bucket"), on="bucket")
        .filter(F.col("idA") < F.col("idB"))
        .select("idA", "idB")
        .distinct()
    )
    szd = sz
    a = sh.join(szd, on=id_col).select(
        F.col(id_col).alias("idA"), "sh", F.col("n").alias("nA")
    )
    bb = sh.join(szd, on=id_col).select(
        F.col(id_col).alias("idB"), "sh", F.col("n").alias("nB")
    )
    common = (
        cands.join(a, on="idA")
        .join(bb, on=["idB", "sh"])
        .groupBy("idA", "idB", "nA", "nB")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return common.select(
        "idA",
        "idB",
        (
            F.col("common") / (F.col("nA") + F.col("nB") - F.col("common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)
