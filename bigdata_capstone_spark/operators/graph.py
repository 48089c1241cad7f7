"""Iterative graph algorithms as DataFrame loops.

Companion to the connected-components labeler in operators/dedup.py: that
one iterates to a fixed point; PageRank here runs a FIXED number of
rounds so the DuckDB oracle can unroll the loop into chained CTEs and
value-check every iteration's arithmetic (SURVEY §5.2 — even iterative
ops get real oracles where expressible).

Determinism: ranks live as doubles, but every per-node sum of neighbor
contributions is accumulated as DECIMAL(28,14) (exact, associative) and
only then cast back to double — the same money-sum discipline as
functions/portable.exact_sum, extended to an iterative fixed-round
computation. Each iteration is therefore bit-identical between Spark's
partitioned partial aggregation and DuckDB's serial scan.

Scale: each iteration is one shuffle (groupBy dst). Edges and degrees
are computed once and cached; the rank frame stays (node, rank) — the
graph itself never re-shuffles. For long runs, localCheckpoint every few
rounds (see dedup.connected_components for why); at 3 rounds lineage
stays shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    """(src, outdeg) for a directed edge list (src, dst)."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    broadcast_nodes: bool | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst), fixed rounds.

    Assumes no dangling nodes (every node has ≥1 out-edge) — true for
    any symmetrized/undirected graph, which is how the catalog uses it.
    Returns (node, rank) with ranks summing to ~1.

    Physical strategy: the node-sized frames (degrees, ranks) are tiny
    relative to edges — one row per node. When they fit a broadcast
    (``broadcast_nodes``, auto-on below 2M nodes), each round is a
    map-only pass over the cached, never-reshuffled edge list plus ONE
    shuffle whose input is already combined map-side to ≤ partitions ×
    |dst| rows. Checkpointed rank frames carry no catalyst size stats,
    so without the explicit hint the planner would fall back to
    sort-merge-joining the edge list every round — full-width exchanges
    of the biggest frame, 3× over. Beyond broadcast size, the shuffle
    join is the honest cost: rank vectors of 1e9 nodes don't fit an
    executor, and each round pays an edges⋈ranks exchange (bucketing
    edges by src would remove even that in a persisted-table setting).

    ``checkpoint_dir``: same contract as dedup.connected_components —
    None truncates lineage per round with executor-local
    ``localCheckpoint`` (non-fault-tolerant: one lost executor aborts
    the run); a reliable HDFS/S3 directory switches to ``checkpoint()``
    so the run survives preemption. Shared mechanism
    :func:`operators.ckpt.lineage_truncation` (saves/restores the
    session checkpoint dir).
    """
    from bigdata_capstone_spark.operators.ckpt import lineage_truncation

    edges = edges.select("src", "dst").cache()
    deg = out_degrees(edges)
    n = deg.count()  # scalar: node count (every node has out-edges)
    base = (1.0 - damping) / n
    if broadcast_nodes is None:
        broadcast_nodes = n <= 2_000_000
    hint = F.broadcast if broadcast_nodes else (lambda df: df)

    # Pre-divide by out-degree once: (src, dst, outdeg) never changes.
    edges_wd = edges.join(hint(deg), "src").cache()

    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    with lineage_truncation(edges.sparkSession, checkpoint_dir) as _ckpt:
        for _ in range(iterations):
            contrib = edges_wd.join(
                hint(ranks), F.col("node") == F.col("src")
            ).select(
                F.col("dst"),
                (F.col("rank") / F.col("outdeg"))
                .cast("decimal(28,14)")
                .alias("contrib"),
            )
            ranks = contrib.groupBy("dst").agg(
                (
                    F.lit(base)
                    + F.lit(damping) * F.sum("contrib").cast("double")
                ).alias("rank")
            ).select(F.col("dst").alias("node"), "rank")
            # Eagerly truncate lineage: without this, round k re-executes
            # rounds 1..k-1 (same pathology as dedup.connected_components)
            # — total work O(k²) joins instead of O(k).
            ranks = _ckpt(ranks)
    return ranks


def pagerank_unrolled_sql(
    edges_cte: str, iterations: int = 3, damping: float = 0.85
) -> str:
    """DuckDB twin of :func:`pagerank`: the loop unrolled into CTEs.

    ``edges_cte`` must define a relation ``edges(src, dst)``.
    """
    parts = [
        f"WITH edges AS ({edges_cte})",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM deg)",
        "r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank FROM deg)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"r{i} AS ("
            f"SELECT e.dst AS node, "
            f"{1.0 - damping} / (SELECT n FROM nn) + {damping} * "
            f"(sum(CAST(r.rank / d.outdeg AS DECIMAL(28,14)))::DOUBLE) AS rank "
            f"FROM edges e "
            f"JOIN r{i - 1} r ON r.node = e.src "
            f"JOIN deg d ON d.src = e.src "
            f"GROUP BY e.dst)"
        )
    return ",\n    ".join(parts) + f"\n    SELECT node, rank FROM r{iterations}"


def ring_of_cliques(
    spark, n_cliques: int = 6, size: int = 20
) -> DataFrame:
    """Deterministic community fixture: ``n_cliques`` cliques of
    ``size`` nodes (node i belongs to clique i // size), consecutive
    cliques joined by ONE bridge edge (last node of q → first node of
    q+1, ring-closed). The generative formula is replayable in SQL, so
    a label-propagation oracle can rebuild the identical graph — the
    synthetic_url_table pattern applied to graphs."""
    n = n_cliques * size
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    intra = a.join(
        b,
        (F.col("src") < F.col("dst"))
        & (F.floor(F.col("src") / size) == F.floor(F.col("dst") / size)),
    )
    bridges = (
        spark.range(n_cliques)
        .select(
            (F.col("id") * size + (size - 1)).alias("src"),
            (((F.col("id") + 1) % n_cliques) * size).alias("dst"),
        )
    )
    return intra.unionByName(bridges)


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    checkpoint_dir: str | None = None,
    max_degree: int | None = None,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    undirected graph given as a one-direction edge list, FIXED rounds,
    fully deterministic: each round every node adopts the label with
    the highest frequency in its closed neighborhood (neighbors + its
    own current label), ties broken by the SMALLEST label. Fixed
    rounds + deterministic ties let a DuckDB oracle unroll the loop
    (:func:`label_propagation_unrolled_sql`) — same contract as
    :func:`pagerank`.

    Communities vs components: connected_components (dedup.py) merges
    ANYTHING touching; LPA keeps densely-connected groups separate when
    only sparse bridges join them (frequency outvotes the bridge) —
    the distinction that matters when near-dup clusters chain through
    a few boilerplate hubs.

    Returns (node, label). Scale shape: the symmetrized edge list is
    cached and NEVER re-shuffles; each round is one join (labels onto
    edge endpoints) + one (node, label) count + one min-by argmax —
    all map-side-combinable aggregations keyed on the node; the label
    frame is node-sized. Lineage truncates per round (the
    dedup.connected_components O(k^2) lesson) via the shared
    :func:`operators.ckpt.lineage_truncation` mechanism:
    ``checkpoint_dir=None`` → executor-local localCheckpoint, a
    reliable HDFS/S3 dir → fault-tolerant ``checkpoint()`` — pass it on
    preemptible clusters (a lost executor otherwise aborts the run,
    and this backs the single most expensive registered query,
    embedding_semantic_communities).

    ``max_degree`` (r11): a caller that can DECLARE a symmetrized
    degree bound (a mutual-KNN graph has degree ≤ k by construction —
    every mutual edge at a node consumes one of its k top-k slots)
    opts into the FUSED fixed-round plan: (1) self-loop edges added
    once replace the per-round union with the label frame, so each
    round references ``labels`` exactly once and the whole fixed-round
    chain stays LAZY — the plan grows linearly in ``rounds``, no
    per-round eager checkpoint barrier, no per-round label-frame
    materialization; (2) every round's vote frame is provably
    ≤ (max_degree+1)·|V| rows, bounding the chain; (3) the symmetrized
    edge list is eagerly localCheckpointed ONCE — measured ~1s faster
    than ``.cache()`` here because the checkpoint truncates the
    upstream (KNN-graph) lineage out of every round's plan instead of
    inlining the cached subtree 4× (planning cost is a real driver
    cost at scale, guide §7.3); a pre-``repartition`` on the ckpt'd
    frame would be wasted — a checkpoint's partitioning is invisible
    to the planner (measured: no difference), which is also why the
    aspirational one-exchange-per-round form is not reachable under
    AQE (the label frame re-exchanges into each round's join). Net:
    two exchanges per round, ONE job for the whole query, ~30% faster
    at sf0.1 than the generic path on the same input. Votes, counts
    and tie-breaks are expression-identical to the generic path (the
    self-loop contributes the same single own-label vote the union
    did), so the result is bit-identical — the unrolled oracle replays
    both shapes. ``checkpoint_dir`` is ignored in this path (the one
    intermediate is the executor-local edge checkpoint; fault
    tolerance comes from re-running the one query).
    """
    from bigdata_capstone_spark.operators.ckpt import lineage_truncation

    # The symmetrized edge list is re-joined on ``dst`` EVERY round:
    # repartition + sort it on that key once, before caching, so each
    # round's sort-merge join reuses the cached partitioning AND sort
    # order instead of re-exchanging + re-sorting the (largest) edge
    # frame per round (r10 optimization: 2 of the 4 per-round exchanges
    # removed; the remaining two are the node-sized label frames).
    und_base = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )
    if max_degree is not None:
        # Bag-union the self-loops (NOT distinct): an input self-loop,
        # if present, must keep contributing its edge vote on top of
        # the own-label vote, exactly as the generic path's union did.
        selfloops = und_base.select(F.col("src"), F.col("src").alias("dst"))
        und_plus = und_base.unionByName(
            selfloops.distinct()
        ).localCheckpoint(eager=True)
        labels = (
            und_plus.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
        for _ in range(rounds):
            closed = und_plus.join(
                labels, und_plus["dst"] == labels["node"]
            ).select("src", "label")
            freq = closed.repartition("src").groupBy("src", "label").agg(
                F.count(F.lit(1)).alias("c")
            )
            labels = (
                freq.groupBy("src")
                .agg(
                    F.min_by(
                        "label",
                        F.struct(
                            (-F.col("c")).alias("nc"),
                            F.col("label").alias("lb"),
                        ),
                    ).alias("label")
                )
                .select(F.col("src").alias("node"), "label")
            )
        return labels
    und = (
        und_base
        .repartition("dst")
        .sortWithinPartitions("dst")
        .cache()
    )
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    with lineage_truncation(edges.sparkSession, checkpoint_dir) as _ckpt:
        for _ in range(rounds):
            neigh = und.join(
                labels, und["dst"] == labels["node"]
            ).select("src", "label")
            closed = neigh.unionByName(
                labels.select(F.col("node").alias("src"), "label")
            )
            # one explicit clustering by src serves BOTH aggregations:
            # hashpartitioning(src) satisfies ClusteredDistribution for
            # groupBy(src, label) and groupBy(src) alike, so the
            # frequency count and the argmax run exchange-free on top
            # of it (one shuffle per round where there were two)
            freq = closed.repartition("src").groupBy("src", "label").agg(
                F.count(F.lit(1)).alias("c")
            )
            labels = _ckpt(
                freq.groupBy("src")
                .agg(
                    F.min_by(
                        "label",
                        F.struct(
                            (-F.col("c")).alias("nc"),
                            F.col("label").alias("lb"),
                        ),
                    ).alias("label")
                )
                .select(F.col("src").alias("node"), "label")
            )
    return labels


def label_propagation_ctes(rounds: int = 3) -> str:
    """Composable CTE fragment (no leading WITH) unrolling the LPA loop;
    assumes a relation ``edges0(src, dst)`` is already defined by the
    enclosing chain. Ends in ``l{rounds}(node, label)``."""
    parts = [
        "edges AS (SELECT src, dst FROM edges0 "
        "UNION SELECT dst, src FROM edges0)",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"f{i} AS ("
            f"SELECT src, label, count(*) AS c FROM ("
            f"SELECT e.src, l.label FROM edges e "
            f"JOIN l{i - 1} l ON l.node = e.dst "
            f"UNION ALL SELECT node AS src, label FROM l{i - 1}"
            f") GROUP BY src, label)"
        )
        parts.append(
            f"m{i} AS (SELECT src, max(c) AS mc FROM f{i} GROUP BY src)"
        )
        parts.append(
            f"l{i} AS (SELECT f.src AS node, min(f.label) AS label "
            f"FROM f{i} f JOIN m{i} m ON m.src = f.src AND f.c = m.mc "
            f"GROUP BY f.src)"
        )
    return ",\n    ".join(parts)


def label_propagation_unrolled_sql(
    edges_cte: str, rounds: int = 3
) -> str:
    """DuckDB twin of :func:`label_propagation`: the loop unrolled.

    ``edges_cte`` must define a relation with columns (src, dst)."""
    return (
        f"WITH edges0 AS ({edges_cte}),\n    "
        + label_propagation_ctes(rounds)
        + f"\n    SELECT node, label FROM l{rounds}"
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HITS (Kleinberg 1999, "Authoritative sources in a hyperlinked
    environment") over a directed edge list (src, dst), FIXED rounds,
    L1-normalized — hubs point at good authorities, authorities are
    pointed at by good hubs. Complements :func:`pagerank` for crawl
    prioritization: PageRank surfaces globally popular hosts, HITS
    separates directory/portal hosts (hubs) from content hosts
    (authorities), which is the distinction a frontier scheduler wants
    when budgeting fetches between discovery and harvest.

    Round structure: auth(v) = Σ_{u→v} hub(u), normalized to sum 1;
    then hub(u) = Σ_{u→v} auth(v), normalized to sum 1. Every sum —
    per-node contributions AND the normalization total — accumulates as
    DECIMAL(28,14) before the cast back to double, so each round is
    bit-identical between Spark's partitioned partial aggregation and
    DuckDB's serial scan (:func:`hits_unrolled_sql` unrolls the loop).
    L1 (not the classical L2) keeps the normalizer inside exact decimal
    arithmetic — no sqrt of a partition-order-dependent double.

    Nodes with no in-edges hold auth 0, nodes with no out-edges hold
    hub 0 (the zero rows are materialized, not dropped). Returns
    (node, hub, auth).

    Scale shape: the edge list is cached and never re-shuffles; each
    half-round is one edges⋈scores join plus one groupBy on the
    receiving endpoint (map-side combined, node-sized output) plus a
    1-row total. The score frames stay (node, value). Lineage truncates
    per round via the shared :func:`operators.ckpt.lineage_truncation`
    (``checkpoint_dir=None`` → localCheckpoint; reliable dir →
    fault-tolerant ``checkpoint()`` for preemptible clusters).
    """
    from bigdata_capstone_spark.operators.ckpt import lineage_truncation

    edges = edges.select("src", "dst").cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        # Zero-fill first so the frame stays node-sized and total is
        # over the same row set as the oracle's LEFT JOIN.
        full = nodes.join(raw, "node", "left").select(
            "node", F.coalesce(F.col(col), F.lit(0.0)).alias(col)
        )
        tot = full.agg(
            F.sum(F.col(col).cast("decimal(28,14)"))
            .cast("double")
            .alias("__tot")
        )
        return full.crossJoin(F.broadcast(tot)).select(
            "node", (F.col(col) / F.col("__tot")).alias(col)
        )

    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = nodes.withColumn("auth", F.lit(0.0))
    with lineage_truncation(edges.sparkSession, checkpoint_dir) as _ckpt:
        for _ in range(iterations):
            auth_raw = (
                edges.join(hub, edges["src"] == hub["node"])
                .groupBy("dst")
                .agg(
                    F.sum(F.col("hub").cast("decimal(28,14)"))
                    .cast("double")
                    .alias("auth")
                )
                .select(F.col("dst").alias("node"), "auth")
            )
            auth = _ckpt(_normalize(auth_raw, "auth"))
            hub_raw = (
                edges.join(auth, edges["dst"] == auth["node"])
                .groupBy("src")
                .agg(
                    F.sum(F.col("auth").cast("decimal(28,14)"))
                    .cast("double")
                    .alias("hub")
                )
                .select(F.col("src").alias("node"), "hub")
            )
            hub = _ckpt(_normalize(hub_raw, "hub"))
    return hub.join(auth, "node")


def hits_unrolled_sql(edges_cte: str, iterations: int = 3) -> str:
    """DuckDB twin of :func:`hits`: the loop unrolled into CTEs.

    ``edges_cte`` must define a relation ``edges(src, dst)``."""
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "h0 AS (SELECT node, 1.0::DOUBLE AS hub FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"ar{i} AS (SELECT e.dst AS node, "
            f"sum(CAST(h.hub AS DECIMAL(28,14)))::DOUBLE AS auth "
            f"FROM edges e JOIN h{i - 1} h ON h.node = e.src "
            f"GROUP BY e.dst)"
        )
        parts.append(
            f"af{i} AS (SELECT n.node, "
            f"coalesce(a.auth, 0.0)::DOUBLE AS auth "
            f"FROM nodes n LEFT JOIN ar{i} a ON a.node = n.node)"
        )
        parts.append(
            f"a{i} AS (SELECT node, auth / (SELECT "
            f"sum(CAST(auth AS DECIMAL(28,14)))::DOUBLE FROM af{i}) "
            f"AS auth FROM af{i})"
        )
        parts.append(
            f"hr{i} AS (SELECT e.src AS node, "
            f"sum(CAST(a.auth AS DECIMAL(28,14)))::DOUBLE AS hub "
            f"FROM edges e JOIN a{i} a ON a.node = e.dst "
            f"GROUP BY e.src)"
        )
        parts.append(
            f"hf{i} AS (SELECT n.node, "
            f"coalesce(h.hub, 0.0)::DOUBLE AS hub "
            f"FROM nodes n LEFT JOIN hr{i} h ON h.node = n.node)"
        )
        parts.append(
            f"h{i} AS (SELECT node, hub / (SELECT "
            f"sum(CAST(hub AS DECIMAL(28,14)))::DOUBLE FROM hf{i}) "
            f"AS hub FROM hf{i})"
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT h.node, h.hub, a.auth "
        f"FROM h{iterations} h JOIN a{iterations} a ON a.node = h.node"
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Minimum-hop distance from a seed set over a directed edge list,
    FIXED rounds of frontier relaxation — the crawl-depth computation
    behind "fetch everything within k clicks of the seed list" (the
    classic crawl-budget boundary; Common Crawl and every focused
    crawler cut the frontier by hop count). Nodes not reached within
    ``rounds`` hops are absent from the result — the honest semantics
    (an unreached node has no depth, not depth ∞).

    ``seeds`` is a one-column (node) frame. Returns (node, depth) with
    depth 0 for seeds. All arithmetic is integer — exact on any engine;
    the DuckDB twin (:func:`bfs_depths_unrolled_sql`) unrolls the
    relaxation.

    Scale shape: the edge list is cached and never re-shuffles; each
    round is one edges⋈depths join (candidate depth = src depth + 1)
    plus one min-groupBy on the node key — map-side combined,
    node-sized output. This is Bellman-Ford-style relaxation, not a
    delta-frontier BFS: at k ≤ a handful of rounds the full join is one
    shuffle per round and needs no visited-set bookkeeping; a
    1000-round traversal would want the delta-frontier variant instead.
    Lineage truncates per round (shared lineage_truncation contract).
    """
    from bigdata_capstone_spark.operators.ckpt import lineage_truncation

    edges = edges.select("src", "dst").cache()
    depths = seeds.select("node").distinct().withColumn(
        "depth", F.lit(0)
    )
    with lineage_truncation(edges.sparkSession, checkpoint_dir) as _ckpt:
        for _ in range(rounds):
            relaxed = (
                edges.join(depths, edges["src"] == depths["node"])
                .select(
                    F.col("dst").alias("node"),
                    (F.col("depth") + F.lit(1)).alias("depth"),
                )
            )
            depths = _ckpt(
                depths.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("depth").alias("depth"))
            )
    return depths


def bfs_depths_unrolled_sql(
    edges_cte: str, seeds_cte: str, rounds: int = 3
) -> str:
    """DuckDB twin of :func:`bfs_depths`: the relaxation unrolled.

    ``edges_cte`` must define (src, dst); ``seeds_cte`` one column
    ``node``."""
    parts = [
        f"WITH edges AS ({edges_cte})",
        f"d0 AS (SELECT DISTINCT node, 0 AS depth FROM ({seeds_cte}))",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS (SELECT node, min(depth) AS depth FROM ("
            f"SELECT node, depth FROM d{i - 1} "
            f"UNION ALL "
            f"SELECT e.dst AS node, d.depth + 1 AS depth "
            f"FROM edges e JOIN d{i - 1} d ON d.node = e.src"
            f") GROUP BY node)"
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT node, depth FROM d{rounds}"
    )
