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
    """
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
    for _ in range(iterations):
        contrib = edges_wd.join(hint(ranks), F.col("node") == F.col("src")).select(
            F.col("dst"),
            (F.col("rank") / F.col("outdeg")).cast("decimal(28,14)").alias("contrib"),
        )
        ranks = contrib.groupBy("dst").agg(
            (
                F.lit(base)
                + F.lit(damping) * F.sum("contrib").cast("double")
            ).alias("rank")
        ).select(F.col("dst").alias("node"), "rank")
        # Eagerly truncate lineage: without this, round k re-executes
        # rounds 1..k-1 (same pathology as dedup.connected_components) —
        # total work O(k²) joins instead of O(k).
        ranks = ranks.localCheckpoint(eager=True)
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
