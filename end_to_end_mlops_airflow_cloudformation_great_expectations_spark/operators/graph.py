"""Iterative graph operators beyond connected components (see
dedup.connected_components for the min-label-propagation dedup path).

PageRank here is the bounded-iteration DataFrame formulation: each
round is one shuffle join (edges ⋈ ranks on src) plus one aggregation
(contributions by dst) — the classic Pregel message pattern expressed
relationally so Catalyst/AQE handle partitioning and skew. Lineage is
truncated per iteration (persist + unpersist previous) so 10 rounds
don't build a 10-deep join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-iteration PageRank over an edge list.

    Simplified variant without dangling-mass redistribution (documents
    with no outlinks leak their mass, as in the original formulation);
    rank sums to 1 on graphs where every vertex has an outlink.
    Inherently iterative ⇒ eager at call time (the CLAUDE.md lazy-build
    exception); vertex count is one scalar agg, not a full collect.

    Lineage MUST be truncated each round with ``localCheckpoint``:
    ``persist`` alone reuses the physical data but keeps nesting the
    LOGICAL plan (each round embeds the previous ~3×), and by ~10
    rounds the analyzer itself OOMs on the 3^k-node tree — measured in
    this repo's tests, and the same blowup the perf notes document for
    expression re-inlining. On a cluster, swap localCheckpoint for a
    reliable ``checkpoint`` dir so executor loss can't drop rank state.
    """
    verts = (
        edges.select(F.col(src).alias("vid"))
        .union(edges.select(F.col(dst).alias("vid")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    deg = e.groupBy("e_src").agg(F.count("*").alias("deg"))
    ranks = verts.select(
        F.col("vid").alias("id"), F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("id", "e_src"), "e_src")
            .join(deg, "e_src")
            .select(
                F.col("e_dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        ranks = (
            verts.join(
                contribs.groupBy("id").agg(F.sum("c").alias("s")),
                verts["vid"] == F.col("id"),
                "left",
            )
            .select(
                F.col("vid").alias("id"),
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
