"""Iterative graph analytics over edge DataFrames.

Companion to ``dedup.connected_components`` (min-label propagation):
here the classic damped PageRank power iteration, expressed so the
driver loop is over ITERATIONS, never rows — each iteration is one
distributed join + one aggregation, shuffling on the node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Damped PageRank over a directed edge list; returns (node, rank).

    Every node must have out-degree ≥ 1 (feed an undirected graph as
    both edge directions — then in/out degrees are symmetric and no
    rank mass dangles). Fixed iteration count keeps the result
    deterministic and cross-engine comparable.

    Scale shape: ``edges`` and ``outdeg`` are computed once and
    localCheckpointed (they are re-joined every iteration — at cluster
    scale use reliable ``checkpoint`` or persist with replication);
    ranks are checkpointed every ``checkpoint_every`` rounds so the
    lineage stays O(1) deep. Per iteration: one equi-join on the node
    id + one sum-aggregate — the same shuffle key throughout, so a
    pre-partitioned edge table makes every round co-located.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # scalar (node count), driver-sized by definition
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for i in range(iterations):
        contribs = (
            e.join(outdeg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("d")).alias("c"))
        )
        ranks = contribs.groupBy("node").agg(
            (F.lit(teleport) + F.lit(damping) * F.sum("c")).alias("rank")
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks
