"""Iterative graph analytics over edge DataFrames.

Companion to ``dedup.connected_components`` (min-label propagation):
here the classic damped PageRank power iteration, expressed so the
driver loop is over ITERATIONS, never rows — each iteration is one
distributed join + one aggregation, shuffling on the node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    if n == 0:  # empty graph -> empty ranks, declared schema
        spark = edges.sparkSession
        return spark.createDataFrame([], "node string, rank double")
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


def triangle_count(edges, src: str = "src", dst: str = "dst"):
    """Exact triangle count of an undirected simple graph, degree-ordered
    (the Cohen / "compact-forward" algorithm Spark-shaped).

    Every edge is oriented from its (degree, id)-SMALLER endpoint to the
    larger one; a triangle's three oriented edges then form exactly one
    out-wedge plus one closing edge, so

        triangles = |{(u→v, u→w), v≺w, with v→w an edge}|

    counted by ONE equi-join on the wedge pivot and ONE equi-join for
    the closure. The orientation is the scale trick: out-degrees are
    bounded by O(sqrt(m)) regardless of hub size (a hub's edges orient
    INTO it), so the wedge join never explodes on skewed degree
    distributions — the reason every distributed triangle counter
    orients by degree rather than joining raw adjacency.

    Input may contain duplicates or both directions; it is canonicalized
    first. Returns a 1-row DataFrame (n_nodes, n_edges, n_triangles) —
    all exact integers.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(
            F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b")
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds degrees + orientation + closure
    )
    deg = (
        und.select(F.col("_a").alias("_v"))
        .unionAll(und.select(F.col("_b").alias("_v")))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    ed = (
        und.join(deg.withColumnRenamed("_v", "_a").withColumnRenamed("_d", "_da"), "_a")
        .join(deg.withColumnRenamed("_v", "_b").withColumnRenamed("_d", "_db"), "_b")
        .select(
            F.when(
                F.struct(F.col("_da"), F.col("_a")) < F.struct(F.col("_db"), F.col("_b")),
                F.struct(
                    F.col("_a").alias("s"), F.col("_b").alias("t"),
                    F.col("_db").alias("dt"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("_b").alias("s"), F.col("_a").alias("t"),
                    F.col("_da").alias("dt"),
                )
            )
            .alias("_e")
        )
        .select("_e.s", "_e.t", "_e.dt")
        .localCheckpoint(eager=False)
    )
    w1 = ed.select(F.col("s").alias("_u"), F.col("t").alias("_v"), F.col("dt").alias("_dv"))
    w2 = ed.select(F.col("s").alias("_u"), F.col("t").alias("_w"), F.col("dt").alias("_dw"))
    wedges = w1.join(w2, "_u").filter(
        F.struct(F.col("_dv"), F.col("_v")) < F.struct(F.col("_dw"), F.col("_w"))
    )
    closed = wedges.join(
        ed.select(F.col("s").alias("_v"), F.col("t").alias("_w")), ["_v", "_w"]
    )
    return (
        closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))))
        .crossJoin(F.broadcast(und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def triangle_count_arrays(edges, src: str = "src", dst: str = "dst"):
    """Edge-iterator variant of :func:`triangle_count`: same degree
    orientation, but the closure test is a map-side SORTED-ARRAY
    INTERSECTION instead of a second equi-join — for oriented edge
    (s, t), every common out-neighbor w closes one triangle, and each
    triangle is counted exactly once at its ≺-smallest vertex's edge.

    Trade: the wedge formulation shuffles Σ outdeg² wedge ROWS into the
    closure join; this one ships each node's out-adjacency ARRAY to its
    incident edges (Σ outdeg·(deg) values) and intersects locally —
    no third shuffle, vectorized set math, at the cost of duplicated
    adjacency payloads. Which wins is data-dependent; both stay bounded
    by the O(sqrt(m)) oriented out-degree."""
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("_a").alias("_v"))
        .unionAll(und.select(F.col("_b").alias("_v")))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    ed = (
        und.join(deg.withColumnRenamed("_v", "_a").withColumnRenamed("_d", "_da"), "_a")
        .join(deg.withColumnRenamed("_v", "_b").withColumnRenamed("_d", "_db"), "_b")
        .select(
            F.when(
                F.struct(F.col("_da"), F.col("_a")) < F.struct(F.col("_db"), F.col("_b")),
                F.struct(F.col("_a").alias("s"), F.col("_b").alias("t")),
            )
            .otherwise(F.struct(F.col("_b").alias("s"), F.col("_a").alias("t")))
            .alias("_e")
        )
        .select("_e.s", "_e.t")
        .localCheckpoint(eager=False)
    )
    adj = ed.groupBy("s").agg(F.array_sort(F.collect_list("t")).alias("nbrs"))
    closed = (
        ed.join(adj.withColumnRenamed("s", "s").withColumnRenamed("nbrs", "ns"), "s")
        .join(
            adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nt")), "t", "left"
        )
        .select(
            F.size(
                F.array_intersect(F.col("ns"), F.coalesce(F.col("nt"), F.array()))
            ).alias("_c")
        )
    )
    return (
        closed.agg(F.sum("_c").cast("long").alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))))
        .crossJoin(F.broadcast(und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def kcore_edges(
    und: DataFrame, k: int, max_rounds: int
) -> DataFrame:
    """Bounded iterative k-core peeling over a DOUBLED (undirected)
    edge list: each round drops every edge with an endpoint of degree
    < k, for at most ``max_rounds`` rounds (early exit when a round
    removes nothing — further rounds are no-ops, so the result equals
    the fixed-round definition). The bound is part of the operator
    contract (the PageRank fixed-iteration / LEV_MAX_BLOCK documented-
    cap precedent): at the tested scales the peel reaches its fixpoint
    well inside the bound (measured ≤ 7 rounds at sf0.1 for the
    co-purchase graph at k = 80), and the bound makes the operator's
    output a deterministic function of (graph, k, max_rounds) in any
    engine.

    Scale shape: each round is two degree windows over the CURRENT
    (shrinking) edge set — O(max_rounds) shuffles total, the inherent
    cost of an iterative graph kernel (the PageRank justification).
    Each round is persisted (compressed columnar cache) and the
    PREVIOUS round explicitly unpersisted once the new one is
    materialized, so at most one round's edge set is ever resident —
    the first localCheckpoint form retained every round's blocks and
    killed an 8 GB driver at the 100-copy weak-scaling decade (240M
    doubled edges × 7 rounds); on a cluster the same single-round
    residency argument holds per executor. Degrees ride the doubled
    representation (count of rows per src IS the undirected degree),
    and dropping a row always drops its mirror in the same round (the
    mirror's dst-degree is the same endpoint's degree), so the doubled
    invariant is preserved.

    Cache ownership: the FINAL round's frame is returned STILL
    PERSISTED (its blocks are what make the caller's downstream
    aggregate read cached data instead of replaying the whole peel,
    whose intermediate rounds are already unpersisted). The caller owns
    that cache: materialize the downstream result, then unpersist the
    returned frame (kcore_copurchase does this via an eager
    localCheckpoint of its bounded degree histogram) — otherwise the
    doubled-edge blocks stay resident for the rest of the session."""
    edges = und.persist()
    n = edges.count()
    w_s = Window.partitionBy("src")
    w_d = Window.partitionBy("dst")
    for _ in range(max_rounds):
        if n == 0:
            break
        filtered = (
            edges.withColumn("_ds", F.count(F.lit(1)).over(w_s))
            .withColumn("_dd", F.count(F.lit(1)).over(w_d))
            .filter((F.col("_ds") >= k) & (F.col("_dd") >= k))
            .drop("_ds", "_dd")
            .persist()
        )
        m = filtered.count()
        edges.unpersist(blocking=False)
        edges = filtered
        if m == n:
            break
        n = m
    return edges
