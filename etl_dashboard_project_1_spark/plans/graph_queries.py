"""Graph analytics queries: PageRank over the supplier↔part supply
graph (bipartite, built from lineitem, fed as both directions so the
random walk is well-defined). The DuckDB oracle replays the identical
fixed-iteration power iteration with a recursive CTE — PageRank with a
bounded iteration count IS SQL-expressible, so even the iterative
operator gets a full value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph
from ..session import load_table

PR_ITERATIONS = 8


def pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected supplier↔part graph: which suppliers
    and parts sit most centrally in the supply network. Node ids are
    's<suppkey>' / 'p<partkey>'; the rank is rounded to 8 decimals at
    the end (per-iteration drift between engines is ~1e-15 relative,
    far inside the rounding)."""
    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ranks = graph.pagerank(fwd.unionByName(rev), iterations=PR_ITERATIONS)
    return ranks.select("node", F.round("rank", 8).alias("rank"))


PAGERANK_SQL = f"""
WITH RECURSIVE
edges AS (
  SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem GROUP BY 1, 2
  UNION ALL
  SELECT 'p' || l_partkey, 's' || l_suppkey FROM lineitem GROUP BY 1, 2
),
outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*)::DOUBLE AS cnt FROM nodes),
pr(iter, node, rank) AS (
  SELECT 0, node, 1.0::DOUBLE / (SELECT cnt FROM nn) FROM nodes
  UNION ALL
  SELECT iter + 1, e.dst,
         0.15 / (SELECT cnt FROM nn) + 0.85 * sum(pr.rank / outdeg.d)
  FROM pr
  JOIN edges e ON pr.node = e.src
  JOIN outdeg  ON pr.node = outdeg.src
  WHERE iter < {PR_ITERATIONS}
  GROUP BY iter + 1, e.dst
)
SELECT node, round(rank, 8) AS rank FROM pr WHERE iter = {PR_ITERATIONS}
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the part co-purchase graph (parts are
    adjacent when some order contains both): how clustered the catalog's
    co-purchase structure is — the third classic graph kernel next to
    connected components and PageRank. Degree-ordered edge-iterator
    (see ``operators.graph.triangle_count_arrays``): hubs never fan
    out (oriented out-degree O(sqrt(m))), and the closure test is a
    map-side sorted-array intersection — measured 2× faster at sf0.1
    than the wedge-join form (3.8 s vs 7.7 s warm; both kept, equality
    pinned by test) because it removes the Σ outdeg²-row closure
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("_pk")
    ).distinct()
    x, y = op.alias("x"), op.alias("y")
    pairs = x.join(
        y, (F.col("x._ok") == F.col("y._ok")) & (F.col("x._pk") < F.col("y._pk"))
    ).select(F.col("x._pk").alias("src"), F.col("y._pk").alias("dst"))
    return graph.triangle_count_arrays(pairs)


TRIANGLE_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
und AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
  SELECT v, count(*)::BIGINT AS d
  FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
  GROUP BY 1
),
ed AS (
  SELECT CASE WHEN (da.d, und.a) < (db.d, und.b) THEN und.a ELSE und.b END AS s,
         CASE WHEN (da.d, und.a) < (db.d, und.b) THEN und.b ELSE und.a END AS t,
         CASE WHEN (da.d, und.a) < (db.d, und.b) THEN db.d ELSE da.d END AS dt
  FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v
),
wedges AS (
  SELECT w1.t AS v, w2.t AS w
  FROM ed w1 JOIN ed w2 ON w1.s = w2.s
  WHERE (w1.dt, w1.t) < (w2.dt, w2.t)
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM wedges JOIN ed ON wedges.v = ed.s AND wedges.w = ed.t
)
SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
       (SELECT count(*) FROM und)::BIGINT AS n_edges,
       n_triangles
FROM tri
"""
