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
