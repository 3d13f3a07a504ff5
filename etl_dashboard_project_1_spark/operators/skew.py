"""Skew-handling operators: salting for hot keys.

AQE's skew-join handling covers most cases at runtime; explicit salting is
the declarative fallback when one key dominates (the classic power-law
user/document id). Both are provided:

- ``salted_aggregate``: two-phase aggregation — partial aggregate on
  (key, salt), final merge on key. The hot key's rows spread over
  ``salt_buckets`` reducers in phase 1; phase 2 merges ``salt_buckets``
  pre-aggregated rows per key. Result is EXACTLY the plain groupBy (the
  oracle checks this), only the shuffle distribution changes.
- ``replicated_salted_join``: for joining a skewed fact to a dimension —
  fact rows get a deterministic salt, the dimension is replicated
  ``salt_buckets``× with every salt value, and the join key becomes
  (key, salt).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial aggregate, final merge) per supported algebraic aggregate
_MERGES = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (agg_name, input_column) with agg_name in
    {count, sum, min, max}. ``salt_source``: a column whose hash spreads
    rows across salt buckets (defaults to a per-row deterministic spread of
    all columns via ``F.hash``).
    """
    for name, (agg, _col) in aggs.items():
        if agg not in _MERGES:
            raise ValueError(f"unsupported salted aggregate: {agg}")
    salt_in = F.col(salt_source) if salt_source else F.hash(*[F.col(c) for c in df.columns])
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_in), F.lit(salt_buckets)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _MERGES[agg][0](F.col(col)).alias(f"_partial_{name}")
            for name, (agg, col) in aggs.items()
        ]
    )
    final = partial.groupBy(*keys).agg(
        *[
            _MERGES[agg][1](F.col(f"_partial_{name}")).alias(name)
            for name, (agg, _col) in aggs.items()
        ]
    )
    return final


def replicated_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi join: fact rows salt deterministically,
    the dimension replicates across all salt values, and the join runs on
    (key, salt) — the hot key's partitions split ``salt_buckets`` ways.
    Exact same rows as the unsalted join (oracle-checkable)."""
    salts = dim.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)).cast("int")
    )
    dim_s = dim.crossJoin(F.broadcast(salts))
    out = fact_s.join(dim_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
