"""Range / interval joins — point-in-range and banded-dimension joins.

Not in the reference (SURVEY.md §2.8: "No hash/sort-merge/range/as-of/
interval ... joins exist"); these are the standard time-series/analytics
join shapes the engine needs beyond equi joins.

Two scale regimes, chosen explicitly by the caller:

- ``interval_join`` WITH ``by`` keys: Spark plans the equi part as a
  shuffled hash / sort-merge join and evaluates the range predicate as a
  post-join filter — co-partitioned on the keys, no replication, the
  100 TB path whenever a natural key exists.
- ``band_join`` (and ``interval_join`` without keys): the range side must
  be dimension-sized; it is broadcast and Spark plans a
  BroadcastNestedLoopJoin. Cost is |facts| × |bands| — fine for band
  tables (dozens of rows), wrong for two large sides (then: bucketize
  the range into a synthetic equi key first).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    ranges: DataFrame,
    point_ts: str,
    range_start: str,
    range_end: str,
    by: Sequence[str] = (),
    how: str = "inner",
    broadcast_ranges: bool = False,
) -> DataFrame:
    """Join each point row to every range row with
    ``range_start <= point_ts < range_end`` (half-open, the streaming
    window convention), equi-matching on ``by`` keys when given.

    Non-key columns must not collide between the two inputs (rename
    before calling); ``by`` keys are deduplicated to the point side.
    """
    p, r = points.alias("_p"), ranges.alias("_r")
    cond: Column = (F.col(f"_p.{point_ts}") >= F.col(f"_r.{range_start}")) & (
        F.col(f"_p.{point_ts}") < F.col(f"_r.{range_end}")
    )
    for k in by:
        cond = (F.col(f"_p.{k}") == F.col(f"_r.{k}")) & cond
    right = F.broadcast(r) if broadcast_ranges else r
    joined = p.join(right, cond, how)
    # drop the duplicated key columns from the range side
    return joined.drop(*[r[k] for k in by])


def band_join(
    facts: DataFrame,
    value_col: str,
    bands: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Classify each fact row into a band: ``lo <= value < hi``.

    The band table is broadcast (it is a config-sized dimension); the
    plan is a BroadcastNestedLoopJoin whose cost is linear in the fact
    table — every executor streams its partitions against the in-memory
    band list, no shuffle of the facts at all.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, how)
