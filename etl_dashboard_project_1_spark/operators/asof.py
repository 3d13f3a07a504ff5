"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key. Spark has no native ASOF JOIN; the naive
range join (``l.ts >= r.ts`` + argmax) explodes quadratically per key.

Implementation: the union-and-carry trick — tag both sides, union them,
and forward-carry the latest right-side payload over a window partitioned
by key and ordered by time. One shuffle on the key, linear work, no range
explosion: exactly how you want it at 100 TB. (DuckDB's native ASOF JOIN
is the oracle.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_payload: Sequence[str],
    suffix: str = "_asof",
    strict: bool = False,
) -> DataFrame:
    """For each left row: the latest right row with ``right.on <= left.on``
    (``<`` when ``strict``), matching on the ``by`` keys.

    Returns the left rows plus ``<payload><suffix>`` columns (null when no
    prior right row exists).

    Plan: union(tagged left, tagged right) → window
    ``last(payload, ignorenulls)`` per ``by`` ordered by (ts, side) →
    keep left rows. The side order bit makes ties resolve to
    right-before-left (non-strict) or left-before-right (strict).
    """
    lcols = left.columns
    tag_l = left.withColumn("_side", F.lit(1))
    for p in right_payload:
        tag_l = tag_l.withColumn(f"_p_{p}", F.lit(None).cast(dict(right.dtypes)[p]))
    tag_r = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(p).alias(f"_p_{p}") for p in right_payload],
    )
    for c in lcols:
        if c not in tag_r.columns:
            tag_r = tag_r.withColumn(c, F.lit(None))
    unioned = tag_l.unionByName(tag_r.select(tag_l.columns))

    # non-strict: right rows at equal ts sort BEFORE left rows (side 0 < 1)
    # so they are visible to the carry; strict: invert the side order
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned
    for p in right_payload:
        carried = carried.withColumn(
            f"{p}{suffix}", F.last(F.col(f"_p_{p}"), ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("_side") == 1).drop(
        "_side", *[f"_p_{p}" for p in right_payload]
    )
    return out
