"""2-D skyline (pareto front) via the sorted-sweep window form.

The classic "best value" operator: keep the points not DOMINATED on
(minimize cost, maximize benefit) — a dominates b when a.cost <= b.cost
AND a.benefit >= b.benefit with at least one strict. The naive
formulation is an anti-join of the set against itself (|n|² candidate
pairs per group); the sweep form sorts each group once by cost and keeps
a row iff (1) no strictly cheaper row reaches its benefit and (2) no
equal-cost row strictly exceeds it — two window passes over ONE
group-partitioned sort, O(n log n), no self-join.

Not in the reference (SURVEY §2 has no ranking beyond argmax); this is a
dashboard-analytics north-star operator sharing the windowed-sweep shape
of `cleaning.ffill` and `analytics.a5_argmax`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    by: Sequence[str],
    cost_col: str,
    benefit_col: str,
) -> DataFrame:
    """Rows of ``df`` on the per-group pareto front for (min ``cost_col``,
    max ``benefit_col``). Both columns must be orderable; ties on both
    dimensions are all kept (none dominates the other *strictly*).

    Scale shape: one range-partitioned sort per group (the RANGE-frame
    running max), one same-cost partition max — a single shuffle on
    (by..., cost ordering), no candidate pairs.
    """
    w_cheaper = (
        Window.partitionBy(*by)
        .orderBy(cost_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy(*by, cost_col)
    flagged = df.select(
        "*",
        F.max(benefit_col).over(w_cheaper).alias("_cheaper_max"),
        F.max(benefit_col).over(w_same).alias("_same_max"),
    )
    return flagged.filter(
        (
            F.col("_cheaper_max").isNull()
            | (F.col(benefit_col) > F.col("_cheaper_max"))
        )
        & (F.col(benefit_col) == F.col("_same_max"))
    ).drop("_cheaper_max", "_same_max")
