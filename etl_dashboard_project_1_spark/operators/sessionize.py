"""Batch gap-based sessionization — the batch analog of the streaming
``session_window`` operator (streaming/jobs.py).

Not in the reference (its data has no event stream; SURVEY.md §2.13 —
"Streaming: none"); this is a north-star training-pipeline operator
(SURVEY.md §7 module 10): assign every event a per-user session id where
a gap of more than ``gap_seconds`` between consecutive events starts a
new session.

Scale shape: ONE shuffle, on the ``by`` keys. Both windows (the lag and
the running sum) share the same partitioning and ordering, so Catalyst
plans a single sort + single exchange — no global ordering anywhere, and
per-user event counts are bounded, so no partition outgrows memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: Sequence[str],
    gap_seconds: int = 1800,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add a ``session_seq`` column: 1-based session index per ``by`` group.

    A new session starts at the first event of the group and whenever the
    time since the previous event exceeds ``gap_seconds`` (strictly).
    ``tiebreak`` columns make the ordering total when timestamps can
    repeat (determinism — the same reason the as-of join orders on a
    tiebreak, operators/asof.py).
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # integer microseconds, never double: at ~1.7e9 s epochs a double cast
    # has ~2.4e-7 s ULP, so a gap landing exactly on gap_seconds could flip
    # the strict comparison vs an exact INTERVAL oracle. unix_micros stays
    # exact (and unix_timestamp would truncate to whole seconds).
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    is_new = F.when(prev.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    ts_col: str,
    by: Sequence[str],
    gap_seconds: int = 1800,
    value_col: str | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One row per (by..., session_seq): start/end timestamps, event count
    and (optionally) the summed value column. Same single-shuffle plan —
    the groupBy keys are a prefix extension of the window partitioning,
    so AQE reuses the exchange."""
    s = sessionize(df, ts_col, by, gap_seconds, tiebreak)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return s.groupBy(*by, "session_seq").agg(*aggs)
