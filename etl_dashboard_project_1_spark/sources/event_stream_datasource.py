"""Spark 4 Python STREAMING DataSource: a deterministic, replayable
event feed (format ``"eventfeed"``).

Reference parity: the reference ingests a static file drop
(/root/reference/src/extraction.py); the streaming generalization a
production pipeline needs is a SOURCE abstraction with offsets — resume,
replay, and exactly-once sink semantics all reduce to "the same offset
range always yields the same rows". This source makes that property
literal: every row is a pure md5 function of its sequence number, so a
restarted query re-reading [a, b) reproduces the batch bit-for-bit.

Scale shape: ``partitions(start, end)`` splits each micro-batch's offset
range across input partitions — rows are GENERATED IN EXECUTORS (the
driver only tracks the integer offset), exactly how a partition-parallel
Kafka/Kinesis reader hands work out.

Offset contract (learned the hard way): ``latestOffset()`` must report
the SOURCE's availability, never reader-local progress — the Python API
has no restore hook, so after a checkpoint restart a progress-counting
reader would report an offset BEHIND the committed one and Spark
replays the difference (reproduced: rows 50-149 emitted twice). Here
the whole feed up to ``maxOffset`` is declared available; growth over
time is the source option changing between runs, as with a topic
gaining data between restarts.

Options: ``maxOffset`` (feed end, default 1000 — finite so tests drain
it), ``rowsPerPartition`` (input-partition size cap, default 100),
``numPartitions`` (minimum split count, default 2).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

FEED_SCHEMA = "seq bigint, user_id bigint, event_type string, value double"

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _row_for(seq: int) -> tuple[int, int, str, float]:
    """The whole feed is this pure function — determinism by construction."""
    h = int(hashlib.md5(f"feed:{seq}".encode()).hexdigest()[:8], 16)
    return (
        seq,
        h % 50,
        _EVENT_TYPES[(h // 50) % len(_EVENT_TYPES)],
        (h % 10000) / 100.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EventFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.max_offset = int(options.get("maxoffset", 1000))
        self.rows_per_partition = int(options.get("rowsperpartition", 100))
        self.num_partitions = int(options.get("numpartitions", 2))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        # source AVAILABILITY, never reader progress (see module docstring)
        return {"seq": self.max_offset}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = max(1, (hi - lo + self.num_partitions - 1) // self.num_partitions)
        step = min(step, self.rows_per_partition)
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for seq in range(partition.start, partition.end):
            yield _row_for(seq)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint log; nothing to release


class EventFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventfeed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def streamReader(self, schema):
        return EventFeedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EventFeedDataSource)


def expected_rows(n: int) -> list[tuple[int, int, str, float]]:
    """Ground truth for tests: the first n rows of the feed."""
    return [_row_for(i) for i in range(n)]
