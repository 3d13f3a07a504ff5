"""CDC / upsert patterns (no Delta/Iceberg jars in this image, so MERGE is
emulated with the classic anti-join + union — the portable formulation):

- ``upsert``: updates win on key collision, untouched target rows survive.
- ``latest_version_compaction``: CDC-log compaction — latest record per
  key by (ts, tiebreak) via a partitioned row_number window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import derive
from ..session import load_table


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """updates ∪ (target ⟕anti updates): one broadcast/shuffle anti join +
    union — the MERGE INTO emulation."""
    survivors = target.join(updates.select(key), on=key, how="left_anti")
    return updates.unionByName(survivors)


def cdc_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target = pre-1999 orders; updates = 1998+ orders repriced. Overlap
    year (1998) must come back repriced exactly once."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.year("o_orderdate") < 1999).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price"), F.lit("v1").alias("version")
    )
    updates = orders.filter(F.year("o_orderdate") >= 1998).select(
        "o_orderkey",
        # portable_round: 2-dec prices × 1.1 land on exact .xx5 boundaries
        # where engine round() semantics diverge
        derive.portable_round(F.col("o_totalprice") * 1.1, 2).alias("price"),
        F.lit("v2").alias("version"),
    )
    return upsert(target, updates, "o_orderkey")


CDC_UPSERT_SQL = """
WITH target AS (
  SELECT o_orderkey, round(o_totalprice, 2) AS price, 'v1' AS version
  FROM orders WHERE year(o_orderdate) < 1999
), updates AS (
  SELECT o_orderkey, floor(o_totalprice * 1.1 * 100 + 0.5) / 100 AS price, 'v2' AS version
  FROM orders WHERE year(o_orderdate) >= 1998
)
SELECT * FROM updates
UNION ALL
SELECT * FROM target t WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
"""


def cdc_latest_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-log compaction: events as a change log per (user_id,
    event_type) key — keep only the latest record."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round("value", 2).alias("value"))
    )


CDC_COMPACTION_SQL = """
SELECT user_id, event_type, event_id, round(value, 2) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def scd2_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from a changelog: each event opens a
    validity interval [ts, next_ts) per user; the latest record is the
    current one. One partitioned lead() window — a single shuffle on
    user_id, the canonical distributed SCD2 formulation (no driver
    loop, no per-key collect)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"), F.lit("current")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
        F.round("value", 2).alias("value"),
    )


SCD2_SQL = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
       lead(ts) OVER w IS NULL AS is_current,
       round(value, 2) AS value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
