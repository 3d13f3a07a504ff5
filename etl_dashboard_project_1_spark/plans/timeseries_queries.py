"""Time-series / semi-structured / skew-handling query pairs:

- as-of join (union-and-carry implementation vs DuckDB's native ASOF JOIN)
- JSON property extraction from the events props column (§2.12 JSON)
- salted two-phase aggregation and replicated-salted join — results must
  be EXACTLY the plain groupBy/join (only the shuffle distribution
  differs), which is precisely what the oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.skew import replicated_salted_join, salted_aggregate
from ..session import load_table


def asof_signup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase attributed to the user's latest prior-or-equal signup.
    Linear union-and-carry plan — one shuffle on user_id, no range-join
    explosion."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, signups, on="ts", by=["user_id"], right_payload=["value"]
    )
    # carry the signup ts too: payload trick on the ts column itself
    joined_ts = asof_join(
        purchases,
        signups.select("user_id", "ts", F.col("ts").alias("signup_ts")),
        on="ts",
        by=["user_id"],
        right_payload=["signup_ts"],
    ).select("event_id", F.col("signup_ts_asof"))
    return (
        joined.select("event_id", "user_id", F.round("value_asof", 2).alias("signup_value"))
        .join(joined_ts, "event_id")
        .select(
            "event_id",
            "user_id",
            F.date_format("signup_ts_asof", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
            "signup_value",
        )
    )


ASOF_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     s AS (SELECT * FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       round(s.value, 2) AS signup_value
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column, typed, aggregated."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_with_k"),
        )
    )


JSON_PROPS_SQL = """
SELECT event_type,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       count(json_extract_string(props, '$.k'))        AS n_with_k
FROM events
GROUP BY event_type
"""


def salted_agg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation ≡ plain groupBy (the oracle IS the
    plain groupBy — salting must not change results)."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["user_id"],
        aggs={
            "n_events": ("count", "event_id"),
            "total_value": ("sum", "value"),
            "max_value": ("max", "value"),
        },
        salt_buckets=8,
        salt_source="event_id",
    )
    return out.select(
        "user_id",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
        F.round("max_value", 2).alias("max_value"),
    )


SALTED_AGG_SQL = """
SELECT user_id, count(event_id) AS n_events,
       round(sum(value), 2) AS total_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY user_id
"""


def salted_join_events_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated-salted equi join ≡ the plain join, row for row."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = replicated_salted_join(ev, dim, key="user_id", salt_buckets=8)
    return joined.select("event_id", "user_id", "c_mktsegment")


SALTED_JOIN_SQL = """
SELECT event_id, user_id, c_mktsegment
FROM events JOIN customer ON user_id = c_custkey
"""
