"""Time-series / semi-structured / skew-handling query pairs:

- as-of join (union-and-carry implementation vs DuckDB's native ASOF JOIN)
- JSON property extraction from the events props column (§2.12 JSON)
- salted two-phase aggregation and replicated-salted join — results must
  be EXACTLY the plain groupBy/join (only the shuffle distribution
  differs), which is precisely what the oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import derive, rangejoin, sessionize
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
    # try_cast: a malformed or non-numeric k (guaranteed in real-world
    # JSON) yields NULL instead of an ANSI NumberFormatException
    # (unicode-sweep class); the oracle mirrors with TRY_CAST
    k = F.expr("try_cast(get_json_object(props, '$.k') AS long)")
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
       sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
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


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (6h gap) + per-session stats.
    One shuffle on user_id; both windows and the final groupBy share it."""
    ev = load_table(spark, sf_dir, "events")
    stats = sessionize.session_stats(
        ev, "ts", by=["user_id"], gap_seconds=21600, value_col="value",
        tiebreak=["event_id"],
    )
    return stats.select(
        "user_id",
        "session_seq",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        derive.portable_round(F.col("sum_value"), 2).alias("sum_value"),
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 21600 SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts, value,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S')  AS session_start,
       count(*)                                AS n_events,
       floor(sum(value) * 100 + 0.5) / 100     AS sum_value
FROM sessioned
GROUP BY user_id, session_seq
"""


def range_join_error_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with an equi key: purchases of the SAME user within
    one hour after each error event. The equi key (user_id) carries the
    shuffle; the time-range predicate is a post-join filter — co-
    partitioned, no replication, scales with the key cardinality."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("error_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    joined = rangejoin.interval_join(
        purchases, errors, "purchase_ts", "error_ts", "error_end", by=["user_id"]
    )
    return joined.select(
        "user_id", "error_id", "purchase_id",
        derive.portable_round(F.col("value"), 2).alias("purchase_value"),
    )


RANGE_JOIN_SQL = """
SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id,
       floor(p.value * 100 + 0.5) / 100 AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id
 AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR
"""


# config-sized band dimension: [lo, hi) purchase-value bands
_VALUE_BANDS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("medium", 50.0, 150.0),
    ("large", 150.0, 1000000.0),
]


def band_join_purchase_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-dimension range join: classify purchase values into literal
    [lo, hi) bands. The band table is broadcast; the plan is a
    BroadcastNestedLoopJoin streaming the facts — zero fact shuffle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    bands = spark.createDataFrame(_VALUE_BANDS, ["band", "lo", "hi"])
    joined = rangejoin.band_join(purchases, "value", bands)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        derive.portable_round(F.sum("value"), 2).alias("sum_value"),
    )


BAND_JOIN_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('micro', 0.0, 10.0), ('small', 10.0, 50.0),
         ('medium', 50.0, 150.0), ('large', 150.0, 1000000.0)
)
SELECT band, count(*) AS n_purchases,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
WHERE event_type = 'purchase'
GROUP BY band
"""


def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time rolling 1-hour sum/count per user — a RANGE frame over
    ``unix_micros(ts)`` so the window is exact event-time (identical to
    an INTERVAL frame), not row-count. Partitioned on user_id: one
    shuffle, per-key frames, no global order anywhere."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        derive.portable_round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


ROLLING_SQL = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       floor(sum(value) OVER w * 100 + 0.5) / 100 AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def lead_gap_to_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() per user: exact microseconds until the user's next event
    (null on their last). Integer microsecond arithmetic on both engines
    — no float/interval comparison ambiguity."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("micros_to_next"),
    )


LEAD_GAP_SQL = """
SELECT event_id, user_id,
       lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         - epoch_us(ts) AS micros_to_next
FROM events
"""


def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per day — THE 100 TB cardinality
    operator (constant memory per group, partial-merge friendly, no
    distinct shuffle). No SQL oracle: sketch estimates are
    engine-specific; the error bound vs exact is pinned by unit test."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def approx_distinct_users_daily_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable gate for the HLL operator: the sketch estimate
    itself is engine-specific (no SQL oracle can reproduce it), so this
    variant emits the EXACT per-day distinct count plus a boolean asserting
    the HLL estimate lands within the pinned 5% bound — the oracle asserts
    the exact columns and TRUE. The production operator remains
    :func:`approx_distinct_users_daily` (no exact distinct — that is the
    whole point at 100 TB); this gate exists to turn the sketch's accuracy
    contract into a hard external CORRECTNESS row."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.approx_count_distinct("user_id", 0.02).alias("_hll"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bound = F.greatest(F.lit(1.0), F.lit(0.05) * F.col("exact_users"))
    return agg.select(
        "day",
        "exact_users",
        "n_events",
        (F.abs(F.col("_hll") - F.col("exact_users")) <= bound).alias("hll_within_5pct"),
    )


APPROX_DISTINCT_GATE_SQL = """
SELECT ts::DATE AS day, count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events, TRUE AS hll_within_5pct
FROM events GROUP BY 1
"""


def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: per-user daily activity densified over
    each user's [first_day, last_day] span (missing days exist with zero
    events — the precondition for any rolling/interpolation pass), then
    summarized per user.

    Scale shape: daily counts are ONE shuffle on (user, day); the spine is
    a per-user ``sequence`` explode of the user's own bounds (span-bounded
    fan-out, no global calendar cross join); spine⋈daily co-partitions on
    the same (user, day) key. Cost tracks Σ per-user spans, never
    |users| × |global calendar|.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("_lo", "_hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    filled = spine.join(daily, ["user_id", "day"], "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0))
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("n_events") == 0, 1).otherwise(0)).cast("long").alias("n_gap_days"),
        F.sum("n_events").cast("long").alias("total_events"),
    )


GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
filled AS (
  SELECT s.user_id, s.day, coalesce(d.n_events, 0) AS n_events
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id,
       count(*)::BIGINT AS n_days,
       sum(CASE WHEN n_events = 0 THEN 1 ELSE 0 END)::BIGINT AS n_gap_days,
       sum(n_events)::BIGINT AS total_events
FROM filled
GROUP BY user_id
"""


def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): one row per
    stage with the number of users who reached it IN ORDER (each stage's
    first occurrence strictly after the previous stage's).

    Scale shape: one shuffle on user_id — the per-user stage timestamps
    are conditional min aggregates of a single groupBy; the funnel logic
    is then pure row arithmetic on one row per user, and the final stage
    explode is constant-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.unix_micros("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias("t_buy"),
    )
    # strict event-time ordering: a click counts only after the first
    # view, a purchase only after that click
    reached = per_user.select(
        F.col("t_view").isNotNull().alias("s1"),
        (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))).alias("s2"),
        (
            F.col("t_view").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_buy") > F.col("t_click"))
        ).alias("s3"),
    )
    agg = reached.agg(
        F.sum(F.when(F.col("s1"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("s2"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("s3"), 1).otherwise(0)).cast("long").alias("n3"),
    )
    stages = [("view", "n1"), ("view_click", "n2"), ("view_click_purchase", "n3")]
    return agg.select(
        F.posexplode(
            F.array(
                *[F.struct(F.lit(s).alias("stage"), F.col(c).alias("n_users")) for s, c in stages]
            )
        ).alias("stage_no", "_s")
    ).select(
        F.col("stage_no").cast("int").alias("stage_no"),
        F.col("_s.stage").alias("stage"),
        F.col("_s.n_users").alias("n_users"),
    )


FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)     AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)    AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
  FROM events GROUP BY user_id
),
reached AS (
  SELECT t_view IS NOT NULL AS s1,
         t_view IS NOT NULL AND t_click > t_view AS s2,
         t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click AS s3
  FROM per_user
),
agg AS (
  SELECT sum(CASE WHEN s1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN s2 THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN s3 THEN 1 ELSE 0 END)::BIGINT AS n3
  FROM reached
)
SELECT t.stage_no, t.stage, t.n_users
FROM agg, LATERAL (VALUES
  (0, 'view', n1), (1, 'view_click', n2), (2, 'view_click_purchase', n3)
) t(stage_no, stage, n_users)
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by signup week; for each
    (cohort week, weeks-since-signup offset) the count of cohort members
    active in that week. The canonical dashboard retention triangle.

    Scale shape: signup table is one filtered aggregate (shuffle on
    user); the activity join shuffles on user_id once; the final
    (cohort, offset) aggregate is triangle-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    joined = signup.join(activity, "user_id").filter(
        F.col("active_week") >= F.col("cohort_week")
    )
    return (
        joined.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            ((F.unix_micros(F.col("active_week")) - F.unix_micros(F.col("cohort_week")))
             / F.lit(7 * 24 * 3600 * 1_000_000)).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


RETENTION_SQL = """
WITH signup AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT strftime(s.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST((epoch_us(a.active_week) - epoch_us(s.cohort_week))
            // 604800000000::BIGINT AS INT) AS week_offset,
       count(DISTINCT s.user_id)::BIGINT AS n_active
FROM signup s JOIN activity a USING (user_id)
WHERE a.active_week >= s.cohort_week
GROUP BY 1, 2
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: counts of consecutive (event_type → next_event_type)
    transitions within each user's event stream — the Markov-chain view
    behind 'what do users do after X' dashboards.

    One shuffle on user_id (the lead window); the final aggregate is
    |event_types|² rows. Deterministic ordering via the event_id tiebreak.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )


TRANSITION_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
FROM pairs WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


def interpolate_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over each user's daily value series: days
    with no events get the straight line between the nearest known
    days (ends stay null). The classic time-series repair pass.

    Plan: daily sums (one shuffle on user+day), per-user calendar spine
    (sequence explode of the user's own bounds), then TWO ignore-null
    window carries (last-known-before, first-known-after) over ONE
    partitioned sort each direction — never a self-join against the
    known-points set. Integer day arithmetic; float only in the final
    lerp."""
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = ev.groupBy("user_id", "day").agg(F.sum("value").alias("v"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    grid = spine.join(daily, ["user_id", "day"], "left")
    w_past = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_future = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("v", ignorenulls=True).over(w_past)
    prev_d = F.last(F.when(F.col("v").isNotNull(), F.col("day")), ignorenulls=True).over(w_past)
    next_v = F.first("v", ignorenulls=True).over(w_future)
    next_d = F.first(F.when(F.col("v").isNotNull(), F.col("day")), ignorenulls=True).over(
        w_future
    )
    frac = F.datediff(F.col("day"), prev_d) / F.datediff(next_d, prev_d)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        prev_v + (next_v - prev_v) * frac
    )
    return grid.select(
        "user_id",
        "day",
        F.col("v").isNotNull().alias("observed"),
        F.round(interp, 4).alias("value"),
    )


INTERPOLATE_SQL = """
WITH daily AS (
  SELECT user_id, ts::DATE AS day, sum(value) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
grid AS (
  SELECT s.user_id, s.day, d.v
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
),
carried AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS prev_d,
         first_value(v IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS next_d
  FROM grid
  WINDOW wp AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day, v IS NOT NULL AS observed,
       round(CASE WHEN v IS NOT NULL THEN v
                  ELSE prev_v + (next_v - prev_v)
                       * (date_diff('day', prev_d, day)::DOUBLE
                          / date_diff('day', prev_d, next_d))
             END, 4) AS value
FROM carried
"""


def bloom_filtered_events_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: events ⋈ a selective customer slice
    (one market segment), with a broadcast Bloom bitmap of the dim keys
    pre-filtering events map-side BEFORE the join. Result ≡ the plain
    join (the exact join removes Bloom false positives), which is
    exactly what the oracle checks; the payoff at 100 TB is that the
    fact's shuffle input shrinks to ~the dim's selectivity instead of
    materializing every event row into the exchange.
    See operators.bloom (sizing math in the module docstring)."""
    from ..operators import bloom

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    )
    pre = bloom.bloom_prefilter(ev, "user_id", dim, "user_id")
    return (
        pre.join(dim, "user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            derive.portable_round(F.sum("value"), 2).alias("sum_value"),
        )
    )


BLOOM_JOIN_SQL = """
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value
FROM events
JOIN customer ON user_id = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY c_nationkey
"""


def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: per event_type per hour, open/high/low/close of
    ``value`` plus count and sum — the canonical time-bar rollup.

    One shuffle (the groupBy), open/close via ``min_by``/``max_by`` on a
    zero-padded (epoch-micros, event_id) STRING order key: struct ordering
    isn't portable to every engine's arg_min, a fixed-width string is —
    and the tie-break on event_id makes the bars deterministic even with
    colliding timestamps."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.withColumn("_ok", okey)
        .groupBy(
            F.col("event_type"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        )
        .agg(
            F.min_by("value", F.col("_ok")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("_ok")).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            derive.portable_round(F.sum("value"), 2).alias("sum_value"),
        )
    )


OHLC_SQL = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_start,
       arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                      || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                      || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
       count(*) AS n_events,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value
FROM events
GROUP BY 1, 2
"""


def ts_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (EDBT'19-style): find the 20 user
    subsequences of length 8 whose z-normalized shape best matches a
    literal query pattern (a spike: low-low-low-high-high-low-low-low).

    Plan shape: ONE shuffle (user_id window) builds each position's
    next-8 value array via a frame-bounded collect_list; the distance is
    a pure array expression (normalize window, squared distance to the
    normalized pattern); global top-k is a sort-limit (partial per
    partition). No self-join, no per-candidate pass — cost is linear in
    the event count.
    """
    pattern = [1.0, 1.0, 1.0, 8.0, 8.0, 1.0, 1.0, 1.0]
    p_mean = sum(pattern) / len(pattern)
    p_var = sum((x - p_mean) ** 2 for x in pattern) / len(pattern)
    p_norm = [(x - p_mean) / (p_var ** 0.5) for x in pattern]

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(0, 7)
    )
    win = F.collect_list(F.col("value")).over(w)
    df = ev.select("user_id", "event_id", win.alias("_w")).filter(F.size("_w") == 8)
    n = F.lit(8.0)
    mean = F.aggregate("_w", F.lit(0.0), lambda a, x: a + x) / n
    var = F.aggregate("_w", F.lit(0.0), lambda a, x: a + (x - mean) * (x - mean)) / n
    # constant series carry no shape: exclude zero-variance windows
    df = df.withColumn("_m", mean).withColumn("_v", var).filter(F.col("_v") > 0)
    znorm = F.transform("_w", lambda x: (x - F.col("_m")) / F.sqrt(F.col("_v")))
    pat = F.array(*[F.lit(x) for x in p_norm])
    dist = F.aggregate(
        F.zip_with(znorm, pat, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        df.select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            derive.portable_round(dist, 4).alias("dist"),
            dist.alias("_d"),
        )
        .orderBy(F.asc("_d"), F.asc("user_id"), F.asc("start_event_id"))
        .limit(20)
        .drop("_d")
    )


TS_PATTERN_SQL = """
WITH pat AS (
  SELECT [(x - 2.75) / sqrt(list_sum(list_transform([1.0,1.0,1.0,8.0,8.0,1.0,1.0,1.0],
            y -> (y - 2.75) * (y - 2.75))) / 8.0) FOR x IN [1.0,1.0,1.0,8.0,8.0,1.0,1.0,1.0]] AS p
),
win AS (
  SELECT user_id, event_id AS start_event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
  FROM events
),
stats AS (
  SELECT user_id, start_event_id, w,
         list_sum(w) / 8.0 AS m,
         list_sum(list_transform(w, x -> (x - list_sum(w) / 8.0) * (x - list_sum(w) / 8.0))) / 8.0 AS v
  FROM win WHERE len(w) = 8
),
scored AS (
  SELECT user_id, start_event_id,
         list_sum(list_transform(range(1, 9),
           i -> ((w[i] - m) / sqrt(v) - p[i]) * ((w[i] - m) / sqrt(v) - p[i]))) AS d
  FROM stats, pat WHERE v > 0
)
SELECT user_id, start_event_id, floor(d * 10000 + 0.5) / 10000 AS dist
FROM scored
ORDER BY d ASC, user_id ASC, start_event_id ASC
LIMIT 20
"""


def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day DISTINCT active users per day — the metric a plain
    range-frame can't express (COUNT(DISTINCT) doesn't compose over
    window frames).

    Two-level plan: (1) one shuffle collapses events to one row per DAY
    carrying that day's user SET (collect_set — bounded by daily actives);
    (2) a 7-row window unions and re-distincts the sets. The window is
    global-ordered but runs on a DAYS-sized table (three orders of
    magnitude smaller than events at any corpus scale), so the single
    task it serializes through holds days, never events. At extreme user
    cardinality swap the exact sets for KMV sketches (operators/dedup.py)
    — same two-level shape.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("_d")).agg(
        F.collect_set("user_id").alias("_users")
    )
    w = Window.orderBy("_d").rowsBetween(-6, 0)
    return daily.select(
        F.date_format("_d", "yyyy-MM-dd").alias("day"),
        F.size("_users").cast("long").alias("n_users_1d"),
        F.size(F.array_distinct(F.flatten(F.collect_list("_users").over(w))))
        .cast("long")
        .alias("n_users_7d"),
    )


ROLLING_7D_DISTINCT_SQL = """
WITH d AS (
  SELECT date_trunc('day', ts) AS dd, list(DISTINCT user_id) AS users
  FROM events GROUP BY 1
)
SELECT strftime(dd, '%Y-%m-%d') AS day,
       len(users) AS n_users_1d,
       len(list_distinct(flatten(
         list(users) OVER (ORDER BY dd ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       ))) AS n_users_7d
FROM d
"""


def session_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-SESSION ordered funnel: per user, how many 6h-gap sessions
    contain a purchase AT OR AFTER the session's first view — the
    composition of gap sessionization and the conditional-min funnel
    (event_funnel_conversion ranges over a user's whole history; this
    variant resets at every session boundary, which is how product
    funnels are actually reported).

    One user-keyed shuffle feeds everything: the session window, the
    first-view window (same partitioning — no second exchange), the
    per-session aggregate, and the per-user rollup."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize.sessionize(
        ev, "ts", by=["user_id"], gap_seconds=21600, tiebreak=["event_id"]
    )
    fw = Window.partitionBy("user_id", "session_seq")
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(fw)
    flagged = sess.withColumn("_fv", first_view)
    per = flagged.groupBy("user_id", "session_seq").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("_hv"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("_fv").isNotNull()
                & (F.col("ts") >= F.col("_fv")),
                1,
            ).otherwise(0)
        ).alias("_conv"),
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("_hv").cast("long").alias("n_view_sessions"),
        F.sum("_conv").cast("long").alias("n_converted"),
        derive.portable_round(
            F.sum("_conv") / F.greatest(F.sum("_hv"), F.lit(1)).cast("double"), 4
        ).alias("view_conversion"),
    )


SESSION_FUNNEL_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 21600 SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts, event_type,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
  FROM flagged
),
pv AS (
  SELECT user_id, session_seq, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id, session_seq) AS fv
  FROM sessioned
),
per AS (
  SELECT user_id, session_seq,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         max(CASE WHEN event_type = 'purchase' AND fv IS NOT NULL AND ts >= fv
                  THEN 1 ELSE 0 END) AS conv
  FROM pv GROUP BY 1, 2
)
SELECT user_id,
       count(*)::BIGINT AS n_sessions,
       sum(hv)::BIGINT AS n_view_sessions,
       sum(conv)::BIGINT AS n_converted,
       floor(sum(conv) / greatest(sum(hv), 1)::DOUBLE * 10000 + 0.5) / 10000
         AS view_conversion
FROM per GROUP BY 1
"""


def seasonal_trend_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal/trend decomposition of the daily value series
    (the moving-average core of STL): trend = centered 7-row moving
    average, seasonal = mean detrended value per day-of-week, residual =
    the rest. Days without a full 7-row window are dropped (no trend).

    Exactness design: daily totals are integer CENTS; the 7-row sum and
    the detrended values ``7·cents − sum7`` stay integers; the per-dow
    seasonal mean is one integer-ratio division — so every emitted float
    is a single correctly-rounded IEEE op on exact integers, identical
    in any engine (no float accumulation anywhere).

    Scale shape: one day-keyed aggregate off the scan; every window and
    join after it runs on the DAY-level table — bounded by the calendar,
    not the corpus (the same provably-reduced-set argument as the other
    day-grain windows). The 7-row window is row-based over observed days
    on BOTH sides (identical semantics even if the calendar has holes)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100).cast("long")
        ).alias("_cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    full7 = (
        daily.select(
            "day",
            "_cents",
            F.sum("_cents").over(w).alias("_sum7"),
            F.count(F.lit(1)).over(w).alias("_n7"),
        )
        .filter(F.col("_n7") == 7)
        .withColumn("_dow", F.dayofweek("day") - 1)
    )
    seas = full7.groupBy("_dow").agg(
        F.sum(F.col("_cents") * 7 - F.col("_sum7")).alias("_sd"),
        F.count(F.lit(1)).alias("_nd"),
    )
    seasonal = F.col("_sd") / (F.col("_nd") * 700.0)
    return full7.join(F.broadcast(seas), "_dow").select(
        "day",
        derive.portable_round(F.col("_cents") / 100.0, 4).alias("value"),
        derive.portable_round(F.col("_sum7") / 700.0, 4).alias("trend"),
        derive.portable_round(seasonal, 4).alias("seasonal"),
        derive.portable_round(
            (F.col("_cents") * 7 - F.col("_sum7")) / 700.0 - seasonal, 4
        ).alias("residual"),
    )


SEASONAL_DECOMPOSE_SQL = """
WITH daily AS (
  SELECT ts::DATE AS day,
         sum(CAST(round(coalesce(value, 0.0) * 100) AS BIGINT))::BIGINT AS cents
  FROM events GROUP BY 1
),
win AS (
  SELECT day, cents,
         sum(cents) OVER w AS sum7,
         count(*) OVER w AS n7
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
full7 AS (
  SELECT day, cents, sum7, extract(dow FROM day)::INT AS dow
  FROM win WHERE n7 = 7
),
seas AS (
  SELECT dow, sum(cents * 7 - sum7)::BIGINT AS sd, count(*)::BIGINT AS nd
  FROM full7 GROUP BY 1
)
SELECT day,
       floor(cents / 100.0 * 10000 + 0.5) / 10000 AS value,
       floor(sum7 / 700.0 * 10000 + 0.5) / 10000 AS trend,
       floor(sd / (nd * 700.0) * 10000 + 0.5) / 10000 AS seasonal,
       floor(((cents * 7 - sum7) / 700.0 - sd / (nd * 700.0)) * 10000 + 0.5) / 10000
         AS residual
FROM full7 JOIN seas USING (dow)
"""


def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decay-weighted user feature: exponentially-weighted moving average
    (α=1/2) of each user's last 16 event values — the classic recency
    feature an online model consumes (recent behavior dominates, old
    behavior decays geometrically).

    Exactness design: α=1/2 makes every weight a power of two, so the
    weighted sum is ``Σ cents·2^(16−rank)`` — pure BIGINT shifts — and
    the normalizer ``2^16 − 2^(16−n)`` is exact for any history length
    n ≤ 16. The ONE float op is the final division. No float powers, no
    float accumulation, bit-identical in any engine.

    Scale shape: one user-keyed shuffle feeds both the recency window
    and the final aggregate (same key, exchange reused)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
            .cast("long")
            .alias("_cents"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 16)
    )
    agg = recent.groupBy("user_id").agg(
        F.sum(F.col("_cents") * F.expr("shiftleft(1L, 16 - _rn)")).alias("_sw"),
        F.count(F.lit(1)).cast("long").alias("n_events_used"),
    )
    denom = F.expr("shiftleft(1L, 16) - shiftleft(1L, 16 - cast(n_events_used AS INT))")
    return agg.select(
        "user_id",
        "n_events_used",
        derive.portable_round(F.col("_sw") / (denom * 100.0), 4).alias("ewma_value"),
    )


EWMA_SQL = """
WITH recent AS (
  SELECT user_id,
         CAST(round(coalesce(value, 0.0) * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
agg AS (
  SELECT user_id,
         sum(cents * (1::BIGINT << (16 - rn)))::BIGINT AS sw,
         count(*)::BIGINT AS n_events_used
  FROM recent WHERE rn <= 16
  GROUP BY 1
)
SELECT user_id, n_events_used,
       floor(sw / (((1::BIGINT << 16) - (1::BIGINT << (16 - n_events_used::INT))) * 100.0)
             * 10000 + 0.5) / 10000 AS ewma_value
FROM agg
"""


def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: deterministic 50/50 user split (hash
    wheel), conversion = the user made at least one purchase above 150
    (≈45% convert on this data, so the statistic is genuinely
    non-degenerate), and the two-proportion pooled z-statistic for the
    arm difference — the readout every A/B platform computes.

    Exactness: all inputs are integer counts; rates, the pooled
    variance, and the z-score compose from correctly-rounded IEEE
    divisions and one sqrt, written with the identical expression shape
    on both sides — no accumulation, no transcendental beyond sqrt
    (correctly rounded in every engine).

    Scale shape: one user-keyed aggregate off the scan, then a single
    global roll-up of per-user 0/1 flags (two-phase, map-side partials);
    the output is ONE row regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("_conv")
    )
    from ..operators.sampling import hash_bucket

    arms = users.withColumn("_arm", hash_bucket(F.col("user_id"), "ab") % 2)
    stats = arms.agg(
        F.sum(F.when(F.col("_arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("_arm") == 0, F.col("_conv")).otherwise(0)).cast("long").alias("conv_a"),
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("_arm") == 1, F.col("_conv")).otherwise(0)).cast("long").alias("conv_b"),
    )
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    var = pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    # guards: an empty arm or a degenerate pooled rate (0 or 1) has no
    # defined z — emit NULL, identically on both sides (ANSI division)
    rate_diff = F.when(both, p_a - p_b)
    z = F.when(both & (F.when(both, var) > 0), (p_a - p_b) / F.sqrt(var))
    return stats.select(
        "n_a", "conv_a", "n_b", "conv_b",
        derive.portable_round(rate_diff, 6).alias("rate_diff"),
        derive.portable_round(z, 4).alias("zscore"),
    )


AB_TEST_SQL = """
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv,
         ('0x' || substr(md5(user_id::VARCHAR || 'ab'), 1, 8))::BIGINT % 10000 % 2 AS arm
  FROM events GROUP BY user_id
),
s AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT AS conv_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)::BIGINT AS conv_b
  FROM users
),
g AS (
  SELECT *,
         CASE WHEN n_a > 0 AND n_b > 0
              THEN ((conv_a + conv_b) / (n_a + n_b))
                   * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                   * (1.0 / n_a + 1.0 / n_b) END AS var
  FROM s
)
SELECT n_a, conv_a, n_b, conv_b,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN floor((conv_a / n_a - conv_b / n_b) * 1000000 + 0.5) / 1000000
       END AS rate_diff,
       CASE WHEN var > 0
            THEN floor((conv_a / n_a - conv_b / n_b) / sqrt(var) * 10000 + 0.5) / 10000
       END AS zscore
FROM g
"""


def late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-arrival audit — the measurement that SIZES a
    streaming watermark: treating event_id as arrival order, how far
    behind each user's running event-time high-water mark do events
    arrive? Per event type: how many arrive out of order, the worst and
    total lateness (exact integer microseconds), and the count a
    10-minute watermark would drop. One shuffle on user_id feeds the
    running-max window; the summary is a dimension-sized groupBy."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hwm = F.max(F.unix_micros(F.col("ts"))).over(w)
    late_us = F.greatest(
        F.lit(0), F.coalesce(hwm, F.lit(0)) - F.unix_micros(F.col("ts"))
    )
    return (
        ev.select("event_type", late_us.alias("late_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("late_us") > 0).cast("long")).alias("n_out_of_order"),
            F.max("late_us").alias("max_late_us"),
            F.sum("late_us").alias("sum_late_us"),
            F.sum((F.col("late_us") > 600 * 1_000_000).cast("long")).alias(
                "n_dropped_by_10m_watermark"
            ),
        )
    )


LATE_DATA_SQL = """
WITH l AS (
  SELECT event_type,
         greatest(0, coalesce(max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     - epoch_us(ts)) AS late_us
  FROM events
)
SELECT event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order,
       CAST(max(late_us) AS BIGINT) AS max_late_us,
       CAST(sum(late_us) AS BIGINT) AS sum_late_us,
       CAST(sum(CASE WHEN late_us > 600 * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_by_10m_watermark
FROM l GROUP BY 1
"""


PATH_TOPK = 10


def session_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the top-10 three-step event-type paths users
    actually walk inside a session (6 h gap rule) — the product-analytics
    view behind funnel design. One shuffle on user_id feeds the gap
    flag, the session counter, and the per-session ordered collect; the
    path explode is session-length-bounded and the top-k is a sort-limit
    over the |paths|-bounded count table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 21600 * 1_000_000)
    ).cast("long")
    sess = (
        ev.withColumn("_new", is_new)
        .withColumn(
            "sid",
            F.sum("_new").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    arrs = sess.groupBy("user_id", "sid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(unix_micros(ts) AS t, "
            "event_id AS e, event_type AS ty))), s -> s.ty)"
        ).alias("a")
    )
    paths = arrs.filter(F.size("a") >= 3).select(
        "user_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(a) - 2), "
                "i -> concat_ws('>', a[i-1], a[i], a[i+1]))"
            )
        ).alias("path"),
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("user_id").alias("n_users"),
    )
    top = counts.orderBy(F.col("n_occurrences").desc(), "path").limit(PATH_TOPK)
    rank_w = Window.orderBy(F.col("n_occurrences").desc(), "path")  # 10-row result
    return top.select(
        F.row_number().over(rank_w).cast("long").alias("path_rank"),
        "path",
        "n_occurrences",
        "n_users",
    )


SESSION_PATH_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 21600 SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
arrs AS (
  SELECT user_id, sid, list(event_type ORDER BY ts, event_id) AS a
  FROM sess GROUP BY 1, 2
),
paths AS (
  SELECT user_id, a[i] || '>' || a[i + 1] || '>' || a[i + 2] AS path
  FROM (SELECT user_id, a, unnest(range(1, len(a) - 1)) AS i
        FROM arrs WHERE len(a) >= 3)
),
counts AS (
  SELECT path, count(*) AS n_occurrences, count(DISTINCT user_id) AS n_users
  FROM paths GROUP BY 1
),
top AS (SELECT * FROM counts ORDER BY n_occurrences DESC, path LIMIT {PATH_TOPK})
SELECT row_number() OVER (ORDER BY n_occurrences DESC, path) AS path_rank,
       path, n_occurrences, n_users
FROM top
"""


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: score the seasonal-naive predictor (day d's
    value = day d-7's value) over the daily per-type revenue series —
    the baseline every forecasting pipeline must beat, with MAE and
    bias in exact integer cents. One shuffle to the daily series; the
    lag window and the error aggregate run over |types| × |days| rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.withColumn("pred", F.lag("cents", 7).over(w)).filter(
        F.col("pred").isNotNull()
    )
    err = F.col("cents") - F.col("pred")
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.sum(F.abs(err)).alias("sum_abs_err_cents"),
        F.sum(err).alias("bias_cents"),
        F.expr("sum(abs(cents - pred)) DIV count(*)").alias("mae_cents"),
    )


SEASONAL_NAIVE_SQL = """
WITH daily AS (
  SELECT event_type, ts::DATE AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, cents,
         lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred
  FROM daily
)
SELECT event_type, count(*) AS n_days_scored,
       CAST(sum(abs(cents - pred)) AS BIGINT) AS sum_abs_err_cents,
       CAST(sum(cents - pred) AS BIGINT) AS bias_cents,
       CAST(sum(abs(cents - pred)) // count(*) AS BIGINT) AS mae_cents
FROM scored WHERE pred IS NOT NULL
GROUP BY 1
"""


def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for semi-structured props: parse each
    JSON payload ONCE into the binary variant encoding, then extract
    typed fields with ``variant_get`` — the engine-native successor to
    per-path ``get_json_object`` string re-parsing (one parse amortizes
    across any number of extractions; the variant encoding is also the
    open-table-format interchange type). Results must equal the
    string-path ``json_props_extract`` exactly; per-type stats include
    min/max so more than the sum is pinned."""
    ev = load_table(spark, sf_dir, "events")
    # try_variant_get: non-coercible k yields NULL, not a runtime error
    # (unicode-sweep class); the oracle mirrors with TRY_CAST
    k = F.expr("try_variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_with_k"),
        )
    )


VARIANT_PROPS_SQL = """
SELECT event_type,
       sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k,
       count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
FROM events
GROUP BY event_type
"""


CORR_WINDOW = 6  # current day + 6 preceding = 7-day window


def rolling_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the daily purchase
    revenue and the daily click count — the co-movement monitor behind
    "are clicks still converting?". All five moments accumulate exactly
    over the |days|-sized daily table (one corpus shuffle); the only
    float math is the final fraction, written identically on both
    engines (sqrt is correctly rounded IEEE), with a 6-dp portable
    round. Degenerate windows (zero variance) emit NULL.

    Headroom (r9 --bigmoney sweep catch): the original BIGINT x·x
    wrapped once daily cents passed ~3e9 (x² > 9.2e18) — far BELOW a
    100 TB day's revenue. The quadratic moments now ride
    decimal(38,0)/HUGEINT per the house rule (safe to x ~ 1e16 cents/
    day with n = 7: n·sxx ≤ ~5e33); the linear sums stay int64."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum((F.col("event_type") == "click").cast("long")).alias("y"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-CORR_WINDOW, 0)  # |days|-sized series
    dec = "decimal(38,0)"
    m = (
        daily.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("sx", F.sum("x").over(w))
        .withColumn("sy", F.sum("y").over(w))
        .withColumn("sxx", F.sum(F.col("x").cast(dec) * F.col("x")).over(w))
        .withColumn("syy", F.sum(F.col("y").cast(dec) * F.col("y")).over(w))
        .withColumn("sxy", F.sum(F.col("x").cast(dec) * F.col("y")).over(w))
        .filter(F.col("n") == CORR_WINDOW + 1)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")
    corr = F.when(
        (vx > 0) & (vy > 0),
        F.floor(
            num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))) * 1000000
            + F.lit(0.5)
        )
        / 1000000,
    )
    return m.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        "y",
        corr.alias("corr_7d"),
    )


ROLLING_CORR_SQL = f"""
WITH daily AS (
  SELECT ts::DATE AS day,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
m AS (
  SELECT day, x, y,
         count(*) OVER w AS n,
         CAST(sum(x) OVER w AS BIGINT) AS sx, CAST(sum(y) OVER w AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) OVER w AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) OVER w AS HUGEINT) AS sxy
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {CORR_WINDOW} PRECEDING AND CURRENT ROW)
)
SELECT strftime(day, '%Y-%m-%d') AS day, x, y,
       CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx > 0
             AND n * syy - CAST(sy AS HUGEINT) * sy > 0
            THEN floor((n * sxy - CAST(sx AS HUGEINT) * sy)
                       / (sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                       * 1000000 + 0.5)
                 / 1000000
       END AS corr_7d
FROM m WHERE n = {CORR_WINDOW + 1}
"""


def gap_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-SLA style report: p50/p95/p99 of the inter-event gap (in
    whole seconds) per event type — the distribution behind "how often
    does this signal tick?". Gaps come from one user-keyed lag window;
    the exact percentile_disc thresholds come from the shared
    histogram-percentile operator (`cleaning.histogram_disc_percentiles`
    — second call site, property-tested), so no per-type row sort ever
    happens: the cumulative window runs over the gap-value histogram."""
    from ..operators import cleaning

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_s = (
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 1_000_000
    ).cast("long")
    gaps = (
        ev.withColumn("gap_s", gap_s)
        .filter(F.col("gap_s").isNotNull())
        .select("event_type", "gap_s")
    )
    _, th = cleaning.histogram_disc_percentiles(
        gaps,
        "event_type",
        "gap_s",
        {"p50_s": (50, 100), "p95_s": (95, 100), "p99_s": (99, 100)},
    )
    counts = gaps.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_gaps"))
    return th.join(counts, "event_type").select(
        "event_type", "n_gaps", "p50_s", "p95_s", "p99_s"
    )


GAP_PERCENTILES_SQL = """
WITH gaps AS (
  SELECT event_type,
         CAST((epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id, event_type
                     ORDER BY epoch_us(ts), event_id)) // 1000000 AS BIGINT) AS gap_s
  FROM events
),
g AS (SELECT * FROM gaps WHERE gap_s IS NOT NULL),
h AS (SELECT event_type, gap_s, count(*) AS c FROM g GROUP BY 1, 2),
c AS (
  SELECT event_type, gap_s, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY gap_s) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
       min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN gap_s END) AS p50_s,
       min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN gap_s END) AS p95_s,
       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN gap_s END) AS p99_s
FROM c GROUP BY 1
"""


def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) marketing attribution: each
    purchase's value credits the user's click touchpoints in the prior
    7 days — 40% to the first touch, 40% to the last, the middle 20%
    split across interior touches. Deterministic EXACT integer
    arithmetic: credits are basis points of the purchase; interior
    touches get floor(2000/n_mid) bp each and the earliest interior
    touch absorbs the remainder, so every purchase's credits sum to
    exactly 10000 bp (single-touch purchases: 10000 to that touch).

    Scale shape: the touch join is the user-keyed interval join (equi
    key carries the shuffle, the 7-day bound is a post-join filter);
    ranking runs per purchase (bounded by touches-per-user-week); the
    final aggregate is one groupBy on the touch."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("touch_id"), F.col("ts").alias("t_ts")
    )
    joined = purchases.join(clicks, "user_id").filter(
        (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w = Window.partitionBy("purchase_id").orderBy("t_ts", "touch_id")
    ranked = (
        joined.withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("purchase_id")))
        .withColumn("n_mid", F.greatest(F.col("n") - 2, F.lit(0)))
    )
    bp = (
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("pos") == 1, F.lit(4000))
        .when(F.col("pos") == F.col("n"), F.lit(4000))
        .otherwise(
            F.expr("2000 DIV n_mid")
            + F.when(F.col("pos") == 2, F.expr("2000 % n_mid")).otherwise(F.lit(0))
        )
    )
    # n == 2: first and last each take 4000, the undistributed middle
    # 2000 bp goes to the FIRST touch (documented house rule)
    bp = F.when((F.col("n") == 2) & (F.col("pos") == 1), F.lit(6000)).otherwise(bp)
    return (
        ranked.withColumn("bp", bp)
        .groupBy("touch_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("bp").alias("sum_bp"),
            F.sum(F.expr("cents * bp")).alias("credit_cents_x10000"),
        )
    )


POSITION_ATTRIB_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id AS touch_id, ts AS t_ts
  FROM events WHERE event_type = 'click'
),
j AS (
  SELECT p.*, c.touch_id, c.t_ts
  FROM p JOIN c USING (user_id)
  WHERE c.t_ts <= p.p_ts AND c.t_ts > p.p_ts - INTERVAL 7 DAY
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY purchase_id ORDER BY t_ts, touch_id) AS pos,
         count(*) OVER (PARTITION BY purchase_id) AS n,
         greatest(count(*) OVER (PARTITION BY purchase_id) - 2, 0) AS n_mid
  FROM j
),
b AS (
  SELECT *,
         CASE WHEN n = 1 THEN 10000
              WHEN n = 2 AND pos = 1 THEN 6000
              WHEN pos = 1 THEN 4000
              WHEN pos = n THEN 4000
              ELSE 2000 // n_mid + CASE WHEN pos = 2 THEN 2000 % n_mid ELSE 0 END
         END AS bp
  FROM r
)
SELECT touch_id, count(*) AS n_purchases,
       CAST(sum(bp) AS BIGINT) AS sum_bp,
       CAST(sum(cents * bp) AS BIGINT) AS credit_cents_x10000
FROM b GROUP BY 1
"""


def session_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: the maximum number of user sessions
    (6 h gap rule, [start, end) half-open) simultaneously open, and the
    first instant that peak is reached — the capacity number behind
    connection pools and autoscaling floors.

    Scale shape: sessions reduce from ONE user-keyed shuffle; the sweep
    is +1/−1 boundary events ordered by (ts, delta) — ends before
    starts at the same instant, so touching sessions never double-count
    — with a running sum over the session-boundary-sized set (2 rows
    per session, already reduced from the corpus; the global window
    rides the documented reduced-set exemption). Output is one row of
    exact integers."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 21600 * 1_000_000)
    ).cast("long")
    sess = (
        ev.withColumn("_new", is_new)
        .withColumn(
            "sid",
            F.sum("_new").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
        )
    )
    bounds = sess.select(
        F.col("start_us").alias("t"), F.lit(1).alias("delta")
    ).unionAll(sess.select(F.col("end_us").alias("t"), F.lit(-1).alias("delta")))
    sweep = bounds.withColumn(
        "running",
        F.sum("delta").over(
            Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    peak = sweep.agg(F.max("running").alias("peak_concurrent"))
    first_at = (
        sweep.join(F.broadcast(peak), F.col("running") == F.col("peak_concurrent"))
        .agg(F.min("t").alias("_at_us"))
    )
    n = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        n.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(first_at))
        .select(
            "n_sessions",
            "peak_concurrent",
            F.date_format(
                F.timestamp_micros(F.col("_at_us")), "yyyy-MM-dd HH:mm:ss"
            ).alias("first_peak_at"),
        )
    )


SESSION_PEAK_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 21600 SECOND
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
         ts
  FROM flagged
),
spans AS (
  SELECT user_id, sid, min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
  FROM sess GROUP BY 1, 2
),
bounds AS (
  SELECT start_us AS t, 1 AS delta FROM spans
  UNION ALL
  SELECT end_us AS t, -1 AS delta FROM spans
),
sweep AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM bounds
),
peak AS (SELECT CAST(max(running) AS BIGINT) AS peak_concurrent FROM sweep)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM spans) AS n_sessions,
       peak_concurrent,
       strftime(make_timestamp((SELECT min(t) FROM sweep, peak
                                WHERE running = peak_concurrent)),
                '%Y-%m-%d %H:%M:%S') AS first_peak_at
FROM peak
"""
