"""Round-8 wave-11 additions (registered during round 8 AFTER the r8
window was sealed — queued in _ROUND9_QUEUE, never displacing a planned
check): the three gaps the r7 verdict named —

* group-sequential monitoring: an O'Brien-Fleming boundary monitor over
  cumulative looks — the fixed-horizon sibling of the SPRT (the SPRT
  tests after EVERY user; a group-sequential design tests at K planned
  interim looks against inflation-controlled boundaries);
* weighted/stratified sampling: proportional allocation with
  largest-remainder rounding (the classical survey-sampling member the
  sampling module lacked — stratified_topn is equal-n, sqrt_mixture is
  rate-based; this one allocates a fixed BUDGET across strata exactly
  proportional to stratum weight);
* a KLL-style quantile sketch with an exact-rank gate (the CMS
  heavy-hitters precedent): one-shot level sampling with power-of-two
  weights — the standard distributed simplification of KLL's compactor
  hierarchy — gated against exactly-computed rank bounds.

House rules (see round8_queries): scalar outputs only, counts cast to
long, ratios as floor-form integer scalings, integer division only on
non-negative operands, no runtime transcendentals (sqrt of exact
integer-derived doubles is allowed — correctly-rounded IEEE, the
ab_test_zscore precedent), boundary/look constants computed ONCE in
Python and interpolated into BOTH engines, NULL inputs excluded by
mirrored filters, degenerate cells emit NULL via mirrored CASE.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import md5_int
from ..session import fan_out, load_table
from .round6_queries import _CENTS_SQL, _cents

# --- group-sequential O'Brien-Fleming monitor ---------------------------------

#: number of planned interim looks
GSQ_LOOKS = 5
#: O'Brien-Fleming final-look critical value for K=5 two-sided α=0.05
#: (O'Brien & Fleming 1979; standard table value). The k-th boundary is
#: C·sqrt(K/k) — computed HERE, once, in Python (the nDCG pre-floored
#: constant pattern) and interpolated into both engines as literals; no
#: runtime transcendental.
GSQ_OBF_C = 2.040
GSQ_BOUNDS = [
    round(GSQ_OBF_C * _math.sqrt(GSQ_LOOKS / k), 4) for k in range(1, GSQ_LOOKS + 1)
]  # [4.5616, 3.2255, 2.6336, 2.2808, 2.04]
#: conversion definition shared with ab_test_zscore (purchase above 150)
GSQ_CONV_MIN = 150


def group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming group-sequential A/B monitor: users enroll at
    their first event day, the enrollment calendar is cut into
    GSQ_LOOKS equal rank-buckets (ntile over the bounded distinct-day
    frame), and at each look the monitor tests the CUMULATIVE
    two-proportion z against the OBF boundary C·sqrt(K/k) — very strict
    early (4.56 σ at look 1), nominal at the end (2.04 σ) — spending
    almost no α on interim peeks. Completes the experimentation suite
    as the fixed-horizon sibling of sprt_conversion_monitor: the SPRT
    decides after every observation; OBF decides at K planned looks.

    Exactness: cumulative cell counts are exact int64 running sums over
    the ≤K-row look frame; z composes correctly-rounded IEEE divisions
    and one sqrt of integer-valued doubles with the identical expression
    shape on both sides (the ab_test_zscore precedent); boundaries are
    Python-computed literals; ``crossed`` compares the FLOOR-ROUNDED z
    (4 dp) against the 4-dp boundary literal, so both engines compare
    identical doubles. Degenerate looks (an empty arm or zero pooled
    variance) emit NULL z and NULL crossed via mirrored CASE.

    Scale shape: one user-keyed aggregate off the scan (the only
    data-sized shuffle), a distinct-day frame (calendar-bounded) for
    the ntile look assignment joined back as a broadcast, a (look, arm)
    aggregate to ≤2K rows, and running sums over the ≤K-row frame —
    the unpartitioned windows sit on aggregate-reduced, look-bounded
    frames."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # NULL-day users (all-NULL ts) are excluded in BOTH engines BEFORE the
    # ntile: Spark's ascending ntile sorts NULLS FIRST, DuckDB's NULLS
    # LAST, so a NULL day would shift every look-bucket boundary (the r6
    # bootstrap_ci NULL-ordering class, caught in this round's review)
    users = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("_day"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > GSQ_CONV_MIN),
                1,
            ).otherwise(0)
        ).alias("_conv"),
    ).filter(F.col("_day").isNotNull())
    arms = users.withColumn(
        "_arm", md5_int(F.concat(F.col("user_id").cast("string"), F.lit("gsq"))) % 2
    )
    days = (
        users.select("_day")
        .distinct()
        .withColumn("_look", F.ntile(GSQ_LOOKS).over(Window.orderBy("_day")))
    )
    looks = (
        arms.join(F.broadcast(days), "_day")
        .groupBy("_look")
        .agg(
            F.sum(F.when(F.col("_arm") == 0, 1).otherwise(0)).alias("_na"),
            F.sum(F.when(F.col("_arm") == 0, F.col("_conv")).otherwise(0)).alias("_ca"),
            F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("_nb"),
            F.sum(F.when(F.col("_arm") == 1, F.col("_conv")).otherwise(0)).alias("_cb"),
        )
    )
    w_cum = Window.orderBy("_look").rowsBetween(Window.unboundedPreceding, 0)
    cum = looks.select(
        "_look",
        F.sum("_na").over(w_cum).cast("long").alias("n_a"),
        F.sum("_ca").over(w_cum).cast("long").alias("conv_a"),
        F.sum("_nb").over(w_cum).cast("long").alias("n_b"),
        F.sum("_cb").over(w_cum).cast("long").alias("conv_b"),
    )
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    var = pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    z4 = F.floor(
        (p_a - p_b) / F.sqrt(var) * 10000 + F.lit(0.5)
    ) / 10000  # floor-form portable round, 4 dp
    bound = F.element_at(
        F.array(*[F.lit(b) for b in GSQ_BOUNDS]), F.col("_look").cast("int")
    )
    zcol = F.when(both & (F.when(both, var) > 0), z4)
    return cum.select(
        F.col("_look").cast("long").alias("look"),
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        zcol.alias("zscore"),
        bound.alias("boundary"),
        F.when(
            zcol.isNotNull(), F.when(F.abs(zcol) >= bound, 1).otherwise(0)
        ).cast("long").alias("crossed"),
    )


# exponent suffix forces DOUBLE literals in DuckDB (a bare 2.2806 would be
# DECIMAL, and DECIMAL→DOUBLE conversion can differ from the parsed double
# by 1 ulp); string→double parsing is correctly rounded in both engines, so
# these are bit-identical to Spark's F.lit(b)
_GSQ_BOUNDS_SQL = ", ".join(f"{b}e0" for b in GSQ_BOUNDS)

GSQ_SQL = f"""
WITH users AS (
  SELECT user_id, min(ts::DATE) AS day,
         max(CASE WHEN event_type = 'purchase' AND value > {GSQ_CONV_MIN}
                  THEN 1 ELSE 0 END) AS conv,
         ('0x' || substr(md5(user_id::VARCHAR || 'gsq'), 1, 8))::BIGINT % 2 AS arm
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
  HAVING min(ts::DATE) IS NOT NULL
),
days AS (
  SELECT day, ntile({GSQ_LOOKS}) OVER (ORDER BY day) AS look
  FROM (SELECT DISTINCT day FROM users)
),
looks AS (
  SELECT look,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS ca,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS cb
  FROM users JOIN days USING (day) GROUP BY look
),
cum AS (
  SELECT look,
         sum(na) OVER w AS n_a, sum(ca) OVER w AS conv_a,
         sum(nb) OVER w AS n_b, sum(cb) OVER w AS conv_b
  FROM looks
  WINDOW w AS (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
g AS (
  SELECT look, n_a, conv_a, n_b, conv_b,
         CASE WHEN n_a > 0 AND n_b > 0
              THEN ((conv_a + conv_b) / (n_a + n_b))
                   * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                   * (1.0 / n_a + 1.0 / n_b) END AS var,
         ([{_GSQ_BOUNDS_SQL}])[look]::DOUBLE AS boundary
  FROM cum
),
z AS (
  SELECT *, CASE WHEN var > 0
                 THEN floor((conv_a / n_a - conv_b / n_b) / sqrt(var)
                            * 10000 + 0.5) / 10000 END AS zscore
  FROM g
)
SELECT CAST(look AS BIGINT) AS look,
       CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
       zscore, boundary,
       CAST(CASE WHEN zscore IS NOT NULL
                 THEN CASE WHEN abs(zscore) >= boundary THEN 1 ELSE 0 END
            END AS BIGINT) AS crossed
FROM z
"""


# --- weighted stratified sample: largest-remainder proportional allocation ----

#: total sample budget allocated across strata
WALLOC_BUDGET = 100
WALLOC_SALT = "walloc"


def sample_weighted_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified weighted sample by PROPORTIONAL ALLOCATION with
    largest-remainder rounding (Hamilton's method): a fixed budget of
    WALLOC_BUDGET documents is split across language strata exactly
    proportional to each stratum's total character mass, fractional
    seats resolved by largest remainder (ties by lang); within each
    stratum the allocated rows are picked in deterministic md5-wheel
    order. The sampling module's missing member: stratified_topn is
    equal-n per stratum, sample_sqrt_mixture is per-row rate-based —
    neither hits an exact global budget ∝ weight. Budget contract: when
    a stratum's seat count exceeds its ROW count (one huge document),
    the whole stratum is taken and the global sample under-delivers —
    reported, not silent: the output carries stratum_size next to
    stratum_alloc, so alloc > size IS the shortfall signal (Hamilton's
    method is single-pass proportional; redistributing shortfalls would
    be a different estimator).

    Exactness: seats and remainders are exact integers — base_s =
    (B·w_s) div W and rem_s = (B·w_s) mod W on non-negative int64
    (headroom: B·w_s ≤ 100·total_chars, safe below ~9.2×10¹⁶ corpus
    chars; at larger corpora lift to decimal(38,0)); the remainder rank
    and the within-stratum pick rank are integer row_numbers with full
    tiebreaks. No floats anywhere.

    Scale shape: one |strata|-row weight aggregate; allocation math
    lives entirely on that bounded frame (its unpartitioned windows are
    |strata|-sized by construction); the pick is one PARTITIONED
    row_number per stratum joined to the broadcast allocation — a
    single data-sized shuffle on the stratum key."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") >= 0)
    )
    w_s = docs.groupBy("lang").agg(F.sum("n_chars").alias("_w"))
    tot = w_s.agg(F.sum("_w").alias("_tot"))
    seats = (
        w_s.crossJoin(F.broadcast(tot))
        .filter(F.col("_tot") > 0)
        .select(
            "lang",
            "_w",
            F.expr(f"(_w * {WALLOC_BUDGET}) div _tot").alias("_base"),
            F.expr(f"(_w * {WALLOC_BUDGET}) % _tot").alias("_rem"),
        )
    )
    # bounded |strata|-row frame: deficit + largest-remainder top-up
    w_all = Window.partitionBy()  # whole-frame total over the |strata| rows
    w_rem = Window.orderBy(F.desc("_rem"), F.asc("lang"))
    alloc = seats.select(
        "lang",
        "_w",
        "_base",
        (F.lit(WALLOC_BUDGET) - F.sum("_base").over(w_all)).alias("_deficit"),
        F.row_number().over(w_rem).alias("_rk"),
    ).select(
        "lang",
        "_w",
        (F.col("_base") + F.when(F.col("_rk") <= F.col("_deficit"), 1).otherwise(0)).alias(
            "_alloc"
        ),
    )
    w_lang = Window.partitionBy("lang")
    picked = (
        docs.select(
            "lang",
            "doc_id",
            md5_int(
                F.concat(F.col("doc_id").cast("string"), F.lit(WALLOC_SALT))
            ).alias("_h"),
        )
        .withColumn(
            "_pick",
            F.row_number().over(w_lang.orderBy("_h", "doc_id")),
        )
        .withColumn("_sz", F.count(F.lit(1)).over(w_lang))
        .join(F.broadcast(alloc), "lang")
        .filter(F.col("_pick") <= F.col("_alloc"))
    )
    return picked.select(
        "lang",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("_alloc").cast("long").alias("stratum_alloc"),
        F.col("_sz").cast("long").alias("stratum_size"),
        F.col("_pick").cast("long").alias("pick_rank"),
    )


WALLOC_SQL = f"""
WITH docs AS (
  SELECT lang, doc_id, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR || '{WALLOC_SALT}'), 1, 8))::BIGINT AS h
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND n_chars >= 0
),
w AS (SELECT lang, sum(n_chars) AS ws FROM docs GROUP BY lang),
tot AS (SELECT sum(ws) AS wt FROM w),
seats AS (
  SELECT lang, ws,
         (ws * {WALLOC_BUDGET}) // wt AS base,
         (ws * {WALLOC_BUDGET}) % wt AS rem
  FROM w, tot WHERE wt > 0
),
ranked AS (
  SELECT lang, base,
         row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk,
         {WALLOC_BUDGET} - sum(base) OVER () AS deficit
  FROM seats
),
alloc AS (
  SELECT lang, base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS alloc
  FROM ranked
),
picked AS (
  SELECT d.lang, d.doc_id, a.alloc,
         row_number() OVER (PARTITION BY d.lang ORDER BY d.h, d.doc_id) AS pick,
         count(*) OVER (PARTITION BY d.lang) AS sz
  FROM docs d JOIN alloc a ON d.lang = a.lang
)
SELECT lang,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(alloc AS BIGINT) AS stratum_alloc,
       CAST(sz AS BIGINT) AS stratum_size,
       CAST(pick AS BIGINT) AS pick_rank
FROM picked WHERE pick <= alloc
"""


# --- KLL-style level-sampling quantile sketch with exact-rank gate ------------

#: sketch capacity: the kept sample is at most ~2·KLL_CAPACITY rows
KLL_CAPACITY = 1024
KLL_SALT = "kll"
#: probed quantiles in basis points
KLL_PROBES_BP = [2500, 5000, 7500, 9000]
#: rank tolerance: |achieved − target| ≤ n·KLL_TOL_BP/10⁴ (plus tie slack)
KLL_TOL_BP = 1000


def kll_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL-style quantile sketch with an exact-rank gate (the
    cms_heavy_hitters precedent — estimate with a sketch, then verify
    the sketch's guarantee against exactly-computed truth): rows are
    subsampled at level L = max(0, ilog2(n) − ilog2(capacity)) by the
    md5 wheel (keep ⇔ hash ≡ 0 mod 2^L), each survivor carrying weight
    2^L — the one-shot level-sampling simplification of KLL's compactor
    hierarchy (Karnin-Lang-Liberty 2016): a uniform 2^-L coin realized
    deterministically, so BOTH engines build the identical sketch. The
    quantile estimate for probe q is the smallest kept value whose
    weighted rank reaches target = (q·n) div 10⁴; the gate then
    computes the TRUE rank interval of that estimate over the full data
    ([#rows < v, #rows ≤ v] — exact integers) and asserts the target
    falls within KLL_TOL_BP of it. Tie-robust by construction: under
    total ties the interval is [0, n] and every probe passes vacuously;
    at L = 0 the sketch IS the data and the gate is exact. Every probe
    ALWAYS emits a row (probes left-join the estimates): an
    under-sampled sketch that reaches no estimate for a probe reports
    gate_ok = 0 with NULL estimate — the failure the gate exists to
    detect is never silently dropped — and n = 0 passes vacuously.

    Exactness: ilog2 via length(bin(x)) (the logprob precedent), the
    level modulus 2^L via shiftleft, weighted ranks and rank intervals
    all exact int64; no floats at any point.

    Scale shape: one ungrouped count (map-side), one map-only filter to
    the ≤2·capacity kept frame (its unpartitioned rank window is
    capacity-bounded by construction), a broadcast of the |probes|-row
    estimate table back over ONE full scan for the exact-rank
    aggregate. Nothing data-sized shuffles; the sketch never exceeds
    2^(ilog2(capacity)+1) rows in expectation and concentrates sharply
    (Chernoff) — the gate itself is the evidence."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") >= 0)
    )
    vals = orders.select(
        F.col("o_orderkey").alias("_k"), _cents("o_totalprice").alias("_v")
    )
    meta = vals.agg(F.count(F.lit(1)).alias("_n")).select(
        "_n",
        F.expr(
            f"CAST(greatest(0, length(bin(_n)) - length(bin({KLL_CAPACITY})))"
            " AS INT)"
        ).alias("_lvl"),
    ).select("_n", "_lvl", F.expr("shiftleft(CAST(1 AS BIGINT), _lvl)").alias("_mod"))
    kept = (
        vals.crossJoin(F.broadcast(meta))
        .filter(
            md5_int(F.concat(F.col("_k").cast("string"), F.lit(KLL_SALT)))
            % F.col("_mod")
            == 0
        )
        .select(
            "_v",
            "_k",
            "_n",
            "_lvl",
            "_mod",
            F.row_number().over(Window.orderBy("_v", "_k")).alias("_rn"),
        )
    )
    probes = spark.createDataFrame(
        [(q,) for q in KLL_PROBES_BP], ["q_bp"]
    ).select(F.col("q_bp").cast("long").alias("q_bp"))
    est = (
        kept.join(F.broadcast(probes))
        .filter(
            F.col("_rn") * F.col("_mod") >= F.expr("(q_bp * _n) div 10000")
        )
        .groupBy("q_bp")
        .agg(F.min("_v").alias("est_cents"))
    )
    ranks = (
        vals.crossJoin(F.broadcast(est))
        .groupBy("q_bp", "est_cents")
        .agg(
            F.sum(F.when(F.col("_v") < F.col("est_cents"), 1).otherwise(0)).alias(
                "_lo"
            ),
            F.sum(F.when(F.col("_v") <= F.col("est_cents"), 1).otherwise(0)).alias(
                "_hi"
            ),
        )
    )
    # probes LEFT-join the estimates so a probe NEVER silently vanishes
    # (review catch): if the sketch under-samples and no kept row's
    # weighted rank reaches the target, the probe row survives with
    # gate_ok = 0 — the sketch failure is REPORTED, not dropped. n = 0 is
    # the vacuous-pass case (the sketch of nothing is exact).
    base = probes.crossJoin(F.broadcast(meta)).join(ranks, "q_bp", "left")
    tol = F.expr(f"({KLL_TOL_BP} * _n) div 10000")
    target = F.expr("(q_bp * _n) div 10000")
    return base.select(
        "q_bp",
        F.col("_n").cast("long").alias("n_rows"),
        F.col("_lvl").cast("long").alias("level"),
        F.col("est_cents").cast("long").alias("est_cents"),
        F.col("_lo").cast("long").alias("rank_lo"),
        F.col("_hi").cast("long").alias("rank_hi"),
        target.cast("long").alias("target_rank"),
        F.when(F.col("_n") == 0, 1)
        .when(F.col("est_cents").isNull(), 0)
        .when(
            (target >= F.col("_lo") + 1 - tol) & (target <= F.col("_hi") + tol),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("gate_ok"),
    )


_KLL_PROBES_SQL = ", ".join(str(q) for q in KLL_PROBES_BP)

KLL_SQL = f"""
WITH vals AS (
  SELECT o_orderkey AS k, {_CENTS_SQL.format(x="o_totalprice")} AS v
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0
),
meta AS (
  SELECT n, lvl, (1::BIGINT << lvl) AS md FROM (
    SELECT count(*) AS n,
           greatest(0, length(bin(count(*))) - length(bin({KLL_CAPACITY}))) AS lvl
    FROM vals)
),
kept AS (
  SELECT v, k, n, lvl, md,
         row_number() OVER (ORDER BY v, k) AS rn
  FROM vals, meta
  WHERE ('0x' || substr(md5(k::VARCHAR || '{KLL_SALT}'), 1, 8))::BIGINT % md = 0
),
probes AS (SELECT unnest([{_KLL_PROBES_SQL}])::BIGINT AS q_bp),
est AS (
  SELECT q_bp, min(v) AS est_cents
  FROM kept JOIN probes ON rn * md >= (q_bp * n) // 10000
  GROUP BY q_bp
),
ranks AS (
  SELECT q_bp, est_cents,
         sum(CASE WHEN v < est_cents THEN 1 ELSE 0 END) AS lo,
         sum(CASE WHEN v <= est_cents THEN 1 ELSE 0 END) AS hi
  FROM vals, est
  GROUP BY q_bp, est_cents
)
SELECT q_bp,
       CAST(n AS BIGINT) AS n_rows,
       CAST(lvl AS BIGINT) AS level,
       CAST(est_cents AS BIGINT) AS est_cents,
       CAST(lo AS BIGINT) AS rank_lo,
       CAST(hi AS BIGINT) AS rank_hi,
       CAST((q_bp * n) // 10000 AS BIGINT) AS target_rank,
       CAST(CASE WHEN n = 0 THEN 1
                 WHEN est_cents IS NULL THEN 0
                 WHEN (q_bp * n) // 10000 >= lo + 1 - ({KLL_TOL_BP} * n) // 10000
                  AND (q_bp * n) // 10000 <= hi + ({KLL_TOL_BP} * n) // 10000
                 THEN 1 ELSE 0 END AS BIGINT) AS gate_ok
FROM probes CROSS JOIN meta LEFT JOIN ranks USING (q_bp)
"""
