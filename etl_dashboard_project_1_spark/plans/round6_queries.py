"""Round-6 additions: feature-engineering and association analytics the
training-data pipeline still lacked — leave-one-out target encoding (the
leakage-free categorical encoder), a contingency association audit
(chi² + mutual information over one shared integer contingency table),
a nearest-tolerance as-of match (the bidirectional cousin of
``asof_signup_attribution``), and per-day time-weighted average value
(TWAP — duration-weighted, not row-weighted, means).

House rules (see oracle_harness / driver canon): scalar outputs only
(never array/map/struct), counts cast to long, ratios as floor-form
integer scalings, integer division only on non-negative operands (Spark
``div`` truncates toward zero, DuckDB ``//`` floors — they agree only
there), every window with a running/lead/lag over ts carries an
``event_id`` tiebreak in BOTH engines, and shared constants are
interpolated into both from the same Python value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table


def _cents(col: Column | str) -> Column:
    """floor(x*100 + 0.5) — the portable_round form; F.round would
    half-round differently from DuckDB's round on boundary values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


#: DuckDB spelling of _cents — keep the two in sync.
_CENTS_SQL = "CAST(floor({x} * 100 + 0.5) AS BIGINT)"


# --- leave-one-out target encoding -------------------------------------------

def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer market segment
    against order value: each order's encoded feature is the mean order
    value (cents) of its segment EXCLUDING the order itself — the
    standard leakage-free categorical encoder for tree/linear models
    (a plain segment mean would leak each row's own target into its
    feature; LOO is what production feature stores actually ship).

    Exactness: loo = (seg_sum − own) // (seg_n − 1) — non-negative
    integer division, identical in both engines; NULL when the segment
    has a single order (no leave-one-out population exists).

    Scale shape: one orders⋈customer equi-join (customer is the smaller
    relation; at warehouse scale this is the fact→dim join AQE plans as
    broadcast when the dim fits), one |segments|-row aggregate that IS
    broadcast, and a map-side re-join — the per-row encoding never
    shuffles the fact table a second time."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    fact = orders.select(
        "o_orderkey",
        "o_custkey",
        _cents("o_totalprice").alias("own_cents"),
    ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
    stats = fact.groupBy("segment").agg(
        F.sum("own_cents").alias("seg_sum"),
        F.count(F.lit(1)).alias("seg_n"),
    )
    return (
        fact.join(F.broadcast(stats), "segment")
        .select(
            "o_orderkey",
            "segment",
            "own_cents",
            F.when(
                F.col("seg_n") > 1,
                F.expr("(seg_sum - own_cents) div (seg_n - 1)"),
            )
            .cast("long")
            .alias("loo_cents"),
        )
    )


TARGET_ENCODE_SQL = f"""
WITH fact AS (
  SELECT o_orderkey,
         c_mktsegment AS segment,
         {_CENTS_SQL.format(x="o_totalprice")} AS own_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
stats AS (
  SELECT segment, sum(own_cents) AS seg_sum, count(*) AS seg_n
  FROM fact GROUP BY 1
)
SELECT o_orderkey,
       f.segment,
       own_cents,
       CAST(CASE WHEN seg_n > 1
                 THEN (seg_sum - own_cents) // (seg_n - 1)
            END AS BIGINT) AS loo_cents
FROM fact f JOIN stats s ON f.segment = s.segment
"""


# --- contingency association audit (chi² + mutual information) ---------------

def contingency_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association audit between event type and day-of-week over ONE
    shared contingency table: per event type, its χ² contribution and
    its mutual-information contribution (micro-nats), plus the marginal
    count — the feature-selection / drift-detection primitive behind
    "is this column independent of that one?" (ab_test_zscore tests one
    2×2 split; this audits the full |types|×7 grid with both statistics).

    Exactness: cell/margin counts are exact integers; each cell's term
    is ONE fixed-shape double expression over those integers —
    χ² term = (O·N − rt·ct)²/(rt·ct·N), MI term = O·ln(O·N/(rt·ct))/N —
    floored to a scaled integer PER CELL and only then summed, so
    float-accumulation order can never differ between engines. Day-of-
    week is epoch-day mod 7 (pure integer; both engines' DOW builtins
    disagree on week start, so neither is used).

    DOCUMENTED BOUNDARY RISK (accepted, same class as the r4 empty-input
    divergences): the χ² term uses only IEEE *,/ — exactly rounded and
    engine-identical — but the MI term evaluates a runtime natural log
    (JVM Math.log vs DuckDB libm ln). A 1-ulp disagreement scaled by
    1e9·o could flip a floored per-cell term at an exact integer
    boundary. No restructuring avoids the transcendental without
    changing the statistic; probability per run is ~|cells|·2⁻⁵² scaled
    by the digits kept, and the sf0.01/sf0.1 sweeps have never tripped.

    Scale shape: one (type, dow) count aggregate; the contingency frame
    is |types|×7 rows — metadata-sized, so its margin windows (including
    the global-sum window) are deliberately tiny and the heavy input
    never re-shuffles. At extreme counts the O·N products leave the
    int64-exact double range; margins would move to decimal(38) —
    irrelevant at any tested scale."""
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    cells = ev.groupBy(
        "event_type", (day % 7).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    # |types|×7 rows from here on — the unpartitioned window is config-sized.
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    m = (
        cells.withColumn("rt", F.sum("o").over(Window.partitionBy("event_type")))
        .withColumn("ct", F.sum("o").over(Window.partitionBy("dow")))
        .withColumn("n", F.sum("o").over(w_all))
    )
    num = F.col("o").cast("double") * F.col("n") - F.col("rt").cast("double") * F.col("ct")
    den = (F.col("rt").cast("double") * F.col("ct")) * F.col("n")
    ratio = (F.col("o").cast("double") * F.col("n")) / (F.col("rt").cast("double") * F.col("ct"))
    chi2_term = F.floor(F.lit(1000000.0) * num * num / den).cast("long")
    mi_term = F.floor(
        (F.lit(1000000000.0) * F.col("o") * F.log(ratio)) / F.col("n")
    ).cast("long")
    return (
        m.select("event_type", F.col("o"), chi2_term.alias("c2"), mi_term.alias("mi"))
        .groupBy("event_type")
        .agg(
            F.sum("o").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("c2").cast("long").alias("chi2_e6"),
            F.sum("mi").cast("long").alias("mi_e9"),
        )
    )


CONTINGENCY_SQL = """
WITH cells AS (
  SELECT event_type,
         (ts::DATE - DATE '1970-01-01') % 7 AS dow,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, o,
         sum(o) OVER (PARTITION BY event_type) AS rt,
         sum(o) OVER (PARTITION BY dow) AS ct,
         sum(o) OVER () AS n
  FROM cells
),
terms AS (
  SELECT event_type, o,
         CAST(floor(1000000.0
                    * (CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
                    * (CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)
                    / ((CAST(rt AS DOUBLE) * ct) * n)) AS BIGINT) AS c2,
         CAST(floor((1000000000.0 * o
                     * ln((CAST(o AS DOUBLE) * n) / (CAST(rt AS DOUBLE) * ct)))
                    / n) AS BIGINT) AS mi
  FROM m
)
SELECT event_type,
       CAST(sum(o) AS BIGINT) AS n_events,
       count(*)::BIGINT AS n_cells,
       CAST(sum(c2) AS BIGINT) AS chi2_e6,
       CAST(sum(mi) AS BIGINT) AS mi_e9
FROM terms GROUP BY 1
"""


# --- nearest-tolerance as-of match -------------------------------------------

#: match tolerance for error→purchase proximity (seconds)
ASOF_NEAREST_TOL_S = 3600


def asof_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of match: every 'error' event is matched to
    its temporally NEAREST same-user 'purchase' (backward or forward,
    ties to the earlier side) within a tolerance — the bidirectional
    as-of join (``asof_signup_attribution`` is backward-only; incident
    triage wants "the purchase closest to the failure", either side).
    Reported per user: error count, matched count, backward-side count,
    and min/total matched gap.

    Exactness: gaps are integer micros; the tie rule (backward wins at
    equal distance) and the (tus, event_id) window tiebreak are total
    orders, so the match is unique in both engines.

    Scale shape: the classic union-sort formulation — ONE window scan
    over the per-user timeline (last/first IGNORE NULLS carry the
    neighbor purchase through the error rows), never an events×events
    join; the two windows share one partitioning, so Spark plans a
    single sort+exchange. The paired last(tus)/last(event-condition)
    columns come from the same neighbor row because both are non-null
    exactly on purchase rows."""
    tol_us = ASOF_NEAREST_TOL_S * 1_000_000
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("tus"),
        )
    )
    is_p = F.col("event_type") == "purchase"
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    timeline = ev.select(
        "user_id",
        "event_type",
        "tus",
        F.last(F.when(is_p, F.col("tus")), ignorenulls=True).over(w_prev).alias("ptus"),
        F.first(F.when(is_p, F.col("tus")), ignorenulls=True).over(w_next).alias("ntus"),
    )
    err = timeline.filter(F.col("event_type") == "error")
    gap_prev = F.col("tus") - F.col("ptus")
    gap_next = F.col("ntus") - F.col("tus")
    gap = (
        F.when(F.col("ptus").isNull(), gap_next)
        .when(F.col("ntus").isNull(), gap_prev)
        .otherwise(F.least(gap_prev, gap_next))
    )
    chose_prev = F.col("ptus").isNotNull() & (
        F.col("ntus").isNull() | (gap_prev <= gap_next)
    )
    scored = err.select(
        "user_id",
        gap.alias("gap_us"),
        (gap <= tol_us).alias("m"),
        chose_prev.alias("cp"),
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_errors"),
        F.sum(F.when(F.col("m"), 1).otherwise(0)).cast("long").alias("n_matched"),
        F.sum(F.when(F.col("m") & F.col("cp"), 1).otherwise(0))
        .cast("long")
        .alias("n_backward"),
        F.min(F.when(F.col("m"), F.col("gap_us"))).cast("long").alias("min_gap_us"),
        F.sum(F.when(F.col("m"), F.col("gap_us"))).cast("long").alias("sum_gap_us"),
    )


ASOF_NEAREST_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
  FROM events WHERE event_type IN ('purchase', 'error')
),
timeline AS (
  SELECT user_id, event_type, tus,
         last_value(CASE WHEN event_type = 'purchase' THEN tus END IGNORE NULLS)
             OVER wp AS ptus,
         first_value(CASE WHEN event_type = 'purchase' THEN tus END IGNORE NULLS)
             OVER wn AS ntus
  FROM ev
  WINDOW wp AS (PARTITION BY user_id ORDER BY tus, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY tus, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
scored AS (
  SELECT user_id,
         CASE WHEN ptus IS NULL THEN ntus - tus
              WHEN ntus IS NULL THEN tus - ptus
              ELSE least(tus - ptus, ntus - tus) END AS gap_us,
         ptus IS NOT NULL AND (ntus IS NULL OR tus - ptus <= ntus - tus) AS cp
  FROM timeline WHERE event_type = 'error'
)
SELECT user_id,
       count(*)::BIGINT AS n_errors,
       CAST(sum(CASE WHEN gap_us <= {ASOF_NEAREST_TOL_S * 1_000_000} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN gap_us <= {ASOF_NEAREST_TOL_S * 1_000_000} AND cp
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_backward,
       CAST(min(CASE WHEN gap_us <= {ASOF_NEAREST_TOL_S * 1_000_000} THEN gap_us END)
            AS BIGINT) AS min_gap_us,
       CAST(sum(CASE WHEN gap_us <= {ASOF_NEAREST_TOL_S * 1_000_000} THEN gap_us END)
            AS BIGINT) AS sum_gap_us
FROM scored GROUP BY 1
"""


# --- per-day time-weighted average value (TWAP) ------------------------------

def twap_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day TIME-weighted average purchase value: each purchase's
    value is weighted by how long it stood (duration to the user's next
    same-day purchase), then the day's weighted sums are merged across
    users — the TWAP every pricing/telemetry dashboard wants where a
    row-weighted mean over-counts burst activity. The last segment of
    each user-day has no duration and drops out (standard left-closed
    TWAP).

    Exactness: durations are integer MILLIS (micros ÷ 1000, non-negative
    integer division) so value_cents × dur_ms sums stay well inside
    int64 at every tested scale; the single final division is integer
    `div`, guarded on zero total duration (a day whose purchases all
    share one timestamp per user). At petabyte scale the weighted sum
    would move to decimal(38) — noted, not needed here.

    Scale shape: one (user, day)-partitioned lead window (one exchange),
    then a per-day integer aggregate — ~O(days) output rows; no join."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("tus"),
        "event_id",
        _cents("value").alias("v_cents"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("tus", "event_id")
    seg = base.withColumn("ntus", F.lead("tus").over(w)).filter(
        F.col("ntus").isNotNull()
    )
    seg = seg.select(
        "day",
        F.expr("(ntus - tus) div 1000").alias("dur_ms"),
        "v_cents",
    )
    daily = seg.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("dur_ms").cast("long").alias("total_dur_ms"),
        F.sum(F.col("v_cents") * F.col("dur_ms")).alias("wsum"),
    )
    return daily.select(
        "day",
        "n_segments",
        "total_dur_ms",
        F.when(F.col("total_dur_ms") > 0, F.expr("wsum div total_dur_ms"))
        .cast("long")
        .alias("twap_cents"),
    )


TWAP_SQL = f"""
WITH base AS (
  SELECT user_id,
         ts::DATE AS day,
         epoch_us(ts) AS tus,
         event_id,
         {_CENTS_SQL.format(x="value")} AS v_cents
  FROM events WHERE event_type = 'purchase'
),
seg AS (
  SELECT day,
         (lead(tus) OVER w - tus) // 1000 AS dur_ms,
         v_cents
  FROM base
  WINDOW w AS (PARTITION BY user_id, day ORDER BY tus, event_id)
)
SELECT day,
       count(*)::BIGINT AS n_segments,
       CAST(sum(dur_ms) AS BIGINT) AS total_dur_ms,
       CAST(CASE WHEN sum(dur_ms) > 0
                 THEN sum(v_cents * dur_ms) // sum(dur_ms)
            END AS BIGINT) AS twap_cents
FROM seg WHERE dur_ms IS NOT NULL
GROUP BY 1
"""


# --- nDCG@10 retrieval eval --------------------------------------------------

import math

NDCG_K = 10
#: integer micro-scaled log2 discounts, computed ONCE in Python and
#: interpolated into BOTH engines — no runtime log2, whose libm values
#: differ between engines (the same trick MRR_SCALE plays for 1/rank).
_NDCG_W = [round(1_000_000 / math.log2(r + 1)) for r in range(1, NDCG_K + 1)]
_NDCG_PREFIX = [0]
for _w in _NDCG_W:
    _NDCG_PREFIX.append(_NDCG_PREFIX[-1] + _w)

_W_CASE = "CASE rank " + " ".join(
    f"WHEN {r} THEN {w}" for r, w in enumerate(_NDCG_W, start=1)
) + " ELSE 0 END"
_IDCG_CASE = "CASE least(n_relevant, {k}) ".format(k=NDCG_K) + " ".join(
    f"WHEN {i} THEN {p}" for i, p in enumerate(_NDCG_PREFIX)
) + " END"


def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of cosine retrieval with label agreement as the relevance
    judgment — the position-sensitive retrieval metric MRR can't provide
    (MRR sees only the FIRST hit; nDCG credits every hit, discounted by
    log2 rank). Per query: hit count, DCG, ideal DCG and nDCG in basis
    points.

    Exactness: the log2 discounts are integer micro-weights computed
    once in Python (``_NDCG_W``) and interpolated into BOTH engines, so
    DCG = Σ rel·w(rank) and IDCG = prefix(min(hits, 10)) are exact
    integer sums, and nDCG is one non-negative integer division —
    bit-stable cross-engine with zero runtime transcendentals.

    Scale shape: identical to retrieval_mrr_eval — the ranked list is
    request-sized (|Q|·k) from ONE corpus scan (vector.cosine_topk_batch
    bucketed partial top-k); relevance attaches by broadcasting the
    ranked list against the corpus label projection; the metric
    aggregate groups |Q| rows."""
    from ..operators import vector

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    top = vector.cosine_topk_batch(
        emb, "vec_id", "embedding", queries, "vec_id", "embedding", k=NDCG_K
    )
    lab = emb.select("vec_id", "label")
    qlab = queries.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    judged = (
        lab.join(F.broadcast(top.select("qid", "rank", "vec_id")), "vec_id")
        .join(F.broadcast(qlab), "qid")
        .withColumn("rel", (F.col("label") == F.col("qlabel")).cast("long"))
    )
    per_q = judged.groupBy("qid", "qlabel").agg(
        F.sum("rel").cast("long").alias("n_relevant"),
        F.sum(F.expr(f"rel * ({_W_CASE})")).cast("long").alias("dcg_e6"),
    )
    return per_q.select(
        "qid",
        "qlabel",
        "n_relevant",
        "dcg_e6",
        F.expr(_IDCG_CASE).cast("long").alias("idcg_e6"),
        F.expr(
            f"CASE WHEN ({_IDCG_CASE}) > 0"
            f" THEN (dcg_e6 * 10000) div ({_IDCG_CASE}) ELSE 0 END"
        )
        .cast("long")
        .alias("ndcg_bp"),
    )


_COS_R6 = """
list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))
 / (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))
  * sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))))
"""

NDCG_EVAL_SQL = f"""
WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qv
           FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.qid, q.qlabel, e.vec_id, e.label,
         {_COS_R6.format(a='e.embedding', b='q.qv')} AS cos
  FROM embeddings e, q
  WHERE e.vec_id != q.qid
),
topk AS (
  SELECT qid, qlabel, label,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
  QUALIFY rank <= {NDCG_K}
),
per_q AS (
  SELECT qid, qlabel,
         CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant,
         CAST(sum(CASE WHEN label = qlabel THEN ({_W_CASE}) ELSE 0 END) AS BIGINT)
           AS dcg_e6
  FROM topk GROUP BY 1, 2
)
SELECT qid, qlabel, n_relevant, dcg_e6,
       CAST({_IDCG_CASE} AS BIGINT) AS idcg_e6,
       CAST(CASE WHEN ({_IDCG_CASE}) > 0
                 THEN (dcg_e6 * 10000) // ({_IDCG_CASE}) ELSE 0 END AS BIGINT)
         AS ndcg_bp
FROM per_q
"""


# --- quality-score decile lift / calibration table ---------------------------

#: shared quality-logit feature CTEs — the SAME "trained offline" linear
#: model quality_logit_inference / quality_logit_auc execute
#: (extension_queries.py); the label is lang=='en', as in the AUC gate.
def _logit_ctes() -> str:
    from ..operators import textops
    from .extension_queries import _ratio_sql

    return rf"""
t AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g')) AS n_nonws,
         length(regexp_replace(regexp_replace(text, '\s', '', 'g'), '[^a-zA-Z0-9]', '', 'g')) AS n_alnum,
         list_sum(list_transform(regexp_split_to_array(lower(text), '\s+'), w -> length(w))) AS sum_wlen,
         len(regexp_split_to_array(lower(text), '\s+')) AS n_tok_raw,
         {_ratio_sql(textops.LANG_PROFILES["en"])} AS stop_r
  FROM documents
),
s AS (
  SELECT doc_id, lang,
         2.0 * least(n_tokens / 200.0, 1.0)
         - 6.0 * ((n_nonws - n_alnum) / greatest(n_nonws, 1)::DOUBLE)
         + 10.0 * stop_r
         - 0.2 * (sum_wlen / greatest(n_tok_raw, 1)::DOUBLE)
         - 0.3 AS logit
  FROM t
)"""


def _logit_col() -> "Column":
    from ..operators import textops

    return (
        2.0 * F.least(textops.token_count("text") / 200.0, F.lit(1.0))
        - 6.0 * textops.punct_ratio("text")
        + 10.0 * textops.stopword_ratio("text")
        - 0.2 * textops.mean_word_length("text")
        - 0.3
    )


def score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / calibration table for the fused quality classifier —
    the model-eval companion AUC can't provide: AUC says the ranking is
    good overall; the lift table says WHICH score band to ship (decile 1
    = top scores; per decile the observed positive rate, lift over base
    rate, and cumulative capture of all positives).

    Exactness: the sort key is the e4-integer-scaled logit (floor form)
    with a doc_id tiebreak, so the total order is bit-stable; decile
    assignment, rates, lift and capture are all non-negative integer
    divisions in basis points.

    Scale shape: the global rank comes from ``layout.dense_ids_by``
    (range partition + per-partition rank + O(partitions) offset carry —
    NO single-partition sort); the grand totals attach as a broadcast
    1-row frame; every downstream window runs on the 10-row decile
    frame."""
    from ..operators import layout
    from ..session import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        F.floor(_logit_col() * 10000 + F.lit(0.5)).cast("long").alias("_s_e4"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("_y"),
    )
    keyed = scored.withColumn("_nk", -F.col("_s_e4"))
    ranked = layout.dense_ids_by(keyed, ["_nk", "doc_id"], id_name="_rank")
    totals = scored.agg(
        F.count(F.lit(1)).cast("long").alias("_n_total"),
        F.sum("_y").cast("long").alias("_p_total"),
    )
    dec = ranked.crossJoin(F.broadcast(totals)).select(
        F.expr("((_rank - 1) * 10) div _n_total + 1").cast("long").alias("decile"),
        "_y",
        "_n_total",
        "_p_total",
    )
    per = dec.groupBy("decile", "_n_total", "_p_total").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn("_cum_pos", F.sum("n_pos").over(w))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.expr("(n_pos * 10000) div n_docs").cast("long").alias("pos_rate_bp"),
            F.expr("(n_pos * _n_total * 10000) div (n_docs * _p_total)")
            .cast("long")
            .alias("lift_bp"),
            F.expr("(_cum_pos * 10000) div _p_total")
            .cast("long")
            .alias("cum_capture_bp"),
        )
    )


DECILE_LIFT_SQL = f"""
WITH {_logit_ctes()},
sc AS (
  SELECT doc_id,
         CAST(floor(logit * 10000 + 0.5) AS BIGINT) AS s_e4,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM s
),
r AS (
  SELECT doc_id, y,
         CAST(row_number() OVER (ORDER BY -s_e4 ASC, doc_id ASC) AS BIGINT) AS rnk
  FROM sc
),
tot AS (SELECT count(*)::BIGINT AS n_total, sum(y)::BIGINT AS p_total FROM sc),
d AS (SELECT ((rnk - 1) * 10) // n_total + 1 AS decile, y, n_total, p_total
      FROM r, tot),
per AS (
  SELECT decile, n_total, p_total,
         count(*)::BIGINT AS n_docs, sum(y)::BIGINT AS n_pos
  FROM d GROUP BY 1, 2, 3
)
SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
       (n_pos * 10000) // n_docs AS pos_rate_bp,
       (n_pos * n_total * 10000) // (n_docs * p_total) AS lift_bp,
       (sum(n_pos) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000) // p_total
         AS cum_capture_bp
FROM per
"""


# --- precision/recall threshold sweep ----------------------------------------

#: decision-threshold grid in e2-scaled logit units (-1.0 .. 2.0); one
#: Python constant interpolated into both engines.
PR_THRESHOLDS_E2 = [-100, -50, 0, 50, 100, 150, 200]


def threshold_sweep_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep of the quality classifier over a fixed
    decision-threshold grid — the operating-point table a release gate
    reads next to the AUC (AUC is threshold-free; shipping needs ONE
    threshold, chosen from exactly this sweep).

    Exactness: scores quantize to the e2-integer bucket (the AUC gate's
    bucketing); confusion counts are integer sums over (bucket ≥ t);
    precision/recall/F1 are basis-point integer divisions, F1 computed
    from the bp precision/recall pair, NULL when the denominator is
    empty.

    Scale shape: one corpus groupBy to the score-range-bounded histogram;
    the 7-threshold grid attaches to that bounded frame with a broadcast
    nested-loop (config-sized side, the house scalar-subquery form) —
    the corpus is scanned ONCE for all thresholds."""
    from ..session import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    hist = (
        docs.select(
            F.floor(_logit_col() * 100 + F.lit(0.5)).cast("long").alias("_b"),
            F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("_y"),
        )
        .groupBy("_b")
        .agg(
            F.sum("_y").cast("long").alias("_pos"),
            F.sum(1 - F.col("_y")).cast("long").alias("_neg"),
        )
    )
    grid = spark.range(len(PR_THRESHOLDS_E2)).select(
        F.element_at(
            F.array(*[F.lit(t) for t in PR_THRESHOLDS_E2]),
            (F.col("id") + 1).cast("int"),
        )
        .cast("long")
        .alias("threshold_e2")
    )
    conf = (
        hist.crossJoin(F.broadcast(grid))
        .groupBy("threshold_e2")
        .agg(
            F.sum(F.when(F.col("_b") >= F.col("threshold_e2"), F.col("_pos")).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when(F.col("_b") >= F.col("threshold_e2"), F.col("_neg")).otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when(F.col("_b") < F.col("threshold_e2"), F.col("_pos")).otherwise(0)).cast("long").alias("fn"),
            F.sum(F.when(F.col("_b") < F.col("threshold_e2"), F.col("_neg")).otherwise(0)).cast("long").alias("tn"),
        )
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.expr("(tp * 10000) div (tp + fp)"))
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.expr("(tp * 10000) div (tp + fn)"))
    out = conf.withColumn("precision_bp", prec.cast("long")).withColumn(
        "recall_bp", rec.cast("long")
    )
    f1 = F.when(
        F.col("precision_bp") + F.col("recall_bp") > 0,
        F.expr("(2 * precision_bp * recall_bp) div (precision_bp + recall_bp)"),
    )
    return out.withColumn("f1_bp", f1.cast("long"))


_PR_GRID_SQL = " UNION ALL ".join(
    f"SELECT CAST({t} AS BIGINT) AS threshold_e2" for t in PR_THRESHOLDS_E2
)

THRESHOLD_SWEEP_SQL = f"""
WITH {_logit_ctes()},
h AS (
  SELECT CAST(floor(logit * 100 + 0.5) AS BIGINT) AS b,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos,
         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS neg
  FROM s GROUP BY 1
),
g AS ({_PR_GRID_SQL}),
conf AS (
  SELECT threshold_e2,
         sum(CASE WHEN b >= threshold_e2 THEN pos ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN b >= threshold_e2 THEN neg ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN b < threshold_e2 THEN pos ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN b < threshold_e2 THEN neg ELSE 0 END)::BIGINT AS tn
  FROM h, g GROUP BY 1
),
rates AS (
  SELECT *,
         CASE WHEN tp + fp > 0 THEN (tp * 10000) // (tp + fp) END AS precision_bp,
         CASE WHEN tp + fn > 0 THEN (tp * 10000) // (tp + fn) END AS recall_bp
  FROM conf
)
SELECT threshold_e2, tp, fp, fn, tn, precision_bp, recall_bp,
       CASE WHEN precision_bp + recall_bp > 0
            THEN (2 * precision_bp * recall_bp) // (precision_bp + recall_bp)
       END AS f1_bp
FROM rates
"""
