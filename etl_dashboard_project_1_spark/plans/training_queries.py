"""Round-4 training-data pipeline wave: the data-ordering / mixture /
split-planning operations that sit between a curated corpus and a
training run.

- deterministic multi-epoch shuffle order (the reproducible "data
  order" manifest a trainer consumes — seeded hash permutation, global
  positions WITHOUT a single-partition sort),
- cross-source duplication matrix (which sources copy from each other —
  the report that decides crawl-overlap policy),
- candidate-pair cosine histogram (the threshold-sweep evidence for
  picking an embedding near-dup cut-off BEFORE running the dedup),
- mixture epoch plan (per-source repeat factors / epochs needed to hit
  a token budget under target mixture weights),
- stratified k-fold assignment audit (hash-deterministic folds with the
  per-language balance matrix),
- minhash banding recall curve vs exact ground truth (the dedup QA
  loop),
- quality-tier token inventory (corpus quartiles → per-source "data
  diet" planning),
- temporal train/valid split with embargo (leakage-safe for
  time-correlated data).

All pure DataFrame plans over the md5 wheel (cross-engine-exact
"randomness"); every aggregate that feeds a comparison is integer
arithmetic (x100 / x10000 / bp scalings) past at most one house-standard
``floor(x * 10^k + 0.5)`` rounding of a float input, so the oracles
hash-match without float tolerance.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup, layout, vector
from ..operators.sampling import hash_bucket
from ..session import fan_out, load_table
from .extension_queries import _EMB_BANDS_SQL, _JACCARD_CTE

_MD5_BIGINT = "(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"

EPOCHS = 2
EPOCH_TOPN = 500  # manifest rows emitted per epoch (bounds the report)


def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch training order: each epoch permutes the
    corpus by md5(epoch:doc_id) and assigns global positions — the
    manifest a data loader replays for bit-reproducible training runs
    (epoch seeds decorrelate the orders; re-running yields the same
    bytes in the same order on any cluster size).

    Scale shape: positions come from ``layout.dense_ids_by`` (range
    partition on the hash key + per-partition rank + O(partitions)
    offset carry) — a total order with NO single-partition window; one
    such job per epoch. The manifest is truncated to the first
    EPOCH_TOPN positions per epoch to keep the report bounded."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    parts = []
    for ep in range(EPOCHS):
        keyed = docs.select(
            F.lit(ep).cast("int").alias("epoch"),
            "doc_id",
            dedup.md5_int(
                F.concat(F.lit(f"{ep}:"), F.col("doc_id").cast("string"))
            ).alias("_k"),
        )
        ranked = layout.dense_ids_by(keyed, ["_k", "doc_id"], id_name="position")
        parts.append(
            ranked.filter(F.col("position") <= EPOCH_TOPN).select(
                "epoch", "position", "doc_id"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


_EPOCH_KEY = _MD5_BIGINT.format(expr="e.epoch::VARCHAR || ':' || doc_id::VARCHAR")

# epoch list generated from EPOCHS so the oracle can never drift from the
# Spark loop when the constant changes
_EPOCH_LIST = " UNION ALL ".join(f"SELECT {ep} AS epoch" for ep in range(EPOCHS))

EPOCH_SHUFFLE_SQL = f"""
SELECT epoch, position, doc_id FROM (
  SELECT e.epoch, doc_id,
         CAST(row_number() OVER (
           PARTITION BY e.epoch ORDER BY {_EPOCH_KEY}, doc_id
         ) AS BIGINT) AS position
  FROM documents CROSS JOIN ({_EPOCH_LIST}) e
)
WHERE position <= {EPOCH_TOPN}
"""


def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (word-3-gram
    Jaccard ≥ 0.2, the PPJoin-filtered pair generator) attributed to the
    unordered pair of their documents' sources — the report that tells a
    crawl which feeds duplicate each other (and how strongly) before any
    removal policy is chosen.

    Scale shape: all heavy lifting is the existing bounded-block pair
    join; attaching two source labels is a pair-sized join against the
    (doc_id, source) projection, and the matrix is |sources|²-bounded.
    avg jaccard is an exact integer mean (sum of per-pair x10000
    roundings DIV count) — no float aggregate crosses the oracle."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.2, reuse="checkpoint"
    )
    src = docs.select("doc_id", "source")
    attributed = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")), "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long").alias("_jx"),
        )
    )
    return (
        attributed.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("_jx").alias("_sj"))
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            F.expr("_sj DIV n_pairs").alias("avg_jaccard_x10000"),
        )
    )


DEDUP_SOURCE_MATRIX_SQL = (
    _JACCARD_CTE
    + """
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CAST(floor(jaccard * 10000 + 0.5) AS BIGINT)) // count(*) AS BIGINT)
         AS avg_jaccard_x10000
FROM jac
JOIN documents da ON jac.id_a = da.doc_id
JOIN documents db ON jac.id_b = db.doc_id
WHERE jaccard >= 0.2
GROUP BY 1, 2
"""
)


def emb_pair_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sweep evidence for embedding near-dup: the cosine
    histogram (0.05-wide bins, lower bound x100) over ALL banded-LSH
    candidate pairs — one pass answers "how many pairs would each
    cut-off keep?" so the dedup threshold is chosen from data, not
    guessed. Same candidate generator (and cost) as the registered
    near-dup query; only the post-cosine filter differs, and the output
    is bin-bounded (cosine ∈ [-1, 1] at 0.05 width → at most 41 bins at
    any corpus size).

    Binning is integer-exact past the ONE house-standard float step:
    cosine rounds once via floor(c*10000 + 0.5) — the same boundary
    class as every portable_round in the repo and the near-dup ≥ 0.4
    threshold, swept at two SFs — then the bin index is pure
    non-negative integer division (shifted by +10000 first to keep the
    dividend non-negative; measured r9: both engines truncate toward
    zero, so the shift is a portability convention, not a divergence
    fix)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    pairs = vector.cosine_pairs_blocked(
        emb, "vec_id", "embedding", threshold=-2.0, num_planes=32, band_size=4
    )
    cx = F.floor(F.col("cosine") * 10000 + F.lit(0.5)).cast("long")
    return (
        pairs.select(
            (((cx + 10000) / 500).cast("long") * 5 - 100).alias("bin_lo_x100")
        )
        .groupBy("bin_lo_x100")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


EMB_PAIR_COSINE_HIST_SQL = f"""
WITH bands AS (
{_EMB_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a._band = b._band AND a._bucket = b._bucket AND a.vec_id < b.vec_id
),
cos AS (
  SELECT list_sum(list_transform(range(1, len(ea.embedding) + 1),
           i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(ea.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(eb.embedding, x -> x::DOUBLE * x::DOUBLE))))
           AS c
  FROM cand
  JOIN embeddings ea ON ea.vec_id = cand.id_a
  JOIN embeddings eb ON eb.vec_id = cand.id_b
)
SELECT CAST((CAST(floor(c * 10000 + 0.5) AS BIGINT) + 10000) // 500 * 5 - 100
            AS BIGINT) AS bin_lo_x100,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM cos GROUP BY 1
"""


TOKEN_BUDGET = 5_000_000
MIX_WEIGHTS_BP = {"src0": 4000, "src1": 3000, "src2": 2000, "src3": 1000}


def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: given target mixture weights (basis points of a
    token budget) for chosen sources, compute each source's available
    tokens, its target token count, the repeat factor (x100) and the
    whole epochs needed — the arithmetic that decides how many times a
    small high-weight slice (books-like) repeats against one pass of a
    large slice. Pure integer outputs, so the plan is engine-exact.

    Scale shape: one scan reduces the corpus to per-source token sums
    (|sources| rows); the weight table is config-sized and broadcast."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    avail = (
        docs.select(
            "source",
            F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("_t"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_t").alias("available_tokens"))
    )
    w = spark.createDataFrame(
        [(s, wbp) for s, wbp in MIX_WEIGHTS_BP.items()], ["source", "weight_bp"]
    )
    return (
        avail.join(F.broadcast(w), "source")
        .withColumn(
            "target_tokens", F.expr(f"({TOKEN_BUDGET} * weight_bp) DIV 10000")
        )
        .select(
            "source",
            "n_docs",
            "available_tokens",
            "weight_bp",
            "target_tokens",
            F.expr("(target_tokens * 100) DIV available_tokens").alias("repeats_x100"),
            F.expr(
                "(target_tokens + available_tokens - 1) DIV available_tokens"
            ).alias("epochs_needed"),
        )
    )


_MIX_VALUES = ", ".join(
    f"('{s}', {w}::BIGINT)" for s, w in MIX_WEIGHTS_BP.items()
)

MIXTURE_EPOCH_PLAN_SQL = f"""
WITH w(source, weight_bp) AS (VALUES {_MIX_VALUES}),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_split_to_array(lower(text), '\\s+'))) AS BIGINT)
           AS available_tokens
  FROM documents GROUP BY 1
)
SELECT a.source, n_docs, available_tokens, weight_bp,
       ({TOKEN_BUDGET} * weight_bp) // 10000 AS target_tokens,
       (({TOKEN_BUDGET} * weight_bp) // 10000 * 100) // available_tokens
         AS repeats_x100,
       (({TOKEN_BUDGET} * weight_bp) // 10000 + available_tokens - 1)
         // available_tokens AS epochs_needed
FROM a JOIN w USING (source)
"""


KFOLDS = 5


def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold assignment audit: folds come from the md5 wheel (stable
    under data growth — a document's fold never changes when others
    arrive, the property cross-validation at corpus scale needs), and
    the report is the per-language balance matrix: docs per (lang,
    fold) and each fold's share of its language in basis points — the
    check that hash folding didn't skew any stratum.

    Scale shape: fold assignment is map-only; one groupBy to the
    |langs|x|folds|-bounded matrix; the share window runs on that
    bounded table, not the corpus."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    cells = (
        docs.select(
            "lang", (hash_bucket(F.col("doc_id"), "kfold", KFOLDS)).alias("fold")
        )
        .groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "fold",
        "n_docs",
        F.expr("n_docs * 10000").cast("long").alias("_num"),
        F.sum("n_docs").over(w).alias("_tot"),
    ).select(
        "lang", "fold", "n_docs", F.expr("_num DIV _tot").alias("share_bp")
    )


_KFOLD_HASH = _MD5_BIGINT.format(expr="doc_id::VARCHAR || 'kfold'")

STRATIFIED_KFOLD_SQL = f"""
SELECT lang, fold, n_docs,
       CAST(n_docs * 10000 // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
         AS share_bp
FROM (
  SELECT lang, {_KFOLD_HASH} % {KFOLDS} AS fold,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
)
"""


# --- minhash banding recall eval --------------------------------------------

def dedup_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA loop for the dedup family (the analog of ``ann_recall_eval``
    for ANN): per Jaccard bucket (0.1-wide, lower bound x100), how many
    TRUE near-dup pairs exist (exact all-pairs ground truth at t=0.2)
    and how many the banded minhash pipeline catches — the measured
    recall curve that justifies the (num_hashes=8, band_size=2) banding
    config instead of asserting it. Everything is deterministic, so the
    whole evaluation hash-matches the oracle.

    Scale note: the exact all-pairs ground truth is the expensive side
    and exists FOR the eval (run on a sample at corpus scale); the
    production path stays the banded pipeline being evaluated."""
    from ..operators import dedup as _dedup

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    truth = _dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.2, method="allpairs"
    ).select(
        "id_a", "id_b",
        F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long").alias("_jx"),
    )
    caught = _dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=8, band_size=2,
        threshold=0.2, hashed=False,
    ).select("id_a", "id_b", F.lit(1).alias("_c"))
    j = truth.join(caught, ["id_a", "id_b"], "left").select(
        (F.expr("_jx DIV 1000") * 10).alias("bucket_lo_x100"),
        F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
    )
    return (
        j.groupBy("bucket_lo_x100")
        .agg(F.count(F.lit(1)).alias("n_true"), F.sum("_c").cast("long").alias("n_caught"))
        .select(
            "bucket_lo_x100", "n_true", "n_caught",
            F.expr("n_caught * 10000 DIV n_true").alias("recall_bp"),
        )
    )


DEDUP_MINHASH_RECALL_SQL = (
    "WITH "
    + _JACCARD_CTE[len("WITH ") :]
    + r""",
params AS (
  SELECT i,
         ((('0x' || substr(md5(i::VARCHAR), 1, 8))::BIGINT % 1073741824) | 1) AS a,
         (7919 * i + 13)::BIGINT AS b
  FROM range(8) t(i)
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS hs FROM sh
),
sig AS (
  SELECT doc_id, i, min((a * hs + b) % 4294967311) AS m
  FROM hashed, params GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, i // 2 AS band,
         md5(string_agg(m::VARCHAR, ',' ORDER BY i)) AS bh
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
truth AS (
  SELECT id_a, id_b, CAST(floor(jaccard * 10000 + 0.5) AS BIGINT) AS jx
  FROM jac WHERE jaccard >= 0.2
)
SELECT CAST(jx // 1000 * 10 AS BIGINT) AS bucket_lo_x100,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
       CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) * 10000 // count(*)
            AS BIGINT) AS recall_bp
FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
GROUP BY 1
"""
)


# --- quality-tier token inventory -------------------------------------------

def quality_tier_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "data diet" planning report: corpus-wide quality quartiles
    (percentile_disc over the x10000 integer quality score from
    ``text_quality``) and, per (source, tier), the documents and tokens
    available — what a mixture designer consults before setting
    per-quality sampling rates.

    Scale shape: ONE corpus scan reduces to a (source, score) histogram
    carrying token sums (bounded by |sources| x 10001 score values);
    the global cumulative window, the quartile thresholds, and the
    inventory aggregate all run on that compressed table. The global
    window orders ≤10k histogram rows — bounded by the score space,
    never row count."""
    from pyspark.sql import Window

    from .extension_queries import text_quality

    q = text_quality(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("long").alias("_qx"),
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    hb = (
        q.join(src, "doc_id")
        .groupBy("source", "_qx")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("n_tokens").alias("_toks"))
        .localCheckpoint(eager=False)
    )
    g = hb.groupBy("_qx").agg(F.sum("_n").alias("_c"))
    wcum = Window.orderBy("_qx")
    cum = g.select(
        "_qx",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(Window.partitionBy()).alias("_tot"),
    )
    th = cum.agg(
        F.min(F.when(F.col("_cum") >= F.expr("(_tot + 3) DIV 4"), F.col("_qx"))).alias("t25"),
        F.min(F.when(F.col("_cum") >= F.expr("(_tot + 1) DIV 2"), F.col("_qx"))).alias("t50"),
        F.min(F.when(F.col("_cum") >= F.expr("(3 * _tot + 3) DIV 4"), F.col("_qx"))).alias("t75"),
    )
    tier = (
        F.when(F.col("_qx") <= F.col("t25"), F.lit("q1_low"))
        .when(F.col("_qx") <= F.col("t50"), F.lit("q2"))
        .when(F.col("_qx") <= F.col("t75"), F.lit("q3"))
        .otherwise(F.lit("q4_high"))
    )
    return (
        hb.crossJoin(F.broadcast(th))
        .select("source", tier.alias("tier"), "_n", "_toks")
        .groupBy("source", "tier")
        .agg(F.sum("_n").alias("n_docs"), F.sum("_toks").alias("n_tokens"))
    )


def _quality_tier_sql() -> str:
    from .extension_queries import TEXT_QUALITY_SQL

    return f"""
WITH q AS ({TEXT_QUALITY_SQL}),
base AS (
  SELECT d.source, CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS qx, q.n_tokens
  FROM q JOIN documents d USING (doc_id)
),
hb AS (
  SELECT source, qx, count(*) AS n, sum(n_tokens) AS toks
  FROM base GROUP BY 1, 2
),
cum AS (
  SELECT qx, sum(n) OVER (ORDER BY qx) AS c, sum(n) OVER () AS tot
  FROM (SELECT qx, sum(n) AS n FROM hb GROUP BY 1)
),
th AS (
  SELECT min(CASE WHEN c >= (tot + 3) // 4 THEN qx END) AS t25,
         min(CASE WHEN c >= (tot + 1) // 2 THEN qx END) AS t50,
         min(CASE WHEN c >= (3 * tot + 3) // 4 THEN qx END) AS t75
  FROM cum
)
SELECT source,
       CASE WHEN qx <= t25 THEN 'q1_low' WHEN qx <= t50 THEN 'q2'
            WHEN qx <= t75 THEN 'q3' ELSE 'q4_high' END AS tier,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens
FROM hb CROSS JOIN th
GROUP BY 1, 2
"""


QUALITY_TIER_SQL = _quality_tier_sql()


# --- temporal split with embargo --------------------------------------------

SPLIT_DATE = "2024-01-20"
EMBARGO_DAYS = 2


def split_temporal_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/valid split with an embargo gap — the
    leakage-safe split for temporally-correlated data (hash splits leak
    future information into training when rows near the boundary share
    latent state): train = events strictly before SPLIT_DATE, valid =
    events at/after SPLIT_DATE + EMBARGO_DAYS, the embargo window
    dropped entirely. The report carries per-split row/user counts plus
    the user overlap between splits — non-zero overlap is EXPECTED here
    (the same user may act in both periods) and is exactly the number a
    leakage-sensitive design (group-disjoint split, see
    ``split_group_disjoint``) would drive to zero.

    Scale shape: map-side split labels, one groupBy for counts, one
    distinct-users join (both sides user-cardinality-bounded)."""
    ev = load_table(spark, sf_dir, "events")
    lab = ev.select(
        F.when(F.col("ts") < F.lit(SPLIT_DATE).cast("timestamp"), "train")
        .when(
            F.col("ts")
            >= F.expr(f"timestamp'{SPLIT_DATE}' + INTERVAL {EMBARGO_DAYS} DAYS"),
            "valid",
        )
        .otherwise("embargo")
        .alias("split"),
        "user_id",
    )
    counts = lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    tr = lab.filter(F.col("split") == "train").select("user_id").distinct()
    va = lab.filter(F.col("split") == "valid").select("user_id").distinct()
    overlap = tr.join(va, "user_id").agg(
        F.count(F.lit(1)).alias("n_overlap_users")
    )
    return counts.crossJoin(F.broadcast(overlap))


SPLIT_TEMPORAL_SQL = f"""
WITH lab AS (
  SELECT CASE WHEN ts < TIMESTAMP '{SPLIT_DATE}' THEN 'train'
              WHEN ts >= TIMESTAMP '{SPLIT_DATE}' + INTERVAL {EMBARGO_DAYS} DAY
                THEN 'valid'
              ELSE 'embargo' END AS split,
         user_id
  FROM events
),
ov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_overlap_users FROM (
    SELECT user_id FROM lab WHERE split = 'train'
    INTERSECT
    SELECT user_id FROM lab WHERE split = 'valid'
  )
)
SELECT split, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       n_overlap_users
FROM lab CROSS JOIN ov
GROUP BY 1, 4
"""
