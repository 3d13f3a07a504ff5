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
  per-language balance matrix).

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
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.2)
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
    non-negative integer division (shifted by +10000 first, because
    Spark's DIV truncates toward zero while DuckDB's // floors, and the
    two disagree on negatives)."""
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
