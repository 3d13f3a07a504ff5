"""Deterministic sampling / splitting / packing for training-data curation.

The reference has no sampling surface (its 7.5k-row dataset is processed
whole — /root/reference/src/transform_pipeline.py), but any corpus-scale
pipeline needs reproducible subset selection. Everything here is
HASH-driven, never RNG-driven:

- rerun-stable: the same row lands in the same sample/split/bin on every
  run, on any cluster layout — no seed plumbing, no partition-order
  dependence (Spark's ``df.sample`` is seed × partition-layout dependent);
- oracle-checkable: md5 integer arithmetic reproduces bit-for-bit in any
  engine (same convention as operators/dedup.py);
- scale-free: each row decides membership from its own key — a map-only
  predicate, no shuffle, fully pushdown-friendly.

Sequence packing is the concat-then-chunk scheme LLM pretraining uses:
order documents deterministically, accumulate token counts, and emit the
chunk index each document STARTS in. One partitioned shuffle; parallelism
at scale comes from packing within (group, shard) rather than globally —
a shard is a hash bucket of the order key, so layout stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_int

#: resolution of the sampling wheel; fractions quantize to 1/10000
WHEEL = 10000


def hash_bucket(key: Column, salt: str = "", buckets: int = WHEEL) -> Column:
    """Uniform bucket in [0, buckets) from md5 of (key, salt).

    The salt decouples independent decisions on the same key (e.g. a 10%
    sample and a train/test split must not correlate).
    """
    return md5_int(F.concat(key.cast("string"), F.lit(salt))) % buckets


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Bernoulli-style sample: keep rows whose hash bucket falls below
    ``fraction`` of the wheel. Map-only — no shuffle, no state."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(round(fraction * WHEEL)))


def split_assign(
    key: Column, test_fraction: float, salt: str = "split"
) -> Column:
    """'test' / 'train' label from the key's hash bucket. Disjoint and
    exhaustive by construction; stable under data growth (a row's split
    never changes when other rows arrive)."""
    return F.when(
        hash_bucket(key, salt) < int(round(test_fraction * WHEEL)), F.lit("test")
    ).otherwise(F.lit("train"))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column. Filtering by it afterwards is a pushable
    predicate, so the train and test scans each prune at the source."""
    return df.withColumn("split", split_assign(F.col(key_col), test_fraction, salt))


def stratified_topn(
    df: DataFrame, strata: list[str], n: int, order_cols: list[str]
) -> DataFrame:
    """Exactly n rows per stratum, chosen by a deterministic order —
    row_number over a PARTITIONED window (one shuffle on the strata;
    per-stratum state is a counter, no global sort)."""
    w = Window.partitionBy(*strata).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def pack_chunks(
    df: DataFrame,
    token_col: str,
    chunk_tokens: int,
    by: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Concat-then-chunk packing: within each ``by`` group, documents are
    concatenated in ``order_cols`` order and the stream is cut every
    ``chunk_tokens`` tokens; each document is labeled with ``chunk_id``,
    the chunk its FIRST token lands in (straddling documents belong to
    their starting chunk).

    ``chunk_id = floor((running_sum - own_tokens) / chunk_tokens)`` — one
    window over one shuffle on the group key. For corpus-scale runs pass a
    hash shard in ``by`` (e.g. ``hash_bucket(key, buckets=4096)``) so no
    single group serializes the corpus.
    """
    w = (
        Window.partitionBy(*by)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn(
        "chunk_id", F.floor(start / F.lit(chunk_tokens)).cast("bigint")
    )


def chunk_stats(
    df: DataFrame,
    token_col: str,
    chunk_tokens: int,
    by: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Per-(group, chunk) document count and token sum — the packing
    manifest a loader would consume. GroupBy reuses the packing shuffle's
    partitioning (same leading keys), so AQE plans no second exchange."""
    packed = pack_chunks(df, token_col, chunk_tokens, by, order_cols)
    return packed.groupBy(*by, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).alias("sum_tokens"),
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    rates: dict[str, float],
    salt: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Corpus mixture reweighting: keep each row with its source's target
    rate (pretraining-style up/down-weighting of web/books/code slices).

    The rate table is config-sized and broadcast; membership stays a pure
    function of (key, salt), so the kept set only shrinks/grows per
    source when its rate changes — other sources' samples are untouched.
    """
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(s, float(r)) for s, r in rates.items()], [source_col, "_rate"]
    )
    joined = df.join(F.broadcast(rates_df), source_col, "left").withColumn(
        "_rate", F.coalesce(F.col("_rate"), F.lit(float(default_rate)))
    )
    keep = hash_bucket(F.col(key_col), salt) < F.round(F.col("_rate") * WHEEL).cast("bigint")
    return joined.filter(keep).drop("_rate")


def priority_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int, salt: str = "priority"
) -> DataFrame:
    """Weighted-without-replacement sample via priority sampling
    (Duffield/Lund/Thorup): each row gets priority = weight / u with
    u ~ Uniform(0,1]; the k highest priorities are the sample.

    u comes from the md5 wheel — (bucket + 0.5) / WHEEL — so the
    "randomness" is deterministic, rerun-stable, and reproduces exactly
    in any engine. Priority is one division (no transcendentals: pow/log
    differ by ULPs across libm implementations, division is IEEE-exact),
    so the selected SET is cross-engine identical. Selection is a global
    top-k: TakeOrdered at scale, never a full sort."""
    u = (hash_bucket(F.col(key_col), salt) + F.lit(0.5)) / F.lit(float(WHEEL))
    return (
        df.withColumn("priority", F.col(weight_col) / u)
        .orderBy(F.desc("priority"), F.asc(key_col))
        .limit(k)
    )


def kmv_distinct(
    df: DataFrame, group_cols: list[str], key_col: str, k: int = 32
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group — the PORTABLE
    alternative to HLL (engine HLLs never agree bit-for-bit; KMV over the
    md5 wheel reproduces exactly in any engine).

    Estimate: with h(1..k) the k smallest normalized hashes of the
    group's distinct keys, D ≈ (k-1) / h_k; groups with fewer than k
    distinct keys report their exact count. One shuffle for the distinct,
    one partitioned window to rank hashes — per-group state is k scalars,
    the same bound a production sketch keeps."""
    h = (md5_int(F.col(key_col).cast("string")) + F.lit(0.5)) / F.lit(float(2**32))
    dist = df.select(*group_cols, F.col(key_col)).distinct().withColumn("_h", h)
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    ranked = dist.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n_distinct"),
            F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
        )
        .select(
            *group_cols,
            F.when(F.col("_n_distinct") < k, F.col("_n_distinct").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("_hk"))
            .alias("est_distinct"),
        )
    )


def hamilton_quota(
    counted: DataFrame, key_col: str, count_col: str, slots: int
) -> DataFrame:
    """Largest-remainder (Hamilton) integer quota allocation: split
    ``slots`` across the rows of ``counted`` proportionally to
    ``count_col``, flooring first and handing the leftover +1s to the
    largest fractional remainders (ties to ``key_col`` ascending).
    Quotas sum to EXACTLY ``slots`` — the property plain proportional
    rounding loses and every sampling/packing planner needs.

    All arithmetic is non-negative integer (shares = slots·count; floor
    = shares div total; remainder = shares mod total), so any SQL engine
    reproduces it bit-for-bit.

    Scale shape: one 1-row total broadcast + one |rows|-row window —
    callers hand in an already-aggregated (key, count) frame, so
    everything here is config-sized.

    Returns (key, count, quota, remainder)."""
    tot = counted.agg(F.sum(count_col).alias("_t"))
    shares = (
        counted.select(F.col(key_col), F.col(count_col))
        .crossJoin(F.broadcast(tot))
        .select(
            key_col,
            count_col,
            F.expr(f"({count_col} * {slots}) div _t").alias("_fl"),
            F.pmod(F.col(count_col) * slots, F.col("_t")).alias("remainder"),
        )
    )
    w = Window.orderBy(F.desc("remainder"), F.asc(key_col))
    leftover = F.lit(slots) - F.sum("_fl").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = shares.select(
        key_col,
        count_col,
        "_fl",
        "remainder",
        F.row_number().over(w).alias("_rk"),
        leftover.alias("_lo"),
    )
    return ranked.select(
        key_col,
        count_col,
        (F.col("_fl") + F.when(F.col("_rk") <= F.col("_lo"), 1).otherwise(0))
        .cast("long")
        .alias("quota"),
        F.col("remainder").cast("long").alias("remainder"),
    )
