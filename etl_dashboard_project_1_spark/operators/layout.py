"""Z-order (Morton) multi-dimensional clustering for file layout.

The data-layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: sort
a table by the bit-interleaving of two (or more) quantized dimensions,
then range-partition files on that key. Each file's parquet min/max
stats become tight in EVERY interleaved dimension at once, so filters on
ANY of them prune files — a plain sort gives that for one leading column
only. At 100 TB this is the difference between "skip 99% of files on
either predicate" and "full scan unless you filter the sort key".

The z-value is pure integer arithmetic — ``(x DIV 2^i) % 2`` bit probes
recombined with power-of-two weights — generated as a SQL string so the
IDENTICAL formula runs in Spark (``DIV``) and any oracle engine (``//``
for DuckDB). No UDFs, no bit-operator dialect differences, exact by
construction.

Usage for an actual write:
    df.withColumn("z", F.expr(zorder_sql("xq", "yq", 16, "DIV")))
      .repartitionByRange(n_files, "z")
      .sortWithinPartitions("z")
      .write.parquet(...)
"""

from __future__ import annotations


def zorder_sql(x: str, y: str, bits: int, div_op: str) -> str:
    """SQL expression interleaving the low ``bits`` bits of the
    non-negative integer expressions ``x`` (even positions) and ``y``
    (odd positions) into a single z-value.

    ``div_op`` is the engine's integer-division token ("DIV" in Spark
    SQL, "//" in DuckDB); everything else — ``%``, ``*``, ``+`` — parses
    identically in both, so the two engines evaluate the same formula.
    ``x`` and ``y`` must already be quantized into [0, 2^bits); apply
    ``% 2^bits`` (power-of-two mask) or a domain-specific scale first.
    """
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {div_op} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def write_bucketed(
    df,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Bucketing pre-pays the shuffle ONCE at write time: both sides of a
    recurring equi-join stored with the same (key, bucket-count) spec
    join with ZERO runtime exchange — at 100 TB the difference between
    re-shuffling the fact table on every query and never shuffling it.
    ``sort`` additionally orders rows by the key inside each bucket file,
    which lets the join skip its sort phase too.

    Uses the session catalog (in-memory by default: bucket METADATA is
    session-scoped; on a cluster back it with a real metastore —
    warehouse files themselves are plain parquet either way).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def dense_ids_by(df, order_cols, id_name: str = "id", partitions: int | None = None):
    """Assign dense sequential ids ``1..N`` in the total order given by
    ``order_cols`` WITHOUT a single-partition global sort — the
    DataFrame-shaped ``zipWithIndex``.

    How: range-partition on the order key, rank within each partition,
    then add each partition's start offset. The offsets come from one
    O(partitions)-row collect (the same bounded-driver-state carry
    pattern as ``cleaning.ffill``'s two-pass form). The input is
    localCheckpoint'd first so the offset job and the rank job see the
    IDENTICAL partitioning (range boundaries come from data sampling;
    materializing once removes any cross-job resample risk).

    ``order_cols`` must be a total order (include a unique tiebreaker);
    equal keys split across a range boundary would otherwise make ranks
    nondeterministic.

    Scale: the sort is fully distributed; driver state is one count per
    partition. This is how a bounded-but-large dimension (a token
    vocabulary, a user directory) gets contiguous ids for array/embedding
    indexing at any size.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sizes = sorted(
        (r["_pid"], r["cnt"])
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offset, offsets = 0, {}
    for pid, cnt in sizes:
        offsets[pid] = offset
        offset += cnt
    off_expr = F.lit(0)
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(off_expr)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn(id_name, (F.row_number().over(w) + off_expr).cast("long"))
        .drop("_pid")
    )
