"""Sink operators K1-K6 (SURVEY.md §2.2), Spark-first.

The reference writes pandas CSVs to local disk + GCS; here sinks are
``df.write`` (distributed, per-partition files). ``single_file=True``
coalesces to one part for small dashboard exports — an explicit choice,
never the default (a single writer is a scale bottleneck).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """K1: CSV sink."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_projected_csv(
    df: DataFrame, columns: list[str], path: str, mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """K2: final-projection CSV sink (~35 dashboard columns). Missing
    columns are skipped (schema-drift tolerant)."""
    keep = [c for c in columns if c in df.columns]
    write_csv(df.select(*keep), path, mode=mode, single_file=single_file)


def data_driven_filename(
    df: DataFrame, col: str, prefix: str = "datos", ext: str = "csv"
) -> str:
    """K3: '<prefix>_<min>-<max>.<ext>' from a min/max aggregate over the
    data (reference: datos3cv_2013-2026.csv)."""
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    return f"{prefix}_{row['lo']}-{row['hi']}.{ext}"


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Parquet sink, optionally hive-partitioned — the scale-default sink
    (columnar, splittable, predicate-pushdown-able on re-read)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def upload_to_gcs(local: str | Path, bucket: str, blob: str, spark=None):
    """K4: GCS upload (reference load_to_gcp.py:90-92 uses the
    google-cloud-storage client).

    Spark-first path: with a live session, push through the Hadoop
    filesystem layer (``remote_fs.fs_upload`` on a gs:// URI) — same code
    path contract-tested against ``file://`` (tests/test_remote_fs.py).
    For DATA sinks, skip the local hop entirely: ``df.write`` straight to
    the gs:// URI keeps the write distributed (per-partition files, no
    driver funnel). Driver-only fallback (no session): the
    google-cloud-storage client, import-gated — absent here."""
    if spark is not None:
        from . import remote_fs

        return remote_fs.fs_upload(spark, local, f"gs://{bucket}/{blob}")
    try:  # pragma: no cover - env
        from google.cloud import storage
    except ImportError as exc:
        raise NotImplementedError("google-cloud-storage not available") from exc
    client = storage.Client()  # pragma: no cover - env
    client.bucket(bucket).blob(blob).upload_from_filename(str(local))  # pragma: no cover - env


def write_json_catalog(catalog: dict, path: str | Path) -> None:
    """K5: persist a metadata catalog (driver-side, pretty, utf-8)."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(catalog, f, indent=2, ensure_ascii=False)


def write_catalog_audit_csv(rows: list[tuple[str, str, str]], path: str | Path) -> None:
    """K6: mapping-audit CSV — (standard_name, original_name, hash) rows
    exploded from the header catalog (driver-side, metadata-scale)."""
    import csv

    with open(path, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f)
        w.writerow(["standard_name", "original_name", "hash"])
        w.writerows(rows)


def compact_parquet(
    spark, path: str, target_files: int, out_path: str | None = None
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (repartition — a full shuffle — so output
    files are evenly sized regardless of input skew; use coalesce only
    when input files are already balanced). In-place by default via an
    atomic-rename staging dir; returns the number of data files written.

    The operational fix for streaming/incremental sinks: a foreachBatch
    upsert or append-mode stream leaves one file per micro-batch per
    partition, and a 100 TB table read slows down linearly with file
    count until compacted."""
    import glob
    import os
    import shutil

    dest = out_path or path
    staging = dest.rstrip("/") + "__compact"
    spark.read.parquet(path).repartition(target_files).write.mode("overwrite").parquet(
        staging
    )
    if os.path.exists(dest):
        old = dest.rstrip("/") + "__old"
        os.rename(dest, old)
        os.rename(staging, dest)
        shutil.rmtree(old)
    else:
        os.rename(staging, dest)
    return len(glob.glob(os.path.join(dest, "part-*")))


def write_jsonl(df: DataFrame, path: str | Path, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, splittable for re-ingestion)."""
    df.write.mode(mode).json(str(path))


def write_orc(df: DataFrame, path: str | Path, mode: str = "overwrite") -> None:
    """ORC sink — second columnar format (Hive interchange); same pushdown
    and pruning properties as parquet from Spark's side."""
    df.write.mode(mode).orc(str(path))


def read_orc(spark, path: str | Path) -> DataFrame:
    return spark.read.orc(str(path))


def write_xml(
    df: DataFrame, path: str | Path, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (Spark 4 native, no external package) — the interchange
    format regulatory/legacy feeds still demand; one element per row
    under ``row_tag``."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(str(path))
