"""Object-store connectivity (S3/S7/K4), Spark-first.

The reference reaches its bucket with the google-cloud-storage Python
client — driver-side, single-process (S3 download at
extraction.py:100-177, S7 client init, K4 upload at load_to_gcp.py:90-92).
On Spark the idiomatic path is the Hadoop FileSystem layer: every
executor (not just the driver) can read/write ``gs://`` / ``s3a://`` /
``hdfs://`` / ``file://`` URIs once the connector is configured, and
``spark.read``/``df.write`` against those URIs keeps the data path fully
distributed — bytes never funnel through the driver.

Everything here works against ANY Hadoop filesystem scheme, so the whole
surface is contract-tested with ``file://`` URIs — no cloud credentials
or optional Python packages needed. The google-cloud-storage client path
stays available as an import-gated fallback for driver-side,
non-Spark contexts (see ``readers.gcs_download`` / ``writers.upload_to_gcs``).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Hadoop conf keys for the public GCS connector (hadoop-connectors). Set
# via configure_object_store; harmless when the connector jar is absent
# (only consulted on first gs:// access).
GCS_CONNECTOR_CONF = {
    "fs.gs.impl": "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
    "fs.AbstractFileSystem.gs.impl": "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS",
}


def configure_object_store(spark: SparkSession, conf: dict[str, str] | None = None) -> None:
    """S7: connector init, Spark-style. The reference builds a
    ``storage.Client()``; here the equivalent is Hadoop configuration on
    the live session — after this, plain ``spark.read.parquet('gs://…')``
    / ``df.write.csv('gs://…')`` are the data paths (distributed, no
    driver hop). Pass credential/tuning keys in ``conf``
    (e.g. ``google.cloud.auth.service.account.json.keyfile``)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in {**GCS_CONNECTOR_CONF, **(conf or {})}.items():
        hconf.set(k, v)


def _fs_for(spark: SparkSession, uri: str):
    """A Hadoop FileSystem handle for the URI's scheme."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    juri = jvm.java.net.URI.create(uri)
    return jvm.org.apache.hadoop.fs.FileSystem.get(juri, hconf), jvm


def fs_exists(spark: SparkSession, uri: str) -> bool:
    fs, jvm = _fs_for(spark, uri)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(uri))


def fs_list(spark: SparkSession, uri: str) -> list[str]:
    """Child URIs under a directory URI (non-recursive)."""
    fs, jvm = _fs_for(spark, uri)
    statuses = fs.listStatus(jvm.org.apache.hadoop.fs.Path(uri))
    return sorted(str(s.getPath()) for s in statuses)


def fs_download(spark: SparkSession, uri: str, dest: str | Path) -> Path:
    """S3: fetch one remote object to a local path — the Hadoop-FS form
    of the reference's blob ``download_to_filename``. Driver-side by
    design: this is for metadata-scale artifacts (catalogs, workbooks);
    DATA should be read in place with ``spark.read`` against the URI."""
    fs, jvm = _fs_for(spark, uri)
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    fs.copyToLocalFile(
        False,  # keep the source
        jvm.org.apache.hadoop.fs.Path(uri),
        jvm.org.apache.hadoop.fs.Path(str(dest)),
        True,  # raw local fs: no .crc sidecar files
    )
    return dest


def fs_upload(spark: SparkSession, local: str | Path, uri: str) -> str:
    """K4: push one local file to a remote URI — the Hadoop-FS form of
    the reference's ``blob.upload_from_filename``. Same caveat as
    :func:`fs_download`: metadata-scale artifacts only; DATA sinks write
    directly to the URI via ``df.write``."""
    fs, jvm = _fs_for(spark, uri)
    fs.copyFromLocalFile(
        False, True, jvm.org.apache.hadoop.fs.Path(str(local)), jvm.org.apache.hadoop.fs.Path(uri)
    )
    return uri


def read_uri(spark: SparkSession, uri: str, fmt: str = "parquet", **options) -> DataFrame:
    """Distributed read of an object-store URI — the actual 100 TB data
    path (executors fetch their own splits; predicate/column pushdown
    intact)."""
    return spark.read.options(**options).format(fmt).load(uri)


def write_uri(df: DataFrame, uri: str, fmt: str = "parquet", mode: str = "overwrite", **options) -> None:
    """Distributed write to an object-store URI — the K4-at-scale path
    (per-partition files, no driver funnel)."""
    df.write.options(**options).format(fmt).mode(mode).save(uri)
