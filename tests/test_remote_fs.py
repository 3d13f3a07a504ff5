"""Contract tests for the object-store layer (S3/S7/K4) against file://
URIs — the same Hadoop FileSystem code path a gs://-configured cluster
exercises, with zero cloud credentials (remote_fs module docstring).

Reference behavior being covered: S3 blob download
(/root/reference/src/extraction.py:100-177), S7 client init, K4 upload
(/root/reference/src/load_to_gcp.py:90-92).
"""

import pytest

from etl_dashboard_project_1_spark.sources import readers, remote_fs, writers


def test_fs_upload_download_roundtrip(spark, tmp_path):
    src = tmp_path / "artifact.json"
    src.write_text('{"catalog": 1}')
    remote = (tmp_path / "bucket").as_uri() + "/catalogs/artifact.json"

    assert not remote_fs.fs_exists(spark, remote)
    remote_fs.fs_upload(spark, src, remote)
    assert remote_fs.fs_exists(spark, remote)

    back = remote_fs.fs_download(spark, remote, tmp_path / "back" / "artifact.json")
    assert back.read_text() == '{"catalog": 1}'


def test_fs_list(spark, tmp_path):
    base = tmp_path / "bucket"
    for name in ("b.csv", "a.csv"):
        f = tmp_path / name
        f.write_text("x")
        remote_fs.fs_upload(spark, f, base.as_uri() + f"/{name}")
    names = [u.rsplit("/", 1)[1] for u in remote_fs.fs_list(spark, base.as_uri())]
    assert names == ["a.csv", "b.csv"]


def test_read_write_uri_dataframe_roundtrip(spark, tmp_path):
    """The actual at-scale data path: df.write straight to the store URI
    (per-partition files, no driver funnel) and spark.read back."""
    df = spark.range(100).withColumnRenamed("id", "k")
    uri = (tmp_path / "bucket").as_uri() + "/table"
    remote_fs.write_uri(df, uri)
    back = remote_fs.read_uri(spark, uri)
    assert back.count() == 100
    # parquet re-read marks columns nullable; names/types must round-trip
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]


def test_configure_object_store_sets_connector_conf(spark):
    remote_fs.configure_object_store(
        spark, {"google.cloud.auth.service.account.json.keyfile": "/tmp/k.json"}
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.gs.impl") == "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
    assert hconf.get("google.cloud.auth.service.account.json.keyfile") == "/tmp/k.json"


def test_upload_to_gcs_spark_path_uses_hadoop_fs(spark, tmp_path, monkeypatch):
    """K4 control flow: with a session, upload_to_gcs routes through
    remote_fs (no google-cloud-storage import). The gs:// URI build is
    checked by intercepting fs_upload."""
    calls = {}
    monkeypatch.setattr(
        remote_fs, "fs_upload", lambda s, local, uri: calls.setdefault("uri", uri)
    )
    src = tmp_path / "out.csv"
    src.write_text("a,b\n")
    writers.upload_to_gcs(src, "my-bucket", "exports/out.csv", spark=spark)
    assert calls["uri"] == "gs://my-bucket/exports/out.csv"


def test_gcs_download_spark_path_uses_hadoop_fs(spark, tmp_path, monkeypatch):
    """S3 control flow: with a session, gcs_download routes through
    remote_fs.fs_download with the gs:// URI."""
    calls = {}
    monkeypatch.setattr(
        remote_fs,
        "fs_download",
        lambda s, uri, dest: calls.setdefault("args", (uri, str(dest))),
    )
    readers.gcs_download("my-bucket", "raw/data.xlsx", tmp_path / "d.xlsx", spark=spark)
    assert calls["args"][0] == "gs://my-bucket/raw/data.xlsx"


def test_gcs_download_without_session_is_import_gated():
    with pytest.raises(NotImplementedError):
        readers.gcs_download("b", "o", "/tmp/x")


def test_acquire_with_fallback_to_object_store(spark, tmp_path):
    """S1-S3 chain: primary acquisition fails, the object-store fallback
    (file://-backed here, gs:// in production) delivers the artifact."""
    blob = tmp_path / "store" / "dataset.xlsx"
    blob.parent.mkdir()
    blob.write_bytes(b"workbook-bytes")
    uri = blob.as_uri()

    def primary():
        raise ConnectionError("scrape failed")

    def fallback():
        return remote_fs.fs_download(spark, uri, tmp_path / "local" / "dataset.xlsx")

    path, used = readers.acquire_with_fallback(primary, fallback)
    assert used == "fallback"
    assert path.read_bytes() == b"workbook-bytes"
