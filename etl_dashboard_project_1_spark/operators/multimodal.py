"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is REAL and tested: binary column schema,
partition-preserving batch iteration, deterministic metadata extraction,
output schema contracts. The actual media decoding is STUBBED — this
container has no image/audio libraries — behind ``decode_image_stub``:
a deterministic fake decoder (md5-derived dimensions) with the same
signature a Pillow/libav-backed implementation would have. Swapping in a
real decoder changes ONE function, not the pipeline.

Scale notes: mapInPandas streams Arrow batches per partition — memory is
bounded by batch size regardless of corpus size; binary payloads never
pass through the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, channels int, format string"
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 encode of a
    text column, standing in for image bytes read from an object store)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def read_binary_files(
    spark,
    path: str,
    glob: str | None = None,
    id_from_name: bool = True,
) -> DataFrame:
    """The REAL media-ingestion path: Spark's ``binaryFile`` source reads
    raw files (images/audio/video blobs) distributed — each executor
    opens its own splits from local disk or any object store URI, emitting
    ``(path, modificationTime, length, content: binary)``. Pairs with
    every operator below (``content`` is the payload column); at 100 TB
    this replaces :func:`attach_binary`, which exists only to fake
    payloads out of the text corpus for oracle-checkable tests.

    ``id_from_name=True`` adds a ``doc_id`` parsed from the file stem's
    trailing digits (the layout convention ``<anything><id>.<ext>``),
    aligning the files with the ``documents`` table's key so decode
    results join back to metadata."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if id_from_name:
        stem = F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"(\d+)\.[^.]+$", 1)
        df = df.withColumn("doc_id", F.nullif(stem, F.lit("")).cast("bigint"))
    return df.select(
        "doc_id", "path", "length", F.col("content").alias("payload")
    ) if id_from_name else df.select("path", "length", F.col("content").alias("payload"))


def decode_image_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake in place of a real image decode.

    A real implementation would be::

        from PIL import Image              # not available in this container
        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, ...}

    The fake derives width/height/channels from the payload's md5 so the
    whole pipeline (schema, batching, joins, oracle comparison) is
    exercised with stable values.
    """
    h = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "width": int(h[:2], 16) % 64 + 16,
        "height": int(h[2:4], 16) % 64 + 16,
        "channels": int(h[4:6], 16) % 3 + 1,
        "format": "fake/raw",
    }


def extract_image_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over the binary column: one Arrow
    batch in, one metadata frame out. The id column rides along so results
    join back without a shuffle of the payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_stub(p) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODED_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame sampling' over an opaque byte stream: emits one row per
    sampled offset with an md5 fingerprint per frame — the exact plumbing
    (explode fan-out, per-frame rows, bounded fan-out) a video
    frame-sampler needs, with the decode stubbed to byte-slicing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = max(1, min(max_frames, len(payload) // every_n_bytes))
                for f in range(n):
                    chunk = bytes(payload[f * every_n_bytes : (f + 1) * every_n_bytes])
                    rows.append(
                        {
                            "doc_id": _id,
                            "frame_no": f,
                            "frame_hash": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_hash"])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id bigint, frame_no bigint, frame_hash string"
    )


def resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize — deterministic fake in place of a real raster resize.

    A real implementation would be::

        img = Image.open(io.BytesIO(payload)).resize((target_w, target_h))
        ... img.tobytes()                  # Pillow not in this container

    The fake emits exactly ``target_w * target_h`` bytes derived by
    cycling the payload — correct output SIZE contract, stable content.
    """
    if not payload:
        return b"\x00" * (target_w * target_h)
    reps = (target_w * target_h) // len(payload) + 1
    return (bytes(payload) * reps)[: target_w * target_h]


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas binary→binary transform (the resize/transcode shape):
    payloads stay executor-side, output schema is (id, resized binary,
    n_bytes). Batch memory = Arrow batch size × payload size, independent
    of corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_stub(p, target_w, target_h) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "resized": resized,
                    "n_bytes": [len(r) for r in resized],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id bigint, resized binary, n_bytes bigint"
    )


def feature_vector_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB feature extractor — md5-derived unit-scale floats standing in
    for a real embedding model's output (same signature, stable values)."""
    h = hashlib.md5(payload).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    dim: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas binary→vector featurization: the batch shape a real
    model-inference UDF uses (load model once per partition iterator,
    score per Arrow batch). Output is ``array<double>`` ready for the
    vector operators (cosine top-k, IVF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real implementation loads the model HERE, once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "features": [feature_vector_stub(p, dim) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id bigint, features array<double>"
    )


def audio_energy_stub(
    payload: bytes, window_bytes: int = 32, hop_bytes: int = 16, max_windows: int = 8
) -> list[int]:
    """STUB audio decode — per-window energies over OVERLAPPED windows
    (50% hop), the standard audio segmentation shape. A real
    implementation would RMS PCM samples::

        import numpy as np                  # real path
        pcm = np.frombuffer(payload, dtype=np.int16)
        ...

    The fake derives each window's energy from the md5 of its byte slice
    so schema, batching and the oracle comparison are exercised with
    stable values.
    """
    n = max(1, min(max_windows, len(payload) // hop_bytes - 1))
    out = []
    for w in range(n):
        seg = payload[w * hop_bytes : w * hop_bytes + window_bytes]
        out.append(int(hashlib.md5(seg).hexdigest()[:4], 16))
    return out


def audio_window_peaks(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio-shaped pipeline: Python-side windowed energy extraction
    (Arrow batches, bounded ≤8-window fan-out per payload) feeding
    JVM-side neighbor analytics — each window flagged as a local energy
    peak via lag/lead over the per-doc window sequence. The shuffle is on
    (doc) for the window ordering only; payload bytes never shuffle (the
    mapInPandas projects them away)."""
    from pyspark.sql import Window as W

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                for wi, e in enumerate(audio_energy_stub(p)):
                    rows.append((i, wi, e))
            yield pd.DataFrame(rows, columns=["doc_id", "win_idx", "energy"])

    wins = df.select(id_col, payload_col).mapInPandas(
        run, schema="doc_id bigint, win_idx int, energy bigint"
    )
    w = W.partitionBy("doc_id").orderBy("win_idx")
    prev = F.coalesce(F.lag("energy").over(w), F.lit(-1))
    nxt = F.coalesce(F.lead("energy").over(w), F.lit(-1))
    return wins.withColumn("is_peak", (F.col("energy") > prev) & (F.col("energy") > nxt))


def phash_stub(payload_col: str = "payload"):
    """Fake 32-bit perceptual hash of a binary payload — the STUB
    standing in for a real pHash (grayscale thumbnail → 2D DCT → sign of
    the top-left coefficients), which needs the image stack this
    container lacks. The fake is the payload's md5 prefix: identical
    payloads collide at hamming 0 and everything else is ~random, so the
    banding/verification machinery downstream is exercised for real
    while the perceptual property waits on the real decoder (swap ONE
    expression, like ``decode_image_stub``)."""
    from .dedup import md5_int  # the shared engine-portable md5-prefix hash

    return md5_int(F.col(payload_col))


def phash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    prefix_bits: int = 8,
    max_hamming: int = 2,
) -> DataFrame:
    """Image near-dup candidates by perceptual-hash hamming distance —
    the multimodal analog of ``dedup.simhash_pairs``: candidates must
    share the fingerprint's top ``prefix_bits`` (block-bounded
    self-join, never n²), verified by exact ``bit_count(xor)``. At
    corpus scale the standard multi-rotation extension widens recall;
    one rotation keeps the oracle mirror exact."""
    sig = df.select(
        F.col(id_col).alias("_id"), phash_stub(payload_col).alias("_ph")
    ).withColumn("_blk", F.shiftright(F.col("_ph"), 32 - prefix_bits))
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(F.col("a._ph").bitwiseXOR(F.col("b._ph"))).cast("long")
    return (
        a.join(b, (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
