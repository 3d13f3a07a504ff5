#!/usr/bin/env python
"""A/B the custom MinHash+LSH pipeline against Spark ML's built-in
``MinHashLSH`` (HashingTF features -> approxSimilarityJoin) on the same
corpus and threshold.

Why the engine ships a custom pipeline at all, when SURVEY's build plan
floated the built-in:
  1. Oracle-ability: ML's hash family (random coefficients seeded JVM-side)
     and its Jaccard-distance estimate cannot be mirrored in DuckDB SQL,
     so the correctness gate would degrade to rows-only. The custom
     pipeline's md5-mixed coefficients reproduce bit-for-bit in SQL.
  2. Exactness: approxSimilarityJoin filters on ESTIMATED distance from
     the signatures (missed pairs stay missed); the custom pipeline
     verifies candidates with exact Jaccard, so banding only affects
     recall of CANDIDATES, and every emitted pair is exact.
  3. HashingTF features collide tokens into a fixed dim (2^18 default)
     before hashing — another approximation layer the custom gram sets
     don't have.
This tool quantifies the trade: wall clock + pair agreement vs the exact
ngram-jaccard ground truth at the same threshold.

Usage: python tools/diag_ml_minhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from etl_dashboard_project_1_spark.operators import dedup  # noqa: E402
from etl_dashboard_project_1_spark.session import fan_out, get_spark, load_table  # noqa: E402

THRESHOLD = 0.2  # same as the registered dedup_minhash_lsh


def force(df):
    df.write.format("noop").mode("overwrite").save()


def ml_pipeline(spark, sf_dir):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", dedup.word_shingles("text", 3).alias("grams")
    ).filter(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", binary=True)
    feats = tf.transform(grams)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - THRESHOLD, distCol="jaccard_dist"
    )
    return joined.filter(
        F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
    ).select(
        F.col("datasetA.doc_id").alias("id_a"),
        F.col("datasetB.doc_id").alias("id_b"),
        (1.0 - F.col("jaccard_dist")).alias("jaccard_est"),
    )


def custom_pipeline(spark, sf_dir):
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=8, band_size=2,
        threshold=THRESHOLD, reuse="checkpoint", hashed=False,
    )


def exact_pairs(spark, sf_dir):
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=THRESHOLD, method="allpairs"
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="diag-ml-minhash")
    spark.sparkContext.setLogLevel("ERROR")

    truth = {
        (r["id_a"], r["id_b"]) for r in exact_pairs(spark, sf).collect()
    }
    ml = {(r["id_a"], r["id_b"]) for r in ml_pipeline(spark, sf).collect()}
    custom = {(r["id_a"], r["id_b"]) for r in custom_pipeline(spark, sf).collect()}

    def report(tag, got):
        tp = len(got & truth)
        print(
            f"{tag}: {len(got)} pairs | recall {tp}/{len(truth)}"
            f" = {tp / max(len(truth), 1):.3f} | false-positives {len(got - truth)}"
        )

    report("ml_minhash (approxSimilarityJoin, est-dist filter)", ml)
    report("custom    (banded LSH + exact verify)", custom)

    for tag, build in (("ml", ml_pipeline), ("custom", custom_pipeline)):
        force(build(spark, sf))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            force(build(spark, sf))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag} wall: {best:.3f}s (best of {reps})")


if __name__ == "__main__":
    main()
