#!/usr/bin/env python
"""A/B diagnosis of the r2 text_quality bench regression (0.50 -> 1.49 s).

Hypothesis: the query's expression tree re-derives the same regex/token
work many times (quality_score alone re-computes token_count, punct_ratio
and stopword_ratio that the surrounding select already emits); whether
Spark's subexpression elimination collapses them changed across 4.0->4.1.

Variants, each forced end-to-end with the noop sink, warm, best-of-3:
  A  current registered formulation (plans/extension_queries.text_quality)
  B  factored: tokenization + whitespace-strip projected ONCE, every
     measure derived from the intermediates (explicit CSE)
  C  current formulation with codegen subexpressionElimination toggled off
     (isolates whether Spark-side CSE is what moved)

Usage: python tools/diag_text_quality.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from etl_dashboard_project_1_spark.operators import derive, textops
from etl_dashboard_project_1_spark.plans import extension_queries
from etl_dashboard_project_1_spark.session import fan_out, get_spark, load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def factored(spark, sf_dir):
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    stop = F.size(F.filter("_t", lambda w: w.isin(*textops.EN_STOPWORDS)))
    mid = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.split(F.lower("text"), r"\s+").alias("_t"),
        F.regexp_replace("text", r"\s", "").alias("_nws"),
    ).select(
        "doc_id",
        "n_tokens",
        (
            (F.length("_nws") - F.length(F.regexp_replace("_nws", r"[^a-zA-Z0-9]", "")))
            / F.greatest(F.length("_nws"), F.lit(1))
        ).alias("_punct"),
        (stop / F.greatest(F.size("_t"), F.lit(1))).alias("_stop"),
        (
            F.aggregate("_t", F.lit(0), lambda acc, w: acc + F.length(w))
            / F.greatest(F.size("_t"), F.lit(1))
        ).alias("_mwl"),
    )
    quality = (
        0.4 * F.least(F.col("n_tokens") / F.lit(200.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - F.col("_punct"))
        + 0.3 * F.least(F.col("_stop") / F.lit(0.08), F.lit(1.0))
    )
    return mid.select(
        "doc_id",
        "n_tokens",
        derive.portable_round("_punct", 4).alias("punct_ratio"),
        derive.portable_round("_stop", 4).alias("stop_ratio"),
        derive.portable_round("_mwl", 4).alias("mean_word_len"),
        derive.portable_round(quality, 4).alias("quality"),
    )


def force(df):
    df.write.format("noop").mode("overwrite").save()


def bench(tag, build, spark, n=3):
    force(build(spark, SF))  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        force(build(spark, SF))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best:.3f}s")
    return best


def main():
    spark = get_spark(app_name="diag-text-quality")
    a = bench("A current        ", extension_queries.text_quality, spark)
    b = bench("B factored       ", factored, spark)
    spark.conf.set("spark.sql.subexpressionElimination.enabled", "false")
    c = bench("C current, CSE off", extension_queries.text_quality, spark)
    spark.conf.set("spark.sql.subexpressionElimination.enabled", "true")

    # value parity A vs B (sorted hash over rounded outputs)
    rows_a = sorted(map(tuple, extension_queries.text_quality(spark, SF).collect()))
    rows_b = sorted(map(tuple, factored(spark, SF).collect()))
    print("A==B values:", rows_a == rows_b)
    print(f"summary: A={a:.3f} B={b:.3f} C={c:.3f}")


if __name__ == "__main__":
    main()
