#!/usr/bin/env python
"""Stage-level diagnosis of the r2 dedup_minhash_lsh bench move
(1.451 s r1 -> 1.661 s r2, despite the hash-once signature optimization).

Questions, answered from the EXECUTED plan + sub-pipeline timings:
 1. Does the hash-once projection survive optimization, i.e. does md5
    appear ONCE per shingle in the signature stage, or num_hashes times
    (CollapseProject folding it back)?
 2. Where does the wall-clock actually go: signatures, band join, or
    verify? (If hashing is a small slice, the r2 move is the candidate
    join / platform, not the optimization failing.)

Usage: python tools/diag_minhash.py [sf_dir]
"""

import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from etl_dashboard_project_1_spark.operators import dedup
from etl_dashboard_project_1_spark.plans import extension_queries
from etl_dashboard_project_1_spark.session import fan_out, get_spark, load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(tag, build, spark, n=3):
    force(build(spark))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        force(build(spark))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best:.3f}s")
    return best


def main():
    spark = get_spark(app_name="diag-minhash")
    docs = lambda s: fan_out(load_table(s, SF, "documents"))

    # 1) md5 multiplicity in the optimized signature plan
    sig = dedup.minhash_signatures(docs(spark), "doc_id", "text")
    plan = sig._jdf.queryExecution().executedPlan().toString()
    n_md5 = len(re.findall(r"md5\(", plan))
    print(f"md5 occurrences in executed signature plan: {n_md5} "
          f"(1 = hash-once survives; ~num_hashes = collapsed back)")

    # 2) sub-pipeline timings
    t_sh = timed("shingle_sets only   ", lambda s: dedup.shingle_sets(docs(s), "doc_id", "text"), spark)
    t_sig = timed("signatures          ", lambda s: dedup.minhash_signatures(docs(s), "doc_id", "text"), spark)
    t_full = timed("full minhash_lsh    ", lambda s: extension_queries.dedup_minhash_lsh(s, SF), spark)
    print(f"breakdown: shingles={t_sh:.3f} signatures={t_sig:.3f} "
          f"(hashing+minhash slice={t_sig - t_sh:.3f}) full={t_full:.3f} "
          f"(join+verify slice={t_full - t_sig:.3f})")

    # 3) inlined-md5 counterfactual: signatures WITHOUT the hash-once split
    from pyspark.sql import functions as F

    def sig_inlined(s):
        ss = dedup.shingle_sets(docs(s), "doc_id", "text")
        def hash_i(i):
            a, b = dedup.minhash_coeffs(i)
            return lambda sh: (F.lit(a) * dedup.md5_int(sh) + F.lit(b)) % dedup.MINHASH_PRIME
        mins = [F.array_min(F.transform(F.col("_sh"), hash_i(i))).alias(f"_m{i}")
                for i in range(8)]
        return ss.select("_id", *mins)

    t_inl = timed("signatures inlined  ", sig_inlined, spark)
    print(f"hash-once vs inlined: {t_sig:.3f} vs {t_inl:.3f}")


if __name__ == "__main__":
    main()
