#!/usr/bin/env python
"""A/B the glued multi-job audit queries against shared-scan variants.

Round-3 plan audit flagged three report queries whose exchange counts
come from running N independent jobs and unioning 1-row summaries:
  * ri_audit_all_edges      18 exchanges = 6 edges x (agg job + anti-join job)
  * fd_violation_profile    12 exchanges = 4 per-table groupBy profiles
  * column_encoding_advisor 12 exchanges = 6 per-column histograms

Shared-scan candidates measured here:
  * RI: per CHILD table, one scan chains left joins to every parent and
    a single multi-aggregate (count / countDistinct per FK / null-hit
    orphan count) replaces the per-edge agg+anti-join pair; a 1-row
    stack unpivots to edge rows. 6 jobs -> 4 (lineitem's 3 edges share
    one scan).
  * FD: every candidate's (lhs, rhs) stream casts to string, unions,
    and ONE groupBy(fd, lhs) -> groupBy(fd) pass profiles all four
    dependencies. 4 jobs -> 1.
  * ENC: per table, stack() unpivots the candidate columns in one scan;
    streams union and ONE groupBy(column_name, v) histogram ->
    groupBy(column_name) summary serves all six columns. 6 jobs -> 1.

For each pair: parity check (sorted collected rows must be identical),
then interleaved timed reps. Adopt a fused form only where it wins;
record the numbers in PLANS.md either way.

Usage: python tools/diag_shared_scan.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from functools import reduce

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_dashboard_project_1_spark.plans.dashboard_queries import (  # noqa: E402
    RI_EDGES, ri_audit_all_edges)
from etl_dashboard_project_1_spark.plans.profile_queries import (  # noqa: E402
    ENC_COLUMNS, FD_CANDIDATES, column_encoding_advisor, fd_violation_profile)
from etl_dashboard_project_1_spark.session import get_spark, load_table  # noqa: E402


def ri_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    by_child: dict[str, list] = defaultdict(list)
    for edge, child, fk, parent, pk in RI_EDGES:
        by_child[child].append((edge, fk, parent, pk))
    parts = []
    for child, edges in by_child.items():
        j = load_table(spark, sf_dir, child)
        for i, (_edge, fk, parent, pk) in enumerate(edges):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"_pk{i}"))
                .withColumn(f"_hit{i}", F.lit(1))
            )
            j = j.join(p, F.col(fk) == F.col(f"_pk{i}"), "left")
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, (_edge, fk, _parent, _pk) in enumerate(edges):
            aggs.append(F.countDistinct(fk).alias(f"_fk{i}"))
            aggs.append(
                F.sum(F.when(F.col(f"_hit{i}").isNull(), 1).otherwise(0)).alias(
                    f"_orph{i}"
                )
            )
        row = j.agg(*aggs)
        stack = ", ".join(
            f"'{edge}', _n, _fk{i}, _orph{i}" for i, (edge, *_rest) in enumerate(edges)
        )
        parts.append(
            row.select(
                F.expr(
                    f"stack({len(edges)}, {stack}) "
                    "AS (edge, n_child_rows, n_fk_values, n_orphans)"
                )
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def fd_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams = [
        load_table(spark, sf_dir, table).select(
            F.lit(name).alias("fd"),
            F.col(lhs).cast("string").alias("lhs"),
            F.col(rhs).cast("string").alias("rhs"),
        )
        for name, table, lhs, rhs in FD_CANDIDATES
    ]
    u = reduce(lambda a, b: a.unionByName(b), streams)
    g = u.groupBy("fd", "lhs").agg(F.countDistinct("rhs").alias("v"))
    return (
        g.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.coalesce(F.sum((F.col("v") > 1).cast("long")), F.lit(0)).alias(
                "n_violating"
            ),
            F.coalesce(F.max("v"), F.lit(0)).alias("max_fanout"),
        )
        .select(
            "fd", "n_groups", "n_violating", "max_fanout",
            (F.col("n_violating") == 0).alias("holds"),
        )
    )


def enc_per_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r4 per-column form (6 independent histogram jobs) kept
    here as the A/B base — the registered query adopted the fused
    shared-scan shape after this tool measured it faster."""
    parts = []
    for label, table, col in ENC_COLUMNS:
        t = load_table(spark, sf_dir, table)
        h = t.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
        parts.append(
            h.agg(
                F.lit(label).alias("column_name"),
                F.sum("c").alias("n_rows"),
                F.count(F.lit(1)).alias("ndv"),
                F.sum(F.col("c") * F.octet_length("v")).alias("raw_bytes"),
                F.sum(F.octet_length("v")).alias("dict_bytes"),
            )
            .select(
                "column_name", "n_rows", "ndv", "raw_bytes", "dict_bytes",
                F.expr("CASE WHEN ndv >= 2 THEN length(bin(ndv - 1)) ELSE 1 END")
                .cast("long")
                .alias("code_bits"),
            )
            .select("*", F.expr("(n_rows * code_bits + 7) DIV 8").alias("code_bytes"))
            .select(
                "*",
                F.expr("raw_bytes * 10000 DIV (dict_bytes + code_bytes)").alias(
                    "ratio_bp"
                ),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


PAIRS = [
    ("ri_audit_all_edges", ri_audit_all_edges, ri_fused),
    ("fd_violation_profile", fd_violation_profile, fd_fused),
    ("column_encoding_advisor", enc_per_column, column_encoding_advisor),
]


def _rows(df: DataFrame):
    return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())


def _force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _exchanges(df: DataFrame) -> int:
    _force(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="diag-shared-scan")
    spark.sparkContext.setLogLevel("ERROR")

    for name, base, fused in PAIRS:
        assert _rows(base(spark, sf)) == _rows(fused(spark, sf)), f"{name}: PARITY FAIL"
        print(f"{name}: parity OK; exchanges base={_exchanges(base(spark, sf))} "
              f"fused={_exchanges(fused(spark, sf))}")

    for name, base, fused in PAIRS:
        for fn in (base, fused):  # warm
            _force(fn(spark, sf))
        t: dict[str, list[float]] = {"base": [], "fused": []}
        for _ in range(reps):
            for key, fn in (("base", base), ("fused", fused)):
                t0 = time.perf_counter()
                _force(fn(spark, sf))
                t[key].append(time.perf_counter() - t0)
        print(
            f"{name}: base min={min(t['base']):.3f} med={sorted(t['base'])[reps // 2]:.3f} | "
            f"fused min={min(t['fused']):.3f} med={sorted(t['fused'])[reps // 2]:.3f}"
        )


if __name__ == "__main__":
    main()
