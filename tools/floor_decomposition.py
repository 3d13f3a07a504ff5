#!/usr/bin/env python
"""Decompose the headline bench total into data-volume-dependent compute
vs the fixed per-query latency floor (BASELINE.md 2x-bar adjudication).

Two measurements, one session:

1. **Volume invariance** — every headline query timed (min of N_PASSES,
   after warmup — bench.py's aggregation) at sf0.001 AND sf0.1. The data
   differs 100x; any time that does NOT move with it is the fixed floor:
   driver-side plan construction (Python DSL -> Catalyst), AQE
   query-stage scheduling, task launch, and sink commit. The floor
   estimate per query is min(t_sf0.001, t_sf0.1); the compute estimate
   is the sf0.1 excess.

2. **Jobs-vs-wall gap** — for a probe subset, the wall-clock of one
   forced run vs the sum of the Spark-reported job durations inside it
   (AppStatusStore). Wall minus jobs is time the driver spent BETWEEN
   jobs: AQE re-optimization + stage submission + py4j — latency that
   exists per query regardless of data volume.

Why this matters for the 2x bar: the DuckDB comparator
(tools/duckdb_bench.py) has a per-query floor of ~1-10 ms; Spark's is
~200-400 ms on this box. At sf0.1 the 15-query headline carries
15 x ~0.3 s of floor that a 100 TB run pays identically — i.e. once,
against hours of scan — so raw-total ratios at toy scale measure the
scheduling floor, not the plans. The compute-only comparison
(sf0.1 excess vs DuckDB) is the scale-relevant number; both are printed.

Prints ONE JSON line:
  {"metric": "headline_floor_decomposition", "floor_total_sec": ...,
   "compute_excess_sf01_sec": ..., "queries": {name: {"sf0001": ...,
   "sf01": ..., "floor": ..., "excess": ...}}, "gap_probe": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from etl_dashboard_project_1_spark.session import get_spark  # noqa: E402

N_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GAP_PROBE = ["pack_chunks_manifest", "q6_forecast_revenue", "q3_shipping_priority"]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="floor-decomposition")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler", jvm.org.apache.logging.log4j.Level.FATAL
    )
    reg = entrymod.queries()

    mins: dict[str, dict[str, float]] = {}
    for sf in (SF_SMALL, SF_BIG):
        for n in HEADLINE:  # warmup (codegen, broadcast pools, file listing)
            force(reg[n](spark, sf))
        for _ in range(N_PASSES):
            for n in HEADLINE:
                t0 = time.perf_counter()
                force(reg[n](spark, sf))
                dt = time.perf_counter() - t0
                cur = mins.setdefault(n, {})
                cur[sf] = min(cur.get(sf, float("inf")), dt)

    queries = {}
    for n in HEADLINE:
        small, big = mins[n][SF_SMALL], mins[n][SF_BIG]
        floor = min(small, big)
        queries[n] = {
            "sf0001": round(small, 3),
            "sf01": round(big, 3),
            "floor": round(floor, 3),
            "excess": round(max(big - small, 0.0), 3),
        }

    # jobs-vs-wall gap on the probe subset (fresh forced run each)
    store = spark.sparkContext._jsc.sc().statusStore()
    gap_probe = {}
    for n in GAP_PROBE:
        df = reg[n](spark, SF_BIG)
        force(df)  # warm this exact plan
        seen = {store.jobsList(None).apply(i).jobId() for i in range(min(store.jobsList(None).size(), 50))}
        t0 = time.perf_counter()
        force(df)
        wall = time.perf_counter() - t0
        jobs = store.jobsList(None)
        job_ms = 0
        for i in range(min(jobs.size(), 50)):
            j = jobs.apply(i)
            if j.jobId() in seen or not j.completionTime().isDefined():
                continue
            job_ms += j.completionTime().get().getTime() - j.submissionTime().get().getTime()
        gap_probe[n] = {
            "wall_sec": round(wall, 3),
            "jobs_sec": round(job_ms / 1000.0, 3),
            "inter_job_gap_sec": round(max(wall - job_ms / 1000.0, 0.0), 3),
        }

    floor_total = round(sum(q["floor"] for q in queries.values()), 3)
    excess_total = round(sum(q["excess"] for q in queries.values()), 3)
    print(json.dumps({
        "metric": "headline_floor_decomposition",
        "floor_total_sec": floor_total,
        "compute_excess_sf01_sec": excess_total,
        "sf_big": SF_BIG,
        "passes": N_PASSES,
        "queries": queries,
        "gap_probe": gap_probe,
    }))


if __name__ == "__main__":
    main()
