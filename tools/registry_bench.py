#!/usr/bin/env python
"""Engine-side wall-clock of EVERY registry query (noop sink, get_spark
session) — the r10 optimization round's whole-registry measurement. One
warm pass then N timed passes; prints per-query best and the slowest 30.

Usage: python tools/registry_bench.py [sf_dir] [n_passes]
Writes JSON to plans/r10/registry_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from etl_dashboard_project_1_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="registry-bench")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler", jvm.org.apache.logging.log4j.Level.FATAL
    )
    reg = entrymod.queries()
    best: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, fn in reg.items():  # warm pass
        try:
            force(fn(spark, sf))
        except Exception:
            errs[name] = traceback.format_exc(limit=1)
    for _ in range(n_passes):
        for name, fn in reg.items():
            if name in errs:
                continue
            t0 = time.perf_counter()
            try:
                force(fn(spark, sf))
            except Exception:
                errs[name] = traceback.format_exc(limit=1)
                continue
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
    out = {
        "sf_dir": sf,
        "passes": n_passes,
        "total_best_sum": round(sum(best.values()), 3),
        "queries": {k: round(v, 3) for k, v in sorted(best.items())},
        "errors": errs,
    }
    path = os.path.join(ROOT, "plans", "r10", "registry_bench.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"total(best-sum) {out['total_best_sum']}s over {len(best)} queries; errors: {len(errs)}")
    for name, v in sorted(best.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v:8.3f}  {name}")


if __name__ == "__main__":
    main()
