#!/usr/bin/env python
"""Instrumented full-registry run of the MANUAL --longtext axis with a
per-query time budget — the r11 migration de-risking inventory.

tiny_sweep's plain loop cannot survive an O(len²) staller (one stuck
query blocks the rest of the registry), which is why the axis is manual.
This runner gives every query a budget; on expiry it cancels the Spark
jobs (sc.cancelAllJobs) AND interrupts the live DuckDB connection
(con.interrupt — safe cross-thread per DuckDB's API), records the query
as TIMEOUT, and moves on. Output is the full inventory the r11
rebind-don't-edit migration plan (PLANS.md) needs: which queries
complete in bounded time on ~218k-char documents, which stall, and the
per-query wall-clock of the survivors.

Divergences are reported informationally, NOT gated: several pinned
EXPECTED_DIVERGENCES classes (tests/test_scale_plans.py) apply to any
adversarial mirror, and the longtext projection itself changes document
semantics (ordinal-tagged repetition) in ways some oracles legitimately
see differently; adjudication happens when the axis is promoted to a
pytest gate.

A STUCK query (neither sc.cancelAllJobs nor con.interrupt released the
worker thread within 30 s) cannot be reclaimed in-process — Python
threads aren't killable, and the first probe run proved the cost: the
stuck dedup_incremental_minhash worker kept allocating concurrently
with later queries until the OOM killer took the whole run at 127 GB
RSS. So the probe persists per-query outcomes to a state file as it
goes, and on STUCK it records the outcome and hard-exits with code 3;
relaunching resumes past everything already recorded. Loop until exit 0:

  until python tools/longtext_probe.py 50 90; do [ $? -ne 3 ] && break; done

Usage: python tools/longtext_probe.py [n_rows] [budget_sec]
State:  /tmp/longtext_probe_state.jsonl (delete to start fresh)
Prints one line per query and a JSON summary on completion; exit 0 =
full inventory done, 3 = relaunch to resume (this is an inventory, not
a gate — divergences are reported, not failed).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 90.0
    out_dir = f"/tmp/spark_graft_tiny{n_rows}_longtext"

    import tiny_sweep

    if not os.path.exists(os.path.join(out_dir, "_BUILT")):
        tiny_sweep.build(n_rows, out_dir, mode="longtext")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("longtext-probe")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import importlib

    entrymod = importlib.import_module("__spark_entry__")
    import tests.oracle_harness as oh

    # register the live DuckDB connection so the watchdog can interrupt it
    live: dict = {}
    orig_connect = oh.duckdb_connect

    def tracked_connect(sf_dir):
        con = orig_connect(sf_dir)
        # bound the in-process oracle: the first probe run died when a
        # runaway side allocated 127 GB before the OOM killer fired
        con.execute("SET memory_limit='24GB'")
        live["con"] = con
        return con

    oh.duckdb_connect = tracked_connect

    state_path = "/tmp/longtext_probe_state.jsonl"
    results: dict[str, dict] = {}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            for line in fh:
                rec = json.loads(line)
                results[rec.pop("name")] = rec

    q, o = entrymod.queries(), entrymod.oracle_sql()
    for i, name in enumerate(q):
        if name in results:
            continue
        outcome: dict = {}

        def work():
            t0 = time.time()
            try:
                if name not in o:
                    q[name](spark, out_dir).collect()
                    outcome.update(status="ROWS_ONLY_OK")
                else:
                    ok, msg = oh.compare(spark, q[name], o[name], out_dir)
                    outcome.update(status="MATCH" if ok else "DIVERGE", msg=msg[:140])
            except Exception as ex:  # noqa: BLE001
                outcome.update(status="ERROR", msg=repr(ex)[:140])
            outcome["sec"] = round(time.time() - t0, 1)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(budget)
        if t.is_alive():
            spark.sparkContext.cancelAllJobs()
            con = live.get("con")
            if con is not None:
                try:
                    con.interrupt()
                except Exception:  # noqa: BLE001
                    pass
            t.join(30)
            if t.is_alive():
                # irrecoverably stuck thread (neither engine responded to
                # cancellation): record, then hard-exit so the OS reclaims
                # the runaway worker — resuming skips this query
                outcome["status"] = "STUCK"
                outcome["sec"] = round(budget, 1)
                with open(state_path, "a") as fh:
                    fh.write(json.dumps({"name": name, **outcome}) + "\n")
                print(f"{i + 1}/{len(q)} {name}: STUCK — exiting for resume",
                      flush=True)
                os._exit(3)
            else:
                outcome["status"] = "TIMEOUT"
        results[name] = outcome
        with open(state_path, "a") as fh:
            fh.write(json.dumps({"name": name, **outcome}) + "\n")
        print(f"{i + 1}/{len(q)} {name}: {outcome.get('status')} "
              f"({outcome.get('sec', budget)}s) {outcome.get('msg', '')}",
              flush=True)

    counts: dict[str, int] = {}
    for r in results.values():
        counts[r.get("status") or "?"] = counts.get(r.get("status") or "?", 0) + 1
    slow = sorted(
        ((n, r["sec"]) for n, r in results.items() if r.get("sec", 0) > 20
         and r.get("status") in ("MATCH", "ROWS_ONLY_OK")),
        key=lambda x: -x[1],
    )[:15]
    stalled = [n for n, r in results.items() if r.get("status") in ("TIMEOUT", "STUCK")]
    print(json.dumps({
        "n_rows": n_rows, "budget_sec": budget, "counts": counts,
        "stalled": stalled, "slowest_ok": slow,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
