"""CLI entry point — run any registered query from the command line.

The reference ships runnable pipeline mains (src/transform_pipeline.py,
src/extraction.py); this is the equivalent operational surface for the
Spark engine:

    python -m etl_dashboard_project_1_spark list
    python -m etl_dashboard_project_1_spark run q1_pricing_summary
    python -m etl_dashboard_project_1_spark run dedup_minhash_lsh \
        --sf-dir /root/testdata/sf0.01 --output /tmp/pairs --format parquet
    python -m etl_dashboard_project_1_spark explain q3_shipping_priority
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time


def _load_registry():
    """Import the repo-root driver contract (the single query registry)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, root)
    spec.loader.exec_module(mod)
    return mod


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_dashboard_project_1_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run a query and show/save its result")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    run.add_argument("--output", help="write result here instead of showing it")
    run.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    run.add_argument("--limit", type=int, default=20, help="rows to show (no --output)")

    ex = sub.add_parser("explain", help="print a query's executed plan")
    ex.add_argument("query")
    ex.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    ver = sub.add_parser(
        "verify", help="run a query AND its DuckDB oracle, compare results"
    )
    ver.add_argument("query")
    ver.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

    args = p.parse_args(argv)
    entry = _load_registry()
    registry = entry.queries()

    if args.cmd == "list":
        oracles = entry.oracle_sql()
        for name in registry:
            print(f"{name}  [{'oracle' if name in oracles else 'rows-only'}]")
        return 0

    if args.query not in registry:
        p.error(f"unknown query {args.query!r} (see `list`)")

    from etl_dashboard_project_1_spark.session import get_spark

    spark = get_spark(app_name=f"cli:{args.query}")
    t0 = time.time()

    if args.cmd == "verify":
        oracles = entry.oracle_sql()
        if args.query not in oracles:
            print(f"{args.query}: no SQL oracle (rows-only query); running it instead")
            n = registry[args.query](spark, args.sf_dir).count()
            print(f"OK rows={n} ({time.time() - t0:.2f}s)")
            return 0
        from tests.oracle_harness import compare  # repo-root harness

        ok, msg = compare(spark, registry[args.query], oracles[args.query], args.sf_dir)
        print(f"{args.query}: {'MATCH' if ok else 'MISMATCH'} — {msg} "
              f"({time.time() - t0:.2f}s)")
        return 0 if ok else 1

    df = registry[args.query](spark, args.sf_dir)

    if args.cmd == "explain":
        print(df._jdf.queryExecution().executedPlan().toString())
        return 0

    if args.output:
        writer = df.write.mode("overwrite")
        if args.format == "csv":
            writer = writer.option("header", "true")
        getattr(writer, args.format)(args.output)
        print(f"wrote {args.output} ({args.format}) in {time.time() - t0:.2f}s")
    else:
        df.show(args.limit, truncate=False)
        print(f"({time.time() - t0:.2f}s, showing up to {args.limit} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
