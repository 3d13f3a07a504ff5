#!/usr/bin/env python
"""Spot-check a subset of registry queries against their DuckDB oracles,
with the driver_emulation canonical-dtype check, at one or more SF dirs.

Usage: python tools/subset_check.py q1 q2 ... [--sf /root/testdata/sf0.01 ...]
(defaults to both sf0.01 and sf0.1)
"""

import sys
import time
import traceback
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import importlib

from pyspark.sql import SparkSession

CANON_DUCK = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "DOUBLE": "f64",
    "FLOAT": "f32", "VARCHAR": "str", "DATE": "date", "BOOLEAN": "bool",
}
CANON_SPARK = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "double": "f64",
    "float": "f32", "string": "str", "date": "date", "boolean": "bool",
}


def main() -> int:
    args = sys.argv[1:]
    sfs = []
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            names.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("subset-check")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    entrymod = importlib.import_module("__spark_entry__")
    from tests.oracle_harness import compare, duckdb_connect

    q, o = entrymod.queries(), entrymod.oracle_sql()
    unknown = [n for n in names if n not in q]
    if unknown:
        print("unknown queries:", unknown)
        return 2
    nbad = 0
    for sf in sfs:
        con = duckdb_connect(sf)
        print(f"== {sf} ==")
        for name in names:
            t0 = time.time()
            try:
                if name in o:
                    ok, msg = compare(spark, q[name], o[name], sf)
                    res = "MATCH" if ok else f"MISMATCH: {msg[:200]}"
                    if ok:
                        stypes = {
                            c: CANON_SPARK.get(t, t) for c, t in q[name](spark, sf).dtypes
                        }
                        rel = con.sql(o[name])
                        dtypes = {
                            c: CANON_DUCK.get(str(t).upper(), str(t))
                            for c, t in zip(rel.columns, rel.types)
                        }
                        bad = {
                            c: (stypes.get(c), dtypes[c])
                            for c in dtypes
                            if stypes.get(c) != dtypes[c]
                        }
                        if bad:
                            res = f"DTYPE-MISMATCH: {bad}"
                else:
                    res = f"rows_only({q[name](spark, sf).count()})"
            except Exception:
                res = "ERR " + traceback.format_exc().splitlines()[-1][:200]
            if res != "MATCH" and not res.startswith("rows_only"):
                nbad += 1
            print(f"  {name}: {res} ({time.time() - t0:.1f}s)", flush=True)
    print("BAD:", nbad)
    return 1 if nbad else 0


if __name__ == "__main__":
    raise SystemExit(main())
