"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, then
compares row count, column names, and an order-insensitive value multiset
(columns sorted by name, rows sorted by their string form) — the same gate
shape the driver applies at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb

from etl_dashboard_project_1_spark.session import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "<null>"
    # Faithful to the driver's pandas canonicalizer: sort_values over a
    # frame with list/dict cells raises `unhashable type` (r4 failure) —
    # reject here instead of silently stringifying.
    if isinstance(v, (list, tuple, dict, set)):
        raise TypeError(
            f"complex cell {type(v).__name__} — the driver canon cannot "
            "hash array/map/struct outputs; emit concat_ws/array_to_string "
            "scalars or explode to rows"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canonical(rows: list[dict], cols: list[str]) -> list[tuple]:
    cols_sorted = sorted(cols)
    out = [tuple(_norm_cell(r[c]) for c in cols_sorted) for r in rows]
    return sorted(out)


#: Spark type classes the driver's pandas canonicalizer cannot hash.
def _complex_fields(schema) -> list[str]:
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare(spark, fn, sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    bad_cols = _complex_fields(sdf.schema)
    if bad_cols:
        return False, (
            f"complex output columns {bad_cols} — driver canon rejects "
            "array/map/struct (r4 failure class)"
        )
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    con = duckdb_connect(sf_dir)
    rel = con.execute(sql)
    o_cols = [d[0] for d in rel.description]
    o_rows = [dict(zip(o_cols, row)) for row in rel.fetchall()]
    con.close()

    if sorted(spark_cols) != sorted(o_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(o_cols)}"
    if len(spark_rows) != len(o_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} oracle={len(o_rows)}"
    a = _canonical(spark_rows, spark_cols)
    b = _canonical(o_rows, o_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
