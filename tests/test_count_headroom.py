"""Round-10 count-headroom audit gates (the r9 verdict item 5: the
--bigmoney axis proved money magnitudes; the SAME argument applies to
COUNT-like quantities — n², n·Σx cross-terms — as row counts grow, but
no physical-row sweep axis can reach the magnitudes, so the audit's
fixes are pinned here directly).

Two live int64-wrap fixes (both found by the audit, both mirrored into
the DuckDB oracle):

* winsorize_event_values — the cnt·cents cell product and its sum rode
  plain int64; total winsorized money past ~9.2e18 cents wrapped in
  Spark while the DuckDB HUGEINT sum survived and the BIGINT cast
  raised (the crash-vs-silent-wrong asymmetry). Reachable physically:
  100 whale rows suffice.
* skew_key_profile — cnt·n_keys·100 rode plain int64; a 1e8-row hot key
  in a 1e9-key corpus exceeds it. NOT reachable physically in a test,
  so the expression itself (module-level X_MEAN_X100_EXPR) is evaluated
  at magnitude on a literal frame against exact Python integers.
"""

import duckdb

from etl_dashboard_project_1_spark.plans.incremental_queries import (
    winsorize_event_values,
)
from etl_dashboard_project_1_spark.plans.profile_queries import X_MEAN_X100_EXPR


def _write_events(out, rows):
    con = duckdb.connect()
    vals = ", ".join(
        f"({i + 1}::BIGINT, TIMESTAMP '2024-01-01', {1000 + i}::BIGINT,"
        f" '{etype}', {value}::DOUBLE, NULL::VARCHAR)"
        for i, (etype, value) in enumerate(rows)
    )
    con.execute(
        f"""COPY (SELECT * FROM (VALUES {vals})
          t(event_id, ts, user_id, event_type, value, props))
        TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )


def test_winsorize_sum_int64_bound_is_null_not_wrapped(spark, tmp_path):
    """100 identical whale rows (value 1e15 → cents 1e17, all clipped to
    themselves): the winsorized sum is 1e19 > int64. The old int64 form
    silently wrapped in Spark; both engines must now emit NULL, and a
    sane sibling event_type must keep its exact value."""
    from tests.oracle_harness import compare

    import __spark_entry__ as entrymod

    out = str(tmp_path)
    rows = [("whale", 1.0e15)] * 100 + [("sane", 2.5)] * 100
    _write_events(out, rows)
    got = {r["event_type"]: r.asDict() for r in winsorize_event_values(spark, out).collect()}
    assert got["whale"]["n_events"] == 100
    assert got["whale"]["sum_winsorized_cents"] is None      # NULL, not wrapped
    assert got["sane"]["sum_winsorized_cents"] == 100 * 250  # exact
    q, o = entrymod.queries(), entrymod.oracle_sql()
    ok, msg = compare(
        spark, q["winsorize_event_values"], o["winsorize_event_values"], out
    )
    assert ok, msg


def test_skew_x_mean_expression_exact_at_count_magnitudes(spark):
    """Evaluate the REAL x_mean_x100 expression (the module constant the
    query selects) on a literal frame at count magnitudes no fixture can
    reach: cnt=1e9 hot key, n_keys=1e8, total=2e9 → the product is 1e19
    (past int64; the old BIGINT form wrapped) and the quotient must be
    the exact Python integer 5e9. Mirrored against the oracle's HUGEINT
    form in DuckDB on the same literals."""
    cnt, n_keys, total = 10**9, 10**8, 2 * 10**9
    want = (cnt * n_keys * 100) // total
    assert cnt * n_keys * 100 > 2**63 - 1  # the scenario really overflows int64
    row = (
        spark.createDataFrame([(cnt, n_keys, total)], ["cnt", "n_keys", "total"])
        .selectExpr(f"{X_MEAN_X100_EXPR} AS x")
        .collect()[0]
    )
    assert row["x"] == want
    duck = duckdb.connect().execute(
        f"SELECT CAST((CAST(cnt AS HUGEINT) * n_keys * 100) // total AS BIGINT)"
        f" FROM (VALUES ({cnt}, {n_keys}, {total})) t(cnt, n_keys, total)"
    ).fetchone()[0]
    assert duck == want
