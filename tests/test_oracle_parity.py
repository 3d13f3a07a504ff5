"""Every queries() entry with an oracle must hash-match DuckDB locally —
the same comparison the driver runs at sf0.01 (here at sf0.001 for speed;
set SPARK_GRAFT_TEST_SF to widen)."""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_harness import compare


def _pairs():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return [(name, q[name], o[name]) for name in q if name in o]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, sf_dir, name, fn, sql):
    ok, msg = compare(spark, fn, sql, sf_dir)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still run and return a stable schema."""
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for name, fn in q.items():
        if name not in o:
            df = fn(spark, sf_dir)
            assert df.columns, name
            assert df.count() >= 0, name
