"""Rotation-window contract: the external driver evaluates exactly the
FIRST 50 registry entries per round, so the ordering IS the round's
check plan. Pin it so a refactor cannot silently shuffle the window
before the driver runs.

Round-8 extension (r7 verdict item 6): the contract now also enforces
the staleness SLO (no entry's latest driver row older than 6 rounds,
given the planned window) and the re-certification rule (any entry whose
implementation fingerprint drifted from the sealed snapshot must sit in
the front or the next-round queue)."""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Resolve the current front/queue by round number so this file never pins a
# round-specific attribute name again.
_front_attrs = sorted(
    (int(m.group(1)), a)
    for a in dir(entrymod)
    for m in [re.fullmatch(r"_ROUND(\d+)_FRONT", a)]
    if m
)
_queue_attrs = sorted(
    (int(m.group(1)), a)
    for a in dir(entrymod)
    for m in [re.fullmatch(r"_ROUND(\d+)_QUEUE", a)]
    if m
)
FRONT = getattr(entrymod, _front_attrs[-1][1])
QUEUE = getattr(entrymod, _queue_attrs[-1][1])
CURRENT_ROUND = _front_attrs[-1][0]  # the round whose window is sealed here


def _latest_driver_round() -> dict:
    latest = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"_r0*(\d+)\.json$", f).group(1))
        with open(f) as fh:
            for k in json.load(fh):
                latest[k] = max(latest.get(k, 0), r)
    return latest


def test_window_is_exactly_the_planned_front():
    names = list(entrymod.queries())
    assert names[:50] == FRONT
    assert len(FRONT) == 50
    assert entrymod._FRONT == FRONT + QUEUE


def test_queue_round_follows_front_round():
    assert _queue_attrs[-1][0] == CURRENT_ROUND + 1


def test_front_and_queue_are_wellformed():
    reg = entrymod.queries()
    assert len(set(FRONT)) == len(FRONT), "duplicate in window"
    assert len(set(QUEUE)) == len(QUEUE), "duplicate in queue"
    assert not set(FRONT) & set(QUEUE), "entry in both window and queue"
    missing = [n for n in FRONT + QUEUE if n not in reg]
    assert not missing, f"planned entries absent from registry: {missing}"


def test_every_window_entry_has_an_oracle():
    o = entrymod.oracle_sql()
    missing = [n for n in FRONT if n not in o]
    assert not missing, f"window entries without oracle (weaker check): {missing}"


def test_staleness_slo():
    """Given the planned window, no registered entry's latest driver row
    may end up older than 6 rounds: entries outside the front must have a
    row from round >= CURRENT_ROUND - 6, unless they are already
    scheduled in the next-round queue (post-seal registrations and
    bumped stale entries live there by design). sim_ann_ivf is the one
    by-design no-oracle exception, externally gated via
    ann_ivf_recall_gate."""
    latest = _latest_driver_round()
    floor = CURRENT_ROUND - 6
    scheduled = set(FRONT) | set(QUEUE)
    violations = {
        n: latest.get(n)
        for n in entrymod.queries()
        if n not in scheduled
        and n != "sim_ann_ivf"
        and latest.get(n, 0) < floor
    }
    assert not violations, (
        f"entries with driver rows older than round {floor} left "
        f"unscheduled: {violations}"
    )


def test_changed_implementations_are_in_the_window():
    """Re-certification tripwire: any entry whose implementation
    fingerprint drifted from the sealed FINGERPRINTS.json snapshot must be
    scheduled (front or next queue); new entries (absent from the
    snapshot) likewise. See tools/impl_fingerprint.py for scope/limits."""
    from tools.impl_fingerprint import current_fingerprints, load_snapshot

    snap = load_snapshot()
    assert snap, "FINGERPRINTS.json missing — run tools/impl_fingerprint.py --write at seal"
    cur = current_fingerprints()
    scheduled = set(FRONT) | set(QUEUE)
    drifted = [
        n for n, fp in cur.items()
        if (n not in snap or snap[n] != fp) and n not in scheduled
    ]
    assert not drifted, (
        f"implementation changed since snapshot but not scheduled for "
        f"re-certification: {drifted}"
    )


def test_fingerprint_covers_transitive_helpers(monkeypatch):
    """r8 verdict item 5 (helper-blindness closed): an edit inside
    operators/textops.py must flip the fingerprint of queries whose plan
    module imports it transitively (e.g. text_quality), while leaving
    modules that never reach it (plans/mart_queries.py has no textops in
    its transitive closure) untouched. Simulated by faking the file hash
    of textops.py. Note file granularity is deliberately wide: even
    plans/analytics.py reaches textops (via round6 -> extension_queries),
    so the flagship q1 is NOT a valid negative control here."""
    import tools.impl_fingerprint as fp

    base = fp.current_fingerprints()
    textops_path = fp._repo_modules()[
        "etl_dashboard_project_1_spark.operators.textops"
    ]
    real = fp._file_sha.__wrapped__

    def fake_sha(path):
        if path == textops_path:
            return "0" * 64
        return real(path)

    monkeypatch.setattr(fp, "_file_sha", fake_sha)
    cur = fp.current_fingerprints()
    assert cur["text_quality"] != base["text_quality"]
    assert cur["q8_market_share"] == base["q8_market_share"]


def test_fingerprint_resolves_package_init_relative_imports(monkeypatch, tmp_path):
    """r9 ADVICE (impl_fingerprint.py): `from . import x` inside a
    package __init__.py must resolve against the package ITSELF, not its
    parent — otherwise re-exports through __init__ files are silently
    dropped from the transitive fingerprint (harmless only while every
    __init__.py stays empty)."""
    import tools.impl_fingerprint as fp

    pkg = tmp_path / "pkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text(
        "from . import helper\nfrom .sibling import thing\n"
    )
    (pkg / "helper.py").write_text("x = 1\n")
    (pkg / "sibling.py").write_text("thing = 2\n")
    fake = {
        "pkg": str(pkg / "__init__.py"),
        "pkg.helper": str(pkg / "helper.py"),
        "pkg.sibling": str(pkg / "sibling.py"),
    }
    monkeypatch.setattr(fp, "_repo_modules", lambda: fake)
    fp._direct_imports.cache_clear()
    fp._transitive_imports.cache_clear()
    try:
        deps = fp._direct_imports("pkg")
        assert "pkg.helper" in deps, deps
        assert "pkg.sibling" in deps, deps
    finally:
        fp._direct_imports.cache_clear()
        fp._transitive_imports.cache_clear()


def test_window_planner_produces_a_valid_next_round_plan():
    """The round-10+ windows are planned mechanically
    (tools/window_planner.py — the r7/r8 'staged but not promoted'
    process risk, closed by construction): the emitted plan must satisfy
    every invariant the contract enforces for a sealed window, and the
    staleness SLO must be satisfiable for the next round from today's
    state."""
    from tools.window_planner import EXCLUDED, WINDOW, plan

    p = plan(entrymod)
    front = p["front"]
    assert len(front) == min(WINDOW, len(entrymod.queries()))
    assert len(set(front)) == len(front)
    assert front[: len(p["queue"])] == p["queue"], "queue must head the plan"
    assert not set(front) & EXCLUDED
    assert not p["overflow"], "queue+re-certs exceed the window"
    assert not p["slo_unmet"], f"SLO unsatisfiable next round: {p['slo_unmet']}"
    # backfill is oldest-first: latest driver rounds along the backfill
    # section must be non-decreasing (recomputed here independently of
    # the planner's own sort key, with the same current-front
    # adjustment: entries in the sealed front are about to land
    # current-round rows)
    import re

    from tools.window_planner import latest_driver_round

    latest = latest_driver_round()
    cur_front_attr = sorted(
        (int(m.group(1)), a)
        for a in dir(entrymod)
        for m in [re.fullmatch(r"_ROUND(\d+)_FRONT", a)]
        if m
    )[-1][1]
    for n in getattr(entrymod, cur_front_attr):
        latest[n] = max(latest.get(n, 0), p["current_round"])
    head_len = len(p["queue"]) + len(p["drifted_unscheduled"])
    backfill_rounds = [latest.get(n, 0) for n in front[head_len:]]
    assert backfill_rounds == sorted(backfill_rounds), (
        f"backfill not oldest-first: {backfill_rounds}"
    )


def test_no_complex_output_columns_anywhere(spark):
    """Registry-wide driver-shape guard (r4 lesson): the external gate's
    pandas canonicalizer sorts the result frame by every column, and list
    /dict cells raise `unhashable type: 'list'` (CORRECTNESS_r04:
    text_feature_hashing, inverted_index_build). NO registered query may
    emit an ArrayType/MapType/StructType column — vectors/postings go out
    as concat_ws scalars or exploded rows."""
    from tests.oracle_harness import _complex_fields

    sf = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in entrymod.queries().items():
        fields = _complex_fields(fn(spark, sf).schema)
        if fields:
            bad[name] = fields
    assert not bad, f"complex output columns (driver canon cannot hash): {bad}"


def test_queries_and_oracles_align():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_complex_output_guard_rejects_deliberate_array(spark):
    """The guard must FAIL on an array-typed output, not just pass on a
    clean registry: both the schema probe and the harness compare() are
    exercised against a deliberately bad query."""
    from pyspark.sql import functions as F

    from tests.oracle_harness import _complex_fields, compare

    def bad_query(spark_, sf_dir_):
        return spark_.range(3).select(F.array(F.col("id")).alias("arr"))

    assert _complex_fields(bad_query(spark, None).schema) == ["arr"]
    ok, msg = compare(spark, bad_query, "SELECT 1", "/root/testdata/sf0.001")
    assert not ok and "complex output columns" in msg
