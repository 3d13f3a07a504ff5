"""Unit tests for the fuzzy entity-resolution join (J1/J2) including
conformance against the reference's committed importer fixtures
(/root/reference/data/processed/bd-importadores.csv — read-only golden
data, used here as a test corpus per SURVEY.md §5)."""

import os
import sys
from difflib import SequenceMatcher

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_dashboard_project_1_spark.functions.similarity import difflib_ratio_udf
from etl_dashboard_project_1_spark.operators.fuzzy import (
    apply_fuzzy_mapping,
    fuzzy_match_names,
    not_found,
)

REF_IMPORTERS = "/root/reference/data/processed/bd-importadores.csv"


def test_difflib_udf_matches_stdlib(spark):
    pairs = [
        ("COMERCIALIZADORADITECAUTOMOVILESSA", "DITECAUTOMOVILES"),
        ("ASTARACHILESPA", "ASTARACHILE"),
        ("ZZZMOTORS", "KAUFMANN"),
        ("", ""),
        (None, "X"),
    ]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["score"]
        for r in df.withColumn("score", difflib_ratio_udf("a", "b")).collect()
    }
    for a, b in pairs:
        if a is None or b is None:
            assert got[(a, b)] is None
        else:
            expected = SequenceMatcher(None, a, b, autojunk=False).ratio()
            assert abs(got[(a, b)] - expected) < 1e-12, (a, b)


def test_fuzzy_match_and_not_found(spark):
    catalog = spark.createDataFrame(
        [("Astara Chile SPA", "96.861.240-9"), ("Kaufmann SA", "92.475.000-6")],
        ["name", "rut"],
    )
    raw = spark.createDataFrame(
        [("ASTARA  CHILE S.P.A.",), ("kaufmann s.a.",), ("Totally Unrelated Zebra Corp",)],
        ["raw_name"],
    )
    res = fuzzy_match_names(raw, "raw_name", catalog, "name", threshold=0.6,
                            score_fn=difflib_ratio_udf)
    rows = {r["raw_name"]: r for r in res.collect()}
    assert rows["ASTARA  CHILE S.P.A."]["matched_name"] == "Astara Chile SPA"
    assert rows["ASTARA  CHILE S.P.A."]["rut"] == "96.861.240-9"
    assert rows["kaufmann s.a."]["matched_name"] == "Kaufmann SA"
    assert rows["Totally Unrelated Zebra Corp"]["matched_name"] is None
    assert rows["Totally Unrelated Zebra Corp"]["rut"] is None
    nf = not_found(res, "name").collect()
    assert [r["raw_name"] for r in nf] == ["Totally Unrelated Zebra Corp"]


def test_apply_mapping_coalesces_unresolved(spark):
    df = spark.createDataFrame([("a corp", 1), ("mystery", 2)], ["raw_name", "k"])
    mapping = spark.createDataFrame([("a corp", "A CORP STD")], ["raw_name", "std"])
    out = apply_fuzzy_mapping(df, "raw_name", mapping, "std")
    got = {r["k"]: r["std"] for r in out.collect()}
    assert got == {1: "A CORP STD", 2: "mystery"}


@pytest.mark.skipif(not os.path.exists(REF_IMPORTERS), reason="reference fixtures absent")
def test_reference_importer_catalog_conformance(spark):
    """Dirty variants of the reference's real importer names must resolve to
    their catalog rows with the reference's threshold (0.6) and scorer."""
    catalog = spark.read.csv(REF_IMPORTERS, header=True)
    assert catalog.count() >= 25
    dirty = spark.createDataFrame(
        [
            ("Comercializadora Ditec Automóviles SA",),
            ("ASTARA CHILE.",),
            ("kaufmann",),
            ("ZZZ Motors",),
        ],
        ["raw_name"],
    )
    res = fuzzy_match_names(
        dirty, "raw_name", catalog.select("NOMBRE_EMP", "RUT", "COD_IMP"),
        "NOMBRE_EMP", threshold=0.6, score_fn=difflib_ratio_udf,
    )
    rows = {r["raw_name"]: r for r in res.collect()}
    assert rows["Comercializadora Ditec Automóviles SA"]["matched_NOMBRE_EMP"] is not None
    assert "DITEC" in rows["Comercializadora Ditec Automóviles SA"]["matched_NOMBRE_EMP"].upper()
    assert rows["Comercializadora Ditec Automóviles SA"]["RUT"] is not None
    assert rows["ASTARA CHILE."]["matched_NOMBRE_EMP"].upper().startswith("ASTARA")
    assert rows["ZZZ Motors"]["matched_NOMBRE_EMP"] is None


def test_blocking_variant_matches_unblocked(spark):
    """With a first-letter blocking key the result must not change when the
    true match shares the block (the scale path's contract)."""
    catalog = spark.createDataFrame(
        [("Astara Chile SPA",), ("Kaufmann SA",), ("Arcadia Motors",)], ["name"]
    )
    raw = spark.createDataFrame([("astara chile spa",), ("kaufman sa",)], ["raw_name"])
    block = lambda c: F.upper(F.substring(F.trim(c), 1, 1))  # noqa: E731
    a = fuzzy_match_names(raw, "raw_name", catalog, "name", 0.6).collect()
    b = fuzzy_match_names(raw, "raw_name", catalog, "name", 0.6, blocking_fn=block).collect()
    ga = {r["raw_name"]: r["matched_name"] for r in a}
    gb = {r["raw_name"]: r["matched_name"] for r in b}
    assert ga == gb


def test_pinned_nation_names_match_testdata(spark):
    """The j1_fuzzy_difflib oracle is a literal table precomputed from
    PINNED_NATION_NAMES; if the testdata generator ever changes the nation
    dimension, this trips before the driver does."""
    from etl_dashboard_project_1_spark.plans.fuzzy_queries import PINNED_NATION_NAMES
    from etl_dashboard_project_1_spark.session import load_table

    actual = sorted(
        r["n_name"] for r in load_table(spark, "/root/testdata/sf0.001", "nation").select("n_name").collect()
    )
    assert actual == sorted(PINNED_NATION_NAMES)
