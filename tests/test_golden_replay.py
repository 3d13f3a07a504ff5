"""Golden end-to-end replay (SURVEY.md §5 strategy 2/3).

The reference's committed intermediate (/root/reference/tmp/datos_tmp.csv,
7,569 rows × ~103 canonical columns) contains both the raw measure columns
AND every derived column its pandas pipeline produced. We strip the derived
columns, push the raw slice through OUR vehicle pipeline (with the real
importer catalog), and require the derivations to reproduce the reference's
values row by row:

- AÑO, CATEGORIA_PROPULSION, TIPO_LDV (exact)
- REND_EQUIV_KML, EMIS_CO2_EQUIV (|Δ| ≤ 0.01 — reference rounds to 2)
- the 11 gas-family means (|Δ| ≤ 1e-6)
- RUT / IMP_COD from the fuzzy importer join (exact where golden has them)
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_dashboard_project_1_spark.plans import vehicle_pipeline as vp

GOLDEN_TMP = "/root/reference/tmp/datos_tmp.csv"
IMPORTERS = "/root/reference/data/processed/bd-importadores.csv"

DERIVED = [
    "AÑO", "CATEGORIA_PROPULSION", "TIPO_LDV", "REND_EQUIV_KML", "EMIS_CO2_EQUIV",
    "N2O_GKM", "MP_GKM", "NP", "HCHO_MGKM", "HC_GKM", "HC_NOX_GKM", "HCNM_GKM",
    "NMOG_NOX_GKM", "NOX_GKM", "NMOG_GKM", "CO_GKM", "RUT", "IMP_COD",
]

GAS_FAMILIES = ["N2O_GKM", "MP_GKM", "NP", "HCHO_MGKM", "HC_GKM", "HC_NOX_GKM",
                "HCNM_GKM", "NMOG_NOX_GKM", "NOX_GKM", "NMOG_GKM", "CO_GKM"]

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN_TMP) and os.path.exists(IMPORTERS)),
    reason="reference golden artifacts absent",
)


@pytest.fixture(scope="module")
def replay(spark):
    golden = pd.read_csv(GOLDEN_TMP, dtype=str, keep_default_na=False)
    raw = golden.drop(columns=[c for c in DERIVED if c in golden.columns])
    raw = raw.rename(columns={"Unnamed: 0": "_row_id"})
    raw["_row_id"] = raw["_row_id"].astype(int)
    raw = raw.replace({"": None})
    sdf = spark.createDataFrame(raw)
    catalog = spark.read.csv(IMPORTERS, header=True)
    out = vp.vehicle_pipeline(sdf, importer_catalog=catalog)
    mine = out.toPandas().sort_values("_row_id").reset_index(drop=True)
    golden = golden.rename(columns={"Unnamed: 0": "_row_id"})
    golden["_row_id"] = golden["_row_id"].astype(int)
    golden = golden.sort_values("_row_id").reset_index(drop=True)
    assert len(mine) == len(golden) == 7569
    return mine, golden


def test_year_and_categories_exact(replay):
    mine, golden = replay
    assert (mine["AÑO"].astype("Int64") == golden["AÑO"].astype("Int64")).all()
    got = mine["CATEGORIA_PROPULSION"].fillna("")
    want = golden["CATEGORIA_PROPULSION"]
    assert (got == want).all(), (got != want).sum()
    got = mine["TIPO_LDV"].fillna("")
    want = golden["TIPO_LDV"]
    assert (got == want).all(), (got != want).sum()


def _num(s):
    return pd.to_numeric(s, errors="coerce")


def test_equivalent_efficiency_and_co2(replay):
    mine, golden = replay
    for col, tol in (("REND_EQUIV_KML", 0.01), ("EMIS_CO2_EQUIV", 0.01)):
        got, want = _num(mine[col]), _num(golden[col])
        both = got.notna() & want.notna()
        diff = (got[both] - want[both]).abs()
        assert diff.max() <= tol, f"{col}: max diff {diff.max()}"
        # null patterns must agree too
        assert (got.isna() == want.isna()).all(), f"{col}: null pattern differs"


def test_gas_family_means(replay):
    mine, golden = replay
    for col in GAS_FAMILIES:
        got, want = _num(mine[col]), _num(golden[col])
        both = got.notna() & want.notna()
        assert both.sum() > 0, col
        diff = (got[both] - want[both]).abs()
        assert diff.max() <= 1e-6, f"{col}: max diff {diff.max()}"
        assert (got.isna() == want.isna()).all(), f"{col}: null pattern differs"


def test_importer_resolution(replay):
    """BOTH directions: every golden match reproduced, and no extra
    matches where the reference found none."""
    mine, golden = replay
    for col in ("RUT", "IMP_COD"):
        got = mine[col].fillna("")
        want = golden[col]
        agree = got == want
        assert agree.mean() == 1.0, (
            f"{col} mismatches: {(~agree).sum()}/{len(want)} "
            f"(golden-matched: {(want != '').sum()}, mine-matched: {(got != '').sum()})"
        )
