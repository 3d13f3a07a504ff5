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
    return mine, golden, out


def test_year_and_categories_exact(replay):
    mine, golden, _ = replay
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
    mine, golden, _ = replay
    for col, tol in (("REND_EQUIV_KML", 0.01), ("EMIS_CO2_EQUIV", 0.01)):
        got, want = _num(mine[col]), _num(golden[col])
        both = got.notna() & want.notna()
        diff = (got[both] - want[both]).abs()
        assert diff.max() <= tol, f"{col}: max diff {diff.max()}"
        # null patterns must agree too
        assert (got.isna() == want.isna()).all(), f"{col}: null pattern differs"


def test_gas_family_means(replay):
    mine, golden, _ = replay
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
    mine, golden, _ = replay
    for col in ("RUT", "IMP_COD"):
        got = mine[col].fillna("")
        want = golden[col]
        agree = got == want
        assert agree.mean() == 1.0, (
            f"{col} mismatches: {(~agree).sum()}/{len(want)} "
            f"(golden-matched: {(want != '').sum()}, mine-matched: {(got != '').sum()})"
        )


# ---------------------------------------------------------------------------
# Final K2/K3 artifact: datos3cv_2013-2026.csv
# ---------------------------------------------------------------------------

GOLDEN_FINAL = "/root/reference/data/processed/datos3cv_2013-2026.csv"

# The reference's export column list (load_to_gcp.py:30-43) — including its
# quirk of listing EMISION_NPS_KM_EU_KM TWICE (pandas df[cols] therefore
# writes the column twice, and the committed CSV carries both copies).
USED_COLUMNS = [
    "MARCA", "MODELO", "CODIGO_INFORME_TECNICO", "FECHA_HOML", "FOOT_PRINT_MT2",
    "AÑO", "TIPO_LDV", "CATEGORIA_PROPULSION", "RUT", "IMP_COD", "EMIS_NORMA",
    "CATEGORIA_VH", "PESO_BRUTO_VH_KG", "TRANSMISION",
    "EMIS_CO2_EQUIV", "REND_EQUIV_KML",
    "N2O_EMISION_EPA", "MP_EMISION_EPA_MASA_PARTICULAS_GKM", "HCHO_EMISION_EPA_MGKM",
    "HC_EMISION_EPA_GKM", "HCNM_EMISION_EPA_GKM", "NMOG_NOX_EMISION_EPA",
    "NOX_EMISION_EPA_GKM", "NMOG_EMISION_EPA_GKM", "CO_EMISION_EPA_GKM",
    "HCHO_EMISION_EU_MGKM", "EMISION_NPS_KM_EU_KM", "HC_NOX_EMISION_EU_GKM",
    "EMISION_NPS_KM_EU_KM",
    "NMOG_EMISION_EU_GKM", "HCNM_EMISION_EU_GKM", "CO_EMISION_EU_GKM",
    "MP_EMISION_MASA_PARTICULAS_EU_GKM", "NOX_EMISION_EU_GKM", "HC_EMISION_EU_GKM",
]


def test_data_driven_filename_matches_golden(replay):
    """K3: the min/max-AÑO filename reproduces the committed artifact's
    name exactly (reference set_filename, load_to_gcp.py:48-56)."""
    from etl_dashboard_project_1_spark.sources import writers

    _, _, out = replay
    assert writers.data_driven_filename(out, "AÑO", prefix="datos3cv") == (
        "datos3cv_2013-2026.csv"
    )


@pytest.mark.skipif(not os.path.exists(GOLDEN_FINAL), reason="golden final absent")
def test_final_projection_value_exact_vs_golden(replay):
    """K2 end-to-end: project the pipeline output through the reference's
    export column list (duplicate included), serialize through CSV, and
    compare against the committed datos3cv_2013-2026.csv cell by cell.

    Exactness contract, cell by cell — equal iff one of:
    1. string-exact after CSV round-trip;
    2. both parse as numbers and are EXACTLY equal as doubles — the
       committed tmp intermediate (our only raw source; the raw workbook
       is not in the repo) stores measure columns float-FORMATTED
       ('1.0') where the final golden kept the raw string ('1');
    3. both parse and agree to ≤1e-14 relative — the tmp source itself
       truncated float reprs to 15 significant digits
       ('0.0310686368324903' in tmp vs '…34' in the final: grep-verified
       both artifacts), so the last ulp is source-lost;
    4. ours empty and golden non-numeric — the tmp source collapsed raw
       passthrough junk ('-', ' ', '0,00/0,00', '2,18-E+11') to empty
       (the reference's own current get_gases_emissions coerces these
       very cells in place); both encodings mean "no measurement".
    Everything else — header order (duplicate column included), row
    order, every numeric and categorical value, the rounding of
    REND_EQUIV_KML (numpy half-even on the scaled binary, see
    derive.numpy_round) and both imputed means — must be exact; any cell
    outside the four classes fails the test.
    """
    import io

    mine, _, _ = replay
    proj = mine[USED_COLUMNS]
    buf = io.StringIO()
    proj.to_csv(buf, index=False)
    ours = pd.read_csv(io.StringIO(buf.getvalue()), dtype=str, keep_default_na=False)
    gold = pd.read_csv(GOLDEN_FINAL, dtype=str, keep_default_na=False)

    assert ours.shape == gold.shape == (7569, 35)
    assert list(ours.columns) == list(gold.columns)

    bad = {}
    for i in range(ours.shape[1]):
        a, g = ours.iloc[:, i], gold.iloc[:, i]
        an, gn = pd.to_numeric(a, errors="coerce"), pd.to_numeric(g, errors="coerce")
        num_equal = (
            an.notna()
            & gn.notna()
            & ((an - gn).abs() <= 1e-14 * gn.abs().clip(lower=1.0))
        )
        source_lost = (a == "") & gn.isna() & (g != "")
        neq = (a != g) & ~num_equal & ~source_lost
        if neq.any():
            bad[gold.columns[i]] = (int(neq.sum()), a[neq].iloc[0], g[neq].iloc[0])
    assert not bad, bad
