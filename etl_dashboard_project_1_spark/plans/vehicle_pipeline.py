"""The vehicle-homologation transform pipeline (EP2, SURVEY.md §3) as a
lazy Spark plan.

The reference (behavior at /root/reference/src/transform_pipeline.py:218-251)
runs ~12 eager pandas mutations; here the whole chain is declared as one
Column-expression DAG on a single DataFrame — Catalyst collapses it into one
or two stages. Domain tables (fuel factors, propulsion categories, gas
families, the final projection) are module-level CONFIG, not code.

Faithful semantics preserved on purpose (each noted inline):
- the '-' sentinel means repeat-previous for FECHA_HOML / PESO_BRUTO_VH_KG
  (ffill) but not-applicable→null for measure columns;
- the dual-fuel source-column override in the efficiency table leaks onto
  'gasolina/hibrido' (loop-variable rebinding in the reference);
- the 'hidrogreno' factor key never matches real 'hidrogeno' fuel, so fuel-
  cell rows fall through to mean imputation;
- D9 family means divide by the PRESENT column count, nulls summed as 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_category_col
from ..operators import cleaning, derive
from ..operators.fuzzy import apply_fuzzy_mapping, fuzzy_match_names

ROW_ID = "_row_id"

CATEGORY_COLUMNS = [
    "PROPULSION", "COMBUSTIBLE", "CATEGORIA_VH", "IMPORTADOR",
    "MARCA", "MODELO", "EMIS_NORMA", "TIPO_CARROCERIA",
]

PROPULSION_CATEGORIES = {
    "bev": ["vehiculo electrico"],
    "ice": ["combustion", "electrico de rango extendido"],
    "hev": ["vehiculos hibridos sin recarga exterior"],
    "h2": ["vehiculos celda de hidrogeno"],
    "phev": ["vehiculos hibridos con recarga exterior",
             "electrico hibrido con recarga exterior"],
}

# per-propulsion efficiency source column
PROPULSION_SOURCE = {
    "combustion": "MIXTO_REND_COMBUSTIBLE_KML",
    "vehiculo electrico": "REND_EV_VH_KMKWH",
    "vehiculos hibrido con recarga exterior": "COMB_REND_WLTC_KML",
    "electrico hibrido con recarga exterior": "COMB_REND_WLTC_KML",
    "vehiculos hibridos sin recarga exterior": "MIXTO_REND_COMBUSTIBLE_KML",
    "vehiculos celda de hidrogeno": "REND_LOW_H2_KG_100_KM_FCEV_VH_CELDA",
    "electrico de rango extendido": "MIXTO_REND_COMBUSTIBLE_KML",
}

# per-fuel conversion factor, in the reference's iteration order (matters
# for the source-column override below)
FUEL_FACTORS = [
    ("gasolina", 1.0),
    ("diesel", 0.87),
    ("electrico", 8.60),
    ("hidrogreno", 374.96),  # [sic] — never matches 'hidrogeno'; see module doc
    ("gasolina/glp", 1.0),
    ("gasolina/gnc", 1.0),
    ("gasolina/hibrido", 1.0),
]
DUAL_FUEL_SOURCE = "MIXTO_REND_GASOL_VH_GLP_GNC_KML"
# fuels that read from the dual-fuel column: the two duals by design, plus
# 'gasolina/hibrido' inheriting the override (reference loop-var leak)
DUAL_OVERRIDE_FUELS = {"gasolina/glp", "gasolina/gnc", "gasolina/hibrido"}

CO2_SOURCE_BY_FUEL = {
    "diesel": "EMIS_CO2_GKM",
    "gasolina": "EMIS_CO2_GKM",
    "gasolina/glp": "CO2_VH_GASOL_GLP_GNC_GRKM",
    "gasolina/gnc": "CO2_VH_GASOL_GLP_GNC_GRKM",
    "electrico": "EMIS_CO2_GKM",
    "gasolina/hibrido": "CO2_PHEV_REND_PONDERADO_VH_GKM",
    "hidrogeno": "EMIS_CO2_GKM",
}

GAS_FAMILIES = {
    "N2O_GKM": ["N2O_EMISION_EPA"],
    "MP_GKM": ["MP_EMISION_EPA_MASA_PARTICULAS_GKM", "MP_EMISION_MASA_PARTICULAS_EU_GKM"],
    "NP": ["EMISION_NPS_KM_EU_KM", "EPA_NPS_KM_NORMA_USA_KM"],
    "HCHO_MGKM": ["HCHO_EMISION_EPA_MGKM", "HCHO_EMISION_EU_MGKM"],
    "HC_GKM": ["HC_EMISION_EPA_GKM", "HC_EMISION_EU_GKM"],
    "HC_NOX_GKM": ["HC_NOX_EMISION_EU_GKM"],
    "HCNM_GKM": ["HCNM_EMISION_EPA_GKM"],
    "NMOG_NOX_GKM": ["NMOG_NOX_EMISION_EPA"],
    "NOX_GKM": ["NOX_EMISION_EPA_GKM", "NOX_EMISION_EU_GKM"],
    "NMOG_GKM": ["NMOG_EMISION_EPA_GKM", "NMOG_EMISION_EU_GKM"],
    "CO_GKM": ["CO_EMISION_EPA_GKM", "CO_EMISION_EU_GKM"],
}

WEIGHT_CLASS_EDGES = [float("-inf"), 2700.0, 3860.0]
WEIGHT_CLASS_LABELS = ["liviano", "mediano"]

# K2 final projection (≈35 cols)
FINAL_COLUMNS = [
    "MARCA", "MODELO", "CODIGO_INFORME_TECNICO", "FECHA_HOML", "FOOT_PRINT_MT2",
    "AÑO", "TIPO_LDV", "CATEGORIA_PROPULSION", "RUT", "IMP_COD", "EMIS_NORMA",
    "CATEGORIA_VH", "PESO_BRUTO_VH_KG", "TRANSMISION",
    "EMIS_CO2_EQUIV", "REND_EQUIV_KML",
    "N2O_EMISION_EPA", "MP_EMISION_EPA_MASA_PARTICULAS_GKM", "HCHO_EMISION_EPA_MGKM",
    "HC_EMISION_EPA_GKM", "HCNM_EMISION_EPA_GKM", "NMOG_NOX_EMISION_EPA",
    "NOX_EMISION_EPA_GKM", "NMOG_EMISION_EPA_GKM", "CO_EMISION_EPA_GKM",
    "HCHO_EMISION_EU_MGKM", "EMISION_NPS_KM_EU_KM", "HC_NOX_EMISION_EU_GKM",
    "NMOG_EMISION_EU_GKM", "HCNM_EMISION_EU_GKM", "CO_EMISION_EU_GKM",
    "MP_EMISION_MASA_PARTICULAS_EU_GKM", "NOX_EMISION_EU_GKM", "HC_EMISION_EU_GKM",
]


def _numeric_measure(col: str) -> F.Column:
    """'-' sentinel → null, coercing cast (measure-column policy)."""
    return derive.numeric_cast(cleaning.sentinel_to_null(col))


def transform_datetime(df: DataFrame) -> DataFrame:
    """D1+N1+N2: homologation date — sentinel means repeat-previous."""
    df = df.withColumn("FECHA_HOML", cleaning.sentinel_to_null("FECHA_HOML"))
    df = cleaning.ffill(df, ["FECHA_HOML"], order_cols=[ROW_ID])
    df = df.withColumn("FECHA_HOML", derive.parse_date("FECHA_HOML"))
    return df.withColumn("AÑO", derive.extract_year("FECHA_HOML"))


def transform_weight(df: DataFrame) -> DataFrame:
    """D2+N1+N2: gross weight — sentinel means repeat-previous."""
    df = df.withColumn("PESO_BRUTO_VH_KG", cleaning.sentinel_to_null("PESO_BRUTO_VH_KG"))
    df = cleaning.ffill(df, ["PESO_BRUTO_VH_KG"], order_cols=[ROW_ID])
    return df.withColumn("PESO_BRUTO_VH_KG", derive.numeric_cast("PESO_BRUTO_VH_KG"))


def transform_categories(df: DataFrame) -> DataFrame:
    """D3 over the 8 category columns (missing ones skipped) + D4 fuel fix."""
    for c in CATEGORY_COLUMNS:
        if c in df.columns:
            df = df.withColumn(c, normalize_category_col(c))
    if "COMBUSTIBLE" in df.columns:
        df = df.withColumn(
            "COMBUSTIBLE", cleaning.replace_value("COMBUSTIBLE", "", "electrico")
        )
    return df


def derive_propulsion_category(df: DataFrame) -> DataFrame:
    """D5."""
    return df.withColumn(
        "CATEGORIA_PROPULSION",
        derive.case_map("PROPULSION", PROPULSION_CATEGORIES, default=""),
    )


def derive_weight_class(df: DataFrame) -> DataFrame:
    """D8."""
    return df.withColumn(
        "TIPO_LDV",
        derive.bucketize("PESO_BRUTO_VH_KG", WEIGHT_CLASS_EDGES, WEIGHT_CLASS_LABELS),
    )


def derive_equivalent_efficiency(df: DataFrame) -> DataFrame:
    """D6: one chained CASE over the 7×7 (propulsion, fuel) space.

    The reference runs 49 masked passes; a row matches exactly one
    (propulsion, fuel) pair so a single CASE with the same pair→(source,
    factor) table is semantically identical and one codegen'd expression.
    """
    table = {}
    for prop, prop_src in PROPULSION_SOURCE.items():
        for fuel, factor in FUEL_FACTORS:
            src = DUAL_FUEL_SOURCE if fuel in DUAL_OVERRIDE_FUELS else prop_src
            if src in df.columns:
                table[(prop, fuel)] = (src, factor)
    # sentinel-clean the source columns once (the reference re-coerces per
    # pass — idempotent, collapsed here)
    cleaned = df
    for src in {s for s, _ in table.values()}:
        cleaned = cleaned.withColumn(src, _numeric_measure(src))
    expr = derive.factor_product(["PROPULSION", "COMBUSTIBLE"], table, decimals=None)
    # numpy_round = half-even on the scaled BINARY value, matching the
    # reference's pandas .round(2) bit-for-bit. bround (half-even on the
    # shortest-decimal repr) diverged on 37 golden rows: 11.5*0.87 prints
    # as 10.005 but is binary 10.005000000000000426 — numpy rounds UP.
    return cleaned.withColumn("REND_EQUIV_KML", derive.numpy_round(expr, 2))


def derive_co2_equivalent(df: DataFrame) -> DataFrame:
    """D7 + N5: per-fuel CO₂ source column; bev forced to 0."""
    table = {f: c for f, c in CO2_SOURCE_BY_FUEL.items() if c in df.columns}
    cleaned = df
    for src in set(table.values()):
        cleaned = cleaned.withColumn(src, _numeric_measure(src))
    expr = derive.keyed_source_select("COMBUSTIBLE", table)
    expr = F.when(F.col("CATEGORIA_PROPULSION") == "bev", F.lit(0.0)).otherwise(expr)
    return cleaned.withColumn("EMIS_CO2_EQUIV", expr)


def derive_gas_family_means(df: DataFrame) -> DataFrame:
    """D9 for the 11 gas families, present-columns-only divisor."""
    out = df
    for family, members in GAS_FAMILIES.items():
        present = [c for c in members if c in df.columns]
        if not present:
            continue
        out = out.withColumn(
            family,
            derive.horizontal_mean([_numeric_measure(c) for c in present], decimals=None),
        )
    return out


def impute_missing(df: DataFrame) -> DataFrame:
    """N4/N5 tail: bev CO₂ = 0 (again, after derivations — reference order),
    then mean-impute both derived measures."""
    df = df.withColumn(
        "EMIS_CO2_EQUIV",
        cleaning.constant_fixup("EMIS_CO2_EQUIV", "CATEGORIA_PROPULSION", "bev", 0.0),
    )
    return cleaning.mean_impute(
        df, ["EMIS_CO2_EQUIV", "REND_EQUIV_KML"], decimals=2, rounding="rint"
    )


def standardize_importers(
    df: DataFrame, catalog: DataFrame, threshold: float = 0.6
) -> tuple[DataFrame, DataFrame]:
    """J1+J2: fuzzy-resolve IMPORTADOR against the master catalog
    (NOMBRE_EMP/RUT/COD_IMP), carry RUT + IMP_COD, replace the name with
    the catalog spelling; returns (resolved_df, not_found_names).

    Reference-faithful scoring: case-sensitive difflib over the RAW
    (D3-lowercased) names with junk chars, score STRICTLY above the
    threshold — the behavior of the old variant the reference pipeline
    actually imports. (The normalize-then-score path in operators/fuzzy
    matches more aggressively; both are available.)"""
    from ..functions.similarity import difflib_ratio_junk_udf
    from ..operators.fuzzy import not_found as nf

    matched = fuzzy_match_names(
        df, "IMPORTADOR", catalog.select("NOMBRE_EMP", "RUT", "COD_IMP"),
        "NOMBRE_EMP", threshold=threshold, score_fn=difflib_ratio_junk_udf,
        normalize=False, strict=True,
    )
    mapping = matched.select(
        "IMPORTADOR",
        F.col("matched_NOMBRE_EMP").alias("IMPORTADOR_STD"),
        "RUT",
        F.col("COD_IMP").alias("IMP_COD"),
    )
    resolved = apply_fuzzy_mapping(df, "IMPORTADOR", mapping, "IMPORTADOR_STD")
    resolved = resolved.withColumn("IMPORTADOR", F.col("IMPORTADOR_STD")).drop(
        "IMPORTADOR_STD"
    )
    return resolved, nf(matched, "NOMBRE_EMP").select("IMPORTADOR")


def vehicle_pipeline(
    df: DataFrame, importer_catalog: DataFrame | None = None
) -> DataFrame:
    """EP2: the full chain, dependency order as in the reference
    (D3-normalized PROPULSION before D5; D4 fuel before D6/D7; D2 weight
    before D8; imputation after D6/D7; J1 after D3).

    The two repeat-previous sentinel columns (date + weight) are forward-
    filled in ONE pass — ffill is the only order-sensitive operator in the
    chain, so fusing the calls halves its repartition/scan cost.
    """
    for c in ("FECHA_HOML", "PESO_BRUTO_VH_KG"):
        df = df.withColumn(c, cleaning.sentinel_to_null(c))
    df = cleaning.ffill(df, ["FECHA_HOML", "PESO_BRUTO_VH_KG"], order_cols=[ROW_ID])
    df = (
        df.withColumn("FECHA_HOML", derive.parse_date("FECHA_HOML"))
        .withColumn("AÑO", derive.extract_year("FECHA_HOML"))
        .withColumn("PESO_BRUTO_VH_KG", derive.numeric_cast("PESO_BRUTO_VH_KG"))
    )
    df = transform_categories(df)
    df = derive_propulsion_category(df)
    df = derive_weight_class(df)
    df = derive_equivalent_efficiency(df)
    df = derive_co2_equivalent(df)
    df = derive_gas_family_means(df)
    df = impute_missing(df)
    if importer_catalog is not None and "IMPORTADOR" in df.columns:
        df, _ = standardize_importers(df, importer_catalog)
    return df


def final_projection(df: DataFrame) -> DataFrame:
    """K2: the ~35-column dashboard projection (missing columns skipped)."""
    cols = [c for c in FINAL_COLUMNS if c in df.columns]
    return df.select(*cols)
