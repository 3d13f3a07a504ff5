#!/usr/bin/env python
"""Materialize the vehicle-pipeline gate fixtures (run once, commit output).

The reference repo commits its pipeline's intermediate artifact
(`tmp/datos_tmp.csv`: 7,569 rows, raw measure columns PLUS every derived
column its pandas chain produced) and the importer master catalog
(`data/processed/bd-importadores.csv`). The golden-replay suite already
pins OUR pipeline cell-exact against that artifact, but only as local
evidence. To give the engine's signature capability an EXTERNAL driver
row, the `vehicle_pipeline_summary` registry query needs inputs both
engines can read from a stable path:

- vehicle_raw.parquet      — the raw slice (derived columns stripped,
                             '' -> NULL, `_row_id` kept): Spark input.
- vehicle_golden.parquet   — the full reference artifact: DuckDB oracle
                             input (the reference's OWN derived values).
- vehicle_importers.parquet — the catalog for the J1 fuzzy join.

These are DATA fixtures derived from the reference's committed artifacts
(reference behavior, not reference code).
"""

import os
import sys

import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_TMP = "/root/reference/tmp/datos_tmp.csv"
IMPORTERS = "/root/reference/data/processed/bd-importadores.csv"
OUT = os.path.join(ROOT, "tests", "fixtures")

# keep in sync with tests/test_golden_replay.py
DERIVED = [
    "AÑO", "CATEGORIA_PROPULSION", "TIPO_LDV", "REND_EQUIV_KML", "EMIS_CO2_EQUIV",
    "N2O_GKM", "MP_GKM", "NP", "HCHO_MGKM", "HC_GKM", "HC_NOX_GKM", "HCNM_GKM",
    "NMOG_NOX_GKM", "NOX_GKM", "NMOG_GKM", "CO_GKM", "RUT", "IMP_COD",
]


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    golden = pd.read_csv(GOLDEN_TMP, dtype=str, keep_default_na=False)
    golden = golden.rename(columns={"Unnamed: 0": "_row_id"})
    golden["_row_id"] = golden["_row_id"].astype("int64")

    raw = golden.drop(columns=[c for c in DERIVED if c in golden.columns])
    raw = raw.replace({"": None})

    golden.to_parquet(os.path.join(OUT, "vehicle_golden.parquet"), index=False)
    raw.to_parquet(os.path.join(OUT, "vehicle_raw.parquet"), index=False)

    cat = pd.read_csv(IMPORTERS, dtype=str, keep_default_na=False)
    cat.to_parquet(os.path.join(OUT, "vehicle_importers.parquet"), index=False)

    for f in ("vehicle_golden.parquet", "vehicle_raw.parquet", "vehicle_importers.parquet"):
        p = os.path.join(OUT, f)
        print(f, os.path.getsize(p))
    return 0


if __name__ == "__main__":
    sys.exit(main())
