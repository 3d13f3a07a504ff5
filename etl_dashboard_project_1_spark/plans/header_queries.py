"""H9 driver gate: LLM-path header standardization over the reference's
own sample headers (header_standarizer_llm.py:244-252), with a literal
expected-output oracle.

The model is the deterministic :class:`FakeSeq2Seq` stand-in, so the
expected (hash, standard_name) table is computed at import time with the
very same code the Spark path runs — the driver's hash comparison then
checks the whole chain: distributed pandas-UDF inference → post-processing
→ collision suffixing → hash-cache admission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.llm_headers import LLMHeaderStandardizer, batch_standardize_spark

# The reference's example batch (header_standarizer_llm.py:244-252) — the
# multi-line WLTC monsters are the reason H9 exists.
SAMPLE_HEADERS: tuple[str, ...] = (
    "Artículo 4° Nonies, D.S. 211/91 Ministerio de Transportes y "
    "Telecomunicaciones (Estándar Superior)",
    "CO2 combinado_(g/km)",
    "Categoría vehículo",
    "Ciclo WLTC\nVehículo Híbrido con Recarga Exterior\nEmisiones de CO2\n"
    "_CONDICIÓN COMBINADO CS (*) g/km",
    "Ciclo WLTC\nVehículo Híbrido con Recarga Exterior\nEmisiones de CO2\n"
    "_CONDICIÓN COMBINADO CD (**) g/km",
    "Ciclo WLTC\nVehículo Híbrido con Recarga Exterior Emisiones de CO2 "
    "PONDERADA g/km",
    "Ciclo WLTC Vehículo Híbrido con Recarga Exterior Consumo de "
    "combustible (km/l) (*):_Condición CS: Mantenimiento de carga_Urbano "
    "sin Autopista (km/l)",
)


def h9_llm_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed inference + driver-side admission; one row per sample
    header: (header_hash, standard_name). ``sf_dir`` unused — header
    standardization is metadata-scale and testdata-independent."""
    std = LLMHeaderStandardizer()
    mapping = batch_standardize_spark(spark, std, list(SAMPLE_HEADERS))
    rows = [(std.header_hash(h), name) for h, name in sorted(mapping.items())]
    return spark.createDataFrame(rows, ["header_hash", "standard_name"])


def _expected_rows() -> list[tuple[str, str]]:
    std = LLMHeaderStandardizer()
    mapping = std.batch_standardize(sorted(SAMPLE_HEADERS))
    return sorted((std.header_hash(h), name) for h, name in mapping.items())


H9_SQL = (
    "SELECT header_hash, standard_name FROM (VALUES\n  "
    + ",\n  ".join(f"('{h}', '{n}')" for h, n in _expected_rows())
    + "\n) AS t(header_hash, standard_name)"
)
