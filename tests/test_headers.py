"""Golden-catalog conformance for the header canonicalizer (H1-H8).

Replays every original header from the reference's committed catalog
(/root/reference/data/processed/campos_hom_data.json — 100 entries incl.
the EV_MOTOR_POT_MAX_KW_1.._3 collision family) through a fresh
canonicalizer in catalog order and requires exact name + hash equality.
"""

import json
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_dashboard_project_1_spark.functions.headers import HeaderCanonicalizer

GOLDEN = "/root/reference/data/processed/campos_hom_data.json"


def test_demo_headers():
    c = HeaderCanonicalizer()
    cases = {
        "CO2 combinado (g/km)": "CO2_COMB_GKM",
        "Fecha de Homologación": "FECHA_HOML",
        "Marca": "MARCA",
    }
    for raw, expected in cases.items():
        assert c.canonical_name(raw) == expected, raw


def test_hash_is_12_hex():
    h = HeaderCanonicalizer.header_hash("Marca")
    assert len(h) == 12
    int(h, 16)  # parses as hex


def test_cache_stability_and_collisions():
    c = HeaderCanonicalizer()
    a = c.standardize("Motor Eléctrico (1) Potencia Máxima del Motor kw")
    b = c.standardize("Motor Eléctrico (2) Potencia Máxima del Motor kw")
    assert a == "EV_MOTOR_POT_MAX_KW"
    assert b == "EV_MOTOR_POT_MAX_KW_1"  # same generated name, suffixed
    # identical header resolves from cache, not a new suffix
    assert c.standardize("Motor Eléctrico (1) Potencia Máxima del Motor kw") == a


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference fixtures absent")
def test_golden_catalog_conformance():
    with open(GOLDEN, encoding="utf-8") as f:
        golden = json.load(f)
    c = HeaderCanonicalizer()
    failures = []
    for expected_std, info in golden.items():  # insertion order = creation order
        original = info["original_names"][0]
        got = c.standardize(original)
        if got != expected_std:
            failures.append((original, expected_std, got))
        expected_hash = info["hashes"][0]
        if c.header_hash(original) != expected_hash:
            failures.append((original, "hash:" + expected_hash, c.header_hash(original)))
    assert not failures, f"{len(failures)}/{len(golden)} mismatches: {failures[:10]}"


def test_catalog_roundtrip(tmp_path):
    path = tmp_path / "catalog.json"
    c = HeaderCanonicalizer(catalog_file=path)
    c.standardize("Marca")
    c.standardize("CO2 combinado (g/km)")
    c2 = HeaderCanonicalizer(catalog_file=path)
    # cache hit: no regeneration, same names
    assert c2.standardize("Marca") == "MARCA"
    assert sorted(n for n, _, _ in c2.catalog_rows()) == ["CO2_COMB_GKM", "MARCA"]


def test_old_catalog_format_readable(tmp_path):
    path = tmp_path / "old.json"
    path.write_text(
        json.dumps({"MARCA": {"default": ["Marca"], "hash": ["c80dc2c24cbe"]}}),
        encoding="utf-8",
    )
    c = HeaderCanonicalizer(catalog_file=path)
    assert c.catalog["MARCA"]["original_names"] == ["Marca"]


# --- H9: LLM-path standardizer (deterministic fake model) -------------------

def test_llm_standardizer_cache_and_collisions(tmp_path):
    """Reference semantics (src/header_standarizer_llm.py:161-190): second
    call is a cache hit; distinct headers generating the same name get
    _1/_2 suffixes; degenerate model output falls back to col_<hash8>."""
    from etl_dashboard_project_1_spark.functions.llm_headers import (
        FakeSeq2Seq, LLMHeaderStandardizer)

    cat = tmp_path / "llm_catalog.json"
    std = LLMHeaderStandardizer(catalog_file=cat)
    a = std.standardize_header("Marca")
    assert a == "MARCA"
    assert std.standardize_header("Marca") == a  # cache hit, no new entry
    assert len(std.catalog) == 1
    # collision: 'marca' normalizes to the same MARCA -> suffix _1
    b = std.standardize_header("marca")
    assert b == "MARCA_1"
    # degenerate input -> hash fallback
    c = std.standardize_header("°°")
    assert c.startswith("col_") and len(c) == 12
    # persisted catalog reloads into an equivalent standardizer
    std2 = LLMHeaderStandardizer(catalog_file=cat)
    assert std2.standardize_header("Marca") == "MARCA"
    assert std2.standardize_header("marca") == "MARCA_1"


def test_llm_standardizer_shares_catalog_format(tmp_path):
    """H9 and the H7 rules engine are drop-in alternatives over ONE catalog
    file: names admitted by one are cache hits for the other."""
    from etl_dashboard_project_1_spark.functions.llm_headers import LLMHeaderStandardizer

    cat = tmp_path / "shared_catalog.json"
    rules = HeaderCanonicalizer(catalog_file=cat)
    name = rules.standardize("CO2 combinado_(g/km)")
    llm = LLMHeaderStandardizer(catalog_file=cat)
    assert llm.standardize_header("CO2 combinado_(g/km)") == name


def test_llm_batch_spark_matches_driver_path(spark):
    """The distributed pandas-UDF inference path must admit exactly the
    names the pure-driver path does (same model, same sorted admission)."""
    from etl_dashboard_project_1_spark.functions.llm_headers import (
        LLMHeaderStandardizer, batch_standardize_spark)
    from etl_dashboard_project_1_spark.plans.header_queries import SAMPLE_HEADERS

    driver_std = LLMHeaderStandardizer()
    expected = driver_std.batch_standardize(sorted(SAMPLE_HEADERS))
    spark_std = LLMHeaderStandardizer()
    got = batch_standardize_spark(spark, spark_std, list(SAMPLE_HEADERS))
    assert got == expected


def test_llm_real_model_path_import_gated_and_prompt_contract():
    """The real-model path (Seq2SeqModel) is import-gated: constructing it
    without torch/transformers raises NotImplementedError (this sandbox),
    and the few-shot prompt reproduces the reference's contract verbatim
    (header_standarizer_llm.py:107-121) — 4 in-context examples, snake
    case instruction, the target header quoted last."""
    import pytest as _pytest

    from etl_dashboard_project_1_spark.functions.llm_headers import (
        Seq2SeqModel, build_prompt)

    with _pytest.raises(NotImplementedError):
        Seq2SeqModel()

    p = build_prompt("Emisiones WLTC CO2")
    assert p.count("Entrada:") == 5 and p.count("Salida:") == 5
    assert "snake_case" in p and "uppercase" in p
    assert p.rstrip().endswith("Salida:")
    assert '"Emisiones WLTC CO2"' in p
    for example_out in ("CO2_COMBINADO_GKM", "ARTICULO_4_DS", "WLTC_HIB_RECARGAEXT_CO2_CS"):
        assert example_out in p


def test_llm_real_model_over_demo_headers():
    """OPTIONAL real-model run (reference parity for H9's actual
    inference, header_standarizer_llm.py:50,135-142): skipped wherever
    torch/transformers are absent (this sandbox) or the weights download
    is unwanted — set SPARK_GRAFT_REAL_LLM=1 to enable. When it runs, it
    drives the reference's exact model (google/flan-t5-base, greedy,
    max_new_tokens=20) through the SAME standardizer/catalog machinery the
    deterministic fake exercises, over the golden demo headers, and checks
    the post-processed contract: non-degenerate sanitized SNAKE_CASE
    names, deterministic across a second call, cache-stable."""
    import pytest as _pytest

    _pytest.importorskip("torch")
    _pytest.importorskip("transformers")
    if os.environ.get("SPARK_GRAFT_REAL_LLM") != "1":
        _pytest.skip("set SPARK_GRAFT_REAL_LLM=1 to download weights and run")

    from etl_dashboard_project_1_spark.functions.llm_headers import (
        LLMHeaderStandardizer, Seq2SeqModel)

    demo = [
        "Marca",
        "CO2 combinado (g/km)",
        "Fecha de Homologación",
        "Motor Eléctrico (1) Potencia Máxima del Motor kw",
    ]
    std = LLMHeaderStandardizer(model_fn=Seq2SeqModel())
    first = std.batch_standardize(demo)
    for raw, name in first.items():
        assert re.fullmatch(r"[A-Za-z0-9_]+", name), (raw, name)
        assert len(name) >= 3, (raw, name)
    # greedy decoding + hash cache => identical on a second pass
    assert std.batch_standardize(demo) == first
