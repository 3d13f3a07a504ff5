"""Correctness-gate pairs for the fuzzy entity-resolution join (J1/J2) and
category text normalization (D3) — SURVEY.md §2.8 / §2.5.

The raw side is synthesized deterministically from the nation dimension
(suffix ' SA' → must resolve; a garbage literal → must land in not-found),
mirroring the reference's importer-name resolution shape:
~U distinct dirty names × small catalog, threshold 0.6.

The oracle-checked scorer is levenshtein-ratio (SQL-expressible in both
engines). The reference's exact difflib scorer is exposed as
``j1_fuzzy_difflib`` (pandas UDF — no SQL oracle; pinned instead by unit
tests against stdlib difflib and the reference's importer fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import difflib_ratio_udf
from ..functions.text import normalize_category_col
from ..operators import derive
from ..operators.fuzzy import apply_fuzzy_mapping, fuzzy_match_names
from ..session import fan_out, load_table


def _dirty_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    dirty = nation.select(F.concat(F.col("n_name"), F.lit(" SA")).alias("raw_name"))
    # range(1)+lit instead of createDataFrame: a pure Catalyst plan (no
    # ExistingRDD), so the union stays inside whole-stage codegen and no
    # local collection is pickled/parallelized on every call
    junk = spark.range(1).select(F.lit("ZZZ MOTORS INC").alias("raw_name"))
    return dirty.unionByName(junk)


_J1_CTE = r"""
WITH raw AS (
  SELECT DISTINCT n_name || ' SA' AS raw_name FROM nation
  UNION ALL SELECT 'ZZZ MOTORS INC'
),
cat AS (
  SELECT n_name, n_nationkey,
         upper(regexp_replace(n_name, '[\t.\-\s]', '', 'g')) AS nc
  FROM nation
),
scored AS (
  SELECT r.raw_name, c.n_name, c.n_nationkey,
         CASE WHEN greatest(length(nr), length(nc)) = 0 THEN 1.0
              ELSE 1.0 - levenshtein(nr, nc)
                         / CAST(greatest(length(nr), length(nc)) AS DOUBLE)
         END AS score
  FROM (SELECT raw_name, upper(regexp_replace(raw_name, '[\t.\-\s]', '', 'g')) AS nr
        FROM raw) r
  CROSS JOIN cat c
),
best AS (
  SELECT * FROM scored
  QUALIFY row_number() OVER (PARTITION BY raw_name ORDER BY score DESC, n_name ASC) = 1
)
"""


def j1_fuzzy_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: distinct → broadcast cross join → levenshtein-ratio → window
    argmax → threshold. The junk name must come back unmatched (nulls)."""
    nation = load_table(spark, sf_dir, "nation")
    matched = fuzzy_match_names(
        _dirty_names(spark, sf_dir), "raw_name", nation.select("n_name", "n_nationkey"),
        "n_name", threshold=0.6,
    )
    return matched.select(
        "raw_name",
        "matched_n_name",
        derive.portable_round(F.col("match_score"), 3).alias("match_score"),
        "n_nationkey",
    )


J1_SQL = (
    _J1_CTE
    + """
SELECT raw_name,
       CASE WHEN score >= 0.6 THEN n_name END       AS matched_n_name,
       floor(score * 1000 + 0.5) / 1000             AS match_score,
       CASE WHEN score >= 0.6 THEN n_nationkey END  AS n_nationkey
FROM best
"""
)


def j2_mapping_application(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: resolved mapping carried back onto the fact rows via broadcast
    equi left join; unresolved names fall back to the raw value."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", F.concat(F.col("n_name"), F.lit(" SA")).alias("raw_name")
    )
    mapping = fuzzy_match_names(
        _dirty_names(spark, sf_dir), "raw_name", nation.select("n_name", "n_nationkey"),
        "n_name", threshold=0.6,
    ).select("raw_name", F.col("matched_n_name").alias("nation_std"))
    resolved = apply_fuzzy_mapping(dirty, "raw_name", mapping, "nation_std")
    return resolved.select("c_custkey", "raw_name", "nation_std")


J2_SQL = (
    _J1_CTE
    + """
, mapping AS (
  SELECT raw_name, CASE WHEN score >= 0.6 THEN n_name END AS nation_std FROM best
)
SELECT c_custkey, d.raw_name, coalesce(m.nation_std, d.raw_name) AS nation_std
FROM (SELECT c_custkey, n_name || ' SA' AS raw_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey) d
LEFT JOIN mapping m ON d.raw_name = m.raw_name
"""
)


def j1_fuzzy_difflib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact scorer (difflib.SequenceMatcher.ratio as a pandas
    UDF). The oracle is a literal expected-mapping table precomputed with
    the SAME stdlib difflib over the pinned testdata nation names
    (NATION_0..24 — identical at every SF), so the driver gets a full
    hash-check instead of a rows-only row. A unit test asserts the pin
    still matches the actual nation table."""
    nation = load_table(spark, sf_dir, "nation")
    matched = fuzzy_match_names(
        _dirty_names(spark, sf_dir), "raw_name", nation.select("n_name", "n_nationkey"),
        "n_name", threshold=0.6, score_fn=difflib_ratio_udf,
    )
    return matched.select(
        "raw_name", "matched_n_name", derive.portable_round(F.col("match_score"), 3).alias("match_score")
    )


# Testdata nation dimension is the fixed synthetic list NATION_0..NATION_24
# at every SF (verified in test_fuzzy.py); the expected difflib mapping is
# computed here with the exact scorer semantics (normalize_join_key then
# SequenceMatcher(autojunk=False), tie-break score desc / name asc,
# threshold 0.6, floor-based round to 3 decimals).
PINNED_NATION_NAMES = tuple(f"NATION_{i}" for i in range(25))


def _difflib_expected_rows() -> list[tuple[str, str | None, float]]:
    import math
    import re
    from difflib import SequenceMatcher

    norm = lambda s: re.sub(r"[\t\.\-\s]", "", s).upper()  # noqa: E731
    raws = sorted({n + " SA" for n in PINNED_NATION_NAMES}) + ["ZZZ MOTORS INC"]
    rows: list[tuple[str, str | None, float]] = []
    for raw in raws:
        nr = norm(raw)
        scored = sorted(
            ((SequenceMatcher(None, nr, norm(c), autojunk=False).ratio(), c)
             for c in PINNED_NATION_NAMES),
            key=lambda t: (-t[0], t[1]),
        )
        score, cat = scored[0]
        rows.append((raw, cat if score >= 0.6 else None,
                     math.floor(score * 1000 + 0.5) / 1000))
    return rows


def _difflib_values_sql() -> str:
    def lit(m: str | None) -> str:
        return f"'{m}'" if m is not None else "CAST(NULL AS VARCHAR)"

    values = ",\n  ".join(
        f"('{raw}', {lit(m)}, {score}::DOUBLE)" for raw, m, score in _difflib_expected_rows()
    )
    return (
        "SELECT raw_name, matched_n_name, match_score FROM (VALUES\n  "
        + values
        + "\n) AS t(raw_name, matched_n_name, match_score)"
    )


J1_DIFFLIB_SQL = _difflib_values_sql()


def d3_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: null-safe lowercase + accent-strip + trim as one JVM expression
    (accented input synthesized so the op has something to do)."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("  Ártículo ÑOÑO É "), F.col("lang"), F.lit("  "))
    return docs.select("doc_id", normalize_category_col(dirty).alias("norm_text"))


D3_SQL = """
SELECT doc_id,
       trim(strip_accents(lower(
         coalesce('  Ártículo ÑOÑO É ' || lang || '  ', '')))) AS norm_text
FROM documents
"""


def j1_multifield_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field probabilistic record linkage (Fellegi-Sunter shape):
    candidate pairs come from a BLOCKING equi-join (nation key — the
    blocking key is config; production uses finer keys the same way),
    then each candidate scores on several fields at once — name
    levenshtein-ratio (weight 4), account-balance agreement (weight 2),
    market-segment agreement (weight 1) — and the per-probe argmax must
    clear an acceptance threshold. This extends J1's single-field argmax
    join to the multi-evidence form real entity resolution uses.

    The probe side is synthesized deterministically from the customer
    dimension (5% hash sample, name suffixed ' LLC', other fields kept), so
    every probe has exactly one right answer and the linkage's accuracy
    is itself checkable. Scale shape: candidates = Σ_block |probes_b| ×
    |catalog_b| — bounded by the blocking key's selectivity, never
    |probes| × |catalog|; scoring is JVM expressions; one probe-keyed
    window takes the argmax."""
    from ..operators.sampling import hash_bucket
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    probes = cust.filter(hash_bucket(F.col("c_custkey"), "linkage") < 500).select(
        F.col("c_custkey").alias("probe_id"),
        F.concat(F.col("c_name"), F.lit(" LLC")).alias("q_name"),
        F.col("c_acctbal").alias("q_bal"),
        F.col("c_mktsegment").alias("q_seg"),
        F.col("c_nationkey").alias("q_nation"),
    )
    norm = lambda c: F.upper(F.regexp_replace(c, r"[\t.\-\s]", ""))  # noqa: E731
    # fan_out the catalog side (r10): the blocking join broadcasts the
    # probes, so ~450k candidate levenshteins ran inside the one-task
    # customer scan stage. Here — unlike q1/q3, where it lost — the
    # round-robin exchange moves only the 15k catalog rows (~1 MB) and
    # buys 32-way scoring: measured 6.7 s -> 1.5 s at sf0.1. No-op at
    # scale (scan arrives >= cores partitions).
    catalog = fan_out(cust)
    cand = probes.join(catalog, probes.q_nation == catalog.c_nationkey)
    a, b = norm(F.col("q_name")), norm(F.col("c_name"))
    ml = F.greatest(F.length(a), F.length(b))
    name_ratio = F.when(ml == 0, 1.0).otherwise(
        1.0 - F.levenshtein(a, b) / ml.cast("double")
    )
    bal_pts = F.when(F.col("q_bal") == F.col("c_acctbal"), 2.0).otherwise(0.0)
    seg_pts = F.when(F.col("q_seg") == F.col("c_mktsegment"), 1.0).otherwise(0.0)
    scored = cand.select(
        "probe_id",
        "c_custkey",
        (4.0 * name_ratio + bal_pts + seg_pts).alias("_score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("_score"), F.asc("c_custkey"))
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return best.select(
        "probe_id",
        F.when(F.col("_score") >= 4.0, F.col("c_custkey")).alias("matched_custkey"),
        derive.portable_round(F.col("_score"), 3).alias("link_score"),
        (F.col("c_custkey") == F.col("probe_id")).alias("self_match"),
    )


MULTIFIELD_LINKAGE_SQL = r"""
WITH probes AS (
  SELECT c_custkey AS probe_id,
         c_name || ' LLC' AS q_name,
         c_acctbal AS q_bal,
         c_mktsegment AS q_seg,
         c_nationkey AS q_nation
  FROM customer
  WHERE ('0x' || substr(md5(c_custkey::VARCHAR || 'linkage'), 1, 8))::BIGINT % 10000 < 500
),
cand AS (
  SELECT p.probe_id, c.c_custkey,
         upper(regexp_replace(p.q_name, '[\t.\-\s]', '', 'g')) AS na,
         upper(regexp_replace(c.c_name, '[\t.\-\s]', '', 'g')) AS nb,
         CASE WHEN p.q_bal = c.c_acctbal THEN 2.0 ELSE 0.0 END
         + CASE WHEN p.q_seg = c.c_mktsegment THEN 1.0 ELSE 0.0 END AS field_pts
  FROM probes p JOIN customer c ON p.q_nation = c.c_nationkey
),
scored AS (
  SELECT probe_id, c_custkey,
         4.0 * (CASE WHEN greatest(length(na), length(nb)) = 0 THEN 1.0
                     ELSE 1.0 - levenshtein(na, nb)
                           / CAST(greatest(length(na), length(nb)) AS DOUBLE)
                END) + field_pts AS score
  FROM cand
),
best AS (
  SELECT * FROM scored
  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, c_custkey ASC) = 1
)
SELECT probe_id,
       CASE WHEN score >= 4.0 THEN c_custkey END AS matched_custkey,
       floor(score * 1000 + 0.5) / 1000 AS link_score,
       c_custkey = probe_id AS self_match
FROM best
"""
