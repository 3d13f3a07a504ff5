"""J1/J2: fuzzy similarity entity-resolution join (SURVEY.md §2.8).

Reference semantics (src/importer_standarizer.py:37-148): for each DISTINCT
raw name, normalize (upper, strip ``[\\t.\\-\\s]``), score against every
catalog name, take the argmax, accept if score >= threshold; carry the
catalog's payload columns back onto the full table via an equi left join;
below-threshold names form the "not found" set.

Spark-first plan (mirrors the one hand-optimization the reference author
wrote — distinct before the expensive scoring):

    distinct(raw) → cross join BROADCAST(catalog) → score
    → row_number() over (partition by raw order by score desc) == 1
    → threshold gate → left join back (broadcast) + coalesce

Scale: the scored side is |distinct names| × |catalog|. The catalog is
broadcast (28 rows in the reference; any dimension-sized table works). For
catalog sizes where U×C explodes, pass ``blocking_fn`` to equi-join on a
blocking key (e.g. first token / prefix) before scoring — turning the cross
join into a co-partitioned equi join.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import difflib_ratio_udf, levenshtein_ratio
from ..functions.text import normalize_join_key

ScoreFn = Callable[[Column, Column], Column]


def fuzzy_match_names(
    raw: DataFrame,
    raw_col: str,
    catalog: DataFrame,
    catalog_col: str,
    threshold: float = 0.6,
    score_fn: ScoreFn | None = None,
    blocking_fn: Callable[[Column], Column] | None = None,
    normalize: bool = True,
    strict: bool = False,
) -> DataFrame:
    """J1: best catalog match per distinct raw name.

    Returns columns: ``raw_col``, ``matched_<catalog_col>`` (null when below
    threshold), ``match_score`` plus every other catalog column (nulled when
    below threshold). Deterministic tie-break: score desc, catalog value asc.

    ``normalize=False`` scores the raw strings as-is (the reference's old
    importer variant relies on case-sensitive scoring); ``strict=True``
    requires score STRICTLY above the threshold (ditto).
    """
    score_fn = score_fn or levenshtein_ratio
    names = raw.select(raw_col).na.drop().distinct()
    if normalize:
        norm_raw = normalize_join_key(F.col(raw_col))
        norm_cat = normalize_join_key(F.col(catalog_col))
    else:
        norm_raw = F.col(raw_col)
        norm_cat = F.col(catalog_col)

    if blocking_fn is not None:
        names = names.withColumn("_block", blocking_fn(F.col(raw_col)))
        cat = catalog.withColumn("_block", blocking_fn(F.col(catalog_col)))
        scored = names.join(F.broadcast(cat), "_block").drop("_block")
    else:
        scored = names.crossJoin(F.broadcast(catalog))

    scored = scored.withColumn("match_score", score_fn(norm_raw, norm_cat))
    w = Window.partitionBy(raw_col).orderBy(F.desc("match_score"), F.asc(catalog_col))
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    accepted = (
        F.col("match_score") > F.lit(threshold)
        if strict
        else F.col("match_score") >= F.lit(threshold)
    )
    out = best.withColumn(
        f"matched_{catalog_col}", F.when(accepted, F.col(catalog_col))
    ).drop(catalog_col)
    # null the payload columns for rejected names so they read as "not found"
    payload = [c for c in catalog.columns if c != catalog_col]
    for c in payload:
        out = out.withColumn(c, F.when(accepted, F.col(c)))
    return out


def apply_fuzzy_mapping(
    df: DataFrame,
    raw_col: str,
    mapping: DataFrame,
    standardized_col: str,
    keep_original: bool = True,
) -> DataFrame:
    """J2: carry the resolved mapping back onto the full table.

    Broadcast equi left join on the raw name; the standardized name falls
    back to the original where unresolved (reference: coalesce at
    src/importer_standarizer.py:118-121).
    """
    joined = df.join(F.broadcast(mapping), on=raw_col, how="left")
    std = F.coalesce(F.col(standardized_col), F.col(raw_col)) if keep_original else F.col(
        standardized_col
    )
    return joined.withColumn(standardized_col, std)


def not_found(match_result: DataFrame, catalog_col: str) -> DataFrame:
    """The anti side: distinct raw names that failed the threshold."""
    return match_result.filter(F.col(f"matched_{catalog_col}").isNull())


__all__ = [
    "fuzzy_match_names",
    "apply_fuzzy_mapping",
    "not_found",
    "levenshtein_ratio",
    "difflib_ratio_udf",
]
