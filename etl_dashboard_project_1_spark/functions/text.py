"""Scalar text functions (SURVEY.md §2.12): normalization used by the
category-column cleaner (D3), the header canonicalizer (H1) and the fuzzy
join normalizer (J1).

Two tiers:
- ``strip_accents_col``: pure Column ``F.translate`` over the Latin accent
  repertoire — JVM-side, codegen'd, zero Python. This is the hot-path
  version (covers every accented char the Chilean dataset and common Latin
  text produce).
- ``strip_accents_udf``: Arrow-batched pandas UDF using full Unicode NFD
  decomposition — the completeness fallback for arbitrary text, still
  vectorized (no per-row Python).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Latin diacritics → ASCII, one char to one char (translate semantics).
_ACCENTED = "áàâäãåéèêëíìîïóòôöõúùûüýÿñçÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÝŸÑÇºª°"
_PLAIN = "aaaaaaeeeeiiiiooooouuuuyyncAAAAAAEEEEIIIIOOOOOUUUUYYNC   "


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_accents_col(col: Column | str) -> Column:
    """Accent-strip via char translation — JVM-side, no UDF."""
    return F.translate(_c(col), _ACCENTED, _PLAIN)


@F.pandas_udf(T.StringType())
def strip_accents_udf(s: pd.Series) -> pd.Series:
    """Full-Unicode accent strip (NFD + drop combining marks)."""

    def strip(x):
        if x is None:
            return None
        return "".join(
            ch for ch in unicodedata.normalize("NFD", x) if not unicodedata.combining(ch)
        )

    return s.map(strip)


def normalize_category_col(col: Column | str) -> Column:
    """D3 (reference: src/transform_pipeline.py:55-66): null→'', lowercase,
    accent-strip, trim edge whitespace. One codegen'd expression."""
    c = F.coalesce(_c(col).cast("string"), F.lit(""))
    return F.trim(strip_accents_col(F.lower(c)))


def collapse_whitespace(col: Column | str) -> Column:
    """Runs of whitespace → single space."""
    return F.regexp_replace(_c(col), r"\s+", " ")


def normalize_join_key(col: Column | str) -> Column:
    """J1 name normalization (reference: src/importer_standarizer.py:37-43):
    uppercase, strip tabs/dots/hyphens/whitespace."""
    return F.upper(F.regexp_replace(_c(col).cast("string"), r"[\t\.\-\s]", ""))
