"""String-similarity functions for the fuzzy entity-resolution join (J1)
and the near-dup operators.

Two scorers with different contracts:
- ``levenshtein_ratio``: pure Column expression (``F.levenshtein`` is a
  built-in JVM function) — ``1 - lev(a,b)/max(len(a),len(b))``. Fully
  SQL-expressible, so it is the oracle-checkable default.
- ``difflib_ratio_udf``: Arrow-batched pandas UDF wrapping stdlib
  ``difflib.SequenceMatcher.ratio`` — bit-for-bit the reference's scorer
  (src/importer_standarizer.py:63-65). Levenshtein-ratio and difflib-ratio
  are NOT numerically identical; the engine exposes both and conformance
  tests pin the difflib behavior.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """Normalized edit-distance similarity in [0, 1], JVM-side."""
    ca, cb = _c(a), _c(b)
    denom = F.greatest(F.length(ca), F.length(cb))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(ca, cb).cast("double") / denom.cast("double")
    )


@F.pandas_udf(T.DoubleType())
def difflib_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """stdlib difflib.SequenceMatcher.ratio, vectorized over Arrow batches.

    Deterministic and null-tolerant (null in → null out). autojunk is
    disabled: the reference compares short names where the heuristic never
    triggers, and disabling it keeps semantics length-independent.
    """

    def ratio(x, y):
        if x is None or y is None:
            return None
        return SequenceMatcher(None, x, y, autojunk=False).ratio()

    return pd.Series([ratio(x, y) for x, y in zip(a, b)], dtype="float64")


_JUNK_CHARS = {"\t", ".", " ", "-"}


@F.pandas_udf(T.DoubleType())
def difflib_ratio_junk_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """The reference's wired-in importer scorer: case-sensitive
    ``SequenceMatcher`` over the RAW names with tab/dot/space/hyphen as
    junk (behavior of the old in-place variant the pipeline actually
    imports). Distinct from normalize-then-score: case differences lower
    the score, so fewer names clear the threshold."""

    def ratio(x, y):
        if x is None or y is None:
            return None
        return SequenceMatcher(lambda ch: ch in _JUNK_CHARS, str(x), str(y)).ratio()

    return pd.Series([ratio(x, y) for x, y in zip(a, b)], dtype="float64")
