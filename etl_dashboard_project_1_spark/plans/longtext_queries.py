"""Linear-time long-document rewrites staged outside their frozen home
modules.

The r10 --longtext sweep axis (~218k-char documents) exposed an O(len²)
construction class: building per-position k-grams with
``transform(sequence(0, n-k), i -> slice(tokens, i, k))`` lets Catalyst
collapse the ``split()`` projection INTO the lambda, re-tokenizing the
whole document once per position. The fixes for queries resident in
``plans/extension_queries.py`` live HERE rather than in place because the
re-certification rule is file-granular: extension_queries is transitively
imported by most plan modules, so a one-line edit there flips ~145
registry entries with no scheduled driver re-check this round (measured
with ``tools/impl_fingerprint.py``), while a new module flips only the
queries it defines — the same trade ``operators/boilerplate.py`` made vs
``operators/textops.py``. The superseded quadratic bodies stay byte-frozen
in extension_queries until the r11 window seal regenerates
FINGERPRINTS.json, at which point they fold back and this module retires.

Reference behavior: suffix-array-style substring dedup per Lee et al.
("Deduplicating Training Data Makes Language Models Better") — the same
semantics ``operators/dedup.duplicated_spans`` implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup
from ..session import fan_out, load_table


def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal per-document spans whose every word 5-gram also occurs in
    another document (semantics of operators/dedup.duplicated_spans).

    LINEAR positional-gram construction: gram i composes by the same
    zip_with-shift fold word_shingles uses (k-1 elementwise passes,
    O(k·len)); posexplode index = gram position, so everything downstream
    (cross-doc gram agg, gram-keyed flag join, gaps-and-islands run
    merge) is identical to the operator form. dedup.py itself is
    re-certification-frozen this round (an edit flips 249 fingerprints);
    the operator migrates with the r11+ dedup window."""
    k, min_docs = 5, 2
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    w = dedup.tokens("text")
    n = F.size(w)
    grams = w
    for j in range(1, k):
        shifted = F.slice(w, j + 1, F.greatest(n - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.when(
        n >= k, F.slice(grams, 1, F.greatest(n - (k - 1), F.lit(0)))
    ).otherwise(F.array().cast("array<string>"))
    pos_grams = docs.select(
        F.col("doc_id").alias("_id"), F.posexplode(full).alias("_pos", "_gram")
    )
    dup = (
        pos_grams.groupBy("_gram")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_gram")
    )
    flagged = pos_grams.join(dup, "_gram").select("_id", "_pos")
    run_w = Window.partitionBy("_id").orderBy("_pos")
    runs = flagged.withColumn("_rid", F.col("_pos") - F.row_number().over(run_w))
    return (
        runs.groupBy("_id", "_rid")
        .agg(
            F.min("_pos").cast("long").alias("span_start"),
            (F.max("_pos") + (k - 1)).cast("long").alias("span_end"),
            (F.max("_pos") - F.min("_pos") + k).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .select(
            F.col("_id").alias("doc_id"),
            "span_start",
            "span_end",
            "span_tokens",
            "n_grams",
        )
    )


# Positional 5-grams come from token ROWS composed by lead() windows
# (linear), not per-position list slicing inside a comprehension — the
# original g0 form re-materialized the ~43k-token list per position on
# the --longtext axis's ~218k-char docs (O(len²), same DuckDB defect
# class the boilerplate oracle had). lead(t,4) IS NULL marks the ragged
# tail (full windows only), mirroring the Spark side's n-k+1 slice.
# The gram windows partition on a PER-ROW id, not doc_id: the Spark
# side builds grams per physical row (posexplode of a per-row array),
# so under duplicate-key corrupt input (the --dupes sweep) two copies
# of a doc_id must each contribute their own intact gram sequence —
# doc_id-partitioned windows interleave the copies' positions and
# garble the grams (caught by the r10 round-close dupes gate,
# spark=146 vs oracle=255 rows; same class aa19008 fixed in the span
# oracle). Downstream (dup / f / r) keys on doc_id in BOTH engines.
DEDUP_SPANS_SQL = r"""
WITH w AS (SELECT row_number() OVER () AS rid, doc_id,
                  regexp_split_to_array(lower(text), '\s+') AS w
           FROM documents),
tok AS (
  SELECT rid, doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS t FROM w
),
g0 AS (
  SELECT rid, doc_id, pos,
         t || ' ' || lead(t, 1) OVER win || ' ' || lead(t, 2) OVER win
           || ' ' || lead(t, 3) OVER win || ' ' || lead(t, 4) OVER win AS gram,
         lead(t, 4) OVER win AS t4
  FROM tok
  WINDOW win AS (PARTITION BY rid ORDER BY pos)
),
g AS (SELECT doc_id, pos, gram FROM g0 WHERE t4 IS NOT NULL),
dup AS (SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
f AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
r AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rid
  FROM f
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + 4 AS span_end,
       max(pos) - min(pos) + 5 AS span_tokens,
       count(*) AS n_grams
FROM r
GROUP BY doc_id, rid
"""
