"""Scalable corpus-level boilerplate removal (the C4/CCNet line-dedup
shape, re-expressed for whitespace corpora).

Round-10 rewrite of ``textops.boilerplate_strip``, found by the
--longtext sweep axis doing exactly what it was built for: the original
rebuild tested each segment with ``array_contains`` against the
broadcast boiler ARRAY — O(B) string compares per segment, O(B·S) per
document (B = boiler-set size, S = segments per doc; Spark's
array/map lookups are linear scans, unlike a hash join's O(1) probe) —
which at 20k-char docs with a few hundred qualifying segments turned a
sub-second query into a multi-minute single-task stall, while the
DuckDB oracle's ``NOT IN`` hash semi-join stayed sub-second. B grows
with corpus vocabulary (any segment in ≥ max_df_frac of docs), so this
is a genuine 100 TB defect, not a sweep artifact.

This module keeps the membership test JVM-side and O(1)-per-probe by
marking segment occurrences with a broadcast HASH join against the
boiler TABLE, then reassembling each document with one
groupBy(id) — sort-by-position — concat. Cost model vs the original:
one extra linear shuffle of the segment table (the reassembly groupBy)
in exchange for CPU linear in corpus size; the document-frequency
groupBy (first shuffle) and the tiny broadcast boiler set are
unchanged. At 100 TB a second linear shuffle is bounded and
AQE-coalesced; a per-token O(B) scan is not.

The original stays in ``operators/textops.py`` untouched this round:
textops is transitively imported by 162 registered queries, so any edit
there flips their re-certification fingerprints — more than one
50-entry driver window can absorb (the file-granularity trade is
documented in tools/impl_fingerprint.py; migrating the remaining
textops callers happens module-by-module as windows allow).
Cross-checked equivalent on real corpora by
tests/test_extensions.py::test_boilerplate_scalable_matches_original.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_words: int = 2,
    max_df_frac: float = 0.05,
) -> DataFrame:
    """Segment every document into non-overlapping ``seg_words``-token
    windows, find segments whose document frequency is ≥ ``max_df_frac``
    of the corpus (headers, footers, nav text — anything repeated
    verbatim across many pages), strip those segments from every
    document, and reassemble the remaining text in order.

    Returns (id_col, text_clean, n_segments, n_removed) — the same
    contract as the original ``textops.boilerplate_strip`` (semantics
    pinned equal by test; the oracle SQL in plans/curation_queries.py is
    unchanged).

    Scale shape: segments explode once with their position; document
    frequencies ride one segment-keyed groupBy; the boiler set (at most
    segments-per-doc / max_df_frac entries regardless of corpus size)
    broadcasts into a hash LEFT join that marks occurrences at O(1) per
    probe; one groupBy(id) reassembles in position order
    (array_sort over (pos, seg, is_boiler) structs — no unpartitioned
    window, no driver collect)."""
    # Segmentation is stride-extraction + zip_with, NOT transform over
    # start offsets with slice(split(text), i, k): in that form Catalyst
    # collapses the split() projection INTO the lambda, re-tokenizing the
    # whole document once per segment — O(L²) per doc (measured: 69.8 s
    # for FIVE 218k-char docs vs 2.9 s for fifty with this form; the
    # --longtext stall's dominant term, even before the membership scan).
    # filter/zip_with evaluate their input array once per ROW; the
    # lambdas only touch elements. Semantics identical to the slice
    # form: parts[j] holds tokens at positions ≡ j (mod k), the zip
    # chain pads the ragged tail with null, and concat_ws skips nulls —
    # so the last segment keeps 1..k tokens exactly like a short slice.
    w = F.split(F.col(text_col), " ")

    def stride(j: int):
        # factory closure: a `j=j` default param would change the
        # lambda's arity and break PySpark's (element, index) binding
        return F.filter(w, lambda x, i: i % seg_words == j)

    parts = [stride(j) for j in range(seg_words)]
    segs = parts[0]
    for p in parts[1:]:
        segs = F.zip_with(segs, p, lambda a, b: F.concat_ws(" ", a, b))
    base = df.filter(F.col(text_col).isNotNull() & (F.col(text_col) != "")).select(
        F.col(id_col).alias("_id"), segs.alias("_segs")
    )
    occ = base.select("_id", F.posexplode("_segs").alias("_pos", "_seg"))
    seg_df = occ.groupBy("_seg").agg(F.countDistinct("_id").alias("_df"))
    total = base.agg(F.count(F.lit(1)).alias("_n_docs"))
    boiler = (
        seg_df.crossJoin(F.broadcast(total))
        .filter(F.col("_df") >= F.lit(max_df_frac) * F.col("_n_docs"))
        .select(F.col("_seg").alias("_bseg"))
    )
    marked = occ.join(F.broadcast(boiler), occ["_seg"] == F.col("_bseg"), "left")
    sp = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("_pos"),
                F.col("_seg"),
                F.col("_bseg").isNotNull().alias("_b"),
            )
        )
    )
    return (
        marked.groupBy("_id")
        .agg(sp.alias("_sp"))
        .select(
            F.col("_id").alias(id_col),
            F.concat_ws(
                " ",
                F.transform(
                    F.filter(F.col("_sp"), lambda s: ~s["_b"]),
                    lambda s: s["_seg"],
                ),
            ).alias("text_clean"),
            F.size("_sp").cast("long").alias("n_segments"),
            F.expr("size(filter(_sp, s -> s._b))").cast("long").alias("n_removed"),
        )
    )
