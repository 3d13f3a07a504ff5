"""Expression-level Bloom-filter runtime join filter.

The pattern Spark's own runtime-filter injection (and every warehouse
engine's "sideways information passing") applies at 100 TB: when a fact
⋈ dim join is selective on the dim side, build a Bloom filter of the dim
keys, broadcast it, and drop non-matching fact rows BEFORE the join's
shuffle — the exact join afterwards removes the Bloom's false positives,
so results are bit-identical to the plain join while shuffle input
shrinks by the dim's selectivity.

Everything here is pure Column expressions (``xxhash64``/``pmod``/
``shiftleft``/``bit_or``), so the probe runs inside whole-stage codegen:
no Python objects cross the boundary, no driver-side sketch class — the
bitmap is a one-row ``array<long>`` DataFrame that Catalyst broadcasts
like any scalar aggregate.

Sizing: ``num_bits`` should be ~10× the expected dim-key count for ~1%
false positives with 3 hashes (standard Bloom math: fp ≈ (1-e^{-kn/m})^k).
The bitmap is num_bits/8 bytes — 8 KiB covers ~6k keys; even 1e8 keys
need only ~120 MiB, still broadcastable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_COL = "_bloom_bits"


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # Independent hash functions via xxhash64(key, seed_i) — the seed is
    # an extra hashed column, the standard multi-hash construction.
    return [
        F.pmod(F.xxhash64(key, F.lit(h)), F.lit(num_bits))
        for h in range(num_hashes)
    ]


def bloom_build(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 3
) -> DataFrame:
    """One-row DataFrame holding the dim keys' Bloom bitmap as
    ``array<long>`` (length num_bits/64, 1-based like element_at).

    Plan shape: explode the k positions per key (k rows/key), distinct,
    one groupBy on the 64-bit word index with a ``bit_or`` of the bit
    masks — word-count-sized shuffle (≤ num_bits/64 rows), then a single
    global collect_list-as-map. No driver loop touches keys.
    """
    nwords = num_bits // 64
    key = F.col(key_col)
    pos = (
        dim.filter(key.isNotNull())
        .select(F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos"))
        .distinct()
    )
    words = pos.groupBy(F.expr("pos DIV 64").alias("word")).agg(
        F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            )
        ).alias("mask")
    )
    packed = words.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("mask")).alias("_m")
    )
    idx = F.sequence(F.lit(0), F.lit(nwords - 1))
    return packed.select(
        F.transform(
            idx,
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias(BLOOM_COL)
    )


def bloom_might_contain(
    key: Column, bloom: Column, num_bits: int, num_hashes: int = 3
) -> Column:
    """Codegen-able membership probe: all k bits set → maybe-member
    (false positives possible, false negatives impossible)."""
    checks = []
    for pos in _positions(key, num_bits, num_hashes):
        # pos is non-negative (pmod), so floor-div by 64 is exact
        word = F.element_at(bloom, (F.floor(pos / F.lit(64)) + 1).cast("int"))
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        checks.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, checks)


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Return ``fact`` with rows that CANNOT join ``dim`` removed.

    Exact-safe: keeps every row whose key is in dim (no false negatives),
    so ``bloom_prefilter(fact, ...).join(dim, ...)`` ≡ ``fact.join(dim,
    ...)``. The payoff is upstream of the join: at scale the filter runs
    map-side in the scan stage and cuts the fact's shuffle volume before
    a sort-merge join ever materializes it.
    """
    bits = bloom_build(dim, dim_key, num_bits, num_hashes)
    return (
        fact.crossJoin(F.broadcast(bits))
        .filter(bloom_might_contain(F.col(fact_key), F.col(BLOOM_COL), num_bits, num_hashes))
        .drop(BLOOM_COL)
    )
