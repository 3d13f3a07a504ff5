"""Config-driven data-quality rule engine — the audit side of an ETL
dashboard (reference parity: the reference emits audit CSVs of its header
catalog, src/transform_pipeline.py K6; this generalizes that to row-level
data contracts).

Rules are declarative (name, predicate Column); evaluation is ONE pass:
every rule becomes a conditional-sum aggregate over the same scan, so N
rules cost one job and zero extra shuffles (the aggregation is a global
partial+final pair). Referential-integrity rules are left anti joins —
the one rule family that genuinely needs a second table.

All counting is done with ``sum(when(violated, 1))`` rather than N
filtered passes: at 100 TB the scan dominates, so rules must share it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """Evaluate named violation predicates in one aggregate pass.

    ``rules`` = [(rule_name, violation_condition), ...]; returns one row
    per rule: (rule, violations, total_rows, violation_rate).
    """
    # rule names are DATA, not identifiers: aggregates get positional
    # internal aliases so a name like '_total', 'a.b', or a duplicate
    # cannot collide with internal columns or shadow another rule
    names = [name for name, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__dq_{i}")
        for i, (_name, cond) in enumerate(rules)
    ]
    row = df.agg(F.count(F.lit(1)).cast("long").alias("__dq_total"), *aggs)
    stacked = row.select(
        "__dq_total",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"), F.col(f"__dq_{i}").alias("violations")
                    )
                    for i, name in enumerate(names)
                ]
            )
        ).alias("_r"),
    )
    return stacked.select(
        F.col("_r.rule").alias("rule"),
        F.col("_r.violations").alias("violations"),
        F.col("__dq_total").alias("total_rows"),
        (F.col("_r.violations") / F.col("__dq_total")).alias("violation_rate"),
    )


def orphan_count(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Referential integrity: fact rows whose key has no dimension match
    (left ANTI join — only the key column shuffles; for genuinely
    dimension-sized right sides Spark broadcasts it)."""
    orphans = fact.select(F.col(fact_key)).join(
        dim.select(F.col(dim_key).alias(fact_key)), fact_key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("orphans"))


def observed(df, name: str, *aggs):
    """Attach in-flight DQ counters (Spark ``Observation``): the metrics
    accumulate DURING whatever action consumes ``df`` — row counts, null
    tallies, sum checks — without a second scan of the data. The 100 TB
    use: every pipeline stage reports its own audit numbers for free
    instead of re-reading the input to count it.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` after an action has run."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *aggs), obs
