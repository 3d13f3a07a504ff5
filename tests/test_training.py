"""Semantic tests for the round-4 training-pipeline wave — properties
the DuckDB oracle comparison can't express (determinism across runs,
permutation validity, fold exhaustiveness, plan arithmetic bounds)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_dashboard_project_1_spark.plans import training_queries as tq

SF = "/root/testdata/sf0.001"


def test_epoch_shuffle_is_a_permutation_and_decorrelated(spark):
    rows = tq.epoch_shuffle_order(spark, SF).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append((r["position"], r["doc_id"]))
    assert set(by_epoch) == {0, 1}
    orders = {}
    for ep, vals in by_epoch.items():
        positions = sorted(p for p, _ in vals)
        # contiguous 1..n positions — dense_ids_by produced a total order
        assert positions == list(range(1, len(positions) + 1))
        # each doc appears at most once per epoch
        docs = [d for _, d in vals]
        assert len(docs) == len(set(docs))
        orders[ep] = [d for _, d in sorted(vals)]
    # different epoch seeds => different orders (decorrelation)
    assert orders[0] != orders[1]


def test_epoch_shuffle_rerun_stable(spark):
    a = sorted(map(tuple, tq.epoch_shuffle_order(spark, SF).collect()))
    b = sorted(map(tuple, tq.epoch_shuffle_order(spark, SF).collect()))
    assert a == b


def test_kfold_assignment_exhaustive_and_balanced(spark):
    cells = tq.stratified_kfold_assign(spark, SF).collect()
    assert all(0 <= r["fold"] < tq.KFOLDS for r in cells)
    # per language, shares sum to ~10000 bp (integer division loses <KFOLDS bp)
    by_lang = {}
    for r in cells:
        by_lang.setdefault(r["lang"], 0)
        by_lang[r["lang"]] += r["share_bp"]
    for lang, total in by_lang.items():
        assert 10000 - tq.KFOLDS < total <= 10000, (lang, total)


def test_mixture_epoch_plan_arithmetic(spark):
    rows = tq.mixture_epoch_plan(spark, SF).collect()
    assert {r["source"] for r in rows} <= set(tq.MIX_WEIGHTS_BP)
    for r in rows:
        assert r["target_tokens"] == tq.TOKEN_BUDGET * r["weight_bp"] // 10000
        # epochs_needed is the exact ceiling of target/available
        eps = -(-r["target_tokens"] // r["available_tokens"])
        assert r["epochs_needed"] == eps
        # repeat factor consistent with the same ratio at x100
        assert r["repeats_x100"] == r["target_tokens"] * 100 // r["available_tokens"]


def test_cosine_hist_covers_neardup_counts(spark):
    """The histogram's mass at bins >= 0.40 must equal the registered
    near-dup query's pair count (same candidate generator, same cut)."""
    from etl_dashboard_project_1_spark.plans.extension_queries import (
        dedup_embedding_cosine)

    hist = {r["bin_lo_x100"]: r["n_pairs"] for r in tq.emb_pair_cosine_hist(spark, SF).collect()}
    above = sum(n for b, n in hist.items() if b >= 40)
    neardup = dedup_embedding_cosine(spark, SF).count()
    assert above == neardup


def test_source_matrix_counts_match_pair_list(spark):
    from etl_dashboard_project_1_spark.operators import dedup
    from etl_dashboard_project_1_spark.session import load_table

    docs = load_table(spark, SF, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.2)
    total_pairs = pairs.count()
    matrix = tq.dedup_source_matrix(spark, SF)
    assert matrix.agg(F.sum("n_pairs")).first()[0] == total_pairs
    # unordered normalization held
    assert matrix.filter(F.col("source_a") > F.col("source_b")).count() == 0


def test_upsert_resolve_guards(spark):
    """Misconfigured resolve modes must raise, not silently degrade to
    last-batch-wins (which would let stale batches clobber newer rows)."""
    import pytest

    from etl_dashboard_project_1_spark.streaming import jobs

    s = jobs.read_events_stream(spark, SF)
    with pytest.raises(ValueError, match="unknown resolve"):
        jobs.foreach_batch_upsert(s, "/tmp/never", key="user_id", resolve="max-order")
    with pytest.raises(ValueError, match="requires order_col"):
        jobs.foreach_batch_upsert(s, "/tmp/never", key="user_id", resolve="max_order")


def test_encoding_advisor_emits_rows_for_empty_tables(spark, tmp_path):
    """The fused shared-scan form must keep the per-column report row
    even when a source table is empty (ndv 0, NULL byte stats) — the
    UNION-ALL oracle and the old per-column form both do."""
    from etl_dashboard_project_1_spark.plans.profile_queries import (
        ENC_COLUMNS, column_encoding_advisor)

    for t in {table for _l, table, _c in ENC_COLUMNS}:
        (spark.read.parquet(f"{SF}/{t}.parquet").limit(0)
         .write.mode("overwrite").parquet(str(tmp_path / f"{t}.parquet")))
    rows = column_encoding_advisor(spark, str(tmp_path)).collect()
    assert len(rows) == len(ENC_COLUMNS)
    assert all(r["ndv"] == 0 and r["n_rows"] is None and r["code_bits"] == 1
               for r in rows)
