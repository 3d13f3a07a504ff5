#!/usr/bin/env python
"""Weak-scaling stress: replicate sf0.1 into N key-shifted copies (a
~sfN/10 database of IDENTICAL relational structure — every copy's keys
are disjoint, so joins stay 1:1-shaped and query outputs scale linearly)
and time representative headline queries at each decade.

This is the measured backing for the PLANS.md scaling claim: a plan
whose wall clock grows ~sublinearly per 10x rows on local[32] has no
hidden driver bottleneck or quadratic join — the same property the
1000-executor deployment needs.

Usage: python tools/scale_stress.py [copies] [out_dir]
       (defaults: 10 copies -> /tmp/spark_graft_scale10)
Writes one JSON line: {"copies": N, "queries": {name: sec}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from etl_dashboard_project_1_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key columns to shift per copy (disjoint id spaces keep every join's
# selectivity identical to the original database)
SHIFT_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# representative set: scan-agg, 3-way broadcast join, user-keyed window,
# dedup groupBy, pure-expression text, vector top-k.
# dedup_minhash_lsh is deliberately ABSENT: replicating texts fabricates
# 10 identical twins per document, so the candidate self-join's output
# grows quadratically in copies — a replication artifact, not a property
# of real 10x data (its real-data scaling is measured sf0.01 -> sf0.1 in
# PLANS.md). dedup_exact's per-fingerprint groups absorb the twins
# linearly, so it stands in for the dedup family here.
QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "sessionize_events",
    "dedup_exact",
    "text_quality",
    "sim_cosine_topk",
    # token-aggregation family: vocab stays constant under replication, so
    # these stress the explode + first-aggregate stage with linear input
    # growth (TV output is copy-invariant; novelty output grows linearly)
    "source_unigram_tv",
    "ngram_novelty",
    # bounded-intermediate family: histogram / vocab / dim² Gram stay
    # constant under replication — these stress the corpus-reduce stage
    "winsorize_event_values",
    "bpe_merge_candidates",
    "emb_pca_variance_gate",
    # retrieval/eval family (r4): every query set is FIXED (vec_id/doc_id
    # below a small constant — only copy 0 qualifies after key shifting),
    # so replication grows the corpus side 10x while the request side
    # stays constant: the exact asymmetry the broadcast-probe scale shape
    # claims to handle. inverted_index stresses the one (token, doc)
    # shuffle with capped posting assembly (replicated twins saturate the
    # >=2-docs filter, so its output grows with the vocabulary, not rows).
    "bm25_retrieval_topk",
    "retrieval_rrf_fusion",
    "ann_recall_eval",
    "retrieval_mrr_eval",
    "inverted_index_build",
    "contrastive_hard_negatives",
    # r4 capstones. The pair-based capstones (estimate gate, soft dedup,
    # verdict) are ABSENT for the same replication-artifact reason as
    # dedup_minhash_lsh: replicated twins fabricate quadratic pair growth
    # that real 10x data doesn't have. These three are reduce-shaped:
    "corpus_datacard",
    "vocab_roundtrip_gate",
    "stream_incremental_stats",
    # r5 members. Key shifting gives disjoint users/customers, so the
    # user-keyed windows (drawdown, interval join) and the global
    # range-partitioned rank (gini) weak-scale 1:1; the domain-bounded
    # reducers (KS value domain, backlog calendar, KMV sketches) hold
    # their intermediate size constant while input grows; the kNN eval
    # batch stays 64 by construction while its corpus side grows 10x.
    "skyline_pareto_parts",
    "ks_value_drift_gate",
    "revenue_gini",
    "max_drawdown_user",
    "order_backlog_daily",
    "kmv_intersection_estimate",
    "emb_knn_eval",
    "interval_overlap_join",
    # r6 members. Same taxonomy: user/customer/segment-keyed reducers and
    # windows weak-scale 1:1 under disjoint key shifting (rfm, target
    # encode, asof, twap, halflife); domain-bounded reducers hold their
    # intermediate constant (contingency's |types|x7 grid, ols's calendar
    # days, quota's |sources| rows, threshold sweep's score histogram,
    # conformal's distinct-residual grid, class weights' |langs| rows,
    # bootstrap's B=32 resample frame); the fixed-request retrieval/ANN
    # evals (ndcg, ivf gate, rbm — query sets pinned to copy-0 ids or a
    # fixed md5-chosen 64) grow only their corpus side; decile lift's
    # global rank rides the range-partitioned dense_ids_by.
    "ols_daily_trend_by_type",
    "quota_largest_remainder",
    "rfm_segments",
    "target_encode_loo",
    "contingency_association",
    "asof_nearest_event",
    "twap_daily_value",
    "retrieval_ndcg_eval",
    "score_decile_lift",
    "threshold_sweep_pr",
    "ann_ivf_recall_gate",
    "reciprocal_best_match",
    "bootstrap_ci_mean",
    "conformal_quantile_gate",
    "halflife_decay_user_value",
    "class_weight_table",
    # r7-queue members. isotonic/cv/dp collapse to grid/fold/cell frames
    # in one aggregate (domain-bounded intermediates); curriculum's rank
    # is the range-partitioned dense_ids_by; churn's self-join is
    # composite-key equi (disjoint user spaces weak-scale 1:1).
    "isotonic_calibration",
    "curriculum_interleave",
    "churn_jaccard_daily",
    "dp_noisy_counts",
    "cv_fold_scores",
    # r7 wave 2: both collapse to domain-bounded frames (distinct-cents
    # value domain / calendar days) in one aggregate.
    "mann_whitney_value_test",
    "sprt_conversion_monitor",
    # r7 wave 2 (cont.): rbo's per-day top-10 window weak-scales on the
    # day partitioning and its tail joins are |days|x10-bounded; cuped is
    # two per-user aggregates plus a 1-row pooled-moment broadcast.
    "rbo_leaderboard_drift",
    "cuped_adjusted_ab",
    # wave-8 members. did/survival/cuped-class reducers (one aggregate /
    # per-user agg + bounded frames); acf/stump/l-div/padding/fertility
    # collapse to calendar/grid/QI/bucket/lang-bounded frames;
    # repetition is pure map-side (output grows linearly); SNM's
    # candidate set is W·n by construction (replicated twins sort
    # adjacently but the window is fixed). dedup_levenshtein_blocked is
    # deliberately ABSENT for the minhash replication-artifact reason:
    # key-shifted copies are textual TWINS, so every block gains
    # `copies` identical members and the pair count inside each block
    # grows quadratically until the LEV_MAX_BLOCK guard drops it — a
    # replication artifact, not a property of real 10x data (its
    # real-data scaling is measured sf0.01 -> sf0.1 in PLANS.md).
    "did_cohort_effect",
    "survival_hazard_daily",
    "acf_daily_revenue",
    "decision_stump_gini",
    "l_diversity_audit",
    "dedup_sorted_neighborhood",
    "padding_waste_audit",
    "tokenizer_fertility_by_lang",
    "text_repetition_audit",
    # wave-9 members. cms's 256-cell sketch and the pinball/theilsen
    # cents/day domains are bounded intermediates; ece's grids are
    # ≤61 bins; theilsen's pair frame is calendar-constant under
    # replication (same days, 10x the per-day totals).
    "cms_heavy_hitters",
    "quantile_loss_eval",
    "ece_calibration_eval",
    "theil_sen_trend",
    # wave-10 members. hhi/ltv are key-partitioned reducers (disjoint
    # customer/user spaces weak-scale 1:1); bloom's bitmap and word
    # table are config-sized while members/probes grow; systematic
    # rides dense_ids_by; overdispersion is one moment aggregate.
    "hhi_market_concentration",
    "bloom_fpr_audit",
    "sample_systematic_every_k",
    "ltv_cohort_curve",
    "overdispersion_check",
    # wave-11 members. gsq reduces to a user-keyed aggregate then ≤K-row
    # frames; walloc is one stratum-partitioned rank over a |strata|-row
    # allocation; kll is two full scans around a capacity-bounded sketch.
    "group_sequential_obf",
    "sample_weighted_allocation",
    "kll_quantile_gate",
    # wave-12 members. ipw/power are user-keyed reducers to bounded
    # frames; trimmed mean windows the distinct-cents domain; kappa
    # reduces to the |langs|² confusion frame.
    "ipw_ate_estimate",
    "trimmed_mean_value",
    "langid_kappa_eval",
    "ab_power_mde",
    # wave-13 members. cusum folds the calendar-bounded day frame;
    # balance/eb are keyed reducers; transition is one lag window to a
    # |types|² frame.
    "cusum_revenue_drift",
    "ab_covariate_balance",
    "session_transition_surprisal",
    "eb_shrunken_group_means",
    # r8 re-certs: the logprob pair's integer floor-log2 rewrite changed
    # the aggregate expressions — re-measure the vocab-join shape.
    "text_unigram_logprob",
    "text_bigram_logprob",
    # wave-14 members. t-closeness/fairness are keyed reducers to
    # QI-class / |langs| frames (nation shifting grows the class frame
    # linearly, still dimension-sized); logrank is a per-user aggregate
    # to the calendar-bounded duration frame; changepoint folds the
    # day frame. kendall's pair frame is |nations|² — quadratic in the
    # leaderboard DIMENSION by definition (not a replication artifact:
    # 10x nations really is 100x pairs), bounded in practice because
    # leaderboard entities are a dimension, not data.
    "t_closeness_audit",
    "fairness_keep_rate_audit",
    "kendall_tau_leaderboards",
    "logrank_survival_test",
    "changepoint_mean_shift",
    # wave-15 members. chao1 rides the (source, token) vocab shuffle
    # (constant vocabulary under replication — the tfidf class);
    # kruskal reduces to the distinct-cents × |types| frame; mcnemar is
    # one map-side scan to a 1-row aggregate; silhouette's fit/probe is
    # the centroid-classifier shape (label×dim moments + map-only
    # scoring scan).
    "chao1_vocab_richness",
    "kruskal_wallis_value_by_type",
    "mcnemar_langid_test",
    "emb_silhouette_eval",
    # wave-16 members. mann-kendall/runs fold the calendar-bounded day
    # frame (pair frame is |days|², calendar-constant under
    # replication); brier is one user-keyed aggregate to ≤~40 ilog2
    # bins (the ipw class).
    "mann_kendall_trend",
    "runs_test_daily_revenue",
    "brier_decomposition_eval",
    # kcore: the co-purchase self-join is basket-bounded per order and
    # the peel is O(KCORE_PEELS) degree windows over the shrinking edge
    # set — disjoint key-shifted copies peel independently at the same
    # depth, so rounds stay constant while edges grow linearly.
    "kcore_copurchase",
    # wave-17 members. cochran-armitage is one user-keyed aggregate to
    # the ilog2-bin frame (the ipw/brier class); durbin-watson folds
    # the calendar-bounded day frame.
    "cochran_armitage_trend",
    "durbin_watson_forecast_errors",
    # benford re-cert: the |x| digit rewrite keeps the one 9-group
    # aggregate; re-measure the digit-extraction map.
    "benford_first_digit_audit",
    # r9 addition. bh_fdr is one broadcast-joined nationkey aggregate
    # (disjoint nation shifting grows the test family linearly — 10x
    # nations is 10x tests, still a dimension-sized frame for the BH
    # windows).
    "bh_fdr_keep_set",
    # r9 --bigmoney re-certs: the decimal(38,0) quadratic-moment
    # rewrites changed the aggregate expressions — re-measure the
    # day-frame window (rolling corr) after the fix (theil_sen and
    # cuped are already members above).
    "rolling_corr_daily",
]


# optional comma-separated subset (big decades: run the shuffle-heavy +
# CPU-bound representatives without paying for the whole list)
_SUBSET = os.environ.get("SPARK_GRAFT_STRESS_QUERIES")
if _SUBSET:
    keep = {s.strip() for s in _SUBSET.split(",") if s.strip()}
    QUERIES = [q for q in QUERIES if q in keep]


def build(spark, copies: int, out_dir: str) -> None:
    for table, keys in SHIFT_KEYS.items():
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        # shift each key by copy_i * 10^9: far above any real key, so the
        # copies' id spaces never collide
        parts = []
        for i in range(copies):
            df = src
            for k in keys:
                df = df.withColumn(k, (F.col(k) + F.lit(i * 1_000_000_000)).cast("long"))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_scale{copies}"
    spark = get_spark(app_name="scale_stress")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(out_dir, "_BUILT")):
        build(spark, copies, out_dir)
        open(os.path.join(out_dir, "_BUILT"), "w").write("ok")
    registry = entrymod.queries()
    timings = {}
    for name in QUERIES:
        fn = registry[name]
        fn(spark, out_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, out_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    print(json.dumps({"copies": copies, "src_sf": 0.1, "queries": timings}))


if __name__ == "__main__":
    main()
