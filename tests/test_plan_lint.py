"""Fleet-wide physical-plan lint over EVERY registered query.

tests/test_plan_shapes.py asserts specific optimizations on specific
queries; this file is the safety net for the rest: no declared query may
silently plan a Cartesian product or an un-asked-for nested-loop join —
the two shapes that are fine at sf0.001 and fatal at 100 TB. Queries
whose SEMANTICS are a cross/theta join are whitelisted explicitly, so a
regression elsewhere (e.g. a lost equi-key turning a hash join into
BNLJ) fails loudly.

Plan text is matched on physical node names only (toString truncates
long argument lists — never match full arg strings).
"""

from __future__ import annotations

import pytest

from bigquery_etl_spark.registry import all_queries

QUERIES = all_queries()

# Queries whose semantics genuinely require a non-equi or cross join.
NON_EQUI_OK = {
    "q_join_cross",       # B16: explicit CROSS JOIN
    "q_join_range",       # B17: theta join is the operator under test
    "q_interval_overlap", # B19 unoptimized twin (optimized = q_range_bucket_join)
    "q_tpch_q22",         # scalar-subquery threshold -> BNLJ on 1-row side
    "q_tpch_q11",         # same single-row threshold shape
    "q_tpch_q17",         # correlated avg decorrelates; tiny side may BNLJ
    "q_subquery_scalar",  # scalar subquery broadcast
    "q_values_inline",    # inline VALUES cross with 1-row aggregates
    "q_tfidf",            # 1-row n_docs crossJoin (explicit broadcast)
    "q_ml_tfidf",         # same shape from the r12 statement rewrite:
                          # CROSS JOIN of the 1-row corpus-count
                          # aggregate (__tfn) into the per-term scores
    "q_ml_idf",           # r13: identical 1-row __tfn cross (the
                          # df-only leg of the same rewrite)
    "q_quality_score",    # corpus-constant quantile thresholds (1-row cross)
    "q_doc_fingerprint",  # corpus-constant join
    "q_embed_topk",       # brute-force topk: query side broadcast NLJ by design
    "q_hybrid_search",    # vector leg: 3-row query side crossed with corpus
    "q_embed_ann_ivf",    # centroid assignment crosses the tiny centroid set
    "q_embed_ann_ivf_indexed",  # same bounded Q=5 exact-recall leg as q_embed_ann_ivf;
                                # the index-side probe join itself is a BroadcastHashJoin
                                # with PartitionFilters pruning (pinned in test_plan_shapes)
    "q_embed_ann_lsh",
    "q_incremental_agg",  # 1-row high-watermark threshold
    "q_sample",           # TABLESAMPLE percentage literal
    "q_dq_report",        # three 1-row check summaries cross-joined
    "q_dedup_minhash_check",  # two 1-row invariant summaries cross-joined
    # r3 invariant-twin reductions: each crosses 1-row aggregate
    # summaries (count/min/max of the whole run) — constant-size sides.
    "q_dedup_minhash",
    "q_dedup_minhash_pairs",
    "q_dedup_simhash",
    "q_perplexity",       # 1-row corpus-total broadcast into the vocab
    "q_sample_diverse",   # 1-row invariant summaries cross-joined
    "q_dedup_incremental",  # four 1-row invariant summaries cross-joined
    "q_dedup_minhash_recall_near",  # two 1-row recall summaries cross-joined
    "q_drift_psi",        # (group × bin) grid: categorical groups × 10 bins
    # r9 collect-folds: per-run scalar collects folded into the returned
    # plan as 1-row aggregate crossJoins (same pattern as q_tfidf).
    "q_ml_logreg",        # 1-row feature-stats aggregate cross
    "q_ml_mf",            # 1-row global-mean aggregate cross
    "q_ml_boosted",       # 1-row base-score aggregate cross
    "q_ml_transform",     # 1-row error/evaluate summaries crossed (r10)
    "q_ml_inspect",       # five 1-row invariant summaries crossed (r10)
    "q_ml_anomaly",       # two 1-row invariant summaries crossed (r10)
    "q_ml_split_explain", # four 1-row invariant summaries crossed (r10)
    "q_ml_categorical",   # four 1-row invariant summaries crossed (r10)
    "q_ml_explain_tree",  # 1-row TreeSHAP summary × 1-row global-explain
    "q_ml_forest",        # 1-row eval summaries cross (q_ml_boosted shape)
    "q_ml_kmeans_eval",   # 1-row metrics frame cross (q_ml_boosted shape)
                          # summary crossed (r11, same pattern)
}

# Streaming / source / pipeline queries that cannot build a pure batch
# plan from (spark, sf_dir) without side effects are still linted — they
# return DataFrames — but a few need live services; none currently skip.


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cartesian(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [
        node
        for node in ("CartesianProduct", "BroadcastNestedLoopJoin")
        if node in plan
    ]
    if name in NON_EQUI_OK:
        return  # shape is the query's semantics; nothing to assert
    assert not bad, (
        f"{name}: unexpected {bad} in physical plan — an equi-key was "
        f"probably lost (fine at test SF, quadratic at scale)"
    )
