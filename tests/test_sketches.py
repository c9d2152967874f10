"""HLL sketch semantics: merge-equals-rescan, accuracy, batch folding."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_etl_spark.operators.sketches import distinct_sketch, estimate, merge_sketches
from bigquery_etl_spark.sources import load


def test_merged_sketch_equals_single_shot(spark, sf_dir):
    """Union of per-(type) sketches re-merged to global == sketch built
    in one pass — HLL union is lossless over registers."""
    e = load(spark, sf_dir, "events")
    per_type = distinct_sketch(e, ["event_type"], "user_id")
    merged = estimate(merge_sketches(per_type, []), "est").collect()[0].est
    single = estimate(distinct_sketch(e, [], "user_id"), "est").collect()[0].est
    assert merged == single


def test_estimate_accuracy_vs_exact(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    exact = e.select("user_id").distinct().count()
    est = estimate(distinct_sketch(e, [], "user_id"), "est").collect()[0].est
    assert abs(est - exact) <= max(2, 0.05 * exact)  # lg_k=12 → ~1.6% rse


def test_incremental_batches_fold_into_same_answer(spark, sf_dir):
    """Three disjoint micro-batches sketched independently then merged ==
    sketching the whole table — the incremental-maintenance contract
    (no rescan of old batches)."""
    e = load(spark, sf_dir, "events")
    batches = [
        distinct_sketch(e.filter(F.col("event_id") % 3 == i), ["event_type"], "user_id")
        for i in range(3)
    ]
    folded = merge_sketches(batches[0].union(batches[1]).union(batches[2]), ["event_type"])
    whole = distinct_sketch(e, ["event_type"], "user_id")
    got = {r.event_type: r.est for r in estimate(folded, "est").collect()}
    want = {r.event_type: r.est for r in estimate(whole, "est").collect()}
    assert got == want


def test_cms_build_query_merge(spark):
    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.sketches import (
        cms_build,
        cms_merge,
        cms_query,
    )

    a = spark.range(1000).select((F.col("id") % 10).alias("k"))   # each k: 100
    b = spark.range(500).select((F.col("id") % 5).alias("k"))     # k<5: +100
    probe = spark.range(10).select(F.col("id").alias("k"))

    est_a = {r.k: r.est for r in cms_query(cms_build(a, "k"), probe, "k").collect()}
    assert all(est_a[k] >= 100 for k in range(10))  # never underestimates

    merged = cms_merge(cms_build(a, "k"), cms_build(b, "k"))
    direct = cms_build(a.unionAll(b), "k")
    # merge == rebuild over the union, cell for cell
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est_m = {r.k: r.est for r in cms_query(merged, probe, "k").collect()}
    for k in range(10):
        true = 200 if k < 5 else 100
        assert est_m[k] >= true
        assert est_m[k] <= true + 4 * 1500 / 1024 + 1

    # absent key estimates (near) zero: bounded by collision mass only
    ghost = spark.range(1).select(F.lit(10_000_000).alias("k"))
    est_g = cms_query(merged, ghost, "k").collect()[0].est
    assert est_g <= 4 * 1500 / 1024 + 1
