"""Unit tests for operators/dq.py (expectation suite semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.operators.dq import (
    assert_that,
    duplicate_keys,
    orphan_rows,
    violations,
)


def test_violations_counts_nulls_as_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double"
    )
    row = violations(df, {"v_positive": F.col("v") > 0}).collect()[0]
    assert row.v_positive == 2  # NULL and -5 both violate


def test_assert_that_raises_with_message(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    assert_that(df, F.col("id") > 0, "ids positive")  # passes
    with pytest.raises(AssertionError, match="ids unique-ish"):
        assert_that(df, F.col("id") > 1, "ids unique-ish")


def test_duplicate_and_orphan_helpers(spark):
    child = spark.createDataFrame([(1, 1), (2, 1), (2, 2), (9, 3)], "k long, sub long")
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    dups = duplicate_keys(child, ["k"]).collect()
    assert [(r.k, r.n) for r in dups] == [(2, 2)]
    orphans = orphan_rows(child, parent, [("k", "k")]).collect()
    assert {r.k for r in orphans} == {9}


def test_psi_drift_identical_and_shifted(spark):
    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.dq import psi_drift

    base = spark.range(1000).select(
        F.lit("g").alias("grp"), (F.col("id") % 100).cast("double").alias("v")
    )
    # identical distributions -> PSI == 0 exactly (terms all snap to 0)
    out = psi_drift(base, base, "v", ["grp"], lo=0.0, width=10.0).collect()
    assert len(out) == 1 and out[0].psi == 0.0
    assert out[0].n_a == 1000 and out[0].n_b == 1000

    # hard shift: all mass moves to the top bin -> large positive PSI
    shifted = base.withColumn("v", F.lit(99.0))
    psi = psi_drift(base, shifted, "v", ["grp"], lo=0.0, width=10.0).collect()[0].psi
    assert psi > 0.25  # "distribution shifted" by the standard rule

    # symmetric: PSI(a,b) == PSI(b,a) (the formula is antisymmetric in
    # (p-q) AND ln(p/q), so the product is symmetric)
    psi_rev = psi_drift(shifted, base, "v", ["grp"], lo=0.0, width=10.0).collect()[0].psi
    assert abs(psi - psi_rev) < 1e-9


def test_psi_drift_null_group_not_zeroed(spark):
    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.dq import psi_drift

    # NULL-group mass fully shifts bins between slices: must report a
    # large PSI with the true row counts, not a zeroed phantom row
    a = spark.range(100).select(
        F.lit(None).cast("string").alias("grp"), F.lit(5.0).alias("v")
    )
    b = spark.range(100).select(
        F.lit(None).cast("string").alias("grp"), F.lit(95.0).alias("v")
    )
    out = psi_drift(a, b, "v", ["grp"], lo=0.0, width=10.0).collect()
    assert len(out) == 1
    assert out[0].grp is None
    assert out[0].n_a == 100 and out[0].n_b == 100
    assert out[0].psi > 0.25


def test_psi_drift_sliced_matches_two_frame_form(spark):
    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.dq import psi_drift, psi_drift_sliced

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 100).cast("double").alias("v"),
        (F.col("id") < 1000).alias("early"),
    )
    two = psi_drift(
        df.filter("early"), df.filter("NOT early"), "v", ["grp"], 0.0, 10.0
    )
    one = psi_drift_sliced(
        df, F.col("early"), ~F.col("early"), "v", ["grp"], 0.0, 10.0
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))
    # single-scan claim: exactly one file/range scan in the plan
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 2, plan  # range scan + possible reuse


def test_psi_null_handling(spark):
    """ADVICE r3: NULL value rows are explicitly dropped by default
    (documented), and null_bin=True routes them to a dedicated bin so a
    NULL-rate shift moves the PSI."""
    from bigquery_etl_spark.operators.dq import psi_drift

    rows_a = [("g", float(i % 10) * 10.0) for i in range(100)]
    # slice b: same value distribution but 40% of rows went NULL
    rows_b = [("g", float(i % 10) * 10.0) for i in range(60)] + [
        ("g", None) for _ in range(40)
    ]
    a = spark.createDataFrame(rows_a, "grp string, v double")
    b = spark.createDataFrame(rows_b, "grp string, v double")

    # default: NULLs dropped -> identical binned distributions -> PSI ~ 0,
    # and n_b counts only the 60 binnable rows
    r = psi_drift(a, b, "v", ["grp"], lo=0.0, width=10.0).collect()[0]
    assert abs(r.psi) < 0.01 and (r.n_a, r.n_b) == (100, 60)

    # null_bin: the 40% NULL-rate shift is visible drift, totals exact
    r2 = psi_drift(a, b, "v", ["grp"], lo=0.0, width=10.0, null_bin=True).collect()[0]
    assert r2.psi > 0.25 and (r2.n_a, r2.n_b) == (100, 100)

    # with no NULLs anywhere, null_bin=True only widens smoothing
    r3 = psi_drift(a, a, "v", ["grp"], lo=0.0, width=10.0, null_bin=True).collect()[0]
    assert abs(r3.psi) < 1e-9
