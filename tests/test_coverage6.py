"""Unit checks for the sixth coverage pack (beyond the oracle parity
that tests/test_oracle_parity.py already runs for each declared query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_etl_spark.plans.coverage6 import q_regr_agg
from bigquery_etl_spark.sources import load

from tests.conftest import SF_DIR


def test_regr_moments_match_spark_builtins(spark):
    """The decimal-moment closed form in q_regr_agg must agree with
    Spark's own regr_slope/regr_intercept/regr_r2 (the builtins are the
    declared operator; the closed form exists only for cross-engine hash
    stability)."""
    li = load(spark, SF_DIR, "lineitem")
    builtin = (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_slope("l_extendedprice", "l_quantity").alias("slope"),
            F.regr_intercept("l_extendedprice", "l_quantity").alias("intercept"),
            F.regr_r2("l_extendedprice", "l_quantity").alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("regr_count"),
        )
        .collect()
    )
    manual = {r.l_returnflag: r for r in q_regr_agg(spark, SF_DIR).collect()}
    assert len(builtin) == len(manual) > 0
    for b in builtin:
        m = manual[b.l_returnflag]
        assert m.regr_count == b.regr_count
        # manual values are round(x, 4) — agree to half an ulp of that grid
        assert abs(m.slope - b.slope) <= 5e-5
        assert abs(m.intercept - b.intercept) <= 5e-5
        assert abs(m.r2 - b.r2) <= 5e-5


def test_try_ops_null_semantics(spark):
    """SAFE.* analogues return NULL, not errors, under ANSI mode."""
    df = spark.range(1).select(
        F.lit("Brand#13").try_cast("int").alias("bad_cast"),
        F.try_divide(F.lit(1.0), F.lit(0.0)).alias("div0"),
        F.try_element_at(F.array(F.lit(1)), F.lit(9)).alias("oob"),
    )
    row = df.collect()[0]
    assert row.bad_cast is None and row.div0 is None and row.oob is None


def test_variant_typed_access(spark):
    """VARIANT round-trip: parse_json → variant_get preserves typed values
    and schema_of_variant sees the object shape."""
    df = spark.createDataFrame(
        [('{"k": 7, "tags": ["a", "b"]}',)], "props string"
    ).select(F.parse_json("props").alias("v"))
    out = df.select(
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.variant_get("v", "$.tags[1]", "string").alias("t1"),
        F.schema_of_variant(F.col("v")).alias("sch"),
    ).collect()[0]
    assert out.k == 7 and out.t1 == "b"
    assert "tags" in out.sch


def test_gen_array_spine_has_no_gaps(spark):
    """The calendar spine emits every month in [1995-01, 2001-12] even
    where orders has no rows (gap-fill contract)."""
    from bigquery_etl_spark.plans.coverage6 import q_gen_array

    rows = q_gen_array(spark, SF_DIR).collect()
    assert len(rows) == 84
    assert all(r.n_orders >= 0 for r in rows)
