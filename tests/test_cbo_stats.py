"""ANALYZE TABLE → catalog stats → CBO estimates (SURVEY.md §8 gap).

Proves the stats pipeline end-to-end: DDL writes stats into the catalog,
and with spark.sql.cbo.enabled Catalyst's optimized-plan row estimates
track the analyzed row counts (instead of file-size guesses)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.operators.stats import (
    analyze,
    catalog_stats,
    column_stats,
    plan_row_estimate,
)
from bigquery_etl_spark.sources import load


@pytest.fixture(scope="module")
def analyzed_tables(spark, sf_dir):
    load(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable("cbo_orders")
    load(spark, sf_dir, "customer").write.mode("overwrite").saveAsTable("cbo_customer")
    analyze(spark, "cbo_orders", columns=["o_custkey", "o_orderpriority"])
    analyze(spark, "cbo_customer", columns=["c_custkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_customer")


def test_table_stats_recorded(spark, analyzed_tables):
    stats = catalog_stats(spark, "cbo_orders")
    assert stats["rows"] == spark.table("cbo_orders").count()
    assert stats["bytes"] > 0


def test_column_ndv_recorded(spark, analyzed_tables):
    cs = column_stats(spark, "cbo_customer", "c_custkey")
    n = spark.table("cbo_customer").count()
    ndv = int(cs["distinct_count"])
    # NDV is HLL-approximate; key column => within 10% of row count.
    assert abs(ndv - n) <= 0.1 * n
    assert int(cs["num_nulls"]) == 0


def test_cbo_uses_rowcounts_in_plan(spark, analyzed_tables):
    """With CBO on, the optimized plan carries row-count estimates derived
    from the analyzed stats — scans report exact counts, and a filtered
    scan reports a reduced (selectivity-scaled) estimate."""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        base = plan_row_estimate(spark.table("cbo_orders"))
        assert base == spark.table("cbo_orders").count()
        filtered = plan_row_estimate(
            spark.table("cbo_orders").filter(F.col("o_orderpriority") == "1-URGENT")
        )
        assert filtered is not None and 0 < filtered < base
        joined = plan_row_estimate(
            spark.table("cbo_orders").join(
                spark.table("cbo_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
        )
        # FK join estimate should be near |orders|, not |orders|*|customer|.
        assert joined is not None and joined <= 2 * base
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
