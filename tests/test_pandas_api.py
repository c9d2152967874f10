"""pandas-API-on-Spark surface (SURVEY.md §8 gap).

The pandas API is a front-end over the same Catalyst plans — these tests
pin that equivalence: each pandas-API result must equal the DataFrame-API
result on the same fixture. That makes the surface safe to offer (a user
of the reference's BigQuery tables who thinks in pandas gets distributed
plans, not a driver-side pandas)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.sources import load

ps = pytest.importorskip("pyspark.pandas")
warnings.filterwarnings("ignore", category=FutureWarning)


@pytest.fixture(scope="module")
def orders_ps(spark, sf_dir):
    return ps.read_parquet(f"{sf_dir}/orders.parquet")


def test_groupby_sum_matches_dataframe_api(spark, sf_dir, orders_ps):
    got = orders_ps.groupby("o_orderpriority")["o_totalprice"].sum().sort_index()
    want = {
        r["o_orderpriority"]: r["s"]
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert set(got.index.to_list()) == set(want)
    for k, v in got.items():
        assert v == pytest.approx(want[k], rel=1e-12)


def test_merge_matches_join(spark, sf_dir, orders_ps):
    cust = ps.read_parquet(f"{sf_dir}/customer.parquet")
    merged = orders_ps.merge(cust, left_on="o_custkey", right_on="c_custkey")
    want = (
        load(spark, sf_dir, "orders")
        .join(load(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    assert merged.shape[0] == want


def test_to_spark_roundtrip_stays_lazy_and_distributed(spark, sf_dir, orders_ps):
    """to_spark() hands back the underlying plan — converting must not
    collect to the driver (the plan still reads the parquet scan)."""
    sdf = orders_ps[orders_ps["o_totalprice"] > 100_000].to_spark()
    plan = sdf._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" in plan  # still a scan-rooted plan, not a LocalRelation
    assert sdf.count() == load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100_000).count()


def test_pandas_api_on_existing_dataframe(spark, sf_dir):
    """DataFrame.pandas_api(): switch surface mid-pipeline without a
    materialization boundary."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    pdf = li.pandas_api()
    assert int(pdf["l_quantity"].sum()) == int(
        li.agg(F.sum("l_quantity")).collect()[0][0]
    )


def test_value_counts_and_describe(spark, sf_dir, orders_ps):
    vc = orders_ps["o_orderstatus"].value_counts()
    want = {
        r["o_orderstatus"]: r["c"]
        for r in load(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(F.count("*").alias("c")).collect()
    }
    assert vc.to_dict() == want
