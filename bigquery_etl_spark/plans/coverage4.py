"""Fourth coverage pack: SELECT * EXCEPT/REPLACE, sampling,
width_bucket, and two more TPC-H shapes (Q14/Q18 adaptations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.plans._util import dec
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# SELECT * EXCEPT / REPLACE (BigQuery idiom) — drop/withColumn form.
# ---------------------------------------------------------------------------


@query(
    "q_select_except",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice * 1.07, 4) AS o_totalprice, o_orderpriority
    FROM orders
    """,
    tags=("project",),
)
def q_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(o_orderdate) REPLACE(price*1.07 AS o_totalprice):
    drop + withColumn keep the rest of the schema without enumerating
    it — resilient to upstream column additions."""
    o = load(spark, sf_dir, "orders")
    return o.drop("o_orderdate").withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.07, 4)
    )


# ---------------------------------------------------------------------------
# TABLESAMPLE — rows-only (sampling is engine-specific even when seeded).
# ---------------------------------------------------------------------------


@query("q_sample", sql="SELECT TRUE AS sample_within_bounds", tags=("scan", "approx"), twin="invariant")
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample. At scale sampling happens AT THE SCAN
    (per row-group) — free data reduction for estimation queries.

    Driver-checkable bound form: the sampled row set is engine- and
    layout-specific, so the query asserts |n_sampled - 0.1*N| is within
    max(5% of expectation, 5*sigma) for Binomial(N, 0.1) — the sigma
    floor keeps the bound meaningful at tiny SFs where 5% of the
    expectation is under 2 sigma — and emits the boolean; the twin
    emits TRUE."""
    li = load(spark, sf_dir, "lineitem")
    n_samp = (
        li.sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n_samp"))
    )
    n_total = li.agg(F.count(F.lit(1)).alias("n_total"))
    expect = 0.1 * F.col("n_total")
    bound = F.greatest(0.05 * expect, 5 * F.sqrt(expect * 0.9))
    return n_samp.crossJoin(n_total).select(
        (F.abs(F.col("n_samp") - expect) <= bound).alias("sample_within_bounds")
    )


# ---------------------------------------------------------------------------
# width_bucket — histogram bucketing.
# ---------------------------------------------------------------------------


@query(
    "q_width_bucket",
    sql="""
    SELECT CAST(1 + FLOOR((LEAST(GREATEST(o_totalprice, 0), 499999.999) - 0) / (500000.0 / 20)) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def q_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (the oracle spells out the
    same arithmetic — DuckDB's width_bucket differs on edge handling)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(
                F.least(F.greatest(F.col("o_totalprice"), F.lit(0.0)), F.lit(499999.999)),
                F.lit(0.0),
                F.lit(500000.0),
                F.lit(20),
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14-style: promotion revenue share.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q14",
    sql="""
    SELECT ROUND(
             100.0 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))))
                          FILTER (WHERE p_type = 'PROMO') AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("tpch", "join"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect shape: conditional share of revenue, fact ⋈
    broadcast(part), single aggregate row."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", revenue)).cast("double")
                / F.sum(revenue).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18-style: large-volume customers (join on a HAVING subquery).
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q18",
    sql="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 120
    )
    GROUP BY c_custkey, c_name, o_orderkey
    """,
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-order customers: IN over a grouped HAVING subquery (planned
    as agg → semi join), then a 3-table join + aggregate."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "big_key"), F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
    )
