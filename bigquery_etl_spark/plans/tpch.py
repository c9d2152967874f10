"""TPC-H-style analytic queries adapted to the fixture columns — the
classic multi-join + aggregate shapes the reference's consumers would
run in BigQuery over warehouse tables. These are also the bench
headliners that exercise join ordering, broadcast selection, and
partial aggregation together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.plans._util import cents, dec, lsum
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# Q3-style: top unshipped-revenue orders for one segment.


@query(
    "q_tpch_q3",
    sql="""
    SELECT o_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "flagship"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape: selective dim filter → two fact joins →
    agg → top-k. The c_mktsegment filter prunes customer before the
    join (predicate pushdown), and sort+limit plans as
    TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp")
    )
    # Integer-cents fast path (plans/_util.lsum): groups are per-ORDER
    # (<= 7 lineitems each, bounded at every scale factor), so the e4
    # fixed-point sum can never leave int64.
    #
    # Join order: join the segment-filtered customer into orders, then
    # stream lineitem against the assembled order side. Written
    # customer-first, the static planner picked lineitem as the orderkey
    # join's build side (a 34MB broadcast of the filtered FACT at sf0.1 —
    # unbounded at scale). No broadcast hints anywhere: every input here
    # is SF-proportional, so the size estimator broadcasts while small
    # and sort-merge is the 100 TB plan.
    revenue_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    order_side = o.join(c, o.o_custkey == c.c_custkey)
    return (
        li.join(order_side, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(lsum(revenue_e4, "revenue", scale=10_000))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# Q5-style: revenue by nation where customer and supplier share a nation.


@query(
    "q_tpch_q5",
    sql="""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
               / 10000 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
    GROUP BY n_name
    """,
    tags=("tpch", "join"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume shape: 6-table join with a same-nation
    constraint. Fact-first join order: lineitem streams against
    broadcast dims (supplier → nation → region-filtered), which prunes
    it to the target region's suppliers BEFORE the orderkey join — a
    semi-join reduction that cuts the big join's input ~5x. The fact
    table is never a build side: parquet file-size estimates once led
    the planner to broadcast 600k-row lineitem instead of the 24k-row
    assembled order side (profiled at sf0.1); with lineitem as the
    left spine, AQE's runtime sizes pick the genuinely smaller side
    here, and at 100 TB the same plan degrades to sort-merge on the
    orderkey — correct at both scales."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # exact integer-cents product (same pattern as q3), summed as
    # DECIMAL(38,0): bit-identical to DuckDB's HUGEINT sum under the
    # final double cast, and — unlike a bigint sum — safe for these
    # UNBOUNDED per-nation groups at 100 TB (r4: the decimal(18,6)
    # product pattern rounded at different scales in the two engines
    # and drifted the strict value hash at the 9th decimal)
    revenue_e4 = (
        cents("l_extendedprice") * (100 - cents("l_discount"))
    ).cast("decimal(38,0)")
    # nation/region are constant-size dims -> hinted broadcasts. supplier
    # SCALES with SF, so it gets no hint: the size estimator broadcasts
    # it while it fits and falls back to shuffle join when it doesn't.
    li_side = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    order_side = o.join(c, o.o_custkey == c.c_custkey)
    return (
        li_side.join(
            order_side,
            (li.l_orderkey == o.o_orderkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg((F.sum(revenue_e4).cast("double") / 10000).alias("revenue"))
    )


# Q6-style: forecast revenue change (pure scan-filter-agg).


@query(
    "q_tpch_q6",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "scan"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure pushdown benchmark: every predicate reaches the parquet
    scan; the whole query is scan → partial sum → final sum."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(dec("l_extendedprice") * dec("l_discount"))).cast("double").alias("revenue"))
    )


# Q10-style: returned-item losses per customer.


@query(
    "q_tpch_q10",
    sql="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    # per-CUSTOMER groups: bounded, integer-cents sum safe at any SF
    revenue_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(lsum(revenue_e4, "revenue", scale=10_000))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# Q7-style: trade volume between nation pairs.


@query(
    "q_tpch_q7",
    sql="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume: the two nation dims join twice under
    different roles (self-join of a broadcast dim) — alias hygiene test
    for the planner and the API."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# Q8-style: market share of one nation within a region.


@query(
    "q_tpch_q8",
    sql="""
    SELECT l_year,
           ROUND(CAST(SUM(CAST(volume AS DECIMAL(18,6))) FILTER (WHERE supp_nation = 'BRAZIL') AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
    )
    GROUP BY l_year
    """,
    tags=("tpch", "join"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: conditional share within a region-filtered
    multi-join (volume computed in double pre-aggregation, summed in
    decimal for cross-engine stability)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("l_year"), vol.alias("volume"), "supp_nation")
    )
    return base.groupBy("l_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "BRAZIL", dec("volume"))).cast("double")
            / F.sum(dec("volume")).cast("double"),
            6,
        ).alias("mkt_share")
    )
