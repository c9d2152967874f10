"""Join operators (SURVEY.md §2 B11-B19).

The reference delegated joins to BigQuery; its own one "join" is the
per-event IPFS enrichment lookup (ref main.py:152, covered by
q_lookup_join in plans/pipeline_queries.py). Here: every BigQuery join
class as a declarative Spark plan. Catalyst picks the physical strategy
(broadcast / shuffle-hash / sort-merge); the hints below pin it only
where the right answer at 100 TB is unambiguous (small dims →
broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.operators.asof import asof_join
from bigquery_etl_spark.plans._util import dsum, dsum_sql
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B11 — inner equi-join, fact-to-fact (shuffle join; AQE may re-plan).
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    sql=f"""
    SELECT o_orderpriority,
           {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders on the natural key. At 100 TB both sides are big:
    a shuffle (sort-merge) join on l_orderkey/o_orderkey is correct, and
    co-partitioning both tables on orderkey at write time (bucketing)
    removes the shuffle entirely — see sinks.write_bucketed."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    from bigquery_etl_spark.plans._util import dec

    revenue = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# B12 — broadcast join: dimension tables ship to every executor, no shuffle
# of the fact side. THE join strategy for star schemas at scale.
# ---------------------------------------------------------------------------


@query(
    "q_join_broadcast",
    sql=f"""
    SELECT n_name, r_name,
           {dsum_sql('c_acctbal', 'sum_bal')},
           COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
    tags=("join",),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ broadcast(nation) ⋈ broadcast(region): the fact table
    never shuffles — each task map-side joins against the ~KB dims."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(dsum("c_acctbal", "sum_bal"), F.count(F.lit(1)).alias("n_cust"))
    )


# ---------------------------------------------------------------------------
# B13 — outer joins.
# ---------------------------------------------------------------------------


@query(
    "q_join_outer",
    sql="""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    tags=("join",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: customers with zero orders survive with count 0.
    COUNT(o_orderkey) ignores the null-extended rows — the classic
    outer-join-then-aggregate shape."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    from bigquery_etl_spark.plans._util import dec

    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("sum_spend"),
        )
    )


@query(
    "q_join_full",
    sql="""
    SELECT cn.nk AS cust_nk, sn.nk AS supp_nk
    FROM (SELECT DISTINCT c_nationkey AS nk FROM customer) cn
    FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS nk FROM supplier) sn
      ON cn.nk = sn.nk
    """,
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER over the two key sets; unmatched sides null-extend."""
    cn = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        cn.nk.alias("cust_nk"), sn.nk.alias("supp_nk")
    )


# ---------------------------------------------------------------------------
# B14/B15 — semi / anti joins (EXISTS / NOT EXISTS). The probe side streams;
# only the distinct keys of the filter side shuffle.
# ---------------------------------------------------------------------------


@query(
    "q_join_semi",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderstatus
    """,
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: orders having any >45-quantity line. No row duplication
    (unlike inner join + distinct) — output ≤ left cardinality."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_join_anti",
    sql="""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no LARGE orders. (Restricted to the
    big-ticket subset so the result is NON-EMPTY on this dataset —
    every synthetic customer has some order, and an all-covered anti
    join would pass its oracle vacuously.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B16 — cross join (explicit; Spark requires crossJoin or a true-literal
# condition so accidental Cartesian products fail loudly).
# ---------------------------------------------------------------------------


@query(
    "q_join_cross",
    sql="""
    SELECT r_name, s_name FROM region CROSS JOIN supplier
    """,
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN of two small inputs (5 × |supplier|). At scale a cross
    join is only ever sane when one side broadcasts."""
    r = load(spark, sf_dir, "region").select("r_name")
    s = load(spark, sf_dir, "supplier").select("s_name")
    return r.crossJoin(s)


# ---------------------------------------------------------------------------
# B17/B19 — theta (range/overlap) join: non-equi predicate.
# ---------------------------------------------------------------------------


@query(
    "q_join_range",
    sql="""
    SELECT s_suppkey, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM supplier JOIN part
      ON p_retailprice BETWEEN s_acctbal - 500 AND s_acctbal + 500
    GROUP BY s_suppkey
    """,
    tags=("join",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi join → BroadcastNestedLoop with the small side
    broadcast. At 100 TB the scale path is bucketizing the range key to
    recover an equi-join on bucket id (see operators/range_bucket.py);
    here the dimension side is tiny so BNLJ with broadcast is the right
    physical plan."""
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part")
    from bigquery_etl_spark.plans._util import dec

    cond = (p.p_retailprice >= s.s_acctbal - 500) & (p.p_retailprice <= s.s_acctbal + 500)
    return (
        F.broadcast(s).join(p, cond)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(dec("p_retailprice")).cast("double").alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# B18 — as-of join (operators/asof.py): latest order at-or-before each event.
# ---------------------------------------------------------------------------


@query(
    "q_join_asof",
    sql="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
    FROM events e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                           ORDER BY o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1
    ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the customer's most recent order at event time.
    Right side deduped to one row per (custkey, orderdate) — max orderkey
    wins — so the as-of match is deterministic in both engines."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    return asof_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        tiebreak="o_orderkey",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")
