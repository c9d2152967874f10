"""Scan / projection / filter / sort / set-op operators (SURVEY.md §2
B1, B6-B10, B34-B39).

The reference's consumers ran these in BigQuery over the two loaded
tables (ref main.py:49-50, README.md:27-28); here each is a declarative
DataFrame plan so Catalyst pushes filters and prunes columns into the
parquet scan — check ``PushedFilters`` / ``ReadSchema`` in .explain().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load, register_views

# ---------------------------------------------------------------------------
# B1 — columnar scan with column pruning + predicate pushdown.
# ---------------------------------------------------------------------------


@query(
    "q_scan_project",
    sql="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
    tags=("scan",),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-of-11-column projection + pushed filter: the scan reads only the
    l_orderkey/l_extendedprice/l_shipdate column chunks and skips row
    groups via parquet min/max stats on l_shipdate. At 100 TB this is the
    difference between scanning ~18% and 100% of the table."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "l_orderkey", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# B7 — projection with computed columns and aliases.
# ---------------------------------------------------------------------------


@query(
    "q_project",
    sql="""
    SELECT o_orderkey,
           UPPER(o_orderstatus) AS status_u,
           o_totalprice * CAST(0.05 AS DOUBLE) AS fee,
           o_orderpriority || '/' || o_orderstatus AS pri_status
    FROM orders
    """,
    tags=("project",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns stay inside whole-stage codegen — no UDF needed.
    Mirrors the A5/A7 projection step (ref main.py:51-81 target shapes)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        (F.col("o_totalprice") * F.lit(0.05)).alias("fee"),
        F.concat_ws("/", "o_orderpriority", "o_orderstatus").alias("pri_status"),
    )


# ---------------------------------------------------------------------------
# B8 — filter predicates: comparison, BETWEEN, IN, LIKE, boolean algebra.
# ---------------------------------------------------------------------------


@query(
    "q_filter_pred",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 30
      AND l_returnflag IN ('A', 'N')
      AND l_linestatus LIKE 'F%'
      AND l_shipdate IS NOT NULL
      AND NOT (l_discount > 0.08)
    """,
    tags=("filter",),
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate class the reference's A4 event filter used plus the
    BigQuery surface; all are parquet-pushable (ref main.py:147 pushed its
    filter into the RPC request — same principle, different source)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 30)
        & F.col("l_returnflag").isin("A", "N")
        & F.col("l_linestatus").like("F%")
        & F.col("l_shipdate").isNotNull()
        & ~(F.col("l_discount") > 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ---------------------------------------------------------------------------
# B9 — conditional expressions: CASE WHEN / COALESCE / NULLIF.
# ---------------------------------------------------------------------------


@query(
    "q_case_expr",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           IF(o_orderpriority LIKE '1%', 1, 0) AS is_urgent
    FROM orders
    """,
    tags=("project",),
)
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_label"),
        F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0).alias("is_urgent"),
    )


# ---------------------------------------------------------------------------
# B10 — casts & safe casts. NOTE cross-engine pitfall: Spark CAST(double AS
# int) truncates, DuckDB rounds — so the double→int path goes through an
# explicit trunc() on both sides.
# ---------------------------------------------------------------------------


@query(
    "q_cast",
    sql="""
    SELECT c_custkey,
           CAST(c_custkey AS VARCHAR) AS key_str,
           CAST(TRY_CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS BIGINT) AS key_roundtrip,
           TRY_CAST(c_name AS BIGINT) AS bad_cast,
           CAST(TRUNC(c_acctbal) AS BIGINT) AS bal_trunc,
           CAST(c_nationkey AS DOUBLE) AS nk_dbl
    FROM customer
    """,
    tags=("project",),
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST + TRY_CAST (BigQuery SAFE_CAST): bad_cast is NULL, not an error."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_custkey").cast("string").try_cast("bigint").alias("key_roundtrip"),
        F.col("c_name").try_cast("bigint").alias("bad_cast"),
        F.col("c_acctbal").cast("long").alias("bal_trunc"),
        F.col("c_nationkey").cast("double").alias("nk_dbl"),
    )


# ---------------------------------------------------------------------------
# B6 — view registration + SQL entry point (Catalyst parses; same plan as
# the DataFrame form).
# ---------------------------------------------------------------------------


@query(
    "q_sql_roundtrip",
    sql="""
    SELECT n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("sql",),
)
def q_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temp-view registration + spark.sql — the engine's SQL front door."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


# ---------------------------------------------------------------------------
# B34/B35 — global sort + LIMIT (top-k). Sort keys include the unique
# o_orderkey so the top-100 set is deterministic under ties.
# ---------------------------------------------------------------------------


@query(
    "q_sort_limit",
    sql="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
    LIMIT 100
    """,
    tags=("sort",),
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst rewrites sort+limit to TakeOrderedAndProject: each task
    keeps a 100-row heap, the driver merges — no global sort at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# B37-B39 — set operations.
# ---------------------------------------------------------------------------


@query(
    "q_union",
    sql="""
    SELECT nk, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION ALL
        SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
    tags=("setop",),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL is a zero-shuffle concat of children; the groupBy after it
    is the only exchange."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_intersect",
    sql="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct form) — planned as an aggregate + semi join."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "q_except",
    sql="""
    SELECT n_nationkey AS nk FROM nation
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier WHERE s_nationkey < 20
    """,
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with no low-key supplier — planned as
    anti join. (The subtrahend filter keeps the result NON-EMPTY on
    this dataset: an all-nations-covered EXCEPT returns zero rows and
    passes its oracle vacuously — the r6 q_partition_dml lesson.)"""
    n = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk"))
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 20)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return n.subtract(s)


@query(
    "q_except_all",
    sql="""
    SELECT l_returnflag AS rf FROM lineitem WHERE l_quantity < 10
    EXCEPT ALL
    SELECT l_returnflag AS rf FROM lineitem WHERE l_quantity > 45
    """,
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference) — exceptAll keeps multiplicities."""
    li = load(spark, sf_dir, "lineitem")
    small = li.filter(F.col("l_quantity") < 10).select(F.col("l_returnflag").alias("rf"))
    big = li.filter(F.col("l_quantity") > 45).select(F.col("l_returnflag").alias("rf"))
    return small.exceptAll(big)
