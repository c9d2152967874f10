"""Subquery operators (BigQuery Standard SQL surface: scalar, IN,
EXISTS, correlated — SURVEY.md §4.2 'subquery decorrelation').

We write the declarative form; Catalyst's RewriteCorrelatedScalarSubquery
/ RewritePredicateSubquery turn correlated subqueries into joins — no
per-row re-execution (the thing that would be quadratic at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import register_views

# ---------------------------------------------------------------------------
# Uncorrelated scalar subquery.
# ---------------------------------------------------------------------------


@query(
    "q_subquery_scalar",
    sql="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                 FROM orders), 9) AS price_share
    FROM orders
    WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) * 1.5
                          FROM orders)
    """,
    tags=("subquery",),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries in SELECT and WHERE: planned as a broadcast of
    the 1-row aggregate, not a rescan per row."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                                     FROM orders), 9) AS price_share
        FROM orders
        WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) * 1.5
                              FROM orders)
        """
    )


# ---------------------------------------------------------------------------
# IN / NOT IN subqueries (planned as semi/anti joins).
# ---------------------------------------------------------------------------


@query(
    "q_subquery_in",
    sql="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      AND c_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_acctbal < 0)
    """,
    tags=("subquery",),
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN → left semi join; NOT IN → null-aware anti join (Catalyst
    handles the three-valued-logic null trap)."""
    register_views(spark, sf_dir, ("customer", "orders", "supplier"))
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
          AND c_nationkey NOT IN (SELECT s_nationkey FROM supplier WHERE s_acctbal < 0)
        """
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (decorrelated to an aggregate + join).
# ---------------------------------------------------------------------------


@query(
    "q_subquery_correlated",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT CAST(AVG(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    tags=("subquery",),
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's own average. Catalyst decorrelates
    to (orders ⋈ per-customer aggregate) — one pass, no per-row rescan;
    check .explain(): a single Aggregate + Join, no SubqueryExec in the
    hot path."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
            SELECT CAST(AVG(CAST(o2.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


# ---------------------------------------------------------------------------
# Correlated EXISTS with an extra predicate (semi-join with condition).
# ---------------------------------------------------------------------------


@query(
    "q_subquery_exists",
    sql="""
    SELECT n_name, COUNT(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'F' AND o_totalprice > 100000
    )
    GROUP BY n_name
    """,
    tags=("subquery",),
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "nation", "orders"))
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'F' AND o_totalprice > 100000
        )
        GROUP BY n_name
        """
    )
