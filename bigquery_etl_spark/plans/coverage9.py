"""Ninth coverage pack: the BigQuery scripting/dynamic-SQL surface that
Spark 4 now matches — parameterized queries (BigQuery named @params),
EXECUTE IMMEDIATE with USING binds (dynamic SQL), SQL scripting
(BEGIN / DECLARE / SET var = (subquery) — BigQuery procedural
language), and case-insensitive collation (BigQuery COLLATE
'und:ci' ↔ Spark UTF8_LCASE).

Reference parity: Tier B — the reference's consumers run these against
BigQuery (delegation evidence main.py:21, 160-185); each query proves
the Spark-4 analogue plans and executes identically to a static
spelling (the oracle twin is always the static form, so parity IS the
equivalence proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load, register_views

# ---------------------------------------------------------------------------
# Parameterized SQL — named parameter markers bound server-side (no
# string splicing, injection-safe). The plan is identical to the
# literal-inlined form after constant folding.
# ---------------------------------------------------------------------------


@query(
    "q_param_sql",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "params"),
)
def q_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql with named parameter markers (:cutoff, :status) — the
    BigQuery @param idiom."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1995-01-01", "status": "F"},
    )


# ---------------------------------------------------------------------------
# EXECUTE IMMEDIATE ... USING — dynamic SQL with positional binds
# (BigQuery's EXECUTE IMMEDIATE). The query text is assembled at run
# time; binds keep values out of the string.
# ---------------------------------------------------------------------------


@query(
    "q_exec_immediate",
    sql="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY n_name
    """,
    tags=("sql", "dynamic"),
)
def q_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL: the segment filter arrives as a USING bind."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT n_name, COUNT(*) AS n_customers
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE c_mktsegment = ? GROUP BY n_name'
        USING 'BUILDING'
        """
    )


# ---------------------------------------------------------------------------
# SQL scripting — BEGIN/DECLARE/SET with a scalar-subquery assignment,
# then a query against the variable (BigQuery procedural scripting).
# The variable evaluates once; the main query plans with it as a
# constant, so the threshold behaves like a literal (sargable,
# pushable).
# ---------------------------------------------------------------------------


@query(
    "q_sql_script",
    sql="""
    WITH hi AS (SELECT MAX(o_orderdate) AS d FROM orders)
    SELECT COUNT(*) AS n_recent,
           MIN(o_orderdate) AS first_kept
    FROM orders, hi
    WHERE o_orderdate > hi.d - INTERVAL 90 DAY
    """,
    tags=("sql", "scripting"),
)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural script: DECLARE a cutoff, SET it from a scalar
    subquery, query with it. Twin spells the same thing relationally."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        BEGIN
          DECLARE hi DATE;
          SET hi = (SELECT MAX(o_orderdate) FROM orders);
          SELECT COUNT(*) AS n_recent, MIN(o_orderdate) AS first_kept
          FROM orders WHERE o_orderdate > hi - INTERVAL 90 DAY;
        END
        """
    )


# ---------------------------------------------------------------------------
# Collation — case-insensitive grouping via UTF8_LCASE (BigQuery
# COLLATE 'und:ci'). Mixed-case values are synthesized from
# c_mktsegment; grouping under the collation must agree with the
# lower()-key oracle. Collation lives in the TYPE, so comparisons,
# joins, and aggs all honor it without rewriting expressions.
# ---------------------------------------------------------------------------


@query(
    "q_collate",
    sql="""
    SELECT lower(seg) AS seg_ci, COUNT(*) AS n
    FROM (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer
    )
    GROUP BY lower(seg)
    """,
    tags=("sql", "collation"),
)
def q_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY a UTF8_LCASE-collated column: 'BUILDING' and 'building'
    are one group without any lower() in the grouping key."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT lower(seg) AS seg_ci, COUNT(*) AS n
        FROM (
            SELECT CAST(CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                             ELSE lower(c_mktsegment) END
                        AS STRING COLLATE UTF8_LCASE) AS seg
            FROM customer
        )
        GROUP BY seg
        """
    )
