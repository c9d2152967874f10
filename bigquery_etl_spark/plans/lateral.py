"""Lateral joins (BigQuery correlated array subqueries / CROSS APPLY).

Spark supports LATERAL subquery joins (3.2+) and LATERAL VIEW
generators; DuckDB supports SQL-standard LATERAL — both are planned as
correlated joins, not per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import register_views


@query(
    "q_lateral_topn",
    sql="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    """,
    tags=("join", "lateral"),
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via LATERAL (the correlated-subquery
    spelling of q_topk_per_group; same WindowGroupLimit-style plan after
    decorrelation)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        """
    )


@query(
    "q_lateral_view",
    sql="""
    SELECT e.event_id, tok.w AS word
    FROM events e, LATERAL UNNEST(string_split(e.event_type, '_')) AS tok(w)
    """,
    tags=("join", "lateral"),
)
def q_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode — the HiveQL/BigQuery UNNEST-in-FROM idiom
    (generator runs inside the scan stage, no join materialized)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id, word
        FROM events
        LATERAL VIEW explode(split(event_type, '_')) t AS word
        """
    )
