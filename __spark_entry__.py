"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's declared-query registry (bigquery_etl_spark.plans —
one entry per implemented operator from SURVEY.md §2) plus the DuckDB
oracle twins for the driver's t2 differential check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigquery_etl_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from bigquery_etl_spark.plans.aggregates import q_agg_hash

    return q_agg_hash(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible declared query."""
    return {name: spec.sql for name, spec in all_queries().items() if spec.sql is not None}
