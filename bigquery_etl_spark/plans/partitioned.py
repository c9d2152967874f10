"""Partitioned + clustered lake tables — declared queries (r6, C45).

BigQuery's flagship scale feature on the delegated surface: the
reference's own warehouse tables are date-partitioned BigQuery tables
(ref migrations/versions/*.py declare them; main.py delegates every
query to BigQuery, which partition-eliminates). Here partitioning is a
first-class lake-table layout: CREATE TABLE ... PARTITION BY lays
files out Hive-style per partition, the manifest records each file's
partition value, and elimination happens on the MANIFEST — a pruned
query hands Spark one month's file list, the other files never reach
the planner. DML whose predicate pins partitions rewrites ONLY those
partitions (sources/versioned.py replace_partitions).

Fixtures follow the scratch_build protocol (plans/_util.py): built
once per process, queries re-read the steady state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.plans._util import dsum_sql, scratch_build
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


def _orders_part_fixture(spark: SparkSession, sf_dir: str) -> str:
    """orders (1/3 sample) partitioned by month of o_orderdate, with a
    partition-scoped DELETE already applied: 1996-Q1 loses its URGENT
    rows — an O(quarter) rewrite, every other month's files carried by
    reference."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    def _build(path: str) -> None:
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 3 == 0
        ).select(
            "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
        )
        o.createOrReplaceTempView("po_src")
        cat = LakeCatalog(spark, warehouse=os.path.join(path, "wh"))
        cat.sql(
            "CREATE TABLE po PARTITION BY DATE_TRUNC(o_orderdate, MONTH) "
            "CLUSTER BY o_orderkey AS SELECT * FROM po_src"
        )
        cat.sql(
            "DELETE FROM po WHERE o_orderdate >= '1996-01-01' AND "
            "o_orderdate < '1996-04-01' AND o_orderpriority = '1-URGENT'"
        )

    return scratch_build(f"orders_part:{sf_dir}", "orders_part_", _build)


@query(
    "q_partitioned_prune",
    sql="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS price_sum
    FROM orders
    WHERE o_orderkey % 3 = 0
      AND o_orderdate >= '1995-06-01' AND o_orderdate < '1995-09-01'
    GROUP BY month ORDER BY month
    """,
    tags=("lakehouse", "partitioned"),
)
def q_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-partitioned lake table, quarter-range aggregate (r6 C45).
    The WHERE carries conjunctive date bounds, so the catalog prunes
    at the MANIFEST: exactly three months' files enter the scan (the
    half-open `< '1995-09-01'` bound excludes September — the grain-
    floor rule, lake_sql._is_grain_floor). Pinned in
    tests/test_partitioned.py via inputFiles; the oracle recomputes
    the same quarter from raw orders, proving layout + pruning change
    nothing about results."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    root = _orders_part_fixture(spark, sf_dir)
    cat = LakeCatalog(spark)
    cat.register(
        "po", VersionedTable(spark, os.path.join(root, "wh", "po"))
    )
    return cat.sql(
        "SELECT date_format(o_orderdate, 'yyyy-MM') AS month, "
        "COUNT(*) AS n, "
        + dsum_sql("o_totalprice", "price_sum")
        + " FROM po WHERE o_orderdate >= '1995-06-01' "
        "AND o_orderdate < '1995-09-01' "
        "GROUP BY month ORDER BY month"
    )


@query(
    "q_partition_dml",
    sql="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n
    FROM orders
    WHERE o_orderkey % 3 = 0
      AND o_orderdate >= '1995-12-01' AND o_orderdate < '1996-05-01'
      AND NOT (o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
               AND o_orderpriority = '1-URGENT')
    GROUP BY month ORDER BY month
    """,
    tags=("lakehouse", "partitioned", "dml"),
)
def q_partition_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped DELETE read-back (r6 C45): the fixture deleted
    1996-Q1 URGENT orders — replace_partitions rewrote exactly the
    three touched months and carried every other month's files BY
    REFERENCE (path-identity pinned in tests/test_partitioned.py).
    The result reads the surviving rows around the boundary (1995-12
    untouched, Q1 thinned, 1996-04 untouched); the oracle applies the
    same delete as a predicate on raw orders. At 100 TB this is the
    difference between rewriting a quarter and rewriting a decade."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    root = _orders_part_fixture(spark, sf_dir)
    cat = LakeCatalog(spark)
    cat.register(
        "po", VersionedTable(spark, os.path.join(root, "wh", "po"))
    )
    return cat.sql(
        "SELECT date_format(o_orderdate, 'yyyy-MM') AS month, "
        "COUNT(*) AS n FROM po "
        "WHERE o_orderdate >= '1995-12-01' AND o_orderdate < '1996-05-01' "
        "GROUP BY month ORDER BY month"
    )


@query(
    "q_partition_meta",
    sql="""
    SELECT partition_id, total_rows FROM (
        SELECT strftime(o_orderdate, '%Y%m') AS partition_id,
               COUNT(*) AS total_rows
        FROM orders
        WHERE o_orderkey % 3 = 0
          AND NOT (o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
                   AND o_orderpriority = '1-URGENT')
        GROUP BY partition_id
    ) ORDER BY partition_id
    """,
    tags=("lakehouse", "partitioned", "metadata"),
)
def q_partition_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFORMATION_SCHEMA.PARTITIONS (r6 C45): per-partition row
    accounting served from MANIFESTS ONLY — zero data scan at any
    table size (BigQuery's partition metadata works the same way).
    The oracle RECOMPUTES each month's row count from raw orders
    (post-DELETE closed form), so parity proves the manifest
    accounting tracks every write path exactly."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    root = _orders_part_fixture(spark, sf_dir)
    cat = LakeCatalog(spark)
    cat.register(
        "po", VersionedTable(spark, os.path.join(root, "wh", "po"))
    )
    return cat.sql(
        "SELECT partition_id, total_rows FROM INFORMATION_SCHEMA.PARTITIONS "
        "WHERE table_name = 'po' ORDER BY partition_id"
    )
