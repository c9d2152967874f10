"""Real JDBC round-trip (SURVEY.md §2 B4) against embedded Apache Derby.

The reference keeps its ETL cursor in Postgres (ref main.py:119,
132-142); the container has no server DB, but Derby ships with Spark's
jars, so the JDBC code path — dialect, type mapping, partitioned reads,
predicate pushdown — is exercised against a real database engine, not a
mock. Closes the SURVEY.md §8 "real JDBC round-trip" gap.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigquery_etl_spark.sources.files import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def _cursor_rows():
    t0 = datetime.datetime(2020, 5, 5, 12, 0, 0)
    return [
        Row(
            id=i,
            block_number=10_014_455 + i * 1000,
            created_at=t0 + datetime.timedelta(minutes=i),
        )
        for i in range(20)
    ]


def test_jdbc_write_read_roundtrip(spark, derby_url):
    """etl_cursor-shaped table: write over JDBC, read back, values equal."""
    df = spark.createDataFrame(_cursor_rows())
    write_jdbc(df, derby_url, "etl_cursor", driver=DRIVER)
    back = read_jdbc(spark, derby_url, "etl_cursor", driver=DRIVER)
    key = lambda r: r["id"]  # noqa: E731
    assert sorted((r.asDict() for r in back.collect()), key=key) == sorted(
        (r.asDict() for r in df.collect()), key=key
    )


def test_jdbc_partitioned_read_stripes(spark, derby_url):
    """Bounded partitioned read: numPartitions stripes on the numeric
    column — N parallel connections instead of one serial scan (the
    only way a JDBC source scales out)."""
    df = spark.createDataFrame(_cursor_rows())
    write_jdbc(df, derby_url, "cursor_striped", driver=DRIVER)
    back = read_jdbc(
        spark,
        derby_url,
        "cursor_striped",
        partition_column="block_number",
        lower_bound=10_014_455,
        upper_bound=10_014_455 + 20_000,
        num_partitions=4,
        driver=DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 20


def test_jdbc_predicate_pushdown(spark, derby_url):
    """Filters reach the remote database as WHERE clauses (PushedFilters
    in the scan) — the JDBC analogue of parquet pushdown."""
    df = spark.createDataFrame(_cursor_rows())
    write_jdbc(df, derby_url, "cursor_pushdown", driver=DRIVER)
    scan = read_jdbc(spark, derby_url, "cursor_pushdown", driver=DRIVER).filter(
        F.col("block_number") > 10_020_000
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "block_number" in plan
    assert scan.count() == len([r for r in _cursor_rows() if r.block_number > 10_020_000])


def test_jdbc_append_mode(spark, derby_url):
    """Append mode accumulates rows (cursor-history semantics)."""
    df = spark.createDataFrame(_cursor_rows())
    write_jdbc(df, derby_url, "cursor_hist", driver=DRIVER)
    write_jdbc(df.withColumn("id", F.col("id") + 100), derby_url, "cursor_hist",
               mode="append", driver=DRIVER)
    assert read_jdbc(spark, derby_url, "cursor_hist", driver=DRIVER).count() == 40
