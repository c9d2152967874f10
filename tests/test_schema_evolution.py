"""Schema evolution (SURVEY.md A17 — the reference's alembic migration,
re-expressed as Spark DDL): managed-table ALTER TABLE ADD COLUMNS with
NULL backfill, and mergeSchema reads over heterogeneous parquet files
(the lake-side equivalent when files outlive their writers' schema)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_alter_table_add_columns_null_backfill(spark, tmp_path):
    tbl = "etl_cursor_evolved"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} (id BIGINT, block_number BIGINT) USING parquet"
    )
    try:
        spark.sql(f"INSERT INTO {tbl} VALUES (1, 100), (2, 200)")
        spark.sql(f"ALTER TABLE {tbl} ADD COLUMNS (chain STRING, lag INT)")
        spark.sql(f"INSERT INTO {tbl} VALUES (3, 300, 'mainnet', 4)")
        rows = {r.id: (r.block_number, r.chain, r.lag)
                for r in spark.table(tbl).collect()}
        assert rows[1] == (100, None, None)  # old rows NULL-backfilled
        assert rows[3] == (300, "mainnet", 4)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_merge_schema_parquet_read(spark, tmp_path):
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, 100)], "id long, block_number long") \
        .write.parquet(p + "/v1")
    spark.createDataFrame(
        [(2, 200, "mainnet")], "id long, block_number long, chain string"
    ).write.parquet(p + "/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(p + "/v1", p + "/v2")
    assert set(merged.columns) == {"id", "block_number", "chain"}
    got = {r.id: r.chain for r in merged.collect()}
    assert got == {1: None, 2: "mainnet"}
