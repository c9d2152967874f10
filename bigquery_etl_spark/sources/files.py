"""File sources & sinks beyond parquet (SURVEY.md §2 B2-B5, A9-A10).

Always explicit schemas (schema-on-write discipline of ref
main.py:51-81) — inference costs a full extra pass at 100 TB and admits
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """B2: NDJSON scan with explicit schema (the reference's staging
    format, ref main.py:171 NEWLINE_DELIMITED_JSON)."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """B3: CSV scan, explicit schema, no inferSchema."""
    return spark.read.schema(schema).csv(path, header=header)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """B4: JDBC scan (the reference reads etl_cursor from Postgres,
    ref main.py:119). Partitioned read when bounds are given — one task
    per stripe instead of a single-connection scan; at warehouse scale
    ALWAYS partition on an indexed numeric column."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    **options: str,
) -> None:
    """B4 (write side): bulk-insert a DataFrame over JDBC — the analogue
    of the reference's cursor/state writes to Postgres (ref main.py:132-142).
    One connection per partition; `batchsize` controls rows per executeBatch.
    JDBC sinks are for small state/dimension tables — warehouse-scale data
    belongs in parquet, not a row store."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batch_size))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """B5: hive-style partitioned parquet (the BigQuery date-partitioned
    table idiom). Readers filtering on partition_cols prune directories
    before any IO — the first lever for 100 TB layouts. Keep partition
    cardinality moderate (1e2-1e4 dirs); inside partitions Spark still
    splits by maxPartitionBytes."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int, mode: str = "overwrite"
) -> None:
    """Bucketed managed table: co-locates both sides of a recurring join
    on bucket_cols so the join needs NO shuffle (SortMergeJoin reads
    matching buckets). The write shuffles once; every later join is free.
    Requires a metastore catalog (saveAsTable)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )
