"""Tests for layout operators: compaction and Z-order clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_etl_spark.operators.layout import (
    compact_parquet_dir,
    dir_file_stats,
    write_zordered,
    zorder_key,
)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10000).toDF("id")
    df.repartition(40).write.mode("overwrite").parquet(path)
    n_before, _ = dir_file_stats(path)
    assert n_before == 40
    b, a = compact_parquet_dir(spark, path, target_file_mb=128)
    assert (b, a) == (40, 1)
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(10000))


def test_zorder_key_locality(spark):
    """Z-values of nearby points differ less than far points (interleaved
    bits preserve locality in both dimensions)."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (100.0, 100.0)], "x double, y double"
    )
    z = df.select(zorder_key(["x", "y"], [(0, 100), (0, 100)]).alias("z")).collect()
    z00, z11, zff = (r.z for r in z)
    assert z00 <= z11 < zff


def test_zordered_write_skips_row_groups(spark, tmp_path):
    """After z-ordering on (a, b), a filter on b alone scans fewer rows
    per file (min/max pruning works on the non-leading column too)."""
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 447).cast("double").alias("a"),
        ((F.col("id") * 7919) % 1000).cast("double").alias("b"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], [(0, 447), (0, 1000)], n_files=16)
    back = spark.read.parquet(path)
    assert back.count() == n
    # correctness of a selective filter on the non-leading dimension
    got = back.filter((F.col("b") >= 0) & (F.col("b") < 10)).count()
    expected = df.filter((F.col("b") >= 0) & (F.col("b") < 10)).count()
    assert got == expected
    # layout check: each file covers a narrow slice of b-space on average —
    # file-level (b_max - b_min) spans must be much smaller than the domain
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        bmin, bmax = 1e18, -1e18
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "b" and col.statistics is not None:
                    bmin = min(bmin, col.statistics.min)
                    bmax = max(bmax, col.statistics.max)
        if bmax >= bmin:
            spans.append(bmax - bmin)
    assert spans and sum(spans) / len(spans) < 700  # < domain (1000): clustered
