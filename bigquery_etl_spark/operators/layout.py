"""Physical-layout maintenance operators (charter: 100 TB efficiency is
mostly layout): small-file compaction and Z-order-style multi-column
clustering.

A streaming sink writing every micro-batch produces thousands of small
files — each costs a task + a footer read at query time. Compaction
bin-packs them back to target-sized files. Z-ordering interleaves the
bits of several key columns into one sort key so parquet row-group
min/max stats stay selective for ALL keys, not just the leading sort
column — multi-dimensional data skipping with zero query-side changes.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n, total = 0, 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> tuple[int, int]:
    """Rewrite a parquet dir into ~target-sized files (coalesce — no
    shuffle; row order within files preserved). Returns (files_before,
    files_after). Uses merge_upsert's crash-recoverable two-rename swap
    (rmtree-then-rename loses the table if killed between the steps —
    the bug class recover_upsert exists for); single-writer assumed."""
    import shutil

    from bigquery_etl_spark.operators.merge import recover_upsert

    recover_upsert(path)
    n_before, total = dir_file_stats(path)
    n_target = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    staging, gc = f"{path}.staging", f"{path}.gc"
    df.coalesce(n_target).write.mode("overwrite").parquet(staging)
    os.rename(path, gc)
    os.rename(staging, path)
    shutil.rmtree(gc)
    return n_before, dir_file_stats(path)[0]


def _to_uint16(c: Column, lo: Column, hi: Column) -> Column:
    """Scale a numeric column into [0, 2^16) rank space (min/max based —
    for production use approx quantiles per column for equi-depth)."""
    span = F.when(hi != lo, hi - lo).otherwise(F.lit(1.0))
    frac = (c.cast("double") - lo) / span
    return F.least(
        F.lit(65535), F.greatest(F.lit(0), F.floor(frac * 65535).cast("long"))
    )


def zorder_key(cols: list[Column | str], bounds: list[tuple[float, float]]) -> Column:
    """Interleaved-bit Z-value over up to 4 numeric columns (16 bits
    each). Pure codegen arithmetic — no UDF."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    ranks = [
        _to_uint16(F.col(c) if isinstance(c, str) else c, F.lit(float(lo)), F.lit(float(hi)))
        for c, (lo, hi) in zip(cols, bounds)
    ]
    n = len(ranks)
    key = F.lit(0).cast("long")
    for bit in range(16):
        for i, r in enumerate(ranks):
            b = F.shiftrightunsigned(r, bit).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(b, bit * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bounds: list[tuple[float, float]],
    n_files: int = 8,
) -> None:
    """Write parquet range-partitioned + sorted by the Z-value of
    ``zcols``: row groups become tight hyper-rectangles in key space, so
    min/max stats prune scans filtered on ANY of the z-columns."""
    z = zorder_key(zcols, bounds).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
