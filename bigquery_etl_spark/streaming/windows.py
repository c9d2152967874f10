"""Event-time window aggregations (SURVEY.md §2 B47-B50).

Batch/stream generic: the same plan runs over a bounded DataFrame or a
readStream source. On a stream, pass ``watermark_delay`` — the analogue
of the reference's 4-block confirmation lag (ref main.py:32,
JOB_BLOCK_LAG): state for windows older than max(event_time) - delay is
finalized and dropped, bounding state size at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark_delay: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark_delay) if watermark_delay else df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    watermark_delay: str | None = None,
) -> DataFrame:
    """B47: non-overlapping windows; each row lands in exactly one."""
    g = _maybe_watermark(df, ts_col, watermark_delay).groupBy(
        F.window(ts_col, duration).alias("w"), *group_cols
    )
    return g.agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")).select(
        F.col("w.start").alias("ws"), F.col("w.end").alias("we"), *group_cols, "n", "sum_value"
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    watermark_delay: str | None = None,
) -> DataFrame:
    """B48: hopping windows; each row lands in duration/slide windows."""
    g = _maybe_watermark(df, ts_col, watermark_delay).groupBy(
        F.window(ts_col, duration, slide).alias("w"), *group_cols
    )
    return g.agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")).select(
        F.col("w.start").alias("ws"), F.col("w.end").alias("we"), *group_cols, "n", "sum_value"
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_cols: tuple[str, ...] = ("user_id",),
    watermark_delay: str | None = None,
) -> DataFrame:
    """B49: data-driven windows — a session closes after ``gap`` of
    silence per group. Window extent depends on the data, so state is
    merged as events arrive (Spark handles session merge natively)."""
    g = _maybe_watermark(df, ts_col, watermark_delay).groupBy(
        F.session_window(ts_col, gap).alias("w"), *group_cols
    )
    return g.agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")).select(
        F.col("w.start").alias("ws"), F.col("w.end").alias("we"), *group_cols, "n", "sum_value"
    )
