"""Stream-stream joins (Structured Streaming).

The reference's enrichment join (A6, main.py:152) is stream-static; a
stream-STREAM join is the generalization BigQuery users reach for when
both sides arrive continuously (e.g. correlating marketplace events
with dshop events in the same block window). Spark requires both sides
watermarked plus a time-bound join condition so state stays finite —
state size is O(events inside the interval window per key), independent
of total stream length, which is what makes this viable at 100 TB/day.

Outer variants additionally need the watermark to know when an unmatched
row can be emitted (it is held back until the other side's watermark
passes the join interval's end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    max_gap: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands in
    ``[left.ts, left.ts + max_gap]``. Both inputs may be streaming or
    batch (batch twins the streaming semantics minus the state bound,
    so tests can diff the two).

    The equi-key keeps it a (stateful) hash join — the interval is a
    post-filter on matched pairs, NOT a nested-loop condition — so each
    micro-batch shuffles both sides on ``key`` once.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (l.l_key == r.r_key)
        & (r.r_ts >= l.l_ts)
        & (r.r_ts <= l.l_ts + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond, how).select(
        "l_key", "l_event_id", "l_ts", "r_event_id", "r_ts", "l_value", "r_value"
    )
