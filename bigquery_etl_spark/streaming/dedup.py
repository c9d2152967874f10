"""Stateful streaming dedup (SURVEY.md §2 B51) — the exactly-once fix
for the reference's replay gap (ref main.py:209-216) in streaming form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def watermarked_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes (bounded state — a plain dropDuplicates on a stream
    would grow state forever). ``delay`` plays the role of the
    reference's 4-block confirmation lag: replays/reorgs arrive within
    it, so duplicates from an at-least-once source collapse before the
    sink."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
