"""Bucketized range/interval join (SURVEY.md §2 B17/B19 scale path).

A non-equi join (point-in-interval or interval-overlap) plans as
BroadcastNestedLoopJoin — O(|L|·|R|) compares — fine when one side is
tiny, catastrophic when both are large. The scale rewrite: quantize the
range dimension into fixed-width buckets, equi-join on bucket id (each
interval explodes into the buckets it spans), then re-check the exact
predicate. Cost drops to a hash shuffle on bucket + per-bucket pair
work; pick bucket_width ≈ median interval length so intervals span O(1)
buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= point <= hi.

    Both inputs may be arbitrarily large: the only shuffle is the
    equi-join on __bucket. Intervals spanning b buckets are replicated b
    times (bounded by interval_len/bucket_width + 1).
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "__bucket", how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Join interval pairs that overlap: l_lo <= r_hi AND r_lo <= l_hi.

    Both sides explode into spanned buckets; the bucket equi-join yields
    each overlapping pair in every shared bucket, so results dedupe on
    the pair before the exact predicate re-check."""

    def bucketize(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(bucket_width)).cast("long"),
                    F.floor(F.col(hi) / F.lit(bucket_width)).cast("long"),
                )
            ),
        )

    lb = bucketize(left, l_lo, l_hi)
    rb = bucketize(right, r_lo, r_hi)
    joined = lb.join(rb, "__bucket").filter(
        (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
    )
    return joined.drop("__bucket").dropDuplicates()
