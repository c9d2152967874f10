"""Bounded RANGE-frame aggregation via prefix sums (the scalable
rewrite of ``RANGE BETWEEN delta PRECEDING AND CURRENT ROW``).

Spark's window engine evaluates bounded sliding frames by REBUILDING
the aggregate buffer every time the frame moves (no retract support in
AggregateProcessor), so a value-range frame costs O(rows x avg frame
width) per partition — measured 4.2s vs DuckDB 0.2s on a 150k-row
numeric frame (PERF.md round 2 item 5). This operator computes the
same result in O(rows log rows) with three key-local steps:

1. peer-inclusive running totals: ``C(v) = sum/count over value <= v``
   via a RANGE UNBOUNDED PRECEDING window — GROWING frames are
   incremental in Spark, so this is O(n);
2. per-distinct-value totals ``S(v)`` (one groupBy);
3. the frame's lower-boundary prefix ``C_lt(v - delta)`` looked up with
   the as-of join operator (largest v' <= v - delta, backward):
   the frame [v-delta, v] is then ``C(v) - C_lt(v-delta)`` where
   C_lt = C(v') - S(v') if v' == v-delta else C(v').

All steps shuffle on the same partition keys, so at scale this is one
hash shuffle + sorts — no quadratic frame scans. Exactness: sums are
computed on the column as given; pass an exact-decimal column when
float summation order matters (same rule as every other aggregate
here).

Reference basis: BigQuery window RANGE frames (delegated surface,
SURVEY.md section 2 B32); semantics cross-checked against the direct
Spark window form and the DuckDB oracle in tests/test_range_frame.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.operators.asof import asof_join


def bounded_range_sum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    delta,
    agg_col: str,
    sum_alias: str = "range_sum",
    cnt_alias: str = "range_cnt",
) -> DataFrame:
    """Per-row sum+count of ``agg_col`` over rows of the same partition
    whose ``order_col`` lies in ``[order - delta, order]`` (inclusive,
    peer-inclusive — exactly SQL's RANGE delta PRECEDING frame).

    Returns the input columns plus ``sum_alias``/``cnt_alias``.

    NULL ``order_col`` rows follow SQL's RANGE-frame rule (verified
    against Spark's own window engine): a NULL-ordered row's frame is
    exactly its NULL peer group, and NULL rows are excluded from every
    non-null row's value frame. The rewrite therefore splits the input:
    the prefix-sum path runs on non-null order values only (a growing
    UNBOUNDED PRECEDING frame would otherwise fold the NULL rows —
    which sort first — into every C(v)), and NULL rows get a direct
    whole-peer-group aggregate."""
    nn = df.filter(F.col(order_col).isNotNull())
    nulls = df.filter(F.col(order_col).isNull())
    null_peer = W.partitionBy(*part_cols)
    nulls_out = nulls.select(
        *df.columns,
        F.sum(agg_col).over(null_peer).alias(sum_alias),
        F.count(agg_col).over(null_peer).alias(cnt_alias),
    )
    df = nn
    grow = (
        W.partitionBy(*part_cols)
        .orderBy(order_col)
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    with_c = df.select(
        *df.columns,
        F.sum(agg_col).over(grow).alias("__C"),
        F.count(agg_col).over(grow).alias("__Cn"),
    )

    # per-distinct-value totals S(v) and the peer-inclusive C(v) at v
    # (max of __C within the peer group = the full peer-inclusive value)
    per_v = (
        with_c.groupBy(*part_cols, order_col)
        .agg(
            F.max("__C").alias("__Cv"),
            F.max("__Cn").alias("__Cnv"),
            F.sum(agg_col).alias("__Sv"),
            F.count(agg_col).alias("__Snv"),
        )
        .select(
            *[F.col(c).alias(f"__r_{c}") for c in part_cols],
            F.col(order_col).alias("__rv"),
            # the as-of join consumes __rv (its right-ts); carry the
            # matched v' as payload too for the boundary-exact test
            F.col(order_col).alias("__rv_val"),
            "__Cv",
            "__Cnv",
            "__Sv",
            "__Snv",
        )
    )

    # boundary lookup: largest distinct v' <= v - delta (backward as-of)
    probe = with_c.withColumn("__b", F.col(order_col) - F.lit(delta))
    joined = asof_join(
        probe,
        per_v,
        left_on=part_cols[0] if len(part_cols) == 1 else part_cols[0],
        right_on=f"__r_{part_cols[0]}",
        left_ts="__b",
        right_ts="__rv",
        tiebreak=None,
        direction="backward",
    ) if len(part_cols) == 1 else _asof_multi(probe, per_v, part_cols)

    # C_lt(v - delta): the frame INCLUDES v-delta, so the subtrahend is
    # the prefix strictly below the boundary: C(v') - S(v') when
    # v' == v-delta (peers at the boundary are inside the frame), else
    # C(v'). Every term goes through coalesce: C(v') is NULL when all
    # agg values up to v' are NULL, S(v') when the boundary value's own
    # rows are all NULL (fuzz-caught: C - NULL nulled the subtrahend),
    # and both when no v' <= v-delta exists at all — in every case the
    # numeric contribution is 0.
    on_boundary = F.col("__rv_val") == F.col("__b")
    c_lt = F.coalesce(F.col("__Cv"), F.lit(0)) - F.when(
        on_boundary, F.coalesce(F.col("__Sv"), F.lit(0))
    ).otherwise(F.lit(0))
    cn_lt = F.coalesce(F.col("__Cnv"), F.lit(0)) - F.when(
        on_boundary, F.coalesce(F.col("__Snv"), F.lit(0))
    ).otherwise(F.lit(0))
    out_cols = [c for c in df.columns]
    cnt = (F.col("__Cn") - cn_lt).cast("long")
    # SQL sum over a frame with no non-null values is NULL, not 0 —
    # and C - C_lt would return 0 whenever the non-null mass sits
    # entirely below the frame
    s = F.when(cnt == 0, F.lit(None)).otherwise(
        F.coalesce(F.col("__C"), F.lit(0)) - c_lt
    )
    return joined.select(*out_cols, s.alias(sum_alias), cnt.alias(cnt_alias)).unionByName(
        nulls_out
    )


def _asof_multi(probe: DataFrame, per_v: DataFrame, part_cols: list[str]) -> DataFrame:
    """Multi-key as-of: fold extra partition keys into a composite
    string key (asof_join takes one key column)."""
    kp = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in part_cols])
    kr = F.concat_ws(
        "\x1f", *[F.col(f"__r_{c}").cast("string") for c in part_cols]
    )
    probe2 = probe.withColumn("__k", kp)
    per_v2 = per_v.withColumn("__rk", kr).drop(
        *[f"__r_{c}" for c in part_cols]
    )
    return asof_join(
        probe2,
        per_v2,
        left_on="__k",
        right_on="__rk",
        left_ts="__b",
        right_ts="__rv",
        tiebreak=None,
        direction="backward",
    ).drop("__k")
