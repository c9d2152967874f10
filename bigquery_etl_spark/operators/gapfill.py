"""Time-series gap filling — BigQuery's ``GAP_FILL`` TVF.

Reference parity: BigQuery ``GAP_FILL(TABLE t, ts_column => …,
bucket_width => INTERVAL …, partitioning_columns => […],
value_columns => [(col, method), …])`` (a delegated-SQL surface of the
reference, main.py:21,49-50). Semantics implemented:

- the time axis is bucketed to a fixed-width grid anchored at
  ``origin`` (default Unix epoch); every partition's output covers the
  grid from its min to its max input bucket with NO holes;
- fill methods per value column: ``'null'`` (grid rows get NULL),
  ``'locf'`` (last observation carried forward), ``'linear'``
  (interpolation between the nearest observations either side, output
  DOUBLE — BigQuery requires a numeric column for linear too);
- duplicate bucketized timestamps within a partition refuse loudly
  (BigQuery: "the time series contains duplicate timestamps").

Scale shape: one hash aggregate per partition for the grid bounds
(``sequence()`` expands the grid INSIDE each task — no driver
collect), one shuffle for the grid⋈input equi-join, one sort for the
two fill windows (both frames share partitioning+ordering, so Spark
evaluates them in a single Window node chain without re-sorting). A
loud guard refuses partitions whose grid would exceed
``MAX_BUCKETS_PER_PARTITION`` — a grid that size belongs in a coarser
bucket_width, not in one task's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MICROS = {
    "MICROSECOND": 1,
    "MILLISECOND": 1_000,
    "SECOND": 1_000_000,
    "MINUTE": 60_000_000,
    "HOUR": 3_600_000_000,
    "DAY": 86_400_000_000,
}

MAX_BUCKETS_PER_PARTITION = 5_000_000

_METHODS = ("null", "locf", "linear")


def width_micros(n: int, unit: str) -> int:
    """Fixed-width bucket size in microseconds. MONTH/YEAR are not
    fixed-width and refuse (BigQuery's GAP_FILL likewise rejects
    non-constant widths)."""
    u = unit.upper()
    if u not in _MICROS:
        raise ValueError(
            f"GAP_FILL: bucket_width unit {unit!r} is not fixed-width "
            f"(supported: {', '.join(_MICROS)})"
        )
    if n <= 0:
        raise ValueError("GAP_FILL: bucket_width must be positive")
    return n * _MICROS[u]


def gap_fill(
    df: DataFrame,
    ts_col: str,
    width_us: int,
    partition_cols: list[str],
    value_cols: list[tuple[str, str]],
    origin_us: int = 0,
) -> DataFrame:
    """Fill gaps in ``df``'s time series; see module docstring.

    Output columns: ``partition_cols + [ts_col] + value column per
    entry in value_cols`` (BigQuery's output shape)."""
    for c, m in value_cols:
        if m not in _METHODS:
            raise ValueError(
                f"GAP_FILL: unknown fill method {m!r} for column "
                f"{c!r} (have: {', '.join(_METHODS)})"
            )
        if c not in df.columns:
            raise ValueError(f"GAP_FILL: no value column {c!r}")
    for c in [ts_col, *partition_cols]:
        if c not in df.columns:
            raise ValueError(f"GAP_FILL: no column {c!r}")

    parts = [F.col(c) for c in partition_cols]
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # floor to the grid: pmod keeps the floor correct left of origin
    bucket = (m - F.pmod(m - F.lit(origin_us), F.lit(width_us))).alias(
        "__gf_b"
    )
    src = df.select(
        *parts, bucket, *[F.col(c) for c, _ in value_cols]
    )

    bounds = src.groupBy(*partition_cols).agg(
        F.min("__gf_b").alias("__gf_lo"),
        F.max("__gf_b").alias("__gf_hi"),
        F.count(F.lit(1)).alias("__gf_n"),
        F.countDistinct("__gf_b").alias("__gf_ndv"),
    )
    checked_hi = (
        F.when(
            F.col("__gf_n") > F.col("__gf_ndv"),
            F.raise_error(
                "GAP_FILL: duplicate bucketized timestamps within a "
                "partition — aggregate the series to the bucket grid "
                "first"
            ).cast("long"),
        )
        .when(
            (F.col("__gf_hi") - F.col("__gf_lo")) / F.lit(width_us)
            >= F.lit(MAX_BUCKETS_PER_PARTITION),
            F.raise_error(
                f"GAP_FILL: a partition's grid exceeds "
                f"{MAX_BUCKETS_PER_PARTITION} buckets — use a coarser "
                f"bucket_width or finer partitioning_columns"
            ).cast("long"),
        )
        .otherwise(F.col("__gf_hi"))
    )
    grid = bounds.select(
        *partition_cols,
        F.explode(
            F.sequence(F.col("__gf_lo"), checked_hi, F.lit(width_us))
        ).alias("__gf_b"),
    )

    joined = grid.join(src, [*partition_cols, "__gf_b"], "left")

    w_back = (
        Window.partitionBy(*partition_cols)
        .orderBy("__gf_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*partition_cols)
        .orderBy("__gf_b")
        .rowsBetween(0, Window.unboundedFollowing)
    )

    out_vals = []
    for c, method in value_cols:
        v = F.col(c)
        if method == "null":
            out_vals.append(v.alias(c))
        elif method == "locf":
            out_vals.append(F.last(v, ignorenulls=True).over(w_back).alias(c))
        else:  # linear
            obs = F.when(
                v.isNotNull(),
                F.struct(
                    F.col("__gf_b").alias("t"), v.cast("double").alias("v")
                ),
            )
            prev = F.last(obs, ignorenulls=True).over(w_back)
            nxt = F.first(obs, ignorenulls=True).over(w_fwd)
            interp = prev["v"] + (nxt["v"] - prev["v"]) * (
                (F.col("__gf_b") - prev["t"])
                / (nxt["t"] - prev["t"])
            )
            out_vals.append(
                F.when(v.isNotNull(), v.cast("double"))
                .otherwise(
                    F.when(
                        prev.isNotNull() & nxt.isNotNull(), interp
                    )
                )
                .alias(c)
            )

    return joined.select(
        *partition_cols,
        F.timestamp_micros(F.col("__gf_b")).alias(ts_col),
        *out_vals,
    )
