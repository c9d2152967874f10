"""As-of join (SURVEY.md §2 B18) — nearest-earlier-event join.

Spark has no native ASOF JOIN (DuckDB/BigQuery express it as a window
over a union / LATERAL). This implements the scalable rewrite:

  1. tag left rows (is_left=1) and right rows (is_left=0),
  2. union them on (key, ts) with each side's payload null-padded,
  3. one window per key ordered by (ts, is_left, tiebreak):
     ``last(right_payload, ignorenulls=True)`` carries the most recent
     right row forward onto each left row,
  4. keep left rows.

Semantics match DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND
l.ts >= r.ts``: each left row gets the right row with the greatest
``r.ts <= l.ts`` (equal timestamps DO match, because right rows sort
before left rows at the same ts); unmatched left rows keep NULLs.

Scale: ONE hash shuffle on the join key + a per-partition sort —
same cost as a sort-merge join, no range explosion, no driver
collection. Skewed keys are handled by AQE skew-join splitting since
the heavy op is a window over the shuffled partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: nearest right row per key.

    ``direction='backward'`` (default): latest right_ts <= left_ts —
    DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts``. ``'forward'``:
    earliest right_ts >= left_ts (implemented by running the same
    window over negated epoch ordering).

    ``tiebreak``: right-side column ordering rows that share ``right_ts``
    (the largest wins), making the match deterministic when the right side
    has duplicate timestamps per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_payload = [c for c in left.columns if c not in (left_on, left_ts)]
    r_payload = [c for c in right.columns if c not in (right_on, right_ts)]
    overlap = set(l_payload) & set(r_payload)
    if overlap:
        raise ValueError(f"ambiguous columns (rename first): {sorted(overlap)}")

    # The right payload travels as ONE struct, not per-column: the
    # carry-forward below uses last(..., ignorenulls=True), and with
    # per-column carries a legitimately-NULL payload value would be
    # back-filled from an OLDER right row (fuzz-caught via the
    # range-frame rewrite). A struct is NULL only on left rows, so the
    # whole matched row is carried or nothing is.
    from pyspark.sql import types as T

    rpay_t = T.StructType([right.schema[c] for c in r_payload])
    lu = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in l_payload],
        F.lit(None).cast(rpay_t).alias("__rpay"),
    )
    ru = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        F.struct(*[F.col(c) for c in r_payload]).alias("__rpay"),
    )

    # (ts, is_left) puts right rows (0) before left rows (1) at equal ts, so
    # equal timestamps match; tiebreak last orders right rows sharing a ts so
    # the largest-tiebreak row is the one carried forward (left rows have a
    # NULL tiebreak, which only reorders them among themselves — harmless).
    # Forward direction: same machinery over descending time (negated
    # exact epoch-micros — NOT double seconds, which drops µs at current
    # epoch magnitudes), so "last right row at-or-before" becomes
    # "first right row at-or-after".
    ldt = left.schema[left_ts].dataType
    if isinstance(ldt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        base_key = F.unix_micros(F.col("__ts").cast("timestamp"))
    else:
        base_key = F.col("__ts")
    ts_key = base_key if direction == "backward" else -base_key
    order = [ts_key, F.col("__is_left")]
    if tiebreak is not None:
        order.append(F.when(F.col("__is_left") == 0, F.col("__rpay")[tiebreak]))
    w = (
        W.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    filled = lu.unionByName(ru).select(
        "__key",
        "__ts",
        "__is_left",
        *[F.col(c) for c in l_payload],
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"),
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            "__key",
            "__ts",
            *[F.col(c) for c in l_payload],
            *[F.col("__rpay")[c].alias(c) for c in r_payload],
        )
        .withColumnRenamed("__key", left_on)
        .withColumnRenamed("__ts", left_ts)
    )
