"""Incremental aggregate maintenance (materialized-view merge).

The warehouse pattern behind the reference's 15 s tick: instead of
recomputing a full aggregate over 100 TB each tick, keep the aggregate
table in MERGEABLE form (sum/count/min/max — avg derived at read time)
and fold each micro-batch in: new_state = merge(old_state, partial(batch)).
Work per tick is O(batch + |groups|), independent of history size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measure -> (batch partial, merge of two partials)
MERGEABLE = {
    "sum": (lambda c: F.sum(c), lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))),
    "count": (lambda c: F.count(c), lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))),
    "min": (lambda c: F.min(c), lambda a, b: F.least(a, b)),
    "max": (lambda c: F.max(c), lambda a, b: F.greatest(a, b)),
}


def partial_agg(batch: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate a batch into mergeable state. ``measures``:
    out_col -> (fn_name, in_col), fn in MERGEABLE."""
    aggs: list[Column] = []
    for out, (fn, col) in measures.items():
        if fn not in MERGEABLE:
            raise ValueError(f"{fn!r} is not a mergeable aggregate")
        aggs.append(MERGEABLE[fn][0](F.col(col)).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    state: DataFrame | None,
    batch_partial: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold a batch's partial aggregate into the running state.

    Full outer join on keys (new groups appear, old groups persist) +
    per-measure merge. One shuffle on the group keys, sized by
    |groups touched| — never by history volume."""
    if state is None:
        return batch_partial
    b = batch_partial.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(m).alias(f"__bm_{m}") for m in measures],
    )
    cond = [state[k].eqNullSafe(F.col(f"__bk_{k}")) for k in keys]
    joined = state.join(b, cond, "full")
    out_cols: list[Column] = [
        F.coalesce(state[k], F.col(f"__bk_{k}")).alias(k) for k in keys
    ]
    for m, (fn, _) in measures.items():
        merge = MERGEABLE[fn][1]
        out_cols.append(merge(state[m], F.col(f"__bm_{m}")).alias(m))
    return joined.select(*out_cols)


def apply_change_feed(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Retraction-aware materialized-view maintenance: fold a
    change-data-feed batch (``operators.merge.snapshot_diff`` /
    ``VersionedTable.diff`` output, ``_change_type`` column) into a
    keyed aggregate table. insert/update_postimage rows add, delete/
    update_preimage rows retract — so the maintained view equals a full
    recompute over the new snapshot, at O(batch + touched groups) cost.

    ``sums``: out_col -> input col, ADDITIVE measures only (SUM, and
    the row count maintained automatically as ``count_col``; AVG =
    sum/count at read time). MIN/MAX are deliberately unsupported:
    deleting the current minimum requires re-scanning the group, which
    is a recompute, not maintenance — use ``merge_agg_state`` for
    append-only feeds instead. Sum inputs should be exact types
    (decimal/int — see plans/_util.dec): float retraction drift
    accumulates across ticks and never cancels.

    Groups whose maintained row count reaches zero are REMOVED (a group
    you can no longer derive from the data must not linger with zeroed
    sums). One shuffle on the keys, sized by the change batch."""
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))
        # any other type (a Debezium-style 'update', a producer typo)
        # must FAIL the job, not silently drop out of the fold — a
        # skipped row diverges the view from the recompute with no
        # signal. raise_error fires lazily, only if such a row exists.
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_change_feed: unknown _change_type "),
                    F.col("_change_type"),
                )
            ).cast("int")
        )
    )
    signed = changes.withColumn("__sign", sign)
    delta = signed.groupBy(*keys).agg(
        *[F.sum(F.col(c) * F.col("__sign")).alias(out) for out, c in sums.items()],
        F.sum("__sign").cast("bigint").alias(count_col),
    )
    measures = {out: ("sum", c) for out, c in sums.items()}
    measures[count_col] = ("sum", count_col)
    merged = merge_agg_state(state, delta, keys, measures)
    return merged.filter(F.col(count_col) > 0)
