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

    NULL exactness: SQL's SUM over a group whose inputs are all NULL is
    NULL, not 0 — so each sum column carries a hidden companion
    ``<out>__nn`` (net count of non-NULL contributing rows, itself
    additive and retractable) in the returned state. When the companion
    is 0 the sum is surfaced as NULL, so maintained == full recompute
    holds INCLUDING all-NULL groups (ADVICE r3). The ``__nn`` columns
    are part of the mergeable state — persist them with it; drop them
    at presentation time if the consumer only wants the view columns.

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
        *[
            F.coalesce(
                F.sum(F.when(F.col(c).isNotNull(), F.col("__sign"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"{out}__nn")
            for out, c in sums.items()
        ],
        F.sum("__sign").cast("bigint").alias(count_col),
    )
    # Seed missing __nn companions when the caller's initial state was
    # built by direct aggregation (no NULL bookkeeping). A non-NULL
    # stored sum proves ≥1 non-NULL row; count_col is the best available
    # stand-in for its exact count. This is approximate ONLY for states
    # whose groups mix NULL and non-NULL measure rows AND later retract
    # all the non-NULL ones — build the initial state through
    # apply_change_feed (insert-only feed) or supply __nn (e.g.
    # F.count(col)) for exact NULL semantics from tick zero.
    for out in sums:
        nn = f"{out}__nn"
        if nn not in state.columns:
            state = state.withColumn(
                nn,
                F.when(F.col(out).isNotNull(), F.col(count_col))
                .otherwise(F.lit(0))
                .cast("bigint"),
            )
    measures = {out: ("sum", c) for out, c in sums.items()}
    measures.update({f"{out}__nn": ("sum", c) for out, c in sums.items()})
    measures[count_col] = ("sum", count_col)
    merged = merge_agg_state(state, delta, keys, measures)
    # surface SQL NULL-sum semantics: a group whose surviving rows are
    # all NULL in the measure has __nn == 0 → its sum is NULL, exactly
    # as a full recompute would produce. (A NULL stored sum re-enters
    # the next merge as coalesce(NULL,0)=0, which is the correct raw
    # value: with __nn==0 every non-NULL contribution was retracted,
    # so the signed raw sum is 0.)
    out_cols: list[Column] = list(keys)
    for out in sums:
        out_cols.append(
            F.when(F.col(f"{out}__nn") > 0, F.col(out)).alias(out)
        )
        out_cols.append(F.col(f"{out}__nn"))
    out_cols.append(F.col(count_col))
    return merged.select(*out_cols).filter(F.col(count_col) > 0)
