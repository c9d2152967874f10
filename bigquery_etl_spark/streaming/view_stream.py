"""Streaming materialized-view maintenance: a change-data-feed stream
(rows with ``_change_type`` — snapshot_diff / CDC-extract output) folds
into a keyed aggregate view stored in a PointerStore, exactly once.

Exactly-once is EPOCH FENCING, not hope: each micro-batch commits the
new view snapshot WITH its (app_id, batch_id) in the snapshot's atomic
commit metadata (``PointerStore`` writes ``_meta.json`` into the
snapshot dir before the pointer flip, so data+epoch are one atomic
commit). A replayed batch — crash after the view commit but before the
streaming checkpoint advanced, the exact window where the reference
double-loads (ref main.py:209-216) — sees its own id already committed
and becomes a no-op, so retractions are never applied twice. This is
the txn protocol Delta's ``txnAppId``/``txnVersion`` idempotent writes
use, filesystem edition — and the app identity matters as much as the
version: batch ids restart at 0 whenever the streaming checkpoint is
reset, so a bare batch-id fence would silently SKIP every batch of the
new incarnation (data loss), while blindly applying would double-fold
the retractions already in the view. Neither is acceptable, so a view
committed under a different ``app_id`` REFUSES to continue: reset the
view together with the checkpoint (one logical stream = one app_id =
one view lifetime), or pass the original app_id to keep fencing
against it.

Why batch-id fencing and not idempotent data: apply_change_feed is a
RETRACTING fold — applying a batch twice double-subtracts. Fencing is
the only correct idempotence for non-idempotent folds.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from bigquery_etl_spark.operators.incremental_agg import apply_change_feed
from bigquery_etl_spark.sources.pointer_store import PointerStore


class ViewIncarnationMismatch(Exception):
    """The stored view was maintained by a different stream incarnation
    (app_id mismatch): continuing would either skip or double-apply
    batches. Reset the view with the checkpoint, or reuse the app_id."""


def start_view_maintenance_stream(
    spark: SparkSession,
    changes_dir: str,
    changes_schema: StructType,
    view_root: str,
    checkpoint_dir: str,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n_rows",
    max_files_per_trigger: int = 1,
    app_id: str | None = None,
) -> StreamingQuery:
    """Maintain ``view_root`` from change-feed parquet files landing in
    ``changes_dir`` (schema must include ``_change_type``). Each tick:
    check the committed (app_id, batch_id) epoch → skip replays of this
    incarnation, refuse a FOREIGN incarnation's view → fold the batch
    with ``apply_change_feed`` → commit snapshot + epoch atomically.

    ``app_id`` names the logical stream; it defaults to the checkpoint
    path — normalized through ``os.path.realpath`` so the same physical
    checkpoint referenced via a different spelling (relative vs
    absolute, trailing slash, symlink) still names the same incarnation
    (ADVICE r3). The default is exactly as durable as the batch-id
    sequence it fences (same lifetime, same reset); pass an explicit
    ``app_id`` if the checkpoint may move between hosts/paths."""
    stream = (
        spark.readStream.schema(changes_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changes_dir)
    )
    return _start_fold(
        spark, stream, view_root, checkpoint_dir, keys, sums, count_col, app_id
    )


def start_view_maintenance_from_lake(
    spark: SparkSession,
    table_root: str,
    view_root: str,
    checkpoint_dir: str,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "n_rows",
    starting_version: int = 1,
    app_id: str | None = None,
) -> StreamingQuery:
    """View maintenance directly off the LAKE's commit log (r5): the
    change stream is ``readStream.format("versioned_lake")`` with
    ``readChangeFeed`` — no parquet drop-directory middleman, the view
    subscribes to the table itself. Offsets are table versions, so a
    checkpoint restart resumes at the exact commit; the epoch fence
    below is what makes the non-idempotent retracting fold exactly-once
    across the commit/checkpoint crash window."""
    from bigquery_etl_spark.sources.lake_ds import VersionedLakeDataSource

    spark.dataSource.register(VersionedLakeDataSource)
    stream = (
        spark.readStream.format("versioned_lake")
        .option("path", table_root)
        .option("readChangeFeed", "true")
        .option("startingVersion", starting_version)
        .load()
    )
    return _start_fold(
        spark, stream, view_root, checkpoint_dir, keys, sums, count_col, app_id
    )


def _start_fold(
    spark: SparkSession,
    stream,
    view_root: str,
    checkpoint_dir: str,
    keys: list[str],
    sums: dict[str, str],
    count_col: str,
    app_id: str | None,
) -> StreamingQuery:
    import os

    store = PointerStore(spark, view_root)
    app = app_id if app_id is not None else os.path.realpath(checkpoint_dir)

    def tick(batch, batch_id: int) -> None:
        meta = store.current_meta()
        if meta is not None:
            if meta.get("app_id") != app:
                raise ViewIncarnationMismatch(
                    f"view at {view_root} was committed by app_id="
                    f"{meta.get('app_id')!r}, this stream is {app!r}: "
                    "batch ids are not comparable across incarnations — "
                    "reset the view with the checkpoint, or pass the "
                    "original app_id. (Default app_ids are realpath-"
                    "normalized checkpoint paths; a view committed by an "
                    "older build, or a checkpoint that moved hosts/paths, "
                    "needs the original app_id passed explicitly.)"
                )
            if meta.get("batch_id", -1) >= batch_id:
                return  # replay of an already-committed epoch: fenced off
        state = (
            store.read()
            if store.exists()
            else _empty_state(batch, keys, sums, count_col)
        )
        new_state = apply_change_feed(state, batch, keys, sums, count_col)
        store.overwrite(new_state, meta={"app_id": app, "batch_id": batch_id})

    return (
        stream.writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _empty_state(batch, keys: list[str], sums: dict[str, str], count_col: str):
    """Zero-row aggregate table with the exact state schema the fold
    produces (keys + sum columns at their summed types + count)."""
    from pyspark.sql import functions as F

    return (
        batch.groupBy(*keys)
        .agg(
            *[F.sum(F.col(c)).alias(out) for out, c in sums.items()],
            *[
                F.count(F.col(c)).cast("bigint").alias(f"{out}__nn")
                for out, c in sums.items()
            ],
            F.count(F.lit(1)).cast("bigint").alias(count_col),
        )
        .limit(0)
    )
