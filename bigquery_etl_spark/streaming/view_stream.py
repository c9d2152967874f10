"""Streaming materialized-view maintenance: a change-data-feed stream
(rows with ``_change_type`` — snapshot_diff / CDC-extract output) folds
into a keyed aggregate view stored in a PointerStore, exactly once.

Exactly-once is EPOCH FENCING, not hope: each micro-batch commits the
new view snapshot WITH its batch id in the snapshot's atomic commit
metadata (``PointerStore`` writes ``_meta.json`` into the snapshot dir
before the pointer flip, so data+epoch are one atomic commit). A
replayed batch — crash after the view commit but before the streaming
checkpoint advanced, the exact window where the reference double-loads
(ref main.py:209-216) — sees its own id already committed and becomes a
no-op, so retractions are never applied twice. This is the same
txn-version protocol Delta's ``txnAppId``/``txnVersion`` idempotent
writes use, filesystem edition.

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
) -> StreamingQuery:
    """Maintain ``view_root`` from change-feed parquet files landing in
    ``changes_dir`` (schema must include ``_change_type``). Each tick:
    read committed epoch → skip if this batch already applied → fold
    the batch with ``apply_change_feed`` → commit snapshot + epoch
    atomically."""
    store = PointerStore(spark, view_root)

    stream = (
        spark.readStream.schema(changes_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changes_dir)
    )

    def tick(batch, batch_id: int) -> None:
        meta = store.current_meta()
        if meta is not None and meta.get("batch_id", -1) >= batch_id:
            return  # replay of an already-committed epoch: fenced off
        state = (
            store.read()
            if store.exists()
            else _empty_state(batch, keys, sums, count_col)
        )
        new_state = apply_change_feed(state, batch, keys, sums, count_col)
        store.overwrite(new_state, meta={"batch_id": batch_id})

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
            F.count(F.lit(1)).cast("bigint").alias(count_col),
        )
        .limit(0)
    )
