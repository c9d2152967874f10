"""Streaming maintenance of the persisted text index off the lake
commit log (r5): the C34 index subscribes to a `VersionedTable`'s
change feed the same way view maintenance does (view_stream.py), so
the search index follows the table with no batch re-index job — the
reference's poll loop (ref main.py:197-216) as index maintenance.

Delivery semantics, stated precisely: the posting append is
at-least-once (foreachBatch replays after a crash between the refresh
and the checkpoint commit), but search results are EFFECTIVELY-ONCE —
`search_text_index` resolves each (term, doc) to its newest
generation, and a replayed refresh re-appends the same tf under a new
generation, changing nothing a query can observe. A batch-id fence
skips already-applied batches on clean restarts so replays are
confined to the crash window; compaction (full rebuild) physically
drops the shadowed rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bigquery_etl_spark.operators.text_index import refresh_text_index


def start_index_maintenance_from_lake(
    spark: SparkSession,
    table_root: str,
    index_table: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    starting_version: int = 1,
) -> StreamingQuery:
    """Subscribe `index_table` to `table_root`'s change feed.

    Offsets are table versions (versioned_lake streaming source), so a
    checkpoint restart resumes at the exact commit. Each micro-batch
    routes insert/update_postimage rows to posting appends and
    delete/update_preimage ids to tombstones — one `refresh_text_index`
    call, one generation."""
    from bigquery_etl_spark.sources.lake_ds import VersionedLakeDataSource

    spark.dataSource.register(VersionedLakeDataSource)
    stream = (
        spark.readStream.format("versioned_lake")
        .option("path", table_root)
        .option("readChangeFeed", "true")
        .option("startingVersion", starting_version)
        .load()
    )
    fence = os.path.join(checkpoint_dir, "_index_applied_batch")

    def apply_batch(batch, batch_id: int) -> None:
        if os.path.exists(fence):
            with open(fence) as f:
                if batch_id <= int(f.read()):
                    return  # clean-restart replay: already applied
        ins = batch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, text_col)
        dels = batch.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col)
        refresh_text_index(
            batch.sparkSession,
            index_table,
            inserted=ins if not ins.isEmpty() else None,
            deleted_ids=dels if not dels.isEmpty() else None,
            id_col=id_col,
            text_col=text_col,
        )
        tmp = fence + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, fence)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_ivf_maintenance_from_lake(
    spark: SparkSession,
    table_root: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    starting_version: int = 1,
) -> StreamingQuery:
    """r6: the text-index maintenance stream transposed to the C35
    persisted IVF vector index — subscribe the index at ``index_path``
    to a VersionedTable's change feed. Same delivery contract: the
    list append is at-least-once, the probe path resolves each id to
    its newest surviving generation, so a crash-replayed refresh is
    invisible to every search; a batch-id fence confines replays to
    the crash window; compaction physically drops shadowed rows."""
    from bigquery_etl_spark.operators.similarity import refresh_ivf_index
    from bigquery_etl_spark.sources.lake_ds import VersionedLakeDataSource

    spark.dataSource.register(VersionedLakeDataSource)
    stream = (
        spark.readStream.format("versioned_lake")
        .option("path", table_root)
        .option("readChangeFeed", "true")
        .option("startingVersion", starting_version)
        .load()
    )
    fence = os.path.join(checkpoint_dir, "_ivf_applied_batch")

    def apply_batch(batch, batch_id: int) -> None:
        if os.path.exists(fence):
            with open(fence) as f:
                if batch_id <= int(f.read()):
                    return  # clean-restart replay: already applied
        ins = batch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, vec_col)
        dels = batch.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col)
        refresh_ivf_index(
            batch.sparkSession,
            index_path,
            inserted=ins if not ins.isEmpty() else None,
            deleted_ids=dels if not dels.isEmpty() else None,
            id_col=id_col,
            vec_col=vec_col,
        )
        tmp = fence + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, fence)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
