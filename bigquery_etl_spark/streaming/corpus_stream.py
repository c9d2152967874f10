"""Streaming corpus ingestion: readStream over an incoming-documents
directory → per-micro-batch CorpusBuilder tick (quality → dedup →
hard-link append) via ``foreachBatch``.

Exactly-once without a transactional sink, the same argument as the
streaming ETL (pipeline_stream.py / ref main.py:209-216's bug class):
source offsets commit to the checkpoint only AFTER the batch function
returns, and ``CorpusBuilder.ingest`` is idempotent — a replayed batch
re-offers content whose hash is already stored, so the anti-join drops
every row and the re-run appends nothing. Crash at any point between
append and checkpoint therefore replays harmlessly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bigquery_etl_spark.pipeline.corpus import CorpusBuilder

INCOMING_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def start_corpus_stream(
    spark: SparkSession,
    incoming_dir: str,
    corpus_root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    near_dedup: bool = False,
) -> StreamingQuery:
    """Ingest parquet files landing in ``incoming_dir`` into the corpus
    at ``corpus_root``. Drive with processAllAvailable() in tests.

    ``near_dedup=True`` probes each micro-batch against the corpus's
    persisted LSH index (O(batch) work — see CorpusBuilder.ingest) and
    first runs ``repair_index()``: a crash between the corpus append
    and the index append leaves an index gap that a replayed batch
    cannot heal (its docs are exact-hash-dropped before the LSH
    stage), so the gap is repaired once at startup instead."""
    builder = CorpusBuilder(spark, corpus_root)
    if near_dedup:
        builder.repair_index()
    stream = (
        spark.readStream.schema(INCOMING_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(incoming_dir)
    )

    def tick(batch, _batch_id: int) -> None:
        builder.ingest(batch, near_dedup=near_dedup)

    return (
        stream.writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
