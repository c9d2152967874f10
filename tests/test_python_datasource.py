"""The `blockrange` Python Data Source (catalog-visible batch + stream).

Batch: spark.read.format("blockrange") plans one input partition per
≤max_blocks_per_call chunk and fetches over real HTTP from tasks.
Stream: spark.readStream.format("blockrange") polls the head, applies
the confirmation lag, and advances block-number offsets through Spark's
own commit log — the reference's poll loop as a first-class source.
"""

from __future__ import annotations

import pytest

from bigquery_etl_spark.pipeline.fixtures import START_BLOCK
from bigquery_etl_spark.sources.blockrange_ds import BlockRangeDataSource

from tests.rpc_stub import RpcStub, start_stub


@pytest.fixture()
def rpc_url(spark):
    spark.dataSource.register(BlockRangeDataSource)
    server, url = start_stub()
    yield url
    server.shutdown()


def _batch_reader(spark, url, start, end, max_blocks=8):
    return (
        spark.read.format("blockrange")
        .option("url", url)
        .option("start_block", start)
        .option("end_block", end)
        .option("max_blocks_per_call", max_blocks)
        .load()
    )


def test_batch_read_content_and_partitioning(spark, rpc_url):
    df = _batch_reader(spark, rpc_url, START_BLOCK, START_BLOCK + 19, max_blocks=8)
    # 20 blocks in ≤8-block chunks -> 3 partitions, fetched in parallel tasks
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 20 * 3  # 3 events/block (incl. the foreign one)
    assert df.schema.fieldNames() == [
        "block_number", "log_index", "address", "event_name", "listing_id", "ipfs_hash"
    ]
    # provider cap respected: no single getLogs call spans >8 blocks
    assert RpcStub.n_getlogs == 3


def test_batch_read_composes_with_relational_ops(spark, rpc_url):
    from pyspark.sql import functions as F

    from bigquery_etl_spark.pipeline.extract import MARKETPLACE_ADDRESS

    df = _batch_reader(spark, rpc_url, START_BLOCK, START_BLOCK + 9)
    per_block = (
        df.filter(F.col("address") == MARKETPLACE_ADDRESS)
        .groupBy("block_number")
        .count()
    )
    assert per_block.count() == 10
    assert all(r["count"] == 2 for r in per_block.collect())


def test_stream_offsets_follow_head_with_lag(spark, rpc_url, tmp_path):
    RpcStub.head = START_BLOCK + 13  # end = +9 after lag 4
    stream = (
        spark.readStream.format("blockrange")
        .option("url", rpc_url)
        .option("start_block", START_BLOCK)
        .option("lag", 4)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("br_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) c FROM br_stream").collect()[0].c
        assert n1 == 10 * 3  # blocks START..START+9

        # head advances: next micro-batch covers exactly the new window
        RpcStub.head = START_BLOCK + 20
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT min(block_number) lo, max(block_number) hi, count(*) c FROM br_stream"
        ).collect()[0]
        assert (rows.lo, rows.hi, rows.c) == (START_BLOCK, START_BLOCK + 16, 17 * 3)

        # head static -> no new data
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM br_stream").collect()[0].c == 17 * 3
    finally:
        q.stop()


def test_rpc_stream_drives_full_etl_pipeline(spark, rpc_url, tmp_path):
    """Capstone integration: the reference's ENTIRE service as one
    streaming query — blockrange source (poll + lag) → decode → enrich →
    flatten/explode → NDJSON staging + idempotent warehouse merges, with
    offsets in Spark's commit log. Head advances mid-flight; a query
    restart from the same checkpoint replays without duplicates."""
    from bigquery_etl_spark.pipeline.fixtures import make_ipfs_docs, make_raw_logs
    from bigquery_etl_spark.streaming.pipeline_stream import start_stream_pipeline_rpc

    docs = make_ipfs_docs(spark, make_raw_logs(spark, START_BLOCK, START_BLOCK + 60))
    wh = str(tmp_path / "wh")
    args = dict(
        ipfs_docs=docs,
        warehouse_dir=wh,
        staging_dir=str(tmp_path / "stage"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        lag=4,
    )
    RpcStub.head = START_BLOCK + 13  # window: START..START+9

    q = start_stream_pipeline_rpc(spark, rpc_url, START_BLOCK, **args)
    try:
        q.processAllAvailable()
        mk = spark.read.parquet(f"{wh}/marketplace_listings")
        assert mk.count() == 10 * 2  # 2 marketplace events/block, A4-filtered

        RpcStub.head = START_BLOCK + 20  # window grows to START+16
        q.processAllAvailable()
        mk = spark.read.parquet(f"{wh}/marketplace_listings")
        assert mk.count() == 17 * 2
    finally:
        q.stop()

    # Restart from the same checkpoint: committed offsets replay nothing;
    # idempotent merges keep (block_number, log_index) unique either way.
    q2 = start_stream_pipeline_rpc(spark, rpc_url, START_BLOCK, **args)
    try:
        q2.processAllAvailable()
        mk = spark.read.parquet(f"{wh}/marketplace_listings")
        assert mk.count() == 17 * 2
        assert mk.select("block_number", "log_index").distinct().count() == 17 * 2
    finally:
        q2.stop()
