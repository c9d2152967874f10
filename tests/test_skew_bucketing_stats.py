"""Tests: salted skew join correctness, bucketed no-shuffle join,
stats HTTP endpoint."""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import functions as F

from bigquery_etl_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # key 0 is hot: 500 of 520 left rows
    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, 1000 + k) for k in range(1, 21)],
        "k long, lv long",
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(0, 15)], "rk long, rv string")
    plain = left.join(right, left.k == right.rk).select("k", "lv", "rv")
    for kwargs in (
        {},  # salt everything
        {"hot_keys": [0]},  # salt only the hot key
        {"salt_source": "lv", "n_salts": 4},
    ):
        salted = salted_join(left, right, "k", "rk", **kwargs).select("k", "lv", "rv")
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(0, 1), (99, 2)], "k long, lv long")
    right = spark.createDataFrame([(0, "x")], "rk long, rv string")
    out = salted_join(left, right, "k", "rk", n_salts=4, how="left").select("k", "lv", "rv")
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(0, 1, "x"), (99, 2, None)]


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """write_bucketed co-locates join keys: the later join plans with NO
    Exchange on either side (the 100 TB recurring-join pattern)."""
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_orderpriority")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_stats_server_endpoint(spark, tmp_path):
    from bigquery_etl_spark.pipeline.cursor import CursorStore
    from bigquery_etl_spark.pipeline.fixtures import (
        START_BLOCK,
        make_ipfs_docs,
        make_raw_logs,
    )
    from bigquery_etl_spark.pipeline.runner import EtlBatchRunner
    from bigquery_etl_spark.pipeline.stats_server import StatsServer

    raw = make_raw_logs(spark, START_BLOCK, START_BLOCK + 4)
    docs = make_ipfs_docs(spark, raw)
    runner = EtlBatchRunner(
        spark,
        raw_logs_source=lambda lo, hi: raw.filter(F.col("block_number").between(lo, hi)),
        ipfs_docs=docs,
        head_fn=lambda: START_BLOCK + 4 + 4,
        warehouse_dir=str(tmp_path / "w"),
        staging_dir=str(tmp_path / "s"),
        cursor=CursorStore(spark, str(tmp_path / "c"), start_block=START_BLOCK - 1),
    )
    assert runner.run_once() is True
    server = StatsServer(runner)
    port = server.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as resp:
            body = json.loads(resp.read())
        assert body["num_marketplace_rows"] == 10
        assert body["cursor_block"] == START_BLOCK + 4
        assert body["num_errors"] == 0
        assert "uptime_sec" in body
    finally:
        server.stop()


def test_incremental_dedup_index_bucketed_probe(spark, sf_dir, tmp_path):
    """The C16 scale claim, demonstrated: store the corpus LSH index
    BUCKETED by (band, bucket) and the incremental probe join plans
    with NO Exchange on the (corpus-sized) index side — only the small
    batch side shuffles into the index's bucketing."""
    from bigquery_etl_spark.operators.dedup import minhash_index

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    spark.sql("DROP TABLE IF EXISTS lsh_idx_b")
    minhash_index(corpus, "doc_id", "text").write.bucketBy(
        8, "band", "bucket"
    ).mode("overwrite").saveAsTable("lsh_idx_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = spark.table("lsh_idx_b")
        probe = idx.select("band", "bucket").join(
            minhash_index(batch, "doc_id", "text"), ["band", "bucket"]
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # the stored index scans in place (bucketed, no Exchange above
        # it); every Exchange in the plan belongs to the batch side
        # (its own signature repartition + the recluster into the
        # index's bucketing). The index scan is the SMJ's left child,
        # printed before any Exchange.
        bucketed_scan = plan.index("Bucketed: true")
        assert "Exchange" not in plan[:bucketed_scan], plan
        assert plan.count("Exchange") == 2, plan
        probe.count()  # executes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS lsh_idx_b")
