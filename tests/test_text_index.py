"""Persisted inverted text index (operators/text_index.py): build-once
semantics, AND/OR search correctness vs a brute-force recompute, and
the bucket-pruning plan shape that makes it an index at all."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.operators.text_index import (
    build_text_index,
    ensure_text_index,
    search_text_index,
)

DOCS = [
    (1, "spark merge window merge"),
    (2, "spark window"),
    (3, "merge merge merge"),
    (4, "window"),
    (5, "spark spark spark spark"),
    (6, "other words only"),
]


@pytest.fixture(scope="module")
def index_table(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    build_text_index(docs, "doc_id", "text", "ti_test", n_buckets=16)
    return "ti_test"


def _brute(spark, terms, mode):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("tf_sum")
    )
    if mode == "all":
        per = per.filter(F.col("n_terms") == len(terms))
    return per.orderBy(
        F.col("n_terms").desc(), F.col("tf_sum").desc(), "doc_id"
    ).collect()


def test_or_search_matches_bruteforce(spark, index_table):
    got = search_text_index(spark, index_table, ["spark", "merge"], "any", 10)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in _brute(spark, ["spark", "merge"], "any")
    ]


def test_and_search_is_posting_intersection(spark, index_table):
    got = search_text_index(spark, index_table, ["spark", "window"], "all", 10)
    # docs 1 and 2 contain both; 4 and 5 contain only one
    assert [r["doc_id"] for r in got.collect()] == [1, 2]


def test_scan_prunes_to_query_term_buckets(spark, index_table):
    """The IN-filter on the bucket column must prune the physical scan
    — reading all buckets would make the 'index' a full corpus scan
    with extra steps."""
    df = search_text_index(spark, index_table, ["spark", "merge"], "any", 10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) <= 2 < int(m.group(2)) == 16


def test_search_restores_session_conf(spark, index_table):
    """ADVICE r5: the autoBucketedScan override must be scoped to the
    search — leaking it changes plan selection for every unrelated
    bucketed-table query on the shared session — while the returned
    DataFrame still carries the bucket-pruned cached plan."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prior = spark.conf.get(key, "true")
    df = search_text_index(spark, index_table, ["spark"], "any", 5)
    assert spark.conf.get(key) == prior
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan  # pruning survived the restore
    assert df.count() > 0


def test_ensure_builds_once_per_process(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    t1 = ensure_text_index(spark, docs, "doc_id", "text", str(tmp_path))
    v1 = spark.table(t1).count()
    # second call must reuse, not rebuild: drop the backing rows via a
    # marker column check instead — simplest observable: same name and
    # tableExists short-circuits (no exception from overwrite-in-use)
    t2 = ensure_text_index(spark, docs, "doc_id", "text", str(tmp_path))
    assert t1 == t2 and spark.table(t2).count() == v1


def test_unknown_terms_return_empty(spark, index_table):
    assert search_text_index(spark, index_table, ["absent"], "any", 10).count() == 0


def test_incremental_refresh_insert_delete_update(spark):
    """Lucene-style maintenance: appended postings are searchable,
    tombstoned docs vanish, and an update (delete+insert in ONE
    refresh) serves the NEW postings — the generation rule, not a
    blanket id mask."""
    from bigquery_etl_spark.operators.text_index import refresh_text_index

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    build_text_index(docs, "doc_id", "text", "ti_incr", n_buckets=16)

    # insert doc 7, delete doc 5, update doc 1 (merge-heavy -> spark-only)
    refresh_text_index(
        spark,
        "ti_incr",
        inserted=spark.createDataFrame(
            [(7, "spark spark merge"), (1, "spark")], ["doc_id", "text"]
        ),
        deleted_ids=spark.createDataFrame([(5,), (1,)], ["doc_id"]),
    )
    got = {
        r["doc_id"]: (r["n_terms"], r["tf_sum"])
        for r in search_text_index(
            spark, "ti_incr", ["spark", "merge"], "any", 10
        ).collect()
    }
    assert 5 not in got                      # deleted
    assert got[7] == (2, 3)                  # inserted
    assert got[1] == (1, 1)                  # updated: OLD postings masked
    # a later delete beats the earlier insert
    refresh_text_index(
        spark, "ti_incr", inserted=None,
        deleted_ids=spark.createDataFrame([(7,)], ["doc_id"]),
    )
    got2 = {r["doc_id"] for r in search_text_index(
        spark, "ti_incr", ["spark", "merge"], "any", 10).collect()}
    assert 7 not in got2 and 1 in got2


def test_refresh_preserves_bucket_pruning(spark):
    from bigquery_etl_spark.operators.text_index import refresh_text_index

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    build_text_index(docs, "doc_id", "text", "ti_prune2", n_buckets=16)
    refresh_text_index(
        spark, "ti_prune2",
        inserted=spark.createDataFrame([(8, "window window")], ["doc_id", "text"]),
        deleted_ids=None,
    )
    df = search_text_index(spark, "ti_prune2", ["window"], "any", 10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) == 1, plan


def test_index_maintained_off_lake_change_feed(spark, tmp_path):
    """End-to-end composition with the r5 lakehouse CDF: build the
    index from a VersionedTable snapshot, commit an upsert (update +
    insert) and a delete, feed changes() into refresh_text_index, and
    the search must equal a from-scratch index of the new snapshot."""
    from bigquery_etl_spark.operators.text_index import refresh_text_index
    from bigquery_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "docs"))
    t.create(
        spark.createDataFrame(DOCS, "doc_id long, text string")
    )
    t.enable_change_feed(["doc_id"])
    v0 = t.latest_version()
    build_text_index(t.read(), "doc_id", "text", "ti_cdf", n_buckets=16)

    t.upsert(
        spark.createDataFrame(
            [(1, "window only now"), (9, "merge window")],
            "doc_id long, text string",
        ),
        ["doc_id"],
    )
    t.overwrite(t.read().filter(F.col("doc_id") != 3))  # delete doc 3

    ch = t.changes(v0 + 1)
    refresh_text_index(
        spark,
        "ti_cdf",
        inserted=ch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select("doc_id", "text"),
        deleted_ids=ch.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select("doc_id"),
    )

    build_text_index(t.read(), "doc_id", "text", "ti_cdf_fresh", n_buckets=16)
    for terms, mode in ([["merge", "window"], "any"], [["spark", "window"], "all"]):
        inc = [tuple(r) for r in search_text_index(
            spark, "ti_cdf", terms, mode, 20).collect()]
        fresh = [tuple(r) for r in search_text_index(
            spark, "ti_cdf_fresh", terms, mode, 20).collect()]
        assert inc == fresh, (terms, mode, inc, fresh)


def test_replayed_refresh_is_invisible_to_search(spark):
    """At-least-once append, effectively-once read: re-applying the
    SAME refresh (the foreachBatch crash-replay case) must not change
    any search result — newest generation wins per (term, doc)."""
    from bigquery_etl_spark.operators.text_index import refresh_text_index

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    build_text_index(docs, "doc_id", "text", "ti_replay", n_buckets=16)
    ins = spark.createDataFrame([(7, "spark merge")], ["doc_id", "text"])
    dels = spark.createDataFrame([(3,)], ["doc_id"])
    refresh_text_index(spark, "ti_replay", ins, dels)
    before = [tuple(r) for r in search_text_index(
        spark, "ti_replay", ["spark", "merge"], "any", 20).collect()]
    refresh_text_index(spark, "ti_replay", ins, dels)  # the replay
    after = [tuple(r) for r in search_text_index(
        spark, "ti_replay", ["spark", "merge"], "any", 20).collect()]
    assert before == after


def test_streaming_index_maintenance_from_lake(spark, tmp_path):
    """The index subscribes to the lake change feed as a STREAM:
    commits made while the query runs land in the index, and the
    result equals a from-scratch rebuild of the final snapshot."""
    from bigquery_etl_spark.sources.versioned import VersionedTable
    from bigquery_etl_spark.streaming.index_stream import (
        start_index_maintenance_from_lake,
    )

    t = VersionedTable(spark, str(tmp_path / "docs"))
    t.create(spark.createDataFrame(DOCS, "doc_id long, text string"))
    t.enable_change_feed(["doc_id"])
    # seed index from nothing: the stream replays from version 1, so
    # start with an EMPTY index table and let the feed build it
    build_text_index(
        spark.createDataFrame([], "doc_id long, text string"),
        "doc_id", "text", "ti_stream", n_buckets=16,
    )
    q = start_index_maintenance_from_lake(
        spark, str(tmp_path / "docs"), "ti_stream",
        str(tmp_path / "ckpt"), starting_version=1,
    )
    try:
        q.processAllAvailable()
        t.upsert(
            spark.createDataFrame(
                [(1, "window only now"), (9, "merge window")],
                "doc_id long, text string",
            ),
            ["doc_id"],
        )
        t.overwrite(t.read().filter(F.col("doc_id") != 3))
        q.processAllAvailable()
    finally:
        q.stop()
    build_text_index(t.read(), "doc_id", "text", "ti_stream_fresh", n_buckets=16)
    for terms, mode in ([["merge", "window"], "any"], [["spark", "window"], "all"]):
        inc = [tuple(r) for r in search_text_index(
            spark, "ti_stream", terms, mode, 20).collect()]
        fresh = [tuple(r) for r in search_text_index(
            spark, "ti_stream_fresh", terms, mode, 20).collect()]
        assert inc == fresh, (terms, mode, inc, fresh)


def test_full_rebuild_clears_tombstones(spark):
    from bigquery_etl_spark.operators.text_index import refresh_text_index

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    build_text_index(docs, "doc_id", "text", "ti_compact", n_buckets=16)
    refresh_text_index(
        spark, "ti_compact", inserted=None,
        deleted_ids=spark.createDataFrame([(1,)], ["doc_id"]),
    )
    assert 1 not in {r["doc_id"] for r in search_text_index(
        spark, "ti_compact", ["merge"], "any", 10).collect()}
    # rebuild = compaction: doc 1 is live again, stale tombstones gone
    build_text_index(docs, "doc_id", "text", "ti_compact", n_buckets=16)
    assert 1 in {r["doc_id"] for r in search_text_index(
        spark, "ti_compact", ["merge"], "any", 10).collect()}
