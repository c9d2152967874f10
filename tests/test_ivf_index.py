"""Persisted IVF vector-index MAINTENANCE (r6, VERDICT r5 item 3):
the text index's generations+tombstones model transposed to
operators/similarity.py — refresh ≡ rebuild under the same centroid
map, replayed refreshes invisible, CDF-fed batch + streaming
maintenance, compaction, and the plan shape that keeps it an index
(PartitionFilters pruning survives refreshes)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.operators.similarity import (
    build_ivf_index,
    compact_ivf_index,
    ivf_index_live,
    ivf_index_topk,
    refresh_ivf_index,
)

DIM = 8
K = 4  # centroids


def _vec(seed: int) -> list[float]:
    # deterministic pseudo-embedding, varied enough to spread clusters
    return [float(((seed * 37 + i * 11) % 19) - 9) / 9.0 for i in range(DIM)]


def _corpus(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


def _queries(spark, ids=(1, 5, 9)):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "query_id long, query_vec array<double>"
    )


def _canon(df):
    return sorted((r[0], r[1], round(r[2], 5), r[3]) for r in df.collect())


def _topk(spark, path, q, nprobe=K):  # probe ALL lists -> exact within live set
    return _canon(ivf_index_topk(spark, path, q, k=3, nprobe=nprobe, dim=DIM))


def test_refresh_insert_delete_update_equals_rebuild(spark, tmp_path):
    """insert + delete + update (delete+insert one id in one refresh,
    with a vector far enough to RE-ASSIGN lists) — search must equal a
    from-scratch rebuild of the final corpus under the SAME centroids."""
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(_corpus(spark, range(20)), path, n_centroids=K)

    ins = spark.createDataFrame(
        [(20, _vec(20)), (21, _vec(21)), (7, _vec(107))],  # 7 = update
        "vec_id long, embedding array<double>",
    )
    dels = spark.createDataFrame([(3,), (7,)], ["vec_id"])
    refresh_ivf_index(spark, path, inserted=ins, deleted_ids=dels)

    final_ids = [i for i in range(22) if i not in (3, 7)]
    final = _corpus(spark, final_ids).unionByName(
        spark.createDataFrame([(7, _vec(107))], "vec_id long, embedding array<double>")
    )
    fresh = str(tmp_path / "ivf_fresh")
    build_ivf_index(final, fresh, centroids=cents)

    q = _queries(spark)
    assert _topk(spark, path, q) == _topk(spark, fresh, q)
    # deleted id must be gone, updated id must carry the NEW vector
    live = {r.vec_id: list(r.embedding) for r in ivf_index_live(spark, path).collect()}
    assert 3 not in live and live[7] == _vec(107)
    assert set(live) == set(final_ids) | {7}


def test_replayed_refresh_is_invisible(spark, tmp_path):
    """At-least-once append, effectively-once read: re-applying the
    SAME refresh (foreachBatch crash replay) changes no search result."""
    path = str(tmp_path / "ivf")
    build_ivf_index(_corpus(spark, range(12)), path, n_centroids=K)
    ins = spark.createDataFrame(
        [(12, _vec(12))], "vec_id long, embedding array<double>"
    )
    dels = spark.createDataFrame([(2,)], ["vec_id"])
    refresh_ivf_index(spark, path, ins, dels)
    q = _queries(spark)
    before = _topk(spark, path, q)
    refresh_ivf_index(spark, path, ins, dels)  # the replay
    assert _topk(spark, path, q) == before


def test_refresh_preserves_partition_pruning(spark, tmp_path):
    """Maintenance must not cost the index its indexness: after a
    refresh the probe scan still carries PartitionFilters on __c."""
    path = str(tmp_path / "ivf")
    build_ivf_index(_corpus(spark, range(20)), path, n_centroids=K)
    refresh_ivf_index(
        spark,
        path,
        inserted=spark.createDataFrame(
            [(20, _vec(20))], "vec_id long, embedding array<double>"
        ),
    )
    df = ivf_index_topk(spark, path, _queries(spark, (1,)), k=3, nprobe=2, dim=DIM)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__c" in m.group(1), plan[:2000]


def test_fresh_index_plan_has_no_dedup_shuffle(spark, tmp_path):
    """The maintenance-aware read is GATED: a freshly-built index (no
    refreshes) keeps the original plan — no groupBy-on-id exchange."""
    path = str(tmp_path / "ivf")
    build_ivf_index(_corpus(spark, range(20)), path, n_centroids=K)
    df = ivf_index_topk(spark, path, _queries(spark, (1,)), k=3, nprobe=2, dim=DIM)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan


def test_maintained_off_lake_change_feed(spark, tmp_path):
    """End-to-end with the lakehouse CDF: build from a VersionedTable
    snapshot, commit an upsert + delete, feed changes() into
    refresh_ivf_index — search equals rebuild of the new snapshot."""
    from bigquery_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "emb"))
    t.create(_corpus(spark, range(16)))
    t.enable_change_feed(["vec_id"])
    v0 = t.latest_version()
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(t.read(), path, n_centroids=K)

    t.upsert(
        spark.createDataFrame(
            [(1, _vec(101)), (16, _vec(16))], "vec_id long, embedding array<double>"
        ),
        ["vec_id"],
    )
    t.overwrite(t.read().filter(F.col("vec_id") != 5))

    ch = t.changes(v0 + 1)
    refresh_ivf_index(
        spark,
        path,
        inserted=ch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select("vec_id", "embedding"),
        deleted_ids=ch.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select("vec_id"),
    )
    fresh = str(tmp_path / "ivf_fresh")
    build_ivf_index(t.read(), fresh, centroids=cents)
    q = _queries(spark)
    assert _topk(spark, path, q) == _topk(spark, fresh, q)


def test_streaming_ivf_maintenance_from_lake(spark, tmp_path):
    """The vector index subscribes to the change feed as a STREAM —
    commits made while the query runs land in the index."""
    from bigquery_etl_spark.sources.versioned import VersionedTable
    from bigquery_etl_spark.streaming.index_stream import (
        start_ivf_maintenance_from_lake,
    )

    t = VersionedTable(spark, str(tmp_path / "emb"))
    t.create(_corpus(spark, range(16)))
    t.enable_change_feed(["vec_id"])
    path = str(tmp_path / "ivf")
    # seed centroids from the initial snapshot; the stream replays the
    # create commit itself, so start from an EMPTY assigned set
    cents = build_ivf_index(
        _corpus(spark, range(16)).limit(0), path, n_centroids=K,
        centroids=build_ivf_index(t.read(), str(tmp_path / "seed"), n_centroids=K),
    )
    q = start_ivf_maintenance_from_lake(
        spark, t.root, path, str(tmp_path / "ckpt"), starting_version=1
    )
    try:
        q.processAllAvailable()
        t.upsert(
            spark.createDataFrame(
                [(2, _vec(102)), (16, _vec(16))],
                "vec_id long, embedding array<double>",
            ),
            ["vec_id"],
        )
        t.overwrite(t.read().filter(F.col("vec_id") != 9))
        q.processAllAvailable()
    finally:
        q.stop()
    fresh = str(tmp_path / "ivf_fresh")
    build_ivf_index(t.read(), fresh, centroids=cents)
    qs = _queries(spark)
    assert _topk(spark, path, qs) == _topk(spark, fresh, qs)


def test_compaction_drops_shadowed_rows_and_tombstones(spark, tmp_path):
    """OPTIMIZE: after compaction the files contain exactly the live
    rows (no generations, no tombstones) and, with retrain=False,
    every probe result is unchanged by construction."""
    import os

    path = str(tmp_path / "ivf")
    build_ivf_index(_corpus(spark, range(20)), path, n_centroids=K)
    refresh_ivf_index(
        spark,
        path,
        inserted=spark.createDataFrame(
            [(20, _vec(20)), (4, _vec(104))], "vec_id long, embedding array<double>"
        ),
        deleted_ids=spark.createDataFrame([(4,), (11,)], ["vec_id"]),
    )
    q = _queries(spark)
    before = _topk(spark, path, q)
    compact_ivf_index(spark, path, retrain=False)
    assert not os.path.exists(path + "_tombstones")
    assert not os.path.exists(path + "_gen")
    raw = spark.read.parquet(path)
    assert raw.count() == raw.select("vec_id").distinct().count() == 20
    assert {r.vec_id for r in raw.select("vec_id").collect()} == (
        set(range(20)) - {11}
    ) | {20}
    assert _topk(spark, path, q) == before
    # retraining recluster: live set identical, recall contract holds
    compact_ivf_index(spark, path, retrain=True)
    live = spark.read.parquet(path)
    assert live.count() == 20 and "__gen" in live.columns
