"""Tests for operators/merge.py: upsert + SCD2 semantics."""

from __future__ import annotations

import datetime as dt


from bigquery_etl_spark.operators.merge import merge_upsert, scd2_apply, upsert_dataframe


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_upsert_dataframe(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    out = sorted(map(tuple, upsert_dataframe(target, updates, ["k"]).collect()))
    assert out == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_apply_delete_branch(spark):
    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.merge import merge_apply

    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    updates = spark.createDataFrame(
        [(2, "DEL"), (3, "C2"), (4, "d")], "k long, v string"
    )
    out = sorted(
        map(
            tuple,
            merge_apply(
                target, updates, ["k"], delete_cond=F.col("v") == "DEL"
            ).collect(),
        )
    )
    # 1 passes through, 2 deleted, 3 updated, 4 inserted
    assert out == [(1, "a"), (3, "C2"), (4, "d")]
    # insert=False: update/delete-only merge
    out2 = sorted(
        map(
            tuple,
            merge_apply(
                target, updates, ["k"], delete_cond=F.col("v") == "DEL", insert=False
            ).collect(),
        )
    )
    assert out2 == [(1, "a"), (3, "C2")]


def test_merge_apply_null_delete_cond(spark):
    """A NULL delete_cond must NOT delete: BigQuery's `WHEN MATCHED AND
    cond THEN DELETE` fires only on cond IS TRUE; NULL falls through to
    the UPDATE branch (ref: MERGE three-valued condition semantics)."""
    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.merge import merge_apply

    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    # flag: true -> delete, false -> update, NULL -> update (not delete!)
    updates = spark.createDataFrame(
        [(1, "A2", None), (2, "DEL", True), (3, "C2", False)],
        "k long, v string, flag boolean",
    )
    out = sorted(
        map(
            tuple,
            merge_apply(
                target,
                updates.select("k", "v"),
                ["k"],
                delete_cond=updates_flag_lookup(updates),
            ).collect(),
        )
    )
    assert out == [(1, "A2"), (3, "C2")]


def updates_flag_lookup(updates):
    """delete_cond expression evaluating to NULL for k=1 on the update
    rows: CASE WHEN v='DEL' THEN true WHEN v LIKE 'C%' THEN false END."""
    from pyspark.sql import functions as F

    return F.when(F.col("v") == "DEL", F.lit(True)).when(
        F.col("v").startswith("C"), F.lit(False)
    )


def test_merge_upsert_storage(spark, tmp_path):
    path = str(tmp_path / "tbl")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert merge_upsert(spark, first, path, ["k"]) == 2
    second = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    assert merge_upsert(spark, second, path, ["k"]) == 3
    out = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert out == [(1, "a"), (2, "B"), (3, "c")]
    # replay the same updates: idempotent
    assert merge_upsert(spark, second, path, ["k"]) == 3


def _snapshot(spark, path):
    return sorted(map(tuple, spark.read.parquet(path).collect()))


def test_merge_upsert_crash_recovery(spark, tmp_path):
    """A kill at ANY point of the staged swap must leave either the
    pre-merge or the post-merge snapshot — never a missing/torn table
    (the reference's at-least-once cursor bug class, ref main.py:132-142)."""
    import os
    import shutil

    from bigquery_etl_spark.operators.merge import recover_upsert

    path = str(tmp_path / "tbl")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    merge_upsert(spark, first, path, ["k"])
    pre = _snapshot(spark, path)
    second = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    staging, gc = f"{path}.staging", f"{path}.gc"

    # window 1: crash after staging written, before any rename —
    # recovery rolls back (table dir untouched, staging dropped)
    upsert_dataframe(spark.read.parquet(path), second, ["k"]).write.parquet(staging)
    assert recover_upsert(path) == "clean"
    assert not os.path.isdir(staging)
    assert _snapshot(spark, path) == pre

    # window 2: crash between rename(path, gc) and rename(staging, path)
    # — recovery rolls FORWARD (staging is complete)
    upsert_dataframe(spark.read.parquet(path), second, ["k"]).write.parquet(staging)
    os.rename(path, gc)
    assert recover_upsert(path) == "completed"
    post = [(1, "a"), (2, "B"), (3, "c")]
    assert _snapshot(spark, path) == post
    assert not os.path.isdir(gc) and not os.path.isdir(staging)

    # window 3: crash after rename(staging, path), before rmtree(gc)
    # — recovery just drops the stale snapshot
    shutil.copytree(path, gc)
    assert recover_upsert(path) == "clean"
    assert _snapshot(spark, path) == post

    # window 4: crash mid-write of staging (no _SUCCESS marker) with the
    # table renamed away — recovery rolls BACK to the gc snapshot
    shutil.copytree(path, staging)
    os.remove(os.path.join(staging, "_SUCCESS"))
    os.rename(path, gc)
    assert recover_upsert(path) == "rolled_back"
    assert _snapshot(spark, path) == post
    assert not os.path.isdir(gc) and not os.path.isdir(staging)

    # a fresh merge after each recovery is business as usual
    third = spark.createDataFrame([(4, "d")], "k long, v string")
    assert merge_upsert(spark, third, path, ["k"]) == 4


def test_scd2_apply(spark):
    current = spark.createDataFrame(
        [
            (1, "x", _ts("2024-01-01"), None),     # open, will change
            (2, "y", _ts("2024-01-01"), None),     # open, update equal -> stays open
            (3, "z", _ts("2023-01-01"), _ts("2024-01-01")),  # already closed
        ],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [
            (1, "x2", _ts("2024-06-01")),  # changed value
            (2, "y", _ts("2024-06-01")),   # unchanged value -> no-op
            (4, "new", _ts("2024-06-01")),  # brand-new key
        ],
        "k long, v string, ts timestamp",
    )
    out = scd2_apply(current, updates, ["k"], "ts", ["v"])
    rows = {(r.k, r.v): (r.valid_from, r.valid_to) for r in out.collect()}
    assert rows[(1, "x")] == (_ts("2024-01-01"), _ts("2024-06-01"))  # closed
    assert rows[(1, "x2")] == (_ts("2024-06-01"), None)  # new open version
    assert rows[(2, "y")] == (_ts("2024-01-01"), None)  # untouched open
    assert rows[(3, "z")][1] == _ts("2024-01-01")  # history preserved
    assert rows[(4, "new")] == (_ts("2024-06-01"), None)
    assert out.count() == 5


def test_snapshot_diff_change_types(spark):
    from bigquery_etl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, None, 40.0)],
        "k long, v string, x double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 value change, 3 NULL->value, 4 deleted, 5 inserted
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, v string, x double",
    )
    out = sorted(
        map(tuple, snapshot_diff(old, new, ["k"]).collect()),
        key=lambda r: (r[0], r[3]),
    )
    # sort is (key, _change_type): "update_postimage" < "update_preimage"
    assert out == [
        (2, "B", 20.0, "update_postimage"),
        (2, "b", 20.0, "update_preimage"),
        (3, "c", 30.0, "update_postimage"),
        (3, "c", None, "update_preimage"),
        (4, None, 40.0, "delete"),
        (5, "e", 50.0, "insert"),
    ]


def test_snapshot_diff_all_null_values_vs_missing(spark):
    # a row whose value columns are ALL NULL is still "present" — it
    # must diff as an update against real values, not as insert+delete
    from bigquery_etl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    types = sorted(r["_change_type"] for r in snapshot_diff(old, new, ["k"]).collect())
    assert types == ["update_postimage", "update_preimage"]
    # identical all-NULL rows emit nothing (NULL-safe equality)
    same = spark.createDataFrame([(1, None)], "k long, v string")
    assert snapshot_diff(old, same, ["k"]).count() == 0


def test_snapshot_diff_schema_mismatch(spark):
    import pytest

    from bigquery_etl_spark.operators.merge import snapshot_diff

    a = spark.createDataFrame([(1, "a")], "k long, v string")
    b = spark.createDataFrame([(1, "a", 1.0)], "k long, v string, x double")
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_diff(a, b, ["k"])


def test_versioned_table_diff(spark, tmp_path):
    from bigquery_etl_spark.sources.versioned import VersionedTable

    tbl = VersionedTable(spark, str(tmp_path / "t"))
    tbl.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    tbl.overwrite(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"))
    out = sorted(
        map(tuple, tbl.diff(1, 2, ["k"]).collect()), key=lambda r: (r[0], r[2])
    )
    assert out == [
        (1, "a", "delete"),
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (3, "c", "insert"),
    ]
