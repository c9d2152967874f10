"""Pure-Python Iceberg reader (r8, sources/iceberg_read.py): hand-built
v2 and v1 table layouts (metadata JSON + avro_py-written manifests),
snapshot time travel, deleted-entry handling, loud refusals."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from bigquery_etl_spark.sources.iceberg_read import (
    IcebergReadError,
    read_iceberg,
)

ICE_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "s", "required": False, "type": "string"},
    ],
}


def _one_avro(spark, df, out: str) -> None:
    """Write df as a SINGLE avro file at ``out`` via avro_py."""
    from bigquery_etl_spark.sources.avro_py import write_avro

    d = out + ".dir"
    write_avro(df.coalesce(1), d)
    part = [n for n in os.listdir(d) if n.endswith(".avro")][0]
    os.makedirs(os.path.dirname(out), exist_ok=True)
    shutil.move(os.path.join(d, part), out)
    shutil.rmtree(d)


def _manifest(spark, out: str, entries: list[tuple[int, str, int]]) -> None:
    """entries: (status, file_path, content)."""
    rows = [
        (st, {"content": c, "file_path": fp, "file_format": "PARQUET",
              "record_count": 0})
        for st, fp, c in entries
    ]
    df = spark.createDataFrame(
        rows,
        "status int, data_file struct<content int, file_path string, "
        "file_format string, record_count long>",
    )
    _one_avro(spark, df, out)


def _manifest_list(spark, out: str, manifests: list[str]) -> None:
    df = spark.createDataFrame(
        [(m, 0) for m in manifests], "manifest_path string, content int"
    )
    _one_avro(spark, df, out)


def _data_file(spark, root: str, name: str, rows) -> str:
    d = os.path.join(root, "data", name)
    spark.createDataFrame(rows, "id long, s string").coalesce(1) \
        .write.parquet(d)
    part = [n for n in os.listdir(d) if n.endswith(".parquet")][0]
    final = os.path.join(root, "data", f"{name}.parquet")
    shutil.move(os.path.join(d, part), final)
    shutil.rmtree(d)
    return final


@pytest.fixture()
def v2_table(spark, tmp_path):
    root = str(tmp_path / "ice")
    f1 = _data_file(spark, root, "f1", [(1, "a"), (2, "b")])
    f2 = _data_file(spark, root, "f2", [(3, "c")])
    m1 = os.path.join(root, "metadata", "m1.avro")
    m2 = os.path.join(root, "metadata", "m2.avro")
    _manifest(spark, m1, [(1, f1, 0)])
    _manifest(spark, m2, [(0, f1, 0), (1, f2, 0)])
    l1 = os.path.join(root, "metadata", "snap-1.avro")
    l2 = os.path.join(root, "metadata", "snap-2.avro")
    _manifest_list(spark, l1, [m1])
    _manifest_list(spark, l2, [m2])
    meta = {
        "format-version": 2,
        "table-uuid": "t",
        "schemas": [ICE_SCHEMA],
        "current-schema-id": 0,
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": l1},
            {"snapshot-id": 2, "manifest-list": l2},
        ],
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata",
                           "00002-abc.metadata.json"), "w") as f:
        json.dump(meta, f)
    return root


def test_v2_current_and_time_travel(spark, v2_table):
    got = read_iceberg(spark, v2_table)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    assert [f.name for f in got.schema.fields] == ["id", "s"]
    old = read_iceberg(spark, v2_table, snapshot_id=1)
    assert sorted(r.id for r in old.collect()) == [1, 2]
    with pytest.raises(IcebergReadError, match="snapshot 9"):
        read_iceberg(spark, v2_table, snapshot_id=9)


def test_deleted_entries_drop(spark, v2_table, tmp_path):
    """A manifest entry with status=2 (DELETED) must not be read."""
    root = v2_table
    m3 = os.path.join(root, "metadata", "m3.avro")
    f1 = os.path.join(root, "data", "f1.parquet")
    f2 = os.path.join(root, "data", "f2.parquet")
    _manifest(spark, m3, [(2, f1, 0), (0, f2, 0)])
    l3 = os.path.join(root, "metadata", "snap-3.avro")
    _manifest_list(spark, l3, [m3])
    meta_p = os.path.join(root, "metadata", "00002-abc.metadata.json")
    meta = json.load(open(meta_p))
    meta["snapshots"].append({"snapshot-id": 3, "manifest-list": l3})
    meta["current-snapshot-id"] = 3
    with open(os.path.join(root, "metadata",
                           "00003-abc.metadata.json"), "w") as f:
        json.dump(meta, f)
    assert sorted(
        r.id for r in read_iceberg(spark, root).collect()
    ) == [3]


def test_v1_inline_manifests_and_version_hint(spark, tmp_path):
    root = str(tmp_path / "ice1")
    f1 = _data_file(spark, root, "f1", [(7, "x")])
    m1 = os.path.join(root, "metadata", "m1.avro")
    _manifest(spark, m1, [(1, f1, 0)])
    meta = {
        "format-version": 1,
        "schema": ICE_SCHEMA,
        "current-snapshot-id": 5,
        "snapshots": [{"snapshot-id": 5, "manifests": [m1]}],
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "v5.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("5")
    got = read_iceberg(spark, root)
    assert [(r.id, r.s) for r in got.collect()] == [(7, "x")]


def _manifest_v2(spark, out, entries):
    """entries: (status, file_path, content, seq, equality_ids)."""
    rows = [
        (st, seq,
         {"content": c, "file_path": fp, "file_format": "PARQUET",
          "record_count": 0, "equality_ids": ids})
        for st, fp, c, seq, ids in entries
    ]
    df = spark.createDataFrame(
        rows,
        "status int, sequence_number long, "
        "data_file struct<content int, file_path string, "
        "file_format string, record_count long, equality_ids array<int>>",
    )
    _one_avro(spark, df, out)


def _pos_delete_file(spark, root, name, pairs):
    """pairs: (data_file_path, row_ordinal)."""
    d = os.path.join(root, "data", name)
    spark.createDataFrame(pairs, "file_path string, pos long") \
        .coalesce(1).write.parquet(d)
    part = [n for n in os.listdir(d) if n.endswith(".parquet")][0]
    final = os.path.join(root, "data", f"{name}.parquet")
    shutil.move(os.path.join(d, part), final)
    shutil.rmtree(d)
    return final


def _eq_delete_file(spark, root, name, rows, schema):
    d = os.path.join(root, "data", name)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    part = [n for n in os.listdir(d) if n.endswith(".parquet")][0]
    final = os.path.join(root, "data", f"{name}.parquet")
    shutil.move(os.path.join(d, part), final)
    shutil.rmtree(d)
    return final


def _v2_meta(root, snapshots, seq=None):
    meta = {
        "format-version": 2,
        "schemas": [ICE_SCHEMA],
        "current-schema-id": 0,
        "current-snapshot-id": snapshots[-1]["snapshot-id"],
        "snapshots": snapshots,
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)


def test_position_deletes_apply(spark, tmp_path):
    """r9: v2 position delete files drop exactly the addressed
    (file, ordinal) rows; data with seq > delete seq is untouched."""
    root = str(tmp_path / "icepd")
    f1 = _data_file(spark, root, "f1", [(1, "a"), (2, "b"), (3, "c")])
    f2 = _data_file(spark, root, "f2", [(4, "d")])
    pd1 = _pos_delete_file(spark, root, "pd1", [(f1, 0), (f1, 2)])
    m = os.path.join(root, "metadata", "m1.avro")
    _manifest_v2(spark, m, [
        (1, f1, 0, 1, None),   # data, seq 1
        (1, f2, 0, 3, None),   # data, seq 3 — AFTER the delete
        (1, pd1, 1, 2, None),  # position delete, seq 2
    ])
    lst = os.path.join(root, "metadata", "snap-1.avro")
    _manifest_list(spark, lst, [m])
    _v2_meta(root, [{"snapshot-id": 1, "manifest-list": lst,
                     "sequence-number": 3}])
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == [2, 4]  # rows 0 and 2 of f1 gone; f2 (newer) kept


def test_equality_deletes_respect_sequence(spark, tmp_path):
    """r9: equality deletes remove matching rows from STRICTLY OLDER
    data only — the Flink-CDC upsert pattern (delete key k, re-insert
    k in the same or later sequence) must keep the new row."""
    root = str(tmp_path / "iceeq")
    f1 = _data_file(spark, root, "f1", [(1, "old"), (2, "keep")])
    f2 = _data_file(spark, root, "f2", [(1, "new")])  # re-insert id=1
    ed = _eq_delete_file(spark, root, "ed1", [(1,)], "id long")
    m = os.path.join(root, "metadata", "m1.avro")
    _manifest_v2(spark, m, [
        (1, f1, 0, 1, None),   # old data, seq 1
        (1, ed, 2, 2, [1]),    # equality delete on field id 1 (= id)
        (1, f2, 0, 2, None),   # re-insert at seq 2: NOT deleted (2 !< 2)
    ])
    lst = os.path.join(root, "metadata", "snap-1.avro")
    _manifest_list(spark, lst, [m])
    _v2_meta(root, [{"snapshot-id": 1, "manifest-list": lst,
                     "sequence-number": 2}])
    got = sorted(
        (r.id, r.s) for r in read_iceberg(spark, root).collect()
    )
    assert got == [(1, "new"), (2, "keep")]


def test_mixed_deletes_and_refusals(spark, tmp_path):
    root = str(tmp_path / "icemx")
    f1 = _data_file(spark, root, "f1", [(1, "a"), (2, "b"), (3, "c")])
    pd1 = _pos_delete_file(spark, root, "pd1", [(f1, 1)])
    ed = _eq_delete_file(spark, root, "ed1", [(3,)], "id long")
    m = os.path.join(root, "metadata", "m1.avro")
    _manifest_v2(spark, m, [
        (1, f1, 0, 1, None),
        (1, pd1, 1, 2, None),
        (1, ed, 2, 2, [1]),
    ])
    lst = os.path.join(root, "metadata", "snap-1.avro")
    _manifest_list(spark, lst, [m])
    _v2_meta(root, [{"snapshot-id": 1, "manifest-list": lst,
                     "sequence-number": 2}])
    assert sorted(
        r.id for r in read_iceberg(spark, root).collect()
    ) == [1]
    # refusal: equality delete without equality_ids
    root2 = str(tmp_path / "icebad")
    g1 = _data_file(spark, root2, "g1", [(1, "a")])
    ed2 = _eq_delete_file(spark, root2, "ed2", [(1,)], "id long")
    m2 = os.path.join(root2, "metadata", "m1.avro")
    _manifest_v2(spark, m2, [
        (1, g1, 0, 1, None),
        (1, ed2, 2, 2, None),
    ])
    l2 = os.path.join(root2, "metadata", "snap-1.avro")
    _manifest_list(spark, l2, [m2])
    _v2_meta(root2, [{"snapshot-id": 1, "manifest-list": l2,
                      "sequence-number": 2}])
    with pytest.raises(IcebergReadError, match="equality_ids"):
        read_iceberg(spark, root2)


def test_numeric_metadata_version_sort(spark, tmp_path):
    """r9 ADVICE fix: v9 vs v11 must pick v11 (numeric, not lexical)."""
    root = str(tmp_path / "icev")
    f1 = _data_file(spark, root, "f1", [(1, "a")])
    f2 = _data_file(spark, root, "f2", [(2, "b")])
    m1 = os.path.join(root, "metadata", "m1.avro")
    m2 = os.path.join(root, "metadata", "m2.avro")
    _manifest(spark, m1, [(1, f1, 0)])
    _manifest(spark, m2, [(1, f2, 0)])
    base = {
        "format-version": 1,
        "schema": ICE_SCHEMA,
        "current-snapshot-id": 1,
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    old = dict(base, snapshots=[{"snapshot-id": 1, "manifests": [m1]}])
    new = dict(base, snapshots=[{"snapshot-id": 1, "manifests": [m2]}])
    with open(os.path.join(root, "metadata", "v9.metadata.json"), "w") as f:
        json.dump(old, f)
    with open(os.path.join(root, "metadata", "v11.metadata.json"), "w") as f:
        json.dump(new, f)
    got = read_iceberg(spark, root).collect()
    assert [r.id for r in got] == [2]  # v11, not lexicographic v9


def test_type_mapping():
    from pyspark.sql import types as T

    from bigquery_etl_spark.sources.iceberg_read import _iceberg_type

    st = _iceberg_type(
        {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "d", "required": True,
                 "type": "decimal(10,2)"},
                {"id": 2, "name": "ts", "required": False,
                 "type": "timestamptz"},
                {"id": 3, "name": "arr", "required": False,
                 "type": {"type": "list", "element": "long",
                          "element-required": True}},
            ],
        }
    )
    assert st["d"].dataType == T.DecimalType(10, 2)
    assert not st["d"].nullable
    assert st["ts"].dataType == T.TimestampType()
    assert st["arr"].dataType == T.ArrayType(T.LongType(), False)
    with pytest.raises(IcebergReadError, match="unsupported"):
        _iceberg_type("variant")
