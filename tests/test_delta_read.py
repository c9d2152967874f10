"""Pure-Python Delta Lake reader (r8, sources/delta_read.py): log
replay, export round-trip, partitioned reconstruction, time travel,
checkpoint handling, loud refusals."""

from __future__ import annotations

import json
import os

import pytest

from bigquery_etl_spark.sources.delta_read import DeltaReadError, read_delta


def _write_commit(log_dir: str, version: int, actions: list[dict]) -> None:
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta(schema_json: str, part_cols=()) -> dict:
    return {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": list(part_cols),
            "configuration": {},
        }
    }


def test_roundtrip_via_export_snapshot(spark, tmp_path):
    """export_snapshot writes a _delta_log; read_delta must open it and
    return the identical rows."""
    from bigquery_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt"))
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i) / 4) for i in range(50)],
        "id long, s string, v double",
    )
    t.create(df)
    out = str(tmp_path / "export")
    t.export_snapshot(out)
    got = read_delta(spark, out)
    assert sorted(r.id for r in got.collect()) == list(range(50))
    assert got.schema == df.schema


def test_log_replay_add_remove_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "dt")
    log = os.path.join(root, "_delta_log")
    os.makedirs(root, exist_ok=True)
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    b = spark.createDataFrame([(3, "c")], "id long, s string")
    a.coalesce(1).write.parquet(os.path.join(root, "fa"))
    b.coalesce(1).write.parquet(os.path.join(root, "fb"))
    fa = [f"fa/{n}" for n in os.listdir(os.path.join(root, "fa"))
          if n.endswith(".parquet")][0]
    fb = [f"fb/{n}" for n in os.listdir(os.path.join(root, "fb"))
          if n.endswith(".parquet")][0]
    schema_json = a.schema.json()
    _write_commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(schema_json),
        {"add": {"path": fa, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    _write_commit(log, 1, [
        {"add": {"path": fb, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    _write_commit(log, 2, [
        {"remove": {"path": fa, "dataChange": True}},
    ])
    assert sorted(r.id for r in read_delta(spark, root).collect()) == [3]
    assert sorted(
        r.id for r in read_delta(spark, root, version=1).collect()
    ) == [1, 2, 3]
    assert sorted(
        r.id for r in read_delta(spark, root, version=0).collect()
    ) == [1, 2]
    with pytest.raises(DeltaReadError, match="latest"):
        read_delta(spark, root, version=9)


def test_partition_columns_reconstruct(spark, tmp_path):
    """Partition values live only in the log; the reader re-attaches
    them as typed columns."""
    from pyspark.sql import types as T

    root = str(tmp_path / "pt")
    log = os.path.join(root, "_delta_log")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("day", T.DateType()),
    ])
    data = spark.createDataFrame([(1,), (2,)], "id long")
    data.coalesce(1).write.parquet(os.path.join(root, "d1"))
    data.coalesce(1).write.parquet(os.path.join(root, "d2"))
    f1 = [f"d1/{n}" for n in os.listdir(os.path.join(root, "d1"))
          if n.endswith(".parquet")][0]
    f2 = [f"d2/{n}" for n in os.listdir(os.path.join(root, "d2"))
          if n.endswith(".parquet")][0]
    _write_commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(schema.json(), part_cols=["day"]),
        {"add": {"path": f1, "partitionValues": {"day": "2024-01-01"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": f2, "partitionValues": {"day": "2024-01-02"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    got = read_delta(spark, root)
    assert got.schema == schema
    import datetime

    days = sorted({r.day for r in got.collect()})
    assert days == [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]
    assert got.count() == 4


def test_checkpoint_replay(spark, tmp_path):
    """_last_checkpoint + parquet checkpoint: versions at or below the
    checkpoint come from it, the JSON tail replays on top."""
    root = str(tmp_path / "ck")
    log = os.path.join(root, "_delta_log")
    data = spark.createDataFrame([(1,), (2,)], "id long")
    data.coalesce(1).write.parquet(os.path.join(root, "d1"))
    f1 = [f"d1/{n}" for n in os.listdir(os.path.join(root, "d1"))
          if n.endswith(".parquet")][0]
    schema_json = data.schema.json()
    os.makedirs(log, exist_ok=True)
    # checkpoint at version 1 carrying protocol+meta+add
    ck_schema = (
        "protocol struct<minReaderVersion int, minWriterVersion int>, "
        "metaData struct<id string, "
        "format struct<provider string>, schemaString string, "
        "partitionColumns array<string>, "
        "configuration map<string,string>>, "
        "add struct<path string, partitionValues map<string,string>, "
        "size long, modificationTime long, dataChange boolean>, "
        "remove struct<path string, dataChange boolean>"
    )
    ck_rows = [
        ({"minReaderVersion": 1, "minWriterVersion": 2}, None, None, None),
        (None, {"id": "t", "format": {"provider": "parquet"},
                "schemaString": schema_json, "partitionColumns": [],
                "configuration": {}}, None, None),
        (None, None, {"path": f1, "partitionValues": {}, "size": 1,
                      "modificationTime": 0, "dataChange": True}, None),
    ]
    ck_df = spark.createDataFrame(ck_rows, ck_schema)
    ck_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(log, "_tmp_ck")
    )
    src = [n for n in os.listdir(os.path.join(log, "_tmp_ck"))
           if n.endswith(".parquet")][0]
    os.rename(os.path.join(log, "_tmp_ck", src),
              os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 3}, f)
    # JSON tail: version 2 removes the file
    _write_commit(log, 2, [{"remove": {"path": f1, "dataChange": True}}])
    assert sorted(
        r.id for r in read_delta(spark, root, version=1).collect()
    ) == [1, 2]
    assert read_delta(spark, root).count() == 0


def test_refusals(spark, tmp_path):
    root = str(tmp_path / "rf")
    log = os.path.join(root, "_delta_log")
    schema_json = spark.createDataFrame([(1,)], "id long").schema.json()
    _write_commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"]}},
        _meta(schema_json),
    ])
    with pytest.raises(DeltaReadError, match="reader features"):
        read_delta(spark, root)
    root2 = str(tmp_path / "rf4")
    log2 = os.path.join(root2, "_delta_log")
    _write_commit(log2, 0, [
        {"protocol": {"minReaderVersion": 4, "minWriterVersion": 7}},
        _meta(schema_json),
    ])
    with pytest.raises(DeltaReadError, match="minReaderVersion"):
        read_delta(spark, root2)
    with pytest.raises(DeltaReadError, match="_delta_log"):
        read_delta(spark, str(tmp_path / "nope"))


def _one_parquet(df, d: str) -> str:
    import shutil

    tmp = d + ".dir"
    df.coalesce(1).write.parquet(tmp)
    part = [n for n in os.listdir(tmp) if n.endswith(".parquet")][0]
    os.makedirs(os.path.dirname(d), exist_ok=True)
    shutil.move(os.path.join(tmp, part), d)
    shutil.rmtree(tmp)
    return d


def test_deletion_vectors_all_storage_types(spark, tmp_path):
    """r9: DVs in 'p' (absolute path), 'i' (inline Z85) and 'u'
    (UUID-named file) storage all drop exactly the addressed
    ordinals."""
    import uuid as _uuid

    from bigquery_etl_spark.sources.delta_read import (
        serialize_roaring64,
        write_dv_file,
        z85_encode,
    )

    root = str(tmp_path / "dv")
    schema_json = spark.createDataFrame(
        [], "id long, s string"
    ).schema.json()
    f1 = _one_parquet(
        spark.createDataFrame(
            [(i, f"s{i}") for i in range(10)], "id long, s string"
        ).sortWithinPartitions("id"),
        os.path.join(root, "f1.parquet"),
    )
    # p: explicit file
    dv_p = write_dv_file(str(tmp_path / "dv_p.bin"), [1, 3, 5])
    # i: inline
    dv_i = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(serialize_roaring64([0, 9])),
        "cardinality": 2,
    }
    # u: uuid-named file under the table root
    u = _uuid.uuid4()
    dv_u_desc = write_dv_file(
        os.path.join(root, f"deletion_vector_{u}.bin"), [2]
    )
    dv_u = {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": dv_u_desc["sizeInBytes"],
        "cardinality": 1,
    }
    log = os.path.join(root, "_delta_log")
    for ver, dv in [(0, dv_p), (1, dv_i), (2, dv_u)]:
        actions = [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"]}},
            _meta(schema_json),
            {"add": {"path": "f1.parquet", "dataChange": True,
                     "deletionVector": dv}},
        ]
        _write_commit(log, ver, actions)
    # versions replay cumulatively; the LAST add wins for the path, so
    # read each version: v0 -> p (drop 1,3,5), v1 -> i (drop 0,9),
    # v2 -> u (drop 2)
    assert sorted(
        r.id for r in read_delta(spark, root, version=0).collect()
    ) == [0, 2, 4, 6, 7, 8, 9]
    assert sorted(
        r.id for r in read_delta(spark, root, version=1).collect()
    ) == [1, 2, 3, 4, 5, 6, 7, 8]
    assert sorted(
        r.id for r in read_delta(spark, root).collect()
    ) == [0, 1, 3, 4, 5, 6, 7, 8, 9]


def test_deletion_vector_checksum_and_magic_refuse(spark, tmp_path):
    from bigquery_etl_spark.sources.delta_read import (
        _dv_positions,
        write_dv_file,
    )

    p = str(tmp_path / "dv.bin")
    desc = write_dv_file(p, [1, 2])
    blob = bytearray(open(p, "rb").read())
    blob[7] ^= 0xFF  # corrupt the data
    open(p, "wb").write(bytes(blob))
    with pytest.raises(DeltaReadError, match="checksum"):
        _dv_positions(str(tmp_path), desc)
    with pytest.raises(DeltaReadError, match="storageType"):
        _dv_positions(str(tmp_path), {"storageType": "x"})


def test_column_mapping_name_mode(spark, tmp_path):
    """r9: column mapping — parquet carries PHYSICAL names (col-uuid),
    the reader re-attaches logical names, including the partition
    column whose partitionValues key is the physical name."""
    from pyspark.sql import types as T

    root = str(tmp_path / "cm")
    fields = [
        T.StructField(
            "id", T.LongType(), True,
            {"delta.columnMapping.id": 1,
             "delta.columnMapping.physicalName": "col-aaa"},
        ),
        T.StructField(
            "s", T.StringType(), True,
            {"delta.columnMapping.id": 2,
             "delta.columnMapping.physicalName": "col-bbb"},
        ),
        T.StructField(
            "part", T.IntegerType(), True,
            {"delta.columnMapping.id": 3,
             "delta.columnMapping.physicalName": "col-ccc"},
        ),
    ]
    schema = T.StructType(fields)
    for pv in (0, 1):
        _one_parquet(
            spark.createDataFrame(
                [(i, f"s{i}") for i in range(pv * 3, pv * 3 + 3)],
                "`col-aaa` long, `col-bbb` string",
            ),
            os.path.join(root, f"f{pv}.parquet"),
        )
    log = os.path.join(root, "_delta_log")
    meta = {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema.json(),
            "partitionColumns": ["part"],
            "configuration": {"delta.columnMapping.mode": "name"},
        }
    }
    _write_commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"]}},
        meta,
        {"add": {"path": "f0.parquet", "dataChange": True,
                 "partitionValues": {"col-ccc": "0"}}},
        {"add": {"path": "f1.parquet", "dataChange": True,
                 "partitionValues": {"col-ccc": "1"}}},
    ])
    got = read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == ["id", "s", "part"]
    rows = sorted((r.id, r.s, r.part) for r in got.collect())
    assert rows == [
        (0, "s0", 0), (1, "s1", 0), (2, "s2", 0),
        (3, "s3", 1), (4, "s4", 1), (5, "s5", 1),
    ]


_CK_SCHEMA = (
    "protocol struct<minReaderVersion int, minWriterVersion int, "
    "readerFeatures array<string>>, "
    "metaData struct<id string, "
    "format struct<provider string>, schemaString string, "
    "partitionColumns array<string>, "
    "configuration map<string,string>>, "
    "add struct<path string, partitionValues map<string,string>, "
    "size long, modificationTime long, dataChange boolean>, "
    "remove struct<path string, dataChange boolean>, "
    "sidecar struct<path string, sizeInBytes long>"
)


def _ck_row(protocol=None, meta=None, add=None, remove=None, sidecar=None):
    return (protocol, meta, add, remove, sidecar)


def _write_ck_parquet(spark, rows, dest: str) -> None:
    _one_parquet(spark.createDataFrame(rows, _CK_SCHEMA), dest)


def test_multipart_checkpoint(spark, tmp_path):
    """r10: n.checkpoint.o.p.parquet part sets union into one
    checkpoint; an INCOMPLETE higher-version set is ignored per spec."""
    root = str(tmp_path / "mp")
    log = os.path.join(root, "_delta_log")
    data = spark.createDataFrame([(1,), (2,)], "id long")
    more = spark.createDataFrame([(3,)], "id long")
    f1 = os.path.basename(
        _one_parquet(data, os.path.join(root, "f1.parquet")))
    f2 = os.path.basename(
        _one_parquet(more, os.path.join(root, "f2.parquet")))
    schema_json = data.schema.json()
    meta = {"id": "t", "format": {"provider": "parquet"},
            "schemaString": schema_json, "partitionColumns": [],
            "configuration": {}}
    # checkpoint v1 split across 2 parts: part 1 = protocol+meta,
    # part 2 = both adds
    _write_ck_parquet(spark, [
        _ck_row(protocol={"minReaderVersion": 1, "minWriterVersion": 2}),
        _ck_row(meta=meta),
    ], os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    _write_ck_parquet(spark, [
        _ck_row(add={"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}),
        _ck_row(add={"path": f2, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}),
    ], os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    # JSON tail on top of the checkpoint
    _write_commit(log, 2, [{"remove": {"path": f1, "dataChange": True}}])
    assert sorted(r.id for r in read_delta(spark, root).collect()) == [3]
    assert sorted(
        r.id for r in read_delta(spark, root, version=1).collect()
    ) == [1, 2, 3]
    # incomplete multi-part set at v3 (part 1 of 2 only): IGNORED, the
    # complete v1 checkpoint + json tail still serve reads
    _write_ck_parquet(spark, [
        _ck_row(add={"path": "nope.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0,
                     "dataChange": True}),
    ], os.path.join(log, f"{3:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    _write_commit(log, 3, [])
    assert sorted(r.id for r in read_delta(spark, root).collect()) == [3]


def test_v2_checkpoint_parquet_sidecar(spark, tmp_path):
    """r10: UUID-named v2 parquet checkpoint whose adds live in a
    _sidecars/ parquet file referenced by a sidecar action."""
    root = str(tmp_path / "v2p")
    log = os.path.join(root, "_delta_log")
    data = spark.createDataFrame([(1,), (2,)], "id long")
    f1 = os.path.basename(
        _one_parquet(data, os.path.join(root, "f1.parquet")))
    meta = {"id": "t", "format": {"provider": "parquet"},
            "schemaString": data.schema.json(), "partitionColumns": [],
            "configuration": {}}
    _write_ck_parquet(spark, [
        _ck_row(add={"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}),
    ], os.path.join(log, "_sidecars", "sc-1.parquet"))
    _write_ck_parquet(spark, [
        _ck_row(protocol={"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"]}),
        _ck_row(meta=meta),
        _ck_row(sidecar={"path": "sc-1.parquet", "sizeInBytes": 1}),
    ], os.path.join(
        log,
        f"{0:020d}.checkpoint.7d17ac10-5cc3-401b-bd1a-a9f7ed077d5e.parquet",
    ))
    _write_commit(log, 1, [
        {"add": {"path": f1, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    assert sorted(r.id for r in read_delta(spark, root).collect()) == [1, 2]
    # missing sidecar refuses loudly
    os.remove(os.path.join(log, "_sidecars", "sc-1.parquet"))
    with pytest.raises(DeltaReadError, match="sidecar missing"):
        read_delta(spark, root)


def test_v2_checkpoint_json(spark, tmp_path):
    """r10: v2 checkpoints may be JSON-lines action files."""
    root = str(tmp_path / "v2j")
    log = os.path.join(root, "_delta_log")
    data = spark.createDataFrame([(7,), (8,)], "id long")
    f1 = os.path.basename(
        _one_parquet(data, os.path.join(root, "f1.parquet")))
    os.makedirs(log, exist_ok=True)
    ck = os.path.join(
        log, f"{0:020d}.checkpoint.1b2e6d27-8a3f-49a5-9a61-0f5f3e2a9b10.json"
    )
    with open(ck, "w") as f:
        for a in [
            {"checkpointMetadata": {"version": 0}},
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"]}},
            _meta(data.schema.json()),
            {"add": {"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ]:
            f.write(json.dumps(a) + "\n")
    assert sorted(r.id for r in read_delta(spark, root).collect()) == [7, 8]


def test_huge_multipart_checkpoint_bounded_driver_memory(spark, tmp_path):
    """r11 (VERDICT r10 item 1): a 100k-action multi-part checkpoint —
    adds fat with per-file ``stats`` JSON, plus ~100k vacuum
    tombstones — must reconcile SPARK-SIDE: the driver collects only
    the pruned surviving file list, never the raw action rows. The
    checkpoint carries ~100 MB of stats strings; peak PYTHON
    allocation during the read stays under 64 MB (the old
    collect-everything replay materialized every action row as Python
    dicts, stats included)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tracemalloc

    root = str(tmp_path / "big")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    # 100 real live data files
    live_names = []
    for i in range(100):
        fn = f"part-{i:05d}.parquet"
        pq.write_table(
            pa.table({"id": pa.array([i], type=pa.int64())}),
            os.path.join(root, fn),
        )
        live_names.append(fn)
    schema_json = spark.createDataFrame([], "id long").schema.json()
    meta = {"id": "t", "format": {"provider": "parquet"},
            "schemaString": schema_json, "partitionColumns": [],
            "configuration": {}}
    # part 1: protocol + metaData + the 100 live adds (no stats col)
    _write_ck_parquet(spark, [
        _ck_row(protocol={"minReaderVersion": 1, "minWriterVersion": 2}),
        _ck_row(meta=meta),
    ] + [
        _ck_row(add={"path": fn, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True})
        for fn in live_names
    ], os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{4:010d}.parquet"))
    # parts 2-4: ~100k phantom adds with ~1 KB stats each, plus the
    # matching remove tombstones (pyarrow-written, heterogeneous
    # schema vs part 1 — mergeSchema covers real writers that split
    # action kinds across parts)
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
        ("stats", pa.string()),
    ])
    remove_t = pa.struct([("path", pa.string()), ("dataChange", pa.bool_())])
    filler = "x" * 960
    n_per_part, part_no = 33_300, 0
    for part_no in (2, 3, 4):
        base = (part_no - 2) * n_per_part
        adds, removes = [], []
        for j in range(base, base + n_per_part):
            p = f"gone-{j:07d}.parquet"
            adds.append({
                "path": p, "partitionValues": None, "size": 1,
                "modificationTime": 0, "dataChange": True,
                "stats": f'{{"numRecords":{j},"pad":"{filler}"}}',
            })
            removes.append(None)
        for j in range(base, base + n_per_part):
            adds.append(None)
            removes.append(
                {"path": f"gone-{j:07d}.parquet", "dataChange": True}
            )
        pq.write_table(
            pa.table({
                "add": pa.array(adds, type=add_t),
                "remove": pa.array(removes, type=remove_t),
            }),
            os.path.join(
                log,
                f"{1:020d}.checkpoint.{part_no:010d}.{4:010d}.parquet",
            ),
        )
    tracemalloc.start()
    got = read_delta(spark, root)
    total = got.agg({"id": "sum"}).collect()[0][0]
    n = got.count()
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 100 and total == sum(range(100))
    assert peak < 64 * 1024 * 1024, f"driver-side peak {peak} bytes"
