"""r7 O(change) commit-log protocol (sources/versioned.py — VERDICT r6
"What's missing" #1, Delta's log-deltas-plus-checkpoints model):

- append / partition-scoped rewrite manifests serialize ONLY their own
  change (``log`` + ``summary``), not the full file list;
- a full-snapshot manifest ("checkpoint") is written by create/
  overwrite and forced every CHECKPOINT_EVERY delta commits;
- readers resolve checkpoint + delta tail to the identical file set
  the old protocol materialized;
- vacuum materializes the oldest retained manifest before dropping the
  chain below it, so every retained version stays resolvable;
- pre-r7 manifests (full ``files`` everywhere) keep reading unchanged.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.sources.versioned import (
    CHECKPOINT_EVERY,
    VersionedTable,
    resolve_manifest_files,
)


def frame(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") * 2).alias("val")
    )


@pytest.fixture
def tbl(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"), stat_cols=("id",))


def test_append_manifest_is_delta_sized(spark, tbl):
    tbl.create(frame(spark, 0, 100))
    v2 = tbl.append(frame(spark, 100, 110, "b"))
    m1 = tbl._load_manifest(1)
    m2 = tbl._load_manifest(v2)
    assert m1.get("files") is not None and m1["ckpt_dist"] == 0
    assert m2.get("files") is None and m2["log"]["remove"] == []
    # the delta carries only the appended files
    assert {e["path"] for e in m2["log"]["add"]}.isdisjoint(
        {e["path"] for e in m1["files"]}
    )
    # summary is incrementally correct
    assert m2["summary"]["rows"] == 110
    assert m2["summary"]["n_files"] == m1["summary"]["n_files"] + len(
        m2["log"]["add"]
    )
    # resolution = checkpoint + tail
    assert {e["path"] for e in tbl.files(version=v2)} == {
        e["path"] for e in m1["files"]
    } | {e["path"] for e in m2["log"]["add"]}
    assert tbl.read(version=v2).count() == 110


def test_append_serialization_is_o_new_not_o_table(spark, tbl):
    """The on-disk manifest byte size of the Nth append must track the
    APPEND's file count, not the table's: protocol-level proof that a
    10^6-file table's append stays cheap."""
    tbl.create(frame(spark, 0, 10))
    sizes = []
    for i in range(1, 6):
        v = tbl.append(frame(spark, 10 * i, 10 * i + 10, f"t{i}"))
        if tbl._load_manifest(v).get("files") is None:
            sizes.append(os.path.getsize(tbl._manifest_path(v)))
    assert len(sizes) >= 4
    # each append adds the same number of files => flat manifest size
    # (old protocol: grows linearly with version)
    assert max(sizes) - min(sizes) < 0.2 * min(sizes)


def test_checkpoint_every_n_deltas(spark, tbl):
    tbl.create(frame(spark, 0, 10))
    full = []
    last = 1
    for i in range(CHECKPOINT_EVERY + 3):
        last = tbl.append(frame(spark, 0, 1, f"x{i}"))
        if tbl._load_manifest(last).get("files") is not None:
            full.append(last)
    assert full, "a periodic checkpoint must have been written"
    ck = tbl._load_manifest(full[0])
    assert ck["ckpt_dist"] == 0
    # checkpoint file set == resolved file set of its own version
    assert {e["path"] for e in ck["files"]} == {
        e["path"] for e in tbl.files(version=full[0])
    }
    assert tbl.read(version=last).count() == 10 + CHECKPOINT_EVERY + 3


def test_replace_partitions_commits_delta(spark, tmp_path):
    tbl = VersionedTable(spark, str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(90)],
        "k long, g string, amt double",
    )
    tbl.create(df, partition={"source": "g", "granularity": "identity"})
    repl = spark.createDataFrame([(1000, "b", -1.0)], "k long, g string, amt double")
    v2 = tbl.replace_partitions(repl, {"b"}, expected_base=1)
    m2 = tbl._load_manifest(v2)
    assert m2.get("files") is None
    # removes exactly the b-partition files, adds only the new ones
    old_b = {e["path"] for e in tbl.files(version=1) if e["part"] == "b"}
    assert set(m2["log"]["remove"]) == old_b
    assert all(e["part"] == "b" for e in m2["log"]["add"])
    got = tbl.read(version=v2)
    assert got.filter("g = 'b'").count() == 1
    assert got.count() == 61
    assert m2["summary"]["rows"] == 61


def test_vacuum_materializes_cutoff_and_history_survives(spark, tbl):
    tbl.create(frame(spark, 0, 10))
    for i in range(4):
        tbl.append(frame(spark, 10 + i, 11 + i, f"v{i}"))
    latest = tbl.latest_version()
    expect = {e["path"] for e in tbl.files(version=latest - 1)}
    deleted = tbl.vacuum(retain_last=2)
    cutoff = latest - 1
    cm = tbl._load_manifest(cutoff)
    assert cm.get("files") is not None  # materialized checkpoint
    assert {e["path"] for e in cm["files"]} == expect
    # both retained versions still read; deleted files are gone
    assert tbl.read(version=cutoff).count() == 13
    assert tbl.read(version=latest).count() == 14
    for p in deleted:
        assert not os.path.exists(os.path.join(tbl.root, p))
    # history keeps per-version rows from summaries
    hist = {h["version"]: h["rows"] for h in tbl.history()}
    assert hist[latest] == 14 and hist[cutoff] == 13


def test_pre_r7_manifest_still_reads(spark, tbl):
    """Migration path: a table whose manifests all carry full `files`
    (old protocol) resolves and extends under the new code."""
    tbl.create(frame(spark, 0, 20))
    v2 = tbl.append(frame(spark, 20, 30, "b"))
    # rewrite v2's manifest into the OLD format by hand
    m2 = tbl._load_manifest(v2)
    full = tbl.files(version=v2)
    legacy = {k: v for k, v in m2.items() if k not in ("log", "ckpt_dist", "summary")}
    legacy["files"] = full
    with open(tbl._manifest_path(v2), "w") as f:
        json.dump(legacy, f)
    from bigquery_etl_spark.sources import versioned

    versioned._FILES_CACHE.clear()
    assert tbl.read(version=v2).count() == 30
    assert tbl.history()[-1]["rows"] == 30
    # a new delta append chains off the legacy full manifest
    v3 = tbl.append(frame(spark, 30, 35, "c"))
    assert tbl._load_manifest(v3).get("files") is None
    assert tbl.read(version=v3).count() == 35


def test_resolver_matches_naive_replay(spark, tbl):
    tbl.create(frame(spark, 0, 10))
    for i in range(6):
        tbl.append(frame(spark, 10 + i, 12 + i, f"z{i}"))
    v = tbl.latest_version()
    got = {e["path"] for e in resolve_manifest_files(tbl._load_manifest(v), tbl._load_manifest)}
    # naive ground truth: union of create + every append's adds
    naive = {e["path"] for e in tbl._load_manifest(1)["files"]}
    for w in range(2, v + 1):
        m = tbl._load_manifest(w)
        naive |= {e["path"] for e in (m["log"]["add"] if m.get("files") is None else m["files"])}
    assert got == naive


def test_cdf_across_delta_manifests(spark, tmp_path):
    """changes_for_version on append commits reads the log's add set;
    the streaming lake_ds source plans the same partitions."""
    tbl = VersionedTable(spark, str(tmp_path / "c"))
    tbl.create(frame(spark, 0, 5))
    tbl.enable_change_feed(["id"])
    v = tbl.append(frame(spark, 5, 8, "b"))
    ch = tbl.changes_for_version(v)
    assert ch.count() == 3
    assert set(ch.select("_change_type").distinct().toPandas()["_change_type"]) == {
        "insert"
    }
    rng = tbl.changes(1, v)
    assert rng.count() == 8


def test_export_emits_valid_delta_log(spark, tmp_path):
    """r7 interop (VERDICT r6 item 5): export_snapshot writes a
    protocol-v1 Delta transaction log. Structural checks against the
    Delta spec (one protocol action, one metaData whose schemaString
    is the Spark schema JSON, add actions covering exactly the
    exported files with true sizes); if the DuckDB delta extension is
    installable (needs network — env-gated like the avro jar), also
    open it natively and check value parity."""
    import duckdb

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.create(frame(spark, 0, 12, "a").repartition(3))
    out = str(tmp_path / "exp")
    man = t.export_snapshot(out)
    log = os.path.join(out, "_delta_log", f"{0:020d}.json")
    assert os.path.exists(log)
    actions = [json.loads(line) for line in open(log)]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    metas = [a["metaData"] for a in actions if "metaData" in a]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(protos) == 1 and protos[0]["minReaderVersion"] == 1
    assert len(metas) == 1
    assert metas[0]["format"]["provider"] == "parquet"
    schema = json.loads(metas[0]["schemaString"])  # Spark schema JSON
    assert [f["name"] for f in schema["fields"]] == ["id", "tag", "val"]
    assert {a["path"] for a in adds} == {e["path"] for e in man["files"]}
    for a in adds:
        assert a["size"] == os.path.getsize(os.path.join(out, a["path"]))
        assert a["partitionValues"] == {} and a["dataChange"] is True
    # rows recorded in add.stats must sum to the snapshot row count
    total = sum(json.loads(a["stats"])["numRecords"] for a in adds)
    assert total == 12
    try:
        duckdb.sql("INSTALL delta; LOAD delta;")
    except Exception:
        pytest.skip("duckdb delta extension not installable offline")
    got = duckdb.sql(
        f"SELECT id, tag, val FROM delta_scan('{out}') ORDER BY id"
    ).fetchall()
    assert sorted(map(tuple, got)) == sorted(
        map(tuple, t.read().collect())
    )


def test_crash_artifacts_are_invisible_and_vacuumable(spark, tbl):
    """Torn writes under the r7 protocol: a stray manifest temp file
    (crash between write and link) must be invisible to readers; data
    files from a commit that never linked its manifest are orphans the
    next VACUUM removes; an interrupted vacuum checkpoint (temp
    written, os.replace never ran) leaves the chain resolvable."""
    tbl.create(frame(spark, 0, 10))
    v2 = tbl.append(frame(spark, 10, 15, "b"))
    # 1. stray manifest temp: crash between fsync and os.link
    stray = os.path.join(tbl._manifest_dir, ".tmp-deadbeef")
    with open(stray, "w") as f:
        f.write('{"version": 999, "files": []}')
    assert tbl.latest_version() == v2
    assert tbl.read().count() == 15
    # 2. data files written but manifest never linked: invisible, and
    # vacuum reclaims them (they're referenced by no retained manifest)
    orphan_dir = os.path.join(tbl.root, "data", "deadc0de")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-zzz.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    assert tbl.read().count() == 15  # explicit file list: orphan unseen
    deleted = tbl.vacuum(retain_last=10)  # retention keeps ALL versions
    assert "data/deadc0de/part-zzz.parquet" in deleted
    assert tbl.read(version=1).count() == 10  # nothing live was touched
    # 3. interrupted vacuum checkpoint: temp file exists, replace never
    # ran -> the delta chain still resolves and a retried vacuum works
    v3 = tbl.append(frame(spark, 15, 18, "c"))
    tmp = os.path.join(tbl._manifest_dir, ".tmp-interrupted")
    with open(tmp, "w") as f:
        json.dump(tbl._load_manifest(v3), f)
    assert tbl.read(version=v3).count() == 18
    tbl.vacuum(retain_last=1)
    assert tbl._load_manifest(v3).get("files") is not None  # materialized
    assert tbl.read().count() == 18


def test_delta_mirror_follows_live_table(spark, tmp_path):
    """r9 (VERDICT r8 item 5): VersionedTable(delta_mirror=True)
    mirrors EVERY commit into <root>/_delta_log, so external Delta
    engines follow the live table — the root itself is the Delta
    table (data files are already immutable relative-path parquet).
    Checks: per-commit log entries with correct add/remove diffs,
    continuity after reopening WITHOUT the flag (persisted prop),
    self-healing catch-up after a simulated crash, read_delta parity
    at every version, env-gated native DuckDB-delta read."""
    from bigquery_etl_spark.sources.delta_read import read_delta

    root = str(tmp_path / "mt")
    t = VersionedTable(spark, root, delta_mirror=True)
    t.create(frame(spark, 0, 10, "a"))
    t.append(frame(spark, 10, 13, "b"))
    # reopened without the flag: the persisted prop keeps mirroring
    t2 = VersionedTable(spark, root)
    up = frame(spark, 12, 15, "c")
    t2.upsert(up, keys=["id"])
    log_dir = os.path.join(root, "_delta_log")
    names = sorted(n for n in os.listdir(log_dir) if n.endswith(".json"))
    assert names == [f"{v:020d}.json" for v in range(3)]
    # v0 carries protocol + metaData; v2 (upsert) carries removes+adds
    a0 = [json.loads(x) for x in open(os.path.join(log_dir, names[0]))]
    assert sum("protocol" in a for a in a0) == 1
    assert sum("metaData" in a for a in a0) == 1
    a2 = [json.loads(x) for x in open(os.path.join(log_dir, names[2]))]
    assert any("remove" in a for a in a2) and any("add" in a for a in a2)
    # read_delta parity at every mirrored version
    for dv, internal in ((0, 1), (1, 2), (2, 3)):
        got = sorted(
            (r.id, r.tag) for r in read_delta(spark, root, version=dv)
            .select("id", "tag").collect()
        )
        want = sorted(
            (r.id, r.tag)
            for r in t2.read(version=internal).select("id", "tag").collect()
        )
        assert got == want, f"mirror v{dv} != internal v{internal}"
    # self-healing: delete the newest mirror entry (simulated crash
    # between manifest link and mirror write) — the next commit must
    # emit BOTH missing entries, leaving no gap
    os.unlink(os.path.join(log_dir, names[2]))
    t2.append(frame(spark, 20, 22, "d"))
    names2 = sorted(n for n in os.listdir(log_dir) if n.endswith(".json"))
    assert names2 == [f"{v:020d}.json" for v in range(4)]
    assert read_delta(spark, root).count() == t2.read().count()
    # restore also mirrors (a pure remove/add diff commit)
    t2.restore(2)
    assert read_delta(spark, root).count() == t2.read().count()
    import duckdb

    try:
        duckdb.sql("INSTALL delta; LOAD delta;")
    except Exception:
        pytest.skip("duckdb delta extension not installable offline")
    got = duckdb.sql(
        f"SELECT id, tag FROM delta_scan('{root}') ORDER BY id"
    ).fetchall()
    assert sorted(map(tuple, got)) == sorted(
        (r.id, r.tag) for r in t2.read().select("id", "tag").collect()
    )


def test_delta_mirror_writes_checkpoints_r11(spark, tmp_path):
    """r11: the live Delta mirror writes a classic parquet checkpoint
    + _last_checkpoint every 10 commits, so external readers (and our
    own read_delta) replay O(tail) instead of O(all commits). Proof:
    after deleting every JSON commit at or below the checkpoint,
    read_delta still reconstructs the exact current snapshot — the
    checkpoint alone carries the reconciled state."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from bigquery_etl_spark.sources.delta_read import read_delta
    from bigquery_etl_spark.sources.versioned import VersionedTable

    root = str(tmp_path / "ckm")
    t = VersionedTable(spark, root, delta_mirror=True)
    t.create(spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    for i in range(11):  # internal versions 2..12 -> delta 1..11
        t.append(spark.range(10 * (i + 1), 10 * (i + 2)).select(
            F.col("id"), (F.col("id") * 2).alias("v")))
    log = os.path.join(root, "_delta_log")
    ck = os.path.join(log, f"{9:020d}.checkpoint.parquet")
    assert os.path.exists(ck)
    with open(os.path.join(log, "_last_checkpoint")) as f:
        lc = _json.load(f)
    assert lc["version"] == 9
    n_total = 10 * 12
    got = read_delta(spark, root)
    assert got.count() == n_total
    # the acid test: drop every JSON commit <= the checkpoint; replay
    # must come from the checkpoint + the JSON tail only
    for v in range(0, 10):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    got2 = read_delta(spark, root)
    assert got2.count() == n_total
    assert got2.agg(F.sum("v")).collect()[0][0] == sum(
        2 * i for i in range(n_total)
    )
    # stable table id: the checkpoint's metaData matches the commits'
    ckm = spark.read.parquet(ck).filter(
        F.col("metaData").isNotNull()).collect()[0]
    assert ckm.metaData.id == t._mirror_table_id()
    # UPDATE-style rewrite after the checkpoint: removes apply on top
    t.overwrite(t.read().filter(F.col("id") < 50))
    assert read_delta(spark, root).count() == 50
