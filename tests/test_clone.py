"""Table clones + snapshots (r6 — BigQuery CREATE TABLE … CLONE /
CREATE SNAPSHOT TABLE on the delegated surface; reference main.py
delegates all table management to BigQuery). Clones hard-link data
files: O(#files) metadata ops, zero bytes moved, copy-on-write
divergence, vacuum-safe sharing."""

from __future__ import annotations

import os

import pytest

from bigquery_etl_spark.sources.lake_sql import LakeCatalog
from bigquery_etl_spark.sources.versioned import SnapshotReadOnly


def _cat(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, v string, amt long"
    )
    cat.create_table("src", str(tmp_path / "src"), df)
    return cat


def _rows(cat, name):
    return sorted(
        tuple(r) for r in cat.sql(f"SELECT * FROM {name}").collect()
    )


def test_clone_is_zero_copy_and_equal(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE dup CLONE src")
    assert _rows(cat, "dup") == _rows(cat, "src")
    # hard-link proof: every cloned data file shares its inode with the
    # source file (st_nlink >= 2) — nothing was copied
    dup = cat.tables["dup"]
    entries = dup.files()
    assert entries
    for e in entries:
        st = os.stat(os.path.join(dup.root, e["path"]))
        assert st.st_nlink >= 2
        src_st = os.stat(os.path.join(cat.tables["src"].root, e["path"]))
        assert st.st_ino == src_st.st_ino


def test_clone_at_version_and_system_time(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("INSERT INTO src SELECT 4, 'd', 40")
    cat.sql("CREATE TABLE old CLONE src VERSION AS OF 1")
    assert len(_rows(cat, "old")) == 3
    ts = cat.tables["src"]._load_manifest(1)["ts"]
    cat.sql(f"CREATE TABLE old2 CLONE src FOR SYSTEM_TIME AS OF '{ts}'")
    assert _rows(cat, "old2") == _rows(cat, "old")


def test_clone_diverges_copy_on_write(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE dup CLONE src")
    cat.sql("INSERT INTO src SELECT 4, 'd', 40")
    cat.sql("UPDATE dup SET amt = amt + 1 WHERE k = 1")
    assert len(_rows(cat, "src")) == 4
    assert _rows(cat, "dup") == [(1, "a", 11), (2, "b", 20), (3, "c", 30)]
    # source sees none of the clone's edits
    assert (1, "a", 10) in _rows(cat, "src")


def test_vacuumed_source_cannot_corrupt_clone(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE dup CLONE src")
    before = _rows(cat, "dup")
    # rewrite + vacuum the source: its old files are unlinked from the
    # source directory, but the clone's hard links keep the inodes alive
    cat.sql("UPDATE src SET amt = 0")
    removed = cat.sql("VACUUM src RETAIN 1").collect()
    assert removed  # something was actually unlinked
    assert _rows(cat, "dup") == before


def test_snapshot_table_is_read_only(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE SNAPSHOT TABLE snap CLONE src")
    with pytest.raises(SnapshotReadOnly):
        cat.sql("INSERT INTO snap SELECT 9, 'z', 90")
    with pytest.raises(SnapshotReadOnly):
        cat.tables["snap"].append(
            spark.createDataFrame([(9, "z", 90)], "k long, v string, amt long")
        )
    # restoring out of a snapshot = clone it back into a writable table
    cat.sql("CREATE TABLE restored CLONE snap")
    cat.sql("INSERT INTO restored SELECT 9, 'z', 90")
    assert len(_rows(cat, "restored")) == 4


def test_clone_carries_constraints(spark, tmp_path):
    from bigquery_etl_spark.sources.versioned import ConstraintViolation

    cat = _cat(spark, tmp_path)
    cat.sql("ALTER TABLE src ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    cat.sql("CREATE TABLE dup CLONE src")
    with pytest.raises(ConstraintViolation):
        cat.sql("INSERT INTO dup SELECT 9, 'z', -5")


def test_clone_errors(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE TABLE src CLONE src")
    from bigquery_etl_spark.sources.versioned import VersionNotFound

    with pytest.raises(VersionNotFound):
        cat.sql("CREATE TABLE dup CLONE src VERSION AS OF 99")


def test_query_level_system_time(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("INSERT INTO src SELECT 4, 'd', 40")
    ts = cat.tables["src"]._load_manifest(1)["ts"]
    got = cat.sql(
        "SELECT COUNT(*) AS n FROM src FOR SYSTEM_TIME AS OF "
        f"TIMESTAMP '{ts}'"
    ).collect()[0]["n"]
    assert got == 3
