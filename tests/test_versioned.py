"""Versioned-table layer (sources/versioned.py): manifest commits,
snapshot isolation, time travel, optimistic concurrency, stats-based
file skipping, vacuum. This is the transaction protocol the reference
lacked (its §3.1 at-least-once bug: BigQuery load and cursor commit
were two separate visible steps, main.py:160-185 + 132-142)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.sources.versioned import (
    CommitConflict,
    VersionedTable,
    VersionNotFound,
)


@pytest.fixture
def tbl(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"), stat_cols=("id",))


def frame(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") * 2).alias("val")
    )


def test_create_append_time_travel(spark, tbl):
    assert tbl.latest_version() is None
    v1 = tbl.create(frame(spark, 0, 100, "a"))
    v2 = tbl.append(frame(spark, 100, 150, "b"))
    assert (v1, v2) == (1, 2)
    assert tbl.read().count() == 150
    assert tbl.read(version=1).count() == 100  # time travel
    assert {r.tag for r in tbl.read(version=1).select("tag").distinct().collect()} == {"a"}
    hist = tbl.history()
    assert [h["kind"] for h in hist] == ["create", "append"]
    assert hist[1]["rows"] == 150  # manifest carries cumulative live rows


def test_overwrite_keeps_old_snapshot_readable(spark, tbl):
    tbl.create(frame(spark, 0, 10, "a"))
    tbl.overwrite(frame(spark, 0, 3, "new"))
    assert tbl.read().count() == 3
    assert tbl.read(version=1).count() == 10  # snapshot isolation


def test_upsert_merge(spark, tbl):
    tbl.create(frame(spark, 0, 10, "a"))
    updates = frame(spark, 5, 12, "u")
    tbl.upsert(updates, ["id"])
    got = {r.id: r.tag for r in tbl.read().collect()}
    assert len(got) == 12
    assert got[3] == "a" and got[5] == "u" and got[11] == "u"


def test_stats_pruning_skips_files(spark, tbl):
    # 4 commits with disjoint id ranges -> 4+ files with disjoint stats
    tbl.create(frame(spark, 0, 100, "a").coalesce(1))
    for lo in (100, 200, 300):
        tbl.append(frame(spark, lo, lo + 100, "a").coalesce(1))
    all_files = tbl.files()
    pruned = tbl.files(prune=("id", 250, 260))
    assert len(all_files) == 4
    assert len(pruned) == 1  # only the [200,300) file survives
    df = tbl.read(prune=("id", 250, 260)).filter(F.col("id").between(250, 259))
    assert df.count() == 10


def test_empty_prune_returns_empty_frame_with_schema(spark, tbl):
    tbl.create(frame(spark, 0, 10, "a"))
    df = tbl.read(prune=("id", 1000, 2000))
    assert df.count() == 0
    assert set(df.columns) == {"id", "tag", "val"}


def test_commit_conflict_put_if_absent(spark, tbl, monkeypatch):
    tbl.create(frame(spark, 0, 10, "a"))
    stale = VersionedTable(spark, tbl.root, stat_cols=("id",))
    # stale writer resolved base=1, then a racing writer commits v2 first
    monkeypatch.setattr(stale, "latest_version", lambda: 1)
    tbl.append(frame(spark, 10, 20, "b"))
    with pytest.raises(CommitConflict):
        stale.append(frame(spark, 20, 30, "c"))
    assert tbl.latest_version() == 2  # racing writer's commit stands


def test_vacuum_drops_unreferenced_files(spark, tbl):
    tbl.create(frame(spark, 0, 10, "a"))
    tbl.overwrite(frame(spark, 0, 5, "b"))
    deleted = tbl.vacuum(retain_last=1)
    assert deleted  # v1's files are gone
    assert tbl.read().count() == 5  # current snapshot intact
    with pytest.raises(VersionNotFound):
        tbl.read(version=1)


def test_read_empty_table_raises(spark, tbl):
    with pytest.raises(VersionNotFound):
        tbl.read()


def test_append_schema_evolution_additive_and_guarded(spark, tmp_path):
    """r4: appends merge ADDITIVE nullable columns into the table
    schema (both directions read NULL where a file lacks a column);
    type changes and non-nullable additions are refused — immutable
    old files can't be reinterpreted or backfilled."""
    import pytest
    from pyspark.sql import types as T

    from bigquery_etl_spark.sources.versioned import (
        SchemaEvolutionError,
        VersionedTable,
    )

    t = VersionedTable(spark, str(tmp_path / "evo"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    # additive: new nullable column
    t.append(spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"))
    got = {r.k: (r.v, r.score) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}
    # append MISSING an old column: column survives in the schema,
    # this batch reads NULL for it (no silent drop)
    t.append(spark.createDataFrame([(3,)], "k long"))
    got = {r.k: (r.v, r.score) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5), 3: (None, None)}
    assert [f.name for f in t.read().schema.fields] == ["k", "v", "score"]

    with pytest.raises(SchemaEvolutionError, match="type change"):
        t.append(spark.createDataFrame([(4, 5)], "k long, v long"))
    nn = T.StructType(
        [T.StructField("k", T.LongType(), True),
         T.StructField("req", T.LongType(), False)]
    )
    with pytest.raises(SchemaEvolutionError, match="nullable"):
        t.append(spark.createDataFrame([(5, 6)], nn))


def test_concurrent_append_retries_and_succeeds(spark, tmp_path, monkeypatch):
    """r4: appends commute, so a version race retries with the
    already-written files instead of failing (Delta blind-append)."""
    from bigquery_etl_spark.sources.versioned import CommitConflict, VersionedTable

    t = VersionedTable(spark, str(tmp_path / "race"))
    t.create(spark.createDataFrame([(1,)], "k long"))

    real = VersionedTable._commit
    state = {"raced": False}

    def flaky(self, kind, files, schema):
        if kind == "append" and not state["raced"]:
            state["raced"] = True
            # a racing writer lands an append first, then our link fails
            real(t2, "append", t2._write_data(
                spark.createDataFrame([(2,)], "k long")), schema)
            raise CommitConflict("simulated os.link race")
        return real(self, kind, files, schema)

    t2 = VersionedTable(spark, str(tmp_path / "race"))
    monkeypatch.setattr(VersionedTable, "_commit", flaky)
    v = t.append(spark.createDataFrame([(3,)], "k long"))
    assert v == 3  # landed AFTER the racing writer's v2
    assert {r.k for r in t.read().collect()} == {1, 2, 3}


def test_history_and_timestamp_as_of_survive_vacuum(spark, tmp_path):
    """r5 (ADVICE): DESCRIBE HISTORY / TIMESTAMP AS OF go through
    history(), which used to load every manifest from v1 and raised
    VersionNotFound for any table that had been VACUUMed. It must now
    start at the oldest SURVIVING manifest (Delta behaves the same)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.create(frame(spark, 0, 10, "a"))
    t.overwrite(frame(spark, 0, 5, "b"))
    t.append(frame(spark, 100, 103, "c"))
    t.vacuum(retain_last=2)  # v1 manifest gone

    h = t.history()
    assert [x["version"] for x in h] == [2, 3]

    cat = LakeCatalog(spark)
    cat.register("t", t)
    hist = cat.sql("DESCRIBE HISTORY t").collect()
    assert {r.version for r in hist} == {2, 3}
    # TIMESTAMP AS OF far future resolves to the latest surviving commit
    got = cat.sql(
        "SELECT count(*) AS n FROM t TIMESTAMP AS OF '2099-01-01'"
    ).collect()
    assert got[0].n == 8


# ---------------------------------------------------------------------------
# r5: concurrency matrix — one interleave test per commit pair with the
# documented outcome (retry, CommitConflict, or reader-unaffected).
# ---------------------------------------------------------------------------


def test_optimize_racing_append_conflicts(spark, tmp_path, monkeypatch):
    """OPTIMIZE is a rewrite of the snapshot it read: a blind append
    landing mid-rewrite must surface CommitConflict (retrying OPTIMIZE
    later loses nothing — compaction is advisory), never drop the
    appended rows."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    t = cat.create_table("opt_t", str(tmp_path / "opt"), frame(spark, 0, 10, "a"))

    real = VersionedTable._commit
    state = {"raced": False}

    def flaky(self, kind, files, schema, **kw):
        if kind == "overwrite" and not state["raced"]:
            state["raced"] = True
            real(t2, "append", t2._write_data(frame(spark, 100, 101, "x")), schema)
        return real(self, kind, files, schema, **kw)

    t2 = VersionedTable(spark, t.root)
    monkeypatch.setattr(VersionedTable, "_commit", flaky)
    with pytest.raises(CommitConflict, match="snapshot moved"):
        cat.sql("OPTIMIZE opt_t")
    assert t2.read().count() == 11  # appended row survives


def test_alter_racing_append_retries_with_merged_schema(
    spark, tmp_path, monkeypatch
):
    """ALTER ADD COLUMNS landing between an append's schema merge and
    its commit: the append's blind-append retry loop re-merges against
    the new head, so it SUCCEEDS and the final schema carries both the
    altered column and the append's rows."""
    from pyspark.sql.types import LongType, StructField

    t = VersionedTable(spark, str(tmp_path / "alt"))
    t.create(frame(spark, 0, 5, "a"))
    t2 = VersionedTable(spark, t.root)

    real = VersionedTable._commit
    state = {"raced": False}

    def flaky(self, kind, files, schema, **kw):
        if kind == "append" and not state["raced"]:
            state["raced"] = True
            # the racing ALTER takes this version first
            t2.add_columns([StructField("extra", LongType(), True)])
            raise CommitConflict("simulated link race")
        return real(self, kind, files, schema, **kw)

    monkeypatch.setattr(VersionedTable, "_commit", flaky)
    v = t.append(frame(spark, 10, 12, "b"))
    assert v == 3  # landed after the ALTER's v2
    snap = t2.read()
    assert "extra" in snap.columns
    assert snap.count() == 7
    assert snap.filter("extra IS NULL").count() == 7


def test_vacuum_vs_inflight_reader_at_retention_boundary(spark, tmp_path):
    """Reader pinned INSIDE retention is unaffected by a concurrent
    VACUUM; a reader pinned PAST retention fails on collect (documented:
    vacuum, like Delta's, assumes no reader outlives the retention
    window — the plan was built before the files vanished)."""
    t = VersionedTable(spark, str(tmp_path / "vac"))
    t.create(frame(spark, 0, 10, "a"))
    t.overwrite(frame(spark, 0, 5, "b"))
    t.append(frame(spark, 50, 55, "c"))

    retained = t.read(version=3)   # plan built pre-vacuum, inside retention
    doomed = t.read(version=1)     # plan built pre-vacuum, past retention
    t.vacuum(retain_last=2)        # keeps v2, v3 files

    assert retained.count() == 10  # reader-unaffected
    with pytest.raises(Exception):  # files removed under the plan
        doomed.count()


def test_export_snapshot_reads_in_duckdb_and_reimports(spark, tmp_path):
    """r5 interop bridge: an exported snapshot is plain parquet DuckDB
    can read directly, value-identical to the VERSION AS OF read; the
    import leg reconstructs a table whose snapshot matches exactly."""
    import duckdb

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.create(frame(spark, 0, 10, "a").repartition(3))
    t.overwrite(frame(spark, 0, 6, "b").repartition(2))

    out = str(tmp_path / "export_v1")
    man = t.export_snapshot(out, version=1)
    assert man["source_version"] == 1 and len(man["files"]) >= 1

    want = sorted(map(tuple, t.read(version=1).collect()))
    got = duckdb.connect().execute(
        f"SELECT id, tag, val FROM read_parquet('{out}/*.parquet') ORDER BY id"
    ).fetchall()
    assert sorted(map(tuple, got)) == want

    back = VersionedTable.import_snapshot(spark, out, str(tmp_path / "back"))
    assert back.read().schema == t.read(version=1).schema
    assert sorted(map(tuple, back.read().collect())) == want


def test_restore_is_metadata_only_and_recovers_snapshot(spark, tbl):
    """RESTORE re-references v1's files (no rewrite), the restored read
    equals the original, and history keeps both the mistake and the
    recovery."""
    tbl.create(frame(spark, 0, 100, "base"))
    tbl.overwrite(frame(spark, 0, 3, "oops"))
    v = tbl.restore(1)
    assert sorted(r.id for r in tbl.read().collect()) == list(range(100))
    assert tbl._load_manifest(v)["files"] == tbl._load_manifest(1)["files"]
    kinds = [h["kind"] for h in tbl.history()]
    assert kinds.count("overwrite") == 2  # the oops and the restore


def test_restore_refused_past_vacuum_retention(spark, tbl):
    tbl.create(frame(spark, 0, 10, "base"))
    tbl.overwrite(frame(spark, 0, 3, "b"))
    tbl.overwrite(frame(spark, 0, 5, "c"))
    tbl.vacuum(retain_last=1)
    # refused either way VACUUM got there first: manifest gone
    # ("no version 1") or data files gone ("vacuumed")
    with pytest.raises(VersionNotFound, match="vacuumed|no version"):
        tbl.restore(1)


def test_restore_emits_change_feed_diff(spark, tbl):
    """With CDF on, a restore captures current->restored like any
    overwrite, so subscribers converge on the restored snapshot."""
    tbl.create(frame(spark, 0, 5, "base"))
    tbl.enable_change_feed(["id"])
    tbl.overwrite(frame(spark, 0, 2, "oops"))
    v = tbl.restore(1)
    ch = tbl.changes_for_version(v)
    inserted = {r.id for r in ch.filter("_change_type = 'insert'").collect()}
    assert inserted == {2, 3, 4}  # the rows the oops dropped come back


def test_check_constraint_enforced_on_every_write_path(spark, tbl):
    """ADD CONSTRAINT validates the standing snapshot; append/overwrite/
    upsert refuse violating batches whole; NULL satisfies (SQL CHECK);
    DROP lifts enforcement."""
    from bigquery_etl_spark.sources.versioned import ConstraintViolation

    tbl.create(frame(spark, 0, 10, "base"))
    tbl.add_constraint("val_nonneg", "val >= 0")
    bad = spark.createDataFrame([(100, "x", -5)], "id long, tag string, val long")
    with pytest.raises(ConstraintViolation, match="val_nonneg.*1 row"):
        tbl.append(bad)
    with pytest.raises(ConstraintViolation):
        tbl.upsert(bad, ["id"])
    with pytest.raises(ConstraintViolation):
        tbl.overwrite(bad)
    # NULL satisfies
    tbl.append(
        spark.createDataFrame([(101, "x", None)], "id long, tag string, val long")
    )
    # adding a constraint the standing data violates is refused
    with pytest.raises(ConstraintViolation):
        tbl.add_constraint("impossible", "val > 1000000")
    tbl.drop_constraint("val_nonneg")
    tbl.append(bad)  # enforcement lifted
    assert -5 in {r.val for r in tbl.read().collect()}


def test_restore_validates_later_constraints(spark, tbl):
    """RESTORE cannot resurrect rows around a constraint added after
    the target version."""
    from bigquery_etl_spark.sources.versioned import ConstraintViolation

    tbl.create(spark.createDataFrame(
        [(1, "a", -1)], "id long, tag string, val long"
    ))
    tbl.overwrite(spark.createDataFrame(
        [(1, "a", 5)], "id long, tag string, val long"
    ))
    tbl.add_constraint("val_nonneg", "val >= 0")
    with pytest.raises(ConstraintViolation):
        tbl.restore(1)


def test_constraint_added_during_append_retry_is_enforced(
    spark, tmp_path, monkeypatch
):
    """ADVICE r5 (versioned.py append retry): a racing ADD CONSTRAINT
    landing between an append's pre-write check and its commit must be
    re-enforced inside the retry loop — otherwise violating rows commit
    on top of (and inherit) the new constraint, breaking the
    'enforced on every write path' invariant."""
    from bigquery_etl_spark.sources.versioned import ConstraintViolation

    t = VersionedTable(spark, str(tmp_path / "racecons"))
    t.create(frame(spark, 0, 5, "a"))
    t2 = VersionedTable(spark, t.root)

    real = VersionedTable._commit
    state = {"raced": False}

    def flaky(self, kind, files, schema, **kw):
        if kind == "append" and not state["raced"]:
            state["raced"] = True
            t2.add_constraint("val_small", "val < 100")  # takes next version
            raise CommitConflict("simulated link race")
        return real(self, kind, files, schema, **kw)

    monkeypatch.setattr(VersionedTable, "_commit", flaky)
    bad = spark.createDataFrame(
        [(500, "b", 1000)], "id long, tag string, val long"
    )
    with pytest.raises(ConstraintViolation, match="val_small"):
        t.append(bad)
    # a clean retry path still succeeds (constraint satisfied)
    state["raced"] = False
    v = t.append(frame(spark, 10, 12, "b"))
    assert VersionedTable(spark, t.root).read().count() == 7
