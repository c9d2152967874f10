"""versioned_lake Python Data Source: filter-pushdown file skipping
over VersionedTable manifests (sources/lake_ds.py)."""

from __future__ import annotations

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In, LessThan

from bigquery_etl_spark.sources.lake_ds import (
    VersionedLakeDataSource,
    VersionedLakeReader,
    _file_survives,
)
from bigquery_etl_spark.sources.versioned import VersionedTable


@pytest.fixture()
def tbl(spark, tmp_path):
    """Three commits with disjoint k ranges, one file each."""
    t = VersionedTable(spark, str(tmp_path / "t"), stat_cols=("k",))
    mk = lambda lo: spark.createDataFrame(
        [(k, f"v{k}") for k in range(lo, lo + 100)], "k long, v string"
    ).coalesce(1)
    t.create(mk(0))
    t.append(mk(100))
    t.append(mk(200))
    return t


def test_pushdown_prunes_files_planner_level(spark, tbl):
    reader = VersionedLakeReader({"path": tbl.root}, tbl.read().schema)
    assert len(reader.partitions()) == 3
    kept = reader.pushFilters([GreaterThanOrEqual(("k",), 200)])
    # every filter handed back to Spark for exact post-scan eval
    assert [type(f) for f in kept] == [GreaterThanOrEqual]
    assert len(reader.partitions()) == 1

    r2 = VersionedLakeReader({"path": tbl.root}, tbl.read().schema)
    r2.pushFilters([EqualTo(("k",), 150), LessThan(("k",), 160)])
    assert len(r2.partitions()) == 1

    r3 = VersionedLakeReader({"path": tbl.root}, tbl.read().schema)
    r3.pushFilters([In(("k",), (5, 205))])
    assert len(r3.partitions()) == 2


def test_file_survives_edge_cases():
    entry = {"stats": {"k": [10, 20]}}
    assert _file_survives(entry, [EqualTo(("k",), 10)])
    assert not _file_survives(entry, [EqualTo(("k",), 9)])
    # incomparable literal type or missing stats column: keep the file
    assert _file_survives(entry, [EqualTo(("k",), "oops")])
    assert _file_survives(entry, [EqualTo(("other",), 1)])
    assert _file_survives({"stats": {}}, [LessThan(("k",), 0)])


def test_sql_reads_match_plain_scan(spark, tbl):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedLakeDataSource)
    df = (
        spark.read.format("versioned_lake")
        .option("path", tbl.root)
        .load()
        .where("k >= 195 AND k < 210")
    )
    assert sorted(r.k for r in df.collect()) == list(range(195, 210))
    # residual (non-pushable) predicates still applied exactly
    got = (
        spark.read.format("versioned_lake")
        .option("path", tbl.root)
        .load()
        .where("k % 100 = 7")  # not pushable: expression, not a column ref
        .count()
    )
    assert got == 3
    # time travel via option
    v1 = (
        spark.read.format("versioned_lake")
        .option("path", tbl.root)
        .option("version", 1)
        .load()
    )
    assert v1.count() == 100


def test_schema_evolution_nulls_for_old_files(spark, tbl):
    tbl.add_columns(
        __import__("pyspark.sql.types", fromlist=["StructType"]).StructType.fromDDL(
            "score double"
        )
    )
    tbl.append(
        spark.createDataFrame(
            [(300, "x", 1.5)], "k long, v string, score double"
        ).coalesce(1)
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedLakeDataSource)
    df = spark.read.format("versioned_lake").option("path", tbl.root).load()
    rows = {r.k: r.score for r in df.where("k IN (5, 300)").collect()}
    assert rows == {5: None, 300: 1.5}


# ---------------------------------------------------------------------------
# r5: change data feed — write-time capture + batch readChangeFeed +
# the versioned_lake STREAMING source (offsets = table versions).
# ---------------------------------------------------------------------------


@pytest.fixture()
def cdf_tbl(spark, tmp_path):
    """create(3 rows) → enable CDF → upsert(update k=2, insert k=4)."""
    t = VersionedTable(spark, str(tmp_path / "cdf"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    t.enable_change_feed(["k"])
    t.upsert(spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string"), ["k"])
    return t


def _canon(rows):
    return sorted((r.k, r.v, r._change_type, r._commit_version) for r in rows)


EXPECTED_V1_V3 = [
    (1, "a", "insert", 1),
    (2, "B", "update_postimage", 3),
    (2, "b", "insert", 1),
    (2, "b", "update_preimage", 3),
    (3, "c", "insert", 1),
    (4, "d", "insert", 3),
]


def test_batch_changes_api(spark, cdf_tbl):
    assert _canon(cdf_tbl.changes(1).collect()) == EXPECTED_V1_V3


def test_batch_read_change_feed_format(spark, cdf_tbl):
    spark.dataSource.register(VersionedLakeDataSource)
    df = (
        spark.read.format("versioned_lake")
        .option("path", cdf_tbl.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load()
    )
    assert _canon(df.collect()) == EXPECTED_V1_V3


def test_batch_cdf_ending_version_pins_that_versions_schema(spark, cdf_tbl):
    """ADVICE r5: with an explicit endingVersion, the change range is
    served under THAT version's schema (Delta semantics) — a column
    added after endingVersion must not appear as all-NULL history."""
    from pyspark.sql.types import LongType, StructField

    cdf_tbl.add_columns([StructField("extra", LongType(), True)])  # v4
    spark.dataSource.register(VersionedLakeDataSource)

    def cdf(**opts):
        r = (
            spark.read.format("versioned_lake")
            .option("path", cdf_tbl.root)
            .option("readChangeFeed", "true")
            .option("startingVersion", 1)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    old = cdf(endingVersion=3)
    assert "extra" not in old.columns
    assert _canon(old.collect()) == EXPECTED_V1_V3
    # no endingVersion -> latest schema (with the widened column, NULL)
    latest = cdf()
    assert "extra" in latest.columns
    assert latest.filter("extra IS NOT NULL").count() == 0


def test_change_feed_unavailable_for_precdf_overwrite(spark, tmp_path):
    from bigquery_etl_spark.sources.versioned import ChangeFeedUnavailable

    t = VersionedTable(spark, str(tmp_path / "nocdf"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.overwrite(spark.createDataFrame([(2, "b")], "k long, v string"))
    with pytest.raises(ChangeFeedUnavailable):
        t.changes(1).collect()
    # appends before CDF are still serveable: their change set IS the files
    t2 = VersionedTable(spark, str(tmp_path / "apponly"))
    t2.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t2.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    assert {r._change_type for r in t2.changes(1).collect()} == {"insert"}


def test_stream_replays_to_latest_snapshot(spark, cdf_tbl, tmp_path):
    """The batch-emulation invariant: folding ALL streamed change rows
    in version order reconstructs the v_latest snapshot exactly."""
    spark.dataSource.register(VersionedLakeDataSource)
    stream = (
        spark.readStream.format("versioned_lake")
        .option("path", cdf_tbl.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdf_replay")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import functions as F

    from pyspark.sql.window import Window

    got = spark.sql("SELECT * FROM cdf_replay")
    # last state per key: at the max version, a postimage/insert row
    # outranks the preimage/delete of the same commit; a delete/preimage
    # surviving at rank 1 means the key is gone from the snapshot
    prio = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), 1
    ).otherwise(0)
    w_last = got.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("k").orderBy(
                F.desc("_commit_version"), prio.desc()
            )
        ),
    )
    final = (
        w_last.filter(F.col("rank") == 1)
        .filter(F.col("_change_type").isin("insert", "update_postimage"))
        .select("k", "v")
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, cdf_tbl.read().collect())
    )


def test_stream_checkpoint_restart_exactly_once(spark, cdf_tbl, tmp_path):
    """Stop after consuming v1-v3, commit MORE versions, restart from
    the checkpoint: the restarted stream must deliver exactly the new
    commits once — no replay of v1-v3, no gap."""
    spark.dataSource.register(VersionedLakeDataSource)
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out")

    def run_once(qname):
        stream = (
            spark.readStream.format("versioned_lake")
            .option("path", cdf_tbl.root)
            .option("readChangeFeed", "true")
            .option("startingVersion", 1)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once("first")
    n_first = spark.read.parquet(out_dir).count()
    assert n_first == len(EXPECTED_V1_V3)

    cdf_tbl.append(spark.createDataFrame([(9, "z")], "k long, v string"))
    cdf_tbl.upsert(spark.createDataFrame([(9, "Z")], "k long, v string"), ["k"])
    run_once("second")
    rows = spark.read.parquet(out_dir).collect()
    assert _canon(rows) == sorted(
        EXPECTED_V1_V3
        + [(9, "z", "insert", 4),
           (9, "Z", "update_postimage", 5),
           (9, "z", "update_preimage", 5)]
    )


def test_stream_requires_read_change_feed_option(spark, cdf_tbl, tmp_path):
    spark.dataSource.register(VersionedLakeDataSource)
    q = (
        spark.readStream.format("versioned_lake")
        .option("path", cdf_tbl.root)
        .load()
        .writeStream.format("memory")
        .queryName("nope")
        .option("checkpointLocation", str(tmp_path / "c3"))
        .start()
    )
    # the refusal surfaces when the micro-batch engine plans the source
    with pytest.raises(Exception, match="readChangeFeed"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_vacuum_keeps_retained_change_files(spark, cdf_tbl):
    """VACUUM must not delete change files still referenced by retained
    manifests, and must delete those of dropped manifests."""
    import os

    cdf_tbl.append(spark.createDataFrame([(9, "z")], "k long, v string"))
    deleted = cdf_tbl.vacuum(retain_last=2)  # keep v3 (upsert w/ changes), v4
    assert any(d.startswith("data/") for d in deleted)
    # v3's captured change files survive and still serve
    assert _canon(cdf_tbl.changes(3, 3).collect()) == [
        (2, "B", "update_postimage", 3),
        (2, "b", "update_preimage", 3),
        (4, "d", "insert", 3),
    ]
