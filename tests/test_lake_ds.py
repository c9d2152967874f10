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
