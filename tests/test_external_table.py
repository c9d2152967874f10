"""External tables (r6 C49 — BigQuery CREATE EXTERNAL TABLE, the
schema-on-read half of its ingestion surface; the reference's own load
path is a BigQuery load job, ref main.py:169-177, and external tables
are the zero-copy alternative BigQuery offers over the same files).

Contract under test: nothing is copied at CREATE; every query
re-resolves the uris so newly landed files are visible; explicit
column lists accept BigQuery type names; externals compose with lake
tables in one statement and appear in INFORMATION_SCHEMA."""

from __future__ import annotations

import csv
import os

import pytest

from bigquery_etl_spark.sources.lake_sql import LakeCatalog


def _write_csv(path: str, rows, header=("k", "v", "amt")):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


@pytest.fixture()
def ext(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    land = tmp_path / "landing"
    _write_csv(str(land / "a.csv"), [(1, "x", 10.5), (2, "y", 20.0)])
    cat.sql(
        f"CREATE EXTERNAL TABLE ev (k INT64, v STRING, amt FLOAT64) "
        f"OPTIONS(format='csv', uris=['{land}/*.csv'], "
        f"skip_leading_rows=1)"
    )
    return cat, land


def test_external_csv_reads_with_bq_types(spark, ext):
    cat, _ = ext
    rows = cat.sql("SELECT k, v, amt FROM ev ORDER BY k").collect()
    assert [tuple(r) for r in rows] == [(1, "x", 10.5), (2, "y", 20.0)]
    # BigQuery type names mapped: INT64 -> BIGINT etc.
    sch = dict(cat.sql("SELECT * FROM ev").dtypes)
    assert sch == {"k": "bigint", "v": "string", "amt": "double"}


def test_schema_on_read_sees_new_files(spark, ext):
    cat, land = ext
    assert cat.sql("SELECT COUNT(*) AS n FROM ev").collect()[0].n == 2
    _write_csv(str(land / "b.csv"), [(3, "z", 30.0)])
    # no DDL, no refresh — the next statement sees the landed file
    assert cat.sql("SELECT COUNT(*) AS n FROM ev").collect()[0].n == 3


def test_external_joins_lake_table(spark, ext, tmp_path):
    cat, _ = ext
    cat.create_table(
        "dim",
        str(tmp_path / "dim"),
        spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string"),
    )
    got = cat.sql(
        "SELECT e.k, d.name, e.amt FROM ev e JOIN dim d ON e.k = d.k "
        "ORDER BY e.k"
    ).collect()
    assert [(r.k, r.name) for r in got] == [(1, "one"), (2, "two")]


def test_external_parquet_inference_and_replace(spark, ext, tmp_path):
    cat, _ = ext
    pdir = str(tmp_path / "pq")
    spark.createDataFrame([(7, 70.0)], "k long, amt double").write.parquet(
        pdir
    )
    cat.sql(
        f"CREATE EXTERNAL TABLE ep OPTIONS(format='parquet', "
        f"uris=['{pdir}'])"
    )
    assert cat.sql("SELECT k FROM ep").collect()[0].k == 7
    with pytest.raises(ValueError, match="already exists"):
        cat.sql(
            f"CREATE EXTERNAL TABLE ep OPTIONS(format='parquet', "
            f"uris=['{pdir}'])"
        )
    cat.sql(
        f"CREATE OR REPLACE EXTERNAL TABLE ep OPTIONS(format='parquet', "
        f"uris=['{pdir}'])"
    )
    cat.sql("DROP EXTERNAL TABLE ep")
    assert "ep" not in cat.externals


def test_external_errors(spark, ext, tmp_path):
    cat, _ = ext
    with pytest.raises(ValueError, match="uris"):
        cat.sql("CREATE EXTERNAL TABLE bad OPTIONS(format='csv')")
    with pytest.raises(ValueError, match="not supported"):
        cat.sql(
            "CREATE EXTERNAL TABLE bad OPTIONS(format='orc', uris=['/x'])"
        )
    cat.create_table(
        "lt",
        str(tmp_path / "lt"),
        spark.createDataFrame([(1,)], "k long"),
    )
    with pytest.raises(ValueError, match="already a lake table"):
        cat.sql(
            "CREATE EXTERNAL TABLE lt OPTIONS(format='csv', uris=['/x'])"
        )


def test_information_schema_lists_external(spark, ext):
    cat, _ = ext
    rows = cat.sql(
        "SELECT table_name, table_type, total_rows "
        "FROM INFORMATION_SCHEMA.TABLES WHERE table_name = 'ev'"
    ).collect()
    assert len(rows) == 1
    assert rows[0].table_type == "EXTERNAL"
    assert rows[0].total_rows is None  # no scan, no manifest: unknown
