"""INFORMATION_SCHEMA metadata views (r6 — BigQuery's
dataset.INFORMATION_SCHEMA.{TABLES,COLUMNS,TABLE_CONSTRAINTS} on the
delegated surface). Computed from manifests only: listing a 100 TB
catalog costs a few JSON reads, never a data scan."""

from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.lake_sql import LakeCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.create_table(
        "t1",
        str(tmp_path / "t1"),
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "k long, v string, x double"
        ),
    )
    c.create_table(
        "t2",
        str(tmp_path / "t2"),
        spark.createDataFrame([(1,), (2,), (3,)], "id long"),
    )
    return c


def test_tables_view(cat):
    rows = {
        r.table_name: r
        for r in cat.sql(
            "SELECT * FROM INFORMATION_SCHEMA.TABLES"
        ).collect()
    }
    assert set(rows) == {"t1", "t2"}
    assert rows["t1"].table_type == "BASE TABLE"
    assert rows["t1"].total_rows == 2
    assert rows["t2"].total_rows == 3
    assert rows["t1"].version == 1 and rows["t1"].n_files >= 1
    assert rows["t1"].total_bytes > 0


def test_columns_view(cat):
    cols = cat.sql(
        "SELECT column_name, ordinal_position, data_type "
        "FROM INFORMATION_SCHEMA.COLUMNS WHERE table_name = 't1' "
        "ORDER BY ordinal_position"
    ).collect()
    assert [(c.column_name, c.data_type) for c in cols] == [
        ("k", "bigint"),
        ("v", "string"),
        ("x", "double"),
    ]
    assert [c.ordinal_position for c in cols] == [1, 2, 3]


def test_constraints_and_types_reflect_ddl(cat):
    cat.sql("ALTER TABLE t2 ADD CONSTRAINT id_pos CHECK (id > 0)")
    rows = cat.sql(
        "SELECT table_name, constraint_name, constraint_type, expression "
        "FROM INFORMATION_SCHEMA.TABLE_CONSTRAINTS"
    ).collect()
    assert [tuple(r) for r in rows] == [("t2", "id_pos", "CHECK", "id > 0")]
    # clones and snapshots surface with their own table_type
    cat.sql("CREATE TABLE t1c CLONE t1")
    cat.sql("CREATE SNAPSHOT TABLE t1s CLONE t1")
    types = {
        r.table_name: r.table_type
        for r in cat.sql(
            "SELECT table_name, table_type FROM INFORMATION_SCHEMA.TABLES"
        ).collect()
    }
    assert types["t1c"] == "CLONE" and types["t1s"] == "SNAPSHOT"


def test_matview_listed(cat, spark):
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS "
        "SELECT v, COUNT(*) AS n FROM t1 GROUP BY v"
    )
    types = {
        r.table_name: r.table_type
        for r in cat.sql(
            "SELECT table_name, table_type FROM INFORMATION_SCHEMA.TABLES"
        ).collect()
    }
    assert types.get("mv1") == "MATERIALIZED VIEW"


def test_updates_after_dml(cat):
    cat.sql("INSERT INTO t2 SELECT 4")
    row = cat.sql(
        "SELECT total_rows, version FROM INFORMATION_SCHEMA.TABLES "
        "WHERE table_name = 't2'"
    ).collect()[0]
    assert row.total_rows == 4 and row.version == 2


def test_unknown_view_refuses(cat):
    with pytest.raises(ValueError, match="not implemented"):
        cat.sql("SELECT * FROM INFORMATION_SCHEMA.JOBS_BY_PROJECT")


def test_views_and_routines(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "rt", str(tmp_path / "rt"),
        spark.createDataFrame([(1, 2.0)], "k long, x double"),
    )
    cat.sql("CREATE VIEW rv AS SELECT k FROM rt")
    cat.script(
        "CREATE PROCEDURE bump(IN n INT64, OUT r INT64) "
        "BEGIN SET r = n + 1; END"
    )
    cat.sql(
        "CREATE MODEL rm OPTIONS(model_type='linear_reg', "
        "input_label_cols=['x']) AS SELECT k, x FROM rt UNION ALL "
        "SELECT 2, 4.0 UNION ALL SELECT 3, 6.0"
    )
    v = cat.sql("SELECT * FROM INFORMATION_SCHEMA.VIEWS").collect()
    assert [(r.table_name, r.view_definition) for r in v] == [
        ("rv", "SELECT k FROM rt")
    ]
    r = {
        row.routine_name: (row.routine_type, row.signature)
        for row in cat.sql(
            "SELECT * FROM INFORMATION_SCHEMA.ROUTINES"
        ).collect()
    }
    assert r["bump"] == ("PROCEDURE", "in n, out r")
    assert r["rm"] == ("MODEL", "linear_reg")
