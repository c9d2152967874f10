"""EXPORT DATA / LOAD DATA / QUALIFY statements (r6) — the remaining
BigQuery statement surface on the lake catalog.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cat(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    c = LakeCatalog(spark, warehouse=str(tmp_path))
    df = spark.createDataFrame(
        [(i, ["A", "B"][i % 2], float(i)) for i in range(1, 11)],
        "id long, grp string, val double",
    )
    c.create_table("t", str(tmp_path / "t"), df)
    return c


def test_qualify_with_alias_reference(cat):
    out = cat.sql(
        "SELECT id, grp, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY val DESC)"
        " AS rn FROM t QUALIFY rn <= 2 ORDER BY grp, rn"
    )
    assert [(r.grp, r.rn, r.id) for r in out.collect()] == [
        ("A", 1, 10), ("A", 2, 8), ("B", 1, 9), ("B", 2, 7)
    ]
    assert "__q" not in out.columns


def test_qualify_inline_window_and_limit(cat):
    out = cat.sql(
        "SELECT id, grp FROM t QUALIFY "
        "ROW_NUMBER() OVER (PARTITION BY grp ORDER BY val DESC) = 1 "
        "ORDER BY id LIMIT 1"
    )
    assert [(r.id, r.grp) for r in out.collect()] == [(9, "B")]


def test_qualify_distinct_refused(cat):
    from bigquery_etl_spark.sources.lake_sql import MergeParseError

    with pytest.raises(MergeParseError, match="DISTINCT"):
        cat.sql(
            "SELECT DISTINCT grp FROM t QUALIFY "
            "ROW_NUMBER() OVER (ORDER BY grp) = 1"
        )


def test_qualify_literal_not_a_clause(cat):
    """'QUALIFY' inside a string literal must not trigger the rewrite."""
    out = cat.sql("SELECT id FROM t WHERE grp <> 'QUALIFY me' ORDER BY id")
    assert out.count() == 10


def test_export_data_csv_roundtrip(cat, tmp_path, spark):
    uri = cat.sql(
        f"EXPORT DATA OPTIONS(uri='{tmp_path}/exp', format='CSV', "
        "header='true') AS SELECT id, grp, val FROM t WHERE id <= 3"
    )
    assert uri == f"{tmp_path}/exp"
    back = spark.read.option("header", "true").csv(uri)
    assert back.count() == 3
    assert set(back.columns) == {"id", "grp", "val"}


def test_export_data_parquet_default_and_overwrite_false(cat, tmp_path, spark):
    cat.sql(
        f"EXPORT DATA OPTIONS(uri='{tmp_path}/exp2') AS SELECT * FROM t"
    )
    assert spark.read.parquet(f"{tmp_path}/exp2").count() == 10
    with pytest.raises(Exception):  # mode=error on existing path
        cat.sql(
            f"EXPORT DATA OPTIONS(uri='{tmp_path}/exp2', overwrite='false') "
            "AS SELECT * FROM t"
        )


def test_export_data_requires_uri(cat):
    from bigquery_etl_spark.sources.lake_sql import MergeParseError

    with pytest.raises(MergeParseError, match="uri"):
        cat.sql("EXPORT DATA OPTIONS(format='CSV') AS SELECT * FROM t")


def test_load_data_appends_with_name_alignment(cat, tmp_path, spark):
    # columns deliberately reordered + int val: aligned by NAME, cast
    src = spark.createDataFrame(
        [("C", 100, 7), ("C", 101, 8)], "grp string, id long, val int"
    )
    src.write.parquet(f"{tmp_path}/newrows")
    v = cat.sql(
        f"LOAD DATA INTO t FROM FILES(format='parquet', "
        f"uris=['{tmp_path}/newrows'])"
    )
    assert v == cat.tables["t"].latest_version()
    snap = cat.tables["t"].read()
    assert snap.count() == 12
    got = snap.filter(F.col("grp") == "C").orderBy("id").collect()
    assert [(r.id, r.val) for r in got] == [(100, 7.0), (101, 8.0)]


def test_load_data_missing_column_refused(cat, tmp_path, spark):
    spark.createDataFrame([(1, "x")], "id long, grp string").write.parquet(
        f"{tmp_path}/badrows"
    )
    with pytest.raises(ValueError, match="lack columns"):
        cat.sql(
            f"LOAD DATA INTO t FROM FILES(format='parquet', "
            f"uris=['{tmp_path}/badrows'])"
        )


def test_load_data_maintains_views_and_indexes(cat, tmp_path, spark):
    """LOAD DATA is a real commit: a materialized view on the table
    refreshes off its change feed like any DML."""
    cat.sql(
        "CREATE MATERIALIZED VIEW mvt AS SELECT grp, COUNT(*) AS n "
        "FROM t GROUP BY grp"
    )
    spark.createDataFrame(
        [(200, "B", 1.0)], "id long, grp string, val double"
    ).write.parquet(f"{tmp_path}/one")
    cat.sql(
        f"LOAD DATA INTO t FROM FILES(format='parquet', uris=['{tmp_path}/one'])"
    )
    out = {r.grp: r.n for r in cat.sql(
        "SELECT grp, COUNT(*) AS n FROM t GROUP BY grp"
    ).collect()}
    assert cat.last_mv_rewrite == "mvt"
    assert out == {"A": 5, "B": 6}


def test_alter_table_rename_to(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "old_name", str(tmp_path / "t"),
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
    )
    cat.sql("ALTER TABLE old_name RENAME TO new_name")
    assert "old_name" not in cat.tables and "new_name" in cat.tables
    assert cat.sql("SELECT count(*) AS n FROM new_name").collect()[0].n == 2
    # storage untouched: a catalog operation, not a file move
    assert cat.tables["new_name"].root == str(tmp_path / "t")
    cat.sql("ALTER TABLE IF EXISTS ghost RENAME TO whatever")  # no-op
    import pytest as _p

    cat.create_table(
        "other", str(tmp_path / "o"),
        spark.createDataFrame([(1,)], "x long"),
    )
    with _p.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE other RENAME TO new_name")


def test_create_table_like_and_copy(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "src_t", str(tmp_path / "src"),
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"),
    )
    cat.sql("ALTER TABLE src_t ADD CONSTRAINT v_pos CHECK (v > 0)")
    # LIKE: schema + constraints, EMPTY
    cat.sql("CREATE TABLE like_t LIKE src_t")
    assert cat.sql("SELECT count(*) AS n FROM like_t").collect()[0].n == 0
    assert dict(cat.tables["like_t"].read().dtypes) == {
        "id": "bigint", "v": "double",
    }
    import pytest as _p

    from bigquery_etl_spark.sources.versioned import ConstraintViolation

    spark.createDataFrame([(3, -1.0)], "id long, v double") \
        .createOrReplaceTempView("bad_rows")
    with _p.raises(ConstraintViolation):
        cat.sql("INSERT INTO like_t SELECT * FROM bad_rows")
    # COPY: schema + data (zero-copy clone)
    cat.sql("CREATE TABLE copy_t COPY src_t")
    assert sorted(
        (r.id, r.v) for r in cat.sql("SELECT * FROM copy_t").collect()
    ) == [(1, 10.0), (2, 20.0)]
    # divergence is copy-on-write
    cat.sql("DELETE FROM src_t WHERE id = 1")
    assert cat.sql("SELECT count(*) AS n FROM copy_t").collect()[0].n == 2
    assert cat.sql("SELECT count(*) AS n FROM src_t").collect()[0].n == 1
    cat.sql("CREATE TABLE IF NOT EXISTS copy_t COPY src_t")  # no-op
    assert cat.sql("SELECT count(*) AS n FROM copy_t").collect()[0].n == 2


def test_rename_keeps_index_maintenance(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "docs_r", str(tmp_path / "d"),
        spark.createDataFrame(
            [(1, "merge stream"), (2, "vector scan")], "doc_id long, text string"
        ),
    )
    cat.sql(
        "CREATE SEARCH INDEX r_si ON docs_r (text) "
        "OPTIONS(id_column='doc_id', n_buckets=4)"
    )
    cat.sql("ALTER TABLE docs_r RENAME TO docs_rn")
    assert ("docs_rn", "r_si") in cat.indexes
    spark.createDataFrame([(3, "merge late")], "doc_id long, text string") \
        .createOrReplaceTempView("docs_r_more")
    cat.sql("INSERT INTO docs_rn SELECT * FROM docs_r_more")
    got = {r.doc_id for r in cat.sql(
        "SELECT doc_id FROM docs_rn WHERE SEARCH(docs_rn, 'merge')"
    ).collect()}
    assert got == {1, 3}  # the index followed the rename and stayed maintained
