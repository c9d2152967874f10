"""Logical views + ASSERT (r6 C50 — BigQuery CREATE VIEW / ASSERT).

A view is a MACRO: its SQL re-resolves against current state on every
statement, so lake DML shows through with no refresh step — the
defining difference from the CDF-maintained materialized views (C36).
"""

from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.lake_sql import LakeCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.create_table(
        "sales",
        str(tmp_path / "sales"),
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
            "k long, grp string, amt double",
        ),
    )
    return c


def test_view_reflects_dml_immediately(spark, cat):
    cat.sql(
        "CREATE VIEW v_tot AS "
        "SELECT grp, SUM(amt) AS total FROM sales GROUP BY grp"
    )
    got = {r.grp: r.total for r in cat.sql("SELECT * FROM v_tot").collect()}
    assert got == {"a": 40.0, "b": 20.0}
    cat.sql("INSERT INTO sales SELECT 4, 'b', 5.0")
    got = {r.grp: r.total for r in cat.sql("SELECT * FROM v_tot").collect()}
    assert got == {"a": 40.0, "b": 25.0}  # no refresh needed: a macro


def test_nested_views_and_cycle_guard(spark, cat):
    cat.sql("CREATE VIEW v1 AS SELECT k, amt * 2 AS amt2 FROM sales")
    cat.sql("CREATE VIEW v2 AS SELECT SUM(amt2) AS s FROM v1")
    assert cat.sql("SELECT s FROM v2").collect()[0].s == 120.0
    # replacing v1 changes v2's answer (macro semantics, not snapshot)
    cat.sql("CREATE OR REPLACE VIEW v1 AS SELECT k, amt AS amt2 FROM sales")
    assert cat.sql("SELECT s FROM v2").collect()[0].s == 60.0
    cat.sql("CREATE OR REPLACE VIEW v3 AS SELECT * FROM sales")
    with pytest.raises(ValueError, match="itself"):
        cat.sql("CREATE OR REPLACE VIEW v3 AS SELECT * FROM v3")


def test_view_create_validates_and_guards_names(spark, cat):
    with pytest.raises(Exception):
        cat.sql("CREATE VIEW broken AS SELECT nope FROM sales")
    assert "broken" not in cat.viewdefs  # failed CREATE leaves nothing
    with pytest.raises(ValueError, match="already a table"):
        cat.sql("CREATE VIEW sales AS SELECT 1")
    cat.sql("CREATE VIEW v AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE VIEW v AS SELECT 2")
    cat.sql("DROP VIEW v")
    assert "v" not in cat.viewdefs
    rows = cat.sql(
        "SELECT table_name, table_type FROM INFORMATION_SCHEMA.TABLES "
        "ORDER BY table_name"
    ).collect()
    assert ("sales", "BASE TABLE") in [(r.table_name, r.table_type) for r in rows]


def test_assert_statement(spark, cat):
    cat.sql("ASSERT (SELECT COUNT(*) FROM sales) = 3 AS 'row count drifted'")
    with pytest.raises(AssertionError, match="row count drifted"):
        cat.sql(
            "ASSERT (SELECT COUNT(*) FROM sales) = 99 AS 'row count drifted'"
        )
    with pytest.raises(AssertionError, match="ASSERT failed"):
        cat.sql("ASSERT 1 = 2")
    # NULL condition fails (BigQuery: ASSERT requires TRUE)
    with pytest.raises(AssertionError):
        cat.sql("ASSERT CAST(NULL AS BOOLEAN)")
