"""Round-7 regressions for the r6 ADVICE findings (ADVICE.md):

1. _col_constraints must not harvest predicates from inside a
   subquery — a same-named column of ANOTHER table must never drive
   partition elimination for a scoped DELETE/UPDATE or pruned SELECT.
2. _try_partition_scoped_merge must refuse disjunctive ON clauses
   (matches can span partitions through the OR branch).
3. _try_mv_rewrite must not run against the shadow clones of an open
   transaction (durable MV state would absorb uncommitted writes).
4. _begin_transaction must be atomic: a registered-but-never-created
   table must not leave the catalog half-pointed at temp clones.
5. bq_script parameter values containing apostrophes must substitute
   as doubled-quote SQL literals, keeping every later textual
   rewrite synchronized.
"""

from __future__ import annotations

import datetime

import pytest

from bigquery_etl_spark.sources.lake_sql import (
    LakeCatalog,
    _col_constraints,
)
from bigquery_etl_spark.sources.versioned import VersionedTable


# ---------------------------------------------------------------- #1


def test_col_constraints_ignores_subquery_predicates():
    # the exact shape from ADVICE: the d='2024-01-01' lives inside the
    # IN-subquery on ANOTHER table and must not prune the outer one
    assert (
        _col_constraints(
            " WHERE id IN (SELECT id FROM staging WHERE d = '2024-01-01')",
            "d",
        )
        == []
    )
    # EXISTS (not only NOT EXISTS) likewise disables pruning
    assert (
        _col_constraints(
            " WHERE EXISTS (SELECT 1 FROM s WHERE s.x = 1 AND d = '2024-01-01')",
            "d",
        )
        == []
    )
    # scalar subquery comparison
    assert (
        _col_constraints(
            " WHERE amt > (SELECT avg(amt) FROM t WHERE d = '2024-01-01')",
            "d",
        )
        == []
    )
    # 'select' inside a string literal must NOT disable pruning
    cons = _col_constraints(
        " WHERE note = 'select me' AND d = '2024-01-01'", "d"
    )
    assert ("=", "2024-01-01") in cons


def _part_cat(spark, tmp_path, name="ev7"):
    rows = []
    base = datetime.date(2024, 1, 1)
    for i in range(120):
        rows.append((i, base + datetime.timedelta(days=i), float(i)))
    spark.createDataFrame(rows, "k long, d date, amt double") \
        .createOrReplaceTempView("adv_src")
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql(
        f"CREATE TABLE {name} PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM adv_src"
    )
    return cat


def test_subquery_delete_hits_all_partitions(spark, tmp_path):
    """DELETE whose predicate references a same-named column of a
    staging table inside a subquery must delete matching rows in
    EVERY partition, not just the one the leaked literal names."""
    cat = _part_cat(spark, tmp_path)
    # staging rows point at keys in January AND March; its d column
    # (same name as the partition column) is all January
    spark.createDataFrame(
        [(5, datetime.date(2024, 1, 10)), (70, datetime.date(2024, 1, 11))],
        "id long, d date",
    ).createOrReplaceTempView("staging7")
    cat.sql(
        "DELETE FROM ev7 WHERE k IN "
        "(SELECT id FROM staging7 WHERE d >= '2024-01-01' AND d <= '2024-01-31')"
    )
    left = {r.k for r in cat.sql("SELECT k FROM ev7").collect()}
    assert 5 not in left
    assert 70 not in left  # March row (day 70) must be gone too
    assert len(left) == 118


def test_subquery_update_hits_all_partitions(spark, tmp_path):
    cat = _part_cat(spark, tmp_path, name="ev7u")
    spark.createDataFrame(
        [(70, datetime.date(2024, 1, 11))], "id long, d date"
    ).createOrReplaceTempView("staging7u")
    cat.sql(
        "UPDATE ev7u SET amt = -1.0 WHERE k IN "
        "(SELECT id FROM staging7u WHERE d = '2024-01-11')"
    )
    got = {r.k: r.amt for r in cat.sql("SELECT k, amt FROM ev7u").collect()}
    assert got[70] == -1.0  # lives in March; must still be updated


# ---------------------------------------------------------------- #2


def test_scoped_merge_refuses_disjunctive_on(spark, tmp_path):
    """ON t.k = s.k OR t.d = s.d contains the partition pin textually
    but matches can span partitions through the OR branch — the
    scoped path must refuse and the full merge must win."""
    cat = _part_cat(spark, tmp_path, name="pmor")
    tbl = cat.tables["pmor"]
    before = {e["path"] for e in tbl.files(version=1)}
    # source row dated March matches (by key, through OR) a January row
    spark.createDataFrame(
        [(5, datetime.date(2024, 3, 20), -5.0)],
        "k long, d date, amt double",
    ).createOrReplaceTempView("pmor_src")
    cat.sql(
        "MERGE INTO pmor t USING pmor_src s "
        "ON t.k = s.k OR t.d = s.d "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT (k, d, amt) VALUES (s.k, s.d, s.amt)"
    )
    # full rewrite (no carried January-untouched files), and NO
    # duplicate insert of the source row
    assert not (before & {e["path"] for e in tbl.files(version=2)})
    rows = cat.sql("SELECT k, amt FROM pmor WHERE k = 5").collect()
    assert len(rows) == 1 and rows[0].amt == -5.0
    assert cat.sql("SELECT count(*) AS n FROM pmor").collect()[0].n == 120


# ---------------------------------------------------------------- #3


def test_mv_state_survives_rollback(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "sales",
        str(tmp_path / "sales"),
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, g string, v double"
        ),
    )
    cat.tables["sales"].enable_change_feed(["id"])
    cat.sql(
        "CREATE MATERIALIZED VIEW mv_sales AS "
        "SELECT g, SUM(v) AS sv FROM sales GROUP BY g"
    )
    cat.sql("BEGIN TRANSACTION")
    cat.sql("INSERT INTO sales VALUES (3, 'a', 100.0)")
    # read-your-writes inside the txn (served from the clone, NOT by
    # advancing durable MV state)
    got = {
        r.g: r.sv
        for r in cat.sql("SELECT g, SUM(v) AS sv FROM sales GROUP BY g").collect()
    }
    assert got == {"a": 110.0, "b": 20.0}
    cat.sql("ROLLBACK")
    # durable MV state must NOT have absorbed the rolled-back insert
    got = {
        r.g: r.sv
        for r in cat.sql("SELECT g, SUM(v) AS sv FROM sales GROUP BY g").collect()
    }
    assert got == {"a": 10.0, "b": 20.0}
    assert cat.last_mv_rewrite == "mv_sales"  # rewrite active again


# ---------------------------------------------------------------- #4


def test_begin_transaction_with_empty_table(spark, tmp_path):
    """A registered-but-never-created table must neither break BEGIN
    nor leak writes outside the transaction."""
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "real", str(tmp_path / "real"),
        spark.createDataFrame([(1, 10)], "id long, v long"),
    )
    cat.register("empty7", VersionedTable(spark, str(tmp_path / "empty7")))
    orig = dict(cat.tables)
    cat.sql("BEGIN TRANSACTION")
    cat.sql("INSERT INTO real VALUES (2, 20)")
    cat.sql("ROLLBACK")
    assert cat.tables["real"] is orig["real"]
    assert cat.tables["empty7"] is orig["empty7"]
    assert cat.sql("SELECT count(*) AS n FROM real").collect()[0].n == 1
    assert cat.tables["empty7"].latest_version() is None


def test_txn_first_write_to_empty_table_publishes_v1(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.register("fresh7", VersionedTable(spark, str(tmp_path / "fresh7")))
    cat.sql("BEGIN TRANSACTION")
    spark.createDataFrame([(1, "x")], "id long, s string") \
        .createOrReplaceTempView("fresh_src")
    cat.sql("INSERT INTO fresh7 SELECT * FROM fresh_src")
    cat.sql("COMMIT")
    assert cat.tables["fresh7"].latest_version() is not None
    assert cat.sql("SELECT count(*) AS n FROM fresh7").collect()[0].n == 1


# ---------------------------------------------------------------- #5


def test_script_variable_with_apostrophe(spark, tmp_path):
    """A variable VALUE containing an apostrophe (sourced from data,
    so it flows through _sql_literal) must substitute as a
    doubled-quote literal — later rewrites of the statement must stay
    synchronized and the comparison must match the raw value."""
    from bigquery_etl_spark.sources.bq_script import run_script

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.create_table(
        "people7",
        str(tmp_path / "people7"),
        spark.createDataFrame(
            [("O'Brien", 1), ("Smith", 2)], "name string, n long"
        ),
    )
    out = run_script(
        cat,
        """
        DECLARE who STRING DEFAULT (SELECT name FROM people7 WHERE n = 1);
        SELECT n, UPPER(name) AS un FROM people7 WHERE name = who;
        """,
    )
    rows = out.collect()
    assert [r.n for r in rows] == [1]
    assert rows[0].un == "O'BRIEN"


def test_sql_literal_doubles_quotes():
    from bigquery_etl_spark.sources.bq_script import _sql_literal

    assert _sql_literal("O'Brien") == "'O''Brien'"
    assert _sql_literal("a''b") == "'a''''b'"
