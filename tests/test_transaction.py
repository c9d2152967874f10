"""Multi-statement transactions (r6 — BigQuery BEGIN TRANSACTION /
COMMIT / ROLLBACK, snapshot-isolated). Staging = zero-copy clones:
BEGIN hard-links every table, statements run against the shadows
(read-your-writes), COMMIT publishes net snapshots under OCC,
ROLLBACK just drops the clones."""

from __future__ import annotations

import pytest

from bigquery_etl_spark.sources.lake_sql import (
    LakeCatalog,
    TransactionConflict,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.create_table(
        "acct",
        str(tmp_path / "acct"),
        spark.createDataFrame(
            [(1, 100), (2, 200), (3, 300)], "id long, bal long"
        ),
    )
    c.create_table(
        "log",
        str(tmp_path / "log"),
        spark.createDataFrame([(0, "init")], "seq long, note string"),
    )
    return c


def _bal(cat, engine=None):
    return {
        r.id: r.bal
        for r in cat.sql("SELECT id, bal FROM acct").collect()
    }


def test_commit_publishes_all_or_nothing(cat):
    cat.sql("BEGIN TRANSACTION")
    cat.sql("UPDATE acct SET bal = bal - 50 WHERE id = 1")
    cat.sql("UPDATE acct SET bal = bal + 50 WHERE id = 2")
    cat.sql("INSERT INTO log SELECT 1, 'transfer'")
    # inside: read-your-writes
    assert _bal(cat) == {1: 50, 2: 250, 3: 300}
    # outside: the REAL tables are untouched until COMMIT
    other = LakeCatalog(cat.spark)
    other.register("acct", cat._txn["orig"]["acct"])
    assert _bal(other) == {1: 100, 2: 200, 3: 300}
    cat.sql("COMMIT")
    assert _bal(cat) == {1: 50, 2: 250, 3: 300}
    assert cat.sql("SELECT COUNT(*) AS n FROM log").collect()[0].n == 2


def test_rollback_discards_everything(cat):
    cat.sql("BEGIN TRANSACTION")
    cat.sql("DELETE FROM acct WHERE id = 1")
    cat.sql("UPDATE acct SET bal = 0")
    assert len(_bal(cat)) == 2
    cat.sql("ROLLBACK")
    assert _bal(cat) == {1: 100, 2: 200, 3: 300}
    # table version history is untouched — nothing was ever committed
    assert cat.tables["acct"].latest_version() == 1


def test_concurrent_writer_forces_conflict(cat, spark):
    from bigquery_etl_spark.sources.versioned import VersionedTable

    cat.sql("BEGIN TRANSACTION")
    cat.sql("UPDATE acct SET bal = bal + 1")
    # a writer outside the transaction commits to the REAL table
    real = cat._txn["orig"]["acct"]
    real.append(spark.createDataFrame([(9, 900)], "id long, bal long"))
    with pytest.raises(TransactionConflict, match="moved"):
        cat.sql("COMMIT")
    # nothing from the transaction landed; the concurrent append did
    assert _bal(cat) == {1: 100, 2: 200, 3: 300, 9: 900}


def test_untouched_tables_never_conflict(cat, spark):
    cat.sql("BEGIN TRANSACTION")
    cat.sql("UPDATE acct SET bal = bal + 1")
    # concurrent write to a table the txn never TOUCHED is fine
    cat._txn["orig"]["log"].append(
        spark.createDataFrame([(7, "outside")], "seq long, note string")
    )
    cat.sql("COMMIT")
    assert _bal(cat) == {1: 101, 2: 201, 3: 301}
    assert cat.sql("SELECT COUNT(*) AS n FROM log").collect()[0].n == 2


def test_ddl_refused_inside_transaction(cat):
    cat.sql("BEGIN TRANSACTION")
    with pytest.raises(ValueError, match="not allowed inside"):
        cat.sql("CREATE TABLE t2 AS SELECT * FROM acct")
    with pytest.raises(ValueError, match="not allowed inside"):
        cat.sql("VACUUM acct")
    cat.sql("ROLLBACK")


def test_no_nesting_and_no_stray_end(cat):
    cat.sql("BEGIN TRANSACTION")
    with pytest.raises(ValueError, match="no nesting"):
        cat.sql("BEGIN TRANSACTION")
    cat.sql("ROLLBACK")
    with pytest.raises(ValueError, match="no open transaction"):
        cat.sql("COMMIT")


def test_transaction_inside_script_with_exception_rollback(cat):
    """The scripting layer composes: a failed statement inside the
    transaction triggers the EXCEPTION handler, which ROLLBACKs."""
    out = cat.script("""
        DECLARE status STRING DEFAULT 'none';
        BEGIN
            BEGIN TRANSACTION;
            UPDATE acct SET bal = 0 WHERE id = 1;
            SET status = (SELECT note FROM no_such_table_xyz LIMIT 1);
            COMMIT;
        EXCEPTION WHEN ERROR THEN
            ROLLBACK;
            SET status = 'rolled_back';
        END;
        SELECT status AS s,
               (SELECT bal FROM acct WHERE id = 1) AS bal1;
    """)
    row = out.collect()[0]
    assert (row.s, row.bal1) == ("rolled_back", 100)


def test_index_maintenance_deferred_to_commit(cat, spark):
    """Search-index refresh must only see durably-committed versions:
    a rolled-back transaction leaves the index untouched, a committed
    one refreshes it once with the net change."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, body string"
    )
    cat.create_table("docs", str(cat.warehouse) + "/docs", docs)
    cat.tables["docs"].enable_change_feed(["doc_id"])
    cat.sql(
        "CREATE SEARCH INDEX sidx ON docs(body) OPTIONS(id_column='doc_id')"
    )
    cat.sql("BEGIN TRANSACTION")
    cat.sql("DELETE FROM docs WHERE doc_id = 1")
    cat.sql("ROLLBACK")
    assert {r["doc_id"] for r in cat.search("docs", ["alpha"]).collect()} == {1}
    cat.sql("BEGIN TRANSACTION")
    cat.sql("DELETE FROM docs WHERE doc_id = 1")
    cat.sql("COMMIT")
    assert cat.search("docs", ["alpha"]).count() == 0
