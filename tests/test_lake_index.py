"""SQL-declared index lifecycle (r6, VERDICT r5 item 8): CREATE/DROP
SEARCH|VECTOR INDEX statements on LakeCatalog tables, auto-maintained
off the table's change feed after every DML commit — BigQuery's
CREATE SEARCH INDEX / CREATE VECTOR INDEX on the delegated surface
(ref main.py:21,49-50 hands all search to BigQuery)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.sources.lake_sql import LakeCatalog

DOCS = [
    (1, "spark merge window merge"),
    (2, "spark window"),
    (3, "merge merge merge"),
    (4, "window"),
    (5, "vector stream"),
]


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark)
    c.create_table(
        "docs",
        str(tmp_path / "docs"),
        spark.createDataFrame(DOCS, "doc_id long, text string"),
    )
    return c


def _vec(seed: int) -> list[float]:
    return [float(((seed * 37 + i * 11) % 19) - 9) / 9.0 for i in range(8)]


def test_create_search_index_and_search(spark, cat):
    store = cat.sql(
        "CREATE SEARCH INDEX si ON docs (text) "
        "OPTIONS(id_column='doc_id', n_buckets=16)"
    )
    assert spark.catalog.tableExists(store)
    got = [tuple(r) for r in cat.search("docs", ["merge", "window"], "any", 10).collect()]
    assert got[0] == (1, 2, 3)  # doc 1 matches both terms, tf 2+1


def test_dml_auto_maintains_search_index(spark, cat):
    cat.sql("CREATE SEARCH INDEX si ON docs (text) OPTIONS(id_column='doc_id')")
    cat.sql("DELETE FROM docs WHERE doc_id = 3")
    cat.sql("INSERT INTO docs SELECT 6 AS doc_id, 'merge merge' AS text")
    cat.sql("UPDATE docs SET text = 'nothing here' WHERE doc_id = 1")
    got = {r.doc_id: r.tf_sum for r in cat.search("docs", ["merge"], "any", 10).collect()}
    assert got == {6: 2}  # 3 deleted, 1 updated away, 6 inserted
    # index state equals a from-scratch rebuild of the final snapshot
    from bigquery_etl_spark.operators.text_index import (
        build_text_index,
        search_text_index,
    )

    build_text_index(cat.tables["docs"].read(), "doc_id", "text", "lsi_fresh")
    fresh = [tuple(r) for r in search_text_index(
        spark, "lsi_fresh", ["merge", "window", "spark"], "any", 20).collect()]
    inc = [tuple(r) for r in cat.search(
        "docs", ["merge", "window", "spark"], "any", 20).collect()]
    assert inc == fresh


def test_merge_statement_maintains_index(spark, cat):
    cat.sql("CREATE SEARCH INDEX si ON docs (text) OPTIONS(id_column='doc_id')")
    spark.createDataFrame(
        [(2, "vector vector"), (7, "stream stream")], "doc_id long, text string"
    ).createOrReplaceTempView("updates")
    cat.sql("""
        MERGE INTO docs t USING updates s ON t.doc_id = s.doc_id
        WHEN MATCHED THEN UPDATE SET text = s.text
        WHEN NOT MATCHED THEN INSERT (doc_id, text) VALUES (s.doc_id, s.text)
    """)
    got = {r.doc_id for r in cat.search("docs", ["vector", "stream"], "any", 10).collect()}
    assert got == {2, 5, 7}


def test_drop_search_index(spark, cat, tmp_path):
    store = cat.sql("CREATE SEARCH INDEX si ON docs (text) OPTIONS(id_column='doc_id')")
    cat.sql("DROP SEARCH INDEX si ON docs")
    assert not spark.catalog.tableExists(store)
    with pytest.raises(KeyError):
        cat.search("docs", ["merge"])
    # re-creatable after drop
    cat.sql("CREATE SEARCH INDEX si ON docs (text) OPTIONS(id_column='doc_id')")
    assert cat.search("docs", ["merge"], "any", 10).count() > 0


def test_duplicate_index_name_refused(cat):
    cat.sql("CREATE SEARCH INDEX si ON docs (text) OPTIONS(id_column='doc_id')")
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE SEARCH INDEX si ON docs (text) OPTIONS(id_column='doc_id')")


def test_vector_index_lifecycle_and_maintenance(spark, tmp_path):
    cat = LakeCatalog(spark)
    cat.create_table(
        "emb",
        str(tmp_path / "emb"),
        spark.createDataFrame(
            [(i, _vec(i)) for i in range(20)], "vec_id long, embedding array<double>"
        ),
    )
    store = cat.sql(
        "CREATE VECTOR INDEX vi ON emb (embedding) "
        "OPTIONS(id_column='vec_id', num_lists=4)"
    )
    assert os.path.isdir(store)
    q = spark.createDataFrame(
        [(0, _vec(1))], "query_id long, query_vec array<double>"
    )
    top = [r.vec_id for r in cat.vector_search("emb", q, k=3, nprobe=4, dim=8).collect()]
    assert top[0] == 1  # its own vector is the nearest neighbor
    cat.sql("DELETE FROM emb WHERE vec_id = 1")
    top2 = [r.vec_id for r in cat.vector_search("emb", q, k=3, nprobe=4, dim=8).collect()]
    assert 1 not in top2
    cat.sql("INSERT INTO emb SELECT 99 AS vec_id, "
            + "array(" + ",".join(f"{x}d" for x in _vec(1)) + ") AS embedding")
    top3 = [r.vec_id for r in cat.vector_search("emb", q, k=3, nprobe=4, dim=8).collect()]
    assert top3[0] == 99
    cat.sql("DROP VECTOR INDEX vi ON emb")
    assert not os.path.isdir(store)


def test_index_creation_enables_cdf_if_absent(spark, cat):
    assert cat.tables["docs"]._cdf_keys() is None
    cat.sql("CREATE SEARCH INDEX si ON docs (text) OPTIONS(id_column='doc_id')")
    assert cat.tables["docs"]._cdf_keys() == ["doc_id"]


def test_search_fn_predicate(spark, cat):
    """BigQuery SEARCH() predicate (r6): rewritten to a semi-join
    against the bucket-pruned index hit set — the corpus text column
    is never scanned. Default semantics = every token must match."""
    cat.sql(
        "CREATE SEARCH INDEX si ON docs (text) "
        "OPTIONS(id_column='doc_id', n_buckets=16)"
    )
    got = sorted(
        r.doc_id
        for r in cat.sql(
            "SELECT doc_id FROM docs WHERE SEARCH(docs, 'spark window')"
        ).collect()
    )
    assert got == [1, 2]  # both tokens required (BigQuery default)
    any_ = sorted(
        r.doc_id
        for r in cat.sql(
            "SELECT doc_id FROM docs "
            "WHERE SEARCH(docs, 'spark window', mode => 'any')"
        ).collect()
    )
    assert any_ == [1, 2, 4]
    # composes with other predicates; a '$'-free literal stays text
    one = cat.sql(
        "SELECT doc_id, text FROM docs "
        "WHERE SEARCH(docs, 'merge') AND doc_id > 1"
    ).collect()
    assert sorted(r.doc_id for r in one) == [3]
    # maintained index serves the rewritten predicate after DML
    cat.sql("INSERT INTO docs SELECT 7, 'spark window spark'")
    got2 = sorted(
        r.doc_id
        for r in cat.sql(
            "SELECT doc_id FROM docs WHERE SEARCH(docs, 'spark window')"
        ).collect()
    )
    assert got2 == [1, 2, 7]
    # a table without a search index refuses loudly
    cat.create_table(
        "plain",
        os.path.join(cat.tables["docs"].root + "_plain"),
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
    )
    with pytest.raises(KeyError, match="no search index"):
        cat.sql("SELECT * FROM plain WHERE SEARCH(plain, 'x')")


def test_vector_search_tvf(spark, cat, tmp_path):
    """BigQuery VECTOR_SEARCH TVF (r6): the FROM-clause call becomes a
    view over the partition-pruned IVF probe."""
    cat.create_table(
        "emb",
        str(tmp_path / "emb"),
        spark.createDataFrame(
            [(i, _vec(i)) for i in range(20)],
            "vec_id long, embedding array<double>",
        ),
    )
    cat.sql(
        "CREATE VECTOR INDEX vi ON emb (embedding) "
        "OPTIONS(id_column='vec_id', num_lists=4)"
    )
    rows = cat.sql(
        "SELECT query_id, vec_id, rank FROM VECTOR_SEARCH("
        "TABLE emb, 'embedding', "
        "(SELECT 0 AS qid, embedding FROM emb WHERE vec_id = 1), "
        "top_k => 3, nprobe => 4) ORDER BY rank"
    ).collect()
    assert [r.vec_id for r in rows][0] == 1  # own vector is nearest
    assert len(rows) == 3 and all(r.query_id == 0 for r in rows)
    # composes downstream: join the TVF result back to the base table
    j = cat.sql(
        "SELECT v.rank, e.vec_id FROM VECTOR_SEARCH("
        "TABLE emb, 'embedding', "
        "(SELECT 0, embedding FROM emb WHERE vec_id = 1), top_k => 2) v "
        "JOIN emb e ON v.vec_id = e.vec_id ORDER BY v.rank"
    ).collect()
    assert len(j) == 2 and j[0].vec_id == 1


def test_appends_changes_tvfs_r10(spark, tmp_path):
    """BigQuery change-history TVFs: APPENDS (insert rows only,
    half-open timestamp window, rewrites excluded) and CHANGES
    (INSERT/UPDATE/DELETE with the feed required) — r10."""
    import datetime
    import time

    import pytest

    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    )
    t = VersionedTable(spark, str(tmp_path / "cht"))
    t.create(base)
    t.enable_change_feed(["k"])
    cat.register("cht", t)
    time.sleep(0.02)
    mid = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    time.sleep(0.02)
    cat.sql("INSERT INTO cht VALUES (3, 30.0)")
    cat.sql("UPDATE cht SET v = 99.0 WHERE k = 1")
    cat.sql("DELETE FROM cht WHERE k = 2")
    # APPENDS: all inserts; DML commits contribute no appends
    a = cat.sql(
        "SELECT k, _CHANGE_TYPE AS ct FROM APPENDS(TABLE cht) ORDER BY k"
    ).collect()
    assert [(r.k, r.ct) for r in a] == [
        (1, "INSERT"), (2, "INSERT"), (3, "INSERT")]
    # half-open window: before `mid` only the create commit
    b = cat.sql(
        f"SELECT k FROM APPENDS(TABLE cht, NULL, TIMESTAMP '{mid}') "
        "ORDER BY k"
    ).collect()
    assert [r.k for r in b] == [1, 2]
    after = cat.sql(
        f"SELECT k FROM APPENDS(TABLE cht, TIMESTAMP '{mid}', NULL) "
        "ORDER BY k"
    ).collect()
    assert [r.k for r in after] == [3]
    # CHANGES: full history with BigQuery change types; timestamps
    # are non-decreasing in commit order
    c = cat.sql(
        "SELECT k, _CHANGE_TYPE AS ct, _CHANGE_TIMESTAMP AS ts "
        "FROM CHANGES(TABLE cht, NULL, NULL) ORDER BY ts, ct, k"
    ).collect()
    assert [(r.k, r.ct) for r in c] == [
        (1, "INSERT"), (2, "INSERT"), (3, "INSERT"),
        (1, "UPDATE"), (2, "DELETE")]
    assert all(x.ts <= y.ts for x, y in zip(c, c[1:]))
    # update post-image value, not pre-image
    up = [r for r in cat.sql(
        "SELECT k, v, _CHANGE_TYPE AS ct FROM CHANGES(TABLE cht, NULL, "
        "NULL)"
    ).collect() if r.ct == "UPDATE"]
    assert up[0].v == 99.0
    # refusal: DML history without the feed
    t2 = VersionedTable(spark, str(tmp_path / "nof"))
    t2.create(base)
    cat.register("nof", t2)
    cat.sql("UPDATE nof SET v = 0 WHERE k = 1")
    with pytest.raises(ValueError, match="enable_change_feed"):
        cat.sql("SELECT * FROM CHANGES(TABLE nof, NULL, NULL)").collect()
    # APPENDS over the same history simply skips the rewrite commit
    a2 = cat.sql(
        "SELECT k FROM APPENDS(TABLE nof, NULL, NULL) ORDER BY k"
    ).collect()
    assert [r.k for r in a2] == [1, 2]
    # malformed bounds refuse loudly
    with pytest.raises(ValueError, match="TIMESTAMP"):
        cat.sql("SELECT * FROM APPENDS(TABLE cht, k, NULL)")
