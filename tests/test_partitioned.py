"""Partitioned + clustered lake tables (r6 — BigQuery ``PARTITION BY``
/ ``CLUSTER BY``, the delegated engine's flagship scale feature; the
reference's own tables are date-partitioned BigQuery tables, ref
migrations/versions/*.py + main.py's BigQuery delegation).

The scale contract under test: partition elimination is MANIFEST-side
(pruned partitions' files never reach Spark's planner), DML whose
predicate pins partitions rewrites only those partitions' files, and
INFORMATION_SCHEMA.PARTITIONS is served from manifests with zero data
scan."""

from __future__ import annotations

import datetime
import os

import pytest

from bigquery_etl_spark.sources.lake_sql import (
    LakeCatalog,
    _col_constraints,
    _part_possible,
)
from bigquery_etl_spark.sources.versioned import NULL_PART


def _mk(spark, tmp_path, n=400, with_nulls=False, **create_kw):
    """events-ish fixture: ~13 months of days, int keys, amounts."""
    rows = []
    base = datetime.date(2024, 1, 1)
    for i in range(n):
        d = base + datetime.timedelta(days=i % 390)
        rows.append((i, d, i % 7, float(i)))
    df = spark.createDataFrame(
        rows, "k long, d date, cat int, amt double"
    )
    if with_nulls:
        null_rows = spark.createDataFrame(
            [(10_000, None, 0, -1.0)], "k long, d date, cat int, amt double"
        )
        df = df.unionByName(null_rows)
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    df.createOrReplaceTempView("part_src")
    return cat, df


def test_ctas_partition_layout_and_manifest(spark, tmp_path):
    cat, df = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE ev PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    tbl = cat.tables["ev"]
    entries = tbl.files()
    assert entries and all("part" in e for e in entries)
    months = {e["part"] for e in entries}
    assert "2024-01" in months and len(months) == 13
    # Hive-style dirs on disk, partition column NOT in the data files
    # (derived __p lives only in directory names)
    assert "__p=" in entries[0]["path"]
    assert [f.name for f in tbl.read().schema.fields] == [
        "k", "d", "cat", "amt",
    ]
    # reads reproduce the source exactly (layout is invisible)
    assert sorted(map(tuple, tbl.read().collect())) == sorted(
        map(tuple, df.collect())
    )


def test_partition_pruning_prunes_files_and_keeps_results(spark, tmp_path):
    cat, df = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE ev PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    q = "SELECT k, d, amt FROM ev WHERE d >= '2024-03-05' AND d < '2024-05-01'"
    got = cat.sql(q)
    # manifest-side pruning: only files from possible months enter the
    # scan — 2024-03 (boundary month kept: truncation is conservative)
    # through 2024-04
    scanned = {os.path.basename(os.path.dirname(p)) for p in got.inputFiles()}
    assert scanned == {"__p=2024-03", "__p=2024-04"}
    expect = sorted(
        (r.k, r.d, r.amt)
        for r in df.collect()
        if datetime.date(2024, 3, 5) <= r.d < datetime.date(2024, 5, 1)
    )
    assert sorted(map(tuple, got.collect())) == expect


@pytest.mark.parametrize(
    "pred",
    [
        "d = '2024-02-11'",
        "d > '2024-11-30'",
        "d >= '2024-12-01'",
        "d BETWEEN '2024-02-01' AND '2024-02-29'",
        "d IN ('2024-01-03', '2024-06-09')",
        "d < '2024-01-20'",
        "d <= '2024-01-20'",
    ],
)
def test_pruned_results_equal_full_scan(spark, tmp_path, pred):
    """Property: pruning must never change results — every comparison
    op, including the strict ones the truncation rule must keep."""
    cat, df = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE ev PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    got = cat.sql(f"SELECT k FROM ev WHERE {pred}")
    df.createOrReplaceTempView("full_src")
    want = spark.sql(f"SELECT k FROM full_src WHERE {pred}")
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in want.collect()
    )
    # and it actually pruned: fewer files than the full table
    assert len(got.inputFiles()) < len(cat.tables["ev"].files())


def test_identity_and_day_partitioning(spark, tmp_path):
    cat, df = _mk(spark, tmp_path, n=60)
    cat.sql("CREATE TABLE byday PARTITION BY d AS SELECT * FROM part_src")
    tbl = cat.tables["byday"]
    assert {e["part"] for e in tbl.files()} == {
        str(r.d) for r in df.select("d").distinct().collect()
    }
    got = cat.sql("SELECT k FROM byday WHERE d = '2024-01-07'")
    assert len(got.inputFiles()) < len(tbl.files())
    assert sorted(r.k for r in got.collect()) == [6]


def test_range_bucket_partitioning_keeps_out_of_range(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path, n=50)
    spark.sql(
        "SELECT k * 100 AS k2, d, amt FROM part_src"
    ).createOrReplaceTempView("range_src")
    cat.sql(
        "CREATE TABLE rb PARTITION BY "
        "RANGE_BUCKET(k2, GENERATE_ARRAY(0, 3000, 1000)) "
        "AS SELECT * FROM range_src"
    )
    tbl = cat.tables["rb"]
    parts = {e["part"] for e in tbl.files()}
    # buckets 0,1000,2000 plus the out-of-range (>=3000) NULL partition
    assert parts == {"0", "1000", "2000", NULL_PART}
    got = cat.sql("SELECT k2 FROM rb WHERE k2 >= 2500")
    # bucket 2000 possible, buckets 0/1000 pruned, out-of-range KEPT
    scanned = {os.path.basename(os.path.dirname(p)) for p in got.inputFiles()}
    assert scanned == {"__p=2000", f"__p={NULL_PART}"}
    assert sorted(r.k2 for r in got.collect()) == [
        k * 100 for k in range(25, 50)
    ]


def test_null_partition_pruned_by_comparisons(spark, tmp_path):
    cat, df = _mk(spark, tmp_path, n=40, with_nulls=True)
    cat.sql("CREATE TABLE nv PARTITION BY d AS SELECT * FROM part_src")
    tbl = cat.tables["nv"]
    assert NULL_PART in {e["part"] for e in tbl.files()}
    got = cat.sql("SELECT k FROM nv WHERE d >= '2024-01-01'")
    scanned = {os.path.basename(os.path.dirname(p)) for p in got.inputFiles()}
    assert f"__p={NULL_PART}" not in scanned  # 3VL: NULL can't match
    assert len(got.collect()) == 40
    # IS NULL has no extractable constraint — full scan, correct rows
    assert [r.k for r in cat.sql("SELECT k FROM nv WHERE d IS NULL").collect()] == [10_000]


def test_require_partition_filter(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path, n=30)
    cat.sql(
        "CREATE TABLE guarded PARTITION BY d "
        "OPTIONS(require_partition_filter=true) AS SELECT * FROM part_src"
    )
    with pytest.raises(ValueError, match="require_partition_filter"):
        cat.sql("SELECT COUNT(*) AS n FROM guarded")
    n = cat.sql(
        "SELECT COUNT(*) AS n FROM guarded WHERE d = '2024-01-03'"
    ).collect()[0].n
    assert n == 1


def test_partition_decorator_select_and_insert(spark, tmp_path):
    cat, df = _mk(spark, tmp_path, n=60)
    cat.sql(
        "CREATE TABLE dec PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    got = cat.sql("SELECT k FROM dec$202402")
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in df.collect() if r.d.month == 2
    )
    assert len(got.inputFiles()) < len(cat.tables["dec"].files())
    # a '$' inside a string literal is NOT a decorator
    s = cat.sql("SELECT 'dec$202402' AS s FROM dec$202402 LIMIT 1").collect()
    assert s[0].s == "dec$202402"
    # INSERT INTO t$p: rows outside the partition refuse whole
    with pytest.raises(ValueError, match="outside partition"):
        cat.sql(
            "INSERT INTO dec$202402 "
            "SELECT 999, DATE '2024-03-01', 0, 1.0"
        )
    v = cat.sql(
        "INSERT INTO dec$202402 SELECT 999, DATE '2024-02-15', 0, 1.0"
    )
    assert v == 2
    assert 999 in {r.k for r in cat.sql("SELECT k FROM dec$202402").collect()}


def test_partition_scoped_delete_carries_untouched_files(spark, tmp_path):
    cat, df = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE dml PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    tbl = cat.tables["dml"]
    before = {e["path"]: e["part"] for e in tbl.files(version=1)}
    cat.sql("DELETE FROM dml WHERE d BETWEEN '2024-03-01' AND '2024-03-31' AND cat = 2")
    after = {e["path"]: e["part"] for e in tbl.files(version=2)}
    # every non-March file entry carried BY REFERENCE (same path)
    for p, part in before.items():
        if part != "2024-03":
            assert p in after
    # March was rewritten: old March paths gone
    assert not any(
        p in after for p, part in before.items() if part == "2024-03"
    )
    # and the rows are right
    want = sorted(
        r.k
        for r in df.collect()
        if not (r.d.month == 3 and r.d.year == 2024 and r.cat == 2)
    )
    assert sorted(r.k for r in cat.sql("SELECT k FROM dml").collect()) == want


def test_partition_scoped_update_and_move_fallback(spark, tmp_path):
    cat, df = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE updml PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    tbl = cat.tables["updml"]
    before = {e["path"]: e["part"] for e in tbl.files(version=1)}
    cat.sql("UPDATE updml SET amt = amt + 1000 WHERE d >= '2024-12-01' AND d <= '2024-12-31'")
    after = {e["path"]: e["part"] for e in tbl.files(version=2)}
    for p, part in before.items():
        if part != "2024-12":
            assert p in after
    got = {
        r.k: r.amt for r in cat.sql("SELECT k, amt FROM updml").collect()
    }
    for r in df.collect():
        want = r.amt + 1000 if (r.d.year, r.d.month) == (2024, 12) else r.amt
        assert got[r.k] == want
    # assigning the partition source column falls back to full rewrite
    # (rows may move partitions) and still lands correctly
    cat.sql("UPDATE updml SET d = DATE '2025-06-01' WHERE k = 0")
    moved = cat.sql("SELECT d FROM updml WHERE k = 0").collect()[0].d
    assert moved == datetime.date(2025, 6, 1)
    assert "2025-06" in {e["part"] for e in tbl.files()}


def test_cdf_on_partition_scoped_dml(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path, n=90)
    cat.sql(
        "CREATE TABLE cdfp PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    tbl = cat.tables["cdfp"]
    tbl.enable_change_feed(["k"])
    cat.sql("DELETE FROM cdfp WHERE d >= '2024-02-01' AND d < '2024-03-01' AND cat = 1")
    ch = tbl.changes(tbl.latest_version(), tbl.latest_version())
    deleted = sorted(
        r.k for r in ch.filter(ch._change_type == "delete").collect()
    )
    assert deleted == sorted(
        i for i in range(90)
        if (datetime.date(2024, 1, 1) + datetime.timedelta(days=i)).month == 2
        and i % 7 == 1
    )


def test_cluster_by_orders_within_partitions(spark, tmp_path):
    cat, _ = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE clus PARTITION BY DATE_TRUNC(d, MONTH) "
        "CLUSTER BY cat AS SELECT * FROM part_src"
    )
    tbl = cat.tables["clus"]
    spec = tbl._partition_spec()
    assert spec["cluster"] == ["cat"]
    # appends inherit the layout with no caller cooperation
    cat.sql("INSERT INTO clus SELECT 5000, DATE '2024-02-02', 3, 1.0")
    assert {e["part"] for e in tbl.files()} >= {"2024-02"}


def test_information_schema_partitions(spark, tmp_path):
    cat, df = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE meta PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    rows = cat.sql(
        "SELECT partition_id, total_rows FROM INFORMATION_SCHEMA.PARTITIONS "
        "WHERE table_name = 'meta' ORDER BY partition_id"
    ).collect()
    want = {}
    for r in df.collect():
        pid = f"{r.d.year}{r.d.month:02d}"
        want[pid] = want.get(pid, 0) + 1
    assert {r.partition_id: r.total_rows for r in rows} == want


def test_constraint_extraction_is_conservative(spark, tmp_path):
    """OR / NOT / set ops / CASE / qualified refs / subquery IN must
    all disable pruning (correctness before elimination)."""
    for text, col in [
        ("SELECT * FROM t WHERE d = '2024-01-01' OR cat = 1", "d"),
        ("SELECT * FROM t WHERE NOT d = '2024-01-01'", "d"),
        ("SELECT * FROM t WHERE d = '2024-01-01' UNION ALL SELECT * FROM t", "d"),
        ("SELECT CASE WHEN d = '2024-01-01' THEN 1 END FROM t", "d"),
        ("SELECT * FROM t WHERE o.d = '2024-01-01'", "d"),
        ("SELECT * FROM t WHERE d IN (SELECT d FROM u)", "d"),
        ("SELECT * FROM t", "d"),
    ]:
        assert _col_constraints(text, col) == []
    cons = _col_constraints(
        "SELECT * FROM t WHERE d >= '2024-03-05' AND cat = 2", "d"
    )
    assert (">=", "2024-03-05") in cons
    # month grain: strict > on a mid-month value keeps the month
    assert _part_possible("2024-03", [(">", "2024-03-05")],
                          {"source": "d", "granularity": "month"})
    assert not _part_possible("2024-02", [(">", "2024-03-05")],
                              {"source": "d", "granularity": "month"})
    # identity: strict > excludes the exact value
    assert not _part_possible("2024-03-05", [(">", "2024-03-05")],
                              {"source": "d", "granularity": "identity"})
    # identity numeric compares numerically, not lexically
    assert _part_possible("9", [("<", "10")],
                          {"source": "k", "granularity": "identity"})


def test_explicit_schema_ddl(spark, tmp_path):
    """BigQuery CREATE TABLE t (cols) — empty table declared up front
    (BQ types mapped), partitioning applied from the first INSERT on."""
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql(
        "CREATE TABLE decl (k INT64, d DATE, amt FLOAT64, "
        "price NUMERIC) PARTITION BY DATE_TRUNC(d, MONTH)"
    )
    tbl = cat.tables["decl"]
    assert tbl.read().count() == 0
    assert dict(tbl.read().dtypes) == {
        "k": "bigint", "d": "date", "amt": "double",
        "price": "decimal(38,9)",
    }
    cat.sql(
        "INSERT INTO decl SELECT 1, DATE '2024-02-03', 1.5, CAST(2 AS DECIMAL(38,9))"
    )
    cat.sql(
        "INSERT INTO decl SELECT 2, DATE '2024-03-04', 2.5, CAST(3 AS DECIMAL(38,9))"
    )
    assert {e["part"] for e in tbl.files()} == {"2024-02", "2024-03"}
    got = cat.sql("SELECT k FROM decl WHERE d >= '2024-03-01'")
    assert [r.k for r in got.collect()] == [2]
    assert len(got.inputFiles()) == 1  # February pruned
    # plain (unpartitioned) declared table
    cat.sql("CREATE TABLE decl2 (a INT64, b STRING)")
    cat.sql("INSERT INTO decl2 SELECT 5, 'x'")
    assert [tuple(r) for r in cat.sql("SELECT * FROM decl2").collect()] == [
        (5, "x")
    ]
    with pytest.raises(ValueError, match="use CTAS"):
        cat.sql("CREATE TABLE bad (a INT64) AS SELECT 1")


def test_partition_scoped_merge(spark, tmp_path):
    """MERGE whose ON pins t.d = s.d rewrites only the source's
    partitions; everything else is carried by reference."""
    cat, df = _mk(spark, tmp_path)
    cat.sql(
        "CREATE TABLE pm PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    tbl = cat.tables["pm"]
    before = {e["path"]: e["part"] for e in tbl.files(version=1)}
    spark.createDataFrame(
        [(0, datetime.date(2024, 1, 1), 9, 999.0),
         (20_000, datetime.date(2024, 1, 15), 1, 1.0)],
        "k long, d date, cat int, amt double",
    ).createOrReplaceTempView("pm_src")
    cat.sql(
        "MERGE INTO pm t USING pm_src s "
        "ON t.d = s.d AND t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt, cat = s.cat "
        "WHEN NOT MATCHED THEN INSERT (k, d, cat, amt) "
        "VALUES (s.k, s.d, s.cat, s.amt)"
    )
    after = {e["path"]: e["part"] for e in tbl.files(version=2)}
    for p, part in before.items():
        if part != "2024-01":
            assert p in after  # carried by reference
    assert not any(p in after for p, part in before.items() if part == "2024-01")
    got = {r.k: (r.amt, r.cat) for r in cat.sql("SELECT * FROM pm").collect()}
    assert got[0] == (999.0, 9) and got[20_000] == (1.0, 1)
    assert len(got) == 401


def test_merge_without_partition_pin_falls_back(spark, tmp_path):
    """No t.d = s.d equality in ON -> a source row may match a target
    row in ANY partition; scoping must not fire."""
    cat, df = _mk(spark, tmp_path, n=60)
    cat.sql(
        "CREATE TABLE pm2 PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    tbl = cat.tables["pm2"]
    before = set(e["path"] for e in tbl.files(version=1))
    # source row dated March matches (by key) a January target row
    spark.createDataFrame(
        [(3, datetime.date(2024, 3, 20), 0, -5.0)],
        "k long, d date, cat int, amt double",
    ).createOrReplaceTempView("pm2_src")
    cat.sql(
        "MERGE INTO pm2 t USING pm2_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt"
    )
    # full rewrite: no stale carried files
    assert not (before & set(e["path"] for e in tbl.files(version=2)))
    got = {r.k: r.amt for r in cat.sql("SELECT * FROM pm2").collect()}
    assert got[3] == -5.0  # the January row WAS updated


def test_scoped_merge_stray_insert_falls_back(spark, tmp_path):
    """An INSERT expression that lands outside the source's partitions
    trips the stray check and redoes the merge unscoped — correctness
    over the saved rewrite."""
    cat, df = _mk(spark, tmp_path, n=60)
    cat.sql(
        "CREATE TABLE pm3 PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM part_src"
    )
    spark.createDataFrame(
        [(30_000, datetime.date(2024, 2, 1), 0, 1.0)],
        "k long, d date, cat int, amt double",
    ).createOrReplaceTempView("pm3_src")
    cat.sql(
        "MERGE INTO pm3 t USING pm3_src s ON t.d = s.d AND t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, d, cat, amt) "
        "VALUES (s.k, date_add(s.d, 200), s.cat, s.amt)"
    )
    got = cat.sql("SELECT d FROM pm3 WHERE k = 30000").collect()
    assert got[0].d == datetime.date(2024, 8, 19)
    assert "2024-08" in {e["part"] for e in cat.tables["pm3"].files()}


def test_insert_column_list_and_defaults(spark, tmp_path):
    """BigQuery column-list INSERT + column DEFAULTs: omitted columns
    fill from their declared DEFAULT expression, else NULL."""
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql(
        "CREATE TABLE dft (k INT64, status STRING DEFAULT 'new', "
        "score FLOAT64 DEFAULT 1.5, note STRING)"
    )
    cat.sql("INSERT INTO dft (k) SELECT 1")
    cat.sql("INSERT INTO dft (k, status) VALUES (2, 'done')")
    cat.sql("INSERT INTO dft (note, k) SELECT 'n3', 3")  # any order
    rows = {r.k: (r.status, r.score, r.note)
            for r in cat.sql("SELECT * FROM dft").collect()}
    assert rows == {
        1: ("new", 1.5, None),
        2: ("done", 1.5, None),
        3: ("new", 1.5, "n3"),
    }
    # ALTER ... SET / DROP DEFAULT are metadata-only commits
    cat.sql("ALTER TABLE dft ALTER COLUMN status SET DEFAULT 'queued'")
    cat.sql("INSERT INTO dft (k) SELECT 4")
    cat.sql("ALTER TABLE dft ALTER COLUMN status DROP DEFAULT")
    cat.sql("INSERT INTO dft (k) SELECT 5")
    rows = {r.k: r.status for r in cat.sql("SELECT * FROM dft").collect()}
    assert rows[4] == "queued" and rows[5] is None
    # full-width INSERT still positional
    cat.sql("INSERT INTO dft SELECT 6, 's', 2.0, 'x'")
    assert cat.sql("SELECT COUNT(*) AS n FROM dft").collect()[0].n == 6
    # unknown column refuses
    with pytest.raises(ValueError, match="unknown columns"):
        cat.sql("INSERT INTO dft (nope) SELECT 1")
    with pytest.raises(ValueError, match="values for"):
        cat.sql("INSERT INTO dft (k, note) SELECT 1")
