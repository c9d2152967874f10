"""Materialized views (r6): CDF-maintained aggregate state + BigQuery
smart rewrite. Every maintenance mode is checked against the invariant
that matters: maintained view ≡ full recompute over the new snapshot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_catalog(spark, tmp_path, rows=None):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path))
    if rows is None:
        rows = [
            (i, ["A", "B", "C"][i % 3], ["x", "y"][i % 2], float(i))
            for i in range(1, 31)
        ]
    df = spark.createDataFrame(
        rows, "id long, grp string, sub string, val double"
    ).withColumn("val", F.col("val").cast("decimal(18,6)"))
    cat.create_table("t", str(tmp_path / "t"), df)
    return cat


def _recompute(cat, agg_sql):
    cat.tables["t"].read().createOrReplaceTempView("__t_snap")
    return {tuple(r) for r in cat.spark.sql(agg_sql).collect()}


ROLLUP = "SELECT grp, SUM(val) AS s, COUNT(*) AS n, AVG(val) AS a FROM t GROUP BY grp"
ROLLUP_DIRECT = (
    "SELECT grp, SUM(val) AS s, COUNT(*) AS n, "
    "CAST(SUM(val) AS DOUBLE)/COUNT(val) AS a FROM __t_snap GROUP BY grp"
)


def test_matview_create_and_rewrite_rollup(spark, tmp_path):
    """Initial state matches a direct aggregate, and a coarser-grained
    aggregate over the BASE table is served from the view (roll-up of
    mergeable state), flagged via last_mv_rewrite."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, sub, SUM(val) AS s, "
        "COUNT(*) AS n, AVG(val) AS a FROM t GROUP BY grp, sub"
    )
    out = cat.sql(ROLLUP)
    assert cat.last_mv_rewrite == "mv1"
    assert {tuple(r) for r in out.collect()} == _recompute(cat, ROLLUP_DIRECT)


def test_matview_rewrite_does_not_scan_base_table(spark, tmp_path):
    """The rewritten plan reads the view's state files, never the base
    table's data directory — the smart-rewrite point at 100 TB."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, SUM(val) AS s, "
        "COUNT(*) AS n FROM t GROUP BY grp"
    )
    out = cat.sql("SELECT grp, SUM(val) AS s FROM t GROUP BY grp")
    assert cat.last_mv_rewrite == "mv1"
    files = out.inputFiles()
    assert files and all("/_mv_mv1/" in f for f in files)
    assert not any(str(tmp_path / "t") in f for f in files)


def test_matview_maintained_through_dml(spark, tmp_path):
    """INSERT + UPDATE + DELETE through the catalog auto-refresh the
    view off the change feed; maintained ≡ recompute, including group
    REMOVAL when a group's last row is deleted."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, sub, SUM(val) AS s, "
        "COUNT(*) AS n, AVG(val) AS a FROM t GROUP BY grp, sub"
    )
    ins = cat.spark.createDataFrame(
        [(100 + i, "D", "x", float(50 + i)) for i in range(5)],
        "id long, grp string, sub string, val double",
    ).withColumn("val", F.col("val").cast("decimal(18,6)"))
    ins.createOrReplaceTempView("mv_ins_src")
    cat.sql("INSERT INTO t SELECT * FROM mv_ins_src")
    cat.sql("UPDATE t SET val = val * 2 WHERE id % 5 = 0")
    # grp A is exactly id%3==0 — this DELETE removes the whole group
    cat.sql("DELETE FROM t WHERE id % 3 = 0")
    out = cat.sql(ROLLUP)
    assert cat.last_mv_rewrite == "mv1"
    got = {tuple(r) for r in out.collect()}
    assert got == _recompute(cat, ROLLUP_DIRECT)
    assert not any(r[0] == "A" for r in got)  # removed group is GONE
    # maintenance was incremental: the state table advanced one version
    # per DML commit, never rebuilt from scratch
    hist = cat.matviews["mv1"].state.history()
    assert [h["kind"] for h in hist] == ["create"] + ["overwrite"] * 3


def test_matview_null_sum_semantics(spark, tmp_path):
    """A group whose surviving measure rows are all NULL presents a
    NULL sum/avg and count 0 — SQL semantics, maintained exactly
    through retraction (the __nn companion discipline)."""
    rows = [
        (1, "A", "x", 10.0),
        (2, "A", "x", None),
        (3, "B", "x", 5.0),
    ]
    cat = _mk_catalog(spark, tmp_path, rows=rows)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, SUM(val) AS s, "
        "COUNT(val) AS c, COUNT(*) AS n, AVG(val) AS a FROM t GROUP BY grp"
    )
    # retract A's only non-NULL row: sum/avg must become NULL, c 0, n 1
    cat.sql("DELETE FROM t WHERE id = 1")
    rows_out = {r["grp"]: r for r in cat.sql(
        "SELECT grp, SUM(val) AS s, COUNT(val) AS c, COUNT(*) AS n, "
        "AVG(val) AS a FROM t GROUP BY grp"
    ).collect()}
    assert cat.last_mv_rewrite == "mv1"
    a = rows_out["A"]
    assert a["s"] is None and a["a"] is None and a["c"] == 0 and a["n"] == 1
    b = rows_out["B"]
    assert float(b["s"]) == 5.0 and b["c"] == 1


def test_matview_minmax_scoped_recompute(spark, tmp_path):
    """MIN/MAX views recompute only touched groups (retracting an
    extremum needs the group's rows); result ≡ recompute after deletes
    that remove current minima and maxima."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mvx AS SELECT grp, MIN(val) AS mn, "
        "MAX(val) AS mx, COUNT(*) AS n FROM t GROUP BY grp"
    )
    # remove the global max (30) and min (1), plus a mid value
    cat.sql("DELETE FROM t WHERE id IN (1, 17, 30)")
    out = cat.sql("SELECT grp, MIN(val) AS mn, MAX(val) AS mx FROM t GROUP BY grp")
    assert cat.last_mv_rewrite == "mvx"
    assert {tuple(r) for r in out.collect()} == _recompute(
        cat, "SELECT grp, MIN(val) AS mn, MAX(val) AS mx FROM __t_snap GROUP BY grp"
    )


def test_matview_where_predicate_view(spark, tmp_path):
    """A filtered view maintains only rows passing its predicate —
    including rows MOVING across the predicate via UPDATE (pre-image
    retracts, post-image inserts, each filtered independently)."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mvf AS SELECT grp, SUM(val) AS s, "
        "COUNT(*) AS n FROM t WHERE val >= 10 GROUP BY grp"
    )
    # moves ids 1-9 across the threshold, and 25+ x2 (stays inside)
    cat.sql("UPDATE t SET val = val * 3 WHERE id < 10 OR id > 24")
    out = cat.sql(
        "SELECT grp, SUM(val) AS s, COUNT(*) AS n FROM t WHERE val >= 10 GROUP BY grp"
    )
    assert cat.last_mv_rewrite == "mvf"
    assert {tuple(r) for r in out.collect()} == _recompute(
        cat,
        "SELECT grp, SUM(val) AS s, COUNT(*) AS n FROM __t_snap "
        "WHERE val >= 10 GROUP BY grp",
    )


def test_matview_residual_key_predicate(spark, tmp_path):
    """An unfiltered view still serves a query with a WHERE over the
    view's GROUP BY keys (residual applied on the state); a predicate
    over a non-key column correctly refuses the rewrite."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, sub, SUM(val) AS s, "
        "COUNT(*) AS n FROM t GROUP BY grp, sub"
    )
    out = cat.sql(
        "SELECT grp, SUM(val) AS s FROM t WHERE sub = 'x' GROUP BY grp"
    )
    assert cat.last_mv_rewrite == "mv1"
    assert {tuple(r) for r in out.collect()} == _recompute(
        cat, "SELECT grp, SUM(val) AS s FROM __t_snap WHERE sub = 'x' GROUP BY grp"
    )
    cat.sql("SELECT grp, SUM(val) AS s FROM t WHERE val > 5 GROUP BY grp")
    assert cat.last_mv_rewrite is None  # val is not a view key


def test_matview_rewrite_refusals(spark, tmp_path):
    """Non-derivable shapes fall through to the base table unchanged:
    measure the view lacks, grouping key outside the view's, DISTINCT
    aggregates, joins."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, SUM(val) AS s "
        "FROM t GROUP BY grp"
    )
    for q in (
        "SELECT grp, MIN(val) AS mn FROM t GROUP BY grp",  # no min state
        "SELECT sub, SUM(val) AS s FROM t GROUP BY sub",  # key not in view
        "SELECT grp, COUNT(DISTINCT sub) AS d FROM t GROUP BY grp",
        "SELECT grp, SUM(id) AS s FROM t GROUP BY grp",  # other expr
    ):
        df = cat.sql(q)
        assert cat.last_mv_rewrite is None, q
        assert df.count() > 0  # plain path still answers

    # derivations beyond exact match: SUM/COUNT from an AVG-only view
    cat.sql(
        "CREATE MATERIALIZED VIEW mv2 AS SELECT sub, AVG(val) AS a "
        "FROM t GROUP BY sub"
    )
    out = cat.sql(
        "SELECT sub, SUM(val) AS s, COUNT(val) AS c FROM t GROUP BY sub"
    )
    assert cat.last_mv_rewrite == "mv2"
    assert {tuple(r) for r in out.collect()} == _recompute(
        cat, "SELECT sub, SUM(val) AS s, COUNT(val) AS c FROM __t_snap GROUP BY sub"
    )


def test_matview_refresh_after_external_commit(spark, tmp_path):
    """A commit that bypassed the catalog (direct VersionedTable
    append) leaves the view stale; REFRESH MATERIALIZED VIEW — and the
    rewrite path itself — catch it up through the change feed."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, SUM(val) AS s, "
        "COUNT(*) AS n FROM t GROUP BY grp"
    )
    ext = cat.spark.createDataFrame(
        [(200, "B", "y", 99.0)], "id long, grp string, sub string, val double"
    ).withColumn("val", F.col("val").cast("decimal(18,6)"))
    cat.tables["t"].append(ext)  # NOT through cat.sql
    v = cat.sql("REFRESH MATERIALIZED VIEW mv1")
    assert v == cat.tables["t"].latest_version()
    out = cat.sql("SELECT grp, SUM(val) AS s, COUNT(*) AS n FROM t GROUP BY grp")
    assert cat.last_mv_rewrite == "mv1"
    assert {tuple(r) for r in out.collect()} == _recompute(
        cat, "SELECT grp, SUM(val) AS s, COUNT(*) AS n FROM __t_snap GROUP BY grp"
    )


def test_matview_direct_select_and_drop(spark, tmp_path):
    """The view is queryable by name like any table; DROP removes it
    and later aggregates fall back to the base scan."""
    cat = _mk_catalog(spark, tmp_path)
    cat.sql(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT grp, SUM(val) AS s, "
        "COUNT(*) AS n FROM t GROUP BY grp"
    )
    direct = cat.sql("SELECT grp, s, n FROM mv1 ORDER BY grp")
    assert [r["grp"] for r in direct.collect()] == ["A", "B", "C"]
    cat.sql("DROP MATERIALIZED VIEW mv1")
    assert "mv1" not in cat.matviews
    df = cat.sql("SELECT grp, SUM(val) AS s FROM t GROUP BY grp")
    assert cat.last_mv_rewrite is None and df.count() == 3


def test_matview_create_rejects_unsupported(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import MergeParseError

    cat = _mk_catalog(spark, tmp_path)
    with pytest.raises(MergeParseError):
        cat.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT grp, "
            "COUNT(DISTINCT sub) AS d FROM t GROUP BY grp"
        )
    with pytest.raises(KeyError):
        cat.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT x, SUM(y) AS s "
            "FROM not_a_table GROUP BY x"
        )


def test_matview_literal_keyword_in_predicate(spark, tmp_path):
    """The restricted parser uses the literal-aware scanner: a string
    literal containing ' GROUP BY ' must not split the statement."""
    rows = [(1, "a GROUP BY b", "x", 1.0), (2, "B", "x", 2.0)]
    cat = _mk_catalog(spark, tmp_path, rows=rows)
    cat.sql(
        "CREATE MATERIALIZED VIEW mvq AS SELECT sub, SUM(val) AS s "
        "FROM t WHERE grp <> 'a GROUP BY b' GROUP BY sub"
    )
    out = cat.sql(
        "SELECT sub, SUM(val) AS s FROM t WHERE grp <> 'a GROUP BY b' GROUP BY sub"
    )
    assert cat.last_mv_rewrite == "mvq"
    assert [(r["sub"], float(r["s"])) for r in out.collect()] == [("x", 2.0)]


def test_matview_over_partitioned_table(spark, tmp_path):
    """Compose check: a materialized view maintained off a PARTITIONED
    table's change feed — partition-scoped DML must produce the same
    maintained state as a recompute."""
    import datetime

    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, datetime.date(2024, 1 + i % 3, 1 + i % 5), float(i))
         for i in range(60)],
        "k long, d date, amt double",
    ).createOrReplaceTempView("mvp_src")
    cat.sql(
        "CREATE TABLE mvp PARTITION BY DATE_TRUNC(d, MONTH) "
        "AS SELECT * FROM mvp_src"
    )
    cat.sql(
        "CREATE MATERIALIZED VIEW mvp_tot AS "
        "SELECT d, COUNT(*) AS n, SUM(amt) AS total "
        "FROM mvp GROUP BY d"
    )
    # partition-scoped DELETE feeds the view through the change feed
    cat.sql("DELETE FROM mvp WHERE d >= '2024-02-01' AND d < '2024-03-01' AND k % 2 = 0")
    cat.sql("INSERT INTO mvp SELECT 100, DATE '2024-02-02', 7.0")
    served = {
        (str(r.d)): (r.n, r.total)
        for r in cat.sql("SELECT * FROM mvp_tot").collect()
    }
    # recompute OUTSIDE the catalog so the smart rewrite cannot serve
    # the check from the very state it is checking
    cat.tables["mvp"].read().createOrReplaceTempView("mvp_raw")
    want = {
        (str(r.d)): (r.n, r.total)
        for r in spark.sql(
            "SELECT d, COUNT(*) AS n, SUM(amt) AS total FROM mvp_raw GROUP BY d"
        ).collect()
    }
    assert served == want
