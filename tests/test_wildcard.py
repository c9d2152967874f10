"""BigQuery wildcard (sharded) tables in the lake catalog (r6):
`prefix_*` scans matching shards with a _TABLE_SUFFIX pseudo-column;
conjunctive suffix predicates prune whole shards at plan time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def shard_cat(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path))
    for i in range(4):
        df = spark.createDataFrame(
            [(i * 10 + j, f"u{j}", float(j)) for j in range(5)],
            "id long, user string, amt double",
        )
        cat.create_table(f"ev_{i:02d}", str(tmp_path / f"ev_{i:02d}"), df)
    return cat


def test_wildcard_union_and_pseudo_column(shard_cat):
    out = shard_cat.sql(
        "SELECT _TABLE_SUFFIX AS shard, COUNT(*) AS n FROM `ev_*` "
        "GROUP BY _TABLE_SUFFIX ORDER BY shard"
    )
    assert [(r["shard"], r["n"]) for r in out.collect()] == [
        ("00", 5), ("01", 5), ("02", 5), ("03", 5)
    ]


def test_wildcard_between_prunes_shards(shard_cat, tmp_path):
    out = shard_cat.sql(
        "SELECT _TABLE_SUFFIX AS shard, SUM(amt) AS s FROM `ev_*` "
        "WHERE _TABLE_SUFFIX BETWEEN '01' AND '02' GROUP BY _TABLE_SUFFIX"
    )
    assert sorted(r["shard"] for r in out.collect()) == ["01", "02"]
    files = out.inputFiles()
    # whole-shard pruning: the 00 and 03 tables are not in the scan
    assert files
    assert not any("/ev_00/" in f or "/ev_03/" in f for f in files)
    assert any("/ev_01/" in f for f in files) and any("/ev_02/" in f for f in files)


def test_wildcard_eq_and_in_constraints(shard_cat):
    out = shard_cat.sql(
        "SELECT COUNT(*) AS n FROM `ev_*` WHERE _TABLE_SUFFIX = '02'"
    )
    assert out.collect()[0]["n"] == 5
    out2 = shard_cat.sql(
        "SELECT COUNT(*) AS n FROM `ev_*` WHERE _TABLE_SUFFIX IN ('00', '03')"
    )
    assert out2.inputFiles() and not any(
        "/ev_01/" in f or "/ev_02/" in f for f in out2.inputFiles()
    )
    assert out2.collect()[0]["n"] == 10


def test_wildcard_or_disables_pruning_but_stays_correct(shard_cat):
    out = shard_cat.sql(
        "SELECT COUNT(*) AS n FROM `ev_*` "
        "WHERE _TABLE_SUFFIX = '01' OR amt > 3"
    )
    # OR → conservative: every shard scanned, rows still filtered right
    files = out.inputFiles()
    assert all(any(f"/ev_{i:02d}/" in f for f in files) for i in range(4))
    # shard 01 contributes 5, others contribute amt=4 row each
    assert out.collect()[0]["n"] == 5 + 3


def test_wildcard_schema_drift_null_fills(shard_cat, spark, tmp_path):
    extra = spark.createDataFrame(
        [(100, "u9", 1.0, "web")], "id long, user string, amt double, src string"
    )
    shard_cat.create_table("ev_99", str(tmp_path / "ev_99"), extra)
    out = shard_cat.sql(
        "SELECT _TABLE_SUFFIX AS shard, src FROM `ev_*` "
        "WHERE _TABLE_SUFFIX IN ('00', '99') ORDER BY shard, src"
    )
    rows = out.collect()
    assert {r["shard"] for r in rows} == {"00", "99"}
    assert all(r["src"] is None for r in rows if r["shard"] == "00")
    assert any(r["src"] == "web" for r in rows if r["shard"] == "99")


def test_wildcard_all_pruned_is_empty_with_schema(shard_cat):
    out = shard_cat.sql(
        "SELECT id, _TABLE_SUFFIX FROM `ev_*` WHERE _TABLE_SUFFIX = '77'"
    )
    assert out.count() == 0
    assert out.columns == ["id", "_TABLE_SUFFIX"]


def test_wildcard_no_match_raises(shard_cat):
    with pytest.raises(KeyError, match="matches no lake tables"):
        shard_cat.sql("SELECT COUNT(*) AS n FROM `nope_*`")


def test_wildcard_literal_containing_or_still_prunes(shard_cat):
    """'OR' inside a string literal must not disable pruning (the
    literal-stripping guard)."""
    out = shard_cat.sql(
        "SELECT COUNT(*) AS n FROM `ev_*` "
        "WHERE _TABLE_SUFFIX = '01' AND user <> 'ORACLE'"
    )
    files = out.inputFiles()
    assert files and all("/ev_01/" in f for f in files)
    assert out.collect()[0]["n"] == 5
