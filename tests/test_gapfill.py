"""GAP_FILL TVF (r11) — operators/gapfill.py + the lake_sql parse.

BigQuery semantics pinned here: complete per-partition grid between
min and max bucket, 'null'/'locf'/'linear' fill methods, stored NULLs
treated as missing observations, origin-anchored bucketing, duplicate
bucketized timestamps refuse, row access policies apply to TABLE
inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.sources.lake_sql import LakeCatalog


@pytest.fixture()
def series(spark):
    rows = [
        ("a", "2024-01-01 00:00:00", 10.0, 1),
        ("a", "2024-01-01 00:03:00", 40.0, 4),
        ("a", "2024-01-01 00:05:00", 60.0, 6),
        ("b", "2024-01-01 00:00:00", 1.0, 1),
        ("b", "2024-01-01 00:02:00", None, 9),
        ("b", "2024-01-01 00:04:00", 5.0, 5),
    ]
    df = spark.createDataFrame(
        rows, "dev string, ts string, sig double, cnt int"
    ).selectExpr("dev", "cast(ts as timestamp) ts", "sig", "cnt")
    df.createOrReplaceTempView("gft_series")
    return df


def test_gap_fill_linear_locf_null(spark, series):
    cat = LakeCatalog(spark)
    rows = cat.sql("""
        SELECT * FROM GAP_FILL(
            (SELECT * FROM gft_series),
            ts_column => 'ts',
            bucket_width => INTERVAL 1 MINUTE,
            partitioning_columns => ['dev'],
            value_columns => [('sig', 'linear'), ('cnt', 'locf')])
        ORDER BY dev, ts
    """).collect()
    a = [(r.sig, r.cnt) for r in rows if r.dev == "a"]
    # linear ramps through the two missing minutes; locf carries 1
    assert a == [
        (10.0, 1), (20.0, 1), (30.0, 1), (40.0, 4), (50.0, 4), (60.0, 6)
    ]
    b = [(r.sig, r.cnt) for r in rows if r.dev == "b"]
    # the stored NULL at 00:02 is a missing observation for linear
    # (interpolated 1→5) but its row's cnt=9 is a real value for locf
    assert b == [(1.0, 1), (2.0, 1), (3.0, 9), (4.0, 9), (5.0, 5)]


def test_gap_fill_null_method_and_default_columns(spark, series):
    cat = LakeCatalog(spark)
    rows = cat.sql("""
        SELECT * FROM GAP_FILL(
            (SELECT dev, ts, sig FROM gft_series WHERE dev = 'a'),
            ts_column => 'ts',
            bucket_width => INTERVAL 1 MINUTE,
            partitioning_columns => ['dev'])
        ORDER BY ts
    """).collect()
    # value_columns omitted -> every non-key column fills with 'null'
    assert [r.sig for r in rows] == [10.0, None, None, 40.0, None, 60.0]


def test_gap_fill_origin_shifts_grid(spark, series):
    cat = LakeCatalog(spark)
    rows = cat.sql("""
        SELECT * FROM GAP_FILL(
            (SELECT dev, ts, sig FROM gft_series WHERE dev = 'a'),
            ts_column => 'ts',
            bucket_width => INTERVAL 2 MINUTE,
            partitioning_columns => ['dev'],
            value_columns => [('sig', 'locf')],
            origin => TIMESTAMP '2024-01-01 00:01:00')
        ORDER BY ts
    """).collect()
    # grid anchored at :01 -> buckets 23:59/:01/:03/:05, never :00/:02
    assert [r.ts.strftime("%H:%M") for r in rows] == [
        "23:59", "00:01", "00:03", "00:05"
    ]


def test_gap_fill_duplicate_timestamps_refuse(spark, series):
    cat = LakeCatalog(spark)
    with pytest.raises(Exception, match="duplicate bucketized"):
        cat.sql("""
            SELECT * FROM GAP_FILL(
                (SELECT * FROM gft_series),
                ts_column => 'ts',
                bucket_width => INTERVAL 1 HOUR,
                partitioning_columns => ['dev'],
                value_columns => [('sig', 'locf')])
        """).collect()


def test_gap_fill_arg_validation(spark, series):
    cat = LakeCatalog(spark)
    with pytest.raises(ValueError, match="ignore_null_values"):
        cat.sql("""
            SELECT * FROM GAP_FILL((SELECT * FROM gft_series),
                ts_column => 'ts', bucket_width => INTERVAL 1 MINUTE,
                ignore_null_values => FALSE)
        """)
    with pytest.raises(ValueError, match="not fixed-width"):
        cat.sql("""
            SELECT * FROM GAP_FILL((SELECT * FROM gft_series),
                ts_column => 'ts', bucket_width => INTERVAL 1 MONTH)
        """)
    with pytest.raises(ValueError, match="unknown fill method"):
        cat.sql("""
            SELECT * FROM GAP_FILL((SELECT * FROM gft_series),
                ts_column => 'ts', bucket_width => INTERVAL 1 MINUTE,
                value_columns => [('sig', 'cubic')])
        """)
    with pytest.raises(ValueError, match="required"):
        cat.sql(
            "SELECT * FROM GAP_FILL((SELECT * FROM gft_series), "
            "ts_column => 'ts')"
        )


def test_gap_fill_table_input_honors_row_policies(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [
            ("alice@x", "2024-01-01 00:00:00", 1.0),
            ("alice@x", "2024-01-01 00:02:00", 3.0),
            ("bob@x", "2024-01-01 00:00:00", 100.0),
        ],
        "owner string, ts string, v double",
    ).selectExpr("owner", "cast(ts as timestamp) ts", "v")
    cat.create_table("gf_acc", str(tmp_path / "gf_acc"), df)
    cat.session_user = "alice@x"
    cat.sql(
        'CREATE ROW ACCESS POLICY p ON gf_acc GRANT TO ("user:alice@x") '
        "FILTER USING (owner = SESSION_USER())"
    )
    rows = cat.sql("""
        SELECT * FROM GAP_FILL(TABLE gf_acc,
            ts_column => 'ts', bucket_width => INTERVAL 1 MINUTE,
            partitioning_columns => ['owner'],
            value_columns => [('v', 'linear')])
        ORDER BY owner, ts
    """).collect()
    # bob's partition is filtered out BEFORE gap filling
    assert {r.owner for r in rows} == {"alice@x"}
    assert [r.v for r in rows] == [1.0, 2.0, 3.0]


def test_gap_fill_grid_size_guard(spark):
    from bigquery_etl_spark.operators.gapfill import gap_fill

    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 1.0), ("a", "2024-01-01 00:00:00", 2.0)],
        "k string, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v")
    with pytest.raises(Exception, match="exceeds"):
        gap_fill(df, "ts", 1_000_000, ["k"], [("v", "null")]).collect()
