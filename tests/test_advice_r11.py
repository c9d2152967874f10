"""Round-11 regressions for the r10 ADVICE findings (ADVICE.md):

1. (medium) Row access policies must not be bypassable: time travel
   (`VERSION AS OF` / `FOR SYSTEM_TIME AS OF`) and APPENDS/CHANGES
   refuse on policied tables (BigQuery's restriction), and
   ML.<fn>(MODEL m, TABLE t) reads t THROUGH the policy filter.
2. (low) CREATE ROW ACCESS POLICY IF NOT EXISTS is a no-op when the
   policy already exists (the old one survives), not an error.
3. (low) TRANSFORM scaler statistics are fitted on the TRAINING split
   only — the held-out eval fraction never leaks into the fit-time
   mean/std, and ML.EVALUATE(MODEL m) still replays the same rows.
4. (low) ML.EXPLAIN_PREDICT / ML.DETECT_ANOMALIES drop the
   transform's intermediate columns, like ML.PREDICT does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_etl_spark.sources.lake_sql import LakeCatalog


def _policied_cat(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "alice@x", 10.0), (2, "bob@x", 20.0), (3, "alice@x", 30.0)],
        "id long, owner string, x double",
    )
    cat.create_table("acc", str(tmp_path / "acc"), df)
    cat.tables["acc"].enable_change_feed(["id"])
    cat.sql("INSERT INTO acc VALUES (4, 'bob@x', 40.0)")
    cat.session_user = "alice@x"
    cat.sql(
        'CREATE ROW ACCESS POLICY own ON acc GRANT TO ("user:alice@x") '
        "FILTER USING (owner = SESSION_USER())"
    )
    return cat


def test_time_travel_refuses_on_policied_table(spark, tmp_path):
    cat = _policied_cat(spark, tmp_path)
    with pytest.raises(ValueError, match="row access policies"):
        cat.sql("SELECT * FROM acc VERSION AS OF 1").collect()
    with pytest.raises(ValueError, match="row access policies"):
        cat.sql(
            "SELECT * FROM acc FOR SYSTEM_TIME AS OF "
            "TIMESTAMP '2030-01-01 00:00:00'"
        ).collect()
    # current-snapshot reads still policy-filter, not refuse
    assert [r.id for r in cat.sql(
        "SELECT id FROM acc ORDER BY id").collect()] == [1, 3]


def test_change_tvfs_refuse_on_policied_table(spark, tmp_path):
    cat = _policied_cat(spark, tmp_path)
    for tvf in ("CHANGES(TABLE acc, NULL, NULL)", "APPENDS(TABLE acc)"):
        with pytest.raises(ValueError, match="row access policies"):
            cat.sql(f"SELECT * FROM {tvf}").collect()
    # dropping the policies restores change history
    cat.sql("DROP ALL ROW ACCESS POLICIES ON acc")
    n = cat.sql(
        "SELECT COUNT(*) AS n FROM CHANGES(TABLE acc, NULL, NULL)"
    ).collect()[0].n
    assert n >= 4


def test_ml_table_input_respects_row_policies(spark, tmp_path):
    cat = _policied_cat(spark, tmp_path)
    spark.createDataFrame(
        [(float(i), 2.0 * i + 1.0) for i in range(20)], "x double, y double"
    ).createOrReplaceTempView("rls_train")
    cat.sql(
        "CREATE OR REPLACE MODEL rls_m OPTIONS("
        "model_type='linear_reg', input_label_cols=['y']) "
        "AS SELECT x, y FROM rls_train"
    )
    # alice sees her 2 rows; bob (no granted policy) sees zero — the
    # TABLE input goes through the same allowlist as a direct SELECT
    got = cat.sql(
        "SELECT id FROM ML.PREDICT(MODEL rls_m, TABLE acc) ORDER BY id"
    ).collect()
    assert [r.id for r in got] == [1, 3]
    cat.session_user = "bob@x"
    assert cat.sql(
        "SELECT COUNT(*) AS n FROM ML.PREDICT(MODEL rls_m, TABLE acc)"
    ).collect()[0].n == 0


def test_row_policy_if_not_exists_noop(spark, tmp_path):
    cat = _policied_cat(spark, tmp_path)
    # existing policy + IF NOT EXISTS: no error, old filter survives
    cat.sql(
        "CREATE ROW ACCESS POLICY IF NOT EXISTS own ON acc "
        'GRANT TO ("allAuthenticatedUsers") FILTER USING (TRUE)'
    )
    assert [r.id for r in cat.sql(
        "SELECT id FROM acc ORDER BY id").collect()] == [1, 3]
    # fresh name still creates
    cat.sql(
        "CREATE ROW ACCESS POLICY IF NOT EXISTS extra ON acc "
        'GRANT TO ("user:alice@x") FILTER USING (id <= 2)'
    )
    assert [r.id for r in cat.sql(
        "SELECT id FROM acc ORDER BY id").collect()] == [1, 2, 3]


def test_transform_stats_fit_on_training_split_only(spark, tmp_path):
    """seq split: highest t goes to eval. The standard-scaler mean must
    be the mean of x over the TRAINING rows only."""
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    # t = 0..99; eval = top 25% (t >= 75); x == t so the full-data mean
    # (49.5) and the train-only mean (37.0) are far apart
    spark.range(100).select(
        F.col("id").cast("double").alias("t"),
        F.col("id").cast("double").alias("x"),
    ).withColumn("y", F.lit(3.0) * F.col("x") + F.lit(1.0)) \
        .createOrReplaceTempView("ts_pts")
    cat.bq_sql(
        "CREATE OR REPLACE MODEL ts_m "
        "TRANSFORM(ML.STANDARD_SCALER(x) OVER() AS sx, t, y) "
        "OPTIONS(model_type='linear_reg', input_label_cols=['y'], "
        "data_split_method='seq', data_split_col='t', "
        "data_split_eval_fraction=0.25) "
        "AS SELECT t, x, y FROM ts_pts"
    )
    model = cat.models["ts_m"]
    scaler = [
        it for it in model["transform"] if it["kind"] == "standard_scaler"
    ][0]
    # split condition is on RAW columns and carves the top quarter
    cond = model["data_split"]["condition"]
    assert "t" in cond
    train_mean = spark.table("ts_pts").filter(~F.expr(cond)).agg(
        F.avg("x")
    ).collect()[0][0]
    assert scaler["mean"] == pytest.approx(train_mean)  # ~36.5, NOT 49.5
    assert scaler["mean"] < 45.0  # full-data mean would be 49.5
    # held-out replay still evaluates (affine label => r2 == 1)
    r2 = cat.sql(
        "SELECT r2_score FROM ML.EVALUATE(MODEL ts_m)"
    ).collect()[0].r2_score
    assert r2 == pytest.approx(1.0, abs=1e-9)


def test_explain_and_anomalies_drop_transform_intermediates(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    spark.range(50).select(
        (F.col("id") % 13).cast("double").alias("x1"),
        (F.col("id") % 7).cast("double").alias("x2"),
    ).withColumn(
        "y", F.lit(2.0) * F.col("x1") - F.col("x2")
    ).createOrReplaceTempView("tr_pts")
    cat.bq_sql(
        "CREATE OR REPLACE MODEL tr_lin "
        "TRANSFORM(ML.STANDARD_SCALER(x1) OVER() AS sx1, x2, y) "
        "OPTIONS(model_type='linear_reg', input_label_cols=['y']) "
        "AS SELECT x1, x2, y FROM tr_pts"
    )
    ep = cat.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL tr_lin, "
        "(SELECT x1, x2 FROM tr_pts))"
    )
    assert "sx1" not in ep.columns and "x1" in ep.columns
    cat.bq_sql(
        "CREATE OR REPLACE MODEL tr_km "
        "TRANSFORM(ML.MIN_MAX_SCALER(x1) OVER() AS mx1, x2) "
        "OPTIONS(model_type='kmeans', num_clusters=2) "
        "AS SELECT x1, x2 FROM tr_pts"
    )
    da = cat.sql(
        "SELECT * FROM ML.DETECT_ANOMALIES(MODEL tr_km, "
        "(SELECT x1, x2 FROM tr_pts))"
    )
    assert "mx1" not in da.columns and "is_anomaly" in da.columns


def test_matviews_refuse_policied_tables(spark, tmp_path):
    """r11 extension of the RLS-bypass class: materialized views (batch
    and streaming) materialize ALL rows, so creation refuses on a
    policied table and a policy added AFTER creation blocks reads."""
    from pyspark.sql import functions as F

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, grp string, v double"
    )
    cat.create_table("mvp", str(tmp_path / "mvp"), df)
    cat.tables["mvp"].enable_change_feed(["id"])
    # MV created while unpolicied reads fine
    cat.sql(
        "CREATE MATERIALIZED VIEW mvp_mv AS "
        "SELECT grp, SUM(v) AS total FROM mvp GROUP BY grp"
    )
    cat.sql(
        "CREATE STREAMING MATERIALIZED VIEW mvp_smv AS "
        "SELECT grp, SUM(v) AS total "
        "FROM CHANGES(TABLE mvp, NULL, NULL) GROUP BY grp"
    )
    assert cat.sql("SELECT COUNT(*) AS n FROM mvp_mv").collect()[0].n == 2
    assert cat.sql("SELECT COUNT(*) AS n FROM mvp_smv").collect()[0].n == 2
    # a policy added AFTER creation blocks BOTH views' reads
    cat.sql(
        'CREATE ROW ACCESS POLICY p ON mvp GRANT TO ("user:nobody@x") '
        "FILTER USING (FALSE)"
    )
    with pytest.raises(ValueError, match="row access policies"):
        cat.sql("SELECT * FROM mvp_mv").collect()
    with pytest.raises(ValueError, match="row access policies"):
        cat.sql("SELECT * FROM mvp_smv").collect()
    # and creating a NEW view over the policied table refuses
    with pytest.raises(ValueError, match="row access policies"):
        cat.sql(
            "CREATE MATERIALIZED VIEW mvp_mv2 AS "
            "SELECT grp, SUM(v) AS t FROM mvp GROUP BY grp"
        )
    cat.sql("DROP STREAMING MATERIALIZED VIEW mvp_smv")
