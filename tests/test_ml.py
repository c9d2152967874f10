"""BigQuery ML surface (r6): CREATE MODEL (linear_reg by exact normal
equations in one aggregate pass; kmeans by Lloyd's as DataFrame aggs),
ML.PREDICT / ML.EVALUATE / ML.WEIGHTS / ML.CENTROIDS — operators/ml.py
+ the lake-SQL front-end."""

from __future__ import annotations

import pytest

from bigquery_etl_spark.operators import ml
from bigquery_etl_spark.sources.lake_sql import LakeCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    # y = 2*x1 - 3*x2 + 5 exactly — coefficients are recoverable to
    # machine precision, so assertions are tight, not fuzzy
    rows = [
        (float(i % 17), float((i * 7) % 13), 0.0) for i in range(200)
    ]
    rows = [(x1, x2, 2 * x1 - 3 * x2 + 5) for x1, x2, _ in rows]
    c.create_table(
        "train",
        str(tmp_path / "train"),
        spark.createDataFrame(rows, "x1 double, x2 double, y double"),
    )
    return c


def test_fit_linear_exact(cat):
    df = cat.tables["train"].read()
    model = ml.fit_linear_reg(df, ["x1", "x2"], "y")
    assert model["intercept"] == pytest.approx(5.0, abs=1e-8)
    assert model["coefficients"][0] == pytest.approx(2.0, abs=1e-8)
    assert model["coefficients"][1] == pytest.approx(-3.0, abs=1e-8)
    assert model["r2"] == pytest.approx(1.0, abs=1e-9)


def test_fit_linear_single_pass(cat):
    """The training job is ONE aggregate over the input — no joins, no
    shuffles beyond the scalar-aggregate exchange."""
    df = cat.tables["train"].read()
    import io
    from contextlib import redirect_stdout

    # plan of the sufficient-statistics aggregate
    from pyspark.sql import functions as F

    agg = df.agg(F.sum((F.col("x1") * F.col("y"))).alias("m"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        agg.explain("formatted")
    assert "Join" not in buf.getvalue()


def test_create_model_predict_evaluate_sql(cat):
    cat.sql(
        "CREATE MODEL lin OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM train"
    )
    got = cat.sql(
        "SELECT processed_input, ROUND(weight, 6) AS w "
        "FROM ML.WEIGHTS(MODEL lin) ORDER BY processed_input"
    ).collect()
    assert [(r.processed_input, r.w) for r in got] == [
        ("__INTERCEPT__", 5.0),
        ("x1", 2.0),
        ("x2", -3.0),
    ]
    pred = cat.sql(
        "SELECT MAX(ABS(predicted_y - y)) AS worst "
        "FROM ML.PREDICT(MODEL lin, TABLE train)"
    ).collect()[0]
    assert pred.worst < 1e-8
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL lin, TABLE train)"
    ).collect()[0]
    assert ev.r2_score == pytest.approx(1.0, abs=1e-9)
    assert ev.mean_absolute_error == pytest.approx(0.0, abs=1e-8)


def test_predict_on_subquery_and_replace(cat):
    cat.sql(
        "CREATE MODEL lin OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM train"
    )
    with pytest.raises(ValueError, match="already exists"):
        cat.sql(
            "CREATE MODEL lin OPTIONS(model_type='linear_reg', "
            "input_label_cols=['y']) AS SELECT * FROM train"
        )
    got = cat.sql(
        "SELECT ROUND(predicted_y, 6) AS p FROM ML.PREDICT(MODEL lin, "
        "(SELECT 1.0 AS x1, 1.0 AS x2, 0.0 AS y))"
    ).collect()[0]
    assert got.p == 4.0  # 2 - 3 + 5
    cat.sql(
        "CREATE OR REPLACE MODEL lin OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y'], l2_reg=0.0) AS SELECT * FROM train"
    )


def test_kmeans_separates_obvious_clusters(cat, spark):
    pts = [(0.0 + dx, 0.0 + dy) for dx in (0, 0.1) for dy in (0, 0.1)]
    pts += [(10.0 + dx, 10.0 + dy) for dx in (0, 0.1) for dy in (0, 0.1)]
    spark.createDataFrame(pts, "a double, b double").createOrReplaceTempView(
        "pts"
    )
    cat.sql(
        "CREATE MODEL km OPTIONS(model_type='kmeans', num_clusters=2) "
        "AS SELECT * FROM pts"
    )
    rows = cat.sql(
        "SELECT a < 5 AS low, centroid_id "
        "FROM ML.PREDICT(MODEL km, TABLE pts)"
    ).collect()
    by_side = {}
    for r in rows:
        by_side.setdefault(r.low, set()).add(r.centroid_id)
    # each side maps to exactly one (distinct) centroid
    assert all(len(v) == 1 for v in by_side.values())
    assert by_side[True] != by_side[False]
    cents = cat.sql(
        "SELECT COUNT(DISTINCT centroid_id) AS k FROM ML.CENTROIDS(MODEL km)"
    ).collect()[0]
    assert cents.k == 2


def test_model_persisted_to_warehouse(cat, tmp_path):
    cat.sql(
        "CREATE MODEL lin OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM train"
    )
    loaded = ml.load_model(str(tmp_path / "wh" / "_models"), "lin")
    assert loaded["label"] == "y"
    with pytest.raises(ValueError, match="unknown model"):
        ml.load_model(str(tmp_path / "wh" / "_models"), "nope")


def test_unknown_model_and_type_refuse(cat):
    with pytest.raises(ValueError, match="unknown model"):
        cat.sql("SELECT * FROM ML.PREDICT(MODEL ghost, TABLE train)")
    # r10: dnn_* gets its own NAMED refusal (no NN runtime)
    with pytest.raises(ValueError, match="out of scope"):
        cat.sql(
            "CREATE MODEL bad OPTIONS(model_type='dnn_classifier', "
            "input_label_cols=['y']) AS SELECT * FROM train"
        )
    with pytest.raises(ValueError, match="not implemented"):
        cat.sql(
            "CREATE MODEL bad2 OPTIONS(model_type='automl_regressor', "
            "input_label_cols=['y']) AS SELECT * FROM train"
        )


def test_fit_logistic_separates(spark, cat):
    """IRLS on a linearly separable set (integer margin >= 1) must
    classify the training data perfectly and orient the boundary."""
    rows = [
        (float(i % 11), float((i * 3) % 9)) for i in range(300)
    ]
    pts = [
        (x1, x2, 1 if x1 - x2 + 0.5 > 0 else 0)
        for x1, x2 in rows
    ]
    df = spark.createDataFrame(pts, "x1 double, x2 double, y int")
    model = ml.fit_logistic_reg(df, ["x1", "x2"], "y")
    assert model["model_type"] == "logistic_reg"
    # boundary direction: +x1, -x2
    assert model["coefficients"][0] > 0 > model["coefficients"][1]
    scored = ml.predict_logistic_reg(df, model)
    bad = scored.filter(
        scored.predicted_label != scored.y
    ).count()
    assert bad == 0
    # probabilities are calibrated-monotone in the margin
    ev = ml.evaluate_logistic_reg(df, model).collect()[0]
    assert ev.accuracy == 1.0 and ev.precision == 1.0 and ev.recall == 1.0
    assert ev.log_loss < 0.1


def test_logistic_sql_surface(spark, cat, tmp_path):
    rows = [(float(i % 7), 1 if (i % 7) >= 3 else 0) for i in range(140)]
    cat.create_table(
        "lr_train",
        str(tmp_path / "lr_train"),
        spark.createDataFrame(rows, "x double, y int"),
    )
    cat.sql(
        "CREATE MODEL lr OPTIONS(model_type='logistic_reg', "
        "input_label_cols=['y']) AS SELECT * FROM lr_train"
    )
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL lr, TABLE lr_train)"
    ).collect()[0]
    assert ev.accuracy == 1.0
    pred = cat.sql(
        "SELECT predicted_y, predicted_y_prob FROM "
        "ML.PREDICT(MODEL lr, (SELECT 6.0 AS x, 1 AS y))"
    ).collect()[0]
    assert pred.predicted_y == 1 and pred.predicted_y_prob > 0.9
    w = {
        r.processed_input: r.weight
        for r in cat.sql("SELECT * FROM ML.WEIGHTS(MODEL lr)").collect()
    }
    assert w["x"] > 0  # larger x -> class 1
    # persisted like any model
    import os
    assert os.path.exists(str(tmp_path / "wh" / "_models" / "lr.json"))


def test_pca_recovers_planted_rank(spark, cat, tmp_path):
    """r7 (VERDICT r6 item 6): PCA by one covariance-aggregate pass +
    driver eigensolve. 4 features built from a 2-dim latent factor ->
    2 components explain 100% of variance and reconstruct every row."""
    rows = [
        (float(i % 17), float((i * 7) % 13)) for i in range(300)
    ]
    data = [(z1, z2, 2 * z1 - z2, z1 + 3 * z2) for z1, z2 in rows]
    spark.createDataFrame(
        data, "x1 double, x2 double, x3 double, x4 double"
    ).createOrReplaceTempView("pca_src")
    cat.sql(
        "CREATE MODEL pm OPTIONS(model_type='pca', "
        "num_principal_components=2) AS SELECT * FROM pca_src"
    )
    info = {
        r.principal_component_id: r
        for r in cat.sql(
            "SELECT * FROM ML.PRINCIPAL_COMPONENT_INFO(MODEL pm)"
        ).collect()
    }
    assert round(info[2].cumulative_explained_variance_ratio, 9) == 1.0
    assert info[1].eigenvalue >= info[2].eigenvalue > 0
    comps = cat.sql(
        "SELECT * FROM ML.PRINCIPAL_COMPONENTS(MODEL pm)"
    ).collect()
    assert {(r.principal_component_id, r.feature) for r in comps} == {
        (i, f) for i in (1, 2) for f in ("x1", "x2", "x3", "x4")
    }
    # deterministic sign: largest-|loading| entry positive
    model = cat.models["pm"]
    for comp in model["components"]:
        assert max(comp, key=abs) > 0
    # projection through ML.PREDICT reconstructs rows
    scored = cat.sql(
        "SELECT * FROM ML.PREDICT(MODEL pm, TABLE pca_src)"
    ).collect()
    import numpy as np

    C = np.array(model["components"])
    mu = np.array(model["mean"])
    for r in scored[:50]:
        rec = mu + np.array(
            [r.principal_component_1, r.principal_component_2]
        ) @ C
        assert np.abs(rec - np.array([r.x1, r.x2, r.x3, r.x4])).max() < 1e-9
    # persisted as JSON like the other closed-form models
    assert ml.load_model(
        str(tmp_path / "wh" / "_models"), "pm"
    )["n_components"] == 2


def test_pca_refuses_bad_component_count(spark, cat):
    spark.createDataFrame(
        [(1.0, 2.0)], "a double, b double"
    ).createOrReplaceTempView("pca_bad")
    with pytest.raises(ValueError, match="num_principal_components"):
        cat.sql(
            "CREATE MODEL pbad OPTIONS(model_type='pca', "
            "num_principal_components=5) AS SELECT * FROM pca_bad"
        )


def test_matrix_factorization_fits_planted_rank2(spark, cat, tmp_path):
    """r7 (VERDICT r6 item 6): ALS matrix factorization — each
    half-step a grouped f x f solve, factors stay DataFrames. Planted
    exactly-rank-2 ratings fit to near-zero RMSE; ML.PREDICT scores
    (user, item) pairs; ML.RECOMMEND emits the full grid."""
    rows = [
        (u, i, float((1 + u % 5) * (1 + i % 4) + (u % 3) * (i % 2)))
        for u in range(24)
        for i in range(18)
    ]
    spark.createDataFrame(
        rows, "u long, i long, r double"
    ).createOrReplaceTempView("mf_src")
    cat.sql(
        "CREATE MODEL mfm OPTIONS(model_type='matrix_factorization', "
        "user_col='u', item_col='i', rating_col='r', num_factors=2, "
        "max_iterations=6, l2_reg=0.001) AS SELECT * FROM mf_src"
    )
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL mfm, TABLE mf_src)"
    ).collect()[0]
    assert ev.root_mean_squared_error < 0.05
    scored = cat.sql(
        "SELECT * FROM ML.PREDICT(MODEL mfm, (SELECT * FROM mf_src))"
    ).collect()
    assert len(scored) == len(rows)
    assert all(abs(s.predicted_r - s.r) < 0.5 for s in scored)
    rec = cat.sql("SELECT * FROM ML.RECOMMEND(MODEL mfm)")
    assert rec.count() == 24 * 18
    # factor matrices persisted as parquet, metadata as JSON
    import os

    mdir = str(tmp_path / "wh" / "_models" / "mfm")
    assert os.path.isdir(os.path.join(mdir, "user_factors.parquet"))
    meta = ml.load_model(str(tmp_path / "wh" / "_models"), "mfm")
    assert meta["num_factors"] == 2 and "user_factors" not in meta


def test_matrix_factorization_cold_start_nulls(spark, cat):
    rows = [(u, i, 1.0 * (u + i)) for u in range(6) for i in range(6)]
    spark.createDataFrame(
        rows, "u long, i long, r double"
    ).createOrReplaceTempView("mf_cold_src")
    cat.sql(
        "CREATE MODEL mfc OPTIONS(model_type='matrix_factorization', "
        "user_col='u', item_col='i', rating_col='r', num_factors=2, "
        "max_iterations=3) AS SELECT * FROM mf_cold_src"
    )
    spark.createDataFrame(
        [(0, 0), (999, 0)], "u long, i long"
    ).createOrReplaceTempView("mf_cold_q")
    got = {
        r.u: r.predicted_r
        for r in cat.sql(
            "SELECT * FROM ML.PREDICT(MODEL mfc, TABLE mf_cold_q)"
        ).collect()
    }
    assert got[0] is not None and got[999] is None  # cold user -> NULL
    cat.sql(
        "CREATE MODEL lin_for_rec OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM train"
    )
    with pytest.raises(ValueError, match="matrix_factorization only"):
        cat.sql("SELECT * FROM ML.RECOMMEND(MODEL lin_for_rec)")


# -- ARIMA_PLUS (r8) ----------------------------------------------------------


def _series_df(spark, n, fn, sid=None):
    from pyspark.sql import functions as F

    base = 1704067200
    rows = [(sid if sid is not None else "s", i, float(fn(i)))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "sid string, t long, y double"
    ).select(
        "sid",
        F.timestamp_seconds(F.lit(base) + F.col("t") * 86400).alias("ts"),
        "y",
    )


def test_arima_nonseasonal_trend(spark):
    """A pure linear trend must fit with period=1 (no spurious
    seasonality) and forecast the extension exactly."""
    from bigquery_etl_spark.operators.ml import (
        fit_arima_plus,
        forecast_arima_plus,
    )

    df = _series_df(spark, 60, lambda t: 3.0 + 2.5 * t)
    m = fit_arima_plus(df, "ts", "y", id_col=None)
    prm = m["params"].collect()[0]
    assert prm.period == 1 and prm.n == 60
    fc = forecast_arima_plus(spark, m, horizon=5).collect()
    assert len(fc) == 5
    for i, r in enumerate(fc, start=60):
        assert abs(r.forecast_value - (3.0 + 2.5 * i)) < 1e-6
    # daily grid continues
    assert (fc[1].forecast_timestamp - fc[0].forecast_timestamp
            ).total_seconds() == 86400


def test_arima_detects_weekly_period(spark):
    from bigquery_etl_spark.operators.ml import fit_arima_plus

    pat = [1.0, -2.0, 0.0, 2.0, 0.0, -2.0, 1.0]
    df = _series_df(spark, 140, lambda t: 10.0 + 0.5 * t + pat[t % 7])
    m = fit_arima_plus(df, "ts", "y")
    prm = m["params"].collect()[0]
    assert prm.period == 7  # not a multiple like 14
    assert prm.se < 1e-6    # exact decomposition -> zero residual


def test_arima_ar_component_improves_fit(spark):
    """An AR(1)-flavored residual (deterministic cos ramp) must yield
    nonzero phi and finite widening intervals."""
    import math

    from bigquery_etl_spark.operators.ml import (
        fit_arima_plus,
        forecast_arima_plus,
    )

    df = _series_df(
        spark, 200, lambda t: 5.0 + 0.1 * t + 4.0 * math.cos(t / 3.0)
    )
    m = fit_arima_plus(df, "ts", "y")
    prm = m["params"].collect()[0]
    assert prm.phi and len(prm.phi) >= 1
    fc = forecast_arima_plus(spark, m, horizon=10,
                             confidence_level=0.9).collect()
    ses = [r.standard_error for r in fc]
    assert all(s >= 0 for s in ses)
    assert ses[-1] >= ses[0]  # psi-weight variance never shrinks
    for r in fc:
        assert (r.prediction_interval_lower_bound <= r.forecast_value
                <= r.prediction_interval_upper_bound)


def test_arima_sql_surface_requires_options(spark, tmp_path):
    import pytest as _p

    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    _series_df(spark, 30, lambda t: float(t)).createOrReplaceTempView(
        "ar_src"
    )
    with _p.raises(ValueError, match="time_series"):
        cat.sql(
            "CREATE MODEL ar_bad OPTIONS(model_type='ARIMA_PLUS') "
            "AS SELECT * FROM ar_src"
        )
    cat.sql(
        "CREATE MODEL ar_ok OPTIONS(model_type='ARIMA_PLUS', "
        "time_series_timestamp_col='ts', time_series_data_col='y', "
        "horizon=3) AS SELECT ts, y FROM ar_src"
    )
    # default horizon comes from the model options
    rows = cat.sql(
        "SELECT * FROM ML.FORECAST(MODEL ar_ok)"
    ).collect()
    assert len(rows) == 3
    # params persisted as parquet next to the model JSON
    import os

    assert os.path.isdir(
        str(tmp_path / "wh" / "_models" / "ar_ok" / "params.parquet")
    )


def test_arima_evaluate_diagnostics(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    pat = [1.0, -2.0, 0.0, 2.0, 0.0, -2.0, 1.0]
    rows = []
    for sid in ("a", "b"):
        for t in range(140):
            y = (2.0 if sid == "a" else 5.0) + 0.5 * t + pat[t % 7]
            rows.append((sid, t, y))
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "sid string, t long, y double").select(
        "sid",
        F.timestamp_seconds(F.lit(1704067200) + F.col("t") * 86400).alias("ts"),
        "y",
    )
    df.createOrReplaceTempView("ae_src")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL ae_m OPTIONS(model_type='ARIMA_PLUS', "
        "time_series_timestamp_col='ts', time_series_data_col='y', "
        "time_series_id_col='sid') AS SELECT * FROM ae_src"
    )
    ev = {r.sid: r for r in cat.sql(
        "SELECT * FROM ML.ARIMA_EVALUATE(MODEL ae_m)").collect()}
    assert set(ev) == {"a", "b"}
    for r in ev.values():
        assert r.non_seasonal_d == 0 and r.non_seasonal_q == 0
        assert r.has_drift  # planted slope 0.5
        assert r.seasonal_periods == ["WEEKLY"]  # daily grid, period 7
        assert r.variance < 1e-10  # exact decomposition
        assert r.AIC == 2.0 * (r.non_seasonal_p + 2 + 6) - 2.0 * r.log_likelihood
        assert not (r.has_holiday_effect or r.has_spikes_and_dips
                    or r.has_step_changes)


def test_arima_explain_forecast_decomposition(spark, tmp_path):
    """ML.EXPLAIN_FORECAST: the decomposition columns must SUM to the
    forecast value exactly (trend + seasonal + AR residual)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    pat = [1.0, -2.0, 0.0, 2.0, 0.0, -2.0, 1.0]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(t, 3.0 + 0.5 * t + 2.0 * pat[t % 7]) for t in range(140)],
        "t long, y double",
    ).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("t") * 86400)
        .alias("ts"),
        "y",
    )
    df.createOrReplaceTempView("ef_src")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL ef_m OPTIONS(model_type='ARIMA_PLUS', "
        "time_series_timestamp_col='ts', time_series_data_col='y') "
        "AS SELECT * FROM ef_src"
    )
    rows = cat.sql(
        "SELECT * FROM ML.EXPLAIN_FORECAST(MODEL ef_m, "
        "STRUCT(7 AS horizon, 0.9 AS confidence_level))"
    ).collect()
    assert len(rows) == 7
    for r in rows:
        parts = r.trend + r.seasonal_period_component + r.ar_component
        assert abs(parts - r.forecast_value) < 1e-9
        assert r.confidence_level == 0.9
    # the weekly component repeats the planted pattern shape
    seas = [r.seasonal_period_component for r in rows]
    assert max(seas) > 1.0 and min(seas) < -1.0


def test_arima_coefficients(spark, tmp_path):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    df = _series_df(spark, 80, lambda t: 1.0 + 2.0 * t)
    df.createOrReplaceTempView("ac_src")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL ac_m OPTIONS(model_type='ARIMA_PLUS', "
        "time_series_timestamp_col='ts', time_series_data_col='y') "
        "AS SELECT ts, y FROM ac_src"
    )
    r = cat.sql(
        "SELECT * FROM ML.ARIMA_COEFFICIENTS(MODEL ac_m)"
    ).collect()
    assert len(r) == 1
    assert r[0].ma_coefficients == []
    assert abs(r[0].intercept_or_drift - 2.0) < 1e-9  # planted slope


# -- boosted trees (r9) -------------------------------------------------------


def _bt_frame(spark, n=3000):
    import pyspark.sql.functions as F

    return spark.range(n).select(
        (F.col("id") % 19).cast("double").alias("x1"),
        (F.col("id") % 23).cast("double").alias("x2"),
        (F.col("id") % 11).cast("double").alias("x3"),
    ).select(
        "x1",
        "x2",
        "x3",
        (
            F.when(F.col("x1") > 9, 10.0).otherwise(0.0)
            + F.when(F.col("x2") > 11, 5.0).otherwise(0.0)
            - F.when(F.col("x3") > 5, 3.0).otherwise(0.0)
        ).alias("y"),
        ((F.col("x1") > 8) & (F.col("x2") <= 15)).cast("int").alias("lbl"),
    )


def test_boosted_regressor_fits_step_function(spark):
    df = _bt_frame(spark)
    model = ml.fit_boosted_trees(
        df, ["x1", "x2", "x3"], "y",
        objective="regression", num_trees=12, max_depth=3,
        learning_rate=0.5,
    )
    ev = ml.evaluate_boosted_trees(df, model).collect()[0]
    assert ev.r2_score > 0.995
    assert ev.mean_absolute_error < 0.5
    # the widest step (x1, amplitude 10) must carry the top gain
    fi = ml.feature_importance_boosted(spark, model).collect()
    top = max(fi, key=lambda r: r.importance_gain)
    assert top.feature == "x1"
    assert all(r.importance_weight >= 0 for r in fi)


def test_boosted_classifier_separates_box(spark):
    df = _bt_frame(spark)
    model = ml.fit_boosted_trees(
        df, ["x1", "x2"], "lbl",
        objective="classification", num_trees=12, max_depth=3,
        learning_rate=0.5,
    )
    ev = ml.evaluate_boosted_trees(df, model).collect()[0]
    assert ev.accuracy == 1.0
    assert ev.log_loss < 0.1


def test_boosted_router_paths_agree(spark):
    """The pure-codegen margin and the Arrow-batched numpy scorer must
    produce IDENTICAL doubles — same trees, same traversal order."""
    from bigquery_etl_spark.operators import ml as _m

    df = _bt_frame(spark, n=500)
    model = ml.fit_boosted_trees(
        df, ["x1", "x2", "x3"], "y",
        objective="regression", num_trees=6, max_depth=3,
    )
    lo = _m._BT_CODEGEN_MAX_NODES
    try:
        _m._BT_CODEGEN_MAX_NODES = 10**9  # force codegen path
        a = ml.predict_boosted_trees(df, model, out="p").select("p").collect()
        _m._BT_CODEGEN_MAX_NODES = -1  # force pandas path
        b = ml.predict_boosted_trees(df, model, out="p").select("p").collect()
    finally:
        _m._BT_CODEGEN_MAX_NODES = lo
    assert [r.p for r in a] == [r.p for r in b]


def test_boosted_null_features_go_left(spark):
    import pyspark.sql.functions as F

    df = _bt_frame(spark, n=800)
    model = ml.fit_boosted_trees(
        df, ["x1", "x2"], "y", objective="regression",
        num_trees=4, max_depth=3,
    )
    with_null = spark.createDataFrame(
        [(None, 5.0), (0.0, 5.0)], "x1 double, x2 double"
    )
    rows = ml.predict_boosted_trees(with_null, model, out="p").collect()
    # NULL follows the bin-0 (left-most) convention: same leaf as the
    # smallest value
    assert rows[0].p == rows[1].p


def test_boosted_sql_surface_and_persistence(spark, tmp_path):
    df = _bt_frame(spark, n=1000)
    df.createOrReplaceTempView("bt_train")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL btq OPTIONS(model_type='boosted_tree_regressor', "
        "input_label_cols=['y'], max_iterations=6, max_tree_depth=3, "
        "learn_rate=0.5) AS SELECT x1, x2, x3, y FROM bt_train"
    )
    pred = c.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL btq, "
        "(SELECT 15.0 AS x1, 20.0 AS x2, 0.0 AS x3))"
    ).collect()[0]
    assert abs(pred.predicted_y - 15.0) < 2.0  # 10 + 5 - 0
    fi = c.sql(
        "SELECT * FROM ML.FEATURE_IMPORTANCE(MODEL btq)"
    ).collect()
    assert {r.feature for r in fi} == {"x1", "x2", "x3"}
    # JSON round-trip: a reloaded model predicts identically
    saved = ml.load_model(str(tmp_path / "wh" / "_models"), "btq")
    one = spark.createDataFrame(
        [(15.0, 20.0, 0.0)], "x1 double, x2 double, x3 double"
    )
    p1 = ml.predict_boosted_trees(one, c.models["btq"], out="p").collect()
    p2 = ml.predict_boosted_trees(one, saved, out="p").collect()
    assert p1[0].p == p2[0].p
    c.sql(
        "CREATE MODEL btq_lin OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT x1, y FROM bt_train"
    )
    with pytest.raises(ValueError, match="boosted_tree"):
        c.sql("SELECT * FROM ML.FEATURE_IMPORTANCE(MODEL btq_lin)")


def test_boosted_classifier_sql_evaluate(spark, tmp_path):
    df = _bt_frame(spark, n=1000)
    df.createOrReplaceTempView("btc_train")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL btcq OPTIONS(model_type='boosted_tree_classifier', "
        "input_label_cols=['lbl'], max_iterations=10, max_tree_depth=3, "
        "learn_rate=0.5) AS SELECT x1, x2, lbl FROM btc_train"
    )
    ev = c.sql(
        "SELECT * FROM ML.EVALUATE(MODEL btcq, "
        "(SELECT x1, x2, lbl FROM btc_train))"
    ).collect()[0]
    assert ev.accuracy == 1.0
    assert set(ev.asDict()) == {
        "accuracy", "precision", "recall", "f1_score", "log_loss"
    }


def test_boosted_empty_and_constant_inputs(spark):
    import pyspark.sql.functions as F

    empty = spark.createDataFrame([], "x1 double, y double")
    with pytest.raises(ValueError, match="empty"):
        ml.fit_boosted_trees(empty, ["x1"], "y")
    # constant feature -> no usable split -> ensemble converges to the
    # base score with zero trees rather than erroring
    const = spark.range(50).select(
        F.lit(1.0).alias("x1"), F.lit(7.0).alias("y")
    )
    m = ml.fit_boosted_trees(const, ["x1"], "y", num_trees=3)
    assert m["trees"] == []
    p = ml.predict_boosted_trees(
        spark.createDataFrame([(9.0,)], "x1 double"), m, out="p"
    ).collect()[0]
    assert p.p == 7.0


def _tr_frame(spark, n=300):
    rows = [
        (float(i % 13), float((i * 7) % 5),
         3.0 * (i % 13) - 2.0 * ((i * 7) % 5) + 1.0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "x1 double, x2 double, y double")


def test_transform_clause_fit_predict_parity(spark, tmp_path):
    """r10 BQML TRANSFORM: a model trained with TRANSFORM must score
    RAW input exactly like the same model trained on pre-transformed
    input (BigQuery's contract — the transform + fit-time scaler stats
    travel with the model)."""
    df = _tr_frame(spark)
    df.createOrReplaceTempView("tr_train")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.bq_sql(
        "CREATE MODEL m_tr TRANSFORM("
        "ML.STANDARD_SCALER(x1) OVER() AS sx1, "
        "ML.MIN_MAX_SCALER(x2) OVER() AS mx2, "
        "x1 * x2 AS xx, y) "
        "OPTIONS(model_type='linear_reg', input_label_cols=['y']) "
        "AS SELECT x1, x2, y FROM tr_train"
    )
    # pre-transform by hand with the same statistics
    import statistics as st

    rows = df.collect()
    xs1 = [r.x1 for r in rows]
    xs2 = [r.x2 for r in rows]
    mu, sd = st.mean(xs1), st.stdev(xs1)
    mn, mx = min(xs2), max(xs2)
    pre = spark.createDataFrame(
        [((r.x1 - mu) / sd, (r.x2 - mn) / (mx - mn), r.x1 * r.x2, r.y)
         for r in rows],
        "sx1 double, mx2 double, xx double, y double",
    )
    pre.createOrReplaceTempView("tr_pre")
    c.sql(
        "CREATE MODEL m_pre OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM tr_pre"
    )
    a = c.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL m_tr, "
        "(SELECT x1, x2 FROM tr_train)) ORDER BY predicted_y"
    ).collect()
    b = c.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL m_pre, "
        "(SELECT sx1, mx2, xx FROM tr_pre)) ORDER BY predicted_y"
    ).collect()
    assert max(
        abs(p.predicted_y - q.predicted_y) for p, q in zip(a, b)
    ) < 1e-9
    # predict output keeps the CALLER's columns, not the transform's
    out = c.sql(
        "SELECT * FROM ML.PREDICT(MODEL m_tr, (SELECT x1, x2 FROM tr_train))"
    )
    assert out.columns == ["x1", "x2", "predicted_y"]
    # evaluate on labeled raw input goes through the same transform
    ev = c.sql(
        "SELECT * FROM ML.EVALUATE(MODEL m_tr, TABLE tr_train)"
    ).collect()[0]
    assert abs(ev.r2_score - 1.0) < 1e-9


def test_transform_clause_persistence_and_refusals(spark, tmp_path):
    """The transform is persisted in the model JSON (ML.PREDICT after
    reload re-applies it); unsupported TRANSFORM forms refuse loudly."""
    df = _tr_frame(spark, n=120)
    df.createOrReplaceTempView("tr_train2")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.bq_sql(
        "CREATE MODEL m_p TRANSFORM("
        "ML.STANDARD_SCALER(x1) OVER() AS sx1, x2, y) "
        "OPTIONS(model_type='linear_reg', input_label_cols=['y']) "
        "AS SELECT x1, x2, y FROM tr_train2"
    )
    saved = ml.load_model(str(tmp_path / "wh" / "_models"), "m_p")
    assert saved["transform"] == c.models["m_p"]["transform"]
    assert saved["transform"][0]["kind"] == "standard_scaler"
    assert "mean" in saved["transform"][0]
    # a fresh catalog scoring through the RELOADED model must apply
    # the persisted transform identically
    c2 = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c2.models["m_p"] = saved
    a = c.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL m_p, "
        "(SELECT x1, x2 FROM tr_train2)) ORDER BY predicted_y"
    ).collect()
    b = c2.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL m_p, "
        "(SELECT x1, x2 FROM tr_train2)) ORDER BY predicted_y"
    ).collect()
    assert [r.predicted_y for r in a] == [r.predicted_y for r in b]
    with pytest.raises(ValueError, match="EXCEPT|\\*"):
        c.bq_sql(
            "CREATE MODEL m_star TRANSFORM(*, y) OPTIONS("
            "model_type='linear_reg', input_label_cols=['y']) "
            "AS SELECT x1, y FROM tr_train2"
        )
    with pytest.raises(ValueError, match="unsupported ML preprocessing"):
        c.bq_sql(
            "CREATE MODEL m_b TRANSFORM(ML.BUCKETIZE(x1, [1,2]) AS bx, y) "
            "OPTIONS(model_type='linear_reg', input_label_cols=['y']) "
            "AS SELECT x1, y FROM tr_train2"
        )
    with pytest.raises(ValueError, match="OVER"):
        c.bq_sql(
            "CREATE MODEL m_o TRANSFORM(ML.STANDARD_SCALER(x1) AS sx, y) "
            "OPTIONS(model_type='linear_reg', input_label_cols=['y']) "
            "AS SELECT x1, y FROM tr_train2"
        )
    with pytest.raises(ValueError, match="dnn"):
        c.sql(
            "CREATE MODEL m_d OPTIONS(model_type='dnn_regressor', "
            "input_label_cols=['y']) AS SELECT x1, y FROM tr_train2"
        )
    with pytest.raises(ValueError, match="collides"):
        c.bq_sql(
            "CREATE MODEL m_c TRANSFORM(x1 + 0 AS x2, x2 AS x2b, y) "
            "OPTIONS(model_type='linear_reg', input_label_cols=['y']) "
            "AS SELECT x1, x2, y FROM tr_train2"
        )
        c.sql(
            "SELECT * FROM ML.PREDICT(MODEL m_c, "
            "(SELECT x1, x2 FROM tr_train2))"
        )


def test_inspection_pack_confusion_roc(spark, tmp_path):
    """r10 BQML inspection: exact diagonal confusion matrix on
    separable data, exact per-threshold ROC counts, custom threshold
    arrays, and the named refusals."""
    rows = [
        (float(i % 20), float((i * 3) % 17),
         1 if (i % 20) + ((i * 3) % 17) > 18 else 0)
        for i in range(400)
    ]
    spark.createDataFrame(rows, "x1 double, x2 double, y int")\
        .createOrReplaceTempView("insp_cls")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL insp_m OPTIONS(model_type='logistic_reg', "
        "input_label_cols=['y'], max_iterations=12) "
        "AS SELECT * FROM insp_cls"
    )
    cm = {
        r.expected_label: (r["0"], r["1"])
        for r in c.sql(
            "SELECT * FROM ML.CONFUSION_MATRIX(MODEL insp_m, "
            "TABLE insp_cls)"
        ).collect()
    }
    n_pos = sum(1 for r in rows if r[2] == 1)
    assert cm["0"] == (400 - n_pos, 0) and cm["1"] == (0, n_pos)
    roc = c.sql(
        "SELECT * FROM ML.ROC_CURVE(MODEL insp_m, TABLE insp_cls, "
        "[0.0, 0.5, 1.0])"
    ).collect()
    assert [r.threshold for r in roc] == [0.0, 0.5, 1.0]
    # threshold 0: everything predicted positive
    assert roc[0].true_positives == n_pos
    assert roc[0].false_positives == 400 - n_pos
    assert roc[0].recall == 1.0 and roc[0].false_positive_rate == 1.0
    # exact count identities at every threshold
    for r in roc:
        assert r.true_positives + r.false_negatives == n_pos
        assert r.false_positives + r.true_negatives == 400 - n_pos
    # default grid is 101 thresholds
    assert c.sql(
        "SELECT COUNT(*) AS n FROM ML.ROC_CURVE(MODEL insp_m, "
        "TABLE insp_cls)"
    ).collect()[0].n == 101
    with pytest.raises(ValueError, match="1..256"):
        c.sql(
            "SELECT * FROM ML.ROC_CURVE(MODEL insp_m, TABLE insp_cls, "
            "GENERATE_ARRAY(1, 300))"
        )
    # linear_reg is not a classifier
    c.sql(
        "CREATE MODEL insp_lin OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT x1, y FROM insp_cls"
    )
    with pytest.raises(ValueError, match="logistic_reg or boosted"):
        c.sql(
            "SELECT * FROM ML.CONFUSION_MATRIX(MODEL insp_lin, "
            "TABLE insp_cls)"
        )


def test_inspection_pack_info_surfaces(spark, tmp_path):
    """ML.TRAINING_INFO (loss trajectory) and ML.FEATURE_INFO
    (fit-time stats) persist with the model across a JSON reload."""
    rows = [(float(i % 13), 2.0 * (i % 13) + 1.0) for i in range(100)]
    spark.createDataFrame(rows, "x double, y double")\
        .createOrReplaceTempView("insp_lin2")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL insp_l2 OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM insp_lin2"
    )
    ti = c.sql(
        "SELECT * FROM ML.TRAINING_INFO(MODEL insp_l2)"
    ).collect()
    assert len(ti) == 1 and ti[0].iteration == 0
    assert ti[0].loss < 1e-18  # exact fit -> ~zero MSE
    fi = {r.input: r for r in c.sql(
        "SELECT * FROM ML.FEATURE_INFO(MODEL insp_l2)"
    ).collect()}
    assert fi["x"].min == 0.0 and fi["x"].max == 12.0
    assert abs(fi["x"].mean - sum(r[0] for r in rows) / 100) < 1e-12
    assert fi["x"].null_count == 0
    # reload: the stats travel in the model JSON
    saved = ml.load_model(str(tmp_path / "wh" / "_models"), "insp_l2")
    assert saved["feature_stats"] == c.models["insp_l2"]["feature_stats"]
    assert saved["training_info"] == c.models["insp_l2"]["training_info"]
    # logistic: strictly decreasing trajectory from ln 2
    spark.createDataFrame(
        [(float(i), 1 if i > 50 else 0) for i in range(100)],
        "x double, y int",
    ).createOrReplaceTempView("insp_lg")
    c.sql(
        "CREATE MODEL insp_lg_m OPTIONS(model_type='logistic_reg', "
        "input_label_cols=['y'], max_iterations=8) "
        "AS SELECT * FROM insp_lg"
    )
    losses = [r.loss for r in c.sql(
        "SELECT * FROM ML.TRAINING_INFO(MODEL insp_lg_m) "
        "ORDER BY iteration"
    ).collect()]
    assert abs(losses[0] - 0.6931471805599453) < 1e-9
    assert all(a > b for a, b in zip(losses, losses[1:]))


def test_detect_anomalies_kmeans_pca(spark, tmp_path):
    """ML.DETECT_ANOMALIES: thresholds come from the TRAINING
    distance/error distribution (persisted quantile grid); planted far
    outliers flag for both detectors; contamination validates; arima
    refuses with a name."""
    import random

    random.seed(11)
    pts = [(random.gauss(0, 0.5), random.gauss(0, 0.5))
           for _ in range(400)]
    pts += [(random.gauss(10, 0.5), random.gauss(10, 0.5))
            for _ in range(400)]
    spark.createDataFrame(pts, "a double, b double")\
        .createOrReplaceTempView("an_train")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL an_km OPTIONS(model_type='kmeans', "
        "num_clusters=2, max_iterations=6) AS SELECT * FROM an_train"
    )
    assert len(c.models["an_km"]["dist_quantiles"]) == 1001
    spark.createDataFrame(
        pts + [(100.0, -100.0), (-80.0, 90.0)], "a double, b double"
    ).createOrReplaceTempView("an_score")
    out = c.sql(
        "SELECT * FROM ML.DETECT_ANOMALIES(MODEL an_km, "
        "STRUCT(0.02 AS contamination), TABLE an_score)"
    )
    assert set(out.columns) == {
        "a", "b", "centroid_id", "normalized_distance", "is_anomaly"
    }
    far = out.filter("abs(a) > 50").collect()
    assert all(r.is_anomaly and r.normalized_distance > 1 for r in far)
    rate = out.filter("abs(a) <= 50").selectExpr(
        "avg(cast(is_anomaly as double)) AS r"
    ).collect()[0].r
    assert rate <= 0.05  # ~2% by construction
    # default contamination (0.1) also works
    n_def = c.sql(
        "SELECT COUNT(*) AS n FROM ML.DETECT_ANOMALIES(MODEL an_km, "
        "TABLE an_score) WHERE is_anomaly"
    ).collect()[0].n
    assert n_def >= 2
    # pca reconstruction-error detector
    c.sql(
        "CREATE MODEL an_pca OPTIONS(model_type='pca', "
        "num_principal_components=1) AS SELECT * FROM an_train"
    )
    outp = c.sql(
        "SELECT * FROM ML.DETECT_ANOMALIES(MODEL an_pca, "
        "STRUCT(0.02 AS contamination), TABLE an_score)"
    )
    assert "mean_squared_error" in outp.columns
    assert all(
        r.is_anomaly for r in outp.filter("abs(a) > 50").collect()
    )
    with pytest.raises(ValueError, match="contamination"):
        c.sql(
            "SELECT * FROM ML.DETECT_ANOMALIES(MODEL an_km, "
            "STRUCT(0.7 AS contamination), TABLE an_score)"
        )
    with pytest.raises(ValueError, match="kmeans or pca"):
        c.sql(
            "CREATE MODEL an_lin OPTIONS(model_type='linear_reg', "
            "input_label_cols=['b']) AS SELECT * FROM an_train"
        )
        c.sql(
            "SELECT * FROM ML.DETECT_ANOMALIES(MODEL an_lin, "
            "TABLE an_score)"
        )


def test_data_split_and_heldout_evaluate(spark, tmp_path):
    """r10: data_split_method='random'/'seq' carve a deterministic
    eval split; the split predicate persists so ML.EVALUATE(MODEL m)
    with no input re-evaluates the same held-out rows; TRAINING_INFO
    gains eval_loss on the final entry."""
    rows = [(float(i % 17), float((i * 7) % 13)) for i in range(400)]
    rows = [(x1, x2, 2 * x1 - 3 * x2 + 5) for x1, x2 in rows]
    spark.createDataFrame(rows, "x1 double, x2 double, y double")\
        .createOrReplaceTempView("sp_train")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL sp_m OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y'], data_split_method='random', "
        "data_split_eval_fraction=0.25) AS SELECT * FROM sp_train"
    )
    m = c.models["sp_m"]
    assert m["data_split"]["method"] == "random"
    # deterministic: retraining reproduces the identical split
    c.sql(
        "CREATE OR REPLACE MODEL sp_m2 OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y'], data_split_method='random', "
        "data_split_eval_fraction=0.25) AS SELECT * FROM sp_train"
    )
    assert (
        c.models["sp_m2"]["data_split"]["condition"]
        == m["data_split"]["condition"]
    )
    ev = c.sql("SELECT * FROM ML.EVALUATE(MODEL sp_m)").collect()[0]
    assert ev.r2_score == pytest.approx(1.0, abs=1e-9)
    ti = c.sql(
        "SELECT * FROM ML.TRAINING_INFO(MODEL sp_m)"
    ).collect()
    assert ti[-1].eval_loss is not None and ti[-1].eval_loss < 1e-18
    # seq split: highest data_split_col values go to eval
    c.sql(
        "CREATE MODEL sq_m OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y'], data_split_method='seq', "
        "data_split_col='x1', data_split_eval_fraction=0.2) "
        "AS SELECT * FROM sp_train"
    )
    cond = c.models["sq_m"]["data_split"]["condition"]
    assert "x1" in cond and ">=" in cond
    # refusals
    with pytest.raises(ValueError, match="supervised"):
        c.sql(
            "CREATE MODEL sp_km OPTIONS(model_type='kmeans', "
            "num_clusters=2, data_split_method='random') "
            "AS SELECT x1, x2 FROM sp_train"
        )
    with pytest.raises(ValueError, match="not supported"):
        c.sql(
            "CREATE MODEL sp_bad OPTIONS(model_type='linear_reg', "
            "input_label_cols=['y'], data_split_method='auto_split') "
            "AS SELECT * FROM sp_train"
        )
    with pytest.raises(ValueError, match="data_split_method"):
        c.sql("SELECT * FROM ML.EVALUATE(MODEL sq_no)") \
            if False else None
        c.sql(
            "CREATE MODEL sp_ns OPTIONS(model_type='linear_reg', "
            "input_label_cols=['y']) AS SELECT * FROM sp_train"
        )
        c.sql("SELECT * FROM ML.EVALUATE(MODEL sp_ns)")


def test_explain_predict_and_global_explain(spark, tmp_path):
    """r10: exact linear Shapley attributions — coef*(x-mean), summing
    to prediction-baseline identically; GLOBAL_EXPLAIN = |coef|*E|x-mu|
    from fit-time stats; tree models point to FEATURE_IMPORTANCE."""
    rows = [(float(i % 17), float((i * 7) % 13)) for i in range(300)]
    rows = [(x1, x2, 2 * x1 - 3 * x2 + 5) for x1, x2 in rows]
    spark.createDataFrame(rows, "x1 double, x2 double, y double")\
        .createOrReplaceTempView("ex_train")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL ex_m OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM ex_train"
    )
    ep = c.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL ex_m, "
        "(SELECT 10.0 AS x1, 1.0 AS x2), STRUCT(2 AS top_k_features))"
    ).collect()[0]
    assert ep.predicted_y == pytest.approx(22.0, abs=1e-9)
    assert ep.approximation_error == 0.0
    s = sum(a.attribution for a in ep.top_feature_attributions)
    assert ep.baseline_prediction_value + s == pytest.approx(
        ep.prediction_value, abs=1e-9
    )
    # top_k truncation keeps the largest |attribution| first
    one = c.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL ex_m, "
        "(SELECT 100.0 AS x1, 0.0 AS x2), STRUCT(1 AS top_k_features))"
    ).collect()[0]
    assert len(one.top_feature_attributions) == 1
    assert one.top_feature_attributions[0].feature == "x1"
    ge = {r.feature: r.attribution for r in c.sql(
        "SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL ex_m)"
    ).collect()}
    import statistics as st

    mu1 = st.mean(r[0] for r in rows)
    mad1 = st.mean(abs(r[0] - mu1) for r in rows)
    assert ge["x1"] == pytest.approx(2.0 * mad1, rel=1e-6)
    # logistic attributions live in log-odds space and still sum
    spark.createDataFrame(
        [(float(i % 11), 1 if (i % 11) > 5 else 0) for i in range(200)],
        "x double, y int",
    ).createOrReplaceTempView("ex_lg")
    c.sql(
        "CREATE MODEL ex_lg_m OPTIONS(model_type='logistic_reg', "
        "input_label_cols=['y']) AS SELECT * FROM ex_lg"
    )
    lp = c.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL ex_lg_m, "
        "(SELECT 9.0 AS x))"
    ).collect()[0]
    assert lp.predicted_y == 1 and lp.predicted_y_prob > 0.5
    assert lp.baseline_prediction_value + sum(
        a.attribution for a in lp.top_feature_attributions
    ) == pytest.approx(lp.prediction_value, abs=1e-9)
    # r11: tree models now EXPLAIN (TreeSHAP) — the sum identity holds
    # through the SQL surface; GLOBAL_EXPLAIN still refuses without
    # the enable_global_explain training option (BigQuery's gate)
    df = _tr_frame(spark, n=200)
    df.createOrReplaceTempView("ex_bt")
    c.sql(
        "CREATE MODEL ex_bt_m OPTIONS("
        "model_type='boosted_tree_regressor', input_label_cols=['y'], "
        "max_iterations=3) AS SELECT * FROM ex_bt"
    )
    bt = c.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL ex_bt_m, "
        "TABLE ex_bt)"
    ).collect()[0]
    assert bt.baseline_prediction_value + sum(
        a.attribution for a in bt.top_feature_attributions
    ) == pytest.approx(bt.prediction_value, abs=1e-9)
    with pytest.raises(ValueError, match="enable_global_explain"):
        c.sql("SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL ex_bt_m)")


def test_categorical_features_dummy_encoding(spark, tmp_path):
    """r10 BQML categorical features: automatic one-hot at fit time,
    vocabulary persisted (NULL its own category), identical predict
    expansion, grouped WEIGHTS, unseen-category = baseline, named
    refusals for model types without encoding support."""
    rows = []
    for i in range(300):
        seg = ["A", "B", None][i % 3]
        eff = {None: 0.0, "A": 5.0, "B": -3.0}[seg]
        x = float(i % 17)
        rows.append((x, seg, 2.0 * x + eff + 1.0))
    spark.createDataFrame(rows, "x double, seg string, y double")\
        .createOrReplaceTempView("cat_trn")
    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql(
        "CREATE MODEL cat_m OPTIONS(model_type='linear_reg', "
        "input_label_cols=['y']) AS SELECT * FROM cat_trn"
    )
    worst = c.sql(
        "SELECT MAX(ABS(predicted_y - y)) AS w "
        "FROM ML.PREDICT(MODEL cat_m, TABLE cat_trn)"
    ).collect()[0].w
    assert worst < 1e-6
    # predict output keeps caller columns only
    out = c.sql(
        "SELECT * FROM ML.PREDICT(MODEL cat_m, "
        "(SELECT 3.0 AS x, 'A' AS seg))"
    )
    assert out.columns == ["x", "seg", "predicted_y"]
    assert abs(out.collect()[0].predicted_y - 12.0) < 1e-6
    # NULL is its own category with its own effect
    pn = c.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL cat_m, "
        "(SELECT 3.0 AS x, CAST(NULL AS STRING) AS seg))"
    ).collect()[0].predicted_y
    assert abs(pn - 7.0) < 1e-6
    # weights grouped under the original column
    w = {r.processed_input: r for r in c.sql(
        "SELECT * FROM ML.WEIGHTS(MODEL cat_m)"
    ).collect()}
    assert w["seg"].weight is None
    cats = {e.category for e in w["seg"].category_weights}
    assert cats == {"A", "B", "NULL"}
    assert w["x"].weight == pytest.approx(2.0, abs=1e-4)
    # relative effects are identifiable even though absolute dummy
    # weights are not (minimal ridge): A - B = 8, A - NULL = 5
    cw = {e.category: e.weight for e in w["seg"].category_weights}
    assert cw["A"] - cw["B"] == pytest.approx(8.0, abs=1e-4)
    assert cw["A"] - cw["NULL"] == pytest.approx(5.0, abs=1e-4)
    # persistence round-trip keeps the vocabulary
    saved = ml.load_model(str(tmp_path / "wh" / "_models"), "cat_m")
    assert saved["categorical"] == c.models["cat_m"]["categorical"]
    # logistic with a categorical feature separates on it
    spark.createDataFrame(
        [(["u", "v"][i % 2], i % 2) for i in range(100)],
        "s string, y int",
    ).createOrReplaceTempView("cat_lg")
    c.sql(
        "CREATE MODEL cat_lg_m OPTIONS(model_type='logistic_reg', "
        "input_label_cols=['y']) AS SELECT * FROM cat_lg"
    )
    acc = c.sql(
        "SELECT accuracy FROM ML.EVALUATE(MODEL cat_lg_m, "
        "TABLE cat_lg)"
    ).collect()[0].accuracy
    assert acc == 1.0
    # refusals: trees/kmeans with strings; explain on categorical;
    # unbounded vocabulary
    with pytest.raises(ValueError, match="string feature"):
        c.sql(
            "CREATE MODEL cat_bt OPTIONS("
            "model_type='boosted_tree_regressor', "
            "input_label_cols=['y'], max_iterations=2) "
            "AS SELECT * FROM cat_trn"
        )
    # explainability groups the one-hot attributions under the
    # ORIGINAL column and stays exactly additive
    ep = c.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL cat_m, "
        "(SELECT 3.0 AS x, 'A' AS seg), STRUCT(2 AS top_k_features))"
    ).collect()[0]
    feats = {a.feature for a in ep.top_feature_attributions}
    assert feats == {"x", "seg"}
    ssum = sum(a.attribution for a in ep.top_feature_attributions)
    assert ep.baseline_prediction_value + ssum == pytest.approx(
        ep.prediction_value, abs=1e-9
    )
    assert ep.predicted_y == pytest.approx(12.0, abs=1e-6)
    # global explain: closed-form mean |attribution| for the grouped
    # column — effects are ±(5,-3,0)-ish around the frequency-weighted
    # mean, so seg's attribution is strictly positive and finite
    ge = {r.feature: r.attribution for r in c.sql(
        "SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL cat_m)"
    ).collect()}
    assert set(ge) == {"x", "seg"}
    import statistics as st

    effs = [5.0, -3.0, 0.0]  # equal thirds
    wbar = st.mean(effs)
    assert ge["seg"] == pytest.approx(
        st.mean(abs(e - wbar) for e in effs), abs=1e-3
    )
    spark.range(500).selectExpr(
        "CAST(id AS STRING) AS s", "CAST(id AS DOUBLE) AS y"
    ).createOrReplaceTempView("cat_wide")
    with pytest.raises(ValueError, match="256"):
        c.sql(
            "CREATE MODEL cat_w OPTIONS(model_type='linear_reg', "
            "input_label_cols=['y']) AS SELECT * FROM cat_wide"
        )


# -- TreeSHAP for boosted trees (r11, VERDICT r10 item 2) ----------------------


def _ref_tree_shap_row(x, tree, n_features):
    """Independent per-row oracle: brute-force Shapley values computed
    STRAIGHT FROM THE DEFINITION over the path-dependent value function
    (EXPVALUE, Algorithm 1 of the public TreeSHAP paper): conditioned
    features follow x down the tree, unconditioned splits average their
    children by training cover. Exponential in n_features — fine for
    the <=4-feature test trees, and structurally unrelated to the
    production recursion, so agreement is strong evidence."""
    import itertools
    import math

    cover = {int(k): float(v) for k, v in tree["covers"].items()}

    def expvalue(S):
        def g(nid):
            s = tree["splits"].get(str(nid))
            if s is None:
                return float(tree["leaves"][str(nid)])
            f, thr = s["f"], s["value_thr"]
            left, right = 2 * nid + 1, 2 * nid + 2
            if f in S:
                xv = x[f]
                go_left = (
                    xv is None
                    or (isinstance(xv, float) and math.isnan(xv))
                    or xv < thr
                )
                return g(left) if go_left else g(right)
            return (
                cover[left] * g(left) + cover[right] * g(right)
            ) / cover[nid]

        return g(0)

    phi = [0.0] * n_features
    for i in range(n_features):
        rest = [f for f in range(n_features) if f != i]
        for k in range(len(rest) + 1):
            for S in itertools.combinations(rest, k):
                w = (
                    math.factorial(len(S))
                    * math.factorial(n_features - len(S) - 1)
                    / math.factorial(n_features)
                )
                phi[i] += w * (
                    expvalue(set(S) | {i}) - expvalue(set(S))
                )
    return phi


def test_tree_shap_hand_computable_cases():
    """Single split: phi_0 = v(leaf_x) - v(empty), nothing else."""
    import numpy as np

    from bigquery_etl_spark.operators.ml import (
        _tree_expected,
        _tree_shap_batch,
    )

    tree = {
        "splits": {"0": {"f": 0, "bin_thr": 0, "value_thr": 5.0,
                         "gain": 1.0, "cover": 10.0}},
        "leaves": {"1": 2.0, "2": 8.0},
        "covers": {"0": 10.0, "1": 6.0, "2": 4.0},
    }
    v0 = 0.6 * 2.0 + 0.4 * 8.0
    assert _tree_expected(tree) == pytest.approx(v0)
    X = np.array([[1.0, 0.0], [9.0, 0.0], [np.nan, 0.0]])
    phi = _tree_shap_batch(X, tree, 2)
    assert phi[:, 1] == pytest.approx([0.0, 0.0, 0.0])
    assert phi[0, 0] == pytest.approx(2.0 - v0)
    assert phi[1, 0] == pytest.approx(8.0 - v0)
    assert phi[2, 0] == pytest.approx(2.0 - v0)  # NaN goes left

    # two-level, two-feature: verify against the independent per-row
    # reference AND the sum identity
    tree2 = {
        "splits": {
            "0": {"f": 0, "bin_thr": 0, "value_thr": 5.0,
                  "gain": 1.0, "cover": 10.0},
            "1": {"f": 1, "bin_thr": 0, "value_thr": 0.5,
                  "gain": 1.0, "cover": 6.0},
        },
        "leaves": {"3": -1.0, "4": 3.0, "2": 8.0},
        "covers": {"0": 10.0, "1": 6.0, "2": 4.0, "3": 2.0, "4": 4.0},
    }
    X2 = np.array(
        [[1.0, 0.0], [1.0, 1.0], [9.0, 0.0], [9.0, 1.0], [np.nan, np.nan]]
    )
    phi2 = _tree_shap_batch(X2, tree2, 2)
    leaf_of = [-1.0, 3.0, 8.0, 8.0, -1.0]
    v0_2 = (2 * -1.0 + 4 * 3.0 + 4 * 8.0) / 10.0
    for r in range(len(X2)):
        ref = _ref_tree_shap_row(list(X2[r]), tree2, 2)
        assert phi2[r] == pytest.approx(ref, abs=1e-12)
        assert phi2[r].sum() == pytest.approx(leaf_of[r] - v0_2, abs=1e-12)


def test_tree_shap_differential_vs_reference(spark):
    """Fit a real GBDT (repeated split features exercise the UNWIND
    path), then the vectorized batch TreeSHAP must match the per-row
    reference on every row, and sum to margin - baseline."""
    import numpy as np

    from bigquery_etl_spark.operators.ml import (
        _tree_expected,
        _tree_shap_batch,
        fit_boosted_trees,
    )

    rng = np.random.RandomState(7)
    n, d = 400, 3
    X = rng.uniform(-3, 3, size=(n, d))
    y = (
        np.sin(X[:, 0]) * 2.0
        + np.where(X[:, 1] > 0, X[:, 0] * 1.5, -X[:, 2])
        + 0.1 * rng.normal(size=n)
    )
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t))
         for (a, b, c), t in zip(X, y)],
        "f0 double, f1 double, f2 double, y double",
    )
    model = fit_boosted_trees(
        df, ["f0", "f1", "f2"], "y", num_trees=5, max_depth=4
    )
    assert all("covers" in t for t in model["trees"])
    lr = model["learning_rate"]
    base = model["base_score"] + lr * sum(
        _tree_expected(t) for t in model["trees"]
    )
    sample = X[:40]
    phi = np.zeros((len(sample), d))
    for t in model["trees"]:
        batch = _tree_shap_batch(sample, t, d)
        for r in range(len(sample)):
            ref = _ref_tree_shap_row(list(sample[r]), t, d)
            assert batch[r] == pytest.approx(ref, abs=1e-9)
        phi += batch
    phi *= lr
    # sum identity vs the actual prediction margin
    from bigquery_etl_spark.operators.ml import predict_boosted_trees

    preds = {
        (round(r.f0, 9), round(r.f1, 9), round(r.f2, 9)): r.p
        for r in predict_boosted_trees(df, model, out="p").collect()
    }
    for r in range(len(sample)):
        key = tuple(round(float(v), 9) for v in sample[r])
        assert base + phi[r].sum() == pytest.approx(preds[key], abs=1e-9)
    # NaN (NULL) rows route left like prediction — batch must still
    # match the per-row reference (NaN follows the go-left convention
    # in both)
    nan_sample = sample[:10].copy()
    nan_sample[::2, 0] = np.nan
    nan_sample[::3, 2] = np.nan
    for t in model["trees"]:
        batch = _tree_shap_batch(nan_sample, t, d)
        for r in range(len(nan_sample)):
            ref = _ref_tree_shap_row(
                [None if np.isnan(v) else float(v) for v in nan_sample[r]],
                t, d,
            )
            assert batch[r] == pytest.approx(ref, abs=1e-9)


def test_explain_predict_boosted_sql_surface(spark, tmp_path):
    """ML.EXPLAIN_PREDICT(MODEL boosted, ...) through the SQL surface:
    BigQuery's output shape, exact sum identity, top_k bound, and the
    classifier's margin-space attributions."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    c = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    spark.range(300).selectExpr(
        "CAST(id % 17 AS DOUBLE) AS a",
        "CAST(id % 5 AS DOUBLE) AS b",
        "CAST(CASE WHEN id % 17 > 8 THEN 1 ELSE 0 END + "
        "     CASE WHEN id % 5 > 2 THEN 2 ELSE 0 END AS DOUBLE) AS y",
    ).createOrReplaceTempView("bt_pts")
    c.sql(
        "CREATE OR REPLACE MODEL bt_reg OPTIONS("
        "model_type='boosted_tree_regressor', input_label_cols=['y'], "
        "max_iterations=8) AS SELECT * FROM bt_pts"
    )
    ep = c.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL bt_reg, "
        "(SELECT a, b FROM bt_pts), STRUCT(2 AS top_k_features))"
    )
    rows = ep.collect()
    assert len(rows) == 300
    for r in rows[:20]:
        assert len(r.top_feature_attributions) == 2
        assert r.approximation_error == 0.0
        total = r.baseline_prediction_value + sum(
            e.attribution for e in r.top_feature_attributions
        )
        assert total == pytest.approx(r.prediction_value, abs=1e-9)
        assert r.predicted_y == pytest.approx(r.prediction_value)
    # prediction_value matches ML.PREDICT exactly
    pred = {
        (r.a, r.b): r.predicted_y
        for r in c.sql(
            "SELECT * FROM ML.PREDICT(MODEL bt_reg, "
            "(SELECT DISTINCT a, b FROM bt_pts))"
        ).collect()
    }
    for r in rows[:50]:
        assert r.prediction_value == pytest.approx(
            pred[(r.a, r.b)], abs=1e-9
        )
    # classifier: attributions in margin space, predicted prob present
    c.sql(
        "CREATE OR REPLACE MODEL bt_cls OPTIONS("
        "model_type='boosted_tree_classifier', input_label_cols=['y2'],"
        " max_iterations=5) AS SELECT a, b, "
        "CAST(y > 1.5 AS INT) AS y2 FROM (SELECT *, y FROM bt_pts)"
    )
    epc = c.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL bt_cls, "
        "(SELECT a, b FROM bt_pts))"
    ).collect()
    for r in epc[:10]:
        assert 0.0 <= r.predicted_y2_prob <= 1.0
        assert r.predicted_y2 in (0, 1)


def test_global_explain_boosted_r11(spark, tmp_path):
    """r11: tree-model ML.GLOBAL_EXPLAIN — mean |TreeSHAP| persisted
    at fit when enable_global_explain=TRUE (BigQuery's gate); a
    feature the label never depends on attributes exactly 0; refusal
    without the option; survives model persistence."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    spark.range(240).selectExpr(
        "CAST(id % 19 AS DOUBLE) AS big",
        "CAST(id % 7 AS DOUBLE) AS small",
        "CAST(id % 3 AS DOUBLE) AS inert",
    ).selectExpr(
        "*",
        "CASE WHEN big > 9 THEN 50.0 ELSE 0.0 END + small AS y",
    ).createOrReplaceTempView("ge_pts")
    cat.sql(
        "CREATE OR REPLACE MODEL ge_m OPTIONS("
        "model_type='boosted_tree_regressor', input_label_cols=['y'], "
        "max_iterations=6, enable_global_explain=TRUE) "
        "AS SELECT * FROM ge_pts"
    )
    ge = {
        r.feature: r.attribution
        for r in cat.sql(
            "SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL ge_m)"
        ).collect()
    }
    assert set(ge) == {"big", "small", "inert"}
    assert ge["inert"] == 0.0          # never split on -> exactly 0
    assert ge["big"] > ge["small"] > 0  # effect sizes order
    # persistence: reload from the warehouse, stats survive
    cat2 = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat2.models["ge_m"] = __import__(
        "bigquery_etl_spark.operators.ml", fromlist=["load_model"]
    ).load_model(str(tmp_path / "wh" / "_models"), "ge_m")
    ge2 = {
        r.feature: r.attribution
        for r in cat2.sql(
            "SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL ge_m)"
        ).collect()
    }
    assert ge2 == ge
    # without the option: loud BigQuery-style refusal
    cat.sql(
        "CREATE OR REPLACE MODEL ge_plain OPTIONS("
        "model_type='boosted_tree_regressor', input_label_cols=['y'], "
        "max_iterations=3) AS SELECT * FROM ge_pts"
    )
    with pytest.raises(ValueError, match="enable_global_explain"):
        cat.sql("SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL ge_plain)").collect()


# -- Random forest (r11) --------------------------------------------------------


def test_random_forest_regressor_fits_step(spark, cat):
    from pyspark.sql import functions as F

    pts = spark.range(1500).select(
        (F.col("id") % 19).cast("double").alias("x1"),
        (F.col("id") % 23).cast("double").alias("x2"),
    ).withColumn(
        "y",
        F.when(F.col("x1") > 9, 10.0).otherwise(0.0)
        + F.when(F.col("x2") > 11, 5.0).otherwise(0.0),
    )
    pts.createOrReplaceTempView("rft")
    cat.sql(
        "CREATE OR REPLACE MODEL rf1 OPTIONS("
        "model_type='random_forest_regressor', input_label_cols=['y'], "
        "num_parallel_tree=6, max_tree_depth=4, subsample=0.7) "
        "AS SELECT * FROM rft"
    )
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL rf1, TABLE rft)"
    ).collect()[0]
    assert ev.r2_score > 0.98
    # bagging: members trained on different subsamples differ
    bases = {m["base_score"] for m in cat.models["rf1"]["members"]}
    assert len(bases) > 1
    # prediction column shape
    row = cat.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL rf1, TABLE rft) LIMIT 1"
    ).collect()[0]
    assert isinstance(row.predicted_y, float)


def test_random_forest_classifier_and_refusals(spark, cat):
    from pyspark.sql import functions as F

    pts = spark.range(1500).select(
        (F.col("id") % 37).cast("double").alias("x1"),
        (F.col("id") % 11).cast("double").alias("x2"),
    ).withColumn("lbl", ((F.col("x1") + F.col("x2")) > 22).cast("int"))
    pts.createOrReplaceTempView("rfc")
    cat.sql(
        "CREATE OR REPLACE MODEL rf2 OPTIONS("
        "model_type='random_forest_classifier', input_label_cols=['lbl'], "
        "num_parallel_tree=6, max_tree_depth=5) AS SELECT * FROM rfc"
    )
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL rf2, TABLE rfc)"
    ).collect()[0]
    assert ev.accuracy > 0.97 and ev.log_loss < 0.35
    pred = cat.sql(
        "SELECT predicted_lbl, predicted_lbl_prob "
        "FROM ML.PREDICT(MODEL rf2, TABLE rfc) LIMIT 1"
    ).collect()[0]
    assert pred.predicted_lbl in (0, 1)
    assert 0.0 <= pred.predicted_lbl_prob <= 1.0
    # named refusals: explainability, bad options
    with pytest.raises(ValueError, match="random_forest"):
        cat.sql(
            "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL rf2, TABLE rfc)"
        ).collect()
    with pytest.raises(ValueError, match="num_parallel_tree"):
        cat.sql(
            "CREATE OR REPLACE MODEL rf3 OPTIONS("
            "model_type='random_forest_regressor', "
            "input_label_cols=['lbl'], num_parallel_tree=1) "
            "AS SELECT * FROM rfc"
        )
    with pytest.raises(ValueError, match="subsample"):
        cat.sql(
            "CREATE OR REPLACE MODEL rf4 OPTIONS("
            "model_type='random_forest_regressor', "
            "input_label_cols=['lbl'], subsample=1.5) "
            "AS SELECT * FROM rfc"
        )


def test_kmeans_evaluate_metrics(spark, cat):
    from pyspark.sql import functions as F

    # two distinct-point blobs with jitter -> well-separated clusters
    spark.range(600).select(
        (
            F.when(F.col("id") % 2 == 0, 0.0).otherwise(30.0)
            + (F.col("id") % 7).cast("double") / 7.0
        ).alias("x1"),
        ((F.col("id") % 5).cast("double") / 5.0).alias("x2"),
    ).createOrReplaceTempView("kme_t")
    cat.sql(
        "CREATE OR REPLACE MODEL kme OPTIONS(model_type='kmeans', "
        "num_clusters=2) AS SELECT x1, x2 FROM kme_t"
    )
    r = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL kme, "
        "(SELECT x1, x2 FROM kme_t))"
    ).collect()[0]
    assert 0.0 < r.davies_bouldin_index < 0.1
    assert 0.0 < r.mean_squared_distance < 1.0
    # hand-checkable: within-blob scatter is the uniform-grid moment
    # E[(x-mean)^2] over the 7x5 jitter lattice (x1 var + x2 var)
    import itertools

    xs = [i / 7.0 for i in range(7)]
    ys = [j / 5.0 for j in range(5)]
    mx, my = sum(xs) / 7, sum(ys) / 5
    expect = (
        sum((x - mx) ** 2 for x in xs) / 7
        + sum((y - my) ** 2 for y in ys) / 5
    )
    # the fitted centroids sit at the blob means (balanced lattice), so
    # MSD equals the lattice moment almost exactly
    assert abs(r.mean_squared_distance - expect) < 0.02
