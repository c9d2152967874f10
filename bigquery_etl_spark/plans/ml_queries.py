"""BQML declared queries (r6 — the BigQuery ML surface the reference
delegates to its engine; ref main.py:21,160-185 hands all analytics to
BigQuery and BQML is part of that surface). operators/ml.py holds the
execution model: linear_reg = exact normal equations in ONE distributed
aggregate pass; kmeans = euclidean Lloyd's as DataFrame aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.plans._util import local_df
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


@query(
    "q_ml_linreg",
    sql="""
    SELECT term, w FROM (
        SELECT '1_slope' AS term,
               ROUND(regr_slope(l_extendedprice, l_quantity), 2) AS w
        FROM lineitem
        UNION ALL
        SELECT '2_icpt',
               ROUND(regr_intercept(l_extendedprice, l_quantity), 2)
        FROM lineitem
    ) ORDER BY term
    """,
    tags=("ml", "bqml", "linear_reg"),
)
def q_ml_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MODEL linear_reg, REAL single-feature fit
    (extendedprice ~ quantity on lineitem) — DuckDB's regr_slope /
    regr_intercept is the oracle, so the one-pass sufficient-statistics
    aggregation is value-checked against an independent implementation
    on real data (2 dp: both engines compute the same closed form in
    double precision; they agree far below a hundredth). SAME WORK on
    both sides — one aggregate pass each — so this is a fair matched
    bench entry; the planted multi-feature solve lives in
    q_ml_linreg_exact (its oracle is constants, excluded from the
    matched ratio). The driver sees k^2 sums, never rows, at any
    corpus size."""
    from bigquery_etl_spark.operators import ml

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
    )
    real = ml.fit_linear_reg(li, ["x"], "y")
    rows = [
        ("1_slope", round(real["coefficients"][0], 2)),
        ("2_icpt", round(real["intercept"], 2)),
    ]
    return local_df(spark, rows, "term string, w double").orderBy("term")


@query(
    "q_ml_linreg_exact",
    sql="""
    SELECT term, w FROM (
        SELECT '1_intercept' AS term, CAST(5.0 AS DOUBLE) AS w
        UNION ALL SELECT '2_x1', 2.0
        UNION ALL SELECT '3_x2', -3.0
        UNION ALL SELECT '4_r2', 1.0
    ) ORDER BY term
    """,
    tags=("ml", "bqml", "linear_reg"),
)
def q_ml_linreg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MODEL linear_reg on a PLANTED exact relationship
    (y = 2*x1 - 3*x2 + 5 built from orders columns): the
    normal-equation solve must recover the integer coefficients to
    machine precision — ROUND(., 6) makes the hash check exact, so any
    Gram-accumulation or solver bug mismatches. The oracle is the
    planted constants (closed form), which is why this query is
    EXCLUDED from the matched bench ratio: the oracle does no work."""
    from bigquery_etl_spark.operators import ml

    o = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 17).cast("double").alias("x1"),
        (F.col("o_custkey") % 13).cast("double").alias("x2"),
    ).withColumn("y", F.lit(2.0) * F.col("x1") - F.lit(3.0) * F.col("x2") + 5)
    planted = ml.fit_linear_reg(o, ["x1", "x2"], "y")
    rows = [
        ("1_intercept", round(planted["intercept"], 6)),
        ("2_x1", round(planted["coefficients"][0], 6)),
        ("3_x2", round(planted["coefficients"][1], 6)),
        ("4_r2", round(planted["r2"], 6)),
    ]
    return local_df(spark, rows, "term string, w double").orderBy("term")


@query(
    "q_ml_kmeans",
    sql="""
    SELECT COUNT(*) AS n_points,
           CAST(2 AS BIGINT) AS n_clusters,
           TRUE AS pure
    FROM orders
    """,
    tags=("ml", "bqml", "kmeans"),
)
def q_ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML kmeans invariant twin (r6): two planted, well-separated
    clusters derived from orders (parity bit * 100 + small jitter in
    both features). Lloyd's must (a) keep every point, (b) use exactly
    2 clusters, and (c) separate the sides PERFECTLY — `pure` is TRUE
    only when each planted side maps to exactly one distinct centroid.
    The oracle is the closed form of those invariants; a collapsed or
    mixed clustering breaks `pure`/`n_clusters` and hash-mismatches.
    (Cluster IDs themselves depend on deterministic-but-arbitrary init
    order, so the twin checks the partition, not the labels — the
    recall-floor pattern used for the ANN queries.)"""
    from bigquery_etl_spark.operators import ml

    pts = load(spark, sf_dir, "orders").select(
        ((F.col("o_orderkey") % 2) * 100 + (F.col("o_custkey") % 7))
        .cast("double")
        .alias("a"),
        ((F.col("o_orderkey") % 2) * 100 + (F.col("o_orderkey") % 5))
        .cast("double")
        .alias("b"),
        (F.col("o_orderkey") % 2).alias("side"),
    )
    feats = pts.select("a", "b")
    model = ml.fit_kmeans(feats, ["a", "b"], k=2, n_iters=5)
    pred = ml.predict_kmeans(pts, model)
    return pred.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("centroid_id").alias("n_clusters"),
        (
            F.countDistinct(F.struct("side", "centroid_id")) == F.lit(2)
        ).alias("pure"),
    )


@query(
    "q_ml_logreg",
    sql="""
    SELECT (SELECT COUNT(*) FROM orders
            WHERE 2 * (o_orderkey % 19) - (o_custkey % 23) + 3 <> 0) AS n,
           TRUE AS acc_perfect, TRUE AS prec_perfect,
           TRUE AS rec_perfect, TRUE AS logloss_small
    """,
    tags=("ml", "bqml", "logistic_reg"),
    twin="invariant",
)
def q_ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML logistic_reg (r6 C48) through the FULL SQL surface:
    ``CREATE MODEL ... OPTIONS(model_type='logistic_reg')`` then
    ``ML.EVALUATE(MODEL ...)``. Training is IRLS — each Newton step is
    ONE distributed aggregate pass (codegen sigmoid with broadcast β
    literals; k² Hessian sums to the driver, never rows). Invariant
    twin (coefficients diverge under separation, so no exact oracle):
    the planted labels are linearly separable with integer margin ≥ 1,
    so a correct trainer must classify the training set PERFECTLY —
    accuracy/precision/recall 1.0 and log-loss < 0.1 — while any
    gradient/Hessian/sign bug breaks separation and hash-mismatches.
    Boundary points (margin exactly 0) are excluded: their label is
    ambiguous under any threshold convention."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    pts = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 19).cast("double").alias("x1"),
        (F.col("o_custkey") % 23).cast("double").alias("x2"),
    ).withColumn(
        "margin", F.lit(2.0) * F.col("x1") - F.col("x2") + F.lit(3.0)
    ).filter(F.col("margin") != 0).select(
        "x1", "x2", (F.col("margin") > 0).cast("int").alias("y")
    )
    pts.createOrReplaceTempView("logreg_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL logreg_m OPTIONS("
        "model_type='logistic_reg', input_label_cols=['y'], "
        "max_iterations=14) AS SELECT * FROM logreg_pts"
    )
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL logreg_m, TABLE logreg_pts)"
    )
    # no driver-side count probe (VERDICT r8 advisory): the single-row
    # count aggregate cross-joins into the returned plan instead
    n_df = pts.agg(F.count(F.lit(1)).alias("__n"))
    return n_df.crossJoin(ev).select(
        F.col("__n").cast("long").alias("n"),
        (F.col("accuracy") == 1.0).alias("acc_perfect"),
        (F.col("precision") == 1.0).alias("prec_perfect"),
        (F.col("recall") == 1.0).alias("rec_perfect"),
        (F.col("log_loss") < 0.1).alias("logloss_small"),
    )


@query(
    "q_ml_pca",
    sql="""
    SELECT CAST(2 AS BIGINT) AS n_components,
           1.0 AS cum_ratio_2,
           TRUE AS recon_ok
    """,
    tags=("ml", "bqml", "pca"),
    twin="invariant",
)
def q_ml_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML PCA (r7, VERDICT r6 item 6) through the FULL SQL surface:
    ``CREATE MODEL ... OPTIONS(model_type='pca',
    num_principal_components=2)`` then ``ML.PRINCIPAL_COMPONENT_INFO``
    + ``ML.PREDICT``. Training is the sufficient-statistics pattern
    (ml.py fit_pca): ONE aggregate pass collects d(d+3)/2+1 scalar
    sums, the driver eigensolves the d x d covariance. Invariant twin
    (eigenvectors live in an engine-float space): the 4 features are
    built as linear combinations of a PLANTED 2-dim latent factor, so
    the data is exactly rank 2 — a correct PCA must explain 100% of
    the variance with 2 components (ROUND 6) AND reconstruct every row
    from its 2 scores to ~machine precision. Any covariance/eigens/
    projection bug breaks one of the booleans and hash-mismatches."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    src = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 17).cast("double").alias("z1"),
        (F.col("o_custkey") % 13).cast("double").alias("z2"),
    ).select(
        F.col("z1").alias("x1"),
        F.col("z2").alias("x2"),
        (F.lit(2.0) * F.col("z1") - F.col("z2")).alias("x3"),
        (F.col("z1") + F.lit(3.0) * F.col("z2")).alias("x4"),
    )
    src.createOrReplaceTempView("pca_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL pca_m OPTIONS(model_type='pca', "
        "num_principal_components=2) AS SELECT * FROM pca_pts"
    )
    info = cat.sql(
        "SELECT * FROM ML.PRINCIPAL_COMPONENT_INFO(MODEL pca_m) "
        "WHERE principal_component_id = 2"
    ).collect()[0]
    model = cat.models["pca_m"]
    # reconstruction: mean + sum_r score_r * component_r, all codegen
    scored = cat.sql("SELECT * FROM ML.PREDICT(MODEL pca_m, TABLE pca_pts)")
    err = None
    for d, feat in enumerate(model["features"]):
        rec = F.lit(model["mean"][d])
        for r, comp in enumerate(model["components"], start=1):
            rec = rec + F.col(f"principal_component_{r}") * F.lit(comp[d])
        e = F.abs(rec - F.col(feat))
        err = e if err is None else F.greatest(err, e)
    # the reconstruction max-error check stays IN the returned plan
    # (VERDICT r8 advisory: no extra per-run scalar collect); info is
    # metadata-only (driver-held eigenvalues), not a data pass
    return scored.agg(F.max(err).alias("__e")).select(
        F.lit(2).cast("long").alias("n_components"),
        F.lit(
            round(info.cumulative_explained_variance_ratio, 6)
        ).alias("cum_ratio_2"),
        (F.col("__e") < 1e-6).alias("recon_ok"),
    )


@query(
    "q_ml_mf",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, TRUE AS rmse_ok
    FROM (SELECT DISTINCT o_custkey % 50 AS u, o_orderkey % 40 AS i
          FROM orders)
    """,
    tags=("ml", "bqml", "matrix_factorization"),
    twin="invariant",
)
def q_ml_mf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML matrix factorization (r7, VERDICT r6 item 6) through the
    FULL SQL surface: ``CREATE MODEL ... OPTIONS(
    model_type='matrix_factorization', user_col=..., item_col=...,
    rating_col=..., num_factors=2)`` then ``ML.EVALUATE``. Training is
    ALS where each half-step is a join + GROUPED f x f solve
    (applyInPandas per key — factors stay distributed DataFrames, the
    n_users x f matrix never collects; ml.py fit_matrix_factorization).
    Invariant twin (factor values live in an engine-float space): the
    planted ratings are EXACTLY rank 2 (r = a_u*b_i + c_u*d_i over
    integer grids), so ALS with 2 factors must fit them to RMSE < 0.05
    — any solver/join/init bug leaves residual structure and breaks
    the boolean. n_pairs pins the training-set construction exactly."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    ratings = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 50).cast("long").alias("u"),
        (F.col("o_orderkey") % 40).cast("long").alias("i"),
    ).distinct().select(
        "u",
        "i",
        (
            (F.lit(1.0) + F.col("u") % 5) * (F.lit(1.0) + F.col("i") % 4)
            + (F.col("u") % 3) * (F.col("i") % 2)
        ).cast("double").alias("r"),
    )
    ratings.createOrReplaceTempView("mf_ratings")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL mf_m OPTIONS("
        "model_type='matrix_factorization', user_col='u', item_col='i', "
        "rating_col='r', num_factors=2, max_iterations=6, l2_reg=0.001) "
        "AS SELECT * FROM mf_ratings"
    )
    ev = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL mf_m, TABLE mf_ratings)"
    )
    # count folded into the returned plan (VERDICT r8 advisory)
    return ratings.agg(F.count(F.lit(1)).alias("__n")).crossJoin(ev).select(
        F.col("__n").cast("long").alias("n_pairs"),
        (F.col("root_mean_squared_error") < 0.05).alias("rmse_ok"),
    )


@query(
    "q_ml_arima",
    sql="""
    SELECT sid, 14 AS n_fc, TRUE AS val_ok, TRUE AS ts_ok, TRUE AS iv_ok
    FROM (VALUES (0), (1), (2)) t(sid) ORDER BY sid
    """,
    tags=("ml", "bqml", "arima_plus"),
    twin="invariant",
)
def q_ml_arima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML ARIMA_PLUS (r8, VERDICT r7 item 2) through the FULL SQL
    surface: ``CREATE MODEL ... OPTIONS(model_type='ARIMA_PLUS',
    time_series_timestamp_col/data_col/id_col, horizon)`` then
    ``ML.FORECAST(MODEL m, STRUCT(14 AS horizon, 0.95 AS
    confidence_level))``. Fit = ONE applyInPandas over series ids
    (trend -> autocorrelation-detected seasonality -> AR residual,
    exact least squares, zero RNG; ml.py fit_arima_plus); the model is
    a per-series params DataFrame and ML.FORECAST touches ONLY it —
    O(n_series x horizon), never the raw rows.

    Invariant twin: three planted series y = a_s + b_s*t +
    seasonal_s(t mod 7) where the weekly pattern [1,-2,0,2,0,-2,1] is
    orthogonal to both the mean and the time index (sum s = 0 and
    sum k*s_k = 0), so the two-stage decomposition recovers the
    generator EXACTLY — every 14-step-ahead forecast must match the
    closed form to 1e-6 (val_ok), timestamps must continue the daily
    grid (ts_ok), and prediction intervals must bracket the value
    (iv_ok). Any detection/fit/recursion bug breaks the booleans."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    n_days, n_fc = 140, 14
    base = 1704067200  # 2024-01-01 UTC
    pat = [1.0, -2.0, 0.0, 2.0, 0.0, -2.0, 1.0]
    src = (
        spark.range(3 * n_days)
        .select(
            (F.col("id") % 3).cast("int").alias("sid"),
            (F.col("id") / 3).cast("long").alias("t"),
        )
        .select(
            "sid",
            F.timestamp_seconds(
                F.lit(base) + F.col("t") * 86400
            ).alias("ts"),
            (
                (10.0 + 5.0 * F.col("sid"))
                + (0.5 + 0.25 * F.col("sid")) * F.col("t")
                + (1.0 + F.col("sid"))
                * F.element_at(
                    F.array(*[F.lit(v) for v in pat]),
                    (F.col("t") % 7).cast("int") + 1,
                )
            ).alias("y"),
        )
    )
    src.createOrReplaceTempView("arima_src")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL arima_m OPTIONS("
        "model_type='ARIMA_PLUS', time_series_timestamp_col='ts', "
        "time_series_data_col='y', time_series_id_col='sid', "
        "horizon=14) AS SELECT * FROM arima_src"
    )
    fc = cat.sql(
        "SELECT * FROM ML.FORECAST(MODEL arima_m, "
        "STRUCT(14 AS horizon, 0.95 AS confidence_level))"
    )
    fc.createOrReplaceTempView("arima_fc")
    # closed-form expected values for the 14 future steps, per series
    expected = (
        spark.range(3 * n_fc)
        .select(
            (F.col("id") % 3).cast("int").alias("sid"),
            (F.lit(n_days) + F.col("id") / 3).cast("long").alias("t"),
        )
        .select(
            "sid",
            F.timestamp_seconds(
                F.lit(base) + F.col("t") * 86400
            ).alias("ts"),
            (
                (10.0 + 5.0 * F.col("sid"))
                + (0.5 + 0.25 * F.col("sid")) * F.col("t")
                + (1.0 + F.col("sid"))
                * F.element_at(
                    F.array(*[F.lit(v) for v in pat]),
                    (F.col("t") % 7).cast("int") + 1,
                )
            ).alias("y_true"),
        )
    )
    expected.createOrReplaceTempView("arima_exp")
    return spark.sql("""
        SELECT e.sid,
               CAST(COUNT(f.forecast_value) AS INT) AS n_fc,
               MAX(ABS(f.forecast_value - e.y_true)) < 1e-6 AS val_ok,
               CAST(COUNT(f.forecast_timestamp) AS INT)
                   = CAST(COUNT(*) AS INT) AS ts_ok,
               BOOL_AND(f.prediction_interval_lower_bound
                            <= f.forecast_value
                        AND f.forecast_value
                            <= f.prediction_interval_upper_bound
                        AND f.standard_error >= 0
                        AND f.confidence_level = 0.95) AS iv_ok
        FROM arima_exp e
        LEFT JOIN arima_fc f
          ON f.sid = CAST(e.sid AS STRING)
         AND f.forecast_timestamp = e.ts
        GROUP BY e.sid ORDER BY e.sid
    """)


@query(
    "q_ml_boosted",
    sql="""
    SELECT (SELECT COUNT(*) FROM orders) AS n,
           TRUE AS reg_r2_ok, TRUE AS reg_mae_ok, TRUE AS reg_top_gain_x1,
           TRUE AS cls_acc_perfect, TRUE AS cls_logloss_small
    """,
    tags=("ml", "bqml", "boosted_tree"),
    twin="invariant",
)
def q_ml_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML boosted trees (r9, VERDICT r8 gap #1) through the FULL SQL
    surface: ``CREATE MODEL ... OPTIONS(model_type=
    'boosted_tree_regressor'|'boosted_tree_classifier')`` then
    ``ML.EVALUATE`` + ``ML.FEATURE_IMPORTANCE``. Training is histogram
    GBDT (operators/ml.py fit_boosted_trees): ONE percentile_approx
    binning pass, then each tree level is ONE distributed aggregate —
    posexplode(bins) -> hash-agg SUM(g),SUM(h) per (node,feature,bin),
    map-side combined so the shuffle is histogram-sized regardless of
    row count; the driver sees only histograms, never rows. Invariant
    twin (tree structure lives in engine-float space): the regression
    target is EXACTLY an axis-aligned step function
    (10*[x1>9] + 5*[x2>11] - 3*[x3>5]), which a depth-3 ensemble must
    fit to r2 > 0.995 / MAE < 0.5, with x1 (the widest step) carrying
    the top importance gain; the classifier labels are an axis-aligned
    box (x1 > 8 AND x2 <= 15), which boosting must separate PERFECTLY
    (accuracy 1.0, log-loss < 0.1). Any histogram/gain/leaf-weight bug
    breaks a boolean and hash-mismatches. Reference surface: delegated
    BQML (main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    pts = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 19).cast("double").alias("x1"),
        (F.col("o_custkey") % 23).cast("double").alias("x2"),
        (F.col("o_orderkey") % 11).cast("double").alias("x3"),
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
    pts.createOrReplaceTempView("bt_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL bt_reg OPTIONS("
        "model_type='boosted_tree_regressor', input_label_cols=['y'], "
        "max_iterations=12, max_tree_depth=3, learn_rate=0.5) "
        "AS SELECT x1, x2, x3, y FROM bt_pts"
    )
    cat.sql(
        "CREATE OR REPLACE MODEL bt_cls OPTIONS("
        "model_type='boosted_tree_classifier', input_label_cols=['lbl'], "
        "max_iterations=12, max_tree_depth=3, learn_rate=0.5) "
        "AS SELECT x1, x2, lbl FROM bt_pts"
    )
    ev_r = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL bt_reg, "
        "(SELECT x1, x2, x3, y FROM bt_pts))"
    )
    ev_c = cat.sql(
        "SELECT * FROM ML.EVALUATE(MODEL bt_cls, "
        "(SELECT x1, x2, lbl FROM bt_pts))"
    )
    top = cat.sql(
        "SELECT feature FROM ML.FEATURE_IMPORTANCE(MODEL bt_reg) "
        "ORDER BY importance_gain DESC LIMIT 1"
    )
    # one returned plan, no driver-side scalar collects: the three
    # single-row inputs cross-join into the final booleans
    n_df = pts.agg(F.count(F.lit(1)).alias("n"))
    return (
        n_df.crossJoin(ev_r)
        .crossJoin(
            ev_c.select(
                F.col("accuracy").alias("__acc"),
                F.col("log_loss").alias("__ll"),
            )
        )
        .crossJoin(top)
        .select(
            F.col("n").cast("long").alias("n"),
            (F.col("r2_score") > 0.995).alias("reg_r2_ok"),
            (F.col("mean_absolute_error") < 0.5).alias("reg_mae_ok"),
            (F.col("feature") == "x1").alias("reg_top_gain_x1"),
            (F.col("__acc") == 1.0).alias("cls_acc_perfect"),
            (F.col("__ll") < 0.1).alias("cls_logloss_small"),
        )
    )
