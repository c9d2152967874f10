"""BQML declared queries (r6 — the BigQuery ML surface the reference
delegates to its engine; ref main.py:21,160-185 hands all analytics to
BigQuery and BQML is part of that surface). operators/ml.py holds the
execution model: linear_reg = exact normal equations in ONE distributed
aggregate pass; kmeans = euclidean Lloyd's as DataFrame aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    return spark.createDataFrame(rows, "term string, w double").orderBy("term")


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
    return spark.createDataFrame(rows, "term string, w double").orderBy("term")


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
    n = cat.sql("SELECT COUNT(*) AS n FROM logreg_pts").collect()[0].n
    return ev.select(
        F.lit(n).cast("long").alias("n"),
        (F.col("accuracy") == 1.0).alias("acc_perfect"),
        (F.col("precision") == 1.0).alias("prec_perfect"),
        (F.col("recall") == 1.0).alias("rec_perfect"),
        (F.col("log_loss") < 0.1).alias("logloss_small"),
    )
