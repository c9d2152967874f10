"""In-warehouse ML (r6) — the BigQuery ML surface the reference's
delegated engine ships as a flagship feature (``CREATE MODEL`` /
``ML.PREDICT`` / ``ML.EVALUATE``; the reference hands all analytics to
BigQuery, ref main.py:21,160-185, and BQML is part of that surface).

Spark-first execution model:

- **linear_reg** trains by the closed-form normal equations: the
  Gram matrix ``X'X`` and moment vector ``X'y`` are (k+1)(k+2)/2 + 1
  SUM aggregates computed in ONE distributed pass (map-side partial
  aggregation, whole-stage codegen — no Python in the scan), then the
  tiny (k+1)x(k+1) solve happens on the driver with numpy. At 100 TB
  the data pass is the cost and it is a single scan with a
  scalar-aggregate reduce; the driver never sees rows, only the k²
  sums. This is exact least squares — not SGD — so results are
  deterministic and oracle-checkable.
- **PREDICT** broadcasts the coefficient vector as literals into a
  codegen projection (one fused map stage, zero shuffles).
- **EVALUATE** is one more scalar-aggregate pass (r2 / rmse / mae).
- **kmeans** reuses the IVF Lloyd trainer (operators/similarity.py):
  per iteration one assign+groupBy pass; k x dim floats to the driver.

Models are plain dicts (feature names, coefficients, stats) and
persist as JSON next to the catalog warehouse — metadata, not data.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def fit_linear_reg(
    df: DataFrame,
    features: list[str],
    label: str,
    l2: float = 0.0,
) -> dict:
    """Exact least squares via normal equations in ONE aggregate pass.

    Builds SUM(xi*xj) for the upper triangle of the augmented design
    (intercept column folded in as a constant-1 feature) plus
    SUM(xi*y) and SUM(y*y), solves (X'X + l2*I) b = X'y on the driver.
    Numerical note: sums accumulate as doubles; for ill-conditioned
    inputs callers should standardize features first (BQML does the
    same internally).
    """
    import numpy as np

    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in features]
    k = len(cols)
    y = F.col(label).cast("double")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"__g_{i}_{j}"))
        aggs.append(F.sum(cols[i] * y).alias(f"__m_{i}"))
    aggs.append(F.sum(y * y).alias("__yy"))
    aggs.append(F.sum(y).alias("__sy"))
    row = df.agg(*aggs).collect()[0]

    g = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            g[i, j] = g[j, i] = row[f"__g_{i}_{j}"]
    m = np.array([row[f"__m_{i}"] for i in range(k)])
    if l2:
        g = g + l2 * np.eye(k)
        g[0, 0] -= l2  # never regularize the intercept
    beta = np.linalg.solve(g, m)
    n = row["__n"]
    mean_y = row["__sy"] / n
    # residual sum of squares from the same sufficient statistics:
    # ||y - Xb||^2 = y'y - 2 b'X'y + b'X'Xb  (no second data pass)
    rss = float(row["__yy"] - 2 * beta @ m + beta @ g @ beta)
    if l2:  # g was ridge-shifted; recompute with the raw gram
        g0 = g - l2 * np.eye(k)
        g0[0, 0] += l2
        rss = float(row["__yy"] - 2 * beta @ m + beta @ g0 @ beta)
    tss = float(row["__yy"] - n * mean_y * mean_y)
    return {
        "model_type": "linear_reg",
        "features": list(features),
        "label": label,
        "intercept": float(beta[0]),
        "coefficients": [float(b) for b in beta[1:]],
        "n": int(n),
        "rss": rss,
        "tss": tss,
        "r2": 1.0 - rss / tss if tss > 0 else float("nan"),
        # normal equations converge in one "iteration" — the final MSE
        # comes from the same sufficient statistics, no extra pass
        "training_info": [{"iteration": 0, "loss": rss / n}],
    }


def predict_linear_reg(
    df: DataFrame, model: dict, out: str = "predicted_label"
) -> DataFrame:
    """Broadcast-coefficients projection: one codegen map stage.
    Categorical features expand to their fit-time dummy columns first
    (r10) and the dummies are stripped from the output — the caller
    sees their own columns plus the prediction."""
    raw_cols = list(df.columns)
    if model.get("categorical"):
        df = with_dummies(df, model["categorical"])
    expr = F.lit(model["intercept"])
    for c, b in zip(model["features"], model["coefficients"]):
        expr = expr + F.col(c).cast("double") * F.lit(b)
    return df.withColumn(out, expr).select(*raw_cols, out)


def evaluate_linear_reg(df: DataFrame, model: dict) -> DataFrame:
    """BQML ML.EVALUATE shape: one scalar-aggregate pass over the
    eval set (mae, mse, r2)."""
    pred = predict_linear_reg(df, model, out="__p")
    err = F.col("__p") - F.col(model["label"]).cast("double")
    y = F.col(model["label"]).cast("double")
    # r2 from sufficient statistics so the whole evaluation is ONE
    # scalar-aggregate pass: tss = sum(y^2) - n * mean(y)^2
    return pred.agg(
        F.avg(F.abs(err)).alias("mean_absolute_error"),
        F.avg(err * err).alias("mean_squared_error"),
        (
            F.lit(1.0)
            - F.sum(err * err)
            / (F.sum(y * y) - F.count(F.lit(1)) * F.pow(F.avg(y), F.lit(2)))
        ).alias("r2_score"),
    )


def fit_logistic_reg(
    df: DataFrame,
    features: list[str],
    label: str,
    l2: float = 1e-6,
    n_iters: int = 12,
    tol: float = 1e-9,
) -> dict:
    """BQML ``model_type='logistic_reg'`` by IRLS / Newton-Raphson.

    Each iteration is ONE distributed aggregate pass: the current β is
    broadcast as literals into a codegen sigmoid, and the pass sums the
    Hessian upper triangle ``w·xi·xj`` (w = p(1-p)) plus the gradient
    ``(y-p)·xi`` — (k+1)(k+2)/2 + (k+1) doubles to the driver, never
    rows. The k×k Newton solve is numpy on the driver. That is the
    100 TB shape: iterations × one scan, map-side partial aggregation,
    no Python in the executor path. A small always-on ridge keeps the
    solve finite under perfect separation (BQML likewise defaults
    l2_reg > 0). Deterministic — no SGD, no seeds."""
    import numpy as np

    feats = [F.lit(1.0)] + [F.col(c).cast("double") for c in features]
    k = len(feats)
    y = F.col(label).cast("double")
    beta = np.zeros(k)
    losses: list[float] = []
    for _ in range(n_iters):
        eta = F.lit(float(beta[0]))
        for i in range(1, k):
            eta = eta + feats[i] * F.lit(float(beta[i]))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        aggs: list[Column] = []
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum(w * feats[i] * feats[j]).alias(f"__h_{i}_{j}")
                )
            aggs.append(F.sum((y - p) * feats[i]).alias(f"__g_{i}"))
        # ML.TRAINING_INFO (r10): the mean clipped log-loss at the
        # CURRENT beta rides the same aggregate pass for free
        eps = F.lit(1e-15)
        pc = F.greatest(F.least(p, F.lit(1.0) - eps), eps)
        aggs.append(
            (-F.avg(y * F.log(pc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pc))
             ).alias("__loss")
        )
        row = df.agg(*aggs).collect()[0]
        losses.append(float(row["__loss"]))
        hess = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                hess[i, j] = hess[j, i] = row[f"__h_{i}_{j}"]
        grad = np.array([row[f"__g_{i}"] for i in range(k)])
        reg = np.full(k, l2)
        reg[0] = 0.0  # never regularize the intercept
        grad = grad - reg * beta
        hess = hess + np.diag(reg + 1e-12)
        step = np.linalg.solve(hess, grad)
        beta = beta + step
        if float(np.max(np.abs(step))) < tol:
            break
    # losses[i] is the loss at the beta AFTER i Newton steps, so the
    # list is the full descent trajectory INCLUDING the initial
    # beta=0 loss (ln 2) as iteration 0 — one index off BigQuery's
    # "loss after iteration i" ladder, documented divergence that
    # preserves the information (strictly decreasing on convergence)
    return {
        "model_type": "logistic_reg",
        "features": list(features),
        "label": label,
        "intercept": float(beta[0]),
        "coefficients": [float(b) for b in beta[1:]],
        "training_info": [
            {"iteration": i, "loss": ls} for i, ls in enumerate(losses)
        ],
    }


def predict_logistic_reg(
    df: DataFrame,
    model: dict,
    out: str = "predicted_label",
    prob_out: str = "predicted_label_prob",
) -> DataFrame:
    """Broadcast-coefficients sigmoid: one codegen map stage, emitting
    BQML's (predicted_label, probability) pair."""
    raw_cols = list(df.columns)
    if model.get("categorical"):
        df = with_dummies(df, model["categorical"])
    eta = F.lit(model["intercept"])
    for c, b in zip(model["features"], model["coefficients"]):
        eta = eta + F.col(c).cast("double") * F.lit(b)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    return df.withColumn(prob_out, p).withColumn(
        out, (F.col(prob_out) >= 0.5).cast("int")
    ).select(*raw_cols, prob_out, out)


def evaluate_logistic_reg(df: DataFrame, model: dict) -> DataFrame:
    """ML.EVALUATE for a classifier: ONE scalar-aggregate pass —
    accuracy, precision, recall, f1, clipped log-loss."""
    scored = predict_logistic_reg(df, model, out="__yhat", prob_out="__p")
    yv = F.col(model["label"]).cast("int")
    tp = F.sum(((F.col("__yhat") == 1) & (yv == 1)).cast("long"))
    fp = F.sum(((F.col("__yhat") == 1) & (yv == 0)).cast("long"))
    fn = F.sum(((F.col("__yhat") == 0) & (yv == 1)).cast("long"))
    eps = F.lit(1e-15)
    pc = F.greatest(F.least(F.col("__p"), F.lit(1.0) - eps), eps)
    ll = -F.avg(
        yv.cast("double") * F.log(pc)
        + (F.lit(1.0) - yv.cast("double")) * F.log(F.lit(1.0) - pc)
    )
    agg = scored.agg(
        F.avg((F.col("__yhat") == yv).cast("double")).alias("accuracy"),
        tp.alias("__tp"),
        fp.alias("__fp"),
        fn.alias("__fn"),
        ll.alias("log_loss"),
    )
    prec = F.col("__tp") / F.greatest(F.col("__tp") + F.col("__fp"), F.lit(1))
    rec = F.col("__tp") / F.greatest(F.col("__tp") + F.col("__fn"), F.lit(1))
    return agg.select(
        "accuracy",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-300))).alias(
            "f1_score"
        ),
        "log_loss",
    )


def _argmin_dist(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid in EUCLIDEAN distance (int).
    argmin ||x-c||^2 == argmax (x . c - ||c||^2 / 2), so the expression
    reuses the linear-in-k array-ops shape of similarity._argmax_centroid
    (a chained-when formulation is 2^k plan nodes — see that docstring)."""
    from bigquery_etl_spark.operators.similarity import dot

    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    half_sq = F.array(
        *[F.lit(sum(x * x for x in c) / 2.0) for c in centroids]
    )
    scores = F.zip_with(
        F.transform(cent_arr, lambda c: dot(vec, c)),
        half_sq,
        lambda d, h: d - h,
    )
    pairs = F.zip_with(
        scores,
        F.expr(f"sequence(0, {len(centroids) - 1})"),
        lambda s, i: F.struct((-s).alias("neg"), i.alias("idx")),
    )
    return F.array_min(pairs)["idx"].cast("int")


def fit_kmeans(
    df: DataFrame,
    features: list[str],
    k: int,
    n_iters: int = 8,
) -> dict:
    """BQML kmeans: standard EUCLIDEAN Lloyd's iterations as DataFrame
    aggregations (the spherical variant in similarity.py is the right
    quantizer for cosine ANN, but BQML clusters tabular features by
    euclidean distance, so this trains its own way). Per iteration: one
    assign pass (broadcast centroid literals, codegen argmin) + one
    posexplode/groupBy mean; only k x dim floats reach the driver — the
    data never does, at any corpus size. Init: k rows with the lowest
    hash of the feature vector (deterministic, seedless, and not
    order-dependent)."""
    vec = F.array(*[F.col(c).cast("double") for c in features])
    src = df.select(vec.alias("__v")).persist()
    try:
        cents = [
            list(r["__v"])
            for r in src.orderBy(
                F.xxhash64(F.to_json(F.struct(F.col("__v"))))
            ).limit(k).collect()
        ]
        for _ in range(n_iters):
            assigned = src.select(
                "__v", _argmin_dist(F.col("__v"), cents).alias("__c")
            )
            stats = (
                assigned.select(
                    "__c", F.posexplode("__v").alias("__d", "__x")
                )
                .groupBy("__c", "__d")
                .agg(F.avg("__x").alias("__m"))
                .collect()
            )
            by_c: dict[int, dict[int, float]] = {}
            for r in stats:
                by_c.setdefault(r["__c"], {})[r["__d"]] = r["__m"]
            cents = [
                [by_c[c][d] for d in range(len(cents[0]))]
                if c in by_c
                else cents[c]
                for c in range(k)
            ]
        # training distance distribution for ML.DETECT_ANOMALIES
        # (r10): one extra percentile pass while src is still cached
        grid = _dist_quantile_grid(
            src, _nearest_centroid_dist(F.col("__v"), cents)
        )
    finally:
        src.unpersist()
    return {
        "model_type": "kmeans",
        "features": list(features),
        "k": k,
        "centroids": cents,
        "dist_quantiles": grid,
    }


def predict_kmeans(
    df: DataFrame, model: dict, out: str = "centroid_id"
) -> DataFrame:
    vec = F.array(*[F.col(c).cast("double") for c in model["features"]])
    return df.withColumn(out, _argmin_dist(vec, model["centroids"]))


def evaluate_kmeans(df: DataFrame, model: dict) -> DataFrame:
    """``ML.EVALUATE(MODEL kmeans, t)`` — BigQuery's two clustering
    metrics: mean_squared_distance (mean squared Euclidean distance to
    the assigned centroid) and davies_bouldin_index (DB = (1/k)·Σᵢ
    maxⱼ≠ᵢ (Sᵢ+Sⱼ)/Mᵢⱼ with Sᵢ = mean point→centroidᵢ distance and
    Mᵢⱼ = centroid separation — the public closed form). ONE
    distributed aggregate pass (assign + per-cluster mean distances,
    k rows to the driver); the k×k combination is driver-side
    arithmetic on the tiny result. ref: BigQuery ML.EVALUATE for
    kmeans (delegated surface, main.py:21,49-50)."""
    import math

    cents = model["centroids"]
    vec = F.array(*[F.col(c).cast("double") for c in model["features"]])
    assigned = df.withColumn("__cid", _argmin_dist(vec, cents))
    d2 = F.lit(0.0)
    for i, c in enumerate(cents):
        dist2 = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        d2 = F.when(F.col("__cid") == i, dist2).otherwise(d2)
    per = (
        assigned.groupBy("__cid")
        .agg(
            F.avg(F.sqrt(d2)).alias("__s"),
            F.avg(d2).alias("__ms"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    s = {r["__cid"]: r["__s"] for r in per}
    n = {r["__cid"]: r["__n"] for r in per}
    total = sum(n.values())
    msd = sum(r["__ms"] * r["__n"] for r in per) / total
    k = len(cents)
    sep = {}
    for i in range(k):
        for j in range(i + 1, k):
            sep[(i, j)] = math.sqrt(
                sum((a - b) ** 2 for a, b in zip(cents[i], cents[j]))
            )
    ratios = []
    for i in range(k):
        if i not in s:
            continue  # empty cluster contributes nothing
        best = 0.0
        for j in range(k):
            if j == i or j not in s:
                continue
            m = sep[(min(i, j), max(i, j))]
            if m > 0:
                best = max(best, (s[i] + s[j]) / m)
        ratios.append(best)
    db = sum(ratios) / len(ratios) if ratios else 0.0
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(db), float(msd))],
        "davies_bouldin_index double, mean_squared_distance double",
    )


# -- PCA (r7, VERDICT r6 item 6) ----------------------------------------------


def fit_pca(
    df: DataFrame, features: list[str], n_components: int
) -> dict:
    """``model_type='pca'`` by the sufficient-statistics pattern
    (fit_linear_reg's): ONE distributed aggregate pass computes count,
    per-feature sums and the upper triangle of the cross-moment matrix
    (d(d+1)/2 + d + 1 scalar SUMs, map-side combined, codegen); the
    driver assembles the d×d covariance and eigensolves it with numpy.
    At 100 TB the cost is one scan — the driver sees d² numbers, never
    rows. Components are deterministic: eigenvectors sorted by
    eigenvalue descending, sign-canonicalized so each component's
    largest-|loading| entry is positive (eigenvector sign is otherwise
    arbitrary, which would break oracle hashing)."""
    import numpy as np

    d = len(features)
    if not 1 <= n_components <= d:
        raise ValueError(
            f"num_principal_components must be in [1, {d}], got {n_components}"
        )
    cols = [F.col(c).cast("double") for c in features]
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [F.sum(cols[i]).alias(f"__s_{i}") for i in range(d)]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"__c_{i}_{j}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean = np.array([row[f"__s_{i}"] / n for i in range(d)])
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            # E[xy] - E[x]E[y], unbiased (n-1) denominator like BQML
            cij = (row[f"__c_{i}_{j}"] - n * mean[i] * mean[j]) / (n - 1)
            cov[i, j] = cov[j, i] = cij
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T  # (d components) x (d features)
    for r in range(d):
        k = int(np.argmax(np.abs(comps[r])))
        if comps[r, k] < 0:
            comps[r] = -comps[r]
    total = float(evals.sum()) or 1.0
    model = {
        "model_type": "pca",
        "features": list(features),
        "n_components": int(n_components),
        "mean": [float(v) for v in mean],
        "components": [
            [float(v) for v in comps[r]] for r in range(n_components)
        ],
        "explained_variance": [float(v) for v in evals[:n_components]],
        "explained_variance_ratio": [
            float(v / total) for v in evals[:n_components]
        ],
        "n": int(n),
    }
    # training reconstruction-error distribution for
    # ML.DETECT_ANOMALIES (r10): one extra percentile pass
    model["dist_quantiles"] = _dist_quantile_grid(
        df, _pca_recon_error(model)
    )
    return model


def predict_pca(df: DataFrame, model: dict) -> DataFrame:
    """Project onto the principal components — coefficients broadcast
    as literals into one codegen projection (BQML output naming:
    ``principal_component_<i>``)."""
    centered = [
        (F.col(c).cast("double") - F.lit(m))
        for c, m in zip(model["features"], model["mean"])
    ]
    out = df
    for r, comp in enumerate(model["components"], start=1):
        expr = None
        for x, w in zip(centered, comp):
            term = x * F.lit(w)
            expr = term if expr is None else expr + term
        out = out.withColumn(f"principal_component_{r}", expr)
    return out


# -- matrix factorization (r7, VERDICT r6 item 6) ------------------------------


def _solve_side(
    ratings: DataFrame,
    other_factors: DataFrame,
    group_col: str,
    other_col: str,
    rating_col: str,
    f: int,
    l2: float,
) -> DataFrame:
    """One ALS half-step as a GROUPED SOLVE: join each rating with the
    fixed side's factor vector, group by the side being solved, and
    solve that group's f×f ridge normal equations in an Arrow-batched
    applyInPandas (each group sees only ITS ratings — the classic
    distributed-ALS layout: work is sharded by key, the dense factor
    matrix never materializes on one node; the fixed side arrives via
    an equi-join Spark broadcasts when small)."""
    import numpy as np
    import pandas as pd

    joined = ratings.join(
        other_factors.withColumnRenamed("id", other_col).withColumnRenamed(
            "factors", "__of"
        ),
        on=other_col,
    ).select(
        F.col(group_col).alias("id"),
        F.col("__of"),
        F.col(rating_col).cast("double").alias("__r"),
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack(pdf["__of"].to_numpy())
        y = pdf["__r"].to_numpy()
        w = np.linalg.solve(X.T @ X + l2 * len(y) * np.eye(f), X.T @ y)
        return pd.DataFrame(
            {"id": [pdf["id"].iloc[0]], "factors": [w.tolist()]}
        )

    return joined.groupBy("id").applyInPandas(
        solve, schema="id long, factors array<double>"
    )


def fit_matrix_factorization(
    df: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    num_factors: int = 8,
    n_iters: int = 8,
    l2: float = 0.05,
) -> dict:
    """``model_type='matrix_factorization'`` (explicit feedback) by
    alternating least squares: item factors init deterministically
    from a hash of the item id (seeded, reproducible), then each
    half-step re-solves one side with the other fixed — a join + one
    grouped f×f solve per key (``_solve_side``). Factors stay
    DISTRIBUTED DataFrames end to end (n_users × f never collects:
    the 100 TB shape); they persist as parquet next to the model JSON.
    Checkpointed via localCheckpoint each round so the lineage doesn't
    double per iteration."""
    ratings = df.select(
        F.col(user_col).cast("long").alias(user_col),
        F.col(item_col).cast("long").alias(item_col),
        F.col(rating_col).cast("double").alias(rating_col),
    ).cache()
    f = num_factors
    # deterministic pseudo-random init in [0.1, 1.1): codegen, no UDF
    items = ratings.select(F.col(item_col).alias("id")).distinct().select(
        "id",
        F.array(
            *[
                (F.abs(F.hash(F.col("id") + F.lit(97 * j))) % 1000)
                / 1000.0
                * 1.0
                + 0.1
                for j in range(f)
            ]
        ).alias("factors"),
    )
    users = None
    for _ in range(n_iters):
        users = _solve_side(
            ratings, items, user_col, item_col, rating_col, f, l2
        ).localCheckpoint(eager=False)
        items = _solve_side(
            ratings, users, item_col, user_col, rating_col, f, l2
        ).localCheckpoint(eager=False)
    model = {
        "model_type": "matrix_factorization",
        "user_col": user_col,
        "item_col": item_col,
        "rating_col": rating_col,
        "num_factors": f,
        "user_factors": users,
        "item_factors": items,
    }
    model["rmse"] = evaluate_matrix_factorization(ratings, model)
    ratings.unpersist()
    return model


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def predict_matrix_factorization(df: DataFrame, model: dict) -> DataFrame:
    """(user, item) rows -> ``predicted_<rating_col>`` via two factor
    joins and a codegen dot product (BQML ML.PREDICT naming). Pairs
    with no trained factor predict NULL (cold start — BigQuery
    errors; NULL keeps the operator total)."""
    u, i, r = model["user_col"], model["item_col"], model["rating_col"]
    uf = model["user_factors"].withColumnRenamed("id", u).withColumnRenamed(
        "factors", "__uf"
    )
    itf = model["item_factors"].withColumnRenamed("id", i).withColumnRenamed(
        "factors", "__if"
    )
    return (
        df.join(uf, on=u, how="left")
        .join(itf, on=i, how="left")
        .withColumn(f"predicted_{r}", _dot(F.col("__uf"), F.col("__if")))
        .drop("__uf", "__if")
    )


def evaluate_matrix_factorization(df: DataFrame, model: dict) -> float:
    r = model["rating_col"]
    scored = predict_matrix_factorization(df, model)
    row = scored.agg(
        F.sqrt(
            F.avg(
                F.pow(F.col(f"predicted_{r}") - F.col(r).cast("double"), 2)
            )
        ).alias("rmse")
    ).collect()[0]
    return float(row["rmse"]) if row["rmse"] is not None else float("nan")


# -- model store --------------------------------------------------------------


# -- ARIMA_PLUS (r8, VERDICT r7 item 2) ---------------------------------------
#
# BigQuery's time-series model (the most-used BQML model after
# linear/logistic). Spark-first layout: the fit is ONE applyInPandas
# over series ids — each series' decomposition (linear trend →
# autocorrelation-detected seasonality → AR(p) residual, all exact
# least squares, zero RNG) runs Arrow-batched where that series'
# rows live, and the MODEL is a per-series parameter DataFrame
# (n_series rows), never a driver-side collect. ML.FORECAST is a
# second applyInPandas over the PARAMS only — O(n_series × horizon),
# independent of the training data size: the 100 TB story is that raw
# rows are touched exactly once, at fit time.

_ARIMA_PARAMS_SCHEMA = (
    "id string, n long, freq_us long, last_ts_us long, "
    "trend_a double, trend_b double, period int, "
    "seasonal array<double>, phi array<double>, tail array<double>, "
    "se double"
)


def _fit_one_series(ts_us, y, max_ar: int):
    """Deterministic trend + seasonality + AR(p) decomposition of one
    series (numpy least squares throughout; no randomness)."""
    import numpy as np

    order = np.argsort(ts_us, kind="mergesort")
    ts_us, y = ts_us[order], y[order].astype(float)
    n = len(y)
    freq = int(np.median(np.diff(ts_us))) if n > 1 else 1
    t = np.arange(n, dtype=float)
    # linear trend by exact least squares
    if n > 1:
        b, a = np.polyfit(t, y, 1)
    else:
        a, b = float(y[0]), 0.0
    resid = y - (a + b * t)
    # seasonality: smallest lag whose autocorrelation is within 10% of
    # the best (multiples of the true period score ~equally; smallest
    # wins so a planted weekly cycle detects as 7, not 14)
    period, seasonal = 1, [0.0]
    max_lag = min(n // 2, 366)
    if max_lag >= 2 and np.std(resid) > 1e-12:
        var = float(np.dot(resid, resid))
        acs = {}
        for lag in range(2, max_lag + 1):
            acs[lag] = float(np.dot(resid[:-lag], resid[lag:])) / var
        best = max(acs.values())
        if best > 0.3:
            period = min(
                lag for lag, ac in acs.items() if ac >= 0.9 * best
            )
            seasonal = [
                float(np.mean(resid[k::period])) for k in range(period)
            ]
    s = np.array(seasonal, dtype=float)[np.arange(n) % period]
    resid2 = resid - s
    # AR(p) on the deseasonalized residual, exact least squares
    p = min(max_ar, n // 10)
    phi: list[float] = []
    if p >= 1 and np.std(resid2) > 1e-9:
        X = np.column_stack(
            [resid2[p - 1 - j : n - 1 - j] for j in range(p)]
        )
        yy = resid2[p:]
        try:
            phi = np.linalg.lstsq(X, yy, rcond=None)[0].tolist()
        except np.linalg.LinAlgError:
            phi = []
    if phi:
        pred = np.column_stack(
            [resid2[p - 1 - j : n - 1 - j] for j in range(len(phi))]
        ) @ np.array(phi)
        errs = resid2[p:] - pred
    else:
        errs = resid2
    se = float(np.std(errs)) if len(errs) else 0.0
    tail = resid2[-len(phi):].tolist() if phi else []
    return {
        "n": n,
        "freq_us": freq,
        "last_ts_us": int(ts_us[-1]),
        "trend_a": float(a),
        "trend_b": float(b),
        "period": int(period),
        "seasonal": [float(v) for v in seasonal],
        "phi": phi,
        "tail": tail,
        "se": se,
    }


def fit_arima_plus(
    df: DataFrame,
    ts_col: str,
    y_col: str,
    id_col: str | None = None,
    max_ar_order: int = 5,
    horizon: int = 1000,
) -> dict:
    """``model_type='ARIMA_PLUS'``: one grouped Arrow pass fits every
    series where its rows live; the returned params DataFrame is the
    model (persisted as parquet next to the model JSON, like C54's
    factor matrices)."""
    import pandas as pd

    sel = [
        (F.col(id_col).cast("string") if id_col else F.lit("__single__"))
        .alias("__id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts"),
        F.col(y_col).cast("double").alias("__y"),
    ]
    src = df.select(*sel).where(
        F.col("__ts").isNotNull() & F.col("__y").isNotNull()
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        prm = _fit_one_series(
            pdf["__ts"].to_numpy(), pdf["__y"].to_numpy(), max_ar_order
        )
        prm["id"] = pdf["__id"].iloc[0]
        return pd.DataFrame([prm])

    params = (
        src.groupBy("__id")
        .applyInPandas(fit, schema=_ARIMA_PARAMS_SCHEMA)
        .localCheckpoint(eager=True)
    )
    return {
        "model_type": "arima_plus",
        "ts_col": ts_col,
        "y_col": y_col,
        "id_col": id_col,
        "horizon": horizon,
        "params": params,
        "n_series": params.count(),
    }


def _norm_ppf(p: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — public-domain constants)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    import math

    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                 * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
            * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def forecast_arima_plus(
    spark: SparkSession,
    model: dict,
    horizon: int | None = None,
    confidence_level: float = 0.95,
    explain: bool = False,
) -> DataFrame:
    """``ML.FORECAST`` (and ``ML.EXPLAIN_FORECAST`` with
    ``explain=True``, which adds the per-step trend / seasonal /
    AR-residual decomposition columns): applyInPandas over the PARAMS
    DataFrame only — each series rolls its AR recursion ``horizon``
    steps (psi-weight variance accumulation widens the intervals with
    lead time, the standard ARMA forecast-variance recursion)."""
    import numpy as np
    import pandas as pd

    h = int(horizon if horizon is not None else model.get("horizon", 1000))
    z = _norm_ppf((1.0 + confidence_level) / 2.0)
    id_col = model.get("id_col")

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples(index=False):
            phi = np.array(
                [] if r.phi is None else list(r.phi), dtype=float
            )
            p = len(phi)
            hist = [] if r.tail is None else list(r.tail)
            seasonal = list(r.seasonal) if (
                r.seasonal is not None and len(r.seasonal)
            ) else [0.0]
            period = max(int(r.period), 1)
            # psi weights: cumulative one-step variance multipliers
            psi = [1.0]
            for j in range(1, h):
                psi.append(
                    float(
                        sum(
                            phi[k] * psi[j - 1 - k]
                            for k in range(min(p, j))
                        )
                    )
                )
            cumvar = np.cumsum(np.square(psi))
            for step in range(1, h + 1):
                ar = (
                    float(
                        sum(
                            phi[k] * hist[-1 - k]
                            for k in range(min(p, len(hist)))
                        )
                    )
                    if p
                    else 0.0
                )
                hist.append(ar)
                t = r.n - 1 + step
                val = (
                    r.trend_a
                    + r.trend_b * t
                    + seasonal[t % period]
                    + ar
                )
                se_h = r.se * float(np.sqrt(cumvar[step - 1]))
                rec = (
                    r.id,
                    (r.last_ts_us + step * r.freq_us),
                    val,
                    se_h,
                    confidence_level,
                    val - z * se_h,
                    val + z * se_h,
                    val - z * se_h,
                    val + z * se_h,
                )
                if explain:
                    rec += (
                        r.trend_a + r.trend_b * t,
                        seasonal[t % period],
                        ar,
                    )
                rows.append(rec)
        cols = [
            "__id", "__ts_us", "forecast_value", "standard_error",
            "confidence_level", "prediction_interval_lower_bound",
            "prediction_interval_upper_bound",
            "confidence_interval_lower_bound",
            "confidence_interval_upper_bound",
        ]
        if explain:
            cols += ["trend", "seasonal_period_component", "ar_component"]
        return pd.DataFrame(rows, columns=cols)

    out_schema = (
        "__id string, __ts_us long, forecast_value double, "
        "standard_error double, confidence_level double, "
        "prediction_interval_lower_bound double, "
        "prediction_interval_upper_bound double, "
        "confidence_interval_lower_bound double, "
        "confidence_interval_upper_bound double"
    )
    if explain:
        out_schema += (
            ", trend double, seasonal_period_component double, "
            "ar_component double"
        )
    out = model["params"].groupBy("id").applyInPandas(roll, out_schema)
    cols = [
        F.timestamp_micros(F.col("__ts_us")).alias("forecast_timestamp"),
        "forecast_value", "standard_error", "confidence_level",
        "prediction_interval_lower_bound",
        "prediction_interval_upper_bound",
        "confidence_interval_lower_bound",
        "confidence_interval_upper_bound",
    ]
    if explain:
        cols += ["trend", "seasonal_period_component", "ar_component"]
    if id_col:
        cols.insert(0, F.col("__id").alias(id_col))
    return out.select(*cols)


def arima_evaluate(model: dict) -> DataFrame:
    """``ML.ARIMA_EVALUATE``: per-series fit diagnostics projected
    straight off the params DataFrame — whole-stage codegen, no
    Python, no touch of the training data. log-likelihood/AIC use the
    gaussian closed form over the residual variance (k = AR order +
    trend terms + seasonal dof); BigQuery's auto.ARIMA search fields
    (has_spikes_and_dips etc.) report the decomposition's honest
    equivalents."""
    params = model["params"]
    var = F.greatest(F.col("se") * F.col("se"), F.lit(1e-300))
    k = (
        F.size(F.coalesce(F.col("phi"), F.array()))
        + F.lit(2)
        + F.when(F.col("period") > 1, F.col("period") - 1).otherwise(0)
    ).cast("double")
    ll = (
        F.lit(-0.5)
        * F.col("n").cast("double")
        * (F.lit(1.837877066409345) + F.log(var) + F.lit(1.0))
    )  # 1.8378… = ln(2π)
    day_us = 86_400_000_000
    span = F.col("period").cast("double") * F.col("freq_us").cast("double")
    seasonal = F.when(F.col("period") <= 1, F.array().cast("array<string>")).otherwise(
        F.array(
            F.when(
                (span >= 0.9 * 7 * day_us) & (span <= 1.1 * 7 * day_us),
                F.lit("WEEKLY"),
            )
            .when(
                (span >= 0.9 * day_us) & (span <= 1.1 * day_us),
                F.lit("DAILY"),
            )
            .when(
                (span >= 0.9 * 365 * day_us) & (span <= 1.1 * 366 * day_us),
                F.lit("YEARLY"),
            )
            .otherwise(F.concat(F.lit("EVERY_"), F.col("period"), F.lit("_POINTS")))
        )
    )
    cols = [
        F.size(F.coalesce(F.col("phi"), F.array())).alias("non_seasonal_p"),
        F.lit(0).alias("non_seasonal_d"),
        F.lit(0).alias("non_seasonal_q"),
        (F.col("trend_b") != 0.0).alias("has_drift"),
        ll.alias("log_likelihood"),
        (F.lit(2.0) * k - F.lit(2.0) * ll).alias("AIC"),
        (F.col("se") * F.col("se")).alias("variance"),
        seasonal.alias("seasonal_periods"),
        F.lit(False).alias("has_holiday_effect"),
        F.lit(False).alias("has_spikes_and_dips"),
        F.lit(False).alias("has_step_changes"),
    ]
    if model.get("id_col"):
        cols.insert(0, F.col("id").alias(model["id_col"]))
    return params.select(*cols)


def save_model(root: str, name: str, model: dict) -> str:
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"{name}.json")
    with open(path, "w") as f:
        json.dump(model, f)
    return path


def load_model(root: str, name: str) -> dict:
    path = os.path.join(root, f"{name}.json")
    if not os.path.exists(path):
        raise ValueError(f"unknown model {name!r}")
    with open(path) as f:
        return json.load(f)


# -- boosted trees (r9, VERDICT r8 gap #1) ------------------------------------
#
# BQML's boosted_tree_regressor / boosted_tree_classifier, built the way
# this module builds everything: SUFFICIENT STATISTICS to the driver,
# never rows. The trainer is histogram-based second-order gradient
# boosting (the public XGBoost objective, Chen & Guestrin 2016, with
# LightGBM-style feature histograms):
#
# - ONE binning pass: percentile_approx over every feature in a single
#   scalar aggregate -> per-feature quantile bin edges (driver holds
#   k x (B-1) doubles). Features then map to small-int bins with a
#   fold over the literal edge array (JVM-side, no Python).
# - The binned design (k tinyint columns + label) is persisted ONCE;
#   margins, gradients, hessians and node assignments are EXPRESSIONS
#   over it, recomputed per pass by codegen — nothing else
#   materializes.
# - Each tree LEVEL is ONE distributed aggregate: posexplode the k bin
#   columns -> hash-aggregate SUM(g), SUM(h), COUNT per
#   (node, feature, bin). Map-side combine collapses each partition to
#   nodes x k x B partial rows, so the shuffle is histogram-sized (KBs),
#   independent of row count — the 100 TB shape. The driver scans the
#   histogram for the best split per node (exact second-order gain
#   with L2 and min_split_loss) and never sees a row.
# - Leaf weights come from the split bookkeeping (children G/H are the
#   prefix sums already computed) — no extra pass.
#
# Reference surface: CREATE MODEL OPTIONS(model_type='boosted_tree_*')
# + ML.PREDICT / ML.EVALUATE / ML.FEATURE_IMPORTANCE (delegated BigQuery
# surface, ref main.py:21,49-50).


def _bin_expr(col: Column, edges: list[float]) -> Column:
    """bin(x) = #edges <= x, a fold over the literal edge array.
    NULLs land in bin 0 (left-most), the same convention the split
    conditions use."""
    acc = F.lit(0)
    for e in edges:
        acc = acc + F.when(col >= F.lit(e), 1).otherwise(0)
    return acc


def _tree_value_expr(
    tree: dict, cols: list[Column], *, on_bins: bool
) -> Column:
    """Leaf-weight expression for one trained tree — nested IFs walked
    from the root. ``on_bins``: condition on the binned column
    (training-time margin) vs the raw feature against the edge VALUE
    (predict-time — prediction needs no binning pass)."""

    def walk(node_id: int) -> Column:
        s = tree["splits"].get(str(node_id))
        if s is None:
            return F.lit(tree["leaves"][str(node_id)])
        if on_bins:
            cond = cols[s["f"]] <= F.lit(s["bin_thr"])
        else:
            # bin(x) <= t  <=>  x < edges[t]; NULL x follows the NULL
            # bin-0 convention (goes left)
            c = cols[s["f"]]
            cond = c.isNull() | (c < F.lit(s["value_thr"]))
        return F.when(cond, walk(2 * node_id + 1)).otherwise(
            walk(2 * node_id + 2)
        )

    return walk(0)


def fit_boosted_trees(
    df: DataFrame,
    features: list[str],
    label: str,
    objective: str = "regression",
    num_trees: int = 20,
    max_depth: int = 4,
    learning_rate: float = 0.3,
    l2: float = 1.0,
    min_split_loss: float = 0.0,
    min_child_weight: float = 1.0,
    num_bins: int = 32,
) -> dict:
    """Histogram GBDT: num_trees x max_depth distributed aggregate
    passes over ONE persisted binned dataset; every pass ships only a
    (node, feature, bin) histogram to the driver."""
    import numpy as np

    if objective not in ("regression", "classification"):
        raise ValueError(f"objective {objective!r}")
    fracs = [i / num_bins for i in range(1, num_bins)]
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(label).cast("double")).alias("__sy"),
        *[
            F.percentile_approx(
                F.col(c).cast("double"), fracs, 10_000
            ).alias(f"__q_{i}")
            for i, c in enumerate(features)
        ],
    ).collect()[0]
    n_rows = agg["__n"]
    if not n_rows:
        raise ValueError("boosted trees: empty training input")
    edges: list[list[float]] = []
    for i in range(len(features)):
        qs = [q for q in (agg[f"__q_{i}"] or []) if q is not None]
        uniq = sorted(set(float(q) for q in qs))
        edges.append(uniq)
    mean_y = agg["__sy"] / n_rows
    if objective == "classification":
        p0 = min(max(mean_y, 1e-6), 1.0 - 1e-6)
        base = float(np.log(p0 / (1.0 - p0)))
    else:
        base = float(mean_y)

    bin_cols = [f"__b_{i}" for i in range(len(features))]
    # the margin __m is a MATERIALIZED cached column, updated once per
    # tree — never a cumulative expression over all prior trees, which
    # would blow the 64 KB whole-stage-codegen method limit (and at
    # 100 TB re-evaluate T ensembles per pass). Each cache swap is
    # forced by the next tree's first histogram pass; the superseded
    # cache unpersists one tree later (margin checkpointing, the
    # standard distributed-GBDT shape).
    cur = df.select(
        F.col(label).cast("double").alias("__y"),
        *[
            _bin_expr(F.col(c).cast("double"), edges[i]).alias(bin_cols[i])
            for i, c in enumerate(features)
        ],
        F.lit(base).alias("__m"),
    ).persist()
    to_unpersist: DataFrame | None = None

    trees: list[dict] = []
    y = F.col("__y")
    for _ in range(num_trees):
        margin = F.col("__m")
        if objective == "classification":
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            g_expr, h_expr = p - y, p * (F.lit(1.0) - p)
        else:
            g_expr, h_expr = margin - y, F.lit(1.0)

        splits: dict[str, dict] = {}
        node_stats: dict[int, tuple[float, float]] = {}
        node_expr = F.lit(0)
        open_nodes = [0]
        for depth in range(max_depth):
            hist = (
                cur.select(
                    node_expr.alias("__node"),
                    F.posexplode(
                        F.array(*[F.col(c) for c in bin_cols])
                    ).alias("__f", "__b"),
                    g_expr.alias("__g"),
                    h_expr.alias("__h"),
                )
                .groupBy("__node", "__f", "__b")
                .agg(F.sum("__g").alias("sg"), F.sum("__h").alias("sh"))
                .collect()
            )
            by_node: dict[int, np.ndarray] = {}
            for r in hist:
                a = by_node.setdefault(
                    r["__node"],
                    np.zeros((len(features), num_bins, 2)),
                )
                a[r["__f"], r["__b"], 0] = r["sg"]
                a[r["__f"], r["__b"], 1] = r["sh"]
            level_splits: dict[int, tuple[int, int]] = {}
            for nid in open_nodes:
                a = by_node.get(nid)
                if a is None:
                    continue
                G, H = a[0, :, 0].sum(), a[0, :, 1].sum()
                if nid not in node_stats:
                    node_stats[nid] = (float(G), float(H))
                parent_score = G * G / (H + l2)
                best = (0.0, -1, -1)  # (gain, f, thr)
                for fi in range(len(features)):
                    if not edges[fi]:
                        continue
                    GL = np.cumsum(a[fi, :, 0])
                    HL = np.cumsum(a[fi, :, 1])
                    # threshold t sends bins <= t left; t = B-1 is the
                    # trivial all-left split, excluded
                    for t in range(min(len(edges[fi]), num_bins - 1)):
                        hl, hr = HL[t], H - HL[t]
                        if hl < min_child_weight or hr < min_child_weight:
                            continue
                        gl, gr = GL[t], G - GL[t]
                        gain = 0.5 * (
                            gl * gl / (hl + l2)
                            + gr * gr / (hr + l2)
                            - parent_score
                        ) - min_split_loss
                        if gain > best[0]:
                            best = (float(gain), fi, t)
                if best[1] >= 0:
                    _, fi, t = best
                    level_splits[nid] = (fi, t)
                    gl = float(np.cumsum(a[fi, :, 0])[t])
                    hl = float(np.cumsum(a[fi, :, 1])[t])
                    gn, hn = node_stats[nid]
                    node_stats[2 * nid + 1] = (gl, hl)
                    node_stats[2 * nid + 2] = (gn - gl, hn - hl)
                    splits[str(nid)] = {
                        "f": fi,
                        "bin_thr": t,
                        "value_thr": edges[fi][t],
                        "gain": best[0] + min_split_loss,
                        "cover": hn,
                    }
            if not level_splits:
                break
            upd = node_expr
            for nid, (fi, t) in level_splits.items():
                upd = (
                    F.when(
                        node_expr == F.lit(nid),
                        F.when(
                            F.col(bin_cols[fi]) <= F.lit(t),
                            F.lit(2 * nid + 1),
                        ).otherwise(F.lit(2 * nid + 2)),
                    ).otherwise(upd)
                )
            if to_unpersist is not None:
                # the first hist pass above materialized cur's cache;
                # the previous tree's cache is now safe to drop
                to_unpersist.unpersist()
                to_unpersist = None
            node_expr = upd
            open_nodes = [
                c
                for nid in level_splits
                for c in (2 * nid + 1, 2 * nid + 2)
            ]
        leaves = {
            str(nid): -gh[0] / (gh[1] + l2)
            for nid, gh in node_stats.items()
            if str(nid) not in splits
        }
        if to_unpersist is not None:
            to_unpersist.unpersist()
            to_unpersist = None
        if not splits:
            # no split improved the objective: the ensemble converged
            break
        # per-node hessian cover (every split AND leaf node) persists
        # with the tree: path-dependent TreeSHAP (ML.EXPLAIN_PREDICT)
        # weights conditional expectations by cover(child)/cover(parent)
        tree = {
            "splits": splits,
            "leaves": leaves,
            "covers": {
                str(nid): float(gh[1]) for nid, gh in node_stats.items()
            },
        }
        trees.append(tree)
        nxt = cur.withColumn(
            "__m",
            F.col("__m")
            + F.lit(learning_rate)
            * _tree_value_expr(
                tree, [F.col(c) for c in bin_cols], on_bins=True
            ),
        ).persist()
        to_unpersist = cur
        cur = nxt
    cur.unpersist()
    if to_unpersist is not None:
        to_unpersist.unpersist()
    return {
        "model_type": (
            "boosted_tree_regressor"
            if objective == "regression"
            else "boosted_tree_classifier"
        ),
        "features": list(features),
        "label": label,
        "objective": objective,
        "base_score": base,
        "learning_rate": learning_rate,
        "l2": l2,
        "edges": edges,
        "trees": trees,
        "n": int(n_rows),
    }


# total (splits + leaves) across the ensemble below which the margin
# stays a pure nested-IF codegen expression; above it one Project would
# exceed janino's 64 KB method limit (CollapseProject re-inlines any
# chunked intermediate columns, so chunking cannot save codegen) and
# Spark silently drops to interpreted eval — the Arrow-batched numpy
# scorer below is faster than interpreted Catalyst at that size.
_BT_CODEGEN_MAX_NODES = 300


def _score_boosted_pandas(model: dict):
    """Vectorized ensemble scorer as a scalar pandas_udf: per Arrow
    batch, every tree is walked level-by-level with numpy masks —
    O(trees x splits) vectorized ops per batch, no per-row Python.
    NaN (NULL) goes left, matching the bin-0 convention."""
    import numpy as np

    trees = model["trees"]
    base = model["base_score"]
    lr = model["learning_rate"]
    prepped = []
    for t in trees:
        splits = sorted(
            ((int(k), v["f"], v["value_thr"]) for k, v in t["splits"].items())
        )
        max_id = max(
            [int(k) for k in t["leaves"]]
            + [2 * nid + 2 for nid, _, _ in splits]
        )
        w = np.zeros(max_id + 1)
        for k, v in t["leaves"].items():
            w[int(k)] = v
        prepped.append((splits, w))

    @F.pandas_udf("double")
    def score(feats: pd.DataFrame) -> pd.Series:
        X = np.column_stack(
            [
                feats.iloc[:, i].to_numpy(dtype=float, na_value=np.nan)
                for i in range(feats.shape[1])
            ]
        )
        m = np.full(len(X), base)
        for splits, w in prepped:
            node = np.zeros(len(X), dtype=np.int64)
            for nid, f, thr in splits:
                mask = node == nid
                if not mask.any():
                    continue
                x = X[mask, f]
                left = np.isnan(x) | (x < thr)
                node[mask] = np.where(left, 2 * nid + 1, 2 * nid + 2)
            m += lr * w[node]
        return pd.Series(m)

    return score


def _with_boosted_margin(
    df: DataFrame, model: dict, out: str
) -> DataFrame:
    """Project the ensemble margin as column ``out``. Router: small
    ensembles are a pure nested-IF codegen expression (zero Python);
    ensembles past _BT_CODEGEN_MAX_NODES score through the
    Arrow-batched numpy scorer (the repo's sanctioned vectorized
    fallback tier) — one map stage, zero shuffles either way."""
    total_nodes = sum(
        len(t["splits"]) + len(t["leaves"]) for t in model["trees"]
    )
    cols = [F.col(c).cast("double") for c in model["features"]]
    if total_nodes <= _BT_CODEGEN_MAX_NODES:
        margin = F.lit(model["base_score"])
        for t in model["trees"]:
            margin = margin + F.lit(
                model["learning_rate"]
            ) * _tree_value_expr(t, cols, on_bins=False)
        return df.withColumn(out, margin)
    return df.withColumn(
        out, _score_boosted_pandas(model)(F.struct(*cols))
    )


def predict_boosted_trees(
    df: DataFrame,
    model: dict,
    out: str = "predicted_label",
    prob_out: str | None = None,
) -> DataFrame:
    """Broadcast-trees projection: the ensemble is nested-IF codegen
    on the raw features (prediction needs NO binning pass — split
    thresholds carry their edge values)."""
    scored = _with_boosted_margin(df, model, "__bt_margin")
    if model["objective"] == "classification":
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-F.col("__bt_margin"))
        )
        po = prob_out or f"{out}_prob"
        return (
            scored.withColumn(po, p)
            .withColumn(out, (F.col(po) >= 0.5).cast("int"))
            .drop("__bt_margin")
        )
    return scored.withColumnRenamed("__bt_margin", out)


def evaluate_boosted_trees(df: DataFrame, model: dict) -> DataFrame:
    """ML.EVALUATE: one scalar-aggregate pass, the same output shape
    as the linear (regressor) / logistic (classifier) evaluators."""
    if model["objective"] == "classification":
        scored = predict_boosted_trees(
            df, model, out="__yhat", prob_out="__p"
        )
        yv = F.col(model["label"]).cast("int")
        tp = F.sum(((F.col("__yhat") == 1) & (yv == 1)).cast("long"))
        fp = F.sum(((F.col("__yhat") == 1) & (yv == 0)).cast("long"))
        fn = F.sum(((F.col("__yhat") == 0) & (yv == 1)).cast("long"))
        eps = F.lit(1e-15)
        pc = F.greatest(F.least(F.col("__p"), F.lit(1.0) - eps), eps)
        ll = -F.avg(
            yv.cast("double") * F.log(pc)
            + (F.lit(1.0) - yv.cast("double")) * F.log(F.lit(1.0) - pc)
        )
        agg = scored.agg(
            F.avg((F.col("__yhat") == yv).cast("double")).alias("accuracy"),
            tp.alias("__tp"),
            fp.alias("__fp"),
            fn.alias("__fn"),
            ll.alias("log_loss"),
        )
        prec = F.col("__tp") / F.greatest(
            F.col("__tp") + F.col("__fp"), F.lit(1)
        )
        rec = F.col("__tp") / F.greatest(
            F.col("__tp") + F.col("__fn"), F.lit(1)
        )
        return agg.select(
            "accuracy",
            prec.alias("precision"),
            rec.alias("recall"),
            (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-300))).alias(
                "f1_score"
            ),
            "log_loss",
        )
    pred = predict_boosted_trees(df, model, out="__p")
    err = F.col("__p") - F.col(model["label"]).cast("double")
    yv = F.col(model["label"]).cast("double")
    return pred.agg(
        F.avg(F.abs(err)).alias("mean_absolute_error"),
        F.avg(err * err).alias("mean_squared_error"),
        (
            F.lit(1.0)
            - F.sum(err * err)
            / (
                F.sum(yv * yv)
                - F.count(F.lit(1)) * F.pow(F.avg(yv), F.lit(2))
            )
        ).alias("r2_score"),
    )


# -- Random forest (r11) --------------------------------------------------------
# BigQuery's random_forest_regressor / random_forest_classifier as a
# COMPOSITION of the histogram-GBDT machinery: each member is a
# single-tree fit (learning_rate=1, one boosting step — its leaf
# values are shrunk subsample means, a proper regression tree) on a
# DETERMINISTIC hash subsample (xxhash64 of the feature/label tuple
# with the member index as seed — documented divergence from
# BigQuery's true random bootstrap; rows with identical tuples
# co-sample). Prediction averages member margins (regression) or
# member sigmoids (classification) — bagging, not boosting.
# ref parity: BigQuery ML random forest (delegated, main.py:21,49-50).


def fit_random_forest(
    df: DataFrame,
    features: list[str],
    label: str,
    objective: str = "regression",
    num_trees: int = 25,
    max_depth: int = 6,
    subsample: float = 0.8,
    l2: float = 1.0,
    min_split_loss: float = 0.0,
    min_child_weight: float = 1.0,
    num_bins: int = 32,
) -> dict:
    if not 0.0 < subsample <= 1.0:
        raise ValueError(f"random forest: subsample {subsample!r}")
    if num_trees < 2:
        raise ValueError("random forest: num_parallel_tree must be >= 2")
    cols = [F.col(c) for c in [*features, label]]
    members = []
    for t in range(num_trees):
        sub = df
        if subsample < 1.0:
            sub = df.filter(
                F.pmod(F.xxhash64(*cols, F.lit(t)), F.lit(1000))
                < F.lit(int(subsample * 1000))
            )
        members.append(
            fit_boosted_trees(
                sub,
                features,
                label,
                objective=objective,
                num_trees=1,
                max_depth=max_depth,
                learning_rate=1.0,
                l2=l2,
                min_split_loss=min_split_loss,
                min_child_weight=min_child_weight,
                num_bins=num_bins,
            )
        )
    return {
        "model_type": "random_forest",
        "objective": objective,
        "features": list(features),
        "label": label,
        "num_trees": num_trees,
        "subsample": subsample,
        "members": members,
    }


def _rf_member_margin(member: dict, cols: list) -> F.Column:
    return F.lit(member["base_score"]) + F.lit(
        member["learning_rate"]
    ) * _tree_value_expr(member["trees"][0], cols, on_bins=False)


def _score_forest_pandas(model: dict):
    """Arrow-batched numpy scorer for large forests (same fallback
    tier as _score_boosted_pandas): averages member margins, or member
    sigmoids for classifiers."""
    import numpy as np

    prepped = []
    for m in model["members"]:
        t = m["trees"][0]
        splits = sorted(
            ((int(k), v["f"], v["value_thr"]) for k, v in t["splits"].items())
        )
        max_id = max(
            [int(k) for k in t["leaves"]]
            + [2 * nid + 2 for nid, _, _ in splits],
            default=0,
        )
        w = np.zeros(max_id + 1)
        for k, v in t["leaves"].items():
            w[int(k)] = v
        prepped.append((m["base_score"], splits, w))
    classify = model["objective"] == "classification"

    @F.pandas_udf("double")
    def score(feats: pd.DataFrame) -> pd.Series:
        X = np.column_stack(
            [
                feats.iloc[:, i].to_numpy(dtype=float, na_value=np.nan)
                for i in range(feats.shape[1])
            ]
        )
        acc = np.zeros(len(X))
        for base, splits, w in prepped:
            node = np.zeros(len(X), dtype=np.int64)
            for nid, f, thr in splits:
                mask = node == nid
                if not mask.any():
                    continue
                x = X[mask, f]
                left = np.isnan(x) | (x < thr)
                node[mask] = np.where(left, 2 * nid + 1, 2 * nid + 2)
            margin = base + w[node]
            acc += 1.0 / (1.0 + np.exp(-margin)) if classify else margin
        return pd.Series(acc / len(prepped))

    return score


def predict_random_forest(
    df: DataFrame,
    model: dict,
    out: str = "predicted_label",
    prob_out: str | None = None,
) -> DataFrame:
    """Bagged-ensemble projection: the averaged forest is nested-IF
    codegen on raw features when small, the Arrow scorer past
    _BT_CODEGEN_MAX_NODES — one map stage, zero shuffles either way."""
    cols = [F.col(c).cast("double") for c in model["features"]]
    total_nodes = sum(
        len(m["trees"][0]["splits"]) + len(m["trees"][0]["leaves"])
        for m in model["members"]
    )
    classify = model["objective"] == "classification"
    if total_nodes <= _BT_CODEGEN_MAX_NODES:
        terms = []
        for m in model["members"]:
            margin = _rf_member_margin(m, cols)
            terms.append(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
                if classify
                else margin
            )
        score = sum(terms[1:], terms[0]) / F.lit(len(terms))
    else:
        score = _score_forest_pandas(model)(F.struct(*cols))
    if classify:
        po = prob_out or f"{out}_prob"
        return df.withColumn(po, score).withColumn(
            out, (F.col(po) >= 0.5).cast("int")
        )
    return df.withColumn(out, score)


def evaluate_random_forest(df: DataFrame, model: dict) -> DataFrame:
    """ML.EVALUATE for forests — the evaluator shape is shared with
    the boosted family; only the scorer differs."""
    if model["objective"] == "classification":
        scored = predict_random_forest(
            df, model, out="__yhat", prob_out="__p"
        )
        return _evaluate_scored_classifier(scored, model["label"])
    pred = predict_random_forest(df, model, out="__p")
    return _evaluate_scored_regressor(pred, model["label"])


def _evaluate_scored_classifier(scored: DataFrame, label: str) -> DataFrame:
    yv = F.col(label).cast("int")
    tp = F.sum(((F.col("__yhat") == 1) & (yv == 1)).cast("long"))
    fp = F.sum(((F.col("__yhat") == 1) & (yv == 0)).cast("long"))
    fn = F.sum(((F.col("__yhat") == 0) & (yv == 1)).cast("long"))
    eps = F.lit(1e-15)
    pc = F.greatest(F.least(F.col("__p"), F.lit(1.0) - eps), eps)
    ll = -F.avg(
        yv.cast("double") * F.log(pc)
        + (F.lit(1.0) - yv.cast("double")) * F.log(F.lit(1.0) - pc)
    )
    agg = scored.agg(
        F.avg((F.col("__yhat") == yv).cast("double")).alias("accuracy"),
        tp.alias("__tp"),
        fp.alias("__fp"),
        fn.alias("__fn"),
        ll.alias("log_loss"),
    )
    prec = F.col("__tp") / F.greatest(F.col("__tp") + F.col("__fp"), F.lit(1))
    rec = F.col("__tp") / F.greatest(F.col("__tp") + F.col("__fn"), F.lit(1))
    return agg.select(
        "accuracy",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-300))).alias(
            "f1_score"
        ),
        "log_loss",
    )


def _evaluate_scored_regressor(pred: DataFrame, label: str) -> DataFrame:
    err = F.col("__p") - F.col(label).cast("double")
    yv = F.col(label).cast("double")
    return pred.agg(
        F.avg(F.abs(err)).alias("mean_absolute_error"),
        F.avg(err * err).alias("mean_squared_error"),
        (
            F.lit(1.0)
            - F.sum(err * err)
            / (
                F.sum(yv * yv)
                - F.count(F.lit(1)) * F.pow(F.avg(yv), F.lit(2))
            )
        ).alias("r2_score"),
    )


def feature_importance_boosted(
    spark: SparkSession, model: dict
) -> DataFrame:
    """ML.FEATURE_IMPORTANCE: XGBoost's public importance triple per
    feature — split count (weight), total gain, total hessian cover —
    straight from the stored trees (metadata only, no data pass)."""
    w = {c: 0 for c in model["features"]}
    gain = {c: 0.0 for c in model["features"]}
    cover = {c: 0.0 for c in model["features"]}
    for t in model["trees"]:
        for s in t["splits"].values():
            c = model["features"][s["f"]]
            w[c] += 1
            gain[c] += s["gain"]
            cover[c] += s["cover"]
    rows = [
        (c, float(w[c]), gain[c], cover[c]) for c in model["features"]
    ]
    return spark.createDataFrame(
        rows,
        "feature string, importance_weight double, "
        "importance_gain double, importance_cover double",
    )


# -- BQML inspection / anomaly pack (r10) -------------------------------------
#
# ML.CONFUSION_MATRIX / ML.ROC_CURVE / ML.DETECT_ANOMALIES /
# ML.FEATURE_INFO / ML.TRAINING_INFO — the BigQuery model-inspection
# surface (delegated in the reference, main.py:21,49-50). Every
# computation is either fit-time sufficient statistics persisted in
# the model dict or a single codegen aggregate pass at call time.


def _nearest_centroid_dist(vec: Column, centroids: list[list[float]]) -> Column:
    """Euclidean distance to the NEAREST centroid as one codegen
    expression: argmax over (x·c − ‖c‖²/2) gives the best centroid, so
    dist² = ‖x‖² − 2·max_score — linear in k, no UDF."""
    from bigquery_etl_spark.operators.similarity import dot

    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    half_sq = F.array(
        *[F.lit(sum(x * x for x in c) / 2.0) for c in centroids]
    )
    best = F.array_max(
        F.zip_with(
            F.transform(cent_arr, lambda c: dot(vec, c)),
            half_sq,
            lambda d, h: d - h,
        )
    )
    return F.sqrt(F.greatest(dot(vec, vec) - 2.0 * best, F.lit(0.0)))


_Q_GRID = 1001  # fit-time quantile grid resolution (0.1% contamination steps)


def _dist_quantile_grid(df: DataFrame, dist: Column) -> list[float]:
    """1001-point quantile grid of a distance/error expression over the
    TRAINING frame — one distributed percentile_approx pass; the grid
    (8KB) persists in the model JSON so ML.DETECT_ANOMALIES thresholds
    come from TRAINING data (BigQuery's contract), not from the scored
    input."""
    pts = ", ".join(f"{i / (_Q_GRID - 1)}D" for i in range(_Q_GRID))
    row = df.select(dist.alias("__d")).agg(
        F.expr(f"percentile_approx(__d, array({pts}), 10000)").alias("__q")
    ).collect()[0]
    return [float(v) for v in row["__q"]]


def _contamination_threshold(model: dict, contamination: float) -> float:
    if not 0.0 < contamination <= 0.5:
        raise ValueError(
            f"contamination must be in (0, 0.5], got {contamination}"
        )
    grid = model.get("dist_quantiles")
    if not grid:
        raise ValueError(
            "model has no training distance distribution — retrain with "
            "this engine version (dist_quantiles persisted at fit time)"
        )
    idx = min(_Q_GRID - 1, max(0, round((1.0 - contamination) * (_Q_GRID - 1))))
    return float(grid[idx]) or 1e-300  # guard zero threshold


def detect_anomalies(
    df: DataFrame, model: dict, contamination: float = 0.1
) -> DataFrame:
    """``ML.DETECT_ANOMALIES(MODEL m, STRUCT(c AS contamination), t)``
    for kmeans (distance to nearest centroid) and pca (reconstruction
    error of the truncated basis) — the two closed-form detectors.
    The threshold is the (1−c) quantile of the TRAINING distance/error
    distribution persisted at fit; scoring is one broadcast-constants
    codegen projection. ARIMA_PLUS in-sample anomaly detection needs
    the sequential residual reconstruction and refuses loudly."""
    mt = model["model_type"]
    if mt == "kmeans":
        vec = F.array(
            *[F.col(c).cast("double") for c in model["features"]]
        )
        dist = _nearest_centroid_dist(vec, model["centroids"])
        thr = _contamination_threshold(model, contamination)
        out = df.withColumn(
            "centroid_id", _argmin_dist(vec, model["centroids"])
        ).withColumn(
            "normalized_distance", dist / F.lit(thr)
        )
        return out.withColumn(
            "is_anomaly", F.col("normalized_distance") > 1.0
        )
    if mt == "pca":
        err = _pca_recon_error(model)
        thr = _contamination_threshold(model, contamination)
        out = df.withColumn("mean_squared_error", err * err / F.lit(
            float(len(model["features"]))
        ))
        return out.withColumn(
            "is_anomaly", err > F.lit(thr)
        )
    raise ValueError(
        "ML.DETECT_ANOMALIES: kmeans or pca (arima_plus in-sample "
        "reconstruction is out of scope — documented refusal)"
    )


def _pca_recon_error(model: dict) -> Column:
    """‖(x−μ) − Vᵀ·V·(x−μ)‖ with V = the n_components basis — fully
    unrolled constant arithmetic (d·k multiplies), whole-stage
    codegen."""
    feats, mean = model["features"], model["mean"]
    comps = model["components"]
    centered = [
        F.col(c).cast("double") - F.lit(m) for c, m in zip(feats, mean)
    ]
    projs = []
    for comp in comps:
        p = F.lit(0.0)
        for x, w in zip(centered, comp):
            p = p + x * F.lit(w)
        projs.append(p)
    sq = F.lit(0.0)
    for d_i in range(len(feats)):
        recon = F.lit(0.0)
        for comp, p in zip(comps, projs):
            recon = recon + p * F.lit(comp[d_i])
        diff = centered[d_i] - recon
        sq = sq + diff * diff
    return F.sqrt(sq)


def confusion_matrix(df: DataFrame, model: dict) -> DataFrame:
    """``ML.CONFUSION_MATRIX(MODEL m, t)`` — one groupBy-pivot over the
    scored input; binary classifiers (logistic_reg,
    boosted_tree_classifier). Column naming follows BigQuery: the
    label values themselves (stringified), expected down the rows,
    predicted across the columns."""
    mt = model["model_type"]
    if mt == "logistic_reg":
        scored = predict_logistic_reg(df, model, out="__yhat", prob_out="__p")
    elif mt == "boosted_tree_classifier" or (
        mt.startswith("boosted_tree") and model.get("objective") == "classification"
    ):
        scored = predict_boosted_trees(df, model, out="__yhat", prob_out="__p")
    else:
        raise ValueError(
            "ML.CONFUSION_MATRIX: logistic_reg or boosted_tree_classifier"
        )
    y = F.col(model["label"]).cast("int")
    return (
        scored.select(
            y.cast("string").alias("expected_label"),
            F.col("__yhat").cast("string").alias("__pred"),
        )
        .groupBy("expected_label")
        .pivot("__pred", ["0", "1"])
        .count()
        .na.fill(0, ["0", "1"])
        .orderBy("expected_label")
    )


def roc_curve(
    df: DataFrame, model: dict, thresholds: list[float] | None = None
) -> DataFrame:
    """``ML.ROC_CURVE(MODEL m, t [, thresholds])`` — EXACT counts at
    every threshold in ONE aggregate pass (2·T+2 conditional sums,
    map-side combined, codegen), reshaped to BigQuery's row-per-
    threshold output by inline(). T is bounded (≤256) because each
    threshold adds two aggregate expressions to the plan."""
    if thresholds is None:
        thresholds = [i / 100.0 for i in range(101)]
    if not 1 <= len(thresholds) <= 256:
        raise ValueError(
            f"ML.ROC_CURVE: 1..256 thresholds, got {len(thresholds)}"
        )
    mt = model["model_type"]
    if mt == "logistic_reg":
        scored = predict_logistic_reg(df, model, out="__yhat", prob_out="__p")
    elif mt.startswith("boosted_tree") and model.get("objective") == "classification":
        scored = predict_boosted_trees(df, model, out="__yhat", prob_out="__p")
    else:
        raise ValueError(
            "ML.ROC_CURVE: logistic_reg or boosted_tree_classifier"
        )
    y = F.col(model["label"]).cast("int")
    p = F.col("__p")
    aggs = [
        F.sum((y == 1).cast("long")).alias("__pos"),
        F.sum((y == 0).cast("long")).alias("__neg"),
    ]
    for i, t in enumerate(thresholds):
        aggs.append(
            F.sum(((p >= F.lit(float(t))) & (y == 1)).cast("long")).alias(f"__tp_{i}")
        )
        aggs.append(
            F.sum(((p >= F.lit(float(t))) & (y == 0)).cast("long")).alias(f"__fp_{i}")
        )
    one = scored.agg(*aggs)
    entries = []
    for i, t in enumerate(thresholds):
        tp, fp = F.col(f"__tp_{i}"), F.col(f"__fp_{i}")
        entries.append(F.struct(
            F.lit(float(t)).alias("threshold"),
            (tp / F.greatest(F.col("__pos"), F.lit(1))).alias("recall"),
            (fp / F.greatest(F.col("__neg"), F.lit(1))).alias(
                "false_positive_rate"
            ),
            tp.alias("true_positives"),
            fp.alias("false_positives"),
            (F.col("__neg") - fp).alias("true_negatives"),
            (F.col("__pos") - tp).alias("false_negatives"),
        ))
    return one.select(F.inline(F.array(*entries)))


def feature_stats(df: DataFrame, features: list[str]) -> list[dict]:
    """Per-feature training statistics for ``ML.FEATURE_INFO`` — ONE
    distributed aggregate pass (6 scalars per feature), persisted in
    the model dict like BigQuery persists them with the model."""
    aggs: list[Column] = []
    for i, c in enumerate(features):
        x = F.col(c).cast("double")
        aggs += [
            F.min(x).alias(f"__mn_{i}"),
            F.max(x).alias(f"__mx_{i}"),
            F.avg(x).alias(f"__me_{i}"),
            F.stddev(x).alias(f"__sd_{i}"),
            F.expr(f"percentile_approx(CAST({c} AS DOUBLE), 0.5, 10000)")
            .alias(f"__md_{i}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nu_{i}"),
        ]
    row = df.agg(*aggs).collect()[0]

    def _f(v):
        return None if v is None else float(v)

    return [
        {
            "input": c,
            "min": _f(row[f"__mn_{i}"]),
            "max": _f(row[f"__mx_{i}"]),
            "mean": _f(row[f"__me_{i}"]),
            "median": _f(row[f"__md_{i}"]),
            "stddev": _f(row[f"__sd_{i}"]),
            "null_count": int(row[f"__nu_{i}"] or 0),
        }
        for i, c in enumerate(features)
    ]


def _tree_expected(tree: dict) -> float:
    """Cover-weighted mean leaf value — the tree's conditional
    expectation at the empty feature set, v(∅)."""
    cov = tree["covers"]
    root = cov["0"]
    return sum(
        cov[k] / root * v for k, v in tree["leaves"].items()
    )


def _tree_shap_batch(X, tree: dict, n_features: int):
    """Path-dependent TreeSHAP (Lundberg & Lee, Algorithm 2 of the
    public TreeSHAP paper / shap library C kernel), VECTORIZED over an
    Arrow batch: the recursion over tree nodes is shared across rows —
    the only per-row state is each path entry's "one fraction" (a 0/1
    indicator vector: does the row follow every conditioned split on
    that feature so far) and its weight vector, both (n,) numpy arrays
    updated elementwise. Zero fractions are cover ratios, identical
    for every row, so they stay scalars. O(nodes · depth² · n)
    vectorized ops per tree, no per-row Python.

    Returns phi (n, n_features): exact path-dependent Shapley values
    satisfying sum(phi) == tree(x) − v(∅) identically. NaN routes
    left, matching prediction's NULL-goes-left convention."""
    import numpy as np

    n = len(X)
    splits = {
        int(k): (v["f"], v["value_thr"])
        for k, v in tree["splits"].items()
    }
    leaves = {int(k): float(v) for k, v in tree["leaves"].items()}
    cover = {int(k): float(v) for k, v in tree["covers"].items()}
    phi = np.zeros((n, n_features))

    def _extend(pd_, zs, os_, ws, pi, pz, po):
        """Append a path entry; returns fresh copies (each recursion
        branch owns its state)."""
        l = len(pd_)
        pd2 = pd_ + [pi]
        zs2 = zs + [pz]
        os2 = [o.copy() for o in os_] + [po]
        ws2 = [w.copy() for w in ws] + [
            np.ones(n) if l == 0 else np.zeros(n)
        ]
        for j in range(l - 1, -1, -1):
            ws2[j + 1] += po * ws2[j] * ((j + 1) / (l + 1))
            ws2[j] = pz * ws2[j] * ((l - j) / (l + 1))
        return pd2, zs2, os2, ws2

    def _unwind(pd_, zs, os_, ws, k):
        """Remove path entry k (a previously-conditioned feature is
        being re-split); per-row branch on the entry's 0/1 one
        fraction via np.where."""
        l = len(pd_) - 1
        one, zero = os_[k], zs[k]
        hot = one != 0
        ws2 = [w.copy() for w in ws]
        nn = ws2[l].copy()
        for j in range(l - 1, -1, -1):
            wjA = nn * ((l + 1) / (j + 1))  # one == 1, so /one omitted
            nnA = ws2[j] - wjA * (zero * (l - j) / (l + 1))
            wjB = ws2[j] * ((l + 1) / (zero * (l - j)))
            ws2[j] = np.where(hot, wjA, wjB)
            nn = np.where(hot, nnA, nn)
        del ws2[l]
        pd2 = pd_[:k] + pd_[k + 1 :]
        zs2 = zs[:k] + zs[k + 1 :]
        os2 = [o.copy() for o in os_[:k] + os_[k + 1 :]]
        # entries above k keep their values; only weights re-derive
        return pd2, zs2, os2, ws2

    def _unwound_sum(zs, os_, ws, k):
        l = len(ws) - 1
        one, zero = os_[k], zs[k]
        hot = one != 0
        totA = np.zeros(n)
        totB = np.zeros(n)
        nxt = ws[l]
        for j in range(l - 1, -1, -1):
            tmp = nxt * ((l + 1) / (j + 1))
            totA += tmp
            nxt = ws[j] - tmp * (zero * (l - j) / (l + 1))
            totB += ws[j] * ((l + 1) / (zero * (l - j)))
        return np.where(hot, totA, totB)

    def _recurse(node, pd_, zs, os_, ws, pi, pz, po):
        pd_, zs, os_, ws = _extend(pd_, zs, os_, ws, pi, pz, po)
        s = splits.get(node)
        if s is None:
            v = leaves[node]
            for i in range(1, len(pd_)):
                w = _unwound_sum(zs, os_, ws, i)
                phi[:, pd_[i]] += w * (os_[i] - zs[i]) * v
            return
        f, thr = s
        x = X[:, f]
        go_left = np.isnan(x) | (x < thr)
        iz, io = 1.0, np.ones(n)
        for k in range(1, len(pd_)):
            if pd_[k] == f:
                iz, io = zs[k], os_[k]
                pd_, zs, os_, ws = _unwind(pd_, zs, os_, ws, k)
                break
        cj = cover[node]
        left, right = 2 * node + 1, 2 * node + 2
        _recurse(
            left, pd_, zs, os_, ws, f,
            iz * (cover[left] / cj), io * go_left.astype(float),
        )
        _recurse(
            right, pd_, zs, os_, ws, f,
            iz * (cover[right] / cj), io * (~go_left).astype(float),
        )

    _recurse(0, [], [], [], [], -1, 1.0, np.ones(n))
    return phi


def explain_boosted_trees(
    df: DataFrame, model: dict, top_k: int = 3
) -> DataFrame:
    """``ML.EXPLAIN_PREDICT`` for boosted_tree_* (r11, VERDICT r10
    item 2): exact path-dependent TreeSHAP over the persisted
    histogram-GBDT trees — BigQuery ships (approximate) SHAP for its
    tree models; ours is the exact path-dependent algorithm, so
    attributions sum to prediction − baseline IDENTICALLY and
    approximation_error is 0. The baseline is the ensemble's
    cover-weighted expectation base + lr·Σ v_t(∅). One Arrow-batched
    pandas_udf map stage (the sanctioned vectorized tier — the
    recursion is inherently tree-structured), zero shuffles; for
    classifiers attributions live in margin (log-odds) space like
    BigQuery's. Reference: BigQuery ML explainable AI (delegated,
    main.py:21,49-50)."""
    import numpy as np

    feats = model["features"]
    d = len(feats)
    trees = model["trees"]
    if any("covers" not in t for t in trees):
        raise ValueError(
            "model has no per-node cover statistics — retrain with "
            "this engine version (covers persist at fit time)"
        )
    if top_k < 1:
        raise ValueError(f"top_k_features must be >= 1, got {top_k}")
    top_k = min(top_k, d)
    lr = float(model["learning_rate"])
    baseline = float(model["base_score"]) + lr * sum(
        _tree_expected(t) for t in trees
    )

    @F.pandas_udf("array<double>")
    def shap(cols: pd.DataFrame) -> pd.Series:
        X = np.column_stack(
            [
                cols.iloc[:, i].to_numpy(dtype=float, na_value=np.nan)
                for i in range(cols.shape[1])
            ]
        )
        phi = np.zeros((len(X), d))
        for t in trees:
            phi += _tree_shap_batch(X, t, d)
        phi *= lr
        return pd.Series(phi.tolist())

    out = df.withColumn(
        "__shap",
        shap(F.struct(*[F.col(c).cast("double") for c in feats])),
    )
    pairs = F.zip_with(
        F.array(*[F.lit(c) for c in feats]),
        F.col("__shap"),
        lambda fn, a: F.struct(
            fn.alias("feature"), a.alias("attribution")
        ),
    )
    arr = F.expr(
        "slice(array_sort(__attr_arr, (a, b) -> CASE "
        "WHEN abs(a.attribution) > abs(b.attribution) THEN -1 "
        "WHEN abs(a.attribution) < abs(b.attribution) THEN 1 "
        "WHEN a.feature < b.feature THEN -1 ELSE 1 END), 1, "
        f"{int(top_k)})"
    )
    out = (
        out.withColumn("__attr_arr", pairs)
        .withColumn("top_feature_attributions", arr)
        .withColumn("baseline_prediction_value", F.lit(baseline))
        .withColumn(
            "prediction_value",
            F.lit(baseline)
            + F.expr("aggregate(__shap, 0.0D, (a, e) -> a + e)"),
        )
        .withColumn("approximation_error", F.lit(0.0))
        .drop("__attr_arr", "__shap")
    )
    if model["objective"] == "classification":
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-F.col("prediction_value"))
        )
        out = out.withColumn(
            f"predicted_{model['label']}", (p >= 0.5).cast("int")
        ).withColumn(f"predicted_{model['label']}_prob", p)
    else:
        out = out.withColumn(
            f"predicted_{model['label']}", F.col("prediction_value")
        )
    return out


def explain_predict(df: DataFrame, model: dict, top_k: int = 3) -> DataFrame:
    """``ML.EXPLAIN_PREDICT(MODEL m, t, STRUCT(k AS top_k_features))``
    for the linear family — for a linear model the Shapley value of
    feature i is EXACTLY coef_i·(x_i − μ_i) with μ from the training
    stats persisted at fit, so attributions here are exact, not
    sampled. baseline_prediction_value = intercept + Σ coef_i·μ_i (the
    prediction at the training mean); attributions sum to
    (prediction − baseline) identically, so approximation_error is 0.
    For logistic_reg the attributions live in the model's linear
    (log-odds) space, as BigQuery's do. One codegen projection —
    constants broadcast, array_sort by |attribution| desc, slice k."""
    mt = model["model_type"]
    if mt.startswith("boosted_tree"):
        return explain_boosted_trees(df, model, top_k)
    if mt == "random_forest":
        raise ValueError(
            "ML.EXPLAIN_PREDICT: random_forest_* is not explained — "
            "a classifier's bagged prediction (mean of member "
            "sigmoids) is not linear in any member margin, so "
            "averaged TreeSHAP would not sum to the prediction; use "
            "ML.FEATURE_IMPORTANCE or a boosted_tree_* model"
        )
    if mt not in ("linear_reg", "logistic_reg"):
        raise ValueError(
            "ML.EXPLAIN_PREDICT: linear_reg, logistic_reg or "
            "boosted_tree_* (other families have no explainer)"
        )
    stats = model.get("feature_stats")
    if not stats:
        raise ValueError(
            "model has no feature statistics — retrain with this "
            "engine version"
        )
    if top_k < 1:
        raise ValueError(f"top_k_features must be >= 1, got {top_k}")
    means = {s["input"]: float(s["mean"] or 0.0) for s in stats}
    baseline = model["intercept"] + sum(
        b * means[c]
        for c, b in zip(model["features"], model["coefficients"])
    )
    # categorical columns (r10): the dummy means are the training
    # category FREQUENCIES, so the exact linear Shapley value of the
    # whole one-hot group — Σ_i coef_i·(dummy_i − μ_i), i.e.
    # w_active − E[w] — attributes to the ORIGINAL column, summing
    # with the numeric attributions to prediction − baseline exactly
    cats = model.get("categorical", {})
    dummy_of = {
        _dummy_name(col, i): (col, v)
        for col, vals in cats.items()
        for i, v in enumerate(vals)
    }
    n_display = len([f for f in model["features"]
                     if f not in dummy_of]) + len(cats)
    top_k = min(top_k, n_display)  # BigQuery caps at d
    coef = dict(zip(model["features"], model["coefficients"]))
    entries = []
    pred = F.lit(float(baseline))
    group_attr: dict[str, Column] = {}
    for c, b in zip(model["features"], model["coefficients"]):
        if c in dummy_of:
            col, v = dummy_of[c]
            d = (
                F.col(col).isNull() if v is None
                else (F.col(col) == F.lit(v))
            )
            dx = F.coalesce(d.cast("double"), F.lit(0.0))
            attr = (dx - F.lit(means[c])) * F.lit(float(b))
            group_attr[col] = (
                attr if col not in group_attr
                else group_attr[col] + attr
            )
        else:
            attr = (
                (F.col(c).cast("double") - F.lit(means[c]))
                * F.lit(float(b))
            )
            entries.append(F.struct(
                F.lit(c).alias("feature"), attr.alias("attribution")
            ))
        pred = pred + attr
    for col, attr in group_attr.items():
        entries.append(F.struct(
            F.lit(col).alias("feature"), attr.alias("attribution")
        ))
    arr = F.expr(
        "slice(array_sort(__attr_arr, (a, b) -> CASE "
        "WHEN abs(a.attribution) > abs(b.attribution) THEN -1 "
        "WHEN abs(a.attribution) < abs(b.attribution) THEN 1 "
        "WHEN a.feature < b.feature THEN -1 ELSE 1 END), 1, "
        f"{int(top_k)})"
    )
    out = df.withColumn("__attr_arr", F.array(*entries)).withColumn(
        "top_feature_attributions", arr
    ).drop("__attr_arr").withColumn(
        "baseline_prediction_value", F.lit(float(baseline))
    ).withColumn("prediction_value", pred).withColumn(
        "approximation_error", F.lit(0.0)
    )
    if mt == "logistic_reg":
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("prediction_value")))
        out = out.withColumn(
            f"predicted_{model['label']}", (p >= 0.5).cast("int")
        ).withColumn(f"predicted_{model['label']}_prob", p)
    else:
        out = out.withColumn(
            f"predicted_{model['label']}", F.col("prediction_value")
        )
    return out


def global_explain_boosted_stats(
    df: DataFrame, model: dict
) -> list[tuple[str, float]]:
    """Fit-time statistics for tree-model ML.GLOBAL_EXPLAIN (r11):
    mean |path-dependent TreeSHAP attribution| per feature over the
    TRAINING frame — ONE distributed Arrow-batched map pass (the same
    vectorized kernel ML.EXPLAIN_PREDICT scores with) + one tiny
    aggregate; only d scalars reach the driver. BigQuery likewise
    computes these during training when enable_global_explain=TRUE."""
    import numpy as np

    feats = model["features"]
    d = len(feats)
    trees = model["trees"]
    lr = float(model["learning_rate"])

    @F.pandas_udf("array<double>")
    def absphi(cols: pd.DataFrame) -> pd.Series:
        X = np.column_stack(
            [
                cols.iloc[:, i].to_numpy(dtype=float, na_value=np.nan)
                for i in range(cols.shape[1])
            ]
        )
        phi = np.zeros((len(X), d))
        for t in trees:
            phi += _tree_shap_batch(X, t, d)
        return pd.Series(np.abs(phi * lr).tolist())

    row = df.select(
        absphi(
            F.struct(*[F.col(c).cast("double") for c in feats])
        ).alias("__p")
    ).agg(
        *[
            F.avg(F.element_at(F.col("__p"), i + 1)).alias(f"__a{i}")
            for i in range(d)
        ]
    ).collect()[0]
    return [(c, float(row[f"__a{i}"] or 0.0)) for i, c in enumerate(feats)]


def global_explain(spark: SparkSession, model: dict) -> DataFrame:
    """``ML.GLOBAL_EXPLAIN(MODEL m)`` — mean absolute attribution per
    feature over the TRAINING data. For a linear model that is exactly
    |coef_i|·E|x_i − μ_i|; E|x−μ| was computed at fit time (one pass,
    persisted), so this is a constant-folded lookup. Tree ensembles
    point to ML.FEATURE_IMPORTANCE (gain) instead, like BigQuery's
    non-explainable-by-default tree path."""
    mt = model["model_type"]
    if mt.startswith("boosted_tree"):
        # r11: persisted fit-time mean |TreeSHAP| stats (BigQuery
        # requires enable_global_explain=TRUE at training — same gate)
        ga = model.get("global_attributions")
        if not ga:
            raise ValueError(
                "ML.GLOBAL_EXPLAIN on a tree model needs "
                "enable_global_explain=TRUE in the CREATE MODEL "
                "OPTIONS (BigQuery's rule — the statistics ride the "
                "training run); ML.FEATURE_IMPORTANCE (gain/weight/"
                "cover) needs no retrain"
            )
        rows = sorted(
            [(c, float(v)) for c, v in ga], key=lambda t: (-t[1], t[0])
        )
        return spark.createDataFrame(
            rows, "feature string, attribution double"
        )
    if mt not in ("linear_reg", "logistic_reg"):
        raise ValueError(
            "ML.GLOBAL_EXPLAIN: linear_reg, logistic_reg or "
            "boosted_tree_* (with enable_global_explain=TRUE)"
        )
    stats = model.get("feature_stats")
    if not stats or "mean_abs_dev" not in stats[0]:
        raise ValueError(
            "model has no attribution statistics — retrain with this "
            "engine version"
        )
    mad = {s["input"]: float(s.get("mean_abs_dev") or 0.0) for s in stats}
    means = {s["input"]: float(s["mean"] or 0.0) for s in stats}
    cats = model.get("categorical", {})
    dummy_of = {
        _dummy_name(col, i): col
        for col, vals in cats.items()
        for i in range(len(vals))
    }
    coef = dict(zip(model["features"], model["coefficients"]))
    pairs = []
    for c, b in zip(model["features"], model["coefficients"]):
        if c not in dummy_of:
            pairs.append((c, abs(b) * mad[c]))
    for col, vals in cats.items():
        # every training row activates exactly ONE category, so the
        # column's mean |attribution| has the exact closed form
        # Σ_c freq_c · |w_c − w̄| with w̄ = Σ_j freq_j·w_j — the dummy
        # MEANS are the frequencies; no extra pass needed
        ws = [coef[_dummy_name(col, i)] for i in range(len(vals))]
        fs = [means[_dummy_name(col, i)] for i in range(len(vals))]
        wbar = sum(w * f for w, f in zip(ws, fs))
        pairs.append(
            (col, sum(f * abs(w - wbar) for w, f in zip(ws, fs)))
        )
    rows = sorted(pairs, key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        rows, "feature string, attribution double"
    )


# -- categorical features (r10): BigQuery's automatic dummy encoding ----------


def _dummy_name(col: str, i: int) -> str:
    return f"__cat_{col}_{i}"


def detect_categoricals(
    df: DataFrame, features: list[str], max_categories: int = 256
) -> dict[str, list]:
    """String-typed feature columns become categorical: their
    vocabulary (distinct values, NULL included — BigQuery one-hot
    encodes NULL as its own category) is collected ONCE at fit time,
    sorted for determinism, bounded loudly. The vocabulary is model
    metadata (k values per column), never data."""
    from pyspark.sql.types import StringType

    cats: dict[str, list] = {}
    str_cols = [
        f.name for f in df.schema.fields
        if f.name in features and isinstance(f.dataType, StringType)
    ]
    for col in str_cols:
        vals = [
            r[0]
            for r in df.select(col).distinct().limit(
                max_categories + 1
            ).collect()
        ]
        if len(vals) > max_categories:
            raise ValueError(
                f"categorical feature {col!r} has more than "
                f"{max_categories} distinct values — hash or bucket it "
                "explicitly (TRANSFORM), or drop it"
            )
        cats[col] = sorted(
            (v for v in vals if v is not None)
        ) + ([None] if None in vals else [])
    return cats


def with_dummies(df: DataFrame, categorical: dict[str, list]) -> DataFrame:
    """One-hot expansion as a single codegen projection: one 0/1
    double column per (column, category). Unseen categories at predict
    time encode as all-zeros (BigQuery scores them as the baseline —
    documented)."""
    cols = [df[c] for c in df.columns]
    for col, vals in categorical.items():
        for i, v in enumerate(vals):
            c = F.col(col)
            d = (c.isNull() if v is None else (c == F.lit(v)))
            cols.append(
                F.coalesce(d.cast("double"), F.lit(0.0)).alias(
                    _dummy_name(col, i)
                )
            )
    return df.select(*cols)


def expand_features(
    features: list[str], categorical: dict[str, list]
) -> list[str]:
    out = []
    for f in features:
        if f in categorical:
            out.extend(
                _dummy_name(f, i) for i in range(len(categorical[f]))
            )
        else:
            out.append(f)
    return out
