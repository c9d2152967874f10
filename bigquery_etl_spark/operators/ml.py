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
    }


def predict_linear_reg(
    df: DataFrame, model: dict, out: str = "predicted_label"
) -> DataFrame:
    """Broadcast-coefficients projection: one codegen map stage."""
    expr = F.lit(model["intercept"])
    for c, b in zip(model["features"], model["coefficients"]):
        expr = expr + F.col(c).cast("double") * F.lit(b)
    return df.withColumn(out, expr)


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
        row = df.agg(*aggs).collect()[0]
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
    return {
        "model_type": "logistic_reg",
        "features": list(features),
        "label": label,
        "intercept": float(beta[0]),
        "coefficients": [float(b) for b in beta[1:]],
    }


def predict_logistic_reg(
    df: DataFrame,
    model: dict,
    out: str = "predicted_label",
    prob_out: str = "predicted_label_prob",
) -> DataFrame:
    """Broadcast-coefficients sigmoid: one codegen map stage, emitting
    BQML's (predicted_label, probability) pair."""
    eta = F.lit(model["intercept"])
    for c, b in zip(model["features"], model["coefficients"]):
        eta = eta + F.col(c).cast("double") * F.lit(b)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    return df.withColumn(prob_out, p).withColumn(
        out, (F.col(prob_out) >= 0.5).cast("int")
    )


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
    finally:
        src.unpersist()
    return {
        "model_type": "kmeans",
        "features": list(features),
        "k": k,
        "centroids": cents,
    }


def predict_kmeans(
    df: DataFrame, model: dict, out: str = "centroid_id"
) -> DataFrame:
    vec = F.array(*[F.col(c).cast("double") for c in model["features"]])
    return df.withColumn(out, _argmin_dist(vec, model["centroids"]))


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
    return {
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
