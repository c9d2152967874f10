"""Thirteenth coverage pack (r10) — VERDICT r9's ranked gap list:

- Delta MULTI-PART + V2 (UUID/sidecar) checkpoint interop: the reader
  (sources/delta_read.py) now consumes all three public checkpoint
  naming schemes; ``q_delta_multipart_interop`` reads the SAME table
  once through a multi-part checkpoint (time travel to v0) and once
  through a v2 UUID checkpoint with a sidecar (latest), both twinned
  against raw-parquet recomputation.
- MULTIPOLYGON + LINESTRING GIS subset (``q_gis_multipolygon``,
  ``q_gis_linestring``) — closed-form even-odd / segment-distance
  lowering the DuckDB oracle evaluates identically.
- APPROX_TOP_COUNT / APPROX_TOP_SUM (``q_approx_top``) — exact
  grouped top-k lowering (bounded group cardinality), BigQuery STRUCT
  array return shape flattened for the driver's hasher.
- BQML TRANSFORM clause (``q_ml_transform``) — model trained with a
  TRANSFORM must score raw input identically to the same model
  trained on pre-transformed input.

Reference parity: the reference delegates its SQL surface to BigQuery
(reference main.py:21, 49-50, 160-185); these close the corresponding
delegated-surface gaps ranked in VERDICT r9 "What's missing".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


@query(
    "q_delta_multipart_interop",
    sql="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 4 = 0
    ),
    v0 AS (
        SELECT 'v0' AS snap, o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 8 = 0
    ),
    latest AS (
        SELECT 'latest' AS snap, o_orderstatus, o_totalprice FROM base
    ),
    u AS (SELECT * FROM v0 UNION ALL SELECT * FROM latest)
    SELECT snap, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS DOUBLE)
               AS total
    FROM u GROUP BY snap, o_orderstatus ORDER BY snap, o_orderstatus
    """,
    tags=("sources", "interop"),
    # oracle recomputes from raw parquet (DuckDB has no Delta reader
    # here) — value-exact, not comparable work
    twin="invariant",
)
def q_delta_multipart_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta MULTI-PART + V2 checkpoints (r10, closing VERDICT r9 gap
    #1): a hand-laid table whose version 0 is served by a 2-part
    ``n.checkpoint.o.p.parquet`` set (protocol+meta in part 1, the add
    in part 2) and whose latest version is served by a v2 UUID-named
    checkpoint whose add-actions live in a ``_delta_log/_sidecars/``
    parquet referenced by a ``sidecar`` action (Delta PROTOCOL.md
    "Checkpoints"). Reading version=0 exercises the multi-part path,
    reading latest exercises the v2+sidecar path; both snapshots are
    twinned against the oracle's raw-parquet recomputation. Metadata
    stays driver-side KBs; the data path is the ordinary distributed
    JVM parquet scan."""
    import os

    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.delta_read import read_delta

    def _build(path: str) -> None:
        import json as _json
        import shutil

        root = os.path.join(path, "mp")
        base = load(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 4 == 0
        ).select("o_orderkey", "o_orderstatus", "o_totalprice")
        schema_json = base.schema.json()

        def _one(df, rel):
            tmp = os.path.join(root, rel + ".dir")
            df.coalesce(1).write.parquet(tmp)
            part = [x for x in os.listdir(tmp)
                    if x.endswith(".parquet")][0]
            final = os.path.join(root, rel)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            shutil.move(os.path.join(tmp, part), final)
            shutil.rmtree(tmp)

        _one(base.filter(F.col("o_orderkey") % 8 == 0), "f1.parquet")
        _one(base.filter(F.col("o_orderkey") % 8 != 0), "f2.parquet")
        log = os.path.join(root, "_delta_log")
        os.makedirs(log, exist_ok=True)
        meta = {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": [],
            "configuration": {},
        }
        add1 = {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                "modificationTime": 0, "dataChange": True}
        add2 = {"path": "f2.parquet", "partitionValues": {}, "size": 1,
                "modificationTime": 0, "dataChange": True}
        ck_schema = (
            "protocol struct<minReaderVersion int, minWriterVersion int,"
            " readerFeatures array<string>>, "
            "metaData struct<id string, format struct<provider string>,"
            " schemaString string, partitionColumns array<string>,"
            " configuration map<string,string>>, "
            "add struct<path string, partitionValues map<string,string>,"
            " size long, modificationTime long, dataChange boolean>, "
            "sidecar struct<path string, sizeInBytes long>"
        )

        def _ck(rows, rel):
            df = spark.createDataFrame(rows, ck_schema)
            _one(df.coalesce(1), os.path.join("_delta_log", rel))

        # version 0: 2-part multi-part checkpoint
        proto1 = {"minReaderVersion": 1, "minWriterVersion": 2,
                  "readerFeatures": None}
        _ck([(proto1, meta, None, None)],
            f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet")
        _ck([(None, None, add1, None)],
            f"{0:020d}.checkpoint.{2:010d}.{2:010d}.parquet")
        # version 1: JSON commit adds f2, then a v2 UUID checkpoint at
        # v1 whose adds live in a sidecar — the reader must prefer it
        with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
            f.write(_json.dumps({"add": add2}) + "\n")
        _ck([(None, None, add1, None), (None, None, add2, None)],
            os.path.join("_sidecars", "sc-1.parquet"))
        proto3 = {"minReaderVersion": 3, "minWriterVersion": 7,
                  "readerFeatures": ["v2Checkpoint"]}
        _ck(
            [
                (proto3, None, None, None),
                (None, meta, None, None),
                (None, None, None, {"path": "sc-1.parquet",
                                    "sizeInBytes": 1}),
            ],
            f"{1:020d}.checkpoint."
            "3f1c9a2e-4b5d-4c6e-8f7a-1b2c3d4e5f60.parquet",
        )

    d = scratch_build(
        f"delta_multipart:{sf_dir}", "delta-mp-", _build
    )
    root = os.path.join(d, "mp")
    v0 = read_delta(spark, root, version=0).select(
        F.lit("v0").alias("snap"), "o_orderstatus", "o_totalprice"
    )
    latest = read_delta(spark, root).select(
        F.lit("latest").alias("snap"), "o_orderstatus", "o_totalprice"
    )
    return (
        v0.unionByName(latest)
        .groupBy("snap", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,9)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("snap", "o_orderstatus")
    )


# -- GIS: MULTIPOLYGON + LINESTRING (r10, VERDICT r9 gap #2) ------------------
#
# Same contract as coverage12's polygon fences: ONE vertex table
# generates both the BigQuery WKT (Spark side, translate-time unroll)
# and the DuckDB closed-form oracle, so both engines evaluate the
# IDENTICAL planar ray-cast / min-edge-distance / haversine formulas.
# Two disjoint member polygons (one concave, one with a hole) — the
# flattened even-odd parity IS multipolygon containment for disjoint
# members (validated at translate time).

_MP_P1 = [(-60.0, -30.0), (-10.0, -30.0), (-10.0, 10.0), (-35.0, -5.0),
          (-60.0, 10.0)]
_MP_P1_HOLE = [(-50.0, -25.0), (-40.0, -25.0), (-40.0, -15.0),
               (-50.0, -15.0)]
_MP_P2 = [(20.0, -10.0), (55.0, -20.0), (55.0, 25.0), (20.0, 15.0)]
_MP_WKT = (
    "MULTIPOLYGON((("
    + ", ".join(f"{x} {y}" for x, y in _MP_P1 + [_MP_P1[0]])
    + "), ("
    + ", ".join(f"{x} {y}" for x, y in _MP_P1_HOLE + [_MP_P1_HOLE[0]])
    + ")), (("
    + ", ".join(f"{x} {y}" for x, y in _MP_P2 + [_MP_P2[0]])
    + ")))"
)


def _mp_oracle_sql() -> str:
    from bigquery_etl_spark.plans.coverage12 import (
        _DUCK_DIST,
        _DUCK_INSIDE,
        _duck_ring_edges,
    )

    edges = _duck_ring_edges(
        [_MP_P1, _MP_P1_HOLE, _MP_P2],
        polys=[[_MP_P1, _MP_P1_HOLE], [_MP_P2]],
    )
    return f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 19) % 160) - 80 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 13) % 120) - 60 + 0.25 AS DOUBLE) AS plat,
               {edges} AS edges
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN {_DUCK_INSIDE} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inside,
           CAST(SUM(CASE WHEN {_DUCK_DIST} <= 2500000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_near,
           CAST(SUM(CAST(round({_DUCK_DIST}) AS BIGINT)) AS BIGINT)
               AS total_m
    FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q_gis_multipolygon",
    sql=_mp_oracle_sql(),
    tags=("dialect", "geo"),
)
def q_gis_multipolygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOGRAPHY MULTIPOLYGON subset (r10, closing VERDICT r9 gap #2):
    ST_GEOGFROMTEXT('MULTIPOLYGON(…)') parses member polygons (concave
    + holes OK), validates pairwise disjointness at translate time, and
    lowers ST_CONTAINS to the even-odd ray cast over the FLATTENED edge
    set (correct exactly because members are disjoint) and ST_DISTANCE
    to the min across all members' edges — flat constant arithmetic in
    whole-stage codegen, no UDF. Planar edges where BigQuery's are
    geodesics (documented divergence; the ORACLE applies the identical
    formula over the identical edge list, so parity is exact where
    checked). Nested or crossing members refuse loudly. Reference
    surface: BigQuery GEOGRAPHY (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gmp_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   ST_GEOGPOINT(
                       CAST(MOD(c_custkey * 19, 160) - 80 + 0.5
                            AS FLOAT64),
                       CAST(MOD(c_custkey * 13, 120) - 60 + 0.25
                            AS FLOAT64)) AS pt
            FROM gmp_cust
        )
        SELECT c_mktsegment,
               COUNTIF(ST_CONTAINS(
                   ST_GEOGFROMTEXT('{_MP_WKT}'), pt)) AS n_inside,
               COUNTIF(ST_DWITHIN(pt,
                   ST_GEOGFROMTEXT('{_MP_WKT}'), 2500000.0)) AS n_near,
               CAST(SUM(CAST(ROUND(ST_DISTANCE(pt,
                   ST_GEOGFROMTEXT('{_MP_WKT}'))) AS INT64)) AS INT64)
                   AS total_m
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


# Open polyline "route" for q_gis_linestring: no closing edge, no
# interior — ST_DISTANCE is the min over segments, ST_LENGTH the
# haversine sum (constant-folded at translate time).
_ROUTE = [(-70.0, -40.0), (-30.0, -10.0), (0.0, 0.0), (25.0, 20.0),
          (60.0, 30.0)]
_ROUTE_WKT = "LINESTRING(" + ", ".join(
    f"{x} {y}" for x, y in _ROUTE) + ")"


def _route_length_m() -> float:
    import math

    r = 6371008.8
    total = 0.0
    for (ax, ay), (bx, by) in zip(_ROUTE, _ROUTE[1:]):
        total += 2.0 * r * math.asin(math.sqrt(
            math.sin(math.radians(by - ay) / 2) ** 2
            + math.cos(math.radians(ay)) * math.cos(math.radians(by))
            * math.sin(math.radians(bx - ax) / 2) ** 2))
    return total


def _line_oracle_sql() -> str:
    from bigquery_etl_spark.plans.coverage12 import (
        _DUCK_GEO_EDGE_DIST,
        _duck_geo_edge,
    )

    # open chain: consecutive vertex pairs only (no closing edge);
    # geodesic arc distance per segment (r11 — mirrors _seg_geo_sql)
    edges = "[" + ", ".join(
        _duck_geo_edge(ax, ay, bx, by)
        for (ax, ay), (bx, by) in zip(_ROUTE, _ROUTE[1:])
    ) + "]"
    dist = (
        "list_aggregate(list_transform(edges, __e -> "
        + _DUCK_GEO_EDGE_DIST
        + "), 'min')"
    )
    return f"""
    WITH pts AS (
        SELECT c_mktsegment,
               CAST(((c_custkey * 23) % 200) - 100 + 0.5 AS DOUBLE) AS plon,
               CAST(((c_custkey * 11) % 130) - 65 + 0.25 AS DOUBLE) AS plat,
               {edges} AS edges
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN {dist} <= 1500000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_near,
           CAST(SUM(CAST(round({dist}) AS BIGINT)) AS BIGINT) AS total_m,
           CAST(round({_route_length_m()!r}) AS BIGINT) AS route_m
    FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q_gis_linestring",
    sql=_line_oracle_sql(),
    tags=("dialect", "geo"),
)
def q_gis_linestring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOGRAPHY LINESTRING subset (r10, closing VERDICT r9 gap #2):
    ST_GEOGFROMTEXT('LINESTRING(…)') parses the open vertex chain;
    ST_LENGTH constant-folds the haversine segment sum at translate
    time and ST_DISTANCE(point, line) unrolls the min over segments of
    the closest-point haversine (no closing edge, no interior — the
    exact open-chain semantics). The ORACLE recomputes the identical
    forms; the length constant is derived independently from the same
    vertex table. Computed (non-literal) linestrings refuse loudly."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "customer").createOrReplaceTempView("gls_cust")
    cat = LakeCatalog(spark)
    return cat.bq_sql(f"""
        WITH pts AS (
            SELECT c_mktsegment,
                   ST_GEOGPOINT(
                       CAST(MOD(c_custkey * 23, 200) - 100 + 0.5
                            AS FLOAT64),
                       CAST(MOD(c_custkey * 11, 130) - 65 + 0.25
                            AS FLOAT64)) AS pt
            FROM gls_cust
        )
        SELECT c_mktsegment,
               COUNTIF(ST_DWITHIN(pt,
                   ST_GEOGFROMTEXT('{_ROUTE_WKT}'), 1500000.0)) AS n_near,
               CAST(SUM(CAST(ROUND(ST_DISTANCE(pt,
                   ST_GEOGFROMTEXT('{_ROUTE_WKT}'))) AS INT64)) AS INT64)
                   AS total_m,
               CAST(ROUND(ST_LENGTH(
                   ST_GEOGFROMTEXT('{_ROUTE_WKT}'))) AS INT64) AS route_m
        FROM pts GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)


@query(
    "q_approx_top",
    sql="""
    WITH v AS (
        SELECT o_orderpriority AS prio,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL
                    ELSE o_orderstatus END AS val,
               CAST(NULLIF(o_orderkey % 7, 0) AS BIGINT) AS w
        FROM orders WHERE o_orderkey % 2 = 1
    ),
    rc AS (
        SELECT prio, 'count' AS fn, val,
               CAST(m AS DOUBLE) AS metric,
               ROW_NUMBER() OVER (
                   PARTITION BY prio
                   ORDER BY m DESC, val ASC NULLS LAST) AS rank
        FROM (SELECT prio, val, COUNT(*) AS m FROM v GROUP BY prio, val)
    ),
    rs AS (
        SELECT prio, 'sum' AS fn, val,
               CAST(m AS DOUBLE) AS metric,
               ROW_NUMBER() OVER (
                   PARTITION BY prio
                   ORDER BY m DESC, val ASC NULLS LAST) AS rank
        FROM (SELECT prio, val, SUM(w) AS m FROM v
              WHERE w IS NOT NULL GROUP BY prio, val)
    )
    SELECT prio, fn, CAST(rank AS BIGINT) AS rank, val AS value, metric
    FROM (SELECT * FROM rc WHERE rank <= 2
          UNION ALL SELECT * FROM rs WHERE rank <= 3)
    """,
    tags=("agg", "approx", "dialect"),
)
def q_approx_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_TOP_COUNT / APPROX_TOP_SUM (r10, closing VERDICT r9 gap
    #3): the BigQuery spellings now resolve (bq_dialect
    _approx_top_count_rewriter/_approx_top_sum_rewriter) to an EXACT
    top-k in BigQuery's ARRAY<STRUCT> return shape — one collect_list
    aggregate post-processed by JVM-side higher-order functions with a
    deterministic freq-desc/value-asc tie-break (BigQuery leaves ties
    unspecified; exact answers are legal for APPROX_ functions). The
    test column exercises both NULL semantics: NULL VALUES are counted
    (TOP_COUNT) and NULL WEIGHTS drop the row (TOP_SUM). The arrays are
    flattened to (prio, fn, rank, value, metric) rows for the driver's
    hasher; the oracle recomputes the exact top-k relationally. Scope:
    bounded-cardinality columns — unbounded heavy hitters use the CMS
    operator (operators/sketches.py, C27). Reference surface: BigQuery
    approximate aggregates (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("atc_orders")
    cat = LakeCatalog(spark)
    res = cat.bq_sql("""
        SELECT o_orderpriority AS prio,
               APPROX_TOP_COUNT(
                   CASE WHEN MOD(o_orderkey, 11) = 0 THEN NULL
                        ELSE o_orderstatus END, 2) AS tc,
               APPROX_TOP_SUM(
                   CASE WHEN MOD(o_orderkey, 11) = 0 THEN NULL
                        ELSE o_orderstatus END,
                   CAST(NULLIF(MOD(o_orderkey, 7), 0) AS INT64), 3) AS ts
        FROM atc_orders WHERE MOD(o_orderkey, 2) = 1
        GROUP BY o_orderpriority
    """)
    # flatten BOTH arrays in ONE pass: a naive per-array
    # posexplode+union would rebuild the whole collect_list aggregate
    # twice (no plan reuse across DataFrame branches) — measured 2x
    # the wall at sf0.1
    comb = F.concat(
        F.expr(
            "transform(tc, (e, i) -> struct('count' AS fn, "
            "CAST(i + 1 AS BIGINT) AS rank, e.value AS value, "
            "CAST(e.count AS DOUBLE) AS metric))"
        ),
        F.expr(
            "transform(ts, (e, i) -> struct('sum' AS fn, "
            "CAST(i + 1 AS BIGINT) AS rank, e.value AS value, "
            "CAST(e.sum AS DOUBLE) AS metric))"
        ),
    )
    # no cosmetic global sort: the driver's value hash is order-
    # insensitive and a 25-row range exchange is pure per-query floor
    return res.select("prio", F.explode(comb).alias("e")).select(
        "prio", "e.fn", "e.rank", "e.value", "e.metric"
    )


@query(
    "q_ml_transform",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS fit_exact, TRUE AS r2_perfect
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    tags=("ml", "dialect"),
    # invariant twin: scaler statistics live in engine float space, so
    # the CHECK is the planted-exactness property, not value equality
    twin="invariant",
)
def q_ml_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML TRANSFORM clause (r10, closing VERDICT r9 gap #4):
    ``CREATE MODEL … TRANSFORM(ML.STANDARD_SCALER(x) OVER() AS sx,
    ML.MIN_MAX_SCALER(x2) OVER() AS mx, x*x2 AS xx, y) OPTIONS(…)``
    trains on the TRANSFORMED features and persists the transform —
    including the FIT-time scaler statistics — inside the model, so
    ``ML.PREDICT`` re-applies it to raw input (BigQuery's contract;
    lake_sql.py _parse_transform/_fit_transform/
    _apply_transform_columns). Scaler stats are ONE distributed
    aggregate pass; fit/predict arithmetic is identical baked-constant
    codegen, so a model trained with TRANSFORM scores raw rows exactly
    like one trained on pre-transformed rows. The invariant: y is
    affine in (x1, x2), scaling is affine, so the normal-equation fit
    in scaled space must reproduce y to machine precision on RAW
    input — fit_exact pins max|predicted-y| < 1e-6 and r2_perfect pins
    ML.EVALUATE's r2_score = 1. Reference surface: BigQuery ML
    (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    ).select(
        (F.col("o_orderkey") % 97).cast("double").alias("x1"),
        (F.col("o_custkey") % 53).cast("double").alias("x2"),
    ).withColumn(
        "y", F.lit(3.0) * F.col("x1") - F.lit(2.0) * F.col("x2") + F.lit(1.0)
    ).createOrReplaceTempView("mltr_pts")
    cat = LakeCatalog(spark)
    cat.bq_sql("""
        CREATE OR REPLACE MODEL mltr_m
        TRANSFORM(ML.STANDARD_SCALER(x1) OVER() AS sx1,
                  ML.MIN_MAX_SCALER(x2) OVER() AS mx2,
                  x1 * x2 AS xx, y)
        OPTIONS(model_type='linear_reg', input_label_cols=['y'])
        AS SELECT x1, x2, y FROM mltr_pts
    """)
    pred = cat.bq_sql("""
        SELECT * FROM ML.PREDICT(MODEL mltr_m,
                                 (SELECT x1, x2, y FROM mltr_pts))
    """)
    ev = cat.bq_sql("""
        SELECT r2_score FROM ML.EVALUATE(MODEL mltr_m,
                                         (SELECT x1, x2, y FROM mltr_pts))
    """)
    # single returned plan: 1-row error/count summary crossed with the
    # 1-row evaluate frame (the sanctioned q_tfidf pattern)
    summ = pred.agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(F.abs(F.col("predicted_y") - F.col("y"))).alias("__err"),
    )
    return summ.crossJoin(ev).select(
        F.col("__n").cast("long").alias("n"),
        (F.col("__err") < 1e-6).alias("fit_exact"),
        (F.abs(F.col("r2_score") - 1.0) < 1e-9).alias("r2_perfect"),
    )


@query(
    "q_ml_inspect",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS cm_diagonal, TRUE AS roc_monotone,
           TRUE AS auc_perfect, TRUE AS loss_decreasing,
           TRUE AS feature_stats_exact
    FROM orders WHERE o_orderkey % 5 = 0
    """,
    tags=("ml", "dialect"),
    # invariant twin: model internals live in engine float space; the
    # checks are planted-separability properties
    twin="invariant",
)
def q_ml_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML inspection surface (r10): ML.CONFUSION_MATRIX (groupBy-
    pivot of the scored input), ML.ROC_CURVE (EXACT per-threshold
    counts in ONE 2T+2-scalar aggregate pass, inline()-reshaped to
    BigQuery's row-per-threshold), ML.TRAINING_INFO (per-iteration
    IRLS loss riding the existing Newton pass for free) and
    ML.FEATURE_INFO (fit-time per-feature stats pass persisted with
    the model). Invariants on a linearly separable planted label: the
    confusion matrix is exactly diagonal, recall/FPR are monotone
    non-increasing in the threshold with endpoints (1,1)->(~0,0), the
    trapezoid AUC is 1, the IRLS loss trajectory strictly decreases
    from ln 2, and FEATURE_INFO's min/max/mean match exact aggregates.
    Reference surface: BigQuery ML (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 5 == 0
    ).select(
        (F.col("o_orderkey") % 83).cast("double").alias("x1"),
        (F.col("o_custkey") % 29).cast("double").alias("x2"),
    ).withColumn(
        "y",
        (F.col("x1") - F.col("x2") > F.lit(20.0)).cast("int"),
    ).createOrReplaceTempView("mli_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL mli_m OPTIONS("
        "model_type='logistic_reg', input_label_cols=['y'], "
        "max_iterations=16) AS SELECT * FROM mli_pts"
    )
    cm = cat.sql(
        "SELECT * FROM ML.CONFUSION_MATRIX(MODEL mli_m, TABLE mli_pts)"
    )
    cm_ok = cm.agg(
        F.min(
            F.when(F.col("expected_label") == "0", F.col("1") == 0)
            .otherwise(F.col("0") == 0)
        ).alias("ok")
    )
    roc = cat.sql(
        "SELECT * FROM ML.ROC_CURVE(MODEL mli_m, TABLE mli_pts)"
    )
    w = Window.orderBy("threshold")
    roc_chk = roc.select(
        "threshold", "recall", "false_positive_rate",
        (F.lag("recall").over(w) >= F.col("recall")).alias("__r_mono"),
        (F.lag("false_positive_rate").over(w)
         >= F.col("false_positive_rate")).alias("__f_mono"),
        # trapezoid AUC over the (fpr, recall) staircase
        ((F.lag("false_positive_rate").over(w)
          - F.col("false_positive_rate"))
         * (F.lag("recall").over(w) + F.col("recall")) / 2.0
         ).alias("__auc_piece"),
    ).agg(
        F.min(F.coalesce("__r_mono", F.lit(True))).alias("r_mono"),
        F.min(F.coalesce("__f_mono", F.lit(True))).alias("f_mono"),
        F.sum("__auc_piece").alias("auc"),
    )
    ti = cat.sql("SELECT * FROM ML.TRAINING_INFO(MODEL mli_m)")
    wi = Window.orderBy("iteration")
    ti_chk = ti.select(
        (F.lag("loss").over(wi) > F.col("loss")).alias("__dec")
    ).agg(F.min(F.coalesce("__dec", F.lit(True))).alias("dec"))
    fi = cat.sql("SELECT * FROM ML.FEATURE_INFO(MODEL mli_m)")
    exact = spark.table("mli_pts").agg(
        F.min("x1").alias("mn1"), F.max("x1").alias("mx1"),
        F.avg("x1").alias("me1"),
    )
    fi_chk = fi.filter(F.col("input") == "x1").crossJoin(exact).select(
        ((F.col("min") == F.col("mn1")) & (F.col("max") == F.col("mx1"))
         & (F.abs(F.col("mean") - F.col("me1")) < 1e-9)).alias("fs_ok")
    )
    n_df = spark.table("mli_pts").agg(F.count(F.lit(1)).alias("__n"))
    return (
        n_df.crossJoin(cm_ok).crossJoin(roc_chk).crossJoin(ti_chk)
        .crossJoin(fi_chk)
        .select(
            F.col("__n").cast("long").alias("n"),
            F.col("ok").alias("cm_diagonal"),
            (F.col("r_mono") & F.col("f_mono")).alias("roc_monotone"),
            (F.abs(F.col("auc") - 1.0) < 1e-9).alias("auc_perfect"),
            F.col("dec").alias("loss_decreasing"),
            F.col("fs_ok").alias("feature_stats_exact"),
        )
    )


@query(
    "q_ml_anomaly",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS planted_flagged, TRUE AS rate_calibrated,
           TRUE AS pca_planted_flagged
    FROM customer
    """,
    tags=("ml", "dialect"),
    twin="invariant",
)
def q_ml_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML.DETECT_ANOMALIES (r10) for kmeans (distance to nearest
    centroid) and pca (truncated-basis reconstruction error) — the
    threshold is the (1-contamination) quantile of the TRAINING
    distance/error distribution persisted at fit time (one extra
    percentile pass; BigQuery's contract that thresholds come from
    training data, not the scored input), scoring is one broadcast-
    constants codegen projection. Invariants: planted far outliers
    (coordinates 100x the data range) must all flag for BOTH models,
    and the kmeans flag rate on training data must be within 2x of
    the requested contamination. ARIMA in-sample detection refuses
    loudly. Reference: BigQuery ML (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    # train on CLEAN data only — an outlier inside the training set
    # captures a kmeans centroid / rotates the PCA basis toward
    # itself and is then, correctly, not anomalous
    load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 37).cast("double").alias("a"),
        ((F.col("c_custkey") % 23) + (F.col("c_custkey") % 37) * 0.5)
        .cast("double").alias("b"),
    ).createOrReplaceTempView("mla_train")
    spark.table("mla_train").unionAll(
        spark.range(8).select(
            (F.lit(5000.0) + F.col("id") * 10).alias("a"),
            (F.lit(-4000.0) - F.col("id") * 10).alias("b"),
        )
    ).createOrReplaceTempView("mla_score")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL mla_km OPTIONS(model_type='kmeans', "
        "num_clusters=4, max_iterations=6) AS SELECT * FROM mla_train"
    )
    cat.sql(
        "CREATE OR REPLACE MODEL mla_pca OPTIONS(model_type='pca', "
        "num_principal_components=1) AS SELECT * FROM mla_train"
    )
    km = cat.sql(
        "SELECT a, is_anomaly FROM ML.DETECT_ANOMALIES("
        "MODEL mla_km, STRUCT(0.03 AS contamination), TABLE mla_score)"
    )
    pca = cat.sql(
        "SELECT a, is_anomaly FROM ML.DETECT_ANOMALIES("
        "MODEL mla_pca, STRUCT(0.03 AS contamination), TABLE mla_score)"
    )
    planted = F.col("a") >= 4000.0
    km_sum = km.agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.when(planted, F.col("is_anomaly"))).alias("km_planted"),
        F.avg(
            F.when(~planted, F.col("is_anomaly").cast("double"))
        ).alias("km_rate"),
    )
    pca_sum = pca.agg(
        F.min(F.when(planted, F.col("is_anomaly"))).alias("pca_planted")
    )
    return km_sum.crossJoin(pca_sum).select(
        (F.col("__n") - 8).cast("long").alias("n"),
        F.col("km_planted").alias("planted_flagged"),
        (F.col("km_rate") <= 0.06).alias("rate_calibrated"),
        F.col("pca_planted").alias("pca_planted_flagged"),
    )


@query(
    "q_ml_split_explain",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS split_disjoint, TRUE AS eval_r2_perfect,
           TRUE AS attrs_sum_exact, TRUE AS global_order_ok
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    tags=("ml", "dialect"),
    twin="invariant",
)
def q_ml_split_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML held-out-split training + explainability (r10):
    ``data_split_method='random'`` carves a DETERMINISTIC hash-based
    eval fraction out of the training frame (xxhash64 over every
    column — reproducible, documented divergence from BigQuery's true
    random); the split predicate + select persist with the model so
    ``ML.EVALUATE(MODEL m)`` with NO input re-evaluates the SAME
    held-out rows (BigQuery's contract). ML.EXPLAIN_PREDICT returns
    EXACT linear Shapley values coef·(x−μ) (μ = fit-time means), so
    attributions sum to prediction−baseline identically;
    ML.GLOBAL_EXPLAIN is |coef|·E|x−μ| from fit-time stats. Invariants
    on a planted affine label: held-out r2 = 1, per-row attribution
    sums reproduce the prediction to 1e-9, and the global ranking
    matches the analytic |coef|·E|x−μ| ordering. Reference: BigQuery
    ML (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 == 0
    ).select(
        (F.col("o_orderkey") % 61).cast("double").alias("x1"),
        (F.col("o_custkey") % 31).cast("double").alias("x2"),
    ).withColumn(
        "y", F.lit(4.0) * F.col("x1") - F.lit(0.5) * F.col("x2") + F.lit(2.0)
    ).createOrReplaceTempView("mse_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL mse_m OPTIONS("
        "model_type='linear_reg', input_label_cols=['y'], "
        "data_split_method='random', data_split_eval_fraction=0.25) "
        "AS SELECT * FROM mse_pts"
    )
    model = cat.models["mse_m"]
    cond = model["data_split"]["condition"]
    pts = spark.table("mse_pts")
    split_chk = pts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.expr(cond).cast("long")).alias("__n_eval"),
    )
    ev = cat.sql("SELECT r2_score FROM ML.EVALUATE(MODEL mse_m)")
    ep = cat.sql(
        "SELECT * FROM ML.EXPLAIN_PREDICT(MODEL mse_m, "
        "(SELECT x1, x2 FROM mse_pts), STRUCT(2 AS top_k_features))"
    )
    ep_chk = ep.select(
        (
            F.abs(
                F.col("baseline_prediction_value")
                + F.expr(
                    "aggregate(top_feature_attributions, 0.0D, "
                    "(a, e) -> a + e.attribution)"
                )
                - F.col("prediction_value")
            )
            < 1e-9
        ).alias("__sum_ok")
    ).agg(F.min("__sum_ok").alias("sum_ok"))
    ge = cat.sql("SELECT * FROM ML.GLOBAL_EXPLAIN(MODEL mse_m)")
    # analytic ordering: |4|*E|x1-mu1| vs |-0.5|*E|x2-mu2| -> x1 first
    ge_chk = ge.orderBy(F.desc("attribution")).limit(1).select(
        (F.col("feature") == "x1").alias("top_is_x1")
    )
    return (
        split_chk.crossJoin(ev).crossJoin(ep_chk).crossJoin(ge_chk)
        .select(
            F.col("__n").cast("long").alias("n_rows"),
            ((F.col("__n_eval") > 0) & (F.col("__n_eval") < F.col("__n")))
            .alias("split_disjoint"),
            (F.abs(F.col("r2_score") - 1.0) < 1e-9).alias(
                "eval_r2_perfect"
            ),
            F.col("sum_ok").alias("attrs_sum_exact"),
            F.col("top_is_x1").alias("global_order_ok"),
        )
    )


@query(
    "q_ml_prefuncs",
    sql="""
    WITH v AS (
        SELECT o_orderpriority AS prio,
               CAST(o_orderkey % 97 AS DOUBLE) AS x
        FROM orders
    ),
    s AS (
        SELECT prio,
               CASE WHEN STDDEV_SAMP(x) OVER w = 0 THEN 0.0
                    ELSE (x - AVG(x) OVER w) / STDDEV_SAMP(x) OVER w
               END AS sx,
               CASE WHEN MAX(x) OVER w = MIN(x) OVER w THEN 0.0
                    ELSE (x - MIN(x) OVER w)
                         / (MAX(x) OVER w - MIN(x) OVER w)
               END AS mx,
               CASE WHEN x < 30 THEN 1 WHEN x < 60 THEN 2 ELSE 3 END
                   AS bin
        FROM v WINDOW w AS (PARTITION BY prio)
    )
    SELECT prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(sx * sx), 6) AS DOUBLE) AS ss_energy,
           CAST(ROUND(SUM(mx), 6) AS DOUBLE) AS mm_sum,
           CAST(SUM(bin) AS BIGINT) AS bin_sum
    FROM s GROUP BY prio ORDER BY prio
    """,
    tags=("ml", "dialect", "window"),
)
def q_ml_prefuncs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML.* preprocessing functions as PLAIN analytic functions (r10):
    outside CREATE MODEL, ML.STANDARD_SCALER(x) OVER(w) /
    ML.MIN_MAX_SCALER(x) OVER(w) expand in the dialect to their
    window-aggregate closed forms over the SAME window (zero-variance
    guard included) and ML.BUCKETIZE(x, splits) to a stateless
    'bin_<i>' label — all whole-stage-codegen window/scalar
    arithmetic, no UDF, no extra shuffle beyond the window's own
    partitioning. EXACT twin: DuckDB evaluates the identical closed
    forms (the scaled sum-of-squares per group equals n-1 for the
    sample stddev — checked through the generic value hash, not a
    special case). Reference: BigQuery preprocessing functions
    (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "orders").createOrReplaceTempView("mlp_orders")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        WITH v AS (
            SELECT o_orderpriority AS prio,
                   CAST(MOD(o_orderkey, 97) AS FLOAT64) AS x
            FROM mlp_orders
        ),
        s AS (
            SELECT prio, x,
                   ML.STANDARD_SCALER(x) OVER (PARTITION BY prio) AS sx,
                   ML.MIN_MAX_SCALER(x) OVER (PARTITION BY prio) AS mx,
                   ML.BUCKETIZE(x, [30.0, 60.0]) AS bk
            FROM v
        )
        SELECT prio,
               CAST(COUNT(*) AS INT64) AS n,
               CAST(ROUND(SUM(sx * sx), 6) AS FLOAT64) AS ss_energy,
               CAST(ROUND(SUM(mx), 6) AS FLOAT64) AS mm_sum,
               CAST(SUM(CAST(SUBSTR(bk, 5) AS INT64)) AS INT64) AS bin_sum
        FROM s
        GROUP BY prio
        ORDER BY prio
    """)


@query(
    "q_appends_changes",
    sql="""
    WITH base AS (
        SELECT o_orderkey AS k,
               CAST(o_orderkey % 100 AS DOUBLE) AS v
        FROM orders WHERE o_orderkey % 4 = 1
    ),
    ins AS (SELECT k, v FROM base WHERE k % 8 IN (1, 5))
    SELECT 'appends' AS src, k, v, 'INSERT' AS ct FROM ins
    UNION ALL SELECT 'changes', k, v, 'INSERT' FROM ins
    UNION ALL SELECT 'changes', k, -1.0, 'UPDATE'
        FROM base WHERE k % 16 = 1
    UNION ALL SELECT 'changes', k, CAST(k % 100 AS DOUBLE), 'DELETE'
        FROM base WHERE k % 16 = 9
    ORDER BY src, k, ct
    """,
    tags=("cdc", "dialect", "lakehouse"),
)
def q_appends_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery change-history TVFs (r10): ``FROM APPENDS(TABLE t,
    start, end)`` (appended rows only — rewrites excluded, exactly
    BigQuery's rule) and ``FROM CHANGES(TABLE t, start, end)``
    (INSERT / UPDATE post-image / DELETE; requires the change feed —
    BigQuery's enable_change_history — or refuses loudly), both over
    the manifest-versioned store with _CHANGE_TYPE and
    _CHANGE_TIMESTAMP pseudo-columns (lake_sql._rewrite_change_tvfs).
    History: v1 create (k%8=1), v2 append (k%8=5), v3 UPDATE
    (k%16=1 → v=-1), v4 DELETE (k%16=9). The oracle spells every leg
    out in closed form; timestamps are wall-clock so the twin
    compares types/keys/values, with timestamp bounds pinned in
    tests/test_lake_sql-adjacent coverage. Fixture built once per
    process (scratch_build). Reference: BigQuery change history
    (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        base = load(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 4 == 1
        ).select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_orderkey") % 100).cast("double").alias("v"),
        )
        t = VersionedTable(spark, path)
        t.create(base.filter(F.col("k") % 8 == 1))
        t.enable_change_feed(["k"])
        t.append(base.filter(F.col("k") % 8 == 5))
        cat = LakeCatalog(spark)
        cat.register("act_build", t)
        cat.sql("UPDATE act_build SET v = -1.0 WHERE k % 16 = 1")
        cat.sql("DELETE FROM act_build WHERE k % 16 = 9")

    d = scratch_build(f"appends_changes:{sf_dir}", "act-", _build)
    cat = LakeCatalog(spark)
    cat.register("act", VersionedTable(spark, d))
    a = cat.sql(
        "SELECT 'appends' AS src, k, v, _CHANGE_TYPE AS ct "
        "FROM APPENDS(TABLE act, NULL, NULL)"
    )
    c = cat.sql(
        "SELECT 'changes' AS src, k, v, _CHANGE_TYPE AS ct "
        "FROM CHANGES(TABLE act, NULL, NULL)"
    )
    return a.unionByName(c).orderBy("src", "k", "ct")


@query(
    "q_row_policy",
    sql="""
    WITH c AS (
        SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    )
    SELECT 'analyst' AS who, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'admin', c_mktsegment, CAST(COUNT(*) AS BIGINT)
    FROM c WHERE c_mktsegment = 'BUILDING' OR c_acctbal < 0
    GROUP BY c_mktsegment
    ORDER BY who, c_mktsegment
    """,
    tags=("security", "lakehouse"),
)
def q_row_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigQuery ROW ACCESS POLICIES (r10): ``CREATE ROW ACCESS POLICY
    p ON t GRANT TO (...) FILTER USING (expr)`` — allowlist row-level
    security applied at READ time (lake_sql._apply_row_policies): a
    policied table shows only rows matching a policy granted to the
    session principal (SESSION_USER() resolves to it), multiple
    granted policies OR together, no granted policy = zero rows.
    The filter lands as an ordinary pushable predicate — `.explain`
    shows it in PushedFilters, so at 100 TB the policy PRUNES the
    scan instead of post-filtering it. The oracle spells out each
    principal's visible-row closed form. Reference: BigQuery
    row-level security (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog
    from bigquery_etl_spark.plans._util import scratch_build
    from bigquery_etl_spark.sources.versioned import VersionedTable

    def _build(path: str) -> None:
        VersionedTable(spark, path).create(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment", "c_acctbal"
            )
        )

    d = scratch_build(f"row_policy:{sf_dir}", "rap-", _build)
    cat = LakeCatalog(spark)
    cat.register("rp_cust", VersionedTable(spark, d))
    cat.sql("""
        CREATE OR REPLACE ROW ACCESS POLICY seg_building ON rp_cust
        GRANT TO ("user:analyst@corp", "user:admin@corp")
        FILTER USING (c_mktsegment = 'BUILDING' AND c_acctbal > 0)
    """)
    cat.sql("""
        CREATE OR REPLACE ROW ACCESS POLICY debtors ON rp_cust
        GRANT TO ("user:admin@corp")
        FILTER USING (c_mktsegment = 'BUILDING' OR c_acctbal < 0)
    """)
    cat.session_user = "analyst@corp"
    analyst = cat.sql(
        "SELECT 'analyst' AS who, c_mktsegment, "
        "CAST(COUNT(*) AS LONG) AS n "
        "FROM rp_cust GROUP BY c_mktsegment"
    )
    cat.session_user = "admin@corp"
    admin = cat.sql(
        "SELECT 'admin' AS who, c_mktsegment, "
        "CAST(COUNT(*) AS LONG) AS n "
        "FROM rp_cust GROUP BY c_mktsegment"
    )
    return analyst.unionByName(admin).orderBy("who", "c_mktsegment")


@query(
    "q_ml_categorical",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS fit_exact, TRUE AS weights_grouped,
           TRUE AS unseen_is_baseline
    FROM orders WHERE o_orderkey % 6 = 0
    """,
    tags=("ml", "dialect"),
    twin="invariant",
)
def q_ml_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQML categorical features (r10): string feature columns are
    automatically dummy-encoded at fit time — the vocabulary (NULL
    included as its own category, BigQuery's rule) persists in the
    model and ML.PREDICT expands raw input identically
    (operators/ml.py detect_categoricals/with_dummies; one codegen
    projection, no shuffle). ML.WEIGHTS returns BigQuery's shape:
    scalar weight for numeric inputs, (category, weight) pairs under
    the ORIGINAL column name for categorical ones. Invariants on a
    planted y = 2x + effect(status) + 1 label: predictions reproduce
    y to 1e-6 on raw input (the fit is exact up to the documented
    minimal ridge), the weights frame groups categories, and an
    unseen category at predict time scores as the baseline
    (all-zero dummies). Other model types REFUSE string features
    loudly (silent NULL-casting would train a wrong model).
    Reference: BigQuery ML (delegated, main.py:21,49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    eff = (
        F.when(F.col("o_orderstatus") == "O", 5.0)
        .when(F.col("o_orderstatus") == "F", -3.0)
        .otherwise(1.5)
    )
    load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 6 == 0
    ).select(
        (F.col("o_orderkey") % 41).cast("double").alias("x"),
        F.col("o_orderstatus").alias("seg"),
        (F.lit(2.0) * (F.col("o_orderkey") % 41) + eff + F.lit(1.0))
        .alias("y"),
    ).createOrReplaceTempView("mlc_pts")
    cat = LakeCatalog(spark)
    cat.sql(
        "CREATE OR REPLACE MODEL mlc_m OPTIONS("
        "model_type='linear_reg', input_label_cols=['y']) "
        "AS SELECT * FROM mlc_pts"
    )
    summ = cat.sql(
        "SELECT COUNT(*) AS __n, MAX(ABS(predicted_y - y)) AS __err "
        "FROM ML.PREDICT(MODEL mlc_m, TABLE mlc_pts)"
    )
    w = cat.sql(
        "SELECT COUNT(*) AS __nw, "
        "SUM(CASE WHEN processed_input = 'seg' "
        "    AND weight IS NULL AND SIZE(category_weights) >= 2 "
        "    THEN 1 ELSE 0 END) AS __grouped "
        "FROM ML.WEIGHTS(MODEL mlc_m)"
    )
    # unseen category -> baseline: prediction must equal intercept +
    # coef_x * x exactly (all dummies zero)
    unseen = cat.sql(
        "SELECT predicted_y FROM ML.PREDICT(MODEL mlc_m, "
        "(SELECT 7.0 AS x, 'ZZZ' AS seg))"
    )
    base = cat.sql(
        "SELECT weight AS w0 FROM ML.WEIGHTS(MODEL mlc_m) "
        "WHERE processed_input = '__INTERCEPT__'"
    ).crossJoin(cat.sql(
        "SELECT weight AS wx FROM ML.WEIGHTS(MODEL mlc_m) "
        "WHERE processed_input = 'x'"
    ))
    return (
        summ.crossJoin(w).crossJoin(unseen).crossJoin(base)
        .select(
            F.col("__n").cast("long").alias("n"),
            (F.col("__err") < 1e-6).alias("fit_exact"),
            ((F.col("__grouped") == 1) & (F.col("__nw") == 3)).alias(
                "weights_grouped"
            ),
            (
                F.abs(
                    F.col("predicted_y")
                    - (F.col("w0") + F.col("wx") * 7.0)
                ) < 1e-9
            ).alias("unseen_is_baseline"),
        )
    )
