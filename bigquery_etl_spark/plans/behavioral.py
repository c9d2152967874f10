"""Behavioral analytics over the events stream: ordered funnels and
cohort retention — the product-analytics surface (Amplitude/GA-class
queries) a warehouse-backed events pipeline serves daily (the reference
delegates these to BigQuery wholesale; re-expressed Spark-first here).

Scale notes (100 TB events):

- ``q_funnel`` computes an ORDERED 3-stage funnel in ONE shuffle: a
  user-partitioned cumulative window evaluates stage eligibility
  sequentially (a click counts only after the user's first view, a
  purchase only after that click), then a per-user rollup on the same
  partitioning — AQE/exchange reuse keeps it a single hash exchange
  on ``user_id``. The naive form (one self-join per stage, which is
  what the SQL oracle does) is 3 corpus-sized joins; the window form
  is what you run on a trillion events.
- ``q_retention`` is two aggregations co-partitioned on ``user_id``
  (first-touch cohort, then activity offsets) — the join carrying the
  cohort week back onto the user's events reuses the groupBy's hash
  partitioning, so the only extra exchange is the final small
  (cohort, offset) rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load


@query(
    "q_funnel",
    sql="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
        SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM v
        UNION ALL SELECT 2, 'click', COUNT(*) FROM c
        UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p
    ) ORDER BY stage_idx
    """,
    tags=("behavioral", "funnel", "window"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: users reaching each stage,
    where stage N+1 must occur STRICTLY after the user's first
    qualifying stage-N event.

    Cumulative-min windows evaluate the sequence in one pass: ``t1`` =
    earliest view so far; a click row qualifies iff it postdates the
    t1 visible AT THAT ROW (events are ts-ordered, so that is exactly
    "some view happened earlier"); ``t2`` = earliest qualifying click
    so far, and purchases chain off t2 the same way. The per-user min
    of each cumulative column is the stage's first-reach time; stage
    counts are one tiny final aggregate. Strict ``>`` on the timestamp
    value (not row order) keeps tie semantics identical to the
    oracle's join form."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    s2 = s1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        s2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3"))
    )
    counts = per_user.agg(
        F.count("t1").alias("view"),
        F.count("t2").alias("click"),
        F.count("t3").alias("purchase"),
    )
    stages = F.array(
        F.struct(F.lit(1).alias("stage_idx"), F.lit("view").alias("stage"), F.col("view").alias("n_users")),
        F.struct(F.lit(2).alias("stage_idx"), F.lit("click").alias("stage"), F.col("click").alias("n_users")),
        F.struct(F.lit(3).alias("stage_idx"), F.lit("purchase").alias("stage"), F.col("purchase").alias("n_users")),
    )
    return (
        counts.select(F.explode(stages).alias("s"))
        .select("s.stage_idx", "s.stage", "s.n_users")
        .orderBy("stage_idx")
    )


@query(
    "q_retention",
    sql="""
    WITH cohorts AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST((CAST(date_trunc('week', e.ts) AS DATE) - c.cohort_week) / 7
                AS INTEGER) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN cohorts c ON e.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("behavioral", "retention"),
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-touch
    week, counted distinct in each subsequent activity week. First
    aggregate and the cohort join share the ``user_id`` hash
    partitioning (one exchange, reused); only the tiny
    (cohort, offset) rollup re-shuffles."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        e.join(cohorts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q_drift_psi",
    sql="""
    WITH a AS (
        SELECT event_type,
               CAST(LEAST(GREATEST(FLOOR((value - 0.0)/50.0), 0), 9) AS INT) AS bin
        FROM events WHERE ts < TIMESTAMP '2024-01-08'
    ), b AS (
        SELECT event_type,
               CAST(LEAST(GREATEST(FLOOR((value - 0.0)/50.0), 0), 9) AS INT) AS bin
        FROM events WHERE ts >= TIMESTAMP '2024-01-22'
    ), groups AS (
        SELECT DISTINCT event_type FROM (
            SELECT event_type FROM a UNION ALL SELECT event_type FROM b
        )
    ), grid AS (
        SELECT g.event_type, i.bin
        FROM groups g, (SELECT unnest(generate_series(0, 9)) AS bin) i
    ), ca AS (
        SELECT event_type, bin, COUNT(*) AS c_a FROM a GROUP BY 1, 2
    ), cb AS (
        SELECT event_type, bin, COUNT(*) AS c_b FROM b GROUP BY 1, 2
    ), j AS (
        SELECT grid.event_type, grid.bin,
               COALESCE(ca.c_a, 0) AS c_a, COALESCE(cb.c_b, 0) AS c_b
        FROM grid
        LEFT JOIN ca USING (event_type, bin)
        LEFT JOIN cb USING (event_type, bin)
    ), t AS (
        SELECT event_type, SUM(c_a) AS t_a, SUM(c_b) AS t_b FROM j GROUP BY 1
    )
    SELECT j.event_type,
           SUM(CAST(ROUND(
               ((c_a + 1.0)/(t_a + 10.0) - (c_b + 1.0)/(t_b + 10.0))
               * LN(((c_a + 1.0)/(t_a + 10.0)) / ((c_b + 1.0)/(t_b + 10.0)))
               * 1e6) AS BIGINT)) / 1e6 AS psi,
           CAST(SUM(c_a) AS BIGINT) AS n_a,
           CAST(SUM(c_b) AS BIGINT) AS n_b
    FROM j JOIN t USING (event_type)
    GROUP BY 1
    """,
    tags=("behavioral", "dq", "drift"),
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per-event-type Population Stability
    Index of `value` between the first week and the last ~9 days of
    the event window (10 equal-width bins over [0, 500), Laplace-
    smoothed, per-bin terms snapped to a 1e-6 grid for cross-engine
    determinism — operators/dq.py psi_drift)."""
    from bigquery_etl_spark.operators.dq import psi_drift

    e = load(spark, sf_dir, "events")
    a = e.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    b = e.filter(F.col("ts") >= F.lit("2024-01-22").cast("timestamp"))
    return psi_drift(a, b, "value", ["event_type"], lo=0.0, width=50.0)
