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
    return _funnel(load(spark, sf_dir, "events"), bound=None)


def _funnel(e: DataFrame, bound) -> DataFrame:
    """Shared machinery for both funnel variants: ``bound`` is None
    (unbounded) or an interval Column — every later stage must then
    also land within ``t1 + bound`` (conversion window anchored at the
    user's first view)."""
    e = e.select("user_id", "ts", "event_type", "event_id")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    def in_window(col):
        if bound is None:
            return F.lit(True)
        return col <= F.col("t1") + bound

    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & in_window(F.col("ts")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & in_window(F.col("ts")),
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
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(name).alias("n_users"),
            )
            for i, name in ((1, "view"), (2, "click"), (3, "purchase"))
        ]
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
    determinism — operators/dq.py psi_drift_sliced: both slices tagged
    in ONE scan of the table)."""
    from bigquery_etl_spark.operators.dq import psi_drift_sliced

    e = load(spark, sf_dir, "events")
    return psi_drift_sliced(
        e,
        F.col("ts") < F.lit("2024-01-08").cast("timestamp"),
        F.col("ts") >= F.lit("2024-01-22").cast("timestamp"),
        "value",
        ["event_type"],
        lo=0.0,
        width=50.0,
    )


@query(
    "q_resample_ohlc",
    sql="""
    SELECT event_type,
           date_trunc('day', ts) AS day,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    tags=("behavioral", "timeseries"),
)
def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC bars per event type:
    open/close via min_by/max_by on the timestamp, high/low plain
    min/max — one scan, one partial+final hash aggregate, no window.
    (min_by/arg_min tie-break identically here: the fixture's ts is
    microsecond-unique within a (type, day).)"""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_anomaly_mad",
    sql="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type,
               median(cents) AS med
        FROM daily GROUP BY 1
    ), dev AS (
        SELECT d.event_type, d.day, d.cents, m.med,
               ABS(d.cents - m.med) AS adev
        FROM daily d JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT dev.event_type, dev.day, dev.cents,
           CAST(dev.adev > 3.0 * 1.4826 * mad.mad AS BOOLEAN) AS is_anomaly
    FROM dev JOIN mad USING (event_type)
    """,
    tags=("behavioral", "timeseries", "dq"),
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on the daily value series per event
    type: flag days whose deviation from the per-type median exceeds
    3 × 1.4826 × MAD (median absolute deviation) — the robust z-score
    that a mean/stddev rule gets wrong when the outliers themselves
    inflate the baseline. Daily sums ride exact integer cents;
    medians of bigints are deterministic in both engines. Two tiny
    aggregates over the (type, day) rollup — the table-sized work is
    the single daily aggregation."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    med = daily.groupBy("event_type").agg(F.median("cents").alias("med"))
    dev = daily.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return dev.join(mad, "event_type").select(
        "event_type",
        "day",
        "cents",
        (F.col("adev") > 3.0 * 1.4826 * F.col("mad")).alias("is_anomaly"),
    )


@query(
    "q_funnel_windowed",
    sql="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t, MIN(v.t) AS t1
        FROM events e
        JOIN v ON e.user_id = v.user_id
              AND e.ts > v.t AND e.ts <= v.t + INTERVAL 7 DAY
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e
        JOIN c ON e.user_id = c.user_id
              AND e.ts > c.t AND e.ts <= c.t1 + INTERVAL 7 DAY
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
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_funnel with a CONVERSION WINDOW: every later stage must land
    within 7 days of the user's FIRST view (the anchored-window metric
    product analytics actually reports). Same one-shuffle cumulative-
    window machinery — the window bound rides along because the
    anchor t1 is already on every row; the oracle keeps the 3-join
    form with the bounds in the join predicates."""
    return _funnel(load(spark, sf_dir, "events"), bound=F.expr("INTERVAL 7 DAY"))



@query(
    "q_attribution",
    sql="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS touch
        FROM events
    )
    SELECT COALESCE(touch, '(none)') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM ordered WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("behavioral", "attribution", "window"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRECEDING non-purchase event ('(none)' when the
    purchase is the user's first event). One user-partitioned window
    pass — lag(... ignore nulls) carries the last touch forward, so no
    self-join against the event history; the groupBy on the tiny
    channel set is the only other exchange."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # Spark's lag() has no IGNORE NULLS; last(ignorenulls) over the
    # strictly-preceding frame is the same carry-forward
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("(none)")).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


@query(
    "q_temporal_join",
    sql="""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    dim AS (
        SELECT user_id, 'bronze' AS segment,
               TIMESTAMP '2024-01-01' AS valid_from
        FROM users WHERE user_id % 2 = 0
        UNION ALL
        SELECT user_id, 'gold', TIMESTAMP '2024-01-15'
        FROM users WHERE user_id % 2 = 0
        UNION ALL
        SELECT user_id, 'silver', TIMESTAMP '2024-01-01'
        FROM users WHERE user_id % 2 = 1
    )
    SELECT e.event_id, e.user_id, e.ts, d.segment
    FROM events e
    ASOF LEFT JOIN dim d
      ON e.user_id = d.user_id AND e.ts >= d.valid_from
    """,
    tags=("behavioral", "temporal", "scd2", "asof"),
)
def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) lookup against an SCD2-style dimension:
    every event joins the dimension version in effect AT ITS OWN
    TIMESTAMP — the 'FOR SYSTEM_TIME AS OF row-time' warehouse join.
    Reuses the as-of operator (one hash shuffle on user_id, no range
    explosion); the oracle is DuckDB's native ASOF LEFT JOIN, so the
    two engines' as-of semantics (inclusive boundary, latest-version
    tie) are cross-checked row-for-row. Dimension = per-user segment
    history derived deterministically from the user id (even users
    upgrade bronze→gold on Jan 15; odd users stay silver)."""
    from bigquery_etl_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    users = e.select("user_id").distinct()
    # r13 (guide §2.4): the old 3-way union of filtered copies of the
    # users-distinct subtree let the parity filters push THROUGH the
    # distinct aggregate, splitting it into three separately-scanned,
    # separately-shuffled copies (3 parquet scans in the plan). One
    # explode over a per-user version array builds the identical
    # dimension rows from ONE distinct pass (scans 3 → 1).
    _ver = lambda seg, day: F.struct(  # noqa: E731
        F.lit(seg).alias("segment"),
        F.lit(day).cast("timestamp").alias("valid_from"),
    )
    # r14 (ADVICE r13): explicit `% 2 == 1` guard instead of a bare
    # otherwise(), so the equivalence to the replaced 3-way union is
    # exact for ALL key domains — the old union's filters produced NO
    # dim row for NULL or negative-odd ids (Spark % yields -1 there),
    # and the unguarded otherwise() silently widened silver to them.
    dim = users.select(
        "user_id",
        F.explode(
            F.when(
                F.col("user_id") % 2 == 0,
                F.array(_ver("bronze", "2024-01-01"), _ver("gold", "2024-01-15")),
            ).when(
                F.col("user_id") % 2 == 1,
                F.array(_ver("silver", "2024-01-01")),
            ).otherwise(F.array().cast(
                "array<struct<segment:string,valid_from:timestamp>>"
            ))
        ).alias("__v"),
    ).select(
        "user_id",
        F.col("__v.segment").alias("segment"),
        F.col("__v.valid_from").alias("valid_from"),
    )
    return asof_join(
        e, dim, "user_id", "user_id", "ts", "valid_from", direction="backward"
    ).select("event_id", "user_id", "ts", "segment")


@query(
    "q_attribution_linear",
    sql="""
    WITH counted AS (
        SELECT user_id, ts, event_id, event_type,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                   OVER w AS c_view,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                   OVER w AS c_click,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END)
                   OVER w AS c_signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                   OVER w AS c_error
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), purchases AS (
        SELECT c_view, c_click, c_signup, c_error,
               c_view + c_click + c_signup + c_error AS n
        FROM counted WHERE event_type = 'purchase'
    ), micro AS (
        SELECT
          CAST(SUM(CASE WHEN n > 0
               THEN ROUND(1000000.0 * c_view / n) ELSE 0 END) AS BIGINT) AS view,
          CAST(SUM(CASE WHEN n > 0
               THEN ROUND(1000000.0 * c_click / n) ELSE 0 END) AS BIGINT) AS click,
          CAST(SUM(CASE WHEN n > 0
               THEN ROUND(1000000.0 * c_signup / n) ELSE 0 END) AS BIGINT) AS signup,
          CAST(SUM(CASE WHEN n > 0
               THEN ROUND(1000000.0 * c_error / n) ELSE 0 END) AS BIGINT) AS error,
          CAST(COUNT(CASE WHEN n = 0 THEN 1 END) AS BIGINT) AS n_unattributed
        FROM purchases
    )
    SELECT channel, ROUND(micro_credit / 1000000.0, 4) AS credit
    FROM (
        SELECT 'view' AS channel, view AS micro_credit FROM micro
        UNION ALL SELECT 'click', click FROM micro
        UNION ALL SELECT 'signup', signup FROM micro
        UNION ALL SELECT 'error', error FROM micro
        UNION ALL SELECT '(none)', n_unattributed * 1000000 FROM micro
    )
    """,
    tags=("behavioral", "attribution", "window"),
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase splits one unit of
    credit equally across ALL the user's preceding non-purchase touches
    (purchases with no prior touch credit '(none)'). Same one-pass
    user-partitioned cumulative windows as the funnel; per-purchase
    channel credits snap to a 1e-6 grid before summing (the
    q_perplexity trick), so cross-engine float accumulation order can
    never move the 4dp result."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    chans = ["view", "click", "signup", "error"]
    counted = e.select(
        "event_type",
        *[
            F.count(F.when(F.col("event_type") == c, 1)).over(w).alias(f"c_{c}")
            for c in chans
        ],
    ).filter(F.col("event_type") == "purchase")
    n = sum(F.col(f"c_{c}") for c in chans)
    counted = counted.withColumn("n", n)
    micro = counted.agg(
        *[
            F.sum(
                F.when(
                    F.col("n") > 0,
                    F.round(1_000_000.0 * F.col(f"c_{c}") / F.col("n")),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(c)
            for c in chans
        ],
        F.count(F.when(F.col("n") == 0, 1)).cast("bigint").alias("n_unattributed"),
    )
    legs = F.array(
        *[
            F.struct(F.lit(c).alias("channel"), F.col(c).alias("micro_credit"))
            for c in chans
        ],
        F.struct(
            F.lit("(none)").alias("channel"),
            (F.col("n_unattributed") * 1_000_000).alias("micro_credit"),
        ),
    )
    return micro.select(F.explode(legs).alias("l")).select(
        F.col("l.channel").alias("channel"),
        F.round(F.col("l.micro_credit") / 1_000_000.0, 4).alias("credit"),
    )
