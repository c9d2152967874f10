"""Tier-A dataflow shapes as declared queries (SURVEY.md §2 A1, A4-A8,
B47) over the driver fixtures.

The real pipeline library (bigquery_etl_spark.pipeline) runs these same
operators over raw_logs/ipfs_docs-shaped data; the declared queries here
express each dataflow step on the oracle-checkable fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_etl_spark.plans._util import dsum
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# A1 — incremental block-range scan (batch emulation).
# ---------------------------------------------------------------------------


@query(
    "q_incremental_scan",
    sql="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE event_id > 600 AND event_id <= 900
    """,
    tags=("pipeline", "incremental"),
)
def q_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One micro-batch of the incremental source: rows in
    (cursor, cursor + batch] on a monotonically ordered log — the batch
    twin of ref main.py:197-216 (_run: [cursor+1, head-lag]). The
    streaming form with a real cursor lives in pipeline/incremental.py."""
    e = load(spark, sf_dir, "events")
    cursor, head = 600, 900
    return e.filter((F.col("event_id") > cursor) & (F.col("event_id") <= head)).select(
        "event_id", "ts", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# A6 — enrichment lookup join (IPFS fetch ref main.py:152, batch form:
# broadcast the dimension instead of per-row RPC).
# ---------------------------------------------------------------------------


@query(
    "q_lookup_join",
    sql="""
    SELECT e.event_id, e.event_type, e.value, c.c_name, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("pipeline", "join"),
)
def q_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side enrichment: each event picks up its user's dimension
    row. Broadcast hint — the dim ships once per executor, the event
    stream never shuffles (the scalable form of the reference's per-event
    IPFS HTTP fetch; the external-KV form is pipeline/enrich.py)."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return e.join(F.broadcast(c), e.user_id == c.c_custkey, "left").select(
        "event_id", "event_type", "value", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# A7 — JSON flatten with explicit schema (from_json, not string munging).
# ---------------------------------------------------------------------------


@query(
    "q_json_flatten",
    sql="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50) AS k_high
    FROM events
    """,
    tags=("pipeline", "json"),
)
def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared StructType → typed flat columns; the
    schema-on-write discipline of ref main.py:51-81 (explicit schemas,
    no inference)."""
    e = load(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = F.from_json("props", props_schema)
    return e.select(
        "event_id",
        "event_type",
        parsed.getField("k").alias("k"),
        (parsed.getField("k") >= 50).alias("k_high"),
    )


# ---------------------------------------------------------------------------
# A8 — variant fan-out: 1 row → N rows via explode.
# ---------------------------------------------------------------------------


@query(
    "q_explode_variants",
    sql="""
    SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS token
    FROM documents
    WHERE lang IN ('en', 'de')
    """,
    tags=("pipeline", "explode"),
)
def q_explode_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(): the A8 variant fan-out (ref product_schema.json:33-79,
    one listing → N product rows). Output cardinality = total array
    elements; explode never shuffles — it's a generator in the scan
    stage."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("lang").isin("en", "de"))
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    )


# ---------------------------------------------------------------------------
# B47 — tumbling event-time window (batch twin; streaming form in
# streaming/windows.py).
# ---------------------------------------------------------------------------


@query(
    "q_sliding_window",
    sql="""
    SELECT ws, ws + INTERVAL '1 hour' AS we, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS ws,
               event_type, value
        FROM events, (SELECT unnest([0, 1]) AS o) hops
    )
    GROUP BY ws, event_type
    """,
    tags=("pipeline", "window", "streaming-twin"),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B48 hopping window, batch form (streaming form:
    streaming/windows.py:sliding_window_agg, exercised in
    tests/test_streaming.py). Each row lands in duration/slide = 2
    windows; the oracle materializes both hops per row and buckets.
    Decimal-cast sum so the hash is summation-order independent."""
    e = load(spark, sf_dir, "events")
    g = e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
    return g.agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")
    ).select(
        F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
        "event_type", "n", "sum_value",
    )


@query(
    "q_session_window",
    sql="""
    SELECT user_id, MIN(ts) AS ws, MAX(ts) + INTERVAL '30 minutes' AS we,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_id
    """,
    tags=("pipeline", "window", "streaming-twin"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49 session window, batch form (streaming form:
    streaming/windows.py:session_window_agg). Data-driven extents:
    session end = last event + gap. The oracle re-derives sessions via
    lag/cumsum — NB Spark's session_window merges on STRICT overlap, so
    a gap of exactly 30min starts a new session (`<`, not `<=` — that's
    the q_sessionize convention, which is a different operator)."""
    e = load(spark, sf_dir, "events")
    g = e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
    return g.agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")
    ).select(
        F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
        "user_id", "n", "sum_value",
    )


@query(
    "q_tumbling_window",
    sql="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ws, event_type
    """,
    tags=("pipeline", "window", "streaming-twin"),
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window agg — identical code shape works on a stream
    with withWatermark; epoch-aligned buckets match DuckDB time_bucket."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )
