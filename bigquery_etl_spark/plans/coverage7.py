"""Seventh coverage pack: fuzzy string matching (blocked Levenshtein),
recursive CTEs (Spark 4 WITH RECURSIVE — BigQuery's recursive-CTE
analogue), PII redaction, Gopher-style repetition/quality signals,
global n-gram mining, deterministic stratified sampling, and
geo-distance with bounding-box pruning (BigQuery GIS ST_DISTANCE
idiom, haversine form).

Reference parity: the reference delegates all SQL analytics to BigQuery
Standard SQL (main.py:21, 160-185); the PII/quality/n-gram/sampling
queries are charter extensions (SURVEY.md §2 Tier C) — standard stages
of an LLM training-data pipeline, designed here so no stage ever
materializes a quadratic intermediate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load, register_views

# ---------------------------------------------------------------------------
# Fuzzy matching — entity-resolution idiom: block, then edit-distance
# within the block. Blocking key = (nation, first letter of name suffix)
# keeps candidate pairs linear-ish (each block is small relative to the
# table); the quadratic all-pairs product NEVER forms. At 100 TB the
# block key shuffles once and each block's pairs fit one task; a skewed
# block would be re-split by AQE skew-join or a salted key.
# ---------------------------------------------------------------------------


@query(
    "q_fuzzy_match",
    sql="""
    WITH c AS (
        SELECT c_custkey, c_nationkey,
               'Customer' || CAST(c_custkey % 1000 AS VARCHAR) AS short_name
        FROM customer
    )
    SELECT a.c_custkey,
           MIN(levenshtein(a.short_name, b.short_name)) AS best_dist,
           COUNT(*) AS n_cands
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey <> b.c_custkey
     AND (a.c_custkey % 20) = (b.c_custkey % 20)
    GROUP BY a.c_custkey
    """,
    tags=("text", "fuzzy", "tierc"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match: per customer, the minimum Levenshtein
    distance to any other customer in the same (nation, custkey%20)
    block. One shuffle on the block key; Levenshtein runs codegen'd
    JVM-side (F.levenshtein), never in Python."""
    c = (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.concat(F.lit("Customer"), (F.col("c_custkey") % 1000).cast("string")).alias(
                "short_name"
            ),
            (F.col("c_custkey") % 20).alias("blk"),
        )
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.c_custkey") != F.col("b.c_custkey")),
    )
    return pairs.groupBy(F.col("a.c_custkey").alias("c_custkey")).agg(
        F.min(F.levenshtein(F.col("a.short_name"), F.col("b.short_name"))).alias(
            "best_dist"
        ),
        F.count("*").alias("n_cands"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 supports WITH RECURSIVE; BigQuery likewise).
# Calendar-spine gap-fill: generate every month of 1995 recursively,
# left-join monthly order counts so empty months surface as zero — the
# classic reporting idiom BigQuery users write with GENERATE_DATE_ARRAY
# or WITH RECURSIVE. The recursion depth is 12 — driver-side plan
# expansion, nothing iterative at execution time.
# ---------------------------------------------------------------------------


@query(
    "q_recursive_cte",
    sql="""
    WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1995-12-01'
    )
    SELECT CAST(m AS DATE) AS month_start,
           COALESCE(n_orders, 0) AS n_orders
    FROM months
    LEFT JOIN (
        SELECT date_trunc('month', o_orderdate) AS mo, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    ) agg ON agg.mo = m
    """,
    tags=("sql", "recursive"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine + gap-fill join, run through Spark SQL
    (UnionLoop plan). Aggregate side shuffles once on month; the
    12-row spine broadcasts."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM months WHERE m < DATE '1995-12-01'
        )
        SELECT m AS month_start, COALESCE(n_orders, 0) AS n_orders
        FROM months
        LEFT JOIN (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        ) agg ON agg.mo = m
        """
    )


# ---------------------------------------------------------------------------
# Charter (Tier C) — PII redaction. The fixture corpus is synthetic and
# PII-free, so the query PLANTS deterministic PII (an email and a phone
# derived from doc_id) and then redacts it; correct output strips every
# planted token. Pure regexp_replace — codegen'd JVM regex, streaming-
# friendly, no shuffle at all (narrow map over the corpus).
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.com"
_PHONE_RE = r"555-[0-9]{3}-[0-9]{4}"


@query(
    "q_pii_redact",
    sql=f"""
    WITH planted AS (
        SELECT doc_id,
               'user' || CAST(doc_id AS VARCHAR) || '@example.com ' || text
               || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS clean,
           length(text)
             - length(regexp_replace(text, '{_EMAIL_RE}', '', 'g')) AS email_chars
    FROM planted
    """,
    tags=("tierc", "text", "pii"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email+phone redaction over planted PII. Narrow (shuffle-free)
    regexp_replace map; at 100 TB this is scan-bound and perfectly
    parallel per file split."""
    docs = load(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com "),
            F.col("text"),
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return planted.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ).alias("clean"),
        (
            F.length("text") - F.length(F.regexp_replace("text", _EMAIL_RE, ""))
        ).alias("email_chars"),
    )


# ---------------------------------------------------------------------------
# Charter (Tier C) — Gopher-style repetition/quality signals per doc:
# distinct-token ratio and top-bigram fraction. Bigrams form ARRAY-side
# (one transform per doc) — see the docstring below; the older
# posexplode + lead() window shape shuffled and sorted every token row.
# ---------------------------------------------------------------------------


@query(
    "q_quality_gopher",
    sql="""
    WITH tok AS (
        SELECT doc_id, u.z[1] AS a, u.z[2] AS b
        FROM (
            SELECT doc_id, list_zip(toks, toks[2:]) AS z2
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        ), unnest(z2) AS u(z)
    ),
    per_bigram AS (
        SELECT doc_id, a || ' ' || b AS bigram, COUNT(*) AS cnt
        FROM tok WHERE b IS NOT NULL GROUP BY doc_id, a || ' ' || b
    ),
    per_doc AS (
        SELECT doc_id, SUM(cnt) AS n_bigrams, MAX(cnt) AS top_bigram_cnt
        FROM per_bigram GROUP BY doc_id
    ),
    toks AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
               COUNT(DISTINCT u.t) AS n_distinct
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(toks) AS u(t)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens,
           ROUND(CAST(t.n_distinct AS DOUBLE) / t.n_tokens, 4) AS distinct_ratio,
           ROUND(CAST(p.top_bigram_cnt AS DOUBLE) / p.n_bigrams, 4) AS top_bigram_frac
    FROM toks t JOIN per_doc p ON t.doc_id = p.doc_id
    """,
    tags=("tierc", "text", "quality"),
)
def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/quality signals: tokens, distinct-token ratio,
    top-bigram mass fraction per document.

    Bigrams are formed ARRAY-side (one `transform` per doc — the HOF
    runs interpreted, but once per document, not per token) instead of
    explode + lead() over a window: the window form shuffles and sorts
    every token row, and at bench scale AQE coalesces that byte-small
    exchange to 1-2 partitions, serializing the sort. Token stats
    (count / distinct) come from size()/array_distinct() map-side —
    zero shuffle on that branch. Two keyed shuffles total (per-bigram
    counts, then per-doc rollup), both on aggregated rows; the per-doc
    join strategy is left to AQE — broadcast at bench scale, sort-merge
    when both per-doc sides are huge."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("toks"))
    # toks[i] is 0-based; size-1 bigrams. Single-token docs produce one
    # null bigram (concat with null), filtered out -> no bigram rows ->
    # dropped by the inner join, matching the oracle's WHERE b IS NOT NULL.
    bigram_arr = F.expr(
        "transform(sequence(1, greatest(size(toks) - 1, 1)),"
        " i -> concat(toks[i-1], ' ', toks[i]))"
    )
    per_bigram = (
        base.select("doc_id", F.explode(bigram_arr).alias("bigram"))
        .filter(F.col("bigram").isNotNull())
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = per_bigram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"), F.max("cnt").alias("top_bigram_cnt")
    )
    toks = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    )
    return toks.join(per_doc, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 4).alias(
            "distinct_ratio"
        ),
        F.round(
            F.col("top_bigram_cnt").cast("double") / F.col("n_bigrams"), 4
        ).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# Charter (Tier C) — global trigram mining: top-25 corpus trigrams.
# Same single-shuffle lead() pipeline; the global count shuffles on the
# trigram string (high cardinality — partial aggregation absorbs the
# heavy hitters map-side), and the top-25 is TakeOrderedAndProject, not
# a global sort.
# ---------------------------------------------------------------------------


@query(
    "q_ngram_top",
    sql="""
    WITH tri AS (
        SELECT u.z[1] || ' ' || u.z[2] || ' ' || u.z[3] AS trigram
        FROM (
            SELECT list_zip(toks, toks[2:], toks[3:]) AS z3
            FROM (SELECT string_split(text, ' ') AS toks FROM documents)
        ), unnest(z3) AS u(z)
        WHERE u.z[2] IS NOT NULL AND u.z[3] IS NOT NULL
    )
    SELECT trigram, COUNT(*) AS cnt FROM tri
    GROUP BY trigram ORDER BY cnt DESC, trigram LIMIT 25
    """,
    tags=("tierc", "text", "ngram"),
)
def q_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 corpus trigrams by count (deterministic tiebreak on the
    trigram string).

    r13 (guide §2.4): trigrams form WITHIN each token array, so the
    old posexplode → Window(lead) shape shuffled and sorted every
    token by (doc_id, pos) purely to look one and two rows ahead —
    an array-side ``transform`` builds the identical trigrams with
    zero shuffle before the count aggregate (the same shape as the
    oracle's ``list_zip``)."""
    docs = load(spark, sf_dir, "documents")
    tri = docs.select(F.split("text", " ").alias("t")).select(
        F.explode(
            F.when(
                F.size("t") >= 3,
                F.expr(
                    "transform(sequence(0, size(t) - 3), "
                    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("trigram")
    )
    return (
        tri.groupBy("trigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "trigram")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Charter (Tier C) — deterministic stratified sampling: per-language
# sampling rates (en kept at 20%, others at 50%) decided by a
# multiplicative integer hash of doc_id — reproducible on any engine,
# no RNG, no seed-ordering dependence. This is the curriculum/rebalance
# stage of a training-data pipeline; at 100 TB it is a narrow filter
# (no shuffle), and the rate table is a broadcast.
# ---------------------------------------------------------------------------


@query(
    "q_stratified_sample",
    sql="""
    WITH rates(lang, keep_permille) AS (
        SELECT * FROM (VALUES ('en', 200), ('zh', 500), ('de', 500),
                              ('fr', 500), ('es', 500)) AS t(lang, kp)
    )
    SELECT d.lang, COUNT(*) AS n_kept,
           MIN(d.doc_id) AS min_doc, MAX(d.doc_id) AS max_doc
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE (d.doc_id * 2654435761) % 1000 < r.keep_permille
    GROUP BY d.lang
    """,
    tags=("tierc", "sampling"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic stratified sample summary (Knuth
    multiplicative hash mod 1000 vs per-stratum keep rate)."""
    docs = load(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [("en", 200), ("zh", 500), ("de", 500), ("fr", 500), ("es", 500)],
        "lang string, keep_permille int",
    )
    kept = docs.join(F.broadcast(rates), "lang").filter(
        (F.col("doc_id") * F.lit(2654435761)) % 1000 < F.col("keep_permille")
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# ---------------------------------------------------------------------------
# BigQuery GIS idiom — ST_DWITHIN via haversine. Fixture tables carry no
# coordinates, so positions derive deterministically from c_custkey
# (lat ∈ [-60, 60), lon ∈ [-180, 180)). The scale pattern is the point:
# a cheap BOUNDING-BOX prune (sargable comparisons — pushable, prunes
# partitions) runs before the transcendental haversine, so the trig
# evaluates only on survivors. Distances round to 1 km to stay clear of
# cross-libm last-ulp differences in sin/asin.
# ---------------------------------------------------------------------------


@query(
    "q_geo_distance",
    sql="""
    WITH pts AS (
        SELECT c_custkey,
               CAST((c_custkey % 120) - 60 + 0.25 AS DOUBLE) AS lat,
               CAST((c_custkey % 360) - 180 + 0.25 AS DOUBLE) AS lon
        FROM customer
    )
    SELECT c_custkey, lat, lon,
           ROUND(2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(lat - 40.0) / 2), 2)
               + cos(radians(40.0)) * cos(radians(lat))
                 * pow(sin(radians(lon - (-74.0)) / 2), 2))), 1) AS dist_km
    FROM pts
    WHERE lat BETWEEN 40.0 - 10 AND 40.0 + 10
      AND lon BETWEEN -74.0 - 14 AND -74.0 + 14
    """,
    tags=("geo", "tierb"),
)
def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance to (40 N, 74 W) for synthetic customer
    points, bounding-box pruned before any trig."""
    lat0, lon0 = F.lit(40.0), F.lit(-74.0)
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 120) - 60 + 0.25).cast("double").alias("lat"),
        ((F.col("c_custkey") % 360) - 180 + 0.25).cast("double").alias("lon"),
    )
    boxed = pts.filter(
        F.col("lat").between(30.0, 50.0) & F.col("lon").between(-88.0, -60.0)
    )
    hav = (
        F.pow(F.sin(F.radians(F.col("lat") - lat0) / 2), 2)
        + F.cos(F.radians(lat0))
        * F.cos(F.radians("lat"))
        * F.pow(F.sin(F.radians(F.col("lon") - lon0) / 2), 2)
    )
    return boxed.select(
        "c_custkey",
        "lat",
        "lon",
        F.round(2 * 6371.0088 * F.asin(F.sqrt(hav)), 1).alias("dist_km"),
    )
