"""Scalar-function packs (SURVEY.md §2 B40-B46).

The reference's flatten step (A7, ref main.py:51-81) is built from these
function families; BigQuery's scalar library maps near-1:1 onto
pyspark.sql.functions, all JVM-side inside whole-stage codegen — no UDFs.

Cross-engine parity notes are inline: DuckDB regexp_replace needs the
'g' flag to match Spark's replace-all, EXTRACT returns BIGINT where
Spark returns INT, floor/sign differ in return type, map subscripts
return LIST in DuckDB (so map ops are exercised rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B40 — string functions.
# ---------------------------------------------------------------------------


@query(
    "q_str_funcs",
    sql="""
    SELECT p_partkey,
           SUBSTR(p_name, 1, 5) AS name5,
           UPPER(p_name) AS name_u,
           LOWER(p_brand) AS brand_l,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           REPLACE(p_type, 'O', '0') AS type_repl,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           TRIM(CONCAT('  ', p_brand, '  ')) AS brand_trim,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS no_vowels,
           (p_name LIKE '%bolt%') AS is_bolt,
           CAST(STRPOS(p_name, 'w') AS INTEGER) AS w_pos
    FROM part
    """,
    tags=("functions",),
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.length("p_name").alias("name_len"),
        F.replace("p_type", F.lit("O"), F.lit("0")).alias("type_repl"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("no_vowels"),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
        F.instr("p_name", "w").alias("w_pos"),
    )


# ---------------------------------------------------------------------------
# B41 — date/time functions.
# ---------------------------------------------------------------------------


@query(
    "q_date_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(DATEDIFF('day', TIMESTAMP '2024-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           EPOCH_US(o_orderdate) AS epoch_us,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    """,
    tags=("functions",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time pack. Spark dayofweek is Sunday=1 vs DuckDB dow Sunday=0
    (SURVEY.md §5.3) — engine-portable queries use year/month/day."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("2024-01-01").cast("timestamp")).alias("days_since"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        # parquet naive timestamps read as TIMESTAMP_NTZ; unix_micros needs
        # an instant — cast via the (UTC) session zone to match epoch_us
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_us"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


# ---------------------------------------------------------------------------
# B42 — math functions.
# ---------------------------------------------------------------------------


@query(
    "q_math_funcs",
    sql="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 2) AS price_r2,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dev,
           l_orderkey % 7 AS key_mod,
           ROUND(POWER(l_quantity, 2), 4) AS qty_sq,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           CAST(SIGN(l_discount - 0.05) AS INTEGER) AS disc_sign,
           GREATEST(l_quantity, 25.0) AS qty_hi,
           LEAST(l_quantity, 25.0) AS qty_lo,
           CASE WHEN l_tax = 0 THEN NULL ELSE ROUND(l_discount / l_tax, 6) END AS disc_per_tax
    FROM lineitem
    """,
    tags=("functions",),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack. Transcendentals (ln/log10/exp) round to 6dp — JVM and C
    libm may differ in the last ulp. try_divide twin is a CASE guard
    (DuckDB has no TRY division)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
        F.round(F.try_divide("l_discount", "l_tax"), 6).alias("disc_per_tax"),
    )


# ---------------------------------------------------------------------------
# B43 — JSON functions over events.props (the A7 parse path,
# ref main.py:51-81: nested IPFS JSON → typed flat columns).
# ---------------------------------------------------------------------------


@query(
    "q_json_funcs",
    sql="""
    SELECT event_id,
           JSON_EXTRACT_STRING(props, '$.k') AS k_str,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_int,
           JSON_EXTRACT_STRING(props, '$.missing') AS missing_val
    FROM events
    """,
    tags=("functions", "json"),
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_EXTRACT_SCALAR: get_json_object returns STRING (DuckDB twin is
    json_extract_string, not json_extract — SURVEY.md §5.3); absent paths
    are NULL, not errors."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


# ---------------------------------------------------------------------------
# B44 — array functions + higher-order functions over tokenized text.
# ---------------------------------------------------------------------------


@query(
    "q_array_funcs",
    sql="""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           string_split(text, ' ')[1] AS first_tok,
           LIST_CONTAINS(string_split(text, ' '), 'spark') AS has_spark,
           ARRAY_TO_STRING(LIST_SLICE(string_split(text, ' '), 1, 3), '-') AS first3,
           ARRAY_TO_STRING(LIST_TRANSFORM(LIST_SLICE(string_split(text, ' '), 1, 3),
                                          x -> UPPER(x)), '-') AS first3_u,
           CAST(LIST_SUM(LIST_TRANSFORM(string_split(text, ' '),
                                        x -> LENGTH(x))) AS BIGINT) AS total_chars,
           COALESCE(ARRAY_TO_STRING(LIST_FILTER(LIST_SORT(string_split(text, ' ')),
                                                x -> LENGTH(x) > 5), ','), '') AS long_toks
    FROM documents
    """,
    tags=("functions", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_LENGTH / OFFSET / CONCAT + higher-order transform/filter/
    aggregate (BigQuery array subquery equivalents). Array results are
    serialized to strings so the value-hash is representation-stable."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_tok"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws("-", F.slice(toks, 1, 3)).alias("first3"),
        F.concat_ws("-", F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x))).alias("first3_u"),
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)).alias(
            "total_chars"
        ),
        F.concat_ws(",", F.filter(F.array_sort(toks), lambda x: F.length(x) > 5)).alias(
            "long_toks"
        ),
    )


# ---------------------------------------------------------------------------
# B45 — struct build/access (map ops are rows-only: DuckDB map[k] yields
# LIST, so there is no clean oracle twin).
# ---------------------------------------------------------------------------


@query(
    "q_struct_funcs",
    sql="""
    SELECT c_custkey,
           struct_pack(name := c_name, bal := c_acctbal).name AS s_name,
           struct_pack(name := c_name, bal := c_acctbal).bal AS s_bal,
           struct_pack(outer_ := struct_pack(nk := c_nationkey)).outer_.nk AS nested_nk
    FROM customer
    """,
    tags=("functions", "struct"),
)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT(...) build + dotted field access, incl. nesting."""
    c = load(spark, sf_dir, "customer")
    st = F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
    nested = F.struct(F.struct(F.col("c_nationkey").alias("nk")).alias("outer_"))
    return c.select(
        "c_custkey",
        st.getField("name").alias("s_name"),
        st.getField("bal").alias("s_bal"),
        nested.getField("outer_").getField("nk").alias("nested_nk"),
    )


@query(
    "q_map_funcs",
    sql="""
    SELECT c_custkey,
           c_acctbal AS bal_val,
           'bal,nk' AS keys_csv,
           printf('%.2f,%.2f', c_acctbal, CAST(c_nationkey AS DOUBLE)) AS vals_csv,
           '{"k":' || c_custkey || '}' AS m2_json
    FROM customer
    """,
    tags=("functions", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build/access/keys/values. Map-typed outputs are serialized at
    the query boundary (CSV / JSON) — scalar columns are the only shape
    the driver's hasher accepts, and serializing also unlocks an exact
    DuckDB twin (printf is C-style in both engines, so double formatting
    is deterministic)."""
    c = load(spark, sf_dir, "customer")
    m = F.create_map(F.lit("bal"), F.col("c_acctbal"), F.lit("nk"), F.col("c_nationkey").cast("double"))
    return c.select(
        "c_custkey",
        F.element_at(m, "bal").alias("bal_val"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.array_join(
            F.transform(F.map_values(m), lambda x: F.format_string("%.2f", x)), ","
        ).alias("vals_csv"),
        F.to_json(
            F.map_from_entries(
                F.array(F.struct(F.lit("k").alias("k"), F.col("c_custkey").alias("v")))
            )
        ).alias("m2_json"),
    )


# ---------------------------------------------------------------------------
# B46 — hash functions (FARM_FINGERPRINT analogue xxhash64 is Spark-
# specific, exercised in the dedup ops; md5/sha256/hex are portable).
# ---------------------------------------------------------------------------


@query(
    "q_hash_funcs",
    sql="""
    SELECT c_custkey,
           MD5(c_name) AS name_md5,
           SHA256(c_name) AS name_sha256,
           HEX(c_custkey) AS key_hex,
           MD5(CONCAT(c_name, '|', c_mktsegment)) AS composite_md5
    FROM customer
    """,
    tags=("functions", "hash"),
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.hex("c_custkey").alias("key_hex"),
        F.md5(F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment"))).alias("composite_md5"),
    )
