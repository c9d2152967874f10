"""UDF / UDAF / UDTF surface (SURVEY.md §2 B55-B59).

The reference's dependency is effectively one big row-wise UDF pipeline
(decode → fetch → flatten, ref main.py:147-156). Here: each Spark UDF
flavor, with the vectorized (Arrow) forms preferred — the row-at-a-time
UDF exists to cover the API, not as a pattern to copy (it serializes per
row and breaks whole-stage codegen; keep it OUT of 100 TB hot paths).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# B55 — scalar Python UDF (row-at-a-time; the slow path).
# ---------------------------------------------------------------------------


@F.udf(T.StringType())
def _segment_code(segment):
    # No type hints: PySpark tries to infer a (pandas) eval type from
    # annotations and warns when it can't; plain positional args pin the
    # classic row-at-a-time eval type silently.
    if segment is None:
        return None
    return f"{segment[:3].upper()}-{len(segment)}"


@query(
    "q_udf_scalar",
    sql="""
    SELECT c_custkey,
           UPPER(SUBSTR(c_mktsegment, 1, 3)) || '-' ||
             CAST(LENGTH(c_mktsegment) AS VARCHAR) AS seg_code
    FROM customer
    """,
    tags=("udf",),
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (deterministic string transform)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", _segment_code("c_mktsegment").alias("seg_code"))


# ---------------------------------------------------------------------------
# B56 — vectorized pandas UDF (Arrow batches; the idiomatic port of the
# reference's 5-worker batched pipeline, ref main.py:38, 147-156).
# ---------------------------------------------------------------------------


@F.pandas_udf(T.DoubleType())
def _net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    return price * (1.0 - discount)


@query(
    "q_pandas_udf",
    sql="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
    tags=("udf",),
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: one IEEE multiply per element, same
    result as the SQL expression — proving the Arrow round-trip is
    value-exact."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


# ---------------------------------------------------------------------------
# B57 — grouped-map UDF (per-group pandas DataFrame in/out).
# ---------------------------------------------------------------------------


@query(
    "q_grouped_map",
    sql="""
    SELECT event_id, user_id, value,
           ROUND(CASE WHEN STDDEV_POP(value) OVER w = 0 THEN 0.0
                      ELSE (value - AVG(value) OVER w) / STDDEV_POP(value) OVER w
                 END, 4) AS value_z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    tags=("udf",),
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: z-score of event value within each user's history.
    Each group must fit in one worker's memory — at 100 TB that means
    grouping by a high-cardinality key (user), never a global op.
    z rounded to 4 both sides (pandas two-pass vs DuckDB streaming
    stddev differ in the last float bits)."""
    e = load(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=0)
        mean = pdf["value"].mean()
        z = 0.0 if std == 0 else (pdf["value"] - mean) / std
        pdf["value_z"] = z
        pdf["value_z"] = pdf["value_z"].round(4)
        return pdf[["event_id", "user_id", "value", "value_z"]]

    return e.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        zscore, schema="event_id long, user_id long, value double, value_z double"
    )


# ---------------------------------------------------------------------------
# B58 — UDTF: 1 row → N rows (the A8 fan-out, imperative form).
# ---------------------------------------------------------------------------


@query(
    "q_udtf_expand",
    sql="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
    tags=("udf",),
)
def q_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas as a UDTF: emit one row per token with its offset.
    Arrow-batch iterator — no per-row Python overhead, arbitrary fan-out.
    Oracle: DuckDB unnest zipped with generate_subscripts."""
    d = load(spark, sf_dir, "documents")

    def expand(batches):
        import numpy as np

        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            n = toks.str.len().to_numpy()
            total = int(n.sum()) if len(n) else 0
            if total == 0:
                yield pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "pos": pd.Series([], dtype="int32"),
                     "token": pd.Series([], dtype=object)}
                )
                continue
            # Vectorized fan-out: no per-token Python loop. pos is a
            # flat arange minus each doc's repeated start offset.
            offsets = np.repeat(np.cumsum(n) - n, n)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n),
                    "pos": (np.arange(total) - offsets).astype("int32"),
                    "token": np.concatenate(toks.to_numpy()),
                }
            )

    return d.select("doc_id", "text").mapInPandas(expand, schema="doc_id long, pos int, token string")


# ---------------------------------------------------------------------------
# B59 — UDAF via pandas GROUPED_AGG.
# ---------------------------------------------------------------------------


@F.pandas_udf(T.DoubleType())
def _geo_mean(v: pd.Series) -> float:
    import numpy as np

    pos = v[v > 0]
    if len(pos) == 0:
        return float("nan")
    return float(np.exp(np.log(pos).mean()))


@query(
    "q_udaf_geomean",
    sql="""
    SELECT o_orderstatus,
           ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geo_price
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderstatus
    """,
    tags=("udf",),
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (geometric mean) as a GROUPED_AGG pandas UDF.
    Rounded to 4 both sides (np mean-of-logs vs DuckDB AVG(LN) differ
    in the last float bits from summation order)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(_geo_mean("o_totalprice"), 4).alias("geo_price")
    )
