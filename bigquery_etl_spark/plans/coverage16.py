"""Sixteenth coverage pack (r13) — VERDICT r12's ranked list.

- ``q_ml_idf``: ``ML.IDF(tokens) OVER()`` (r12 item 7) — the df-only
  leg of the C91 two-pass corpus rewrite (bq_dialect
  ._rewrite_ml_tfidf_over, generalized): one entry per DISTINCT term
  of each token array, value = the smooth-idf factor
  LN((N+1)/(df+1)) + 1 alone. Same scale-safe plan as q_ml_tfidf:
  document frequencies aggregate once, vectors compute per distinct
  array, distributed prefix-sum vocabulary index, join back on the
  array value — no per-row corpus state.

Reference parity: the reference delegates its SQL surface to BigQuery
(reference main.py:21, 49-50, 160-185); these close gaps ranked in
VERDICT r12 "What's missing" / "Next round".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# LOG_ANALYZER token class, RE2 spelling (shared with the TF-IDF and
# TEXT_ANALYZE twins — the DuckDB side re-tokenizes independently)
_DUCK_TOKENS = r"[^\s\x00\[\]<>(){}|!;,''\"*&?+/:=@.$%\\_-]+"

# Identical vocabulary-index algebra as the Spark rewrite (r13
# distributed prefix-sum: bucket by the char polynomial, rank within
# bucket, add bucket offsets) so the index-weighted checksum is an
# exact cross-engine check.
_ML_IDF_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, lang,
           regexp_extract_all(lower(text), '{_DUCK_TOKENS}') AS toks
    FROM documents WHERE doc_id % 2 = 1
),
n AS (SELECT COUNT(*) AS n_docs FROM raw),
tl AS (
    SELECT DISTINCT doc_id, lang, t.term
    FROM raw, UNNEST(toks) AS t(term)
),
dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tl GROUP BY term
),
vb AS (
    SELECT term, (ascii(substr(term, 1, 1)) * 961
        + ascii(substr(term, 2, 1)) * 31 + ascii(substr(term, 3, 1))
        + length(term)) % 1024 AS b
    FROM dfreq
),
lr AS (
    SELECT term, b,
           ROW_NUMBER() OVER (PARTITION BY b ORDER BY term) - 1 AS lr
    FROM vb
),
bo AS (
    SELECT b, COALESCE(SUM(c) OVER (PARTITION BY 1 ORDER BY b ROWS
        BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
    FROM (SELECT b, COUNT(*) AS c FROM vb GROUP BY b)
),
voc AS (
    SELECT term, off + lr AS idx FROM lr JOIN bo USING (b)
),
ent AS (
    SELECT tl.doc_id, tl.lang, voc.idx,
           CAST(ROUND((ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
               + 1.0) * 10000) AS BIGINT) AS units
    FROM tl JOIN dfreq USING (term) JOIN voc USING (term) CROSS JOIN n
)
SELECT r.lang,
       CAST(COUNT(DISTINCT r.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(e.idx) AS BIGINT) AS n_entries,
       CAST(SUM(COALESCE(e.units, 0)) AS BIGINT) AS sum_units,
       CAST(SUM(COALESCE((e.idx + 1) * e.units, 0)) AS BIGINT)
           AS checksum
FROM raw r LEFT JOIN ent e ON e.doc_id = r.doc_id
GROUP BY r.lang ORDER BY r.lang
"""


@query(
    "q_ml_idf",
    sql=_ML_IDF_ORACLE,
    tags=("dialect", "text", "ml"),
)
def q_ml_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ML.IDF(tokens) OVER()`` (r13, VERDICT r12 item 7): the
    df-only leg of the two-pass corpus rewrite — per document, one
    ARRAY<STRUCT<index, value>> entry per DISTINCT term with the
    smooth-idf factor as value. The twin recomputes idf relationally
    in DuckDB from an independent tokenization, including the
    distributed-prefix-sum vocabulary index (verified through the
    index-weighted checksum). Per-entry values reduce to integer 1e-4
    units before summation so the comparison is order-independent.
    Reference: BigQuery text-preprocessing surface (delegated,
    main.py:21, 49-50)."""
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    load(spark, sf_dir, "documents").createOrReplaceTempView("idf_docs")
    cat = LakeCatalog(spark)
    return cat.bq_sql("""
        SELECT lang,
               CAST(COUNT(*) AS INT64) AS n_docs,
               CAST(SUM(ARRAY_LENGTH(vec)) AS INT64) AS n_entries,
               CAST(SUM(AGGREGATE(vec, CAST(0 AS INT64), (__a, __e) ->
                   __a + CAST(ROUND(__e.value * 10000) AS INT64)))
                   AS INT64) AS sum_units,
               CAST(SUM(AGGREGATE(vec, CAST(0 AS INT64), (__a, __e) ->
                   __a + (__e.index + 1) *
                   CAST(ROUND(__e.value * 10000) AS INT64)))
                   AS INT64) AS checksum
        FROM (
            SELECT doc_id, lang,
                   ML.IDF(TEXT_ANALYZE(text)) OVER() AS vec
            FROM idf_docs WHERE MOD(doc_id, 2) = 1
        ) GROUP BY lang ORDER BY lang
    """)
