"""bigquery_etl_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL service
(OriginProtocol/bigquery-etl, surveyed in SURVEY.md) as an idiomatic
Spark engine:

- ``plans``      declared analytic queries (SURVEY.md §2 Tier B/C), each
                 with a DuckDB oracle twin for differential testing.
- ``operators``  library operators Spark lacks natively (as-of join,
                 dedup family, similarity search, top-k).
- ``functions``  scalar/text function packs built on pyspark.sql.functions.
- ``sources``    table loaders / incremental micro-batch source.
- ``pipeline``   the Tier-A ETL dataflow (decode → enrich → flatten →
                 explode → dual sink with exactly-once merge).
- ``streaming``  Structured Streaming forms of the pipeline operators.
"""

__version__ = "0.1.0"
