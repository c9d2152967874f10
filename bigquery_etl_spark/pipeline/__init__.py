"""Tier-A ETL pipeline (SURVEY.md §2 A1-A17, §4.3.1).

The reference's dataflow — poll chain head, extract a block range,
decode events, enrich from an external KV store, flatten nested JSON,
explode variants, stage NDJSON, bulk-load a warehouse table, advance a
cursor (ref main.py:197-219) — re-expressed as a Spark library with the
at-least-once replay bug (ref main.py:209-216) fixed by idempotent merge
on (block_number, log_index[, product_id]).
"""

from bigquery_etl_spark.pipeline.cursor import CursorStore
from bigquery_etl_spark.pipeline.extract import (
    decode_events,
    enrich_with_docs,
    flatten_listings,
    explode_products,
)
from bigquery_etl_spark.pipeline.runner import EtlBatchRunner
from bigquery_etl_spark.pipeline.sinks import merge_append, write_ndjson_staging

__all__ = [
    "CursorStore",
    "EtlBatchRunner",
    "decode_events",
    "enrich_with_docs",
    "explode_products",
    "flatten_listings",
    "merge_append",
    "write_ndjson_staging",
]
