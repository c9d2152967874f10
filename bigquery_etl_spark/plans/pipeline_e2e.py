"""End-to-end Tier-A pipeline as a declared query (rows-only): the full
decode → enrich → flatten and decode → enrich → explode chains over the
deterministic in-repo fixtures, so the driver executes the pipeline
library itself, not just its per-step fixture twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.pipeline.extract import (
    decode_events,
    enrich_with_docs,
    explode_products,
    flatten_listings,
)
from bigquery_etl_spark.pipeline.fixtures import START_BLOCK, make_ipfs_docs, make_raw_logs
from bigquery_etl_spark.registry import query


def _enriched(spark: SparkSession) -> DataFrame:
    raw = make_raw_logs(spark, START_BLOCK, START_BLOCK + 49)
    docs = make_ipfs_docs(spark, raw)
    return enrich_with_docs(decode_events(raw), ipfs_docs=docs)


@query("q_pipeline_listings", sql=None, tags=("pipeline", "e2e"))
def q_pipeline_listings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full marketplace path: 50 blocks of raw logs → the 12-column
    golden listings shape (ref main.py:51-64)."""
    return flatten_listings(_enriched(spark))


@query("q_pipeline_products", sql=None, tags=("pipeline", "e2e"))
def q_pipeline_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dshop path: variant fan-out to the 15-column golden products
    shape (ref main.py:65-81)."""
    return explode_products(_enriched(spark))
