"""Extraction dataflow operators (SURVEY.md §2 A4-A8).

Each step is a declarative DataFrame transform; the whole chain is one
Catalyst plan — filter pushdown reaches the raw_logs scan, the doc join
broadcasts when the doc dimension is small, and explode runs inside the
scan stage. Contrast with the reference, which streams rows through
Python callbacks (ref main.py:147-156, ExportOriginJob with two
item_exporters).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigquery_etl_spark.pipeline.schemas import LISTING_DOC_SCHEMA

MARKETPLACE_ADDRESS = "0x_origin_marketplace"  # fixture address (A4 filter target)


def decode_events(raw_logs: DataFrame, address: str = MARKETPLACE_ADDRESS) -> DataFrame:
    """A4+A5: contract-address filter + typed projection.

    The filter sits directly on the scan so it pushes into parquet row-
    group pruning (the reference pushed the same predicate into its RPC
    request, ref main.py:147)."""
    return raw_logs.filter(F.col("address") == address).select(
        "block_number", "log_index", "event_name", "listing_id", "ipfs_hash"
    )


def enrich_with_docs(
    events: DataFrame,
    ipfs_docs: DataFrame | None = None,
    fetcher: Callable[[list[str]], dict[str, str]] | None = None,
) -> DataFrame:
    """A6: per-event document enrichment, two strategies.

    - ``ipfs_docs`` (pre-fetched dimension table): broadcast hash join —
      the 100 TB path when the KV contents are mirrorable.
    - ``fetcher`` (callable hash->json): batched ``mapInPandas`` fetch —
      the live-KV path; one call per Arrow batch per partition, the
      Spark port of the reference's 5-worker fetch pool
      (ref main.py:38, 152). Supply exactly one of the two.
    """
    if (ipfs_docs is None) == (fetcher is None):
        raise ValueError("supply exactly one of ipfs_docs / fetcher")

    if ipfs_docs is not None:
        return events.join(F.broadcast(ipfs_docs), "ipfs_hash", "left")

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(events.schema.fields) + [T.StructField("doc", T.StringType())]
    )

    def fetch_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            hashes = pdf["ipfs_hash"].dropna().unique().tolist()
            docs = fetcher(hashes) if hashes else {}
            yield pdf.assign(doc=pdf["ipfs_hash"].map(docs))

    return events.mapInPandas(fetch_batches, schema=out_schema)


def flatten_listings(enriched: DataFrame) -> DataFrame:
    """A7: nested JSON doc → the 12 flat marketplace columns
    (ref main.py:51-64), via from_json with the explicit doc schema —
    never string munging (SURVEY.md §1.4)."""
    d = F.from_json("doc", LISTING_DOC_SCHEMA)
    return enriched.select(
        "block_number",
        "log_index",
        "listing_id",
        "ipfs_hash",
        d.getField("listingType").alias("listing_type"),
        d.getField("category").alias("category"),
        d.getField("subcategory").alias("subcategory"),
        d.getField("language").alias("language"),
        d.getField("title").alias("title"),
        d.getField("description").alias("description"),
        d.getField("price").getField("amount").alias("price"),
        d.getField("price").getField("currency").alias("currency"),
    )


def explode_products(enriched: DataFrame) -> DataFrame:
    """A8: variant fan-out — one listing doc → N dshop product rows
    (ref main.py:65-81; product_schema.json:33-79). explode drops
    listings with no products array, matching the reference's behavior
    of only exporting dshop rows for product-bearing listings."""
    d = F.from_json("doc", LISTING_DOC_SCHEMA)
    p = F.explode(d.getField("products")).alias("p")
    exploded = enriched.select(
        "block_number", "log_index", "listing_id", "ipfs_hash", p
    )
    return exploded.select(
        "block_number",
        "log_index",
        "listing_id",
        F.col("p.id").alias("product_id"),
        F.concat(F.col("ipfs_hash"), F.lit("/"), F.col("p.id")).alias("ipfs_path"),
        F.col("p.externalId").alias("external_id"),
        F.col("p.parentExternalId").alias("parent_external_id"),
        F.col("p.title").alias("title"),
        F.col("p.description").alias("description"),
        F.col("p.price").alias("price"),
        F.col("p.currency").alias("currency"),
        F.col("p.option1").alias("option1"),
        F.col("p.option2").alias("option2"),
        F.col("p.option3").alias("option3"),
        F.col("p.image").alias("image"),
    )
