"""Deterministic in-repo fixtures for the Tier-A pipeline tests
(FIXTURES.md §2: raw_logs + ipfs_docs). Pure functions of block range —
no RNG — so replay tests are exact.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.pipeline.extract import MARKETPLACE_ADDRESS
from bigquery_etl_spark.pipeline.schemas import IPFS_DOCS_SCHEMA, RAW_LOGS_SCHEMA

START_BLOCK = 10_014_455  # ref main.py:29 START_BLOCK_EPOCH

_CATEGORIES = ["electronics", "apparel", "home", "art"]
_CURRENCIES = ["ETH", "DAI", "USD"]


def _events_for_block(block: int) -> list[tuple]:
    """2 marketplace events per block + 1 foreign-contract event (the A4
    filter must drop it)."""
    rows = []
    for li in range(2):
        listing = f"listing-{block}-{li}"
        rows.append(
            (block, li, MARKETPLACE_ADDRESS, "ListingCreated", listing, f"Qm{block}x{li}")
        )
    rows.append((block, 2, "0x_other_contract", "Transfer", f"foreign-{block}", f"Qmfff{block}"))
    return rows


def make_raw_logs(spark: SparkSession, start_block: int, end_block: int) -> DataFrame:
    rows = [r for b in range(start_block, end_block + 1) for r in _events_for_block(b)]
    return spark.createDataFrame(rows, RAW_LOGS_SCHEMA)


def _doc_for_hash(ipfs_hash: str) -> str:
    """Nested listing doc keyed off the hash digits; every 3rd listing
    carries a products array (A8 fan-out), every 5th has no subcategory."""
    seed = sum(ord(c) for c in ipfs_hash)
    n_products = (seed % 3) and 0 or (seed % 4 + 1)  # every 3rd hash: 1-4 products
    doc = {
        "listingType": "unit",
        "category": _CATEGORIES[seed % len(_CATEGORIES)],
        "subcategory": None if seed % 5 == 0 else f"sub-{seed % 7}",
        "language": ["en", "de", "fr"][seed % 3],
        "title": f"Listing {ipfs_hash}",
        "description": f"Description for {ipfs_hash}",
        "price": {"amount": round(0.5 + (seed % 100) / 7.0, 4), "currency": _CURRENCIES[seed % 3]},
        "products": [
            {
                "id": f"p{ipfs_hash}-{i}",
                "externalId": f"ext-{seed}-{i}",
                "parentExternalId": f"ext-{seed}" if i else None,
                "title": f"Product {i} of {ipfs_hash}",
                "description": f"Variant {i}",
                "price": 1000 + seed * 10 + i,
                "currency": _CURRENCIES[(seed + i) % 3],
                "option1": f"size-{i}" if i % 2 == 0 else None,
                "option2": f"color-{i}" if i % 3 == 0 else None,
                "option3": None,
                "image": f"ipfs://{ipfs_hash}/img{i}.png",
            }
            for i in range(n_products)
        ]
        or None,
    }
    return json.dumps(doc)


def make_ipfs_docs(spark: SparkSession, raw_logs: DataFrame) -> DataFrame:
    hashes = [r.ipfs_hash for r in raw_logs.select("ipfs_hash").distinct().collect()]
    return spark.createDataFrame(
        [(h, _doc_for_hash(h)) for h in sorted(hashes)], IPFS_DOCS_SCHEMA
    )


def fetcher_for(docs: DataFrame):
    """A6 live-KV fetcher stub: hash -> doc dict built once driver-side.

    FIXTURE-ONLY PATTERN: this collect() emulates an external KV
    service for tests, bounded by the fixture's hash set. The real
    enrichment join (pipeline/extract.py) is a broadcast equi-join —
    never copy this driver-side dict into a production lookup path."""
    table = {r.ipfs_hash: r.doc for r in docs.collect()}

    def fetch(hashes: list[str]) -> dict[str, str]:
        return {h: table[h] for h in hashes if h in table}

    return fetch
