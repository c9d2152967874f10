"""End-to-end Tier-A pipeline as declared queries: the full
decode → enrich → flatten and decode → enrich → explode chains over the
deterministic in-repo fixtures, so the driver executes the pipeline
library itself, not just its per-step fixture twins.

Oracle strategy: the fixture generators are pure functions of the block
range (fixtures.py — no RNG), so the EXACT expected output is computed
here in plain Python (independent of Spark: no from_json, no explode,
no broadcast join) and embedded as a DuckDB VALUES literal. The twin
therefore adjudicates the whole Spark pipeline — schema decode, JSON
parsing, the A6 broadcast join, the A8 fan-out — against a
straight-line re-derivation.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from bigquery_etl_spark.pipeline.extract import (
    MARKETPLACE_ADDRESS,
    decode_events,
    enrich_with_docs,
    explode_products,
    flatten_listings,
)
from bigquery_etl_spark.pipeline.fixtures import (
    START_BLOCK,
    _doc_for_hash,
    _events_for_block,
    make_ipfs_docs,
    make_raw_logs,
)
from bigquery_etl_spark.registry import query


def _enriched(spark: SparkSession) -> DataFrame:
    raw = make_raw_logs(spark, START_BLOCK, START_BLOCK + 49)
    docs = make_ipfs_docs(spark, raw)
    return enrich_with_docs(decode_events(raw), ipfs_docs=docs)


# -- pure-Python expected output (mirrors flatten/explode semantics) --------


def _sql_lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "DOUBLE":
        return f"CAST({v!r} AS {typ})"
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if typ in ("BIGINT", "INTEGER"):
        return f"CAST({int(v)} AS {typ})"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    body = ",\n".join(
        "(" + ", ".join(_sql_lit(v, t) for v, (_, t) in zip(r, cols)) + ")"
        for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({names})"


def _expected() -> tuple[list[tuple], list[tuple]]:
    listings, products = [], []
    for b in range(START_BLOCK, START_BLOCK + 50):
        for (block, li, addr, _ev, listing_id, h) in _events_for_block(b):
            if addr != MARKETPLACE_ADDRESS:
                continue  # the A4 filter drops foreign contracts
            doc = json.loads(_doc_for_hash(h))
            price = doc["price"]
            listings.append(
                (block, li, listing_id, h, doc["listingType"], doc["category"],
                 doc["subcategory"], doc["language"], doc["title"],
                 doc["description"], price["amount"], price["currency"])
            )
            for p in doc["products"] or []:
                products.append(
                    (block, li, listing_id, p["id"], f"{h}/{p['id']}",
                     p["externalId"], p["parentExternalId"], p["title"],
                     p["description"], p["price"], p["currency"],
                     p["option1"], p["option2"], p["option3"], p["image"])
                )
    return listings, products


_LISTING_COLS = [
    ("block_number", "BIGINT"), ("log_index", "INTEGER"),
    ("listing_id", "VARCHAR"), ("ipfs_hash", "VARCHAR"),
    ("listing_type", "VARCHAR"), ("category", "VARCHAR"),
    ("subcategory", "VARCHAR"), ("language", "VARCHAR"),
    ("title", "VARCHAR"), ("description", "VARCHAR"),
    ("price", "DOUBLE"), ("currency", "VARCHAR"),
]
_PRODUCT_COLS = [
    ("block_number", "BIGINT"), ("log_index", "INTEGER"),
    ("listing_id", "VARCHAR"), ("product_id", "VARCHAR"),
    ("ipfs_path", "VARCHAR"), ("external_id", "VARCHAR"),
    ("parent_external_id", "VARCHAR"), ("title", "VARCHAR"),
    ("description", "VARCHAR"), ("price", "BIGINT"),
    ("currency", "VARCHAR"), ("option1", "VARCHAR"),
    ("option2", "VARCHAR"), ("option3", "VARCHAR"), ("image", "VARCHAR"),
]
_EXPECTED_LISTINGS, _EXPECTED_PRODUCTS = _expected()


@query(
    "q_pipeline_listings",
    sql=_values_sql(_EXPECTED_LISTINGS, _LISTING_COLS),
    tags=("pipeline", "e2e"),
)
def q_pipeline_listings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full marketplace path: 50 blocks of raw logs → the 12-column
    golden listings shape (ref main.py:51-64). Exact VALUES twin from
    the closed-form fixture generator."""
    return flatten_listings(_enriched(spark))


@query(
    "q_pipeline_products",
    sql=_values_sql(_EXPECTED_PRODUCTS, _PRODUCT_COLS),
    tags=("pipeline", "e2e"),
)
def q_pipeline_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dshop path: variant fan-out to the 15-column golden products
    shape (ref main.py:65-81). Exact VALUES twin from the closed-form
    fixture generator."""
    return explode_products(_enriched(spark))
