"""Explicit schemas for the pipeline (schema-on-write, no inference —
the discipline of ref main.py:51-81 / schema/*.json, with main.py as
canonical per SURVEY.md §1.3).

Output shapes reproduce the reference's two BigQuery tables exactly,
including the deliberate asymmetry: marketplace price is DOUBLE
(ref main.py:62) while dshop price is BIGINT (ref main.py:75).
nullable=False mirrors mode=REQUIRED (ref main.py:52-81).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- input: decoded chain event log (FIXTURES.md §2 raw_logs) -------------

RAW_LOGS_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.LongType(), False),
        T.StructField("log_index", T.IntegerType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("event_name", T.StringType(), False),
        T.StructField("listing_id", T.StringType(), False),
        T.StructField("ipfs_hash", T.StringType(), False),
    ]
)

# --- input: external KV store of nested JSON docs (FIXTURES.md §2) --------

IPFS_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("ipfs_hash", T.StringType(), False),
        T.StructField("doc", T.StringType(), False),
    ]
)

# The nested listing document (ref flat columns main.py:54-81 imply this
# shape; FIXTURES.md §2 spells it): scalars + price struct + products array.
LISTING_DOC_SCHEMA = T.StructType(
    [
        T.StructField("listingType", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("subcategory", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField(
            "price",
            T.StructType(
                [
                    T.StructField("amount", T.DoubleType()),
                    T.StructField("currency", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "products",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("externalId", T.StringType()),
                        T.StructField("parentExternalId", T.StringType()),
                        T.StructField("title", T.StringType()),
                        T.StructField("description", T.StringType()),
                        T.StructField("price", T.LongType()),
                        T.StructField("currency", T.StringType()),
                        T.StructField("option1", T.StringType()),
                        T.StructField("option2", T.StringType()),
                        T.StructField("option3", T.StringType()),
                        T.StructField("image", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# --- output: marketplace.listings (ref main.py:51-64) ---------------------

MARKETPLACE_LISTINGS_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.LongType(), False),
        T.StructField("log_index", T.IntegerType(), False),
        T.StructField("listing_id", T.StringType(), False),
        T.StructField("ipfs_hash", T.StringType(), False),
        T.StructField("listing_type", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("subcategory", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("currency", T.StringType()),
    ]
)

# --- output: dshop.products (ref main.py:65-81) ---------------------------

DSHOP_PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.LongType(), False),
        T.StructField("log_index", T.IntegerType(), False),
        T.StructField("listing_id", T.StringType(), False),
        T.StructField("product_id", T.StringType(), False),
        T.StructField("ipfs_path", T.StringType(), False),
        T.StructField("external_id", T.StringType()),
        T.StructField("parent_external_id", T.StringType()),
        T.StructField("title", T.StringType(), False),
        T.StructField("description", T.StringType(), False),
        T.StructField("price", T.LongType(), False),
        T.StructField("currency", T.StringType(), False),
        T.StructField("option1", T.StringType()),
        T.StructField("option2", T.StringType()),
        T.StructField("option3", T.StringType()),
        T.StructField("image", T.StringType()),
    ]
)

# --- checkpoint state (ref migrations/versions/6278201ba186…py:21-27) -----

ETL_CURSOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("block_number", T.LongType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)


def schema_to_json(schema: T.StructType) -> list[dict]:
    """Export a StructType in the reference's schema/*.json shape
    (name/type/mode triples) for parity checking."""
    spark_to_bq = {
        "bigint": "INTEGER",  # BigQuery INTEGER is INT64 (ref main.py:52)
        "int": "INTEGER",
        "string": "STRING",
        "double": "FLOAT64",
        "timestamp": "DATETIME",
    }
    return [
        {
            "name": f.name,
            "type": spark_to_bq.get(f.dataType.simpleString(), f.dataType.simpleString().upper()),
            "mode": "NULLABLE" if f.nullable else "REQUIRED",
        }
        for f in schema.fields
    ]
