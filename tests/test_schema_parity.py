"""Golden-schema parity vs the reference's published JSON schemas
(/root/reference/schema/*.json — read-only).

Names and types must match field-for-field. Modes are compared against
main.py's declarations (SURVEY.md §1.3: main.py is canonical; the JSON
files carry known drift — e.g. dshop currency is REQUIRED in main.py:76
but NULLABLE in product_schema.json)."""

from __future__ import annotations

import json
import os

import pytest

from bigquery_etl_spark.pipeline.schemas import (
    DSHOP_PRODUCTS_SCHEMA,
    MARKETPLACE_LISTINGS_SCHEMA,
    schema_to_json,
)

REF = "/root/reference/schema"


@pytest.mark.parametrize(
    "ours,ref_file",
    [
        (MARKETPLACE_LISTINGS_SCHEMA, "marketplace_schema.json"),
        (DSHOP_PRODUCTS_SCHEMA, "product_schema.json"),
    ],
)
def test_output_schema_matches_reference_json(ours, ref_file):
    path = os.path.join(REF, ref_file)
    if not os.path.exists(path):
        pytest.skip("reference schemas not available")
    ref = json.load(open(path))
    mine = schema_to_json(ours)
    assert [(f["name"], f["type"]) for f in mine] == [
        (f["name"], f["type"]) for f in ref
    ]


def test_required_modes_match_main_py_declarations():
    """mode=REQUIRED set from ref main.py:51-81 (canonical)."""
    mk_required = {f["name"] for f in schema_to_json(MARKETPLACE_LISTINGS_SCHEMA) if f["mode"] == "REQUIRED"}
    assert mk_required == {"block_number", "log_index", "listing_id", "ipfs_hash"}
    ds_required = {f["name"] for f in schema_to_json(DSHOP_PRODUCTS_SCHEMA) if f["mode"] == "REQUIRED"}
    assert ds_required == {
        "block_number",
        "log_index",
        "listing_id",
        "product_id",
        "ipfs_path",
        "title",
        "description",
        "price",
        "currency",
    }
