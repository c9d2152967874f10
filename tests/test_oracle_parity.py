"""Differential test: every declared query vs its DuckDB oracle twin.

This is the local mirror of the driver's t2 gate (run at sf0.001 for
speed; the driver uses sf0.01 — set SPARK_GRAFT_TEST_SF_DIR to match).
"""

from __future__ import annotations

import pytest

from bigquery_etl_spark.oracle import compare, run_duckdb
from bigquery_etl_spark.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    spark_pdf = df.toPandas()
    if spec.sql is None:
        # rows-only check: plan executes, schema is stable, returns rows
        assert spark_pdf.shape[1] > 0
        return
    oracle_pdf = run_duckdb(spec.sql, sf_dir)
    errs = compare(spark_pdf, oracle_pdf)
    assert not errs, f"{name}: " + "; ".join(errs)
