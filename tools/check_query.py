"""Run one or more declared queries against their DuckDB oracle twins
(the driver's comparison) at a given scale factor — the quick loop for
developing a new registry entry.

Usage: python tools/check_query.py q_name [q_name ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-query")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from bigquery_etl_spark.oracle import compare, run_duckdb

    qs, oracles = E.queries(), E.oracle_sql()
    rc = 0
    for name in args:
        if name not in qs:
            print(f"FAIL {name}: not in registry")
            rc = 1
            continue
        try:
            pdf = qs[name](spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: raised {exc!r}")
            rc = 1
            continue
        bad = [
            c for c in pdf.columns
            if pdf[c].dtype == object
            and pdf[c].map(
                lambda v: isinstance(v, (list, dict, set))
                or type(v).__name__ == "ndarray").any()
        ]
        if bad:
            print(f"FAIL {name}: unhashable output columns {bad}")
            rc = 1
            continue
        if name not in oracles:
            print(f"OK   {name}: {len(pdf)} rows (rows-only, no oracle)")
            continue
        errs = compare(pdf, run_duckdb(oracles[name], sf))
        if errs:
            print(f"FAIL {name}: {errs}")
            print(pdf.head(5))
            rc = 1
        else:
            print(f"OK   {name}: {len(pdf)} rows vs oracle")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
