"""One-off profile: partition-scoped MERGE vs full-snapshot MERGE at
~sf1 (the 10x key-shifted dataset tools/scale_bench.py builds).

Builds a month-partitioned orders table (~2.5M rows, 80 partitions),
then MERGEs a one-month source batch twice: once with the partition
pin in ON (scoped path), once without (full path). Prints one JSON
line per leg: seconds + files rewritten vs carried — the evidence row
for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from bigquery_etl_spark.session import get_spark
    from bigquery_etl_spark.sources import load
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale"
    spark = get_spark(app_name="scoped-merge-profile", cpus="32",
                      shuffle_partitions=32)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    src = o.filter(
        (F.col("o_orderdate") >= "1996-02-01")
        & (F.col("o_orderdate") < "1996-03-01")
    ).select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    src.persist().count()
    src.createOrReplaceTempView("pm_batch")

    for label, on in (
        ("scoped", "t.o_orderdate = s.o_orderdate AND t.o_orderkey = s.o_orderkey"),
        ("full", "t.o_orderkey = s.o_orderkey"),
    ):
        root = tempfile.mkdtemp(prefix=f"pmprof_{label}_")
        cat = LakeCatalog(spark, warehouse=os.path.join(root, "wh"))
        o.createOrReplaceTempView("pm_all")
        cat.sql(
            "CREATE TABLE pmt PARTITION BY "
            "DATE_TRUNC(o_orderdate, MONTH) AS SELECT * FROM pm_all"
        )
        tbl = cat.tables["pmt"]
        before = {e["path"] for e in tbl.files(version=1)}
        t0 = time.time()
        cat.sql(
            f"MERGE INTO pmt t USING pm_batch s ON {on} "
            "WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice "
            "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderdate, "
            "o_totalprice) VALUES (s.o_orderkey, s.o_orderdate, "
            "s.o_totalprice)"
        )
        sec = time.time() - t0
        after = {e["path"] for e in tbl.files(version=2)}
        print(json.dumps({
            "leg": label,
            "merge_sec": round(sec, 2),
            "files_before": len(before),
            "carried": len(before & after),
            "rewritten_or_new": len(after - before),
        }))
        cat.tables.clear()


if __name__ == "__main__":
    main()
