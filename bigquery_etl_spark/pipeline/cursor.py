"""Cursor store (SURVEY.md §2 A12/A17): the etl_cursor analogue.

The reference keeps a single-row Postgres table (id, block_number,
created_at, updated_at — ref main.py:239-243; migration
6278201ba186:21-27) and UPDATEs it after each successful load
(ref main.py:132-142). Here: a tiny parquet directory written
atomically (write-new + rename via versioned subdirs). Correctness does
NOT depend on the cursor being transactional with the sink — the sinks
are idempotent merges, so a crash between sink and cursor commit only
causes a harmless re-merge (the exactly-once fix for ref main.py:209-216).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.pipeline.schemas import ETL_CURSOR_SCHEMA


class CursorStore:
    def __init__(self, spark: SparkSession, path: str, start_block: int = 10_014_455 - 1):
        # default start mirrors START_BLOCK_EPOCH (ref main.py:29)
        self.spark = spark
        self.path = path
        self.start_block = start_block

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(self.path) if d.startswith("v") and d[1:].isdigit()
        )

    def get(self) -> int:
        """Current high-watermark block (exclusive start of next range)."""
        versions = self._versions()
        if not versions:
            return self.start_block
        df = self.spark.read.schema(ETL_CURSOR_SCHEMA).parquet(
            f"{self.path}/v{versions[-1]}"
        )
        return df.agg(F.max("block_number")).collect()[0][0]

    def set(self, block_number: int) -> None:
        """Advance the cursor (A12). New version dir then prune old ones —
        readers never see a partially-written cursor."""
        versions = self._versions()
        next_v = (versions[-1] + 1) if versions else 0
        row = self.spark.createDataFrame(
            [(1, block_number)], "id int, block_number long"
        ).select(
            "id",
            "block_number",
            F.current_timestamp().alias("created_at"),
            F.current_timestamp().alias("updated_at"),
        )
        row.coalesce(1).write.mode("overwrite").parquet(f"{self.path}/v{next_v}")
        for v in versions[:-1]:  # keep previous for crash recovery
            shutil.rmtree(f"{self.path}/v{v}", ignore_errors=True)
