"""Distributed block-range source (SURVEY.md §2 A1+A3).

The reference splits [start, end] into ≤1000-block chunks fanned over 5
worker threads doing JSON-RPC getLogs (ref main.py:34-38, 147-155).
Spark form: ``spark.range(start, end+1)`` → one row per block →
repartition to the desired fetch parallelism → ``mapInPandas`` calls a
pluggable per-range fetcher once per Arrow batch. Fetch parallelism =
number of partitions (the 5-worker pool generalized to the cluster), and
the provider's 1000-block request cap becomes the batch chunking inside
the fetcher call.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# a fetcher takes (start_block, end_block) and returns rows as dicts
RangeFetcher = Callable[[int, int], list[dict]]


def block_range_source(
    spark: SparkSession,
    start_block: int,
    end_block: int,
    fetcher: RangeFetcher,
    schema: T.StructType,
    fetch_parallelism: int = 5,  # ref main.py:38 JOB_MAX_WORKERS
    max_blocks_per_call: int = 1000,  # ref main.py:34-35 provider cap
) -> DataFrame:
    """Fetch an event-log range as a DataFrame, distributed by block.

    Each task receives a contiguous-ish set of block numbers, groups them
    into runs of ≤max_blocks_per_call, and invokes the fetcher per run —
    so RPC count is ceil(range/max_blocks), independent of parallelism."""
    import pandas as pd

    blocks = spark.range(start_block, end_block + 1).toDF("block_number")
    blocks = blocks.repartition(fetch_parallelism)

    def fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            nums = sorted(int(b) for b in pdf["block_number"])
            if not nums:
                continue
            runs: list[tuple[int, int]] = []
            lo = prev = nums[0]
            for n in nums[1:]:
                if n != prev + 1 or n - lo + 1 > max_blocks_per_call:
                    runs.append((lo, prev))
                    lo = n
                prev = n
            runs.append((lo, prev))
            for a, b in runs:
                rows = fetcher(a, b)
                yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return blocks.mapInPandas(fetch, schema=schema)
