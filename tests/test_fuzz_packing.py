"""Seeded differential fuzz for the distributed prefix-sum rewrites
(operators/packing.py): random key distributions (incl. zipf-hot),
negative values, random bucket counts — each case compared row-for-row
against the direct single-window formulation Spark itself computes.
Same philosophy as the RANGE-frame fuzz (tests/test_range_frame.py):
the rewrite must be byte-identical to the spec, not plausibly close."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigquery_etl_spark.operators.packing import (
    pack_sequences,
    segmented_running_sum,
)

SEEDS = [11, 23, 37, 58]


def _random_rows(seed: int):
    rng = random.Random(seed)
    n = rng.randrange(200, 2000)
    n_keys = rng.choice([1, 3, 17, n])  # incl. all-one-key and all-distinct
    hot = rng.random() < 0.5
    rows = []
    for i in range(n):
        if hot and rng.random() < 0.6:
            k = 0  # hot key with 60% of rows
        else:
            k = rng.randrange(n_keys)
        v = rng.randrange(-1000, 1000)
        rows.append((k, i, v))  # order col globally unique
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_segmented_running_sum(spark, seed):
    rng = random.Random(seed * 7)
    rows = _random_rows(seed)
    df = spark.createDataFrame(rows, "k long, o long, v long").repartition(8)
    n_buckets = rng.choice([1, 2, 5, 16, 64])
    seg = segmented_running_sum(df, "k", "o", "v", n_buckets=n_buckets)
    w = (
        Window.partitionBy("k")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    direct = df.withColumn("ref_rs", F.sum("v").over(w)).withColumnRenamed(
        "v", "ref_v"
    )
    # key-only join + eqNullSafe value compare: joining on ALL columns
    # coalesces them (USING semantics) and the isNull mismatch filter
    # can never fire — the original form of this test was vacuous
    mism = seg.join(direct, ["k", "o"], "full_outer").filter(
        ~F.col("running_sum").eqNullSafe(F.col("ref_rs"))
        | ~F.col("v").eqNullSafe(F.col("ref_v"))
    )
    assert mism.count() == 0, f"seed={seed} n_buckets={n_buckets}"
    assert seg.count() == len(rows)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pack_sequences(spark, seed):
    rng = random.Random(seed * 13)
    n = rng.randrange(100, 1500)
    # token counts incl. zero-token and budget-dwarfing docs
    rows = [
        (i, rng.choice([0, 1, 7, 40, 150, 5000]) if rng.random() < 0.9 else 0)
        for i in range(n)
    ]
    budget = rng.choice([1, 100, 1000])
    n_buckets = rng.choice([1, 3, 32])
    df = spark.createDataFrame(rows, "id long, toks long")
    packed = pack_sequences(df, "id", "toks", budget=budget, n_buckets=n_buckets)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    naive = df.withColumn(
        "ref_shard", F.floor((F.sum("toks").over(w) - F.col("toks")) / F.lit(budget))
    ).withColumnRenamed("toks", "ref_tokens")
    mism = packed.join(naive, "id", "full_outer").filter(
        ~F.col("shard_id").eqNullSafe(F.col("ref_shard"))
        | ~F.col("n_tokens").eqNullSafe(F.col("ref_tokens"))
    )
    assert mism.count() == 0, f"seed={seed} budget={budget} n_buckets={n_buckets}"


def test_chunk_documents_boundaries(spark):
    from bigquery_etl_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # n == chunk -> 1 chunk
            (2, " ".join(f"t{i}" for i in range(11))),  # n == chunk+1 -> 2
            (3, "short"),                               # n < chunk -> whole doc
            (4, ""),                                    # degenerate -> 1 chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=10, overlap=4)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert sorted(rows) == [(1, 0), (2, 0), (2, 1), (3, 0), (4, 0)]
    assert rows[(1, 0)].n_tokens == 10
    # second chunk starts at stride=6: tokens 6..10 -> 5 tokens, and the
    # first `overlap` tokens of chunk 1 repeat the tail of chunk 0
    assert rows[(2, 1)].n_tokens == 5
    assert rows[(2, 1)].chunk_text.split()[:4] == rows[(2, 0)].chunk_text.split()[6:]
    assert rows[(3, 0)].chunk_text == "short" and rows[(3, 0)].n_tokens == 1


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from bigquery_etl_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=8, overlap=8)
