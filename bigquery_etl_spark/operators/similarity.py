"""Similarity search over embedding columns (SURVEY.md §2 C5/C6).

Two paths, both DataFrame-native over array<float> columns:

- cosine_topk_bruteforce: exact top-k. The query set broadcasts; the
  corpus streams through one scan with a JVM-side dot product
  (zip_with + aggregate — no Python in the loop) and a per-query top-k
  window. Baseline and rerank kernel.
- lsh_topk: random-hyperplane LSH. Each vector gets a sign-bit bucket
  per table; candidates = bucket collisions in any table; exact rerank
  only on candidates. Corpus shuffles (tables × docs) rows — at 100 TB
  the bucket join replaces the all-pairs product that brute force would
  need for a large query set.

Hyperplanes are generated once, driver-side, from a fixed seed
(numpy), broadcast as literals — deterministic across runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Plan: broadcast(queries) × corpus → cosine → per-query top-k.
    Scales in corpus size (one scan, no corpus shuffle beyond the
    window's partition-by-query exchange, which carries only scored
    rows; with WindowGroupLimit Spark keeps k rows per query per task)."""
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = corpus.select(id_col, vec_col).crossJoin(q).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(float).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector for one table's hyperplane set."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))  # disjoint bits
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates + exact rerank.

    Collision probability per table = (1 - θ/π)^n_planes; n_tables
    OR-amplifies recall. Candidates dedupe on (query, id) before the
    exact cosine, so rerank cost is |candidates|, not |corpus|."""
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def bucketed(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        return df.select(
            idc,
            vecc,
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("table"), lsh_bucket(F.col(vecc), tables[t]).alias("bucket"))
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(idc, vecc, "tb.table", "tb.bucket")

    cb = bucketed(corpus.select(id_col, vec_col), id_col, vec_col)
    qb = F.broadcast(bucketed(queries.select(query_id_col, query_vec_col), query_id_col, query_vec_col))

    cands = (
        cb.join(qb, ["table", "bucket"])
        .select(query_id_col, id_col, vec_col, query_vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim")
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
