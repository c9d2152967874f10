"""Semantics tests for operators/similarity.py on known-geometry vectors."""

from __future__ import annotations

import math

from bigquery_etl_spark.operators.similarity import cosine_topk_bruteforce, lsh_topk


def _frames(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),   # close to q
            (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
            (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite
            (5, [1.0, 0.0, 0.0, 0.0]),   # identical to q
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "query_id long, query_vec array<double>"
    )
    return corpus, queries


def test_bruteforce_ranking_and_scores(spark):
    corpus, queries = _frames(spark)
    out = cosine_topk_bruteforce(corpus, queries, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [1, 5, 2]  # cos=1,1,~0.994; id tiebreak
    assert math.isclose(out[0].cos_sim, 1.0, abs_tol=1e-9)
    assert math.isclose(out[2].cos_sim, 0.9 / math.hypot(0.9, 0.1), rel_tol=1e-9)


def test_bruteforce_k_bounds_output(spark):
    corpus, queries = _frames(spark)
    assert cosine_topk_bruteforce(corpus, queries, k=2).count() == 2


def test_lsh_finds_identical_vectors(spark):
    corpus, queries = _frames(spark)
    out = lsh_topk(corpus, queries, dim=4, k=3, n_tables=4, n_planes=4).orderBy("rank").collect()
    ids = [r.vec_id for r in out]
    # identical vectors hash to the query's bucket in every table -> always found
    assert 1 in ids and 5 in ids
    assert ids == sorted(ids, key=lambda i: -next(r.cos_sim for r in out if r.vec_id == i))
