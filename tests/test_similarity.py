"""Semantics tests for operators/similarity.py on known-geometry vectors."""

from __future__ import annotations

import math

from bigquery_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    lsh_topk,
    train_ivf_centroids,
)
from bigquery_etl_spark.sources import load


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


def test_ivf_exact_when_probing_all_lists(spark):
    """nprobe == n_centroids degenerates to exact brute force — same
    result set as cosine_topk_bruteforce on known geometry."""
    corpus, queries = _frames(spark)
    out = ivf_topk(corpus, queries, k=3, n_centroids=2, nprobe=2).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [1, 5, 2]


def test_ivf_centroids_are_unit_norm_and_deterministic(spark):
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    c1 = train_ivf_centroids(emb, n_centroids=4, n_iters=2)
    c2 = train_ivf_centroids(emb, n_centroids=4, n_iters=2)
    assert c1 == c2  # no RNG anywhere
    for c in c1:
        assert math.isclose(sum(x * x for x in c) ** 0.5, 1.0, rel_tol=1e-9)


def test_ivf_recall_vs_bruteforce_on_fixture(spark):
    """recall@10 ≥ 0.5 with nprobe=4/16 on the embeddings fixture (and
    the candidate set is genuinely pruned, not a full scan)."""
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = (
        emb.orderBy("vec_id").limit(3)
        .select(emb.vec_id.alias("query_id"), emb.embedding.alias("query_vec"))
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4).collect()
    exact_ids = {(r.query_id, r.vec_id) for r in exact}
    approx_ids = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_ids & approx_ids) / len(exact_ids)
    assert recall >= 0.5
    # the probed lists must rank the query's own vector first (cos=1)
    own = [r for r in approx if r.vec_id == r.query_id]
    assert len(own) == 3 and all(r.rank == 1 for r in own)


def test_lsh_finds_identical_vectors(spark):
    corpus, queries = _frames(spark)
    out = lsh_topk(corpus, queries, dim=4, k=3, n_tables=4, n_planes=4).orderBy("rank").collect()
    ids = [r.vec_id for r in out]
    # identical vectors hash to the query's bucket in every table -> always found
    assert 1 in ids and 5 in ids
    assert ids == sorted(ids, key=lambda i: -next(r.cos_sim for r in out if r.vec_id == i))


def test_embedding_near_dup_drops_planted_keeps_originals(spark):
    """q_dedup_embed: every planted perturbed copy (cos ≈ 0.9998 to its
    lower-id original) is dropped; every original survives (no natural
    near-dups at threshold 0.95 in the fixture)."""
    from bigquery_etl_spark.plans.tierc import PLANT_OFFSET, q_dedup_embed
    from bigquery_etl_spark.sources import load

    from tests.conftest import SF_DIR

    survivors = {r.vec_id for r in q_dedup_embed(spark, SF_DIR).collect()}
    originals = {r.vec_id for r in load(spark, SF_DIR, "embeddings").select("vec_id").collect()}
    assert survivors == originals
    assert not any(v >= PLANT_OFFSET for v in survivors)


def test_embedding_near_dup_noop_on_clean_corpus(spark):
    """Precision guard: with no pair above threshold, nothing is dropped
    even though LSH buckets collide all over."""
    from bigquery_etl_spark.operators.similarity import embedding_near_dup
    from bigquery_etl_spark.sources import load

    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    assert embedding_near_dup(emb, dim=64, threshold=0.95).count() == emb.count()


def test_persisted_ivf_index_matches_per_call_ivf(spark, tmp_path):
    """Index-served search must return EXACTLY what per-call ivf_topk
    returns with the same centroids (same assignment, same probes,
    same rerank) — persistence only moves where assignment happens."""
    from bigquery_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
    )
    from bigquery_etl_spark.sources import load

    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    q = emb.orderBy("vec_id").limit(5).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, path, n_centroids=8)

    def canon(df):
        # the index path carries float64 query vectors (collected once
        # driver-side), the per-call path float32 — scores agree to
        # ~1e-7, so compare on a 5dp grid like the declared queries do
        return sorted(
            (r[0], r[1], round(r[2], 5), r[3]) for r in df.collect()
        )

    a = canon(ivf_index_topk(spark, path, q, k=10, nprobe=3, dim=64))
    b = canon(ivf_topk(
        emb, q, k=10, n_centroids=8, nprobe=3, centroids=cents, dim=64
    ))
    assert a == b


def test_persisted_ivf_scan_partition_prunes(spark, tmp_path):
    """The probe predicate must reach the scan as PartitionFilters —
    unprobed inverted lists are never opened (file-level skip, the
    scale contract of the persisted index)."""
    import re

    from bigquery_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )
    from bigquery_etl_spark.sources import load

    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    q = emb.orderBy("vec_id").limit(1).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8)
    df = ivf_index_topk(spark, path, q, k=5, nprobe=2, dim=64)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__c" in m.group(1), plan[:2000]
    # exactly nprobe inverted lists survive the prune (IN for small
    # sets, INSET past the conversion threshold)
    vals = set(re.findall(r"\b(\d+)\b", re.sub(r"#\d+", "", m.group(1))))
    assert len(vals) == 2, m.group(1)
