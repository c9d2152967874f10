"""Round-3 Tier C operators: sequence packing, chunk dedup, perplexity,
diversity sampling — properties the oracle-parity hash can't see
(overflow bounds, determinism, distributed-rewrite equivalence)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigquery_etl_spark.functions.text import ws_tokens
from bigquery_etl_spark.operators.packing import pack_sequences, shard_manifest
from bigquery_etl_spark.sources import load

BUDGET = 500


def test_pack_matches_naive_window(spark, sf_dir):
    """The two-phase distributed prefix sum must be byte-identical to
    the single-global-window formulation, for every row."""
    d = load(spark, sf_dir, "documents")
    packed = pack_sequences(d, "doc_id", F.size(ws_tokens("text")), budget=BUDGET)

    base = d.select("doc_id", F.size(ws_tokens("text")).cast("long").alias("n_tokens"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = base.withColumn(
        "ref_shard",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(BUDGET)),
    ).withColumnRenamed("n_tokens", "ref_tokens")
    # join on the KEY only and value-compare with eqNullSafe: joining on
    # all columns coalesces them (USING semantics), making isNull
    # filters vacuous — a wrong shard_id would silently pass
    mism = (
        packed.join(naive, "doc_id", "full_outer")
        .filter(
            ~F.col("shard_id").eqNullSafe(F.col("ref_shard"))
            | ~F.col("n_tokens").eqNullSafe(F.col("ref_tokens"))
        )
    )
    assert mism.count() == 0
    assert packed.count() == d.count()


def test_pack_overflow_bound(spark, sf_dir):
    """Every shard's token total is < budget + max single-doc tokens
    (bounded-overflow contiguous packing), and every doc lands in
    exactly one shard."""
    d = load(spark, sf_dir, "documents")
    packed = pack_sequences(d, "doc_id", F.size(ws_tokens("text")), budget=BUDGET)
    max_doc = packed.agg(F.max("n_tokens")).first()[0]
    m = shard_manifest(packed)
    over = m.filter(F.col("total_tokens") >= BUDGET + max_doc).count()
    assert over == 0
    assert m.agg(F.sum("n_docs")).first()[0] == d.count()
    # shards are dense 0..max (no empty shard ids skipped)
    ids = [r[0] for r in m.select("shard_id").orderBy("shard_id").collect()]
    assert ids == list(range(len(ids)))


def test_pack_tiny_and_single_row(spark, sf_dir):
    """Degenerate inputs: one row -> one shard 0; doc bigger than the
    budget still gets its own shard (overflow tolerated, never lost)."""
    one = spark.createDataFrame([(1, 10_000)], "id long, toks long")
    p = pack_sequences(one, "id", "toks", budget=100).collect()
    assert len(p) == 1 and p[0]["shard_id"] == 0

    rows = [(i, 60) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, toks long")
    m = shard_manifest(pack_sequences(df, "id", "toks", budget=100))
    got = {r["shard_id"]: r["n_docs"] for r in m.collect()}
    # cum_before = 0,60,120,... -> shard = floor(cum_before/100)
    assert got == {0: 2, 1: 2, 2: 1, 3: 2, 4: 2, 5: 1}


def test_dedup_chunks_short_doc(spark):
    """Docs shorter than the chunk width form one short chunk; a doc
    that is a verbatim prefix of a lower-id doc is fully flagged."""
    import bigquery_etl_spark.plans.tierc2 as t2

    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d"), (2, "x y")],
        "doc_id long, text string",
    )
    # route the plan through a temp dir so the query helper loads it
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"])
            for r in t2.q_dedup_chunks(spark, tmp).collect()
        }
    assert out[0] == (2, 0)  # "a b c d","e f" — owner of both
    assert out[1] == (1, 1)  # "a b c d" already owned by doc 0
    assert out[2] == (1, 0)  # short unique chunk "x y"


def test_segmented_running_sum_matches_window(spark, sf_dir):
    """Distributed per-key prefix sum == direct window, row for row —
    including NEGATIVE values (bucket totals must be sum(v), not
    max(cumsum): a negative tail makes the running sum non-monotonic)."""
    from bigquery_etl_spark.operators.packing import segmented_running_sum

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 100).cast("long") - 200_000).alias("v"),
    )
    seg = segmented_running_sum(o, "o_custkey", "o_orderkey", "v", n_buckets=7)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    direct = o.withColumn("ref_rs", F.sum("v").over(w)).withColumnRenamed(
        "v", "ref_v"
    )
    # key-only join + eqNullSafe value compare (joining on all columns
    # coalesces them and can never surface a value mismatch)
    mism = seg.join(direct, ["o_custkey", "o_orderkey"], "full_outer").filter(
        ~F.col("running_sum").eqNullSafe(F.col("ref_rs"))
        | ~F.col("v").eqNullSafe(F.col("ref_v"))
    )
    assert mism.count() == 0
    assert seg.count() == o.count()


def test_segmented_running_sum_spreads_hot_key(spark):
    """One key owning 90% of rows must span several range buckets (the
    whole point: no single task holds the hot key's history)."""
    from bigquery_etl_spark.operators.packing import segmented_running_sum

    rows = [(7 if i % 10 else i, i, 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, o long, v long").repartition(8)
    seg = segmented_running_sum(df, "k", "o", "v", n_buckets=16)
    # correctness on the hot key: its running sums are a permutation of
    # 1..n_hot (v=1, unique order) — any stitch error breaks this
    hot = seg.filter(F.col("k") == 7)
    n_hot = hot.count()
    assert (
        hot.agg(
            F.min("running_sum"), F.max("running_sum"), F.count_distinct("running_sum")
        ).first()
        == (1, n_hot, n_hot)
    )
    # and the hot key's rows really were processed in >1 bucket: rebuild
    # the bucket assignment the operator uses
    bucketed = (
        df.repartitionByRange(16, F.col("k"), F.col("o"))
        .withColumn("b", F.spark_partition_id())
        .filter(F.col("k") == 7)
    )
    assert bucketed.select("b").distinct().count() > 1


def test_sample_diverse_deterministic(spark, sf_dir):
    """Same corpus -> same sampled id set on repeated runs (k-means init
    is lowest-id vectors; ranking is (cluster, vec_id) — no RNG)."""
    from bigquery_etl_spark.operators.similarity import (
        _argmax_centroid,
        _unit,
        train_ivf_centroids,
    )

    e = load(spark, sf_dir, "embeddings")

    def run():
        cents = train_ivf_centroids(e, "embedding", n_centroids=8, n_iters=2)
        assigned = e.select(
            "vec_id",
            _argmax_centroid(
                _unit(F.col("embedding").cast("array<double>")), cents
            ).alias("c"),
        )
        w = Window.partitionBy("c").orderBy("vec_id")
        return {
            r["vec_id"]
            for r in assigned.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20)
            .collect()
        }

    s1, s2 = run(), run()
    assert s1 == s2 and len(s1) > 0


def test_hybrid_vector_leg_routes_by_query_load(spark, sf_dir):
    """r5 (VERDICT r4 item 6), re-pinned r8: the hybrid-search vector
    leg goes through the ``topk`` dispatcher, which now routes EVERY
    exact load to the Arrow-blocked BLAS kernel (the r7 LocalRelation
    fix removed its Python floor and the crossJoin grid measured
    slower even at Q=3 — PERF.md r8). Both the declared Q=3 and the
    batch Q=512 shapes must show MapInPandas and no join-grid node."""
    from bigquery_etl_spark.plans.tierc2 import hybrid_vector_leg
    from bigquery_etl_spark.sources import load
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q3 = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    plan3 = hybrid_vector_leg(emb, q3, n_queries=3)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan3  # BLAS kernel at every exact load (r8)
    assert "BroadcastNestedLoopJoin" not in plan3

    q512 = emb.orderBy("vec_id").limit(512).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    leg512 = hybrid_vector_leg(emb, q512, n_queries=512)
    plan512 = leg512._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan512  # BLAS kernel for batch Q
    # and it actually answers: every query retrieves 20 non-self docs
    counts = leg512.groupBy("qid").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [20]
