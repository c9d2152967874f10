"""Tier C extensions, round 3: training-data pipeline operators beyond
the round-2 surface — unigram-LM perplexity scoring, chunk-level exact
dedup, token-budget sequence packing, and cluster-balanced diversity
sampling. (Charter operators; the reference delegates all analytics to
BigQuery — ref main.py:160-185 — so these have no reference twin.)

All four follow the registry contract: exact DuckDB oracle where the
semantics are SQL-expressible (perplexity, chunk dedup, packing — all
integer/fixed-point arithmetic, so byte-identical across engines), and
a driver-checkable invariant twin where the result depends on
engine-specific float argmax (diversity sampling over k-means
clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.functions.text import ws_tokens
from bigquery_etl_spark.operators.packing import pack_sequences, shard_manifest
from bigquery_etl_spark.registry import query
from bigquery_etl_spark.sources import load

# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring (CCNet-style quality signal, squeezed to
# a unigram model so it is exactly reproducible in SQL: the per-token
# log-prob depends only on the integer pair (count, total)).
#
# 100 TB shape: one explode + token-keyed partial/final agg for the
# vocabulary (heavy hitters absorbed map-side); the corpus-total is a
# 1-row aggregate broadcast into the vocab (constant side); scoring is
# a token-keyed fact-fact join (both sides hash-partitioned on the
# token — one exchange each) followed by the per-doc rollup. No
# driver-side state: the "model" never leaves the cluster.
#
# Determinism: ln() is taken per DISTINCT token of an integer ratio and
# immediately snapped to a 1e-6 grid (ROUND(..*1e6) -> BIGINT), so the
# per-doc sums are exact integer arithmetic in both engines; the final
# avg-NLL is a single division of exact operands, rounded to 4dp.
# ---------------------------------------------------------------------------


@query(
    "q_perplexity",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    vocab AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
    tot AS (SELECT COUNT(*) AS n_total FROM tok),
    lp AS (
        SELECT t,
               CAST(ROUND(LN(CAST(cnt AS DOUBLE) / n_total) * 1000000) AS BIGINT)
                   AS micro_lp
        FROM vocab, tot
    )
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(-CAST(SUM(micro_lp) AS DOUBLE) / 1000000 / COUNT(*), 4) AS avg_nll
    FROM tok JOIN lp ON tok.t = lp.t
    GROUP BY tok.doc_id
    """,
    tags=("tierc", "text", "quality"),
)
def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under a corpus
    unigram LM — the classic 'is this document gibberish relative to
    the corpus' quality score (CCNet does this with a 5-gram KenLM; the
    unigram reduction keeps it exactly SQL-twinnable)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(ws_tokens("text")).alias("t"))
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    # r13 (guide §2.4): n_total = Σ vocab counts — identical to COUNT(*)
    # over the exploded tokens (every token lands in exactly one vocab
    # group), but served from the vocab aggregate instead of a THIRD
    # scan + tokenize pass of the corpus (measured: 3 parquet scans
    # → 2 in the plan, same exchange feeds both consumers).
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "t",
        F.round(F.log(F.col("cnt").cast("double") / F.col("n_total")) * 1_000_000)
        .cast("long")
        .alias("micro_lp"),
    )
    return (
        tok.join(lp, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                -F.sum("micro_lp").cast("double") / 1_000_000 / F.count(F.lit(1)), 4
            ).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# Chunk-level exact dedup: split every document into consecutive 4-token
# chunks and measure, per document, how many of its chunks already occur
# in a lower-id document — the boilerplate/near-template detector that
# complements whole-doc exact dedup (C1) and MinHash (C2): a page that is
# 80% shared boilerplate + 20% fresh text passes both, this catches it.
#
# 100 TB shape: chunks are formed ARRAY-side (one transform per doc, no
# per-token window), then one chunk-keyed shuffle for the min-owner agg
# and one chunk-keyed join back (both sides partitioned on the chunk
# string; partial agg absorbs hot boilerplate chunks), then the per-doc
# rollup. Never pairwise.
# ---------------------------------------------------------------------------


@query(
    "q_dedup_chunks",
    sql="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    chunk AS (
        SELECT doc_id,
               array_to_string(t[i * 4 + 1 : i * 4 + 4], ' ') AS c
        FROM toks, UNNEST(range(0, CAST(CEIL(LEN(t) / 4.0) AS BIGINT))) AS r(i)
    ),
    owner AS (SELECT c, MIN(doc_id) AS own FROM chunk GROUP BY c)
    SELECT chunk.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN own < chunk.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           ROUND(CAST(SUM(CASE WHEN own < chunk.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS dup_ratio
    FROM chunk JOIN owner ON chunk.c = owner.c
    GROUP BY chunk.doc_id
    """,
    tags=("tierc", "dedup", "text"),
)
def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shared-chunk ratio vs lower-id documents (chunk =
    4 consecutive whitespace tokens; last chunk may be shorter)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", ws_tokens("text").alias("t"))
    chunk_arr = F.expr(
        "transform(sequence(0, cast(ceil(size(t) / 4.0) as int) - 1),"
        " i -> array_join(slice(t, i * 4 + 1, 4), ' '))"
    )
    chunk = toks.select("doc_id", F.explode(chunk_arr).alias("c"))
    owner = chunk.groupBy("c").agg(F.min("doc_id").alias("own"))
    dup = F.when(F.col("own") < F.col("doc_id"), 1).otherwise(0)
    return (
        chunk.join(owner, "c")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
            F.round(F.sum(dup).cast("double") / F.count(F.lit(1)), 4).alias(
                "dup_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing (shard manifest). The oracle runs the
# single-global-window formulation; the Spark side runs the distributed
# two-phase prefix sum from operators/packing.py — identical output by
# construction, adjudicating the whole distributed rewrite.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 1000


@query(
    "q_pack_sequences",
    sql=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(LEN(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks,
               SUM(toks) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM t
    )
    SELECT CAST(FLOOR(CAST(cum - toks AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT)
               AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM c
    GROUP BY 1
    """,
    tags=("tierc", "packing"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~1000-token training shards (contiguous
    by doc_id, bounded overflow) and emit the shard manifest."""
    from bigquery_etl_spark.plans._util import cached_id_bounds

    d = load(spark, sf_dir, "documents")
    packed = pack_sequences(
        d, "doc_id", F.size(ws_tokens("text")), budget=_PACK_BUDGET,
        bounds=cached_id_bounds(spark, sf_dir, "documents", "doc_id"),
    )
    m = shard_manifest(packed)
    return m.select(
        "shard_id",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Deterministic content-hash dataset split. Train/val/test membership
# must be a pure function of CONTENT, not of row position or RNG state:
# re-runs, re-partitioning, dedup, and incremental appends then never
# move a document across splits (the leakage class where yesterday's
# val doc lands in today's train shard). md5 is bit-identical across
# engines, so the split — unlike seeded Bernoulli sampling (q_sample,
# invariant twin) — has an EXACT twin. Map-only + tiny agg: scales.
# ---------------------------------------------------------------------------


@query(
    "q_dataset_split",
    sql="""
    WITH b AS (
        SELECT lang,
               CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 AS bucket,
               LEN(string_split_regex(trim(text), '\\s+')) AS toks
        FROM documents
        WHERE text IS NOT NULL
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM b
    GROUP BY 1, 2
    """,
    tags=("tierc", "sampling"),
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 content-hash split with per-(split, lang) doc and token
    accounting — the split-manifest query a training pipeline runs
    before sharding. NULL text excluded explicitly in BOTH engines:
    Spark's legacy size(split(NULL)) = -1 vs DuckDB's NULL-skipping SUM
    would silently diverge otherwise."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("int") % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", F.size(ws_tokens("text")).alias("toks"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-parallel per-key running sum. Spark executes each window
# partition as ONE task and AQE's skew handling splits only joins, so a
# zipf-hot key serializes its whole history through a single reducer.
# operators/packing.segmented_running_sum spreads one key's rows over
# consecutive range buckets and stitches the prefix back with a
# per-(key,bucket) offset table (<= n_buckets rows per key). Oracle =
# the direct window SQL, adjudicating the rewrite end to end.
# ---------------------------------------------------------------------------


@query(
    "q_win_running_seg",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS running_sum
    FROM orders
    """,
    tags=("window", "skew"),
)
def q_win_running_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total (exact integer cents), computed
    with the skew-parallel segmented prefix sum instead of a direct
    per-key window."""
    from bigquery_etl_spark.operators.packing import segmented_running_sum
    from bigquery_etl_spark.plans._util import cents

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", cents("o_totalprice").alias("v")
    )
    out = segmented_running_sum(o, "o_custkey", "o_orderkey", "v")
    return out.select(
        "o_custkey",
        "o_orderkey",
        "v",
        F.col("running_sum").cast("bigint").alias("running_sum"),
    )


# ---------------------------------------------------------------------------
# Cluster-balanced diversity sampling: k-means the embedding corpus
# (similarity.py's DataFrame-native spherical Lloyd's — deterministic
# lowest-id init, only kxdim floats reach the driver), then keep at most
# m rows per cluster, lowest vec_id first. The workhorse for "sample a
# diverse eval slice" / "cap over-represented modes before training".
#
# The cluster assignment hinges on float argmax, so the row set has no
# cross-engine SQL twin; the twin is the invariant set: the per-cluster
# cap holds, every sampled id exists in the corpus exactly once, and the
# sample is non-empty. (Row-level determinism within Spark is covered by
# tests/test_tierc2.py.)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# End-to-end pre-training corpus build: the flagship composite that
# chains the charter operators the way a real data pipeline does —
#
#   quality filter -> exact dedup -> benchmark decontamination ->
#   token-budget shard packing -> manifest
#
# Every stage is deterministic integer arithmetic, so the WHOLE pipeline
# has an exact DuckDB twin: one hash mismatch anywhere in the chain
# fails the round. 100 TB shape: quality is map-only; dedup is one
# content-keyed shuffle (min-id survivor below partial agg); the eval
# 5-gram set is tiny by definition and broadcast; packing is the
# two-phase prefix sum (operators/packing.py). Four keyed shuffles, no
# pairwise stage, driver never sees a row.
# ---------------------------------------------------------------------------


@query(
    "q_pretrain_corpus",
    sql="""
    WITH base AS (
        SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ),
    quality AS (
        SELECT doc_id, text, t, CAST(LEN(t) AS BIGINT) AS n
        FROM base
        WHERE doc_id % 50 <> 0
          AND LEN(t) BETWEEN 10 AND 1000
          AND LEN(list_distinct(t)) * 5 >= LEN(t)
    ),
    dedup AS (
        SELECT doc_id, t, n FROM quality
        QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)
    ),
    eval_grams AS (
        SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS g
        FROM base, UNNEST(range(1, len(t) - 3)) AS r(i)
        WHERE doc_id % 50 = 0
    ),
    contaminated AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
              FROM dedup, UNNEST(range(1, len(t) - 3)) AS r(i)) s
        JOIN eval_grams USING (g)
    ),
    clean AS (
        SELECT doc_id, n FROM dedup
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    cum AS (
        SELECT doc_id, n,
               SUM(n) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c
        FROM clean
    )
    SELECT CAST(FLOOR(CAST(c - n AS DOUBLE) / 1000) AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM cum
    GROUP BY 1
    """,
    tags=("tierc", "pipeline", "packing"),
)
def q_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter, dedup, decontaminate, and shard-pack the corpus;
    emit the training-shard manifest (eval slice = doc_id % 50 == 0)."""
    from bigquery_etl_spark.operators.dedup import exact_dedup

    from bigquery_etl_spark.functions.text import quality_gate

    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", ws_tokens("text").alias("t"))

    quality = (
        base.filter(F.col("doc_id") % 50 != 0)
        .filter(quality_gate("text", 10, 1000))
        .withColumn("n", F.size("t").cast("long"))
    )
    # winners route (r5): the window route shuffled every surviving
    # row's text + token array on the content hash; min-id-per-hash +
    # broadcast semi-join moves only (hash, id) pairs and leaves the
    # data on its scan partitioning for the gram explode below.
    # (r14 MEASURED NEGATIVE, VERDICT r13 item 2: computing the winner
    # aggregate over the PRE-GATE pool — exact_dedup(winner_pool=...),
    # sound because the gate is a pure function of text — removed the
    # winner scan's tokenize+gate but measured FLAT interleaved at
    # sf0.1 (A: 0.900/0.967/0.846 s vs B: 0.921/0.917/0.990 s), and at
    # scale it GROWS the winner broadcast by every gated-out distinct
    # text — the broadcast bound is this route's binding constraint, so
    # the trade was reverted. The exact_dedup winner_pool mechanism and
    # its commuting-filter proof stay available + tested.)
    dedup = exact_dedup(quality, ["text"], "doc_id", strategy="winners")

    gram_arr = F.when(
        F.size("t") >= 5,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 5),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, 5)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    eval_grams = (
        base.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(gram_arr).alias("g"))
        .distinct()
    )
    # decontamination FUSED into the main pass (r8, VERDICT r7 item 10:
    # the old shape built a `contaminated` broadcast from a SECOND full
    # quality→dedup→tokenize pass, then anti-joined a THIRD one).
    # Explode the surviving docs' grams once, left-join the broadcast
    # eval set, and reduce to one flag per doc — the groupBy(doc_id)
    # partial-aggregates map-side, so the shuffle carries one tiny
    # (doc_id, n, flag) row per doc, never the gram fan-out. Gramless
    # docs survive via explode_outer (null gram → no hit → kept).
    clean = (
        dedup.select("doc_id", "n", F.explode_outer(gram_arr).alias("g"))
        .join(
            F.broadcast(eval_grams.withColumn("__hit", F.lit(1))),
            "g",
            "left",
        )
        .groupBy("doc_id")
        .agg(F.first("n").alias("n"), F.max("__hit").alias("__c"))
        .filter(F.col("__c").isNull())
        .select("doc_id", "n")
    )

    from bigquery_etl_spark.plans._util import cached_id_bounds

    # bounds from the RAW id column (cached per process) — the default
    # probe would execute the quality->dedup->decontaminate pipeline
    # twice (r4 bench regression: 0.69s -> 1.7s)
    packed = pack_sequences(
        clean, "doc_id", "n", budget=1000,
        bounds=cached_id_bounds(spark, sf_dir, "documents", "doc_id"),
    )
    return shard_manifest(packed).select(
        "shard_id",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
    )


@query(
    "q_sample_diverse",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus,
           TRUE AS cap_holds,
           TRUE AS ids_valid,
           TRUE AS non_empty
    FROM embeddings
    """,
    tags=("tierc", "similarity", "sampling"),
    twin="invariant",
)
def q_sample_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant reduction of cluster-balanced sampling (k=8, cap=20)."""
    from pyspark.sql import Window

    from bigquery_etl_spark.operators.similarity import (
        _argmax_centroid,
        _unit,
        train_ivf_centroids,
    )

    e = load(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(e, "embedding", n_centroids=8, n_iters=2)
    assigned = e.select(
        "vec_id",
        _argmax_centroid(_unit(F.col("embedding").cast("array<double>")), cents).alias(
            "__c"
        ),
    )
    cap = 20
    w = Window.partitionBy("__c").orderBy("vec_id")
    sample = assigned.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= cap
    )
    per_cluster = sample.groupBy("__c").agg(F.count(F.lit(1)).alias("n"))
    cap_ok = per_cluster.agg(
        F.coalesce(F.max("n") <= cap, F.lit(True)).alias("cap_holds")
    )
    # every sampled id joins back to exactly one corpus row
    joined = sample.join(e.select("vec_id"), "vec_id", "inner")
    valid = sample.agg(F.count(F.lit(1)).alias("n_s")).crossJoin(
        joined.agg(F.count(F.lit(1)).alias("n_j"))
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_corpus"))
        .crossJoin(cap_ok)
        .crossJoin(valid)
        .select(
            "n_corpus",
            "cap_holds",
            (F.col("n_s") == F.col("n_j")).alias("ids_valid"),
            (F.col("n_s") > 0).alias("non_empty"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental fuzzy dedup: a new batch probed against a PERSISTED-shape
# LSH index of the existing corpus (operators/dedup.py
# minhash_dedup_incremental). The 100 TB pattern: daily ingestion
# shingles only the batch; the corpus index (docs x bands rows of three
# 8-byte cols, ~1000x smaller than its text) is probed, never rebuilt.
# ---------------------------------------------------------------------------


@query(
    "q_dedup_incremental",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
           TRUE AS no_copy_survives,
           TRUE AS index_closed,
           TRUE AS reingest_noop
    FROM documents
    """,
    tags=("tierc", "dedup", "lsh", "incremental"),
    twin="invariant",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tick incremental dedup reduced to driver-adjudicable
    invariants (the survivor row set is engine-hash-specific; exact
    semantics live in tests/test_dedup.py):

    corpus = even doc_ids (indexed via ``minhash_index``); batch = odd
    doc_ids plus one verbatim copy of every corpus doc at id+1M.

    - ``n_batch``: odd + planted = COUNT(*) of documents (closed form);
    - ``no_copy_survives``: a verbatim copy has the corpus doc's exact
      signature, so every band bucket hits the index — guaranteed drop;
    - ``index_closed``: the returned index rows are exactly the
      survivors' rows (set equality on ids);
    - ``reingest_noop``: re-probing the surviving batch against the
      UPDATED index (old ∪ new rows) yields zero survivors — verbatim
      re-ingestion is idempotent.

    The invariants are evaluated EAGERLY (four scalar aggregates
    collected inside the function, returned as a 1-row local relation):
    the shared signature frames feed five consumers, so they must be
    persisted — and a lazily-returned plan over persisted frames could
    never unpersist them (the cache would leak across every bench/
    parity sweep in a long-lived session). Eager + try/finally keeps
    the cache lifetime tick-shaped, like CorpusBuilder.ingest."""
    from bigquery_etl_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_index,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1).unionByName(
        corpus.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    ).persist()
    index = minhash_index(corpus, "doc_id", "text").persist()
    banded = minhash_index(batch, "doc_id", "text").persist()
    surv, new_rows = minhash_dedup_incremental(batch, banded, index, "doc_id")
    surv_ids = surv.select("doc_id").persist()
    new_rows = new_rows.persist()
    try:
        n_batch = batch.count()
        no_copy = (
            surv_ids.agg(
                F.coalesce(~F.max(F.col("doc_id") >= 1_000_000), F.lit(True))
            ).collect()[0][0]
        )
        # set equality survivors == index-row ids, via two anti-joins
        rows_ids = new_rows.select("doc_id").distinct()
        a = surv_ids.join(rows_ids, "doc_id", "left_anti").count()
        b = rows_ids.join(surv_ids, "doc_id", "left_anti").count()
        # idempotence: survivors re-probed against index ∪ their rows
        surv2, _ = minhash_dedup_incremental(
            surv,
            banded.join(surv_ids, "doc_id", "left_semi"),
            index.unionByName(new_rows),
            "doc_id",
        )
        noop = surv2.count() == 0
    finally:
        for f in (batch, index, banded, surv_ids, new_rows):
            f.unpersist()
    return spark.createDataFrame(
        [(n_batch, bool(no_copy), a == 0 and b == 0, noop)],
        "n_batch long, no_copy_survives boolean, index_closed boolean, "
        "reingest_noop boolean",
    )


@query(
    "q_chunk_docs",
    sql="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ), e AS (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                   CAST(GREATEST(CEIL((LEN(toks)-8)/24.0), 1) AS BIGINT) - 1)) AS i
        FROM t
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text,
           CAST(LEAST(32, LEN(toks) - i*24) AS INT) AS n_tokens
    FROM e
    """,
    tags=("tierc", "rag", "chunking"),
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token chunking (RAG / context-window prep):
    32-token chunks, 8-token overlap, every doc yields >= 1 chunk.
    Pure codegen fan-out (operators/packing.py chunk_documents) — the
    oracle reproduces the closed-form chunk grid with DuckDB list
    slicing, so the full (doc, chunk, text) row set is value-checked,
    not just counted."""
    from bigquery_etl_spark.operators.packing import chunk_documents

    d = load(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_tokens=32, overlap=8)


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical (distinct-token overlap) + vector (cosine)
# legs fused with Reciprocal Rank Fusion — the standard RAG retrieval
# stack (BM25+ANN -> RRF), relationally. Per-leg top-K BEFORE fusion
# keeps the fused set K-bounded per query: the dense (queries x corpus)
# grid never materializes, which is the whole scale story — at 100 TB
# each leg is its own pruned retrieval (inverted-index join / ANN), and
# fusion touches only 2K rows per query.
# ---------------------------------------------------------------------------


def hybrid_vector_leg(
    emb: DataFrame, q: DataFrame, n_queries: int, k: int = 20
) -> DataFrame:
    """The vector leg of hybrid retrieval, routed through the ``topk``
    dispatcher (r5; VERDICT r4 item 6: the inlined Q×N codegen
    crossJoin was fine at the declared Q=3 but a scale-killer if the
    leg ever carried a real query load — routing inherits the measured
    Q-crossover: codegen grid for tiny Q, Arrow-blocked BLAS kernel for
    batch Q). Returns (qid, doc_id, r) with rank over the 6dp-ROUNDED
    score (ties by doc_id) so float last-bit drift can never flip a
    rank cross-engine. Self-matches are excluded after retrieval, and
    the dispatcher over-fetches k+8 so the top-k-by-rounded-score set
    is stable through the re-rank (a flip would need >8 docs inside one
    1e-6 rounding bucket at the boundary)."""
    from pyspark.sql.window import Window as W

    from bigquery_etl_spark.operators.similarity import topk

    scored = topk(
        emb,
        q.select(F.col("qid").alias("query_id"), F.col("qv").alias("query_vec")),
        id_col="vec_id",
        vec_col="embedding",
        k=k + 8,  # headroom: self-match + rounded-tie boundary
        dim=64,
        n_queries=n_queries,
    )
    wl = W.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.filter(F.col("vec_id") != F.col("query_id"))
        .select(
            F.col("query_id").alias("qid"),
            F.col("vec_id").alias("doc_id"),
            F.round("cos_sim", 6).alias("score"),
        )
        .withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= k)
    )


@query(
    "q_hybrid_search",
    sql="""
    WITH q AS (
        SELECT d.doc_id AS qid, d.text AS qtext, e.embedding AS qv
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        ORDER BY d.doc_id LIMIT 3
    ), qt AS (
        SELECT qid,
               unnest(list_distinct(string_split_regex(trim(qtext), '\\s+'))) AS tok
        FROM q
    ), dt AS (
        SELECT doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
        FROM documents
    ), lex AS (
        SELECT qt.qid, dt.doc_id, CAST(COUNT(*) AS BIGINT) AS score
        FROM qt JOIN dt USING (tok)
        WHERE dt.doc_id <> qt.qid
        GROUP BY 1, 2
    ), lexr AS (
        SELECT qid, doc_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score DESC, doc_id) AS r
        FROM lex QUALIFY r <= 20
    ), vec AS (
        SELECT q.qid, e.vec_id AS doc_id,
               ROUND(list_cosine_similarity(q.qv, e.embedding), 6) AS score
        FROM q, embeddings e WHERE e.vec_id <> q.qid
    ), vecr AS (
        SELECT qid, doc_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score DESC, doc_id) AS r
        FROM vec QUALIFY r <= 20
    ), fused AS (
        SELECT COALESCE(l.qid, v.qid) AS qid,
               COALESCE(l.doc_id, v.doc_id) AS doc_id,
               ROUND(COALESCE(1.0/(60 + l.r), 0)
                     + COALESCE(1.0/(60 + v.r), 0), 9) AS rrf
        FROM lexr l FULL OUTER JOIN vecr v
          ON l.qid = v.qid AND l.doc_id = v.doc_id
    )
    SELECT qid, doc_id, rrf
    FROM fused
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) <= 5
    """,
    tags=("tierc", "rag", "hybrid", "similarity"),
)
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with RRF fusion: 3 query docs, lexical leg =
    distinct-token overlap (inverted-index join shape), vector leg =
    ``hybrid_vector_leg`` (topk-routed; rounded to 6dp BEFORE ranking
    so float last-bit drift can never flip a rank cross-engine), top-20
    per leg, fused by 1/(60+rank) summed over the legs that retrieved
    the doc, top-5 per query. Exact twin: the oracle runs the identical
    retrieval relationally in DuckDB."""
    from pyspark.sql.window import Window as W

    # (r4 note: spread() before the token explode was tried and REVERTED
    # — shuffling the full text payload costs more than the extra scan
    # parallelism buys at this corpus size; the cross-round bench delta
    # on this query is environmental, not plan regression)
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # (r5 A/B note: localizing `q` via collect+LocalRelation was
    # measured and REVERTED — the extra synchronous driver job cost
    # more than the duplicated in-plan TakeOrdered subtree it saved,
    # 1.13 s → 1.58 s on this query. r13 RE-MEASURED after the r8
    # "BLAS at every Q" routing — topk now collects the query batch
    # anyway, so the hypothesis was that localizing had become free —
    # interleaved A/B, 6 reps: in-plan min 1.14/median 1.56 vs
    # localized min 1.69/median 2.05. Still worse; kept in-plan.)
    q = (
        d.join(emb, d.doc_id == emb.vec_id)
        .orderBy("doc_id")
        .limit(3)
        .select(
            F.col("doc_id").alias("qid"),
            F.col("text").alias("qtext"),
            F.col("embedding").alias("qv"),
        )
    )
    toks = lambda c: F.array_distinct(F.split(F.trim(F.col(c)), r"\s+"))  # noqa: E731
    # r14 opt (guide §2.3/§2.4, VERDICT r13 item 4): the lexical leg
    # used to EXPLODE every corpus token (one row per (doc, token)),
    # probe the broadcast 3-query token set, then pay a hash-aggregate
    # + exchange to re-collapse matches to (qid, doc_id, count). The
    # overlap count is just |dtoks ∩ qtoks| over the DISTINCT token
    # lists, so compute it array-side: one SIZE(ARRAY_INTERSECT()) per
    # (doc, query) pair against the broadcast ≤3-row query relation —
    # no token fan-out, no aggregation exchange; docs sharing no token
    # drop via score >= 1 exactly as the old inner join dropped them.
    # Scale shape: corpus rows stay on their scan partitioning and are
    # touched once per query in the batch; the per-row work is the
    # same O(|dtoks| + |qtoks|) hash-probe the exploded join paid,
    # without materializing token rows.
    qarr = q.select("qid", toks("qtext").alias("qtoks"))
    lex = (
        d.select("doc_id", toks("text").alias("dtoks"))
        .join(F.broadcast(qarr), F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            "doc_id",
            F.size(F.array_intersect("dtoks", "qtoks")).alias("score"),
        )
        .filter(F.col("score") >= 1)
    )
    wl = W.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    lexr = (
        lex.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= 20)
        .select("qid", "doc_id", F.col("r").alias("r_lex"))
    )
    vecr = hybrid_vector_leg(emb, q, n_queries=3, k=20).select(
        "qid", "doc_id", F.col("r").alias("r_vec")
    )
    # r13 opt (guide §2.4): RRF fusion as union + sum instead of a
    # full-outer join. The join form paid TWO ENSURE_REQUIREMENTS
    # exchanges on hash(qid, doc_id) (requireAllClusterKeysForCo
    # Partition rejects the legs' existing hash(qid) partitioning) plus
    # a third for the final window; the union form needs ONE
    # hash(qid) repartition that the (qid, doc_id) aggregate AND the
    # top-5 window both ride (subset clustering). Identical values:
    # coalesce(a,0)+coalesce(b,0) over the outer join ≡ SUM of the
    # per-leg contributions (two-term IEEE addition is commutative, so
    # shuffle arrival order cannot move a bit), and the fused row set
    # is the union of the legs' keys either way. Scale shape: the
    # fusion input is ≤ 2×k rows per query by construction (top-k per
    # leg), so hash(qid) carries per-query top-k lists, never corpus
    # rows.
    contrib = lambda r: (1.0 / (60 + F.col(r))).alias("c")  # noqa: E731
    fused = (
        lexr.select("qid", "doc_id", contrib("r_lex"))
        .unionAll(vecr.select("qid", "doc_id", contrib("r_vec")))
        .repartition("qid")
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum("c"), 9).alias("rrf"))
    )
    wf = W.partitionBy("qid").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 5)
        .select("qid", "doc_id", "rrf")
    )
