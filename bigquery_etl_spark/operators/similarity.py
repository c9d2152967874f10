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


# -- fixed-width (known-dim) variants ---------------------------------------
# Spark evaluates higher-order-function lambdas (aggregate/zip_with)
# INTERPRETED, per element — measured ~8x slower than codegen at dim=64
# (same finding as the minhash aggregate, PERF.md item 1). When the
# embedding dimension is known, an explicit dim-term expression stays
# inside whole-stage codegen. Built as ONE F.expr string (single JVM
# parse) — 128 separately-constructed Columns would cost >100ms of
# Py4J plan-build time per query (PERF.md item 2). Args are column
# NAMES (resolvable in SQL text), not Column objects.


def dot_fixed(a: str, b: str, dim: int) -> Column:
    return F.expr(" + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim)))


def norm_fixed(a: str, dim: int) -> Column:
    return F.expr(
        "sqrt(" + " + ".join(f"{a}[{i}] * {a}[{i}]" for i in range(dim)) + ")"
    )


def cosine_fixed(a: str, b: str, dim: int) -> Column:
    return dot_fixed(a, b, dim) / (norm_fixed(a, dim) * norm_fixed(b, dim))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Plan: broadcast(queries) × corpus → cosine → per-query top-k.
    Scales in corpus size (one scan, no corpus shuffle beyond the
    window's partition-by-query exchange, which carries only scored
    rows; with WindowGroupLimit Spark keeps k rows per query per task).

    Pass ``dim`` when the embedding width is known: the dot/norm run as
    codegen'd fixed-width expressions (~8x over the interpreted HOF
    path at dim=64), and each side's norm is computed once per ROW
    instead of once per pair."""
    if dim is None:
        q = F.broadcast(queries.select(query_id_col, query_vec_col))
        scored = corpus.select(id_col, vec_col).crossJoin(q).select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim"),
        )
    else:
        c = corpus.select(id_col, vec_col, norm_fixed(vec_col, dim).alias("__cn"))
        q = F.broadcast(
            queries.select(
                query_id_col, query_vec_col, norm_fixed(query_vec_col, dim).alias("__qn")
            )
        )
        scored = c.crossJoin(q).select(
            query_id_col,
            id_col,
            (
                dot_fixed(vec_col, query_vec_col, dim)
                / (F.col("__cn") * F.col("__qn"))
            ).alias("cos_sim"),
        )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine via an Arrow-blocked BLAS kernel (VERDICT r3:
    the crossJoin brute force evaluates Q×N scalar expression trees —
    fine for tiny Q, the scale-killer at a real query load).

    Plan shape:
      1. The query set is collected to the driver ONCE (Q×dim floats —
         the query side is small by contract; route large Q through
         ``ivf_topk``/``lsh_topk`` or the ``topk`` dispatcher) and
         ships to executors pre-normalized inside the kernel closure.
      2. The corpus streams through ``mapInPandas``: each Arrow batch
         forms a B×dim matrix and ONE numpy matmul (B×dim @ dim×Q)
         scores the whole batch against every query — BLAS, not per-row
         expression evaluation.
      3. Only the batch-local top-k per query survives (ties broken by
         id ascending, identical to the final ordering, and boundary
         ties are kept so cross-batch tie-breaks stay exact), so the
         final per-query window sees ≤ n_batches × Q × k rows — a
         corpus-size-independent residue.
    One corpus scan, zero corpus shuffle, one exchange over the tiny
    residue: this is the exact path that survives 100 TB. Scores are
    float64; cross-engine comparisons should round (fold order differs
    from a scalar dot)."""
    import pandas as pd

    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = [r[0] for r in qrows]
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    qt = (qmat / qn[:, None]).T  # dim × Q, pre-normalized

    qid_t = queries.schema[query_id_col].dataType.simpleString()
    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id_col} {qid_t}, {id_col} {id_t}, cos_sim double"

    n_q = len(qids)

    def score(batches):
        for pdf in batches:
            b = len(pdf)
            if b == 0:
                continue
            # fixed-width lists: one C-level concat + reshape, no
            # per-row Python
            vecs = pdf[vec_col].to_numpy()
            m = np.concatenate(vecs).astype(np.float64, copy=False).reshape(b, -1)
            cn = np.linalg.norm(m, axis=1)
            cn[cn == 0] = 1.0
            # normalize AFTER the matmul: divide the B×Q result, not the
            # B×dim operand
            sims = (m @ qt) / cn[:, None]
            ids = pdf[id_col].to_numpy()
            kk = min(k, b)
            take_rows, take_qs = [], []
            for j in range(n_q):
                s = sims[:, j]
                # kth-largest boundary; keep ALL rows at or above it so a
                # boundary tie can still win the global id-asc tie-break
                kth = np.partition(s, b - kk)[b - kk]
                pool = np.flatnonzero(s >= kth)
                try:
                    order = np.lexsort((ids[pool], -s[pool]))[:kk]
                except TypeError:  # non-numeric ids: tiny pool, sort in Python
                    order = np.array(
                        sorted(range(len(pool)), key=lambda i: (-s[pool[i]], ids[pool[i]]))[:kk]
                    )
                take_rows.append(pool[order])
                take_qs.append(np.full(len(order), j))
            rows = np.concatenate(take_rows)
            qs = np.concatenate(take_qs)
            yield pd.DataFrame(
                {
                    query_id_col: np.array(qids, dtype=object)[qs],
                    id_col: ids[rows],
                    "cos_sim": sims[rows, qs],
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    exact: bool = True,
    dim: int | None = None,
    codegen_max_queries: int = 0,
    max_exact_queries: int = 4096,
    n_queries: int | None = None,
    **ann_kwargs,
) -> DataFrame:
    """Default similarity-search entry point (VERDICT r3: route by
    workload, don't make callers pick a kernel). r8 re-measurement
    (PERF.md): the r7 LocalRelation fix removed the blocked kernel's
    Python floor, so at sf0.1/dim64 it now wins at EVERY Q — 0.42 s at
    Q=5 (the codegen crossJoin takes 1.0 s there: the 64-term dot
    expression chains exceed codegen method limits and the
    float→double array cast doubles the scan) and stays flat to
    Q=512. ``codegen_max_queries`` therefore defaults to 0 (BLAS for
    all exact loads); pass it explicitly to re-enable the crossJoin
    route for microscopic corpora where a Python worker round-trip
    dominates everything.

    - ``exact=True``, tiny query set (≤ ``codegen_max_queries``) with
      ``dim`` known: the fixed-width codegen crossJoin
      (``cosine_topk_bruteforce``) — whole-stage-codegen JVM, zero
      Python, optimal when the Q×N grid is nearly free.
    - ``exact=True``, batch query load: the Arrow-blocked BLAS kernel
      (``cosine_topk_blocked``) — one matmul per corpus batch; the
      exact shape that survives a real query load. Query sets past
      ``max_exact_queries`` are refused (they would sit in driver
      memory and in every executor's closure) — raise the cap
      deliberately or go approximate.
    - ``exact=False``: IVF inverted-list search (``ivf_topk``) —
      per-query cost is nprobe/n_centroids of the corpus, the only
      shape that survives a large query load on a large corpus. Pass
      ``n_centroids``/``nprobe``/``centroids`` through ``ann_kwargs``.
    """
    if exact:
        # size the query side: callers that know Q pass ``n_queries``
        # (saves a probe JOB per call — measured 0.4 s of pure overhead
        # on a 0.04 s query); otherwise a limit probe, never a full count
        n_q = (
            n_queries
            if n_queries is not None
            else len(
                queries.select(query_id_col).limit(max_exact_queries + 1).collect()
            )
        )
        if n_q > max_exact_queries:
            raise ValueError(
                f"topk(exact=True) with >{max_exact_queries} query vectors: "
                "the query matrix must broadcast to every executor — use "
                "exact=False (IVF) or raise max_exact_queries deliberately"
            )
        if n_q <= codegen_max_queries and dim is not None:
            return cosine_topk_bruteforce(
                corpus, queries, id_col, vec_col, query_id_col,
                query_vec_col, k, dim,
            )
        return cosine_topk_blocked(
            corpus, queries, id_col, vec_col, query_id_col, query_vec_col, k
        )
    return ivf_topk(
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        k=k,
        dim=dim,
        **ann_kwargs,
    )


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


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer for IVF (Lloyd's iterations as
    DataFrame aggregations).

    Each iteration: assign every vector to its max-dot centroid (JVM-side
    argmax over broadcast centroid literals), then recompute centroids as
    per-(cluster, dim) means via posexplode + groupBy. Only k×dim floats
    ever reach the driver per iteration — the training data never does,
    so this trains on a 100 TB corpus as a handful of scans. Init is the
    k lowest-id vectors (deterministic, no RNG)."""
    k = n_centroids
    # Persist the normalized corpus: each Lloyd iteration (and the init
    # collect) otherwise re-reads and re-normalizes the full corpus —
    # n_iters+1 scans where one suffices. At 100 TB that is the
    # difference between 1 read + cached iterations and 5 full reads.
    normed = corpus.select(
        id_col, _unit(F.col(vec_col).cast("array<double>")).alias("__v")
    ).persist()
    try:
        cents = [
            r["__v"]
            for r in normed.orderBy(id_col).limit(k).collect()
        ]
        for _ in range(n_iters):
            assigned = normed.select(
                "__v", _argmax_centroid(F.col("__v"), cents).alias("__c")
            )
            stats = (
                assigned.select("__c", F.posexplode("__v").alias("__d", "__x"))
                .groupBy("__c", "__d")
                .agg(F.sum("__x").alias("__s"), F.count("__x").alias("__n"))
                .collect()
            )
            by_c: dict[int, dict[int, float]] = {}
            for r in stats:
                by_c.setdefault(r["__c"], {})[r["__d"]] = r["__s"] / r["__n"]
            new = []
            for c in range(k):
                if c in by_c:
                    mean = [by_c[c][d] for d in range(len(cents[0]))]
                    nrm = sum(x * x for x in mean) ** 0.5 or 1.0
                    new.append([x / nrm for x in mean])
                else:  # empty cluster: keep the old centroid
                    new.append(cents[c])
            cents = new
    finally:
        normed.unpersist()
    return cents


def _unit(vec: Column) -> Column:
    """L2-normalize (spherical k-means works on the unit sphere, where
    max dot == max cosine)."""
    n = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.transform(vec, lambda x: x / n)


def _argmax_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the centroid with the largest dot product (int).

    Built as array ops (dots → zip with index → array_min on
    struct(-dot, idx)) so the expression tree is LINEAR in k. A
    chained when(best_d < d) formulation embeds the previous best into
    both branches — 2^k nodes; at k=16 the plan alone OOMed the JVM."""
    cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    dots = F.transform(cent_arr, lambda c: dot(vec, c))
    pairs = F.zip_with(
        dots,
        F.expr(f"sequence(0, {len(centroids) - 1})"),
        lambda d, i: F.struct((-d).alias("negd"), i.alias("idx")),
    )
    return F.array_min(pairs)["idx"].cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    dim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into inverted
    lists, search only the nprobe closest lists per query, exact-rerank
    inside them.

    The scale path next to lsh_topk: corpus cost is ONE assignment scan
    (+ the equi-join on cluster id); per-query cost is nprobe/n_centroids
    of the corpus instead of all of it. recall@k is tunable via nprobe
    (nprobe == n_centroids degenerates to exact brute force). At
    warehouse scale, persist the assigned corpus partitioned by __c so
    repeated query batches prune inverted lists at the file level."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col=vec_col, n_centroids=n_centroids, id_col=id_col
        )
    assigned = corpus.select(
        id_col, vec_col, _argmax_centroid(_unit(F.col(vec_col).cast("array<double>")), centroids).alias("__c")
    )
    # nprobe cluster ids per query: rank all centroid dots, keep the top n.
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    qprobe = (
        queries.select(query_id_col, query_vec_col)
        .withColumn(
            "__dots",
            F.transform(
                cent_arr, lambda c: dot(_unit(F.col(query_vec_col).cast("array<double>")), c)
            ),
        )
        .withColumn(
            "__probe",
            F.slice(
                F.expr(
                    "array_sort(zip_with(__dots, sequence(0, size(__dots)-1),"
                    " (d, i) -> struct(-d as negd, i as idx)))"
                ),
                1,
                nprobe,
            ),
        )
        .select(query_id_col, query_vec_col, F.explode(F.col("__probe.idx")).alias("__c"))
    )
    cands = assigned.join(F.broadcast(qprobe), "__c").select(
        query_id_col, id_col, vec_col, query_vec_col
    )
    rerank = (
        cosine_fixed(vec_col, query_vec_col, dim)
        if dim is not None
        else cosine(F.col(vec_col), F.col(query_vec_col))
    )
    scored = cands.select(query_id_col, id_col, rerank.alias("cos_sim"))
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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
        query_id_col, id_col,
        cosine_fixed(vec_col, query_vec_col, dim).alias("cos_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 8,
    n_planes: int = 12,
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal: drop every vector whose
    cosine to some LOWER-id vector is ≥ threshold (SURVEY.md Tier C —
    the embedding analogue of minhash_dedup).

    Semantics are pairwise and non-transitive (chains A~B~C keep only
    A, matching minhash_dedup), and precision is 1 by construction:
    an LSH collision alone never drops a vector — every surviving
    candidate is re-scored with the EXACT cosine. Only recall depends
    on the LSH parameters (miss probability per true pair =
    (1 - (1 - θ/π)^n_planes)^n_tables, negligible for the
    near-identical vectors dedup targets).

    r4 scale shape (same finding as simhash_candidates — the sf1 soak's
    duplicate-heavy corpus made the id-level bucket self-join square
    the copy multiplicity):

    - EXACT-duplicate vectors group first (groupBy on the raw array —
      one exchange). A group's non-minimum ids lose outright (cosine
      1 ≥ any threshold against the group min). This is exact, not
      approximate: identical vectors collide in every table anyway.
    - The LSH bucket self-join runs over group REPRESENTATIVES (one
      min-id row per distinct vector). A rep loses iff some close
      group has a smaller rep — together with the within-group rule
      this reproduces the pairwise semantics exactly: any non-min id
      already loses to its own group, and a group min's smallest
      possible external killer is the other group's min.
    - Buckets holding more than ``max_bucket`` distinct vectors are
      dropped as non-discriminative (hot-bucket practice; a 12-bit
      sign pattern shared by 10k+ distinct vectors pairs near-random
      ones and only inflates the rerank).

    Measured at ~sf1 (600k vectors, 10 verbatim copies each): 58-95 s
    → see SCALE.md; candidate volume drops ~100× (60k distinct vs
    600k total through the quadratic join)."""
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    vecs = corpus.select(id_col, vec_col)
    groups = vecs.groupBy(vec_col).agg(F.min(id_col).alias("__rep"))
    within_losers = (
        vecs.join(groups, vec_col)
        .filter(F.col(id_col) != F.col("__rep"))
        .select(F.col(id_col))
    )

    banded = groups.select(
        F.col("__rep"),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(F.col(vec_col), tables[t]).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("__rep", vec_col, "tb.table", "tb.bucket")
    w = W.partitionBy("table", "bucket")
    banded = banded.withColumn("__bsz", F.count(F.lit(1)).over(w)).filter(
        F.col("__bsz") <= max_bucket
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__rep") < F.col("b.__rep")),
        )
        .select(
            F.col("a.__rep").alias("id_a"),
            F.col(f"a.{vec_col}").alias("vec_a"),
            F.col("b.__rep").alias("id_b"),
            F.col(f"b.{vec_col}").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    rep_losers = (
        cand.filter(cosine_fixed("vec_a", "vec_b", dim) >= threshold)
        .select(F.col("id_b").alias(id_col))
    )
    losers = within_losers.unionByName(rep_losers).distinct()
    return corpus.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Persisted IVF index (r5). ivf_topk() trains + assigns per call — right
# for one-shot batches, wasteful for a standing corpus. This pair is the
# warehouse form the ivf_topk docstring promises: assignment written
# ONCE, partitioned by inverted list, so every later query batch prunes
# non-probed lists at the FILE level (PartitionFilters on __c — zero I/O
# for unprobed clusters), the same build-once/prune-at-read design as
# the text index (operators/text_index.py).
# ---------------------------------------------------------------------------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Train centroids (DataFrame-side Lloyd, only k*dim floats reach
    the driver per iteration) and persist the assigned corpus
    partitioned by inverted list, centroids beside it (underscore
    prefix keeps the JSON invisible to the parquet reader).

    Pass ``centroids`` to reuse an existing map instead of retraining —
    the refresh-equivalence contract (refreshed index ≡ rebuild) only
    holds under the SAME centroid map, since assignment decides list
    membership.

    A full build IS the compaction: tombstones and the generation
    counter from any previous incarnation at this path reset with it
    (same rule as build_text_index)."""
    import json
    import os
    import shutil

    shutil.rmtree(_ivf_tomb_path(path), ignore_errors=True)
    try:
        os.remove(path + "_gen")
    except FileNotFoundError:
        pass
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col=vec_col, n_centroids=n_centroids, id_col=id_col
        )
    assigned = corpus.select(
        id_col,
        vec_col,
        F.lit(0).cast("int").alias("__gen"),
        _argmax_centroid(
            _unit(F.col(vec_col).cast("array<double>")), centroids
        ).alias("__c"),
    )
    assigned.write.mode("overwrite").partitionBy("__c").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump(centroids, f)
    return centroids


# ---------------------------------------------------------------------------
# IVF index maintenance (r6, VERDICT r5 item 3): the C34 text index's
# Lucene-style generations+tombstones model transposed to the vector
# index, closing the one asymmetry left in the index layer. Inserts
# assign against the SAVED centroids (no retrain) and append one file
# to each touched list's partition — O(batch) work, PartitionFilters
# pruning keeps working because the partition layout is untouched.
# Deletes are generation-tagged tombstones masking strictly OLDER rows,
# so an update (delete + insert in one refresh) keeps its new vector
# even when it re-assigns to a different inverted list. The probe path
# resolves each id to its newest surviving generation, which makes a
# REPLAYED refresh invisible (at-least-once append, effectively-once
# read — the streaming-maintenance contract, index_stream.py).
# Compaction = re-train + rebuild from the live rows: the OPTIMIZE
# analogue that re-clusters drifted data and physically drops shadowed
# rows.
# ---------------------------------------------------------------------------


def _ivf_tomb_path(path: str) -> str:
    return path + "_tombstones"


def _ivf_next_gen(path: str) -> int:
    import os

    gen_path = path + "_gen"
    gen = 1
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            gen = int(f.read()) + 1
    with open(gen_path, "w") as f:
        f.write(str(gen))
    return gen


def _ivf_has_refreshes(path: str) -> bool:
    import os

    return os.path.exists(path + "_gen")


def _load_ivf_centroids(path: str) -> list[list[float]]:
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        return json.load(f)


def _ivf_tombstones(spark, path: str, id_col: str):
    """(id_col, __tgen = newest delete generation) or None."""
    import os

    tp = _ivf_tomb_path(path)
    if not os.path.isdir(tp):
        return None
    try:
        return (
            spark.read.parquet(tp)
            .groupBy(id_col)
            .agg(F.max("gen").alias("__tgen"))
        )
    except Exception:  # noqa: BLE001 — empty dir between refreshes
        return None


def refresh_ivf_index(
    spark,
    path: str,
    inserted: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental maintenance: O(changed vectors) per refresh.

    ``inserted`` rows are assigned to their nearest SAVED centroid and
    appended under a fresh generation; ``deleted_ids`` (one id column)
    become generation-tagged tombstones. Update = pass the id in
    ``deleted_ids`` AND the new row in ``inserted`` within one refresh.
    Single-maintainer contract (plain-file generation counter, same as
    the text index). Composes with the lake change feed: route
    insert/update_postimage rows here as ``inserted`` and
    delete/update_preimage ids as ``deleted_ids``. Returns the
    generation this refresh wrote."""
    centroids = _load_ivf_centroids(path)
    gen = _ivf_next_gen(path)
    if inserted is not None:
        assigned = inserted.select(
            id_col,
            vec_col,
            F.lit(gen).cast("int").alias("__gen"),
            _argmax_centroid(
                _unit(F.col(vec_col).cast("array<double>")), centroids
            ).alias("__c"),
        )
        assigned.write.mode("append").partitionBy("__c").parquet(path)
    if deleted_ids is not None:
        ids = deleted_ids.toDF(id_col).select(
            id_col, F.lit(gen).cast("int").alias("gen")
        )
        ids.write.mode("append").parquet(_ivf_tomb_path(path))
    return gen


def ivf_index_live(
    spark, path: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The index's live rows: tombstone-masked, newest generation per
    id. A fresh build has no maintenance state and returns the scan
    as-is (no extra exchange)."""
    rows = spark.read.parquet(path)
    if not _ivf_has_refreshes(path):
        return rows.select(id_col, vec_col, "__c")
    tomb = _ivf_tombstones(spark, path, id_col)
    if tomb is not None:
        # tombstones are bounded by deletes-since-last-compaction ->
        # broadcast; a tombstone hides only STRICTLY OLDER generations
        rows = (
            rows.join(F.broadcast(tomb), id_col, "left")
            .filter(F.col("__tgen").isNull() | (F.col("__gen") >= F.col("__tgen")))
            .drop("__tgen")
        )
    return (
        rows.groupBy(id_col)
        .agg(F.max_by(F.struct(vec_col, "__c"), "__gen").alias("__s"))
        .select(id_col, f"__s.{vec_col}", "__s.__c")
    )


def compact_ivf_index(
    spark,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    retrain: bool = True,
) -> list[list[float]]:
    """OPTIMIZE for the vector index: materialize the live rows, then
    rebuild — retraining centroids by default so accumulated inserts
    re-cluster (IVF recall degrades when lists drift from the data
    distribution). Shadowed generations and tombstones are physically
    dropped. ``retrain=False`` keeps the existing centroid map (pure
    garbage collection; assignment — and therefore every probe result
    — is unchanged by construction)."""
    import shutil

    old_centroids = _load_ivf_centroids(path)
    k = n_centroids or len(old_centroids)
    tmp = path + "_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    # materialize OFF the old files first — Spark cannot overwrite a
    # path it is lazily reading
    ivf_index_live(spark, path, id_col, vec_col).select(id_col, vec_col).write.parquet(tmp)
    snap = spark.read.parquet(tmp)
    cents = build_ivf_index(
        snap,
        path,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=k,
        centroids=None if retrain else old_centroids,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return cents


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k against a persisted IVF index.

    The query batch is bounded by contract (same rule as every exact
    kernel here), so probe selection runs driver-side on the collected
    vectors; the scan then carries a STATIC ``__c IN (probes)``
    predicate — Spark turns it into PartitionFilters and never opens
    the unprobed inverted-list files. Per-batch I/O is
    |union of probed lists|, not the corpus."""
    centroids = _load_ivf_centroids(path)
    cents = np.array(centroids, dtype="float64")  # (k, dim), unit rows
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qmat = np.array([list(r[1]) for r in qrows], dtype="float64")
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-300)
    order = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_pairs = [
        (r[0], int(c), list(map(float, r[1])))
        for r, row in zip(qrows, order)
        for c in row
    ]
    probes = sorted({c for _, c, _ in probe_pairs})
    from pyspark.sql import types as T

    qid_type = queries.schema[query_id_col].dataType
    qprobe = spark.createDataFrame(
        probe_pairs,
        T.StructType(
            [
                T.StructField(query_id_col, qid_type),
                T.StructField("__c", T.IntegerType()),
                T.StructField(query_vec_col, T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    assigned = spark.read.parquet(path).filter(F.col("__c").isin(probes))
    if _ivf_has_refreshes(path):
        # maintenance-aware read: tombstone-mask, newest gen per id.
        # Gated on refresh state so a freshly-built index keeps the
        # original zero-extra-exchange plan (PartitionFilters prune,
        # no dedup shuffle). The dedup shuffle here covers only the
        # PROBED lists' rows, not the corpus.
        tomb = _ivf_tombstones(spark, path, id_col)
        if tomb is not None:
            assigned = (
                assigned.join(F.broadcast(tomb), id_col, "left")
                .filter(
                    F.col("__tgen").isNull() | (F.col("__gen") >= F.col("__tgen"))
                )
                .drop("__tgen")
            )
        assigned = (
            assigned.groupBy(id_col)
            .agg(F.max_by(F.struct(vec_col, "__c"), "__gen").alias("__s"))
            .select(id_col, f"__s.{vec_col}", "__s.__c")
        )
    rerank = (
        cosine_fixed(vec_col, query_vec_col, dim)
        if dim is not None
        else cosine(F.col(vec_col), F.col(query_vec_col))
    )
    scored = assigned.join(F.broadcast(qprobe), "__c").select(
        query_id_col, id_col, rerank.alias("cos_sim")
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
