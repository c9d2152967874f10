"""Deduplication operators for LLM training-data pipelines (SURVEY.md §2
Tier C; charter BASELINE.json north star).

All DataFrame-native — no driver-side loops, no ml-lib dependency — so
every stage is a shuffle-bounded relational op that scales to 100 TB:

- exact_dedup:      hash-groupBy, one shuffle on a 64-bit content hash.
- minhash_signatures / minhash_lsh_candidates: shingle → 64 minhashes →
  band → bucket-join. Shuffles are bounded by (docs × bands), never by
  doc-pair count; only same-bucket pairs are materialized.
- simhash_64:       64-bit simhash via per-bit votes; near-dup candidates
  by banded equality (Hamming ≤ bands-1 guaranteed recall per band).
- ngram_jaccard_pairs: exact Jaccard verification on candidate pairs
  (token n-grams), the rerank step after LSH.

Deterministic throughout: hash seeds are constant column salts, survivor
selection is min-id, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def content_hash(*cols: str | Column) -> Column:
    """64-bit content fingerprint of one or more columns (xxhash64 —
    Spark's FARM_FINGERPRINT analogue, ref schema had no content hash
    which is why the reference can't dedup replays)."""
    return F.xxhash64(*cols)


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    strategy: str = "window",
    winner_pool: DataFrame | None = None,
) -> DataFrame:
    """Exact dedup: keep the min-id row per content hash.

    Two physical routes (same result set):

    - ``"window"`` (default, the unconditional-scale path): one shuffle
      of the ROWS on the hash, row_number picks the min-id survivor.
      Payload-sized exchange, but works at any duplicate ratio and any
      corpus size.
    - ``"winners"``: aggregate ``min(id) per hash`` (map-side partial
      min — the exchange carries one (hash, id) PAIR per map partition
      per hash, never row payloads), then broadcast-semi-join the
      winner ids back. The data rows are NEVER shuffled — the survivor
      filter runs in place over the scan partitioning, which matters
      when rows carry wide payloads (text + token arrays). Bounded by
      the winner-id set fitting in a broadcast (~8 bytes/distinct doc:
      tens of millions of ids per GB); past that, use ``"window"``.
      Requires ``id_col`` to be unique per row (true for any document
      corpus keyed by doc_id) — with duplicate ids the semi-join would
      keep every row carrying a winning id, not one row per hash.

    ``winner_pool`` (winners strategy only, r14 — guide §1.2 step 1 /
    §2.3: don't compute things you throw away): compute the min-id
    aggregate over this CHEAPER superset of ``df`` instead of ``df``
    itself. Sound exactly when ``df`` = pool ∩ P for a predicate P that
    is a pure function of the content columns: every content-hash
    group of the pool then lies entirely inside or entirely outside
    ``df``, so the pool group's min id IS the df group's min id for
    every group that survives, and winner ids from vanished groups
    match nothing in the semi-join. Typical use: df carries an
    expensive derived filter (tokenize + quality gate) that the winner
    aggregate's scan would otherwise recompute row by row — the pool
    skips it (q_pretrain_corpus: the winner build drops the second
    full-corpus tokenize pass). A predicate NOT determined by the
    content columns (e.g. an id-parity filter) must stay ON the pool.
    """
    h = content_hash(*content_cols).alias("__h")
    if strategy == "winners":
        winners = (
            (winner_pool if winner_pool is not None else df)
            .select(F.col(id_col), h)
            .groupBy("__h")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        return df.join(F.broadcast(winners), id_col, "left_semi")
    if winner_pool is not None:
        raise ValueError("winner_pool requires strategy='winners'")
    w = W.partitionBy("__h").orderBy(id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def char_shingles(text: str | Column, k: int = 8) -> Column:
    """Distinct character k-shingles of a string, as an array column.

    Built-ins only (sequence + transform + substring) — stays in codegen."""
    c = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, k)))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 64, shingle_k: int = 8
) -> DataFrame:
    """(id, signature: array<bigint>[n_hashes]) per document.

    MinHash_i(doc) = min over shingles of hash_i(shingle). Each shingle
    is string-hashed ONCE (xxhash64), mixed down to 31 bits; the
    n_hashes variants come from the universal family h_i = (a_i*h31 +
    b_i) mod p, p = 2^31-1 (Mersenne prime): products stay < 2^62, so
    the arithmetic is exact under ANSI mode. The ``mod p`` is LOAD-
    BEARING, not hygiene: without it a_i*h+b_i is strictly increasing
    in h, so every h_i's argmin is the SAME shingle (the one minimizing
    h31) and the 64 "independent" minhashes collapse to 64 functions of
    one hash — signatures of near-dup docs then agree on either all 64
    positions or none, and the banding S-curve degenerates to a single
    coin flip with P(match) = J instead of 1-(1-J^r)^b. (Caught by a
    0/64-match signature pair on docs with measured Jaccard 0.80.)

    Plan shape: explode shingles → project the base hash (ONE xxhash64
    per shingle) → hash-aggregate per doc with n_hashes ``min(a_i*h+b_i)``
    expressions. Everything stays in whole-stage codegen (higher-order-
    function formulations evaluate interpreted per element — measured
    3-4x slower); the aggregate is map-side partial, so the shuffle
    carries one 64-column row per (partition, doc)."""
    mask31 = (1 << 31) - 1
    consts = [
        ((2654435761 * (i + 1)) % (1 << 31) | 1, (40503 * (i + 7) ** 2 + i) % (1 << 31))
        for i in range(n_hashes)
    ]
    h = F.xxhash64("__sh")
    base = h.bitwiseXOR(F.shiftrightunsigned(h, 33)).bitwiseAND(F.lit(mask31))
    # Shingling as explode(position-range) + substring so everything but
    # the generator stays in whole-stage codegen (char_shingles' HOF
    # transform/array_distinct evaluates interpreted — measured slower;
    # distinct is unnecessary anyway: min over a multiset == min over
    # its set). Spread docs across the cluster BEFORE the fan-out: a
    # small single-file input otherwise pins everything on one task, and
    # the explicit numPartitions stops AQE coalescing the byte-small
    # shuffle back to one partition.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    shingled = (
        df.repartition(n_part, F.col(id_col))
        .select(
            F.col(id_col),
            F.col(text_col).alias("__t"),
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length(text_col) - (shingle_k - 1), F.lit(1))
                )
            ).alias("__p"),
        )
        .select(id_col, F.expr(f"substring(__t, __p, {shingle_k})").alias("__sh"))
        .select(id_col, base.alias("__h"))
    )
    # All n_hashes minima as ONE array-of-aggregates expression, parsed
    # from a single SQL string: building 64 Column objects through
    # Py4J and analyzing a 64-output aggregate costs >1s of pure
    # driver time per plan build (measured); one expr keeps plan
    # construction O(1) analysis passes. Execution is identical —
    # same partial/final min aggregates, same codegen.
    p = (1 << 31) - 1
    sig_expr = "array(" + ", ".join(
        f"min((__h * {a}L + {b}L) % {p}L)" for a, b in consts
    ) + ") as signature"
    return shingled.groupBy(id_col).agg(F.expr(sig_expr))


def lsh_bands(
    sigs: DataFrame, id_col: str, n_bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bucket) rows: one bucket id per signature band.

    Two docs collide in a band iff that band of `rows_per_band`
    consecutive minhashes is identical — P(any collision) =
    1-(1-j^r)^b, the classic LSH S-curve."""
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str, n_bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, n_shared_bands) via banding.

    The band bucket-join shuffles docs × bands rows keyed by
    (band, bucket); pairs are enumerated only within buckets. Use this
    when downstream needs the PAIRS (e.g. exact-Jaccard rerank);
    for dedup-by-min-id use minhash_dedup, which never materializes
    pairs."""
    banded = lsh_bands(sigs, id_col, n_bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.band") == F.col(f"b.band"))
        & (F.col(f"a.bucket") == F.col(f"b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    return pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared_bands"))


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 8,
) -> DataFrame:
    """Fuzzy dedup: drop every doc that LSH-collides with a lower-id doc.

    Pair-free formulation: per (band, bucket) compute min(id); a doc is
    a loser iff some bucket it occupies has a smaller min. Work is
    LINEAR in docs × bands — candidate pairs are never materialized, so
    dup-heavy corpora (where hot buckets make the pair join quadratic)
    cost the same as clean ones. Conservative survivor policy: chains
    A~B~C keep only A — the usual choice for training-data dedup."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    banded = lsh_bands(sigs, id_col, n_bands, n_hashes // n_bands)
    # min-per-bucket as a WINDOW, not groupBy+self-join: the join form
    # references `banded` twice, and the two subtrees differ by a pushed
    # isnotnull filter, so ReuseExchange never fires and the whole
    # shingle→signature pipeline executes TWICE (profiled: 2x Generate
    # of every shingle). The window keeps one lineage — signatures are
    # computed once, shuffled once by (band, bucket); per-bucket state
    # is bounded by bucket occupancy, so the op stays linear in
    # docs × bands at any scale.
    rep = F.min(id_col).over(W.partitionBy("band", "bucket"))
    losers = (
        banded.withColumn("__rep", rep)
        .filter(F.col(id_col) > F.col("__rep"))
        .select(id_col)
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def simhash_64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: bigint): 64-bit SimHash over whitespace tokens.

    Bit b of the simhash = majority vote of bit b across token hashes.
    Map-only: per row, fold the token-hash array into a 64-slot vote
    array (aggregate + zip_with), then assemble the sign bits — zero
    shuffle, same profile as minhash_signatures."""
    # parallelize single-file inputs; explicit n so AQE keeps it
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    tok_hashes = F.transform(
        F.array_distinct(F.split(F.col(text_col), r"\s+")), lambda t: F.xxhash64(t)
    )
    bit_votes = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1)
                    .otherwise(-1)
                    .cast("long")
                    for b in range(64)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    votes = df.select(F.col(id_col), bit_votes.alias("__votes"))
    sim = None
    for b in range(64):
        bit = F.when(F.element_at("__votes", b + 1) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sim = term if sim is None else sim.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return votes.select(id_col, sim.alias("simhash"))


def simhash_candidates(
    hashes: DataFrame,
    id_col: str,
    n_bands: int = 4,
    max_block: int = 10_000,
    max_identical: int = 1_000,
) -> DataFrame:
    """Near-dup candidate pairs by banded simhash equality.

    Splitting 64 bits into n_bands blocks guarantees recall of every
    pair with Hamming distance < n_bands (pigeonhole: some block is
    equal), for pairs whose shared block survives the hot-block cap
    below.

    r4 scale shape (the sf1 soak measured 94 GB of spill in the naive
    id-level band self-join on a duplicate-heavy corpus):

    - IDENTICAL hashes pair directly (equality self-join on the full
      64-bit value — one hash shuffle; every verbatim-copy pair is
      emitted, which the recall contract requires). Work is Σ C(k,2)
      over exact-duplicate multiplicities — bounded: groups larger
      than ``max_identical`` emit STAR pairs (min-id ↔ member) instead
      of all pairs, which preserves dedup survivor semantics exactly
      (every member still pairs with a lower id) while keeping a
      pathological hot text (the zipf probe plants one body in 30% of
      600k docs → C(180k,2) ≈ 1.6e10 pairs) linear in the group size.
      Pair-set completeness holds below the cap; collapse exact dups
      upstream (dedup_exact) if full pair enumeration of hot texts
      matters.
    - The BAND join runs over DISTINCT hash values only, emitting
      representative (min-id per hash) pairs. A corpus where every doc
      has ~10 verbatim copies no longer squares the copy count through
      the join (100× row reduction measured); near-dup CLUSTER
      connectivity — what dedup consumes — is preserved: every id
      reaches its group rep via the identity pairs, and reps pair
      across groups.
    - Blocks matched by more than ``max_block`` distinct hash values
      are dropped as non-discriminative (standard LSH hot-bucket
      practice: a 16-bit block shared by 10k+ distinct fingerprints —
      here, majority-vote bits over similar token distributions —
      pairs near-random docs and only manufactures O(bucket²) false
      candidates)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    wg = W.partitionBy("simhash")
    sized = hashes.withColumn("__gsz", F.count(F.lit(1)).over(wg)).withColumn(
        "__gmin", F.min(id_col).over(wg)
    )
    small = sized.filter(F.col("__gsz") <= max_identical)
    ha, hb = small.alias("ha"), small.alias("hb")
    identical_full = ha.join(
        hb,
        (F.col("ha.simhash") == F.col("hb.simhash"))
        & (F.col(f"ha.{id_col}") < F.col(f"hb.{id_col}")),
    ).select(
        F.col(f"ha.{id_col}").alias("id_a"), F.col(f"hb.{id_col}").alias("id_b")
    )
    identical_star = (
        sized.filter(
            (F.col("__gsz") > max_identical) & (F.col(id_col) != F.col("__gmin"))
        )
        .select(F.col("__gmin").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    identical = identical_full.unionByName(identical_star)

    groups = hashes.groupBy("simhash").agg(F.min(id_col).alias("__rep"))
    banded = groups.select(
        "simhash",
        "__rep",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("block"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("simhash", "__rep", "bb.band", "bb.block")
    w = W.partitionBy("band", "block")
    banded = banded.withColumn(
        "__bsz", F.count(F.lit(1)).over(w)
    ).filter(F.col("__bsz") <= max_block)
    a, b = banded.alias("a"), banded.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.__rep") < F.col("b.__rep")),
        )
        .select(F.col("a.__rep").alias("id_a"), F.col("b.__rep").alias("id_b"))
    )
    return identical.unionByName(cross).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact token-n-gram Jaccard for candidate pairs (the verify/rerank
    stage after LSH). Joins each side's distinct n-gram set; |A∩B| from a
    join on (pair, gram), |A∪B| = |A|+|B|−|A∩B|. Work is bounded by
    candidate-pair grams, never all-pairs."""
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(F.split(F.col(text_col), r"\s+")) - (n - 1), F.lit(1)),
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.split(F.col(text_col), r"\s+"), i, n)
                    ),
                )
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))

    ga = grams.select(F.col(id_col).alias("id_a"), "gram")
    gb = grams.select(F.col(id_col).alias("id_b_g"), F.col("gram").alias("gram_b"))
    inter = (
        candidates.join(ga, "id_a")
        .join(gb, (F.col("id_b") == F.col("id_b_g")) & (F.col("gram") == F.col("gram_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Incremental fuzzy dedup: dedup a NEW batch against a persisted corpus
# index without ever recomputing the corpus's signatures. At 100 TB you
# ingest daily batches against a multi-petabyte corpus — re-shingling the
# corpus per tick is the difference between O(new) and O(corpus) work.
# ---------------------------------------------------------------------------


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 8,
) -> DataFrame:
    """The persistable LSH index: (id, band, bucket) rows, one per
    document-band. docs × n_bands rows of three 8-byte columns — a few
    hundred bytes per document, independent of document size, so the
    index is ~1000× smaller than the corpus text it summarizes. Store
    it partitioned/bucketed by (band, bucket) and the incremental probe
    below becomes a co-located join with zero index-side shuffle."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    return lsh_bands(sigs, id_col, n_bands, n_hashes // n_bands)


def minhash_dedup_incremental(
    new_docs: DataFrame,
    new_banded: DataFrame,
    index: DataFrame,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Dedup ``new_docs`` against an existing corpus's ``minhash_index``
    AND within the batch itself, touching only O(new × bands) rows.

    ``new_banded`` is the batch's own ``minhash_index(new_docs, ...)``
    output, passed in (rather than computed here) so the CALLER owns
    its caching: it feeds three consumers below (corpus probe, intra-
    batch window, surviving index rows), and without a caller-side
    ``persist()`` the whole shingle→signature pipeline would execute
    three times. A hidden persist here could never be unpersisted —
    both returned frames are lazy views over it.

    Returns ``(survivors, new_index_rows)``: surviving documents and
    their band rows, ready to append to the stored index (same column
    layout, so the index stays closed under ingestion).

    Policy matches ``minhash_dedup``: a new doc is dropped iff any of
    its band buckets already exists in the corpus index, or a lower-id
    batch sibling shares a bucket — conservative min-id survivorship,
    and identical texts ALWAYS collide (equal signatures ⟹ equal band
    buckets), so verbatim re-ingestion is a guaranteed no-op.

    Scale shape: the batch side is signature work linear in new-batch
    text; the probe join is keyed (band, bucket). A daily batch is
    typically ≪ the corpus, so the planner (or AQE, from runtime sizes)
    broadcasts the batch's band rows and the stored index is read in
    ONE streaming pass with no shuffle — never hint the index side,
    it's corpus-sized. When the index is bucketed by (band, bucket) on
    disk, a shuffle join is also exchange-free on the index side."""
    # corpus collisions: index (big, probe) ⋈ batch bands (small, build)
    corpus_hits = (
        index.select("band", "bucket")
        .join(new_banded, ["band", "bucket"])
        .select(id_col)
        .distinct()
    )
    # intra-batch collisions: pair-free min-per-bucket window (see
    # minhash_dedup for why a window, not a self-join)
    rep = F.min(id_col).over(W.partitionBy("band", "bucket"))
    batch_losers = (
        new_banded.withColumn("__rep", rep)
        .filter(F.col(id_col) > F.col("__rep"))
        .select(id_col)
        .distinct()
    )
    losers = corpus_hits.unionByName(batch_losers).distinct()
    survivors = new_docs.join(losers, id_col, "left_anti")
    new_index_rows = new_banded.join(losers, id_col, "left_anti")
    return survivors, new_index_rows
