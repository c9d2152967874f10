"""Semantics tests for operators/dedup.py on tiny controlled corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_64,
    simhash_candidates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun of a quiet autumn day"
)


def _corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("autumn", "spring")),  # near dup of 1
        (4, "completely different text about spark query engines and shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_corpus(spark), ["text"], "doc_id")
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4]  # 2 dropped (exact dup of 1)


def test_exact_dedup_winner_pool_commutes_with_content_filter(spark):
    """r14: winners computed over a pre-filter pool must equal winners
    computed over the filtered df whenever the filter is a pure
    function of the content columns (every hash group passes/fails as
    a whole — the q_pretrain_corpus shape, where the pool skips the
    tokenize+gate the winner scan otherwise recomputes)."""
    import pytest

    pool = _corpus(spark)
    gate = F.length("text") > 100  # content-determined: dups agree
    df = pool.filter(gate)  # keeps the BASE family {1,2,3}, drops 4
    got = exact_dedup(
        df, ["text"], "doc_id", strategy="winners", winner_pool=pool
    )
    want = exact_dedup(df, ["text"], "doc_id", strategy="winners")
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    ) == [1, 3]
    # winner ids from hash groups the filter removed entirely match
    # nothing: a df that keeps only the short text still dedups exactly
    df2 = pool.filter(F.length("text") <= 100)
    got2 = exact_dedup(
        df2, ["text"], "doc_id", strategy="winners", winner_pool=pool
    )
    assert sorted(r.doc_id for r in got2.collect()) == [4]
    with pytest.raises(ValueError, match="winner_pool"):
        exact_dedup(pool, ["text"], "doc_id", winner_pool=pool)


def test_minhash_identical_signatures(spark):
    sigs = {r.doc_id: r.signature for r in minhash_signatures(_corpus(spark), "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    # near-dup shares most minhashes; disjoint text shares almost none
    share_13 = sum(a == b for a, b in zip(sigs[1], sigs[3])) / len(sigs[1])
    share_14 = sum(a == b for a, b in zip(sigs[1], sigs[4])) / len(sigs[1])
    assert share_13 > 0.5 > share_14


def test_minhash_dedup_drops_near_dups(spark):
    out = minhash_dedup(_corpus(spark), "doc_id", "text")
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 4]  # 2 (exact) and 3 (near) both collapse onto 1


def test_lsh_candidates_no_false_negatives_for_exact(spark):
    sigs = minhash_signatures(_corpus(spark), "doc_id", "text")
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(sigs, "doc_id").collect()}
    assert (1, 2) in pairs  # exact dups always collide in every band


def test_ngram_jaccard_values(spark):
    df = _corpus(spark)
    cands = spark.createDataFrame([(1, 2), (1, 4)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(df, cands, "doc_id", "text", min_jaccard=0.0).collect()}
    assert out[(1, 2)] == 1.0  # identical text
    assert (1, 4) not in out or out[(1, 4)] < 0.1  # no common 3-grams


def test_simhash_near_dup_candidates(spark):
    hashes = simhash_64(_corpus(spark), "doc_id", "text")
    vals = {r.doc_id: r.simhash for r in hashes.collect()}
    assert vals[1] == vals[2]
    pairs = {(r.id_a, r.id_b) for r in simhash_candidates(hashes, "doc_id").collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs  # one-token change: Hamming distance small


def test_minhash_dedup_incremental(spark):
    from bigquery_etl_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_index,
    )

    corpus = _corpus(spark)
    index = minhash_index(corpus, "doc_id", "text")
    batch = spark.createDataFrame(
        [
            (10, BASE),  # verbatim corpus copy -> guaranteed index hit
            (11, "fresh unrelated prose on watermarks and late arriving events"),
            (12, "fresh unrelated prose on watermarks and late arriving events"),
        ],
        "doc_id long, text string",
    )
    banded = minhash_index(batch, "doc_id", "text")
    surv, new_rows = minhash_dedup_incremental(batch, banded, index, "doc_id")
    ids = sorted(r.doc_id for r in surv.collect())
    assert ids == [11]  # 10 hits corpus, 12 loses to batch sibling 11
    assert sorted(set(r.doc_id for r in new_rows.collect())) == [11]

    # idempotence: re-probe the survivor against the grown index
    surv2, _ = minhash_dedup_incremental(
        surv, banded.join(surv.select("doc_id"), "doc_id", "left_semi"),
        index.unionByName(new_rows), "doc_id",
    )
    assert surv2.count() == 0


def test_minhash_dedup_incremental_empty_index(spark):
    from bigquery_etl_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_index,
    )

    batch = _corpus(spark)
    banded = minhash_index(batch, "doc_id", "text")
    empty = spark.createDataFrame([], "doc_id long, band int, bucket long")
    surv, _ = minhash_dedup_incremental(batch, banded, empty, "doc_id")
    ids = sorted(r.doc_id for r in surv.collect())
    # degenerates to intra-batch minhash_dedup: min-id per collision set
    assert ids == sorted(
        r.doc_id for r in minhash_dedup(batch, "doc_id", "text").collect()
    )


def test_minhash_near_dup_recall_after_mod_fix(spark):
    """Regression for the missing-mod bug: without `mod p` the affine
    hash family was monotone in the base hash, so near-dup (non-
    verbatim) pairs collided with probability ~J instead of
    1-(1-J^4)^16 ~ 1. Plant one-word-edited copies of 20 distinct docs
    (shingle Jaccard ~0.8 -> collision probability >0.999 each) and
    require ALL of them to be dropped — deterministic given the fixed
    seeds, and impossible under the broken family (expected recall
    there ~0.8, P(all 20) ~ 0.01)."""
    from bigquery_etl_spark.operators.dedup import minhash_dedup

    import hashlib

    rows = []
    for d in range(20):
        # hash-random tokens: cross-doc shingle overlap ~0 (positional
        # patterns like "q07tok " would otherwise make ALL docs mutual
        # near-dups now that the hash family actually works)
        toks = [
            hashlib.md5(f"{d}-{i}".encode()).hexdigest()[:8] for i in range(30)
        ]
        text = " ".join(toks)
        rows.append((d, text))
        edited = toks[:]
        edited[15] = "zzchanged"
        rows.append((d + 1000, " ".join(edited)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    surv = {r.doc_id for r in minhash_dedup(df, "doc_id", "text").collect()}
    planted = {d + 1000 for d in range(20)}
    assert not (surv & planted), f"near copies survived: {sorted(surv & planted)}"
    assert set(range(20)) <= surv  # originals all survive


def test_simhash_identical_group_cap_star_pairs(spark):
    """r4: exact-duplicate groups above max_identical emit STAR pairs
    (min-id ↔ member) instead of C(k,2) — survivor semantics identical,
    work linear in the hot group (zipf probe: 127s → 5s on a corpus
    where 30% of docs share one body)."""
    from pyspark.sql import functions as F

    from bigquery_etl_spark.operators.dedup import simhash_candidates

    # hash values chosen so no 16-bit band block collides (7777/8888
    # both have three all-zero high blocks and would legitimately pair
    # as banding candidates)
    h1, h2 = 0x1111111111111111, 0x2222222222222222
    rows = [(i, h1) for i in range(50)] + [(100 + i, h2) for i in range(3)]
    hashes = spark.createDataFrame(rows, "doc_id long, simhash long")
    cands = simhash_candidates(hashes, "doc_id", max_identical=10)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    # hot group (50 > cap): exactly the 49 star pairs from min id 0
    hot = {p for p in pairs if p[1] < 100}
    assert hot == {(0, i) for i in range(1, 50)}
    # small group (3 <= cap): full C(3,2) enumeration
    small = {p for p in pairs if p[0] >= 100}
    assert small == {(100, 101), (100, 102), (101, 102)}
    # survivor semantics: every non-min id appears as a loser
    losers = {b for _, b in pairs}
    assert losers == {i for i in range(1, 50)} | {101, 102}
