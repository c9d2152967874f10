"""Incremental corpus builder (pipeline/corpus.py) + PointerStore.append:
cross-tick dedup, idempotent re-runs, and the O(new-data) hard-link
append commit (no corpus rewrite)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigquery_etl_spark.pipeline.corpus import CorpusBuilder
from bigquery_etl_spark.sources.pointer_store import PointerStore


def _docs(spark, start, n, prefix="tok"):
    # 12 distinct tokens of 12 -> passes the length and diversity gates
    rows = [
        (i, " ".join(f"{prefix}{i}w{j}" for j in range(12))) for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_append_links_instead_of_rewriting(spark, tmp_path):
    root = str(tmp_path / "t")
    st = PointerStore(spark, root)
    st.overwrite(spark.range(100).selectExpr("id", "id * 2 AS v").repartition(4))
    snap1 = st.current_snapshot()
    files1 = {
        f for f in os.listdir(os.path.join(root, snap1)) if f.endswith(".parquet")
    }
    st.append(spark.range(100, 150).selectExpr("id", "id * 2 AS v").repartition(2))
    snap2 = st.current_snapshot()
    assert snap2 != snap1
    files2 = {
        f for f in os.listdir(os.path.join(root, snap2)) if f.endswith(".parquet")
    }
    # every old file is carried as a hard link (same name, same inode)
    assert files1 < files2
    for f in files1:
        a = os.stat(os.path.join(root, snap1, f))
        b = os.stat(os.path.join(root, snap2, f))
        assert a.st_ino == b.st_ino and b.st_nlink >= 2
    assert st.read().count() == 150
    # old snapshot still fully readable (reader-lag guarantee)
    assert spark.read.parquet(os.path.join(root, snap1)).count() == 100


def test_append_to_empty_store_bootstraps(spark, tmp_path):
    st = PointerStore(spark, str(tmp_path / "t"))
    st.append(spark.range(7).selectExpr("id"))
    assert st.read().count() == 7


def test_ingest_dedups_across_ticks_and_is_idempotent(spark, tmp_path):
    cb = CorpusBuilder(spark, str(tmp_path / "corpus"))
    a = _docs(spark, 0, 20)
    s1 = cb.ingest(a)
    assert s1 == {"input": 20, "passed_quality": 20, "added": 20}

    # tick 2: 10 old docs re-sent (new ids, same text) + 5 new + 1 junk
    dup = a.limit(10).withColumn("doc_id", F.col("doc_id") + 1000)
    junk = spark.createDataFrame([(9999, "a a a a a a a a a a a a")],
                                 "doc_id long, text string")
    s2 = cb.ingest(dup.unionByName(_docs(spark, 20, 5)).unionByName(junk))
    assert s2["input"] == 16
    assert s2["passed_quality"] == 15  # junk fails the diversity gate
    assert s2["added"] == 5            # re-sent content is dropped

    # re-running the same tick adds nothing (idempotence without cursor)
    s3 = cb.ingest(dup.unionByName(_docs(spark, 20, 5)))
    assert s3["added"] == 0
    assert cb.read().count() == 25


def test_manifest_covers_corpus(spark, tmp_path):
    cb = CorpusBuilder(spark, str(tmp_path / "corpus"))
    cb.ingest(_docs(spark, 0, 40))
    m = cb.manifest(budget=50)
    assert m.agg(F.sum("n_docs")).first()[0] == 40
    # bounded overflow: every shard < budget + max doc tokens (12)
    assert m.filter(F.col("total_tokens") >= 50 + 12).count() == 0


def test_streaming_ingest_dedups_and_survives_restart(spark, tmp_path):
    """Files landing across micro-batches ingest incrementally; a
    restarted stream (same checkpoint) re-processes nothing, and
    re-offered content is dropped by the hash anti-join either way."""
    from bigquery_etl_spark.streaming.corpus_stream import start_corpus_stream

    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    from tests.test_streaming import _write_flat_parquet

    _write_flat_parquet(_docs(spark, 0, 10), incoming, "batch1.parquet")
    q = start_corpus_stream(spark, incoming, corpus, ckpt)
    try:
        q.processAllAvailable()
        # second file: 5 repeats (same text, new ids) + 5 new
        _write_flat_parquet(
            _docs(spark, 0, 5)
            .withColumn("doc_id", F.col("doc_id") + 500)
            .unionByName(_docs(spark, 10, 5)),
            incoming,
            "batch2.parquet",
        )
        q.processAllAvailable()
    finally:
        q.stop()

    cb = CorpusBuilder(spark, corpus)
    assert cb.read().count() == 15

    # restart from the same checkpoint: no replay, no duplicates
    q2 = start_corpus_stream(spark, incoming, corpus, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert cb.read().count() == 15


def test_append_schema_mismatch_raises(spark, tmp_path):
    """Mixed-schema snapshots would be read with a nondeterministically
    sampled footer schema — append must fail loudly at commit time."""
    import pytest

    st = PointerStore(spark, str(tmp_path / "t"))
    st.overwrite(spark.range(5).selectExpr("id", "id * 2 AS v"))
    with pytest.raises(ValueError, match="schema mismatch"):
        st.append(spark.range(5, 8).selectExpr("id"))  # missing v
    with pytest.raises(ValueError, match="type conflict"):
        st.append(
            spark.range(5, 8).selectExpr("id", "CAST(id AS STRING) AS v")
        )  # type drift
    assert st.read().count() == 5  # nothing committed


def test_ingest_rejects_conflicting_doc_id(spark, tmp_path):
    """A re-sent doc_id with DIFFERENT content must not enter the
    corpus: duplicate ids would make manifest() shard assignment
    tie-order-dependent (pack_sequences requires unique ids)."""
    cb = CorpusBuilder(spark, str(tmp_path / "corpus"))
    cb.ingest(_docs(spark, 0, 10))
    conflict = _docs(spark, 5, 3, prefix="other")  # ids 5-7, new text
    s = cb.ingest(conflict.unionByName(_docs(spark, 10, 2)))
    assert s["added"] == 2  # only the genuinely new ids
    kept = {r.doc_id for r in cb.read().collect()}
    assert kept == set(range(12))
    # original content for the conflicted ids is untouched
    texts = {r.doc_id: r.text for r in cb.read().collect()}
    assert texts[5].startswith("tok5w0")


def test_ingest_in_batch_id_dup_is_deterministic(spark, tmp_path):
    """Two same-id rows in ONE batch: exactly one survives, chosen by
    content-hash order (not partition layout) — same result every run."""
    cb = CorpusBuilder(spark, str(tmp_path / "corpus"))
    rows = [
        (1, " ".join(f"a{j}" for j in range(12))),
        (1, " ".join(f"b{j}" for j in range(12))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = cb.ingest(df.repartition(4))
    assert s["added"] == 1
    kept1 = cb.read().collect()[0].text

    cb2 = CorpusBuilder(spark, str(tmp_path / "corpus2"))
    cb2.ingest(df.repartition(1).sort(F.desc("text")))
    kept2 = cb2.read().collect()[0].text
    assert kept1 == kept2


def test_ingest_decontaminates_against_eval_grams(spark, tmp_path):
    """A doc sharing any word-5-gram with the eval set never enters the
    corpus; clean docs are unaffected."""
    cb = CorpusBuilder(spark, str(tmp_path / "corpus"))
    docs = _docs(spark, 0, 6)
    # eval set = the first 5-gram of doc 2
    leak = " ".join(f"tok2w{j}" for j in range(5))
    ev = spark.createDataFrame([(leak,)], "g string")
    s = cb.ingest(docs, eval_grams=ev)
    assert s["added"] == 5
    assert {r.doc_id for r in cb.read().collect()} == {0, 1, 3, 4, 5}


def test_append_schema_evolution(spark, tmp_path):
    """evolve=True unions schemas: old rows null-fill the added column,
    the committed sidecar schema makes reads deterministic, and type
    conflicts still raise. Old snapshots keep their own schema."""
    import pytest

    st = PointerStore(spark, str(tmp_path / "t"))
    st.overwrite(spark.range(5).selectExpr("id", "id * 2 AS v"))
    snap1 = st.current_snapshot()
    st.append(
        spark.range(5, 8).selectExpr("id", "id * 2 AS v", "'en' AS lang"),
        evolve=True,
    )
    out = st.read()
    assert set(out.columns) == {"id", "v", "lang"}
    rows = {r.id: r.lang for r in out.collect()}
    assert len(rows) == 8
    assert all(rows[i] is None for i in range(5))      # old rows null-fill
    assert all(rows[i] == "en" for i in range(5, 8))
    # a further PLAIN append must now match the evolved schema
    st.append(spark.range(8, 9).selectExpr("id", "id * 2 AS v", "'de' AS lang"))
    assert st.read().count() == 9
    # dropping a column also needs evolve
    with pytest.raises(ValueError, match="schema mismatch"):
        st.append(spark.range(9, 10).selectExpr("id", "id * 2 AS v"))
    st.append(spark.range(9, 10).selectExpr("id", "id * 2 AS v"), evolve=True)
    assert st.read().filter("id = 9").first().lang is None
    # type conflicts raise even with evolve
    with pytest.raises(ValueError, match="type conflict"):
        st.append(
            spark.range(10, 11).selectExpr(
                "id", "CAST(id AS STRING) AS v", "'x' AS lang"
            ),
            evolve=True,
        )
    # the pre-evolution snapshot still reads with ITS schema
    if snap1 in os.listdir(str(tmp_path / "t")):
        old = spark.read.parquet(str(tmp_path / "t" / snap1))
        assert set(old.columns) == {"id", "v"}


def test_ingest_near_dedup_drops_near_copies(spark, tmp_path):
    cb = CorpusBuilder(spark, str(tmp_path / "corpus"))
    base = (
        "the quick brown fox jumps over the lazy dog while autumn leaves "
        "drift slowly across the quiet village square at dusk every single day"
    )
    t1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    s1 = cb.ingest(t1, near_dedup=True)
    assert s1["added"] == 1 and s1["near_dup_dropped"] == 0

    # tick 2: near-copy (one word changed -> most shingles shared),
    # verbatim copy, and a genuinely new doc
    t2 = spark.createDataFrame(
        [
            (2, base.replace("autumn", "spring")),
            (3, base),
            (4, "structured streaming joins watermarks and stateful sessions "
                "compose into an exactly once pipeline over parquet snapshots"),
        ],
        "doc_id long, text string",
    )
    s2 = cb.ingest(t2, near_dedup=True)
    # 3 is an exact-hash drop (never reaches the LSH stage);
    # 2 is a NEAR dup -> dropped by the index probe; 4 survives
    assert s2["added"] == 1
    assert s2["near_dup_dropped"] == 1
    assert sorted(r.doc_id for r in cb.read().collect()) == [1, 4]

    # index stays closed under ingestion: ids == corpus ids
    idx_ids = sorted(
        set(r.doc_id for r in cb.index_store.read().select("doc_id").collect())
    )
    assert idx_ids == [1, 4]


def test_repair_index_heals_crash_gap(spark, tmp_path):
    import shutil

    root = str(tmp_path / "corpus")
    cb = CorpusBuilder(spark, root)
    base = (
        "the quick brown fox jumps over the lazy dog while autumn leaves "
        "drift slowly across the quiet village square at dusk every single day"
    )
    cb.ingest(
        spark.createDataFrame([(1, base)], "doc_id long, text string"),
        near_dedup=True,
    )
    # simulate a crash between corpus append and index append
    shutil.rmtree(str(tmp_path / "corpus" / "_lsh_index"))
    cb2 = CorpusBuilder(spark, root)
    assert cb2.repair_index() == 1
    assert cb2.repair_index() == 0  # idempotent

    # the healed index catches a NEAR copy (exact-hash can't)
    s = cb2.ingest(
        spark.createDataFrame(
            [(2, base.replace("autumn", "spring"))], "doc_id long, text string"
        ),
        near_dedup=True,
    )
    assert s["added"] == 0 and s["near_dup_dropped"] == 1


def test_streaming_ingest_near_dedup(spark, tmp_path):
    import os

    from bigquery_etl_spark.streaming.corpus_stream import start_corpus_stream
    from tests.test_streaming import _write_flat_parquet

    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    corpus = str(tmp_path / "corpus")
    base = (
        "structured streaming joins watermarks and stateful sessions compose "
        "into an exactly once pipeline over immutable parquet snapshot dirs"
    )
    _write_flat_parquet(
        spark.createDataFrame([(1, base)], "doc_id long, text string"),
        incoming,
        "b1.parquet",
    )
    q = start_corpus_stream(
        spark, incoming, corpus, str(tmp_path / "ckpt"), near_dedup=True
    )
    try:
        q.processAllAvailable()
        _write_flat_parquet(
            spark.createDataFrame(
                [(2, base.replace("parquet", "iceberg"))],  # near copy
                "doc_id long, text string",
            ),
            incoming,
            "b2.parquet",
        )
        q.processAllAvailable()
    finally:
        q.stop()
    cb = CorpusBuilder(spark, corpus)
    assert sorted(r.doc_id for r in cb.read().collect()) == [1]


def test_near_dedup_enabled_after_plain_ticks_backfills_index(spark, tmp_path):
    """Enabling near_dedup on a corpus built WITHOUT it must not probe
    an empty index: ingest backfills the index from the stored corpus
    first, so near-copies of pre-index docs are caught."""
    cb = CorpusBuilder(spark, str(tmp_path / "corpus"))
    base = (
        "catalyst pushes filters below the exchange while tungsten packs "
        "rows off heap and the scheduler pipelines whole stage codegen"
    )
    cb.ingest(spark.createDataFrame([(1, base)], "doc_id long, text string"))
    assert not cb.index_store.exists()

    s = cb.ingest(
        spark.createDataFrame(
            [(2, base.replace("catalyst", "tungsten2"))],
            "doc_id long, text string",
        ),
        near_dedup=True,
    )
    assert s["added"] == 0 and s["near_dup_dropped"] == 1
    assert sorted(
        set(r.doc_id for r in cb.index_store.read().select("doc_id").collect())
    ) == [1]
