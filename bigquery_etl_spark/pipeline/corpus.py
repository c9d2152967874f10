"""Incremental training-corpus builder: the Tier-A ETL loop applied to
documents (ref main.py:147-216 runs the same shape for blocks — fetch
batch, transform, idempotently merge, advance cursor).

Each ``ingest`` tick takes a batch of raw documents and

1. quality-filters them (``functions.text.quality_gate`` — the SAME
   predicate ``q_pretrain_corpus`` uses, shared so the two corpora
   cannot silently diverge);
2. dedups WITHIN the batch, deterministically: unique content first
   (min doc_id survives per content hash), then unique doc_id (min
   hash survives) — ``pack_sequences``/``manifest`` require globally
   unique ids, and tie order must never depend on partitioning;
3. drops docs whose CONTENT or ID already exists in the corpus — two
   anti-joins whose build sides are single stored columns, never the
   stored text. The content key is ``md5`` (128-bit): at 10^10+ docs a
   64-bit key's birthday collisions would silently discard real
   documents; at 128 bits the false-drop probability is negligible;
4. hard-link-appends the survivors to a ``PointerStore`` snapshot
   (O(new data), never a corpus rewrite), so concurrent readers never
   see a torn corpus and a crashed tick never corrupts it. Re-running
   a tick is a no-op — every doc it would add is a stored-hash or
   stored-id hit — idempotence without a cursor.

The tick's input and its survivor set are persisted for the tick's
duration: the stats counts and the append write would otherwise
re-execute the scan + dedup shuffle lineage up to four times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigquery_etl_spark.functions.text import quality_gate, ws_tokens
from bigquery_etl_spark.operators.dedup import minhash_dedup_incremental, minhash_index
from bigquery_etl_spark.operators.packing import pack_sequences, shard_manifest
from bigquery_etl_spark.sources.pointer_store import PointerStore


class CorpusBuilder:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        min_tokens: int = 10,
        max_tokens: int = 100_000,
    ):
        self.spark = spark
        self.store = PointerStore(spark, root)
        # LSH index lives INSIDE the corpus root (PointerStore only
        # manages `snap-*` dirs, so a named subdir is inert to its
        # GC/recover) — one directory tree = one corpus + its index.
        import os

        self.index_store = PointerStore(spark, os.path.join(root, "_lsh_index"))
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens

    # -- ingest tick ---------------------------------------------------------

    def ingest(
        self,
        docs: DataFrame,
        eval_grams: DataFrame | None = None,
        near_dedup: bool = False,
    ) -> dict[str, int]:
        """One tick. ``docs`` needs (doc_id, text) at minimum; all other
        columns are carried through (they become part of the stored
        schema — later ticks must match it). ``eval_grams`` (optional,
        single column ``g`` of word-5-grams) enables benchmark
        decontamination at the gate: docs sharing any 5-gram with the
        eval set never enter the corpus — cheaper than scrubbing later,
        and the eval set is tiny by definition so it broadcasts.

        ``near_dedup=True`` additionally drops NEAR-duplicates of
        already-stored documents via the persisted MinHash-LSH index
        (``_lsh_index/`` inside the corpus root): the tick shingles only
        the BATCH and probes the stored (band, bucket) rows — O(new)
        signature work against a corpus-sized index that is never
        recomputed. Surviving docs' band rows are appended to the index
        in the same tick, so the index stays closed under ingestion.
        (The exact-hash anti-join still runs first: it is cheaper and
        makes verbatim re-ingestion a no-op even with near_dedup off.)
        Returns per-stage counts (driver-side scalars only — the
        reference's stats endpoint analogue, main.py:238-247)."""
        docs = docs.persist()
        try:
            n_in = docs.count()
            q = docs.filter(quality_gate("text", self.min_tokens, self.max_tokens))
            if eval_grams is not None:
                toks = ws_tokens("text")
                grams = F.when(
                    F.size(toks) >= 5,
                    F.transform(
                        F.sequence(F.lit(0), F.size(toks) - 5),
                        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 5)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
                contaminated = (
                    q.select("doc_id", F.explode(grams).alias("g"))
                    .join(F.broadcast(eval_grams), "g")
                    .select("doc_id")
                    .distinct()
                )
                q = q.join(contaminated, "doc_id", "left_anti")
            n_q = q.count()

            batch = q.withColumn("__h", F.md5("text"))
            w_content = Window.partitionBy("__h").orderBy("doc_id")
            w_id = Window.partitionBy("doc_id").orderBy("__h")
            batch = (
                batch.withColumn("__rc", F.row_number().over(w_content))
                .filter(F.col("__rc") == 1)
                .withColumn("__ri", F.row_number().over(w_id))
                .filter(F.col("__ri") == 1)
                .drop("__rc", "__ri")
            )
            if self.store.exists():
                seen = self.store.read()
                fresh = batch.join(
                    seen.select("__h"), "__h", "left_anti"
                ).join(seen.select("doc_id"), "doc_id", "left_anti")
            else:
                fresh = batch
            fresh = fresh.persist()
            try:
                n_fresh = fresh.count()
                n_near = 0
                if near_dedup and n_fresh:
                    # close any index gap FIRST: a corpus built with
                    # near_dedup off (or a crash between the corpus and
                    # index appends) leaves stored docs missing from the
                    # index — probing that index would silently admit
                    # their near-copies. O(missing), normally zero.
                    self.repair_index()
                    keep, index_rows = self._near_dedup(fresh)
                    keep = keep.persist()
                    index_rows = index_rows.persist()
                    try:
                        n_new = keep.count()
                        n_near = n_fresh - n_new
                        if n_new:
                            self.store.append(keep)
                            if self.index_store.exists():
                                self.index_store.append(index_rows)
                            else:
                                self.index_store.overwrite(index_rows)
                    finally:
                        keep.unpersist()
                        index_rows.unpersist()
                else:
                    n_new = n_fresh
                    if n_new:
                        # O(new docs): hard-link append, never a rewrite
                        self.store.append(fresh)
            finally:
                fresh.unpersist()
            out = {"input": n_in, "passed_quality": n_q, "added": n_new}
            if near_dedup:
                out["near_dup_dropped"] = n_near
            return out
        finally:
            docs.unpersist()

    def _near_dedup(self, fresh: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Batch-banded rows + incremental probe against the stored
        index (empty-index degenerate case = intra-batch dedup only).
        ``fresh`` is already persisted by the tick; the banded rows are
        small (3 numeric cols × bands per doc) and feed three consumers,
        so lineage re-execution costs two extra batch shingle passes at
        worst — acceptable within a tick, and nothing leaks."""
        banded = minhash_index(fresh, "doc_id", "text")
        if self.index_store.exists():
            index = self.index_store.read()
        else:
            index = self.spark.createDataFrame(
                [], "doc_id long, band int, bucket long"
            )
        return minhash_dedup_incremental(fresh, banded, index, "doc_id")

    def repair_index(self) -> int:
        """Heal the one near-dedup crash window: corpus append committed
        but the tick died before the index append. (The orders matter:
        corpus-first means a replayed batch is exact-hash-dropped and
        never re-adds index rows — a GAP; index-first would be worse,
        the replay would see its own rows and near-dup-drop REAL docs.)
        Recomputes signatures only for corpus docs missing from the
        index — O(gap), normally zero. Run at ingest-loop startup,
        like PointerStore.recover()."""
        if not self.store.exists():
            return 0
        # Gap detection on IDS ONLY: this runs every near-dedup tick,
        # and the common case is "no gap" — it must never scan the
        # corpus TEXT column (at 100 TB that is the whole corpus).
        # Two pruned id-column scans + an anti-join; text is touched
        # only for the (normally empty) missing set.
        corpus_ids = self.store.read().select("doc_id")
        if self.index_store.exists():
            missing_ids = corpus_ids.join(
                self.index_store.read().select("doc_id").distinct(),
                "doc_id",
                "left_anti",
            )
        else:
            missing_ids = corpus_ids
        missing_ids = missing_ids.persist()
        try:
            n = missing_ids.count()
            if n:
                missing = self.store.read().select("doc_id", "text").join(
                    missing_ids, "doc_id", "left_semi"
                )
                rows = minhash_index(missing, "doc_id", "text")
                if self.index_store.exists():
                    self.index_store.append(rows)
                else:
                    self.index_store.overwrite(rows)
            return n
        finally:
            missing_ids.unpersist()

    # -- serving -------------------------------------------------------------

    def read(self) -> DataFrame:
        return self.store.read().drop("__h")

    def manifest(self, budget: int = 1000) -> DataFrame:
        """Token-budget shard manifest over the current corpus snapshot
        (ids are unique by ingest's construction, as pack_sequences
        requires)."""
        packed = pack_sequences(
            self.store.read(), "doc_id", F.size(ws_tokens("text")), budget=budget
        )
        return shard_manifest(packed)
