"""Incremental training-corpus builder: the Tier-A ETL loop applied to
documents (ref main.py:147-216 runs the same shape for blocks — fetch
batch, transform, idempotently merge, advance cursor).

Each ``ingest`` tick takes a batch of raw documents and

1. quality-filters them (same integer-exact gates as
   ``q_pretrain_corpus``: token count in [min,max], distinct-token
   ratio >= 1/5);
2. exact-dedups WITHIN the batch (min doc_id per content hash wins);
3. drops docs whose content already exists in the corpus — an anti-join
   against only the stored hash column, NOT a re-read of stored text;
4. appends the survivors to a ``PointerStore`` snapshot, so concurrent
   readers never see a torn corpus and a crashed tick never corrupts it
   (re-running the same tick is a no-op: every doc it would add is now
   a stored-hash hit — idempotence without a cursor).

100 TB shape: one content-hash shuffle per tick for the batch-side
dedup, one hash-keyed anti-join whose build side is (hash) only —
8 bytes per stored doc, broadcastable far longer than full rows.
``manifest`` packs the CURRENT corpus into token-budget shards with the
same distributed prefix sum as ``q_pack_sequences``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquery_etl_spark.functions.text import ws_tokens
from bigquery_etl_spark.operators.dedup import content_hash, exact_dedup
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
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens

    # -- ingest tick ---------------------------------------------------------

    def _quality(self, docs: DataFrame) -> DataFrame:
        t = ws_tokens("text")
        n = F.size(t)
        return docs.filter(
            (n >= self.min_tokens)
            & (n <= self.max_tokens)
            & (F.size(F.array_distinct(t)) * 5 >= n)
        )

    def ingest(self, docs: DataFrame) -> dict[str, int]:
        """One tick. ``docs`` needs (doc_id, text) at minimum; all other
        columns are carried through. Returns per-stage counts (driver-
        side scalars only — the reference's stats endpoint analogue,
        main.py:238-247)."""
        n_in = docs.count()
        q = self._quality(docs)
        n_q = q.count()
        batch = exact_dedup(q, ["text"], "doc_id").withColumn(
            "__h", content_hash("text")
        )
        if self.store.exists():
            seen = self.store.read().select("__h")
            fresh = batch.join(seen, "__h", "left_anti")
        else:
            fresh = batch
        n_new = fresh.count()
        if n_new:
            # O(new docs): hard-link append commit, never a corpus rewrite
            self.store.append(fresh)
        return {"input": n_in, "passed_quality": n_q, "added": n_new}

    # -- serving -------------------------------------------------------------

    def read(self) -> DataFrame:
        return self.store.read().drop("__h")

    def manifest(self, budget: int = 1000) -> DataFrame:
        """Token-budget shard manifest over the current corpus snapshot."""
        packed = pack_sequences(
            self.store.read(), "doc_id", F.size(ws_tokens("text")), budget=budget
        )
        return shard_manifest(packed)
