"""Persisted inverted text index with bucket-pruned search.

The scan-time inverted-index shape (explode -> filter -> agg,
plans/coverage8.q_search_terms) re-tokenizes the corpus on every
query. This operator is the warehouse version — BigQuery's search
index / CREATE SEARCH INDEX analogue (the reference delegates all
search to BigQuery SQL, ref main.py:49-50) — built ONCE as a bucketed
table, so each search:

- reads ONLY the buckets its query terms hash into (Spark bucket
  pruning on the ``term`` IN-filter; the physical scan reports
  ``SelectedBucketsCount: k of n``), and
- aggregates posting rows for those terms alone — per-query cost is
  O(sum of matched posting lists), independent of corpus size.

At 100 TB the build is the classic inverted-index map-reduce (one
explode + one shuffle on term, amortized over every later query) and
n_buckets is sized so one bucket's posting slice fits an executor
(~vocab/buckets terms per bucket; hot stop-words cap naturally at the
doc count per term).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_text_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    table: str,
    n_buckets: int = 64,
) -> None:
    """Build (term, doc_id, tf) postings bucketed+sorted by term.

    One explode + one shuffle (the groupBy); ``bucketBy`` then pays one
    more term-hash shuffle at write so every later search is
    shuffle-free on the index side."""
    # a full build IS the compaction: clear any tombstones/generation
    # state a previous incarnation of this table name left behind
    # (the data lives under /tmp, the catalog entry does not survive
    # the session — they must reset together)
    import shutil

    shutil.rmtree(_tombstone_path(table), ignore_errors=True)
    try:
        os.remove(_index_root(table) + "_gen")
    except FileNotFoundError:
        pass
    postings = _postings(docs, id_col, text_col, gen=0)
    (
        postings.write.mode("overwrite")
        .bucketBy(n_buckets, "term")
        .sortBy("term")
        .format("parquet")
        # external table at an explicit path: the default managed
        # location is cwd/spark-warehouse, and the cwd of a host
        # session (the driver contract's plain SparkSession) is not
        # ours to write into
        .option("path", _index_root(table))
        .saveAsTable(table)
    )


def search_text_index(
    spark: SparkSession,
    table: str,
    terms: list[str],
    mode: str = "any",
    k: int | None = 10,
) -> DataFrame:
    """Top-k docs for a term set from the persisted index
    (``k=None``: ALL matching docs, unranked — the SEARCH() predicate
    form).

    Score = (#matched terms, total tf) descending, doc_id ascending as
    the deterministic tiebreak. ``mode="all"`` keeps only docs matching
    every term (posting-list intersection as a HAVING — never a
    per-term self-join)."""
    terms = sorted(set(terms))
    # Spark's auto-bucketed-scan rule DISABLES bucketed reading when the
    # query gains no partitioning from the bucket column (we aggregate
    # on doc_id, not term) — which also silently drops bucket PRUNING,
    # the whole point of the index. Keep bucketed scans honored for this
    # session: the scan then reads only the query terms' buckets
    # (SelectedBucketsCount k of n in the physical plan). Within each
    # surviving bucket, sortBy(term) gives row-group min/max skipping on
    # top.
    _AUTO = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prior = spark.conf.get(_AUTO, "true")
    spark.conf.set(_AUTO, "false")
    try:
        return _search_plan(spark, table, terms, mode, k)
    finally:
        # scope the override: restore the session conf so unrelated
        # bucketed-table queries keep their default plan selection
        # (ADVICE r5). _search_plan forces executedPlan inside the
        # scope, and QueryExecution caches it, so the returned
        # DataFrame keeps the bucket-pruned shape regardless.
        spark.conf.set(_AUTO, prior)


def _search_plan(
    spark: SparkSession, table: str, terms: list[str], mode: str, k: int
) -> DataFrame:
    idx = spark.table(table).filter(F.col("term").isin(terms))
    tomb = _tombstones(spark, table)
    if tomb is not None:
        # deletes mask (broadcast — tombstones are bounded by
        # deletes-since-last-compaction): a tombstone hides only
        # STRICTLY OLDER posting generations, so a same-refresh
        # delete+insert (an update) keeps its new postings
        idx = (
            idx.join(F.broadcast(tomb), "doc_id", "left")
            .filter(F.col("tgen").isNull() | (F.col("gen") >= F.col("tgen")))
            .drop("tgen")
        )
    # newest generation wins per (term, doc): masks nothing in a
    # freshly-built index, makes a REPLAYED refresh invisible (its
    # re-appended postings carry a newer gen with the same tf), and
    # lets an update's new postings shadow anything the tombstone
    # didn't already hide. This is what makes streaming maintenance
    # (streaming/index_stream.py) effectively-once at READ time even
    # though the posting append itself is at-least-once.
    per_term_doc = idx.groupBy("term", "doc_id").agg(
        F.max_by("tf", "gen").alias("tf")
    )
    per_doc = per_term_doc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("tf").alias("tf_sum"),
    )
    if mode == "all":
        per_doc = per_doc.filter(F.col("n_terms") == len(terms))
    if k is None:
        # containment predicate (BigQuery SEARCH()): every matching
        # doc, no ranking — skips the top-k sort entirely
        out = per_doc
    else:
        out = per_doc.orderBy(
            F.col("n_terms").desc(), F.col("tf_sum").desc(), "doc_id"
        ).limit(k)
    # compile the physical plan NOW, while autoBucketedScan is off —
    # the cached executedPlan is what every later action runs
    out._jdf.queryExecution().executedPlan()
    return out


def _postings(docs: DataFrame, id_col: str, text_col: str, gen: int) -> DataFrame:
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "doc_id", "tf", F.lit(gen).cast("int").alias("gen"))
    )


def refresh_text_index(
    spark: SparkSession,
    table: str,
    inserted: DataFrame | None,
    deleted_ids: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Incremental index maintenance — Lucene's segment model
    re-expressed for a bucketed lakehouse table:

    - ``inserted`` docs' postings are APPENDED with ``insertInto``,
      which honors the table's bucket spec (each refresh adds at most
      one file per touched bucket; bucket pruning keeps working).
    - ``deleted_ids`` (one column of doc ids) become GENERATION-tagged
      tombstones: a tombstone masks only postings of strictly older
      generations, so an update — pass the doc id in ``deleted_ids``
      AND the new row in ``inserted`` within one refresh — deletes the
      old postings and keeps the new ones. Postings are never rewritten
      in place; compaction = rebuild, exactly like a segment merge.

    O(changed docs) work per refresh; single-maintainer contract (the
    generation counter is a plain file, like the builder's cursor).
    Composes with the lake change feed: feed ``changes()``
    insert/update_postimage rows as ``inserted`` and
    delete/update_preimage ids as ``deleted_ids``. Returns the
    generation this refresh wrote."""
    gen = _next_gen(table)
    if inserted is not None:
        # insertInto is positional: (term, doc_id, tf, gen)
        _postings(inserted, id_col, text_col, gen).write.insertInto(table)
    if deleted_ids is not None:
        ids = deleted_ids.toDF("doc_id").select(
            "doc_id", F.lit(gen).cast("int").alias("gen")
        )
        ids.write.mode("append").parquet(_tombstone_path(table))
    return gen


def _index_root(table: str) -> str:
    return f"/tmp/spark_graft_indexes/{table}"


def _tombstone_path(table: str) -> str:
    return _index_root(table) + "_tombstones"


def _next_gen(table: str) -> int:
    path = _index_root(table) + "_gen"
    gen = 1
    if os.path.exists(path):
        with open(path) as f:
            gen = int(f.read()) + 1
    with open(path, "w") as f:
        f.write(str(gen))
    return gen


def _tombstones(spark: SparkSession, table: str):
    """(doc_id, tgen = newest delete generation) or None."""
    path = _tombstone_path(table)
    if not os.path.isdir(path):
        return None
    try:
        return (
            spark.read.parquet(path)
            .groupBy("doc_id")
            .agg(F.max("gen").alias("tgen"))
        )
    except Exception:  # noqa: BLE001 — empty dir between refreshes
        return None


def ensure_text_index(
    spark: SparkSession, docs: DataFrame, id_col: str, text_col: str, sf_dir: str
) -> str:
    """Process-local build-once: index table named from the corpus dir
    (plus pid — sessions in different processes share a cwd warehouse
    but never a catalog, so names must not collide on disk). Returns
    the table name; builds on first use per process."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    table = f"text_index_{key}_{os.getpid()}"
    if not spark.catalog.tableExists(table):
        build_text_index(docs, id_col, text_col, table)
    return table
