"""Sequence packing: assign documents to fixed-token-budget training
shards (charter Tier C — the "write the pre-training data loader's
shard manifest" operator; ref has no analogue, it delegates storage
layout to BigQuery, main.py:160-185).

Semantics (deterministic, engine-independent): order documents by id,
take the running token total, and give each document the shard whose
budget interval its STARTING offset falls in::

    shard_id = floor(cum_tokens_before_doc / budget)

A document straddling a budget boundary stays in the shard where it
starts, so a shard can overflow by at most ``max(doc_tokens) - 1`` —
the standard bounded-overflow contiguous packing used by training data
loaders (exact bin packing is NP-hard and, worse, order-dependent).
Because the rule is a closed form over a prefix sum, the result is
byte-identical to the single-window SQL::

    SUM(toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)

which is what the DuckDB oracle runs — but a single global window is a
ONE-PARTITION sort at scale. This operator computes the same prefix
sum distributed:

1. bucket rows into ascending id ranges. For numeric/temporal ids the
   boundaries come from ONE approx-quantile scan of the id column
   (n_buckets-1 doubles to the driver — bounded, like the k-means
   centroids), so the per-bucket window's own hash exchange is the
   ONLY data-sized shuffle (r4; the previous repartitionByRange path
   shuffled the data twice — once into ranges, once again because the
   window cannot prove range partitioning clusters the bucket id).
   Non-numeric ids fall back to that two-shuffle range path.
2. per-bucket running totals via a window WITHIN each bucket;
3. per-bucket grand totals (max of the running sum — derived from the
   window output so the big exchange is REUSED, never re-scanned or
   re-shuffled) get a driver-free exclusive prefix via a window over
   the bucket ids — bucket count is O(cluster cores), so the
   single-partition window there is constant-sized — then broadcast
   back.

One data-sized shuffle + one constant-size broadcast; no global sort.
The output assignment is invariant to WHERE the bucket boundaries
land, so quantile error / AQE / partitioning choices can never change
results. Bucket ids hash to partitions, so a few partitions may carry
two buckets — at scale pass n_buckets ≈ 4× parallelism to smooth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigquery_etl_spark.functions.text import ws_tokens


def _quantile_bounds(
    df: DataFrame, col: str, n_buckets: int, rel_err: float = 0.01
) -> list[float] | None:
    """Ascending bucket boundaries (n_buckets-1 doubles) from one
    approx-quantile scan of ``col``; None when the type has no numeric
    order (caller falls back to range shuffling). Boundary placement
    only affects load balance, never results."""
    from pyspark.sql.types import DateType, NumericType, TimestampType

    dt = df.schema[col].dataType
    if isinstance(dt, NumericType):
        probe = df.select(F.col(col).cast("double").alias("__q"))
    elif isinstance(dt, (TimestampType, DateType)):
        probe = df.select(
            F.col(col).cast("timestamp").cast("double").alias("__q")
        )
    else:
        return None
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # percentile_approx (not df.stat.approxQuantile: that NPEs on empty
    # input in Spark 4.1) — one aggregate scan, NULL on empty → one bucket
    row = probe.agg(
        F.percentile_approx(
            "__q", F.array(*[F.lit(p) for p in probs]), int(1 / rel_err)
        ).alias("b")
    ).first()
    return list(row["b"]) if row["b"] is not None else []


def _bucket_of(val_sql: str, bounds: list[float]) -> Column:
    """Bucket index of the value expression ``val_sql`` under ascending
    ``bounds`` — a linear chain of comparisons (codegen-friendly;
    n_buckets is O(cores)). r13: emitted as ONE parsed SQL expression —
    the old per-bound ``F.when`` chain cost ~5 py4j round-trips per
    boundary (~150 per plan build at 32 buckets, pure driver-side
    latency); the single ``F.expr`` parse builds the identical
    comparison chain JVM-side."""
    if not bounds:
        return F.expr("CAST(0 AS INT)")
    terms = " + ".join(
        f"IF(({val_sql}) >= {float(x)!r}D, 1, 0)" for x in bounds
    )
    return F.expr(f"CAST(({terms}) AS INT)")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int,
    n_buckets: int = 32,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Add ``shard_id`` (bigint) assigning each row to a token-budget
    shard; also returns the row's token count as ``n_tokens``.

    ``tokens_col`` may be a column name or an expression (e.g.
    ``F.size(ws_tokens("text"))``). Rows are packed in ``id_col``
    order; ids must be unique (documents' primary key).

    ``bounds``: precomputed ascending bucket boundaries (from
    ``_quantile_bounds`` over any same-distribution id source). Pass
    them when ``df`` is an EXPENSIVE pipeline: the default probe is an
    eager aggregate that would execute the whole upstream once at plan
    build and again at run time — probing the raw table's id column
    instead costs one cheap single-column scan and only shifts load
    balance, never results (r4; same reason the old repartitionByRange
    path was double-executing upstreams through its sampling job).
    """
    toks = (F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col).cast(
        "long"
    )
    base = df.select(F.col(id_col), toks.alias("n_tokens"))

    if bounds is None:
        bounds = _quantile_bounds(base, id_col, n_buckets)
    if bounds is not None:
        # single-shuffle path: the window's hash exchange on __bkt is
        # the only data-sized movement. Mirror _quantile_bounds'
        # conversion: DateType has no direct cast to double, so go via
        # timestamp first (same dtype check as the probe).
        from pyspark.sql.types import DateType

        id_num_sql = (
            f"CAST(CAST(`{id_col}` AS TIMESTAMP) AS DOUBLE)"
            if isinstance(base.schema[id_col].dataType, DateType)
            else f"CAST(`{id_col}` AS DOUBLE)"
        )
        bucketed = base.withColumn("__bkt", _bucket_of(id_num_sql, bounds))
    else:
        # non-numeric ids: range-shuffle fallback (the window adds a
        # second, bucket-clustering exchange)
        bucketed = base.repartitionByRange(n_buckets, F.col(id_col)).withColumn(
            "__bkt", F.spark_partition_id()
        )
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__cum_local", F.sum("n_tokens").over(w_local))

    # Per-bucket totals: max of the inclusive running sum == bucket
    # sum. Aggregating the WINDOW OUTPUT (not the pre-shuffle input)
    # makes the offsets subtree sit on the same exchange → ReusedExchange,
    # so the corpus is scanned once and shuffled once; the build side
    # re-runs only the in-partition sort+cumsum over the shuffle files.
    totals = local.groupBy("__bkt").agg(F.max("__cum_local").alias("__tot"))
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off")
    )

    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum_before", F.col("__off") + F.col("__cum_local") - F.col("n_tokens"))
        .select(
            id_col,
            "n_tokens",
            F.floor(F.col("__cum_before") / F.lit(budget)).alias("shard_id"),
        )
    )


def segmented_running_sum(
    df: DataFrame,
    key_col: str,
    order_col: str,
    val_col: str,
    out_col: str = "running_sum",
    n_buckets: int = 32,
) -> DataFrame:
    """Per-key running (UNBOUNDED PRECEDING) sum that survives a zipf-hot
    key. Spark executes each window partition as ONE task, so with a
    skewed key the hot key's entire history serializes through a single
    reducer — AQE's skew handling splits joins, never windows. This is
    the window analogue of operators/skew.salted_join: the same
    two-phase prefix sum as pack_sequences, with a composite
    (key, bucket) partition key.

    1. range-shuffle on (key, order) — one key's rows land ordered
       across CONSECUTIVE buckets, so the hot key is spread over many
       tasks while every bucket still holds a contiguous order range;
    2. cumsum within (key, bucket) — bounded task size;
    3. per-(key, bucket) totals get an exclusive per-key prefix via a
       window PARTITIONED BY KEY over bucket ids — at most n_buckets
       rows per key, so even the hottest key is a tiny window — then
       join back on (key, bucket).

    Requires ``order_col`` unique within each key (a running sum over
    tied orders is tie-order-dependent in ANY engine). Result is
    byte-identical to
    ``SUM(val) OVER (PARTITION BY key ORDER BY order ROWS UNBOUNDED
    PRECEDING)``.
    """
    base = df.select(key_col, order_col, F.col(val_col).alias("__v"))
    bucketed = base.repartitionByRange(
        n_buckets, F.col(key_col), F.col(order_col)
    ).withColumn("__bkt", F.spark_partition_id())
    w_local = (
        Window.partitionBy(key_col, "__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__cum_local", F.sum("__v").over(w_local))

    # totals from the pre-window input — same ReuseExchange/one-window
    # rationale as pack_sequences above
    totals = bucketed.groupBy(key_col, "__bkt").agg(F.sum("__v").alias("__tot"))
    w_off = (
        Window.partitionBy(key_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        key_col,
        "__bkt",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(offsets, [key_col, "__bkt"])
        .withColumn(out_col, F.col("__off") + F.col("__cum_local"))
        .select(key_col, order_col, F.col("__v").alias(val_col), out_col)
    )


def shard_manifest(packed: DataFrame) -> DataFrame:
    """Roll the per-row assignment up to the shard manifest a data
    loader consumes: rows and token total per shard (total_tokens <
    budget + max doc size holds by pack_sequences' construction —
    asserted in tests/test_tierc2.py, not recomputed here)."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping fixed-token chunks — the RAG /
    context-window prep step: (id, chunk_id, chunk_text, n_tokens),
    chunk i covering whitespace tokens [i*stride, i*stride+chunk_tokens)
    with stride = chunk_tokens - overlap; every document yields at
    least one chunk (short docs pass through whole).

    Chunk count is the closed form GREATEST(CEIL((n - overlap) /
    stride), 1) — token counts are far below 2^53, so the double ceil
    is exact and any engine reproduces the row set bit-identically.

    Plan: explode(sequence) fan-out + slice/concat_ws projection — all
    whole-stage codegen, no UDF, no shuffle at all (chunking is
    embarrassingly parallel; the fan-out multiplies rows ~n/stride x,
    so put any filter BEFORE this operator, not after)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = ws_tokens(text_col)
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)), F.lit(1)
    ).cast("int")
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    return exploded.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", F.slice("__toks", start + 1, chunk_tokens)).alias(
            "chunk_text"
        ),
        F.least(F.lit(chunk_tokens), F.col("__n") - start).cast("int").alias(
            "n_tokens"
        ),
    )
