"""Mergeable distinct-count sketches (HLL, Apache DataSketches via
Spark's built-in hll_* functions).

BigQuery exposes APPROX_COUNT_DISTINCT plus HLL_COUNT.INIT/MERGE/
EXTRACT for reaggregatable sketches; Spark's equivalents are
``approx_count_distinct`` (plain HLL++ aggregate, SURVEY.md §2 B22) and
``hll_sketch_agg``/``hll_union_agg``/``hll_sketch_estimate`` — this
module wraps the latter trio as the incremental-maintenance path:

    daily = distinct_sketch(events, ["dt", "event_type"], "user_id")
    # persist `daily`; any later rollup is a cheap merge, NOT a rescan:
    weekly = merge_sketches(daily, ["event_type"])

At 100 TB this is the only sane shape for distinct counts over sliding
ranges: the fact table is scanned once per ingest batch, sketches are
a few KB per group, and merges are associative so they parallelize as
map-side partial aggregates. Sketches are exact-mergeable (union is
lossless in HLL registers), so merged estimates equal the single-shot
estimate over the union — pinned by tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "__hll_sketch"


def distinct_sketch(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch (binary, ~2^lg_k bytes max) per key group over
    value_col. lg_k=12 → ~1.6% relative error."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(SKETCH_COL)
    )


def merge_sketches(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Re-aggregate sketches to a coarser key set (lossless union)."""
    return sketches.groupBy(*keys).agg(
        F.hll_union_agg(F.col(SKETCH_COL)).alias(SKETCH_COL)
    )


def estimate(sketches: DataFrame, alias: str = "distinct_est") -> DataFrame:
    """Materialize the cardinality estimate, dropping the binary column."""
    return sketches.withColumn(
        alias, F.hll_sketch_estimate(F.col(SKETCH_COL)).cast("long")
    ).drop(SKETCH_COL)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable FREQUENCY estimation (heavy hitters) —
# the counterpart to HLL's distinct counting. depth × width integer
# counters; point estimate = min over rows of the hashed counter.
# Guarantees: estimate >= true count (always), overestimate <= 2N/width
# with probability 1-(1/2)^depth (collisions only ever ADD).
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(d, slot, cnt) counter table of a count-min sketch over ``col``.

    One explode (×depth) + one hash aggregate on (d, slot): the sketch
    is ``depth × width`` rows TOTAL regardless of input size, so it
    persists as a tiny table and merges with ``cms_merge`` by summing
    cells — the mergeability that makes it a streaming/incremental
    structure (fold each batch's sketch into the stored one, never
    rescan history)."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col(col), F.lit(i)), F.lit(width)
                        ).alias("slot"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.d", "c.slot")
    return cells.groupBy("d", "slot").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the same (depth, width,
    hash family): CMS(A ∪ B) == CMS(A) ⊕ CMS(B) exactly."""
    return (
        a.unionByName(b)
        .groupBy("d", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_query(
    cms: DataFrame, values: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Frequency estimates for ``values[col]``: min over the sketch's
    depth rows of the value's hashed cell. The VALUES side is the small
    side (a handful of candidates) — broadcast it against the
    (depth × width)-row sketch; neither side is data-sized."""
    probes = values.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col(col), F.lit(i)), F.lit(width)
                        ).alias("slot"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, "c.d", "c.slot")
    return (
        probes.join(cms, ["d", "slot"], "left")
        .fillna(0, subset=["cnt"])  # an unhit cell means count 0
        .groupBy(col)
        .agg(F.min("cnt").alias("est"))
    )
