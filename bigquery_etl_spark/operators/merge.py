"""CDC / upsert / SCD2 primitives (guide 'CDC / SCD2': MERGE INTO
emulated with anti-join + union on plain parquet — no Delta/Iceberg
jars in this build; swap these for MERGE INTO when a lakehouse catalog
is on the classpath).

All pure DataFrame transforms plus one atomic directory swap for the
storage form; single-writer assumption (the same one the reference
deploys with, ref app.yaml:14-15).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_dataframe(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics, relational form: rows in `updates` replace
    same-key rows in `target`; unmatched target rows pass through.

    One anti-join shuffle on the keys. Updates must be unique per key."""
    return target.join(updates.select(*keys), keys, "left_anti").unionByName(updates)


def merge_apply(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_cond=None,
    insert: bool = True,
) -> DataFrame:
    """Full MERGE semantics (BigQuery `MERGE ... WHEN MATCHED [AND
    cond] THEN DELETE / UPDATE, WHEN NOT MATCHED THEN INSERT`,
    relational form):

    - target rows with no same-key update row pass through;
    - matched update rows REPLACE the target version — unless
      ``delete_cond`` (evaluated on the update row) holds, in which
      case the key is deleted;
    - unmatched update rows are inserted (``insert=False`` for
      update/delete-only merges).

    Two anti/semi-join shuffles on the keys, same scale profile as
    ``upsert_dataframe`` (which is the ``delete_cond=None`` case)."""
    keep_target = target.join(updates.select(*keys), keys, "left_anti")
    matched = updates.join(target.select(*keys), keys, "left_semi")
    if delete_cond is not None:
        # Three-valued logic: BigQuery's `WHEN MATCHED AND cond THEN
        # DELETE` fires only when cond IS TRUE; a NULL cond falls
        # through to the UPDATE branch. A bare filter(~cond) would
        # discard NULL-cond rows (filter drops NULL), silently
        # deleting them — coalesce NULL to FALSE so they survive.
        matched = matched.filter(~F.coalesce(delete_cond, F.lit(False)))
    out = keep_target.unionByName(matched)
    if insert:
        out = out.unionByName(updates.join(target.select(*keys), keys, "left_anti"))
    return out


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Change-data-feed between two snapshots of the same keyed table
    (Delta's ``table_changes`` analogue, computed relationally so it
    works on plain parquet snapshots): returns the columns of the
    table plus ``_change_type`` in
    ``insert | delete | update_preimage | update_postimage``.

    Semantics match Delta CDF: a key present only in ``new`` is an
    insert, only in ``old`` a delete; present in both with ANY value
    column differing (NULL-safe comparison) yields a preimage row (old
    values) and a postimage row (new values); identical rows emit
    nothing. Both sides must share a schema; rows must be unique per
    key (the MERGE invariant upstream commits already enforce).

    Scale: one full-outer hash join shuffled on the keys — both sides
    are table-sized, so no broadcast; value columns travel packed as a
    single struct and the changed/unchanged test is one null-safe
    struct equality, which stays in codegen. At 100 TB this is the
    minimal plan: you cannot diff two snapshots for less than a co-
    partition of both on the key."""
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot_diff schema mismatch: {sorted(old.columns)} vs "
            f"{sorted(new.columns)}"
        )
    vcols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*vcols).alias("__o"))
    n = new.select(*keys, F.struct(*vcols).alias("__n"))
    j = o.join(n, keys, "full_outer")
    # a missing join side is a NULL struct; a present row's struct is
    # never NULL (structs of NULL fields are non-null), so null-ness
    # distinguishes absent from all-NULL-values.
    #
    # Single-pass shape: a UNION of four filtered legs would plan the
    # full-outer join FOUR times (the pushed filters differ per leg, so
    # ReuseExchange never fires — measured 8 parquet scans); instead
    # classify each joined row once and explode updates into their
    # pre/post pair. One join, one generate, rows never re-read.
    ct = (
        F.when(F.col("__o").isNull(), F.lit("insert"))
        .when(F.col("__n").isNull(), F.lit("delete"))
        .when(~F.col("__o").eqNullSafe(F.col("__n")), F.lit("update"))
    )
    typed = j.withColumn("__ct", ct).filter(F.col("__ct").isNotNull())
    legs = F.when(
        F.col("__ct") == "update",
        F.array(
            F.struct(
                F.lit("update_preimage").alias("t"), F.col("__o").alias("p")
            ),
            F.struct(
                F.lit("update_postimage").alias("t"), F.col("__n").alias("p")
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("__ct").alias("t"),
                F.coalesce(F.col("__n"), F.col("__o")).alias("p"),
            )
        )
    )
    return (
        typed.select(*keys, F.explode(legs).alias("e"))
        .select(*keys, "e.p.*", F.col("e.t").alias("_change_type"))
    )


def recover_upsert(path: str) -> str:
    """Finish or roll back an interrupted ``merge_upsert`` swap.

    The swap protocol uses two deterministic sibling dirs (single-writer
    assumption, same as the reference's deployment — ref app.yaml:14-15):
    ``<path>.staging`` (new snapshot, complete iff Spark's _SUCCESS
    marker exists) and ``<path>.gc`` (prior snapshot awaiting delete).
    Every crash window leaves a state this function maps back to exactly
    one consistent snapshot — the merge is all-or-nothing:

    - table dir present        -> done; drop leftovers     ('clean')
    - staging complete, no dir -> roll FORWARD: staging is the committed
                                  result                   ('completed')
    - gc present, no dir       -> roll BACK: pre-merge snapshot
                                  ('rolled_back')
    """
    staging, gc = f"{path}.staging", f"{path}.gc"
    if os.path.isdir(path):
        for d in (staging, gc):
            if os.path.isdir(d):
                shutil.rmtree(d)
        return "clean"
    if os.path.isdir(staging) and os.path.exists(os.path.join(staging, "_SUCCESS")):
        os.rename(staging, path)
        if os.path.isdir(gc):
            shutil.rmtree(gc)
        return "completed"
    if os.path.isdir(gc):
        os.rename(gc, path)
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        return "rolled_back"
    if os.path.isdir(staging):
        shutil.rmtree(staging)  # incomplete write, nothing to preserve
    return "empty"


def merge_upsert(
    spark: SparkSession, updates: DataFrame, path: str, keys: list[str]
) -> int:
    """Storage upsert on a parquet directory: rewrite = anti-join +
    union, staged to a sibling dir then swapped in with a crash-
    recoverable two-rename protocol (see ``recover_upsert``; a kill at
    any point leaves either the old or the new snapshot, never neither).
    Returns the new row count.

    Scale note: plain-parquet upsert rewrites the table — correct but
    O(table). At 100 TB you partition the table (write_partitioned) and
    rewrite only partitions containing updated keys, or use a format
    with row-level deletes; the relational core (upsert_dataframe) is
    identical in all three."""
    recover_upsert(path)
    if os.path.isdir(path):
        merged = upsert_dataframe(spark.read.parquet(path), updates, keys)
    else:
        merged = updates
    staging, gc = f"{path}.staging", f"{path}.gc"
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    if os.path.isdir(path):
        os.rename(path, gc)
    os.rename(staging, path)
    if os.path.isdir(gc):
        shutil.rmtree(gc)
    return n


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    tracked_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the open version of each
    changed key and append the new version.

    ``current`` schema = keys + tracked_cols + valid_from + valid_to
    (valid_to NULL = open row). ``updates`` schema = keys + tracked_cols
    + ts_col. Emits the full new history table. Changed = any tracked
    column differs (null-safe)."""
    upd = updates.select(
        *keys, *tracked_cols, F.col(ts_col).alias("valid_from")
    ).withColumn("valid_to", F.lit(None).cast(updates.schema[ts_col].dataType))

    open_rows = current.filter(F.col("valid_to").isNull())
    closed_rows = current.filter(F.col("valid_to").isNotNull())

    cmp = upd.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.col("valid_from").alias("__u_from"),
    )
    cond = [F.col(k) == F.col(f"__k_{k}") for k in keys]
    joined = open_rows.join(cmp, cond, "left")
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_update = F.col("__u_from").isNotNull()

    # open rows: close them if a differing update arrived, else keep open
    still_open = joined.filter(~(has_update & changed)).select(*current.columns)
    newly_closed = (
        joined.filter(has_update & changed)
        .withColumn("valid_to", F.col("__u_from"))
        .select(*current.columns)
    )

    # new versions: updates whose key is new OR whose values changed
    unchanged_keys = joined.filter(has_update & ~changed).select(
        *[F.col(f"__k_{k}").alias(k) for k in keys]
    )
    new_versions = upd.join(unchanged_keys, keys, "left_anti")

    return closed_rows.unionByName(still_open).unionByName(newly_closed).unionByName(
        new_versions
    )
