"""Data-quality checks (BigQuery ``ASSERT`` statement analogue, plus
the expectation-suite idiom every production ETL grows).

The reference's only validation is its BigQuery load-job schema check
(main.py:169-177 — malformed rows fail the load); these operators give
the Spark engine the same gate and more, as declarative DataFrame
aggregates. Every check compiles into ONE aggregate over the table —
checks share the scan, nothing is collected per-row, and the result is
a single summary row, so a 100 TB table costs one pass regardless of
how many expectations are attached.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def violations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One-row report: for each named check (a boolean Column that
    should hold for every row), the count of violating rows. All checks
    evaluate in a single shared-scan aggregate."""
    aggs = [
        F.sum(F.when(~cond | cond.isNull(), 1).otherwise(0)).alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs)


def assert_that(df: DataFrame, cond: Column, message: str) -> None:
    """BigQuery ``ASSERT <cond> AS '<message>'``: raise if any row
    violates ``cond``. One aggregate job; no rows collected."""
    n_bad = df.filter(~cond | cond.isNull()).limit(1).count()
    if n_bad:
        raise AssertionError(f"ASSERT failed: {message}")


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once (uniqueness expectation's
    witnesses): one hash aggregate on the key."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def orphan_rows(child: DataFrame, parent: DataFrame, on: list[tuple[str, str]]) -> DataFrame:
    """Referential-integrity violations: child rows with no parent
    (left anti join — the parent side carries only its key columns, so
    the probe is column-pruned and broadcastable when small)."""
    cond = None
    parent_keys = parent.select(*[p for _, p in on]).dropDuplicates()
    for c, p in on:
        clause = child[c] == parent_keys[p]
        cond = clause if cond is None else cond & clause
    return child.join(parent_keys, cond, "left_anti")


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    width: float,
    n_bins: int = 10,
    null_bin: bool = False,
) -> DataFrame:
    """Population Stability Index between two slices of the same table,
    per group: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over equal-width
    bins of ``value_col`` ([lo, lo+n_bins·width), outliers clamped into
    the edge bins), with +1 Laplace smoothing so empty bins are defined
    (p_i = (c_i+1)/(t+n_bins)). The drift monitor every production
    feature/metrics pipeline runs: PSI < 0.1 stable, 0.1–0.25 drifting,
    > 0.25 shifted.

    Determinism: bin counts are exact integers; each bin's term is
    snapped to a 1e-6 grid (ROUND(term·1e6) → BIGINT) before the
    per-group sum, so cross-engine float drift cannot reorder-and-
    accumulate — the same trick q_perplexity uses.

    Scale: the two slices union into ONE aggregation pipeline (one
    exchange on (group, bin), conditional counts per side), the full
    bin grid is derived from the TINY aggregate output (≤ groups ×
    n_bins rows — never a re-scan of the inputs), and totals ride a
    window over that grid. Nothing is table-sized after the single
    aggregate; one data-sized exchange total.

    NULLs (ADVICE r3): with ``null_bin=False`` (default) rows whose
    ``value_col`` is NULL are EXPLICITLY dropped before binning —
    n_a/n_b count only binnable rows, and a NULL-rate shift is
    invisible to the PSI. Set ``null_bin=True`` to route NULLs to a
    dedicated extra bin (index ``n_bins``) that participates in the
    smoothed grid, so NULL-rate drift — a common drift mode — moves
    the PSI like any other bin."""
    bin_ = _psi_bin(value_col, lo, width, n_bins, null_bin)
    a, b = _psi_null_filter(a, value_col, null_bin), _psi_null_filter(
        b, value_col, null_bin
    )
    tagged = a.select(
        *group_cols, bin_.alias("bin"), F.lit(True).alias("__a")
    ).unionByName(
        b.select(*group_cols, bin_.alias("bin"), F.lit(False).alias("__a"))
    )
    return _psi_from_tagged(tagged, group_cols, n_bins + (1 if null_bin else 0))


def psi_drift_sliced(
    df: DataFrame,
    cond_a: Column,
    cond_b: Column,
    value_col: str,
    group_cols: list[str],
    lo: float,
    width: float,
    n_bins: int = 10,
    null_bin: bool = False,
) -> DataFrame:
    """``psi_drift`` when both slices come from ONE table (the common
    drift-monitor case: this week vs last week of the same events):
    tags each row with its slice in a single scan instead of unioning
    two scans of the same file — at 100 TB that is one corpus pass for
    the whole monitor, not two. Rows matching neither condition are
    dropped; a row matching both counts as slice A (make the conditions
    disjoint). NULL ``value_col`` handling as in ``psi_drift``:
    dropped by default, routed to a dedicated bin with
    ``null_bin=True``."""
    bin_ = _psi_bin(value_col, lo, width, n_bins, null_bin)
    tagged = (
        _psi_null_filter(df, value_col, null_bin)
        .select(
            *group_cols,
            bin_.alias("bin"),
            F.when(cond_a, F.lit(True)).when(cond_b, F.lit(False)).alias("__a"),
        )
        .filter(F.col("__a").isNotNull())
    )
    return _psi_from_tagged(tagged, group_cols, n_bins + (1 if null_bin else 0))


def _psi_bin(
    value_col: str, lo: float, width: float, n_bins: int, null_bin: bool
) -> Column:
    """Equal-width bin index with edge clamping. Note greatest/least
    SKIP NULL arguments in Spark, so a NULL value would otherwise clamp
    into bin 0 silently — the explicit NULL branch keeps the semantics
    declared rather than accidental."""
    clamped = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / width), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    if null_bin:
        return F.when(F.col(value_col).isNull(), F.lit(n_bins)).otherwise(clamped)
    return clamped


def _psi_null_filter(df: DataFrame, value_col: str, null_bin: bool) -> DataFrame:
    return df if null_bin else df.filter(F.col(value_col).isNotNull())


def _psi_from_tagged(
    tagged: DataFrame, group_cols: list[str], n_bins: int
) -> DataFrame:
    counts = tagged.groupBy(*group_cols, "bin").agg(
        F.count(F.when(F.col("__a"), 1)).alias("c_a"),
        F.count(F.when(~F.col("__a"), 1)).alias("c_b"),
    )
    # full bin grid per group (smoothed empty bins still contribute),
    # derived from the aggregate itself — group universe = groups with
    # at least one row in either slice, same as before
    grid = (
        counts.select(*group_cols)
        .distinct()
        .crossJoin(
            tagged.sparkSession.range(n_bins).select(
                F.col("id").cast("int").alias("bin")
            )
        )
    )
    # NULL-safe equality on the group columns: a NULL group is a real
    # group here (counts/grid both carry it), and a plain `=` join
    # would silently zero its counts — the same reason
    # incremental_agg.merge_agg_state joins with eqNullSafe.
    g, c = grid.alias("__g"), counts.alias("__c")
    cond = [
        F.col(f"__g.{k}").eqNullSafe(F.col(f"__c.{k}")) for k in group_cols
    ]
    cond.append(F.col("__g.bin") == F.col("__c.bin"))
    j = (
        g.join(c, cond, "left")
        .select(
            *[F.col(f"__g.{k}").alias(k) for k in group_cols],
            F.col("__g.bin").alias("bin"),
            F.col("__c.c_a").alias("c_a"),
            F.col("__c.c_b").alias("c_b"),
        )
        .fillna(0, subset=["c_a", "c_b"])
    )
    w = Window.partitionBy(*group_cols)
    j = j.withColumn("t_a", F.sum("c_a").over(w)).withColumn(
        "t_b", F.sum("c_b").over(w)
    )
    p = (F.col("c_a") + 1.0) / (F.col("t_a") + F.lit(float(n_bins)))
    q = (F.col("c_b") + 1.0) / (F.col("t_b") + F.lit(float(n_bins)))
    term = (p - q) * F.log(p / q)
    snapped = F.round(term * 1e6).cast("bigint")
    return j.groupBy(*group_cols).agg(
        (F.sum(snapped) / 1e6).alias("psi"),
        (F.sum("c_a")).alias("n_a"),
        (F.sum("c_b")).alias("n_b"),
    )
