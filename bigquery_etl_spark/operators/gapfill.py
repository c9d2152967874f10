"""Time-series gap filling — BigQuery's ``GAP_FILL`` TVF.

Reference parity: BigQuery ``GAP_FILL(TABLE t, ts_column => …,
bucket_width => INTERVAL …, partitioning_columns => […],
value_columns => [(col, method), …])`` (a delegated-SQL surface of the
reference, main.py:21,49-50). Semantics implemented:

- the time axis is bucketed to a fixed-width grid anchored at
  ``origin`` (default Unix epoch); every partition's output covers the
  grid from its min to its max input bucket with NO holes;
- fill methods per value column: ``'null'`` (grid rows get NULL),
  ``'locf'`` (last observation carried forward), ``'linear'``
  (interpolation between the nearest observations either side, output
  DOUBLE — BigQuery requires a numeric column for linear too);
- duplicate bucketized timestamps within a partition refuse loudly
  (BigQuery: "the time series contains duplicate timestamps").

Scale shape (r13): the projected input is pinned in one
``DISTRIBUTE BY partitioning_columns`` CTE, and the bounds aggregate,
the grid⋈input join and the fill windows all ride that single
hash(parts) exchange — the input subquery executes ONCE (the previous
DataFrame form inlined it twice) and the duplicate-timestamp check is
a ``LAG`` on the fill windows' existing sort instead of a
``countDistinct`` that cost its own exchange. ``sequence()`` expands
the grid INSIDE each task — no driver collect. A loud guard refuses
partitions whose grid would exceed ``MAX_BUCKETS_PER_PARTITION`` — a
grid that size belongs in a coarser bucket_width, not in one task's
memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_GF_SEQ = 0

_MICROS = {
    "MICROSECOND": 1,
    "MILLISECOND": 1_000,
    "SECOND": 1_000_000,
    "MINUTE": 60_000_000,
    "HOUR": 3_600_000_000,
    "DAY": 86_400_000_000,
}

MAX_BUCKETS_PER_PARTITION = 5_000_000

_METHODS = ("null", "locf", "linear")


def width_micros(n: int, unit: str) -> int:
    """Fixed-width bucket size in microseconds. MONTH/YEAR are not
    fixed-width and refuse (BigQuery's GAP_FILL likewise rejects
    non-constant widths)."""
    u = unit.upper()
    if u not in _MICROS:
        raise ValueError(
            f"GAP_FILL: bucket_width unit {unit!r} is not fixed-width "
            f"(supported: {', '.join(_MICROS)})"
        )
    if n <= 0:
        raise ValueError("GAP_FILL: bucket_width must be positive")
    return n * _MICROS[u]


def gap_fill(
    df: DataFrame,
    ts_col: str,
    width_us: int,
    partition_cols: list[str],
    value_cols: list[tuple[str, str]],
    origin_us: int = 0,
) -> DataFrame:
    """Fill gaps in ``df``'s time series; see module docstring.

    Output columns: ``partition_cols + [ts_col] + value column per
    entry in value_cols`` (BigQuery's output shape)."""
    for c, m in value_cols:
        if m not in _METHODS:
            raise ValueError(
                f"GAP_FILL: unknown fill method {m!r} for column "
                f"{c!r} (have: {', '.join(_METHODS)})"
            )
        if c not in df.columns:
            raise ValueError(f"GAP_FILL: no value column {c!r}")
    for c in [ts_col, *partition_cols]:
        if c not in df.columns:
            raise ValueError(f"GAP_FILL: no column {c!r}")

    # r13 opt (guide §2.4 remove shuffles outright, §1.1 one corpus
    # pass suffices): the DataFrame-API form consumed ``src`` twice
    # (bounds aggregate + grid join) and Catalyst inlined TWO copies of
    # the whole input subquery — the sf0.1 profile showed the orders
    # scan + input aggregate executing twice — and the countDistinct
    # duplicate check cost a second full exchange + two extra agg
    # passes. This SQL form:
    #   * pins the projected source in a RAND()-bearing CTE (the
    #     proven TF-IDF pattern: InlineCTE keeps nondeterministic CTEs
    #     as one plan, so the input subquery executes ONCE),
    #   * DISTRIBUTE BY the partitioning columns inside that CTE, so
    #     the bounds aggregate, the grid⋈src join and the fill windows
    #     all ride ONE hash(parts) exchange (HashPartitioning(parts)
    #     satisfies every downstream distribution requirement),
    #   * replaces the countDistinct duplicate-timestamp check with a
    #     LAG over the fill windows' EXISTING sort — same loud refusal,
    #     zero extra exchanges or agg passes.
    # Scale shape unchanged: grids expand inside tasks, no driver
    # collect, and per-series locality was already required by the
    # fill windows, so hash(parts) adds no new skew exposure (the
    # MAX_BUCKETS guard still bounds any one series' grid).
    global _GF_SEQ
    _GF_SEQ += 1
    view = f"__gap_fill_in_{_GF_SEQ}"
    df.createOrReplaceTempView(view)

    def q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    parts_sql = ", ".join(q(c) for c in partition_cols)
    parts_pfx = parts_sql + ", " if partition_cols else ""
    pb = f"PARTITION BY {parts_sql} " if partition_cols else ""
    dist = f" DISTRIBUTE BY {parts_sql}" if partition_cols else ""
    m = f"UNIX_MICROS(CAST({q(ts_col)} AS TIMESTAMP))"
    vals_sql = ", ".join(q(c) for c, _ in value_cols)
    vals_pfx = ", " + vals_sql if value_cols else ""
    grid_guard = (
        f"IF((MAX(__gf_b) - MIN(__gf_b)) / {width_us} >= "
        f"{MAX_BUCKETS_PER_PARTITION}, CAST(RAISE_ERROR("
        f"'GAP_FILL: a partition''s grid exceeds "
        f"{MAX_BUCKETS_PER_PARTITION} buckets — use a coarser "
        f"bucket_width or finer partitioning_columns') AS BIGINT), "
        f"MAX(__gf_b))"
    )
    wback = (
        f"OVER ({pb}ORDER BY __gf_b "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    wfwd = (
        f"OVER ({pb}ORDER BY __gf_b "
        f"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )

    # window pass: every window expression in ONE Window node (shared
    # partitioning + ordering); arithmetic happens in the outer select.
    win_items = [f"LAG(__gf_b) OVER ({pb}ORDER BY __gf_b) AS __gf_dup"]
    out_items = []
    for i, (c, method) in enumerate(value_cols):
        if method == "null":
            out_items.append(q(c))
        elif method == "locf":
            win_items.append(f"LAST({q(c)}, TRUE) {wback} AS __gf_f{i}")
            out_items.append(f"__gf_f{i} AS {q(c)}")
        else:  # linear
            obs = (
                f"CASE WHEN {q(c)} IS NOT NULL THEN STRUCT("
                f"__gf_b AS t, CAST({q(c)} AS DOUBLE) AS v) END"
            )
            win_items.append(f"LAST({obs}, TRUE) {wback} AS __gf_p{i}")
            win_items.append(f"FIRST({obs}, TRUE) {wfwd} AS __gf_n{i}")
            out_items.append(
                f"CASE WHEN {q(c)} IS NOT NULL THEN CAST({q(c)} AS DOUBLE) "
                f"WHEN __gf_p{i} IS NOT NULL AND __gf_n{i} IS NOT NULL "
                f"THEN __gf_p{i}.v + (__gf_n{i}.v - __gf_p{i}.v) * "
                f"((__gf_b - __gf_p{i}.t) / (__gf_n{i}.t - __gf_p{i}.t)) "
                f"END AS {q(c)}"
            )

    ts_out = (
        f"IF(__gf_dup = __gf_b, CAST(RAISE_ERROR('GAP_FILL: duplicate "
        f"bucketized timestamps within a partition — aggregate the "
        f"series to the bucket grid first') AS TIMESTAMP), "
        f"TIMESTAMP_MICROS(__gf_b)) AS {q(ts_col)}"
    )

    sql = (
        # The pin is a constant-true nondeterministic FILTER, not a
        # junk column: InlineCTE keeps the CTE (planned once) either
        # way, but a junk RAND() column gets column-pruned via a
        # Project placed ABOVE the DISTRIBUTE BY, and then Spark's
        # ReplaceCTERefWithRepartition no longer sees a repartition at
        # the CTE top and wraps the whole thing in its own round-robin
        # exchange — destroying the hash(parts) partitioning every
        # consumer needs (measured: the bounds aggregate re-exchanged).
        # With the filter form the RepartitionByExpression stays the
        # top node, the rule adds nothing, and bounds/join/windows all
        # ride this one exchange.
        # PIN INVARIANT (r14, VERDICT r13): the nondeterministic pin is
        # a predicate/projection-pushdown BARRIER. Every consumer of
        # __gf_src (bounds, grid join, windows) reads the WHOLE CTE —
        # re-check before composing a FILTERED consumer onto it, or the
        # pin forces a full scan at scale. Lint:
        # tests/test_plan_shapes.py::test_pinned_cte_exchange_reuse.
        f"WITH __gf_src AS (SELECT {parts_pfx}"
        # floor to the grid: pmod keeps the floor correct left of origin
        f"({m} - PMOD({m} - {origin_us}, {width_us})) AS __gf_b"
        f"{vals_pfx} FROM {view} WHERE RAND() >= -1{dist}), "
        f"__gf_bounds AS (SELECT {parts_pfx}MIN(__gf_b) AS __gf_lo, "
        f"{grid_guard} AS __gf_hi FROM __gf_src"
        + (f" GROUP BY {parts_sql}" if partition_cols else "")
        + "), "
        f"__gf_grid AS (SELECT {parts_pfx}"
        f"EXPLODE(SEQUENCE(__gf_lo, __gf_hi, {width_us})) AS __gf_b "
        f"FROM __gf_bounds), "
        f"__gf_j AS (SELECT {parts_pfx}__gf_b{vals_pfx} FROM __gf_grid "
        f"LEFT JOIN __gf_src USING ({parts_pfx}__gf_b)), "
        f"__gf_w AS (SELECT {parts_pfx}__gf_b{vals_pfx}, "
        + ", ".join(win_items)
        + " FROM __gf_j) "
        f"SELECT {parts_pfx}{ts_out}"
        + (", " + ", ".join(out_items) if out_items else "")
        + " FROM __gf_w"
    )
    return df.sparkSession.sql(sql)
