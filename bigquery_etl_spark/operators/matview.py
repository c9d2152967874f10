"""Materialized views over the versioned lake: restricted-aggregate
views persisted as VersionedTables, incrementally maintained off the
base table's change feed, and served through transparent query rewrite.

BigQuery parity (the reference delegates ALL its analytics to BigQuery,
main.py:160-185, so its users lean on BigQuery materialized views for
exactly this): ``CREATE MATERIALIZED VIEW`` over a single table with
SUM/COUNT/AVG/MIN/MAX + GROUP BY, auto-refreshed by the engine, and
*smart rewrite* — an aggregate query over the base table is silently
answered from the view when every requested measure is derivable,
including roll-ups to a coarser grouping.

Scale design (100 TB):
- The view state is sized by |groups|, never by history. Maintenance
  folds one change batch per commit: O(batch + touched groups) for
  additive measures (SUM/COUNT/AVG — the retraction-aware signed fold
  of ``incremental_agg.apply_change_feed``), O(touched groups' rows)
  when MIN/MAX are present (deleting a group's current minimum cannot
  be maintained without re-reading that group — so only the touched
  groups are recomputed, via one semi-join against the new snapshot;
  the untouched state is carried over by an anti-join, both shuffles
  sized by the change batch's key set).
- Rewrite answers from |groups| rows instead of re-scanning the fact
  table — the entire point of BigQuery's smart rewrite at warehouse
  scale.
- Exactness: additive maintenance is retraction-based; give SUM/AVG
  inputs exact types (decimal/int — ``plans/_util.dec``), as float
  retraction drift accumulates across ticks and never cancels
  (same contract as ``apply_change_feed``).

State layout per view (one VersionedTable — the view itself has
versions, time travel, and OCC for free):
    <group keys...>,
    ``__mv_n``                 bigint   COUNT(*) per group
    per SUM(x)  AS s:  ``s`` (NULL when no non-NULL input survives),
                       ``s__nn`` bigint (count of non-NULL inputs)
    per COUNT(x) AS c / AVG(x) AS a: one hidden sum entry
                       ``<out>__agg`` + ``<out>__agg__nn``
                       (count = the companion; avg = sum/companion)
    per MIN/MAX AS m:  ``m`` directly
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADDITIVE = ("sum", "count", "count_star", "avg")
_FNS = ("sum", "count", "avg", "min", "max")


@dataclass
class MVSpec:
    """Parsed restricted aggregate: ``SELECT <keys & aggs> FROM <one
    table> [WHERE <row pred>] GROUP BY <bare cols>``."""

    table: str
    keys: list[str]  # GROUP BY columns (all stored as state keys)
    measures: list[tuple[str, str, str]]  # (out, fn, expr); expr "" for count_star
    where: str | None
    select_order: list[tuple[str, str]] = field(default_factory=list)
    # ("key", col) | ("agg", out) in original select-list order

    @property
    def additive(self) -> bool:
        return all(fn in _ADDITIVE for _, fn, _ in self.measures)


def _norm(expr: str | None) -> str | None:
    """Textual normalization for expr/predicate matching: lowercase,
    collapsed whitespace. Rewrite matching is *syntactic* — BigQuery's
    is too — so `price` matches `PRICE` but not `0+price`."""
    if expr is None:
        return None
    return " ".join(expr.lower().split())


def try_parse_aggregate(sql: str) -> MVSpec | None:
    """Parse the restricted single-table aggregate grammar; None when
    the text is anything else (callers fall through to plain SQL).
    Literal-aware: keyword splits use the catalog's quote/paren scanner
    so predicates containing 'GROUP BY' in a string parse whole."""
    from bigquery_etl_spark.sources.lake_sql import (
        _split_top_level,
        _top_level_find,
    )

    text = sql.strip().rstrip(";").strip()
    if not re.match(r"(?is)^SELECT\b", text):
        return None
    body = text[6:]
    froms = _top_level_find(body, r"\bFROM\b")
    groups = _top_level_find(body, r"\bGROUP\s+BY\b")
    if len(froms) != 1 or len(groups) != 1 or groups[0] < froms[0]:
        return None
    wheres = [i for i in _top_level_find(body, r"\bWHERE\b") if i > froms[0]]
    if len(wheres) > 1:
        return None
    select_txt = body[: froms[0]]
    from_end = wheres[0] if wheres else groups[0]
    if wheres and wheres[0] > groups[0]:
        return None
    table_txt = body[froms[0] + 4 : from_end].strip()
    where_txt = body[wheres[0] + 5 : groups[0]].strip() if wheres else None
    gm = re.match(r"(?is)^GROUP\s+BY", body[groups[0] :])
    group_txt = body[groups[0] + gm.end() :]
    if not re.match(r"(?s)^[\w.]+$", table_txt):
        return None  # joins, subqueries, time travel → not this grammar

    keys: list[str] = []
    for part in _split_top_level(group_txt):
        if not re.match(r"^\s*\w+\s*$", part):
            return None  # expression keys / HAVING / ORDER BY tails
        keys.append(part.strip())
    if not keys:
        return None

    measures: list[tuple[str, str, str]] = []
    order: list[tuple[str, str]] = []
    for item in _split_top_level(select_txt):
        item = item.strip()
        if re.match(r"^\w+$", item):
            if item not in keys:
                return None  # bare non-key column: not a valid aggregate
            order.append(("key", item))
            continue
        am = re.match(
            r"(?is)^(SUM|COUNT|AVG|MIN|MAX)\s*\((.*)\)\s+AS\s+(\w+)$", item
        )
        if not am:
            return None
        fn, expr, out = am.group(1).lower(), am.group(2).strip(), am.group(3)
        if re.match(r"(?is)^\s*DISTINCT\b", expr):
            return None  # COUNT(DISTINCT) is not mergeable under roll-up
        if fn == "count" and expr == "*":
            fn, expr = "count_star", ""
        measures.append((out, fn, expr))
        order.append(("agg", out))
    if not measures:
        return None
    return MVSpec(
        table=table_txt, keys=keys, measures=measures,
        where=where_txt or None, select_order=order,
    )


def _sum_entries(spec: MVSpec) -> dict[str, str]:
    """State sum-entry name -> input expression. Every additive measure
    is ONE entry: sum presents the value, count presents the ``__nn``
    companion, avg presents value/companion."""
    entries: dict[str, str] = {}
    for out, fn, expr in spec.measures:
        if fn == "sum":
            entries[out] = expr
        elif fn in ("count", "avg"):
            entries[f"{out}__agg"] = expr
    return entries


def full_compute(df: DataFrame, spec: MVSpec) -> DataFrame:
    """Aggregate a snapshot into the state layout — used at CREATE, and
    per touched group when MIN/MAX forces group-scoped recompute. The
    layout matches ``apply_change_feed``'s exactly (value + ``__nn``
    companion + ``__mv_n`` count), so folds and recomputes interleave
    freely."""
    if spec.where:
        df = df.filter(F.expr(spec.where))
    aggs = []
    for entry, expr in _sum_entries(spec).items():
        aggs.append(F.sum(F.expr(expr)).alias(entry))
        aggs.append(F.count(F.expr(expr)).cast("bigint").alias(f"{entry}__nn"))
    for out, fn, expr in spec.measures:
        if fn == "min":
            aggs.append(F.min(F.expr(expr)).alias(out))
        elif fn == "max":
            aggs.append(F.max(F.expr(expr)).alias(out))
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("__mv_n"))
    return df.groupBy(*spec.keys).agg(*aggs)


def present(state: DataFrame, spec: MVSpec) -> DataFrame:
    """Surface the user-facing view columns from the state table, in
    original select-list order."""
    by_out = {out: (fn, expr) for out, fn, expr in spec.measures}
    cols = []
    for kind, name in spec.select_order:
        if kind == "key":
            cols.append(F.col(name))
            continue
        fn, _ = by_out[name]
        if fn == "sum":
            cols.append(F.col(name))  # stored NULL-ified already
        elif fn == "count":
            cols.append(F.col(f"{name}__agg__nn").alias(name))
        elif fn == "count_star":
            cols.append(F.col("__mv_n").alias(name))
        elif fn == "avg":
            s, c = F.col(f"{name}__agg"), F.col(f"{name}__agg__nn")
            cols.append(F.when(c > 0, s.cast("double") / c).alias(name))
        else:  # min / max
            cols.append(F.col(name))
    return state.select(*cols)


def fold_changes(state: DataFrame, changes: DataFrame, spec: MVSpec) -> DataFrame:
    """Additive maintenance: one retraction-aware signed fold
    (``apply_change_feed``) over the change batch — O(batch + touched
    groups), never O(table). The view's WHERE applies row-level to each
    change image (a pre-image that passed the predicate retracts; a
    post-image that passes adds; images failing it never touch the
    state — exactly the filtered view's delta)."""
    from bigquery_etl_spark.operators.incremental_agg import apply_change_feed

    assert spec.additive
    if spec.where:
        changes = changes.filter(F.expr(spec.where))
    sums: dict[str, str] = {}
    for entry, expr in _sum_entries(spec).items():
        changes = changes.withColumn(f"__in_{entry}", F.expr(expr))
        sums[entry] = f"__in_{entry}"
    return apply_change_feed(state, changes, spec.keys, sums, count_col="__mv_n")


def scoped_recompute(
    state: DataFrame, snapshot: DataFrame, changes: DataFrame, spec: MVSpec
) -> DataFrame:
    """MIN/MAX maintenance: recompute ONLY the groups the change batch
    touched, from the new snapshot (retracting a group's current
    extremum requires re-reading that group — there is no cheaper
    correct fold). Untouched groups carry over via an anti-join. Both
    joins key-shuffle on the touched key set, sized by the batch."""
    if spec.where:
        changes = changes.filter(F.expr(spec.where))
    touched = changes.select(*spec.keys).distinct()
    snap_cond = [snapshot[k].eqNullSafe(touched[k]) for k in spec.keys]
    recomputed = full_compute(snapshot.join(touched, snap_cond, "semi"), spec)
    state_cond = [state[k].eqNullSafe(touched[k]) for k in spec.keys]
    untouched = state.join(touched, state_cond, "left_anti")
    return untouched.unionByName(recomputed)


@dataclass
class MaterializedView:
    name: str
    spec: MVSpec
    state: "object"  # VersionedTable
    applied_version: int
    hits: int = 0  # rewrite serve count (testability / DESCRIBE)


def advance(mv: MaterializedView, base_tbl) -> bool:
    """Bring ``mv`` up to the base table's latest version through the
    change feed. Returns True if any maintenance ran. Multi-version
    gaps fold as one unioned batch (signed folds commute; scoped
    recomputes read the final snapshot — both order-insensitive)."""
    new_v = base_tbl.latest_version()
    if new_v is None or mv.applied_version >= new_v:
        return False
    ch = base_tbl.changes(mv.applied_version + 1, new_v)
    sv = mv.state.latest_version()
    state = mv.state.read(version=sv)
    if mv.spec.additive:
        new_state = fold_changes(state, ch, mv.spec)
    else:
        new_state = scoped_recompute(
            state, base_tbl.read(version=new_v), ch, mv.spec
        )
    mv.state.overwrite(new_state, expected_base=sv)
    mv.applied_version = new_v
    return True


def derive_rewrite(mv: MaterializedView, q: MVSpec) -> DataFrame | None:
    """BigQuery-style smart rewrite: answer aggregate query ``q`` from
    ``mv``'s state when every measure is derivable — same measures at
    the same or coarser grouping (roll-up re-aggregates the mergeable
    state: SUM of sums, SUM of counts, MIN of mins, sum/count for avg).
    Returns None when not derivable (caller falls through to the base
    table). WHERE handling: textual match with the view's predicate, or
    a residual predicate over the view's GROUP BY keys alone (appliable
    on top of the state)."""
    spec = mv.spec
    if not set(q.keys) <= set(spec.keys):
        return None
    residual = None
    if _norm(q.where) != _norm(spec.where):
        if spec.where is not None or q.where is None:
            return None
        # view has no predicate; the query's may apply over keys only
        if not _refs_only(q.where, spec.keys):
            return None
        residual = q.where

    mv_by_fn_expr = {
        (fn, _norm(expr)): out for out, fn, expr in spec.measures
    }
    sum_sources = {  # normalized expr -> (sum col, nn col) in state
        _norm(expr): (entry, f"{entry}__nn")
        for entry, expr in _sum_entries(spec).items()
    }
    aggs: dict[str, F.Column] = {}
    for out, fn, expr in q.measures:
        ne = _norm(expr)
        if fn == "count_star":
            aggs[out] = F.sum("__mv_n").cast("bigint").alias(out)
        elif fn == "sum":
            # every additive entry stores SUM(expr) — a view declaring
            # only COUNT(x) or AVG(x) still derives SUM(x)
            src = sum_sources.get(ne)
            if src is None:
                return None
            aggs[out] = F.sum(src[0]).alias(out)
        elif fn == "count":
            src = sum_sources.get(ne)
            if src is None:
                return None
            aggs[out] = F.sum(src[1]).cast("bigint").alias(out)
        elif fn == "avg":
            src = sum_sources.get(ne)
            if src is None:
                return None
            s, c = F.sum(src[0]), F.sum(src[1])
            aggs[out] = F.when(c > 0, s.cast("double") / c).alias(out)
        else:  # min / max
            hit = mv_by_fn_expr.get((fn, ne))
            if hit is None:
                return None
            aggs[out] = (F.min(hit) if fn == "min" else F.max(hit)).alias(out)

    base = mv.state.read()
    if residual:
        base = base.filter(F.expr(residual))
    agged = base.groupBy(*q.keys).agg(*aggs.values())
    out_cols = [name for _, name in q.select_order]
    mv.hits += 1
    return agged.select(*out_cols)


def _refs_only(pred: str, allowed: list[str]) -> bool:
    """Conservative check that a predicate references only ``allowed``
    columns: every bare identifier outside string literals is either an
    allowed column, a number, or a SQL keyword/function name that can't
    be a column of the view (non-word tokens pass through)."""
    no_strings = re.sub(r"'[^']*'", "''", pred)
    kw = {
        "and", "or", "not", "in", "is", "null", "true", "false", "between",
        "like", "case", "when", "then", "else", "end", "cast", "as",
    }
    for tok in re.findall(r"[A-Za-z_]\w*", no_strings):
        if tok.lower() in kw or tok in allowed:
            continue
        return False
    return True
