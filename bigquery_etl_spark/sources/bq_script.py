"""BigQuery procedural scripting on the lake catalog (r6).

The reference's users don't only run single statements — BigQuery
scripts (DECLARE/SET variables, IF/WHILE/LOOP control flow, EXECUTE
IMMEDIATE) are the delegated engine's orchestration layer, and the
reference's own Python loop (main.py:197-216) is exactly the kind of
logic a warehouse-side script replaces. ``LakeCatalog.script(text)``
runs a multi-statement script where every leaf statement goes through
``bq_sql`` — so the dialect shim, lake DML, materialized-view rewrite,
wildcard tables and QUALIFY all compose inside scripts.

Semantics (the BigQuery scripting subset):
- ``DECLARE name [, name...] [type] [DEFAULT expr];`` — variables are
  script-scoped; DEFAULT evaluates via one scalar SELECT (which may
  itself be a subquery over tables).
- ``SET name = expr;`` — re-evaluates; scalar subqueries allowed.
- ``IF cond THEN … [ELSEIF cond THEN …] [ELSE …] END IF;``
- ``WHILE cond DO … END WHILE;`` / ``LOOP … END LOOP;`` /
  ``REPEAT … UNTIL cond END REPEAT;`` (post-condition, r8) with
  ``BREAK``/``LEAVE`` and ``CONTINUE``/``ITERATE``.
- ``EXECUTE IMMEDIATE <string expr> [INTO var[, var...]] [USING expr
  [AS name], ...];`` (r7) — ``?`` placeholders bind positionally and
  ``@name`` by name, values rendered as SQL literals; placeholders
  inside string literals of the dynamic SQL are data, not parameters
  (island-aware scan). INTO with multiple variables takes the first
  row's columns in order.
- ``CREATE [OR REPLACE] TEMP TABLE name AS select;`` (r7) — a REAL
  versioned table in a scratch dir, registered in the catalog so later
  statements (including DML) compose through the full machinery;
  script-scoped: dropped when the script ends (BigQuery temp tables
  are session-scoped — a script IS our session unit), with the final
  result eagerly checkpointed so it survives the cleanup.
- ``FOR var IN (query) DO … END FOR;`` — the query materializes once
  (one distributed job); the body sees ``var.field`` per row.
- ``BEGIN … [EXCEPTION WHEN ERROR THEN …] END;`` with
  ``@@error.message`` bound in the handler; ``RAISE [USING MESSAGE =
  expr]`` raises (bare RAISE re-raises inside a handler).
- ``CREATE [OR REPLACE] PROCEDURE name(IN/OUT/INOUT p [type], …)
  BEGIN … END;`` + ``CALL name(args);`` — fresh scope per call, OUT/
  INOUT copy back to caller variables.
- Variable references are BARE NAMES (BigQuery scripting style),
  substituted literal-aware at word boundaries into each statement
  before execution; values render as SQL literals (None → NULL,
  strings quoted+escaped, bools TRUE/FALSE).
- The script's result is the LAST statement's DataFrame (BigQuery
  returns the final result set the same way).

Driver-side control flow is the right execution model here: conditions
and variables are scalars (one-row SELECTs), while every data-moving
statement stays a full distributed Spark job — the loop never iterates
per row. A total-statement cap (100k) bounds runaway loops.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MAX_STEPS = 100_000


class ScriptError(ValueError):
    pass


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


@dataclass
class _If:
    arms: list  # [(cond, [nodes])]
    orelse: list


@dataclass
class _While:
    cond: str | None  # None = bare LOOP
    body: list


@dataclass
class _Repeat:
    """``REPEAT … UNTIL cond END REPEAT`` — post-condition loop (the
    body always runs at least once; the loop exits when cond turns
    TRUE)."""

    body: list
    until: str


@dataclass
class _For:
    """``FOR var IN (query) DO … END FOR`` — the query materializes
    ONCE (one distributed job), then the body runs per result row with
    ``var.field`` references substituted. The driver-side iteration is
    bounded by MAX_STEPS like every other statement; a FOR over a
    billion-row query is a misuse of the construct (BigQuery's docs say
    the same) — the per-row work belongs in the query itself."""

    var: str
    query: str
    body: list


@dataclass
class _Try:
    """``BEGIN … [EXCEPTION WHEN ERROR THEN …] END``. On error the
    handler runs with ``@@error.message`` bound (BigQuery's system
    variable); without a handler the block is just a scope marker."""

    body: list
    handler: list | None


@dataclass
class _ProcDef:
    """``CREATE [OR REPLACE] PROCEDURE name(params) BEGIN … END``.
    The body is parsed at definition and stored on the catalog
    (``catalog.procedures``); CALL binds arguments into a fresh scope
    and copies OUT params back to caller variables."""

    name: str
    replace: bool
    params: list  # [(mode, name)] — mode in {"in", "out", "inout"}
    body: list


def _split_statements(text: str) -> list[str]:
    from bigquery_etl_spark.sources.lake_sql import _split_top_level

    return [s for s in _split_top_level(text, sep=";") if s.strip()]


def _parse(stmts: list[str], i: int, until: tuple[str, ...]):
    """Recursive descent over the ';'-split statement list (which is
    mutated in place to re-inject inline block bodies — ``IF c THEN
    stmt`` puts ``stmt`` back into the stream so nested openers parse
    normally). Returns (nodes, index_of_terminator, terminator_text);
    terminator is None at end-of-script."""
    nodes: list = []
    while i < len(stmts):
        s = stmts[i].strip()
        up = " ".join(s.upper().split())
        if any(up == t or up.startswith(t + " ") for t in until):
            return nodes, i, s
        m = re.match(r"(?is)^IF\s+(.*?)\s+THEN\s*(.*)$", s)
        if m:
            if m.group(2).strip():
                stmts[i] = m.group(2)  # inline first body statement
                node, i = _parse_if(m.group(1), stmts, i)
            else:
                node, i = _parse_if(m.group(1), stmts, i + 1)
            nodes.append(node)
            continue
        m = re.match(r"(?is)^WHILE\s+(.*?)\s+DO\s*(.*)$", s)
        if m:
            j = i
            if m.group(2).strip():
                stmts[i] = m.group(2)
            else:
                j = i + 1
            body, j, _ = _parse(stmts, j, ("END WHILE",))
            nodes.append(_While(cond=m.group(1), body=body))
            i = j + 1
            continue
        m = re.match(r"(?is)^LOOP\b\s*(.*)$", s)
        if m:
            j = i
            if m.group(1).strip():
                stmts[i] = m.group(1)
            else:
                j = i + 1
            body, j, _ = _parse(stmts, j, ("END LOOP",))
            nodes.append(_While(cond=None, body=body))
            i = j + 1
            continue
        m = re.match(r"(?is)^REPEAT\b\s*(.*)$", s)
        if m:
            j = i
            if m.group(1).strip():
                stmts[i] = m.group(1)
            else:
                j = i + 1
            body, j, term = _parse(stmts, j, ("UNTIL",))
            um = re.match(
                r"(?is)^UNTIL\s+(.*?)\s+END\s+REPEAT\s*$",
                " ".join((term or "").split()),
            )
            if not um:
                raise ScriptError(
                    f"REPEAT needs 'UNTIL cond END REPEAT', got {term!r}"
                )
            nodes.append(_Repeat(body=body, until=um.group(1)))
            i = j + 1
            continue
        m = re.match(r"(?is)^FOR\s+(\w+)\s+IN\s*\(", s)
        if m:
            from bigquery_etl_spark.sources.lake_sql import _matching_paren

            open_idx = s.index("(", m.end() - 1)
            close = _matching_paren(s, open_idx)
            query = s[open_idx + 1 : close]
            rest = s[close + 1 :].strip()
            dm = re.match(r"(?is)^DO\s*(.*)$", rest)
            if not dm:
                raise ScriptError(f"FOR without DO: {s!r}")
            j = i
            if dm.group(1).strip():
                stmts[i] = dm.group(1)
            else:
                j = i + 1
            body, j, _ = _parse(stmts, j, ("END FOR",))
            nodes.append(_For(var=m.group(1), query=query, body=body))
            i = j + 1
            continue
        m = re.match(r"(?is)^BEGIN\b\s*(.*)$", s)
        if m and not re.match(r"(?is)^BEGIN\s+TRANSACTION\b", s):
            j = i
            if m.group(1).strip():
                stmts[i] = m.group(1)
            else:
                j = i + 1
            body, j, term = _parse(stmts, j, ("EXCEPTION", "END"))
            handler = None
            if term is not None and term.upper().startswith("EXCEPTION"):
                em = re.match(
                    r"(?is)^EXCEPTION\s+WHEN\s+ERROR\s+THEN\s*(.*)$", term
                )
                if not em:
                    raise ScriptError(f"bad EXCEPTION clause: {term!r}")
                if em.group(1).strip():
                    stmts[j] = em.group(1)
                else:
                    j += 1
                handler, j, _ = _parse(stmts, j, ("END",))
            nodes.append(_Try(body=body, handler=handler))
            i = j + 1
            continue
        m = re.match(
            r"(?is)^CREATE\s+(OR\s+REPLACE\s+)?PROCEDURE\s+([\w.]+)\s*\(",
            s,
        )
        if m:
            from bigquery_etl_spark.sources.lake_sql import (
                _matching_paren,
                _split_top_level,
            )

            open_idx = s.index("(", m.end() - 1)
            close = _matching_paren(s, open_idx)
            params = []
            for part in _split_top_level(s[open_idx + 1 : close]):
                if not part.strip():
                    continue
                pm = re.match(
                    r"(?is)^\s*(?:(IN|OUT|INOUT)\s+)?(\w+)(?:\s+\S.*)?$", part
                )
                if not pm:
                    raise ScriptError(f"bad procedure parameter: {part!r}")
                params.append(((pm.group(1) or "in").lower(), pm.group(2)))
            rest = s[close + 1 :].strip()
            bm = re.match(r"(?is)^BEGIN\b\s*(.*)$", rest)
            if not bm:
                raise ScriptError("procedure body must be BEGIN … END")
            j = i
            if bm.group(1).strip():
                stmts[i] = bm.group(1)
            else:
                j = i + 1
            body, j, _ = _parse(stmts, j, ("END",))
            nodes.append(
                _ProcDef(
                    name=m.group(2),
                    replace=bool(m.group(1)),
                    params=params,
                    body=body,
                )
            )
            i = j + 1
            continue
        nodes.append(s)
        i += 1
    if until:
        raise ScriptError(f"script ended inside a block (expected {until})")
    return nodes, i, None


def _parse_if(cond: str, stmts: list[str], i: int):
    """Parse IF arms from ``stmts[i:]`` until the matching END IF.
    ELSEIF/ELSE terminators with inline bodies are re-injected the
    same way the openers are."""
    arms: list = []
    orelse: list = []
    cur: list = []
    cur_cond: str | None = cond
    in_else = False
    while True:
        sub, i, term = _parse(stmts, i, ("ELSEIF", "ELSE", "END IF"))
        cur.extend(sub)
        up = " ".join(term.upper().split())
        if up.startswith("ELSEIF"):
            if in_else:
                raise ScriptError("ELSEIF after ELSE")
            arms.append((cur_cond, cur))
            m = re.match(r"(?is)^ELSEIF\s+(.*?)\s+THEN\s*(.*)$", term)
            if not m:
                raise ScriptError(f"bad ELSEIF: {term!r}")
            cur_cond, cur = m.group(1), []
            if m.group(2).strip():
                stmts[i] = m.group(2)
            else:
                i += 1
        elif up == "ELSE" or up.startswith("ELSE "):
            if in_else:
                raise ScriptError("duplicate ELSE")
            arms.append((cur_cond, cur))
            cur, in_else, cur_cond = [], True, None
            rest = term[4:].strip()
            if rest:
                stmts[i] = rest
            else:
                i += 1
        else:  # END IF
            if in_else:
                orelse = cur
            else:
                arms.append((cur_cond, cur))
            return _If(arms=arms, orelse=orelse), i + 1


def _sql_literal(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # the D suffix keeps the literal DOUBLE: Spark types a bare
        # `55.0` as DECIMAL(3,1), so a FLOAT64 variable re-entering a
        # statement would silently change type (BigQuery floats stay
        # FLOAT64). Non-finite values need the cast spelling.
        import math

        if math.isfinite(v):
            return f"{v!r}D"
        return f"CAST('{'NaN' if math.isnan(v) else ('Infinity' if v > 0 else '-Infinity')}' AS DOUBLE)"
    if isinstance(v, int):
        return repr(v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)  # exact decimal stays DECIMAL (BigQuery NUMERIC)
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    # Quotes escape by DOUBLING ('' — SQL standard, Spark accepts it):
    # a backslash escape (\') would desynchronize every textual scanner
    # in the pipeline (_map_literal_aware/_split_top_level/_call_sites
    # treat any bare ' as the literal terminator), so O'Brien would
    # break all later dialect rewrites of the statement.
    s = str(v).replace("\\", "\\\\").replace("'", "''")
    return f"'{s}'"


def _substitute(text: str, env: dict) -> str:
    """Replace bare variable names with their current values as SQL
    literals — word-boundary, outside string literals, and never
    immediately after ``AS`` (an output alias that happens to share a
    variable's name must stay an alias). Row-valued variables (FOR
    loop vars) substitute via ``var.field``; ``@@error.message`` is
    the BigQuery system variable, bound inside EXCEPTION handlers.
    Variables therefore SHADOW like-named table columns inside queries
    — the one divergence from BigQuery's resolution order (columns win
    there); don't name script variables after columns."""
    if not env:
        return text
    from bigquery_etl_spark.sources.bq_dialect import _map_literal_aware

    names = [re.escape(k) for k in env if not k.startswith("@")]
    pat = r"@@error\.message"
    if names:
        pat += r"|\b(" + "|".join(names) + r")(\.\w+)?\b"
    rx = re.compile(r"(" + pat + r")", re.IGNORECASE)
    lower_env = {k.lower(): v for k, v in env.items()}

    def seg(s: str) -> str:
        def repl(m: re.Match) -> str:
            whole = m.group(1)
            if whole.lower() == "@@error.message":
                return _sql_literal(lower_env.get("@@error"))
            if re.search(r"(?i)\bAS\s*$", s[: m.start()]):
                return whole  # alias position, keep the name
            val = lower_env[m.group(2).lower()]
            field = (m.group(3) or "").lstrip(".")
            if isinstance(val, dict):
                if not field:
                    return whole  # row var used bare: leave for SQL to reject
                if field.lower() not in val:
                    raise ScriptError(
                        f"row variable {m.group(2)!r} has no field {field!r}"
                    )
                return _sql_literal(val[field.lower()])
            if field:
                return whole  # scalar.field is a table.column reference
            return _sql_literal(val)

        return rx.sub(repl, s)

    return _map_literal_aware(text, seg)


class ScriptRunner:
    def __init__(self, catalog):
        self.cat = catalog
        self.env: dict = {}
        self.steps = 0
        self.last = None

    def _tick(self):
        self.steps += 1
        if self.steps > MAX_STEPS:
            raise ScriptError(f"script exceeded {MAX_STEPS} statements")

    def _scalar(self, expr: str):
        self._tick()
        df = self.cat.bq_sql(f"SELECT ({_substitute(expr, self.env)}) AS __v")
        return df.collect()[0][0]

    def run(self, text: str):
        nodes, _, _ = _parse(_split_statements(text), 0, ())
        self._temp_tables: list[str] = []
        try:
            self._exec(nodes)
            if self._temp_tables and hasattr(self.last, "localCheckpoint"):
                # the script's RESULT may lazily read a temp table the
                # cleanup below deletes — pin the blocks now (eager
                # checkpoint severs the lineage from the files)
                self.last = self.last.localCheckpoint(eager=True)
        finally:
            # TEMP TABLEs are script-scoped (BigQuery: session-scoped;
            # a script IS our session unit): deregister + remove
            import shutil

            for name in self._temp_tables:
                tbl = self.cat.tables.pop(name, None)
                if tbl is not None:
                    shutil.rmtree(tbl.root, ignore_errors=True)
                # also drop the Spark temp view _register_views created
                # for statements inside the script — a stale view over
                # deleted files must not shadow the name
                try:
                    self.cat.spark.catalog.dropTempView(name)
                except Exception:  # noqa: BLE001 — view may not exist
                    pass
        return self.last

    def _exec(self, nodes: list):
        for n in nodes:
            if isinstance(n, _If):
                done = False
                for cond, body in n.arms:
                    if bool(self._scalar(cond)):
                        self._exec(body)
                        done = True
                        break
                if not done:
                    self._exec(n.orelse)
                continue
            if isinstance(n, _While):
                while n.cond is None or bool(self._scalar(n.cond)):
                    try:
                        self._exec(n.body)
                    except _Break:
                        break
                    except _Continue:
                        continue
                continue
            if isinstance(n, _Repeat):
                while True:
                    try:
                        self._exec(n.body)
                    except _Break:
                        break
                    except _Continue:
                        pass
                    if bool(self._scalar(n.until)):
                        break
                continue
            if isinstance(n, _For):
                self._tick()
                rows = self.cat.bq_sql(
                    _substitute(n.query, self.env)
                ).collect()
                shadowed = self.env.get(n.var.lower())
                try:
                    for row in rows:
                        self.env[n.var.lower()] = {
                            k.lower(): v for k, v in row.asDict().items()
                        }
                        try:
                            self._exec(n.body)
                        except _Continue:
                            continue
                except _Break:
                    pass
                finally:
                    if shadowed is not None:
                        self.env[n.var.lower()] = shadowed
                    else:
                        self.env.pop(n.var.lower(), None)
                continue
            if isinstance(n, _Try):
                if n.handler is None:
                    self._exec(n.body)
                else:
                    try:
                        self._exec(n.body)
                    except (_Break, _Continue):
                        raise
                    except Exception as e:  # noqa: BLE001 — BigQuery
                        # EXCEPTION WHEN ERROR catches ANY statement
                        # error; the handler decides what to do with it
                        self.env["@@error"] = str(e)
                        self._exec(n.handler)
                continue
            if isinstance(n, _ProcDef):
                procs = getattr(self.cat, "procedures", None)
                if procs is None:
                    procs = self.cat.procedures = {}
                if n.name.lower() in procs and not n.replace:
                    raise ScriptError(f"procedure {n.name!r} already exists")
                procs[n.name.lower()] = (n.params, n.body)
                continue
            self._statement(n)

    def _statement(self, s: str):
        self._tick()
        up = " ".join(s.upper().split())
        if up in ("BREAK", "LEAVE"):
            raise _Break()
        if up in ("CONTINUE", "ITERATE"):
            raise _Continue()
        m = re.match(
            r"(?is)^DECLARE\s+([\w\s,]+?)(?:\s+([A-Z0-9_<>,()]+))?"
            r"(?:\s+DEFAULT\s+(.*))?$",
            s,
        )
        if m and up.startswith("DECLARE"):
            names = [x.strip() for x in m.group(1).split(",") if x.strip()]
            default = self._scalar(m.group(3)) if m.group(3) else None
            for name in names:
                if name.lower() in self.env:
                    raise ScriptError(f"variable {name!r} already declared")
                self.env[name.lower()] = default
            return
        m = re.match(r"(?is)^SET\s+(\w+)\s*=\s*(.*)$", s)
        if m:
            name = m.group(1).lower()
            if name not in self.env:
                raise ScriptError(f"SET of undeclared variable {m.group(1)!r}")
            self.env[name] = self._scalar(m.group(2))
            return
        m = re.match(r"(?is)^RAISE(?:\s+USING\s+MESSAGE\s*=\s*(.*))?$", s)
        if m:
            if m.group(1):
                raise ScriptError(str(self._scalar(m.group(1))))
            prior = self.env.get("@@error")
            raise ScriptError(prior if prior else "RAISE outside handler")
        m = re.match(r"(?is)^CALL\s+([\w.]+)\s*\((.*)\)\s*$", s)
        if m:
            self._call(m.group(1), m.group(2))
            return
        m0 = re.match(r"(?is)^EXECUTE\s+IMMEDIATE\s+(.*)$", s)
        if m0:
            # island-aware clause split: INTO/USING inside the quoted
            # dynamic-SQL string must not end the expression
            from bigquery_etl_spark.sources.lake_sql import _top_level_find

            tail = m0.group(1)
            intos = _top_level_find(tail, r"\bINTO\b")
            usings = _top_level_find(tail, r"\bUSING\b")
            cut = min(intos + usings, default=len(tail))
            into_text = None
            using_text = None
            if intos:
                into_end = usings[0] if usings else len(tail)
                into_text = tail[intos[0] + 4 : into_end].strip()
            if usings:
                using_text = tail[usings[0] + 5 :].strip()
            sql_text = self._scalar(tail[:cut].strip())
            if not isinstance(sql_text, str):
                raise ScriptError("EXECUTE IMMEDIATE needs a string expression")
            if using_text:
                # USING expr [AS name], ... — bind ? positionally and
                # @name by name, values rendered as SQL literals
                # (BigQuery's dynamic-SQL parameter contract)
                from bigquery_etl_spark.sources.lake_sql import (
                    _skip_island,
                    _split_top_level,
                )

                positional: list = []
                named: dict[str, object] = {}
                for item in _split_top_level(using_text):
                    am = re.match(r"(?is)^(.*?)\s+AS\s+(\w+)\s*$", item)
                    if am:
                        named[am.group(2).lower()] = self._scalar(am.group(1))
                    else:
                        positional.append(self._scalar(item))
                out, i, n, pi = [], 0, len(sql_text), 0
                while i < n:
                    j = _skip_island(sql_text, i)
                    if j != i:
                        out.append(sql_text[i:j])
                        i = j
                        continue
                    c = sql_text[i]
                    if c == "?":
                        if pi >= len(positional):
                            raise ScriptError(
                                "EXECUTE IMMEDIATE: more ? placeholders "
                                "than USING values"
                            )
                        out.append(_sql_literal(positional[pi]))
                        pi += 1
                        i += 1
                        continue
                    if c == "@":
                        nm = re.match(r"@(\w+)", sql_text[i:])
                        if nm and nm.group(1).lower() in named:
                            out.append(
                                _sql_literal(named[nm.group(1).lower()])
                            )
                            i += nm.end()
                            continue
                        raise ScriptError(
                            f"EXECUTE IMMEDIATE: unbound parameter "
                            f"@{nm.group(1) if nm else ''!s}"
                        )
                    out.append(c)
                    i += 1
                if pi < len(positional):
                    raise ScriptError(
                        "EXECUTE IMMEDIATE: fewer ? placeholders than "
                        "USING values"
                    )
                sql_text = "".join(out)
            result = self.cat.bq_sql(sql_text)
            if into_text:
                names = [
                    v.strip().lower()
                    for v in into_text.split(",")
                    if v.strip()
                ]
                for nm0 in names:
                    if nm0 not in self.env:
                        raise ScriptError(f"INTO undeclared variable {nm0!r}")
                rows = result.collect() if hasattr(result, "collect") else None
                row = rows[0] if rows else None
                if row is not None and len(names) > len(row):
                    raise ScriptError(
                        f"INTO lists {len(names)} variables but the result "
                        f"has {len(row)} column(s)"
                    )
                for k, nm0 in enumerate(names):
                    self.env[nm0] = row[k] if row is not None else None
            else:
                self.last = result
            return
        m = re.match(
            r"(?is)^CREATE\s+(OR\s+REPLACE\s+)?TEMP(?:ORARY)?\s+TABLE\s+"
            r"([\w]+)\s+AS\s+(.*)$",
            s,
        )
        if m:
            # script-scoped TEMP TABLE: a REAL versioned table in a
            # scratch dir, registered in the catalog so later
            # statements (including DML) compose through the full
            # machinery; dropped when the script ends
            import shutil
            import tempfile

            name, select = m.group(2), m.group(3)
            replacing = name in self.cat.tables
            if replacing and not m.group(1):
                raise ScriptError(f"table {name!r} already exists")
            if replacing and name not in self._temp_tables:
                raise ScriptError(
                    f"CREATE OR REPLACE TEMP TABLE {name!r}: a PERMANENT "
                    "table of that name exists"
                )
            # evaluate + WRITE the select BEFORE dropping any old
            # incarnation: Spark is lazy and a self-referencing
            # `... AS SELECT ... FROM <name>` must read the old files
            df = self.cat.bq_sql(_substitute(select, self.env))
            root = tempfile.mkdtemp(prefix=f"bqs_temp_{name}_")
            from bigquery_etl_spark.sources.versioned import VersionedTable

            new_tbl = VersionedTable(self.cat.spark, root)
            new_tbl.create(df)  # materializes now, old table still live
            old = self.cat.tables.pop(name, None)
            if old is not None:
                shutil.rmtree(old.root, ignore_errors=True)
                self._temp_tables.remove(name)
            self.cat.register(name, new_tbl)
            self._temp_tables.append(name)
            return
        self.last = self.cat.bq_sql(_substitute(s, self.env))

    def _call(self, name: str, args_text: str):
        """Procedure call: IN args evaluate in the CALLER's scope, the
        body runs in a fresh scope (BigQuery procedure scoping), OUT /
        INOUT params copy back to the caller's named variables."""
        from bigquery_etl_spark.sources.lake_sql import _split_top_level

        self._tick()
        procs = getattr(self.cat, "procedures", {})
        if name.lower() not in procs:
            raise ScriptError(f"unknown procedure {name!r}")
        params, body = procs[name.lower()]
        args = [a.strip() for a in _split_top_level(args_text)] if args_text.strip() else []
        if len(args) != len(params):
            raise ScriptError(
                f"CALL {name}: {len(args)} args for {len(params)} params"
            )
        scope: dict = {}
        out_binds: list[tuple[str, str]] = []  # (param, caller var)
        for (mode, pname), arg in zip(params, args):
            if mode in ("out", "inout"):
                vm = re.match(r"^\w+$", arg)
                if not vm or arg.lower() not in self.env:
                    raise ScriptError(
                        f"CALL {name}: {mode.upper()} argument must be a "
                        f"declared variable, got {arg!r}"
                    )
                out_binds.append((pname.lower(), arg.lower()))
                scope[pname.lower()] = (
                    self.env[arg.lower()] if mode == "inout" else None
                )
            else:
                scope[pname.lower()] = self._scalar(arg)
        caller = self.env
        self.env = scope
        try:
            self._exec(body)
        finally:
            result = self.env
            self.env = caller
        for pname, var in out_binds:
            self.env[var] = result.get(pname)


def run_script(catalog, text: str):
    """Execute a BigQuery script against a LakeCatalog; returns the
    last statement's result (DataFrame for queries, version int for
    DML, etc.)."""
    return ScriptRunner(catalog).run(text)
