"""JS UDF narrow subset (r9, VERDICT r8 gap #9) — translate
side-effect-free arithmetic/string JavaScript bodies of BigQuery
``LANGUAGE js`` UDFs into SQL expressions at DDL time, so they inline
into Catalyst exactly like SQL-bodied functions (zero runtime JS, zero
Python). Everything outside the subset refuses loudly with the
offending construct named — a wrong translation would be worse than no
translation.

Supported: side-effect-free bodies over the declared parameters —
originally a single ``return <expr>;``; r12 (VERDICT r11 missing #6)
adds straight-line MULTI-STATEMENT bodies: ``var/let/const`` single-
assignment bindings (references inline the translated SQL),
``if (cond) return expr;`` chains (→ CASE WHEN), brace blocks holding
exactly one return, and undefined-fall-through → NULL. Expressions: numeric/string/boolean literals; ``+ - * / %`` (with ``+``
typed as CONCAT when either side is a string — the JS overload);
comparisons ``< <= > >= == != === !==``; ``&& || !``; the ternary
``c ? a : b``; ``Math.floor/ceil/abs/sqrt/pow/min/max/log/exp`` and
``Math.round`` (lowered to FLOOR(x+0.5), which IS the JS half-up rule
where SQL ROUND is half-away); string ``.length``, ``.toUpperCase()``,
``.toLowerCase()``, ``.trim()``, ``.substring(a, b)``, ``.charAt(i)``,
``.indexOf(s)`` (−1-based like JS); ``String(x)`` / ``Number(x)``.

r13 (VERDICT r12 item 5) widens further: straight-line REASSIGNMENT
(``x = e;`` / ``x += e;`` …) translates by sequential rebinding (each
assignment rebinds the name to the translated SQL at that program
point — faithful for straight-line code, which is all we accept);
``for`` loops with LITERAL integer bounds unroll at DDL time (the
engine's constant-fold pattern) under a 256-total-iteration budget;
``return {a: x, b: y};`` object literals lower to NAMED_STRUCT.

Refused (named in the error): unbounded/computed-bound loops,
conditional assignment (``if (c) x = e;``), ``return`` inside a loop,
unreachable code, arrays, closures/arrow functions, ``new``, regex
literals, ``.replace`` (JS replaces the FIRST match, SQL all),
``.split`` — anything whose JS semantics have no faithful
one-expression SQL form.
"""

from __future__ import annotations

import re


class JsUdfError(ValueError):
    pass


_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
      | (?P<name>[A-Za-z_$][\w$]*)
      | (?P<op>===|!==|==|!=|<=|>=|&&|\|\||[-+*/%<>!?:().,])
    )""",
    re.VERBOSE,
)

_REFUSE_WORDS = {
    "var", "let", "const", "function", "new", "for", "while", "if",
    "else", "this", "typeof", "delete", "in", "of", "class", "throw",
    "try", "catch", "switch", "do", "yield", "async", "await",
}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i, n = [], 0, len(src)
    while i < n:
        m = _TOKEN_RX.match(src, i)
        if not m:
            if src[i].isspace():
                i += 1
                continue
            raise JsUdfError(
                f"JS subset: unsupported character {src[i]!r} "
                "(objects, arrays, regex literals and template strings "
                "are outside the translatable subset)"
            )
        i = m.end()
        for kind in ("num", "str", "name", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _Parser:
    """Precedence-climbing parser producing (sql, type) pairs; type is
    'num' | 'str' | 'bool' | 'any'."""

    def __init__(self, toks, params: dict[str, str], subs=None):
        self.toks = toks
        self.i = 0
        self.params = params
        # r12: local 'var' bindings from multi-statement bodies —
        # name -> (sql, type); references inline the SQL (Catalyst
        # CSE dedups the deterministic repeats)
        self.subs = subs or {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, op):
        k, v = self.next()
        if k != "op" or v != op:
            raise JsUdfError(f"JS subset: expected {op!r}, got {v!r}")

    def parse(self):
        out = self.ternary()
        if self.i != len(self.toks):
            raise JsUdfError(
                f"JS subset: trailing tokens from {self.peek()[1]!r}"
            )
        return out

    def ternary(self):
        cond, ct = self.logic_or()
        k, v = self.peek()
        if k == "op" and v == "?":
            self.next()
            a, at = self.ternary()
            self.expect(":")
            b, bt = self.ternary()
            t = at if at == bt else "any"
            return f"CASE WHEN {cond} THEN {a} ELSE {b} END", t
        return cond, ct

    def logic_or(self):
        lhs, lt = self.logic_and()
        while self.peek() == ("op", "||"):
            self.next()
            rhs, _ = self.logic_and()
            lhs, lt = f"({lhs} OR {rhs})", "bool"
        return lhs, lt

    def logic_and(self):
        lhs, lt = self.equality()
        while self.peek() == ("op", "&&"):
            self.next()
            rhs, _ = self.equality()
            lhs, lt = f"({lhs} AND {rhs})", "bool"
        return lhs, lt

    def equality(self):
        lhs, lt = self.relational()
        while self.peek()[0] == "op" and self.peek()[1] in (
            "==", "===", "!=", "!==",
        ):
            _, op = self.next()
            rhs, _ = self.relational()
            sql_op = "=" if op in ("==", "===") else "<>"
            lhs, lt = f"({lhs} {sql_op} {rhs})", "bool"
        return lhs, lt

    def relational(self):
        lhs, lt = self.additive()
        while self.peek()[0] == "op" and self.peek()[1] in (
            "<", "<=", ">", ">=",
        ):
            _, op = self.next()
            rhs, _ = self.additive()
            lhs, lt = f"({lhs} {op} {rhs})", "bool"
        return lhs, lt

    def additive(self):
        lhs, lt = self.multiplicative()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            _, op = self.next()
            rhs, rt = self.multiplicative()
            if op == "+":
                if "str" in (lt, rt):
                    lhs, lt = f"CONCAT({lhs}, {rhs})", "str"
                elif "any" in (lt, rt):
                    raise JsUdfError(
                        "JS subset: cannot type '+' operands (numeric "
                        "add vs string concat) — add String()/Number() "
                        "around the ambiguous side"
                    )
                else:
                    lhs, lt = f"({lhs} + {rhs})", "num"
            else:
                lhs, lt = f"({lhs} - {rhs})", "num"
        return lhs, lt

    def multiplicative(self):
        lhs, lt = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            _, op = self.next()
            rhs, _ = self.unary()
            if op == "%":
                # JS % truncates toward zero — SQL's % (remainder) too
                lhs, lt = f"({lhs} % {rhs})", "num"
            else:
                lhs, lt = f"({lhs} {op} {rhs})", "num"
        return lhs, lt

    def unary(self):
        k, v = self.peek()
        if (k, v) == ("op", "!"):
            self.next()
            e, _ = self.unary()
            return f"(NOT {e})", "bool"
        if (k, v) == ("op", "-"):
            self.next()
            e, _ = self.unary()
            return f"(- {e})", "num"
        if (k, v) == ("op", "+"):
            self.next()
            return self.unary()
        return self.postfix()

    def postfix(self):
        e, t = self.primary()
        while self.peek() == ("op", "."):
            self.next()
            k, name = self.next()
            if k != "name":
                raise JsUdfError("JS subset: expected property name")
            if name == "length":
                e, t = f"LENGTH({e})", "num"
                continue
            # method call
            self.expect("(")
            args = []
            if self.peek() != ("op", ")"):
                while True:
                    a, _ = self.ternary()
                    args.append(a)
                    if self.peek() == ("op", ","):
                        self.next()
                        continue
                    break
            self.expect(")")
            e, t = self._method(e, name, args)
        return e, t

    def _method(self, e, name, args):
        if name == "toUpperCase" and not args:
            return f"UPPER({e})", "str"
        if name == "toLowerCase" and not args:
            return f"LOWER({e})", "str"
        if name == "trim" and not args:
            return f"TRIM({e})", "str"
        if name == "substring" and len(args) == 2:
            a, b = args
            return f"SUBSTRING({e}, ({a}) + 1, ({b}) - ({a}))", "str"
        if name == "substring" and len(args) == 1:
            return f"SUBSTRING({e}, ({args[0]}) + 1)", "str"
        if name == "charAt" and len(args) == 1:
            return f"SUBSTRING({e}, ({args[0]}) + 1, 1)", "str"
        if name == "indexOf" and len(args) == 1:
            return f"(INSTR({e}, {args[0]}) - 1)", "num"
        if name == "concat":
            return f"CONCAT({e}, {', '.join(args)})", "str"
        if name in ("replace", "split", "match", "search"):
            raise JsUdfError(
                f"JS subset: .{name}() has no faithful one-expression "
                "SQL form (JS .replace hits only the FIRST match; "
                ".split returns an array) — refused"
            )
        raise JsUdfError(f"JS subset: method .{name}() unsupported")

    _MATH = {
        "floor": ("FLOOR({0})", 1),
        "ceil": ("CEIL({0})", 1),
        "abs": ("ABS({0})", 1),
        "sqrt": ("SQRT({0})", 1),
        "log": ("LN({0})", 1),
        "exp": ("EXP({0})", 1),
        "pow": ("POWER({0}, {1})", 2),
        "min": ("LEAST({0}, {1})", 2),
        "max": ("GREATEST({0}, {1})", 2),
        # JS Math.round is half-UP toward +inf — FLOOR(x + 0.5) exactly
        "round": ("FLOOR(({0}) + 0.5)", 1),
    }

    def primary(self):
        k, v = self.next()
        if k == "num":
            return v, "num"
        if k == "str":
            body = v[1:-1]
            # JS escapes \' \" \\ map 1:1; refuse exotic ones
            if re.search(r"\\[^'\"\\nt]", body):
                raise JsUdfError(
                    f"JS subset: unsupported escape in string {v}"
                )
            body = (
                body.replace("\\\\", "\x00")
                .replace("\\'", "'")
                .replace('\\"', '"')
                .replace("\\n", "\n")
                .replace("\\t", "\t")
                .replace("\x00", "\\\\")
            )
            return "'" + body.replace("'", "''") + "'", "str"
        if k == "name":
            if v in _REFUSE_WORDS:
                raise JsUdfError(
                    f"JS subset: {v!r} — only a single "
                    "side-effect-free 'return <expr>;' body translates"
                )
            if v in ("true", "false"):
                return v.upper(), "bool"
            if v == "null":
                return "NULL", "any"
            if v == "Math":
                self.expect(".")
                k2, fn = self.next()
                tmpl = self._MATH.get(fn)
                if tmpl is None:
                    raise JsUdfError(f"JS subset: Math.{fn} unsupported")
                self.expect("(")
                args = []
                while self.peek() != ("op", ")"):
                    a, _ = self.ternary()
                    args.append(a)
                    if self.peek() == ("op", ","):
                        self.next()
                self.expect(")")
                if len(args) != tmpl[1]:
                    raise JsUdfError(
                        f"JS subset: Math.{fn} takes {tmpl[1]} args"
                    )
                return tmpl[0].format(*args), "num"
            if v in ("String", "Number"):
                self.expect("(")
                a, _ = self.ternary()
                self.expect(")")
                if v == "String":
                    return f"CAST({a} AS STRING)", "str"
                return f"TRY_CAST({a} AS DOUBLE)", "num"
            if v in self.subs:
                sql, t = self.subs[v]
                return f"({sql})", t
            if v in self.params:
                return v, self.params[v]
            raise JsUdfError(
                f"JS subset: unknown identifier {v!r} (not a declared "
                "parameter or local var — closures over outer scope "
                "are refused)"
            )
        if (k, v) == ("op", "("):
            e, t = self.ternary()
            self.expect(")")
            return f"({e})", t
        raise JsUdfError(f"JS subset: unexpected token {v!r}")


_BQ_NUM = {"INT64", "FLOAT64", "NUMERIC", "BIGNUMERIC"}


_IF_RETURN_RX = re.compile(r"(?s)^(?:else\s+)?if\s*\(")
_VAR_RX = re.compile(r"(?s)^(?:var|let|const)\s+([A-Za-z_$][\w$]*)\s*=\s*(.+)$")
_ASSIGN_RX = re.compile(
    r"(?s)^([A-Za-z_$][\w$]*)\s*(\+=|-=|\*=|/=|=)\s*(?!=)(.+)$"
)
_FOR_HEAD_RX = re.compile(r"(?s)^for\s*\(")

# r13 unroll guards: total iterations across all (possibly nested)
# loops per body, and the size any single binding's inlined SQL may
# reach (each unrolled accumulation nests the previous expression).
_MAX_UNROLL_ITERS = 256
_MAX_BINDING_SQL = 50_000


def _skip_js_str(src: str, i: int) -> int:
    """src[i] is a quote — return the index just past the literal."""
    q = src[i]
    i += 1
    n = len(src)
    while i < n:
        if src[i] == "\\":
            i += 2
            continue
        if src[i] == q:
            return i + 1
        i += 1
    raise JsUdfError("JS subset: unterminated string literal")


def _js_statements(src: str) -> list[str]:
    """Top-level statement split, string/paren/brace aware. A
    statement beginning with ``for`` or ``if`` whose tail is a brace
    block ends at the block's close (no ';' required); an ``if``
    block followed by ``else`` keeps consuming the chain."""
    out: list[str] = []
    i, n = 0, len(src)
    while i < n:
        while i < n and (src[i].isspace() or src[i] == ";"):
            i += 1
        if i >= n:
            break
        start = i
        dp = db = 0
        while i < n:
            c = src[i]
            if c in "\"'":
                i = _skip_js_str(src, i)
                continue
            if c == "(":
                dp += 1
            elif c == ")":
                dp -= 1
            elif c == "{":
                db += 1
            elif c == "}":
                db -= 1
                if db == 0 and dp == 0:
                    # end of a brace block: statement ends here unless
                    # an else-chain continues
                    j = i + 1
                    while j < n and src[j].isspace():
                        j += 1
                    if src[j : j + 4] == "else":
                        i = j + 4
                        continue
                    i += 1
                    break
            elif c == ";" and dp == 0 and db == 0:
                break
            i += 1
        out.append(src[start:i].strip())
        if i < n and src[i] == ";":
            i += 1
    return out


def _match_paren(src: str, open_idx: int) -> int:
    depth, i, n = 0, open_idx, len(src)
    while i < n:
        c = src[i]
        if c in "\"'":
            i = _skip_js_str(src, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise JsUdfError("JS subset: unbalanced parentheses")


def translate_js_body(body: str, params: list[tuple[str, str]]) -> str:
    """Side-effect-free JS body → one SQL expression over the declared
    params. ``params``: (name, BigQuery type) pairs.

    r12 (VERDICT r11 missing #6 — multi-statement bodies): beyond the
    original single ``return <expr>;``, straight-line SSA bodies
    translate — ``var/let/const NAME = expr;`` bindings (each name
    bound ONCE; references inline the translated SQL, Catalyst CSE
    dedups the deterministic repeats), ``if (cond) return expr;`` /
    ``else if (...) return ...;`` chains (→ CASE WHEN), an optional
    final unconditional ``return``; a missing final return yields
    NULL (JS's undefined → BigQuery NULL). ``if (c) { return e; }``
    brace blocks normalize when they hold exactly one return.

    r13 (VERDICT r12 item 5): straight-line REASSIGNMENT translates by
    sequential rebinding (each ``x = e;`` / ``x op= e;`` rebinds the
    name to the SQL of the right side AT THAT PROGRAM POINT — exactly
    JS semantics for straight-line code; conditional assignment still
    refuses); ``for`` loops with literal integer bounds UNROLL at DDL
    time under a 256-total-iteration budget (nested loops share it);
    ``return {a: x, b: y};`` object literals lower to NAMED_STRUCT
    (CAST to the declared RETURNS STRUCT<> type by the DDL wrapper).
    Unbounded/computed-bound loops and ``return`` inside a loop still
    refuse with the construct named."""
    src = body.strip()
    if re.search(r"=>|\[|\]", src):
        raise JsUdfError(
            "JS subset: arrow functions / arrays are "
            "outside the translatable subset"
        )
    # normalize 'if (c) { return e; }' / 'else { return e; }' blocks
    # (loop bodies never match — they hold assignments, not returns;
    # object-literal returns have the brace AFTER 'return')
    src = re.sub(
        r"\{\s*(return\b[^{};]*;?)\s*\}", r"\1", src
    )
    types = {}
    for name, t in params:
        tu = t.upper()
        if tu in _BQ_NUM:
            types[name] = "num"
        elif tu == "STRING":
            types[name] = "str"
        elif tu == "BOOL":
            types[name] = "bool"
        else:
            types[name] = "any"

    env: dict[str, tuple[str, str]] = {}
    budget = {"iters": 0}
    loop_vars: set[str] = set()  # names bound by a for head — may
    # rebind on re-entry (JS var hoisting re-declares legally)

    def _expr(text: str) -> tuple[str, str]:
        return _Parser(_tokenize(text), types, env).parse()

    def _bind(name: str, sql: str, t: str) -> None:
        if len(sql) > _MAX_BINDING_SQL:
            raise JsUdfError(
                f"JS subset: the unrolled expression for {name!r} "
                f"exceeds {_MAX_BINDING_SQL} chars — reduce the loop "
                "bounds (each iteration inlines the previous value)"
            )
        env[name] = (sql, t)

    def _do_assign(st: str) -> bool:
        """var/let/const binding or straight-line reassignment;
        returns False if the statement is neither."""
        vm = _VAR_RX.match(st)
        if vm:
            name, rhs = vm.group(1), vm.group(2)
            if name in types:
                raise JsUdfError(
                    f"JS subset: {name!r} shadows a declared parameter"
                )
            _bind(name, *_expr(rhs))
            return True
        am = _ASSIGN_RX.match(st)
        if am:
            name, op, rhs = am.group(1), am.group(2), am.group(3)
            if name in types:
                raise JsUdfError(
                    f"JS subset: assigning to parameter {name!r} is "
                    "outside the translatable subset"
                )
            if name not in env:
                raise JsUdfError(
                    f"JS subset: {name!r} assigned before declaration "
                    "(declare with var/let/const first)"
                )
            if op == "=":
                _bind(name, *_expr(rhs))
            else:
                _bind(name, *_expr(f"{name} {op[0]} ({rhs})"))
            return True
        return False

    def _run_for(st: str) -> None:
        """Unroll ``for (var i = a; i < b; i++|i += k) { asgns }``
        with literal integer bounds; body statements are bindings,
        reassignments and nested literal-bound loops."""
        open_idx = st.index("(")
        close = _match_paren(st, open_idx)
        head = st[open_idx + 1 : close]
        tail = st[close + 1 :].strip()
        if not (tail.startswith("{") and tail.endswith("}")):
            raise JsUdfError(
                "JS subset: the for body must be a brace block"
            )
        body_src = tail[1:-1]
        parts = head.split(";")
        if len(parts) != 3:
            raise JsUdfError(
                "JS subset: for needs (init; cond; step)"
            )
        init, cond, step = (p.strip() for p in parts)
        im = re.match(
            r"^(?:var|let|const)\s+([A-Za-z_$][\w$]*)\s*=\s*(-?\d+)$",
            init,
        )
        if not im:
            raise JsUdfError(
                "JS subset: for init must be 'var i = <integer "
                "literal>' — computed loop bounds cannot unroll at "
                "DDL time and are refused"
            )
        ivar, start = im.group(1), int(im.group(2))
        cm = re.match(
            rf"^{re.escape(ivar)}\s*(<=|<)\s*(-?\d+)$", cond
        )
        if not cm:
            raise JsUdfError(
                "JS subset: for condition must be 'i < <integer "
                "literal>' or 'i <= <integer literal>'"
            )
        stop = int(cm.group(2)) + (1 if cm.group(1) == "<=" else 0)
        sm = re.match(
            rf"^{re.escape(ivar)}\s*(?:(\+\+)|\+=\s*(\d+))$", step
        )
        if not sm:
            raise JsUdfError(
                "JS subset: for step must be 'i++' or 'i += <positive "
                "integer literal>'"
            )
        k = 1 if sm.group(1) else int(sm.group(2))
        if k <= 0:
            raise JsUdfError("JS subset: for step must be positive")
        if ivar in types or (ivar in env and ivar not in loop_vars):
            raise JsUdfError(
                f"JS subset: loop variable {ivar!r} shadows an "
                "existing binding"
            )
        loop_vars.add(ivar)
        vals = list(range(start, max(stop, start), k))
        budget["iters"] += len(vals)
        if budget["iters"] > _MAX_UNROLL_ITERS:
            raise JsUdfError(
                f"JS subset: loop unroll budget exceeded "
                f"({_MAX_UNROLL_ITERS} total iterations per body)"
            )
        body_stmts = _js_statements(body_src)
        for v in vals:
            env[ivar] = (str(v), "num")
            for bs in body_stmts:
                if not bs:
                    continue
                if _FOR_HEAD_RX.match(bs):
                    _run_for(bs)
                    continue
                if re.match(r"(?s)^return\b", bs) or _IF_RETURN_RX.match(bs):
                    raise JsUdfError(
                        "JS subset: 'return'/'if' inside a loop has "
                        "no unrolled SQL form — accumulate with a "
                        "ternary instead (x = c ? a : x)"
                    )
                if not _do_assign(bs):
                    tok = bs.split(None, 1)[0] if bs.split() else bs
                    raise JsUdfError(
                        "JS subset: unsupported loop statement "
                        f"starting with {tok!r} (loop bodies take "
                        "bindings, reassignments and nested "
                        "literal-bound loops)"
                    )
        # JS: the loop variable survives with its first failing value
        env[ivar] = (str(vals[-1] + k if vals else start), "num")

    def _obj_literal(inner: str) -> str:
        """``{k1: v1, k2: v2}`` -> NAMED_STRUCT('k1', v1, ...)."""
        pairs: list[str] = []
        buf: list[str] = []
        dp = 0
        i, n = 0, len(inner)
        while i < n:
            c = inner[i]
            if c in "\"'":
                j = _skip_js_str(inner, i)
                buf.append(inner[i:j])
                i = j
                continue
            if c == "(":
                dp += 1
            elif c == ")":
                dp -= 1
            elif c == "," and dp == 0:
                pairs.append("".join(buf))
                buf = []
                i += 1
                continue
            buf.append(c)
            i += 1
        if "".join(buf).strip():
            pairs.append("".join(buf))
        items: list[str] = []
        for p in pairs:
            pm = re.match(
                r"(?s)^\s*([A-Za-z_$][\w$]*|'[^']*'|\"[^\"]*\")"
                r"\s*:\s*(.+)$",
                p,
            )
            if not pm:
                raise JsUdfError(
                    f"JS subset: malformed object entry {p!r} "
                    "(expected key: value)"
                )
            key = pm.group(1).strip("'\"")
            val_sql, _ = _expr(pm.group(2).strip())
            items.append(f"'{key}', {val_sql}")
        if not items:
            raise JsUdfError("JS subset: empty object literal")
        return f"NAMED_STRUCT({', '.join(items)})"

    branches: list[tuple[str, str]] = []  # (cond_sql, value_sql)
    final: str | None = None

    def _ret_value(text: str) -> str:
        text = text.strip()
        om = re.match(r"(?s)^\{(.*)\}$", text)
        if om:
            return _obj_literal(om.group(1))
        return _expr(text)[0]

    for st in _js_statements(src):
        if not st:
            continue
        if final is not None:
            raise JsUdfError(
                "JS subset: unreachable statement after the final "
                "'return'"
            )
        if _FOR_HEAD_RX.match(st):
            _run_for(st)
            continue
        im = _IF_RETURN_RX.match(st)
        if im:
            open_idx = st.index("(")
            j = _match_paren(st, open_idx)
            cond_src = st[open_idx + 1 : j]
            rest = st[j + 1 :].strip()
            rm = re.match(r"(?s)^return\b(.*)$", rest)
            if not rm:
                raise JsUdfError(
                    "JS subset: 'if' supports only "
                    "'if (cond) return expr;' (conditional "
                    "assignment has no straight-line rebinding form)"
                )
            cond_sql, _ = _expr(cond_src)
            branches.append((cond_sql, _ret_value(rm.group(1))))
            continue
        em = re.match(r"(?s)^else\s+return\b(.*)$", st)
        if em:
            if not branches:
                raise JsUdfError(
                    "JS subset: 'else' without a preceding if-return"
                )
            final = _ret_value(em.group(1))
            continue
        rm = re.match(r"(?s)^return\b(.*)$", st)
        if rm:
            final = _ret_value(rm.group(1))
            continue
        if _do_assign(st):
            continue
        lead = re.match(r"[A-Za-z_$][\w$]*", st)
        if lead and lead.group(0) in _REFUSE_WORDS:
            raise JsUdfError(
                f"JS subset: {lead.group(0)!r} statements are outside "
                "the translatable subset (loops translate only as "
                "'for' with literal integer bounds)"
            )
        if "{" in st or "}" in st:
            raise JsUdfError(
                "JS subset: blocks beyond 'if (...) { return ...; }' "
                "and literal-bound for loops are outside the "
                "translatable subset"
            )
        tok = st.split(None, 1)[0] if st.split() else st
        raise JsUdfError(
            f"JS subset: unsupported statement starting with {tok!r} "
            "(supported: var/let/const bindings, reassignment, "
            "literal-bound for loops, if-return chains, return)"
        )
    if not branches and final is None:
        raise JsUdfError(
            "JS subset: the body must contain a 'return'"
        )
    if not branches:
        return final
    whens = " ".join(f"WHEN {c} THEN {v}" for c, v in branches)
    tail = f" ELSE {final}" if final is not None else ""
    return f"(CASE {whens}{tail} END)"


def strip_js_string(raw: str) -> str:
    """The JS body string literal (optionally r-prefixed, single or
    triple quoted) -> its text; non-raw bodies get the standard JS
    escapes unescaped."""
    s = raw.strip().rstrip(";").strip()
    is_raw = False
    if s[:1] in ("r", "R"):
        is_raw = True
        s = s[1:]
    triple_dq = chr(34) * 3
    triple_sq = chr(39) * 3
    for q in (triple_dq, triple_sq):
        if s.startswith(q) and s.endswith(q) and len(s) >= 6:
            return s[3:-3]
    for q in ('"', "'"):
        if s.startswith(q) and s.endswith(q) and len(s) >= 2:
            body = s[1:-1]
            if is_raw:
                return body
            return re.sub(
                r"\\(.)",
                lambda m: {"n": "\n", "t": "\t"}.get(
                    m.group(1), m.group(1)
                ),
                body,
            )
    raise JsUdfError("LANGUAGE js body must be a string literal")


def rewrite_js_function(
    name: str,
    params: str,
    rest: str,
    split_args,
    type_map: dict[str, str],
    error_cls,
) -> str:
    """``RETURNS T [DETERMINISTIC] LANGUAGE js AS "<body>"`` -> a
    SQL-bodied temp function DDL; the translated body INLINES into
    Catalyst at analysis time (zero runtime JS, zero Python). Outside
    the subset: loud refusal naming the construct. Called from
    bq_dialect._rewrite_create_function with its own arg splitter,
    type table and error class to avoid a circular import."""
    # r13: the type may contain spaces (RETURNS STRUCT<a INT64, ...>
    # for object-literal bodies) — non-greedy up to the LANGUAGE js
    # anchor, with DETERMINISTIC consumed by the optional group
    rm = re.match(
        r"(?is)^RETURNS\s+(.+?)\s+(?:NOT\s+)?(?:DETERMINISTIC\s+)?"
        r"LANGUAGE\s+js\b",
        rest,
    )
    ret_type = rm.group(1) if rm else None
    jm = re.search(
        r"(?is)\bLANGUAGE\s+js\s+(?:OPTIONS\s*\([^)]*\)\s*)?AS\s+(.*)$",
        rest,
    )
    if not jm:
        raise error_cls(f"CREATE FUNCTION {name}: LANGUAGE js needs AS <body>")
    try:
        js_body = strip_js_string(jm.group(1))
        pairs = []
        if params.strip():
            for p in split_args(params):
                pm = re.match(r"(?s)^\s*(\w+)\s+(.+?)\s*$", p)
                if not pm:
                    raise error_cls(
                        f"CREATE FUNCTION {name}: malformed parameter {p!r}"
                    )
                pairs.append((pm.group(1), pm.group(2)))
        expr = translate_js_body(js_body, pairs)
    except JsUdfError as e:
        raise error_cls(f"CREATE FUNCTION {name}: {e}") from None
    returns = ""
    if ret_type:
        rt = ret_type.strip()
        for bq, sp in type_map.items():
            rt = re.sub(rf"(?i)\b{bq}\b", sp, rt)
        expr = f"CAST({expr} AS {rt})"
        returns = f"RETURNS {rt} "
    sp_params = params
    for bq, sp in type_map.items():
        sp_params = re.sub(rf"(?i)\b{bq}\b", sp, sp_params)
    return (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sp_params}) "
        f"{returns}RETURN {expr}"
    )
