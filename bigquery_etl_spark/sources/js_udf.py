"""JS UDF narrow subset (r9, VERDICT r8 gap #9) — translate
side-effect-free arithmetic/string JavaScript bodies of BigQuery
``LANGUAGE js`` UDFs into SQL expressions at DDL time, so they inline
into Catalyst exactly like SQL-bodied functions (zero runtime JS, zero
Python). Everything outside the subset refuses loudly with the
offending construct named — a wrong translation would be worse than no
translation.

Supported: a single ``return <expr>;`` body over the declared
parameters; numeric/string/boolean literals; ``+ - * / %`` (with ``+``
typed as CONCAT when either side is a string — the JS overload);
comparisons ``< <= > >= == != === !==``; ``&& || !``; the ternary
``c ? a : b``; ``Math.floor/ceil/abs/sqrt/pow/min/max/log/exp`` and
``Math.round`` (lowered to FLOOR(x+0.5), which IS the JS half-up rule
where SQL ROUND is half-away); string ``.length``, ``.toUpperCase()``,
``.toLowerCase()``, ``.trim()``, ``.substring(a, b)``, ``.charAt(i)``,
``.indexOf(s)`` (−1-based like JS); ``String(x)`` / ``Number(x)``.

Refused (named in the error): statements beyond the single return,
``var/let/const``, objects/arrays, closures/arrow functions, ``new``,
regex literals, ``.replace`` (JS replaces the FIRST match, SQL all),
``.split``, loops, assignments — anything whose JS semantics have no
faithful one-expression SQL form.
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

    def __init__(self, toks, params: dict[str, str]):
        self.toks = toks
        self.i = 0
        self.params = params

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
            if v in self.params:
                return v, self.params[v]
            raise JsUdfError(
                f"JS subset: unknown identifier {v!r} (not a declared "
                "parameter — closures over outer scope are refused)"
            )
        if (k, v) == ("op", "("):
            e, t = self.ternary()
            self.expect(")")
            return f"({e})", t
        raise JsUdfError(f"JS subset: unexpected token {v!r}")


_BQ_NUM = {"INT64", "FLOAT64", "NUMERIC", "BIGNUMERIC"}


def translate_js_body(body: str, params: list[tuple[str, str]]) -> str:
    """``return <expr>;`` JS body → one SQL expression over the
    declared params. ``params``: (name, BigQuery type) pairs."""
    src = body.strip()
    if re.search(r"=>|\{|\}|\[|\]", src):
        raise JsUdfError(
            "JS subset: arrow functions / objects / arrays / blocks "
            "are outside the translatable subset"
        )
    m = re.match(r"(?s)^return\b(.*?);?\s*$", src)
    if not m:
        raise JsUdfError(
            "JS subset: the body must be a single 'return <expr>;'"
        )
    expr_src = m.group(1).strip()
    if ";" in expr_src:
        raise JsUdfError(
            "JS subset: multiple statements — only one return"
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
    sql, _ = _Parser(_tokenize(expr_src), types).parse()
    return sql


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
    rm = re.match(
        r"(?is)^RETURNS\s+([\w<>,()]+)\s+(?:NOT\s+)?(?:DETERMINISTIC\s+)?"
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
