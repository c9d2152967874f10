"""C-printf float formatting kernel (r13, VERDICT r12 item 6).

BigQuery's FORMAT() speaks C printf. Java's Formatter cannot match it
for float conversions: it formats from the double's SHORTEST decimal
repr (so ties round HALF_UP on the wrong digits — the fuzz caught
%.3e of 131048.45 and %.3f of 0.265-class values), while C rounds the
EXACT binary expansion to nearest. Python's ``%`` operator implements
the C behavior (correctly-rounded exact-expansion conversion), so
%e/%E/%f/%F segments lower onto this Arrow-batched pandas UDF — the
sanctioned kernel tier for semantics the JVM genuinely cannot express
(the daead/farmhash pattern). Integer and string conversions stay
whole-stage codegen in FORMAT_STRING.

Non-finite values render glibc-style: 'inf'/'nan' (case follows the
conversion), sign flags honored, space-padded to width with the zero
flag suppressed.
"""

from __future__ import annotations

import math
import re

import pandas as pd

_REGISTERED: set[int] = set()

_SPEC_RX = re.compile(r"^%([-+ 0#,]*)(\d+)?(?:\.(\d+))?([eEfF])$")


def cfmt_float(spec: str, v) -> str | None:
    if v is None or spec is None:
        return None
    v = float(v)
    m = _SPEC_RX.match(spec)
    if m is None:
        raise ValueError(f"cfmt: malformed float spec {spec!r}")
    flags, width, prec, conv = m.groups()
    if math.isnan(v) or math.isinf(v):
        name = "nan" if math.isnan(v) else "inf"
        if conv in "EF":
            name = name.upper()
        if v < 0:
            txt = "-" + name
        elif "+" in flags:
            txt = "+" + name
        elif " " in flags:
            txt = " " + name
        else:
            txt = name
        w = int(width or 0)
        if w <= len(txt):
            return txt
        return txt.rjust(w) if "-" not in flags else txt.ljust(w)
    # Python % implements C printf for finite doubles (exact-expansion
    # correctly-rounded conversion); the ',' flag (BigQuery's ')
    # python spells the same way
    return spec % (v,)


def register_cfmt(spark) -> None:
    """Register the Arrow-batched kernel (idempotent per session)."""
    if id(spark) in _REGISTERED:
        return
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def __bq_fmt_f(spec: pd.Series, x: pd.Series) -> pd.Series:
        return pd.Series(
            [cfmt_float(s, v) for s, v in zip(spec, x)], dtype="object"
        )

    spark.udf.register("__bq_fmt_f", __bq_fmt_f)
    _REGISTERED.add(id(spark))
