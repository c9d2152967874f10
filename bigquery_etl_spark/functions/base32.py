"""RFC 4648 base32 transcode kernels (``TO_BASE32`` / ``FROM_BASE32``).

r13 opt (guide §4.2 — hand whole batches to native code): the former
pure-SQL lowering ran the per-5-byte-group bit arithmetic through
interpreted higher-order-function lambdas (TRANSFORM/AGGREGATE do not
whole-stage-codegen), measured 2.5–3.1 s for q_funcs_r11c's 15k-row
double transcode. These Arrow-batched kernels use CPython's C
``base64.b32encode`` for encode and a tight mirror loop for decode.
LITERAL arguments additionally fold at translate time (bq_dialect), so
constants never reach the executor at all.

Semantics are byte-identical to the previous SQL form (RFC vectors
pinned in tests/test_bq_dialect.py):

- encode: uppercase RFC alphabet, ``=``-padded to 8-char groups;
  NULL → NULL, empty → ''.
- decode: uppercases, strips ``=`` anywhere, decodes trailing partial
  groups to ``floor(len*5/8)`` bytes, and raises the same loud
  ``FROM_BASE32: invalid base32 character X`` on anything outside the
  alphabet.
"""

from __future__ import annotations

import base64

import pandas as pd

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
_REGISTERED: set[int] = set()


def b32encode(b: bytes | None) -> str | None:
    if b is None:
        return None
    return base64.b32encode(bytes(b)).decode("ascii")


def b32decode(s: str | None) -> bytes | None:
    """Mirror of the former SQL lowering, group for group."""
    if s is None:
        return None
    t = s.upper().replace("=", "")
    out = bytearray()
    for g in range(0, len(t), 8):
        c = t[g : g + 8]
        v = 0
        for j, ch in enumerate(c):
            idx = _ALPHA.find(ch)
            if idx < 0:
                raise ValueError(
                    f"FROM_BASE32: invalid base32 character {ch}"
                )
            v |= idx << (35 - 5 * j)
        nb = len(c) * 5 // 8
        if nb:
            out += (v >> (40 - 8 * nb)).to_bytes(nb, "big")
    return bytes(out)


def register_base32(spark) -> None:
    if id(spark) in _REGISTERED:
        return
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def __bq_b32_encode(b: pd.Series) -> pd.Series:
        enc = base64.b32encode
        return pd.Series(
            [
                None if x is None else enc(bytes(x)).decode("ascii")
                for x in b
            ],
            dtype=object,
        )

    @F.pandas_udf("binary")
    def __bq_b32_decode(s: pd.Series) -> pd.Series:
        return pd.Series([b32decode(x) for x in s], dtype=object)

    spark.udf.register("__bq_b32_encode", __bq_b32_encode)
    spark.udf.register("__bq_b32_decode", __bq_b32_decode)
    _REGISTERED.add(id(spark))
