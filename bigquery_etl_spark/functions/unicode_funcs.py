"""BigQuery Unicode functions (r8): NORMALIZE / NORMALIZE_AND_CASEFOLD
(NFC | NFKC | NFD | NFKD) and TO_CODE_POINTS / CODE_POINTS_TO_STRING.

Python's stdlib ``unicodedata.normalize`` + ``str.casefold`` implement
EXACTLY the Unicode algorithms BigQuery documents, so these run as
Arrow-batched UDFs (the sanctioned fallback tier — Spark has no
normalization builtin and a partial lower()-based imitation would be a
silent correctness bug on the scripts normalization exists for)."""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import SparkSession

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def normalize(s: str | None, form: str = "NFC", casefold: bool = False):
    if s is None:
        return None
    if form not in _FORMS:
        raise ValueError(f"normalization form must be one of {_FORMS}")
    out = unicodedata.normalize(form, s)
    if casefold:
        # BigQuery NORMALIZE_AND_CASEFOLD = normalize, then Unicode
        # case folding — exactly str.casefold, then re-normalize (case
        # folding can denormalize, per UAX #15)
        out = unicodedata.normalize(form, out.casefold())
    return out


_REGISTERED: set[int] = set()


def register_unicode_funcs(spark: SparkSession) -> None:
    if id(spark) in _REGISTERED:
        return
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def __bq_uni_normalize(s: pd.Series, form: pd.Series) -> pd.Series:
        return pd.Series(
            [normalize(x, f) for x, f in zip(s, form)]
        )

    @F.pandas_udf("string")
    def __bq_uni_casefold(s: pd.Series, form: pd.Series) -> pd.Series:
        return pd.Series(
            [normalize(x, f, casefold=True) for x, f in zip(s, form)]
        )

    @F.pandas_udf("array<long>")
    def __bq_uni_to_code_points(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else [ord(c) for c in x]
        )

    @F.pandas_udf("string")
    def __bq_uni_from_code_points(a: pd.Series) -> pd.Series:
        return a.map(
            lambda xs: None
            if xs is None
            else "".join(chr(int(c)) for c in xs)
        )

    spark.udf.register("__bq_uni_normalize", __bq_uni_normalize)
    spark.udf.register("__bq_uni_casefold", __bq_uni_casefold)
    spark.udf.register("__bq_uni_to_code_points", __bq_uni_to_code_points)
    spark.udf.register(
        "__bq_uni_from_code_points", __bq_uni_from_code_points
    )
    _REGISTERED.add(id(spark))
