"""BigQuery NET.* functions (r8) — the IP/URL toolkit.

IPv4 int↔bytes and URL host extraction are pure codegen in the dialect
(sources/bq_dialect.py). String-IP parsing/formatting and prefix
truncation handle BOTH address families exactly via Python's stdlib
``ipaddress`` module in Arrow-batched UDFs — the same sanctioned
fallback tier as the JSON mutators (a byte-exact IPv6 parser is not
expressible in Spark SQL, and a wrong network parse is a correctness
bug, not a performance tradeoff). NET.PUBLIC_SUFFIX/REG_DOMAIN refuse
loudly: they require the Mozilla Public Suffix List, which this
container does not ship — a stale builtin copy would silently
misclassify domains."""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import SparkSession


def ip_from_string(s: str | None) -> bytes | None:
    if s is None:
        return None
    return ipaddress.ip_address(s.strip()).packed


def safe_ip_from_string(s: str | None) -> bytes | None:
    try:
        return ip_from_string(s)
    except ValueError:
        return None


def ip_to_string(b: bytes | None) -> str | None:
    if b is None:
        return None
    if len(b) not in (4, 16):
        raise ValueError(f"IP bytes must be 4 or 16 long, got {len(b)}")
    return str(ipaddress.ip_address(bytes(b)))


def ip_trunc(b: bytes | None, prefix: int | None) -> bytes | None:
    if b is None or prefix is None:
        return None
    n = len(bytes(b))
    if n not in (4, 16):
        raise ValueError(f"IP bytes must be 4 or 16 long, got {n}")
    bits = n * 8
    if not 0 <= prefix <= bits:
        raise ValueError(f"prefix {prefix} out of range for {bits}-bit IP")
    as_int = int.from_bytes(bytes(b), "big")
    mask = ((1 << prefix) - 1) << (bits - prefix) if prefix else 0
    return (as_int & mask).to_bytes(n, "big")


_REGISTERED: set[int] = set()


def register_net_funcs(spark: SparkSession) -> None:
    if id(spark) in _REGISTERED:
        return
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def __bq_net_ip_from_string(s: pd.Series) -> pd.Series:
        return s.map(ip_from_string)

    @F.pandas_udf("binary")
    def __bq_net_safe_ip_from_string(s: pd.Series) -> pd.Series:
        return s.map(safe_ip_from_string)

    @F.pandas_udf("string")
    def __bq_net_ip_to_string(b: pd.Series) -> pd.Series:
        return b.map(ip_to_string)

    @F.pandas_udf("binary")
    def __bq_net_ip_trunc(b: pd.Series, p: pd.Series) -> pd.Series:
        return pd.Series(
            [ip_trunc(x, None if y is None else int(y))
             for x, y in zip(b, p)]
        )

    spark.udf.register("__bq_net_ip_from_string", __bq_net_ip_from_string)
    spark.udf.register(
        "__bq_net_safe_ip_from_string", __bq_net_safe_ip_from_string
    )
    spark.udf.register("__bq_net_ip_to_string", __bq_net_ip_to_string)
    spark.udf.register("__bq_net_ip_trunc", __bq_net_ip_trunc)
    _REGISTERED.add(id(spark))
