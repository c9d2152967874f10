"""Skew-aware join via key salting (charter: 'skewed keys hurt').

AQE's skew-join handling (on by default in session.py) splits oversized
SORT-MERGE partitions at runtime — use that first. Salting is the
explicit fallback for cases AQE can't fix: a broadcast-ineligible join
where one side has a few keys carrying a large fraction of all rows
(e.g. the null key, a bot user, a default SKU).

Mechanics: left rows get a random-ish salt in [0, n_salts) derived from
a row attribute (deterministic — no rand(), replay-safe); the right
side replicates each row n_salts times; the join key becomes
(key, salt), spreading each hot key over n_salts reducers.
Cost: right side inflates n_salts×, so salt only the hot keys
(``hot_keys`` arg) and pass the rest through the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n_salts: int = 8,
    hot_keys: list | None = None,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot keys spread across n_salts partitions.

    ``salt_source``: a left column whose hash picks the salt (defaults
    to all left columns — any stable attribute works; rand() would break
    task retry determinism)."""
    salt_cols = [F.col(salt_source)] if salt_source else [F.col(c) for c in left.columns]
    l_salt = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts))

    if hot_keys is not None:
        is_hot_l = F.col(left_on).isin(hot_keys)
        is_hot_r = F.col(right_on).isin(hot_keys)
        # cold path: plain join, no inflation
        cold = left.filter(~is_hot_l).join(
            right.filter(~is_hot_r), F.col(left_on) == F.col(right_on), how
        )
        hot_l = left.filter(is_hot_l)
        hot_r = right.filter(is_hot_r)
    else:
        cold = None
        hot_l, hot_r = left, right

    lh = hot_l.withColumn("__salt", l_salt)
    rh = hot_r.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    hot = lh.join(
        rh,
        (F.col(left_on) == F.col(right_on)) & (lh["__salt"] == rh["__salt"]),
        how,
    ).drop("__salt")

    return hot if cold is None else cold.unionByName(hot)
