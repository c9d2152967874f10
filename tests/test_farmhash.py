"""FARM_FINGERPRINT — the exact public farmhashna::Fingerprint64
(functions/farmhash.py, r12 closing VERDICT r11 missing #1).

Three layers of evidence:
- pinned literal vectors captured from Guava's farmHashFingerprint64
  (an INDEPENDENT implementation of the same public algorithm, on
  Spark's own classpath) — these hold even if Guava ever vanished;
- a live differential fuzz against that Guava oracle at every branch
  boundary (0..70 covers all four small classes and their seams;
  127..130 / 191..194 / 300 / 1000 / 4096 cover the >64 main loop at
  1, 2, 3, 5, 16 and 64 chunks);
- batch-vs-scalar equivalence (the numpy path must be bit-identical
  to the scalar reference on mixed-length batches with nulls).
"""

from __future__ import annotations

import random

import pytest

from bigquery_etl_spark.functions.farmhash import (
    fingerprint64_batch,
    fingerprint64_signed,
    register_farmhash,
)

# captured from com.google.common.hash.Hashing.farmHashFingerprint64()
# (Guava on Spark's classpath), 2026-08-16 — farmhashna::Fingerprint64
_PINNED = {
    b"": -7286425919675154353,
    b"abc": 2640714258260161385,
    b"hello": -5436999610281751320,
    b"foobar2000": 6483306910510679570,
    b"The quick brown fox jumps over the lazy dog":
        -6071270166956912332,
    "héllo wörld".encode("utf-8"): None,  # filled by the live oracle
}


def test_pinned_vectors():
    for s, want in _PINNED.items():
        if want is None:
            continue
        assert fingerprint64_signed(s) == want, s


def _guava(spark):
    try:
        return spark._jvm.com.google.common.hash.Hashing.\
            farmHashFingerprint64()
    except Exception:  # pragma: no cover - classpath variation
        pytest.skip("Guava farmHashFingerprint64 not on classpath")


def test_differential_vs_guava_all_branches(spark):
    h = _guava(spark)
    rng = random.Random(20260816)
    cases = [b""]
    for ln in list(range(0, 71)) + [
        127, 128, 129, 130, 191, 192, 193, 194, 300, 1000, 4096,
    ]:
        for _ in range(5):
            cases.append(bytes(rng.randrange(256) for _ in range(ln)))
    for c in cases:
        assert h.hashBytes(bytearray(c)).asLong() == \
            fingerprint64_signed(c), (len(c), c.hex())


def test_batch_matches_scalar_with_nulls():
    rng = random.Random(7)
    vals = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        for _ in range(500)
    ]
    vals[3] = None
    vals[77] = None
    got = fingerprint64_batch(vals)
    for v, g in zip(vals, got):
        if v is not None:
            assert int(g) == fingerprint64_signed(v)


def test_spark_udf_end_to_end(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    register_farmhash(spark)
    spark.createDataFrame(
        [("hello",), ("abc",), (None,), ("héllo wörld",)], "s string"
    ).createOrReplaceTempView("ff_t")
    cat = LakeCatalog(spark)
    rows = {
        r.s: r.h
        for r in cat.bq_sql(
            "SELECT s, FARM_FINGERPRINT(s) AS h FROM ff_t"
        ).collect()
    }
    assert rows["hello"] == -5436999610281751320
    assert rows["abc"] == 2640714258260161385
    assert rows[None] is None
    # STRING hashes its UTF-8 bytes
    assert rows["héllo wörld"] == fingerprint64_signed(
        "héllo wörld".encode("utf-8")
    )
    # the standard BigQuery split idiom runs end-to-end
    n = cat.bq_sql(
        "SELECT COUNT(*) AS n FROM ff_t "
        "WHERE MOD(ABS(FARM_FINGERPRINT(s)), 10) < 8 AND s IS NOT NULL"
    ).collect()[0].n
    assert 0 <= n <= 3
