"""Round-8 regressions for the r7 ADVICE findings (ADVICE.md):

1. Media decoder fallbacks must degrade (decoded=false / byte stats)
   on ANY malformed payload — struct.error from a truncated WAV fmt
   chunk, ZeroDivisionError from sample_rate=0, struct.error/
   IndexError from truncated JPEG segments — never fail the stage.
2. A table FIRST created inside a transaction must publish as a
   'create' commit so a concurrent creator surfaces as
   TransactionConflict instead of being silently clobbered
   (overwrite with expected_base=None disabled the OCC check).
3. vacuum must purge _FILES_CACHE entries below the cutoff so
   _files()/partitions() for a vacuumed-away version raise
   VersionNotFound like read() does, instead of serving entries for
   already-deleted data files.
4. A backticked BigQuery path containing '--' (dashed project IDs,
   e.g. `a--b.ds.t`) must not be misread as a line-comment island by
   the path flattener.
"""

from __future__ import annotations

import struct

import pytest

from bigquery_etl_spark.operators.multimodal import (
    decode_wav,
    encode_wav,
    extract_audio_features,
    _decode_stdlib,
)
from bigquery_etl_spark.sources.lake_sql import (
    LakeCatalog,
    TransactionConflict,
)
from bigquery_etl_spark.sources.versioned import (
    VersionNotFound,
    VersionedTable,
)


# ---------------------------------------------------------------- #1


def _wav_with_fmt(fmt_body: bytes, data: bytes = b"\x00\x00") -> bytes:
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + (b"\x00" if len(fmt_body) & 1 else b"")
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_truncated_fmt_raises_valueerror():
    # 8-byte fmt chunk: struct.unpack('<HHIIHH') over body[:16] would
    # raise struct.error — the fallback contract is ValueError
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(_wav_with_fmt(b"\x01\x00\x01\x00\x40\x1f\x00\x00"))


def test_decode_wav_zero_sample_rate_raises_valueerror():
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)  # sample_rate=0
    with pytest.raises(ValueError, match="sample_rate"):
        decode_wav(_wav_with_fmt(fmt))


def test_decode_stdlib_truncated_jpeg_returns_none():
    # passes the FFD8 signature check, then truncates mid-segment:
    # decode_jpeg may raise struct.error/IndexError internally; the
    # caller contract is None (fall back), never an exception
    assert _decode_stdlib(b"\xff\xd8\xff\xe0\x00\x10JF") is None
    assert _decode_stdlib(b"\xff\xd8\xff") is None


def test_audio_features_degrade_not_fail(spark):
    """One bad blob in a batch must yield decoded=false for that row —
    not fail the whole Spark stage."""
    good = encode_wav(8000, [0.0, 0.5, -0.5, 0.25])
    bad_fmt = _wav_with_fmt(b"\x01\x00\x01\x00")  # 4-byte fmt chunk
    bad_sr = _wav_with_fmt(struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16))
    rows = [
        (1, "audio", bytearray(good), None),
        (2, "audio", bytearray(bad_fmt), None),
        (3, "audio", bytearray(bad_sr), None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, meta string",
    )
    out = {
        r.media_id: r.decoded
        for r in extract_audio_features(df).collect()
    }
    assert out == {1: True, 2: False, 3: False}


# ---------------------------------------------------------------- #2


def test_txn_first_create_conflicts_with_concurrent_creator(
    spark, tmp_path
):
    """TOCTOU between the phase-1 head check and the publish: a
    concurrent writer creates the table right after phase 1 reads
    head=None. The publish must land as kind='create' (conflicts on
    any existing version), not an unchecked overwrite."""
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    orig = VersionedTable(spark, str(tmp_path / "fresh8"))
    cat.register("fresh8", orig)
    cat.sql("BEGIN TRANSACTION")
    spark.createDataFrame([(1, "txn")], "id long, s string") \
        .createOrReplaceTempView("fresh8_src")
    cat.sql("INSERT INTO fresh8 SELECT * FROM fresh8_src")

    # wrap latest_version so the concurrent create lands immediately
    # AFTER the phase-1 check observes head=None
    real_lv = orig.latest_version
    state = {"fired": False}

    def lv():
        head = real_lv()
        if not state["fired"]:
            state["fired"] = True
            concurrent = spark.createDataFrame(
                [(9, "concurrent")], "id long, s string"
            )
            VersionedTable(spark, str(tmp_path / "fresh8")).create(
                concurrent
            )
        return head

    orig.latest_version = lv
    try:
        with pytest.raises(TransactionConflict):
            cat.sql("COMMIT")
    finally:
        del orig.latest_version
    # the concurrent writer's v1 survived untouched
    assert orig.latest_version() == 1
    vals = [r.s for r in orig.read().collect()]
    assert vals == ["concurrent"]


def test_txn_first_create_publishes_kind_create(spark, tmp_path):
    cat = LakeCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.register("fresh8b", VersionedTable(spark, str(tmp_path / "f8b")))
    cat.sql("BEGIN TRANSACTION")
    spark.createDataFrame([(1, "x")], "id long, s string") \
        .createOrReplaceTempView("f8b_src")
    cat.sql("INSERT INTO fresh8b SELECT * FROM f8b_src")
    cat.sql("COMMIT")
    tbl = cat.tables["fresh8b"]
    assert tbl.latest_version() == 1
    assert tbl._load_manifest(1)["kind"] == "create"


# ---------------------------------------------------------------- #3


def test_vacuum_purges_files_cache(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.create(spark.createDataFrame([(1,)], "id long"))
    t.overwrite(spark.createDataFrame([(2,)], "id long"), expected_base=1)
    t.overwrite(spark.createDataFrame([(3,)], "id long"), expected_base=2)
    t._files(1)  # warm the cache for the soon-vacuumed version
    t._files(2)
    t.vacuum(retain_last=1)
    for v in (1, 2):
        with pytest.raises(VersionNotFound):
            t._files(v)
    assert [r.id for r in t.read().collect()] == [3]


# ---------------------------------------------------------------- #4


def test_backticked_dashed_project_id_not_a_comment():
    from bigquery_etl_spark.sources.bq_dialect import translate

    # consecutive hyphens INSIDE a backticked path must not start a
    # line-comment island; the rest of the statement still translates
    out = translate(
        "SELECT SAFE_DIVIDE(a, b) AS r FROM `my--proj.ds.t` WHERE x = 1"
    )
    assert "--" not in out.split("FROM")[0]  # fn segment untouched
    assert "t" in out and "WHERE x = 1" in out
    # the dialect function AFTER the dashed path must still rewrite
    out2 = translate(
        "SELECT x FROM `a--b.ds.t2` WHERE SAFE_DIVIDE(x, y) > 0"
    )
    assert "SAFE_DIVIDE" not in out2.upper() or "try_divide" in out2
