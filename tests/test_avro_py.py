"""Pure-Python Avro OCF source/sink (sources/avro_py.py — r4, closes
the spark-avro-jar environment gap with a spec-level implementation)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_etl_spark.sources.avro_py import read_avro, write_avro


def test_avro_roundtrip_all_types(spark, tmp_path):
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("small", T.IntegerType(), True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField(
            "nested",
            T.StructType([
                T.StructField("a", T.LongType(), True),
                T.StructField("b", T.StringType(), True),
            ]),
            True,
        ),
    ])
    rows = [
        (1, "alpha", True, 1.5, 7, b"\x00\xff", datetime.date(2024, 3, 1),
         datetime.datetime(2024, 3, 1, 12, 30, 15, 250000),
         ["x", None, "z"], {"a": 10, "b": "in"}),
        (2, None, None, None, None, None, None, None, None, None),
        (3, "γräφ", False, -0.25, -7, b"", datetime.date(1969, 12, 31),
         datetime.datetime(1970, 1, 1, 0, 0, 1),
         [], {"a": None, "b": None}),
    ]
    df = spark.createDataFrame(rows, schema).repartition(2)
    out = str(tmp_path / "avro_all")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema == schema

    def canon(d):
        return sorted(
            (
                r.id, r.name, r.flag, r.score, r.small,
                bytes(r.blob) if r.blob is not None else None,
                r.d, r.ts, tuple(r.tags) if r.tags is not None else None,
                (r.nested.a, r.nested.b) if r.nested is not None else None,
            )
            for r in d.collect()
        )

    assert canon(back) == canon(df)


def test_avro_roundtrip_orders_aggregate(spark, sf_dir, tmp_path):
    from bigquery_etl_spark.sources import load

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_avro")
    write_avro(o, out)
    back = read_avro(spark, out)
    a = o.agg(F.count("*"), F.sum("o_orderkey")).collect()[0]
    b = back.agg(F.count("*"), F.sum("o_orderkey")).collect()[0]
    assert tuple(a) == tuple(b)


def test_avro_multi_block_and_multi_file(spark, tmp_path):
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).cast("int").alias("m")
    ).repartition(4)
    out = str(tmp_path / "blocks")
    write_avro(df, out, rows_per_block=100)
    import os

    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 4
    back = read_avro(spark, out)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))


def test_avro_rejects_unsupported_type(spark, tmp_path):
    df = spark.createDataFrame([({"k": 1},)], "m map<string,int>")
    with pytest.raises(TypeError, match="unsupported"):
        write_avro(df, str(tmp_path / "bad"))


def test_avro_interop_with_jvm_reader(spark, tmp_path):
    """Capability-probed cross-check: when the spark-avro jar appears
    in the container, files written by avro_py must read back through
    the JVM ``format('avro')`` reader byte-compatibly (skips until
    then — same auto-ungate pattern as the protobuf/PIL probes)."""
    probe = str(tmp_path / "probe")
    try:
        spark.range(1).write.format("avro").save(probe)
    except Exception as exc:  # noqa: BLE001
        pytest.skip(f"spark-avro not bundled: {str(exc)[:80]}")
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, None)], "id long, s string, x double"
    )
    out = str(tmp_path / "interop")
    write_avro(df, out)
    back = spark.read.format("avro").load(out + "/*.avro")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_deflate_roundtrip(spark, tmp_path):
    """r5: codec=deflate (raw-DEFLATE blocks per the Avro spec) must
    round-trip bit-exact and actually compress repetitive data."""
    import os

    df = spark.range(0, 5_000).select(
        F.col("id"),
        F.lit("the same repetitive payload " * 4).alias("txt"),
        (F.col("id") % 3).cast("double").alias("x"),
    ).repartition(2)
    out_n = str(tmp_path / "null")
    out_d = str(tmp_path / "deflate")
    write_avro(df, out_n, rows_per_block=500)
    write_avro(df, out_d, rows_per_block=500, codec="deflate")

    def total(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p) if f.endswith(".avro")
        )

    assert total(out_d) < total(out_n) / 5  # repetitive text: >5x smaller
    back = read_avro(spark, out_d)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_deflate_interop_with_jvm_reader(spark, tmp_path):
    probe = str(tmp_path / "probe")
    try:
        spark.range(1).write.format("avro").save(probe)
    except Exception as exc:  # noqa: BLE001
        pytest.skip(f"spark-avro not bundled: {str(exc)[:80]}")
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, None)], "id long, s string, x double"
    )
    out = str(tmp_path / "interop_deflate")
    write_avro(df, out, codec="deflate")
    back = spark.read.format("avro").load(out + "/*.avro")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("codec", ["snappy", "bzip2", "xz", "zstandard"])
def test_avro_full_codec_matrix_roundtrip(spark, tmp_path, codec):
    """r5: every spec codec round-trips the full supported type set —
    snappy (raw block + BE CRC32 of the uncompressed bytes), bzip2,
    xz, zstandard. The codec layer wraps whole blocks, so one
    all-types block per codec exercises the complete path."""
    import datetime

    df = spark.createDataFrame(
        [
            (1, "a", 2.5, True, b"\x00\x01", datetime.date(2024, 1, 2),
             datetime.datetime(2024, 1, 2, 3, 4, 5, 123456), [1, 2, None]),
            (2, None, None, None, None, None, None, None),
        ],
        "id long, s string, x double, b boolean, raw binary, d date, "
        "ts timestamp, arr array<long>",
    )
    out = str(tmp_path / codec)
    write_avro(df, out, rows_per_block=100, codec=codec)
    back = read_avro(spark, out)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_unknown_codec_refused(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="lz77"):
        write_avro(spark.range(1), str(tmp_path / "x"), codec="lz77")


def test_avro_snappy_crc_detects_corruption(spark, tmp_path):
    """The snappy CRC32 suffix is load-bearing: flip one byte of the
    compressed block and the read must fail loudly, not hand back
    wrong rows."""
    import glob
    import os

    df = spark.range(0, 100).selectExpr("id", "repeat('abc', 50) as s")
    out = str(tmp_path / "sn")
    write_avro(df, out, codec="snappy")
    f = glob.glob(os.path.join(out, "*.avro"))[0]
    data = bytearray(open(f, "rb").read())
    data[-30] ^= 0xFF  # inside the final block's compressed payload
    open(f, "wb").write(bytes(data))
    with pytest.raises(Exception):  # CRC mismatch or snappy frame error
        read_avro(spark, out).collect()


def test_avro_nan_preserved_and_nonnullable_null_rejected(spark, tmp_path):
    """r5 (ADVICE): NaN in a NON-nullable double column is a real value
    and must survive the round trip (not silently become NULL); a NULL
    in a non-nullable field raises a descriptive error."""
    import math

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("x", T.DoubleType(), False),
    ])
    df = spark.createDataFrame([(1, float("nan")), (2, 2.5)], schema)
    out = str(tmp_path / "nan")
    write_avro(df, out)
    got = {r.id: r.x for r in read_avro(spark, out).collect()}
    assert math.isnan(got[1]) and got[2] == 2.5
    # (the None-in-non-nullable case cannot reach our encoder through a
    # DataFrame: Spark's Arrow serialization rejects it upstream with
    # "Value at index is null"; write_avro's own ValueError guard is a
    # second line of defense for hand-built batches)
