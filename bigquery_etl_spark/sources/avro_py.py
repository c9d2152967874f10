"""Pure-Python Avro Object Container File source/sink (r4).

The container ships no spark-avro jar, so the JVM ``format("avro")``
path stays environment-gated — but Avro itself is a simple, fully
specified binary format (Apache Avro 1.11 spec: zigzag-varint longs,
length-prefixed bytes/strings, records as field concatenation, OCF =
magic + metadata map + sync-delimited blocks). This module implements
the format directly and keeps the SPARK side distributed:

- ``write_avro(df, path)``: one OCF file per partition via
  ``mapInPandas`` (executors encode their own partitions; the driver
  never sees data) — the same layout ``df.write`` produces.
- ``read_avro(spark, path)``: schema read driver-side from one file
  header; files decoded in parallel via ``binaryFile`` + ``mapInPandas``
  (each executor decodes whole files — OCF blocks are not split, the
  parallel unit is the file, matching how the writer sized them).

Type subset (documented, validated up front): null/boolean/int/long/
float/double/string/bytes, date (int/logical date), timestamp
(long/timestamp-micros), array<supported>, nested record. Nullable
Spark fields map to ``["null", T]`` unions — the standard mapping
spark-avro uses, so files interchange with the JVM reader/writer.
"""

from __future__ import annotations

import io
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes valid)


# -- schema mapping ----------------------------------------------------------


def _avro_type(dt: T.DataType, name: str) -> object:
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, (T.LongType, T.ShortType, T.ByteType)):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.ArrayType):
        item = _avro_type(dt.elementType, name + "_item")
        if dt.containsNull:
            item = ["null", item]
        return {"type": "array", "items": item}
    if isinstance(dt, T.StructType):
        return _record_schema(dt, name)
    raise TypeError(f"avro_py: unsupported Spark type {dt.simpleString()}")


def _record_schema(st: T.StructType, name: str) -> dict:
    fields = []
    for f in st.fields:
        t = _avro_type(f.dataType, f.name)
        if f.nullable:
            t = ["null", t]
        fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


def _spark_type(at: object) -> tuple[T.DataType, bool]:
    """Avro type -> (Spark type, nullable)."""
    if isinstance(at, list):  # union — only ["null", T] supported
        non_null = [t for t in at if t != "null"]
        if len(non_null) != 1:
            raise TypeError(f"avro_py: unsupported union {at}")
        inner, _ = _spark_type(non_null[0])
        return inner, True
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "date":
            return T.DateType(), False
        if lt == "timestamp-micros":
            return T.TimestampType(), False
        if at["type"] == "array":
            item, item_null = _spark_type(at["items"])
            return T.ArrayType(item, containsNull=item_null), False
        if at["type"] == "record":
            fields = []
            for f in at["fields"]:
                ft, fn = _spark_type(f["type"])
                fields.append(T.StructField(f["name"], ft, nullable=fn))
            return T.StructType(fields), False
        return _spark_type(at["type"])
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }
    if at in prim:
        return prim[at], False
    raise TypeError(f"avro_py: unsupported Avro type {at!r}")


# -- binary primitives -------------------------------------------------------


def _w_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while n & ~0x7F:
        buf.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    buf.write(bytes([n]))


def _r_long(mv: memoryview, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = mv[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _w_bytes(buf: io.BytesIO, b: bytes) -> None:
    _w_long(buf, len(b))
    buf.write(b)


# -- row encode/decode -------------------------------------------------------


def _encoder(dt: T.DataType, nullable: bool):
    """Value encoder closure for one Spark type."""
    base = _base_encoder(dt)
    if not nullable:
        return base

    def enc(buf, v):
        # Arrow->pandas represents a null ELEMENT of a numeric array as
        # NaN (numpy has no missing int), and a null timestamp as NaT —
        # same rule as the top-level column loop: for a nullable slot
        # all three mean NULL.
        is_missing = (
            v is None
            or (isinstance(v, float) and v != v)
            or v.__class__.__name__ == "NaTType"
        )
        if is_missing:
            _w_long(buf, 0)
        else:
            _w_long(buf, 1)
            base(buf, v)

    return enc


def _base_encoder(dt: T.DataType):
    import datetime

    if isinstance(dt, T.BooleanType):
        return lambda buf, v: buf.write(b"\x01" if v else b"\x00")
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return lambda buf, v: _w_long(buf, int(v))
    if isinstance(dt, T.FloatType):
        return lambda buf, v: buf.write(struct.pack("<f", float(v)))
    if isinstance(dt, T.DoubleType):
        return lambda buf, v: buf.write(struct.pack("<d", float(v)))
    if isinstance(dt, T.StringType):
        return lambda buf, v: _w_bytes(buf, str(v).encode("utf-8"))
    if isinstance(dt, T.BinaryType):
        return lambda buf, v: _w_bytes(buf, bytes(v))
    if isinstance(dt, T.DateType):
        epoch = datetime.date(1970, 1, 1)

        def enc_date(buf, v):
            if hasattr(v, "date"):  # pandas Timestamp
                v = v.date()
            _w_long(buf, (v - epoch).days)

        return enc_date
    if isinstance(dt, T.TimestampType):
        def enc_ts(buf, v):
            # pandas Timestamp / datetime -> micros since epoch (UTC)
            if hasattr(v, "to_pydatetime"):
                v = v.to_pydatetime()
            if v.tzinfo is None:
                v = v.replace(tzinfo=datetime.timezone.utc)
            _w_long(buf, int(v.timestamp() * 1_000_000))

        return enc_ts
    if isinstance(dt, T.ArrayType):
        item = _encoder(dt.elementType, dt.containsNull)

        def enc_arr(buf, v):
            v = list(v)
            if v:
                _w_long(buf, len(v))
                for x in v:
                    item(buf, x)
            _w_long(buf, 0)

        return enc_arr
    if isinstance(dt, T.StructType):
        fields = [(f.name, _encoder(f.dataType, f.nullable)) for f in dt.fields]

        def enc_rec(buf, v):
            for fname, fenc in fields:
                fenc(buf, v[fname] if not hasattr(v, fname) else getattr(v, fname))

        return enc_rec
    raise TypeError(f"avro_py: unsupported type {dt.simpleString()}")


def _decoder(dt: T.DataType, nullable: bool):
    base = _base_decoder(dt)
    if not nullable:
        return base

    def dec(mv, pos):
        branch, pos = _r_long(mv, pos)
        if branch == 0:
            return None, pos
        return base(mv, pos)

    return dec


def _base_decoder(dt: T.DataType):
    import datetime

    if isinstance(dt, T.BooleanType):
        return lambda mv, pos: (mv[pos] == 1, pos + 1)
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return _r_long
    if isinstance(dt, T.FloatType):
        return lambda mv, pos: (
            struct.unpack_from("<f", mv, pos)[0],
            pos + 4,
        )
    if isinstance(dt, T.DoubleType):
        return lambda mv, pos: (
            struct.unpack_from("<d", mv, pos)[0],
            pos + 8,
        )
    if isinstance(dt, T.StringType):
        def dec_str(mv, pos):
            n, pos = _r_long(mv, pos)
            return bytes(mv[pos : pos + n]).decode("utf-8"), pos + n

        return dec_str
    if isinstance(dt, T.BinaryType):
        def dec_bytes(mv, pos):
            n, pos = _r_long(mv, pos)
            return bytes(mv[pos : pos + n]), pos + n

        return dec_bytes
    if isinstance(dt, T.DateType):
        epoch = datetime.date(1970, 1, 1)

        def dec_date(mv, pos):
            days, pos = _r_long(mv, pos)
            return epoch + datetime.timedelta(days=days), pos

        return dec_date
    if isinstance(dt, T.TimestampType):
        def dec_ts(mv, pos):
            micros, pos = _r_long(mv, pos)
            return (
                datetime.datetime.fromtimestamp(
                    micros / 1_000_000, tz=datetime.timezone.utc
                ).replace(tzinfo=None),
                pos,
            )

        return dec_ts
    if isinstance(dt, T.ArrayType):
        item = _decoder(dt.elementType, dt.containsNull)

        def dec_arr(mv, pos):
            out = []
            while True:
                n, pos = _r_long(mv, pos)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix (spec-legal)
                    _, pos = _r_long(mv, pos)
                    n = -n
                for _ in range(n):
                    v, pos = item(mv, pos)
                    out.append(v)
            return out, pos

        return dec_arr
    if isinstance(dt, T.StructType):
        fields = [(f.name, _decoder(f.dataType, f.nullable)) for f in dt.fields]

        def dec_rec(mv, pos):
            out = {}
            for fname, fdec in fields:
                out[fname], pos = fdec(mv, pos)
            return out, pos

        return dec_rec
    raise TypeError(f"avro_py: unsupported type {dt.simpleString()}")


# -- OCF ---------------------------------------------------------------------


def _header(schema_json: str, codec: str = "null") -> bytes:
    buf = io.BytesIO()
    buf.write(MAGIC)
    _w_long(buf, 2)  # metadata map: one block of 2 entries
    _w_bytes(buf, b"avro.schema")
    _w_bytes(buf, schema_json.encode("utf-8"))
    _w_bytes(buf, b"avro.codec")
    _w_bytes(buf, codec.encode())
    _w_long(buf, 0)  # map terminator
    buf.write(SYNC)
    return buf.getvalue()


# Avro `deflate` codec = raw DEFLATE (RFC 1951): no zlib header, no
# checksum — hence wbits=-15 on both sides (Avro spec §Object Container
# Files / Required Codecs).
def _deflate(data: bytes) -> bytes:
    import zlib

    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _inflate(data: bytes) -> bytes:
    import zlib

    return zlib.decompress(data, -15)


# Remaining spec codecs (Avro spec §Object Container Files):
# - snappy: raw-snappy block + 4-byte BIG-ENDIAN CRC32 of the
#   UNCOMPRESSED bytes (the only codec with a checksum suffix). Arrow
#   ships snappy, so no new dependency; raw snappy prefixes the
#   uncompressed length as a varint, which pyarrow's decompress needs
#   passed explicitly.
# - bzip2 / xz: plain streams, stdlib bz2 / lzma.
# - zstandard: plain zstd frames, Arrow codec.
def _snappy_uncompressed_len(data: bytes) -> int:
    result = shift = 0
    for byte in data:
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result
        shift += 7
    raise ValueError("truncated snappy varint header")


def _snappy_compress(data: bytes) -> bytes:
    import struct
    import zlib

    import pyarrow as pa

    return bytes(pa.Codec("snappy").compress(data)) + struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )


def _snappy_decompress(data: bytes) -> bytes:
    import struct
    import zlib

    import pyarrow as pa

    comp, crc = bytes(data[:-4]), data[-4:]
    out = bytes(
        pa.Codec("snappy").decompress(
            comp, decompressed_size=_snappy_uncompressed_len(comp)
        )
    )
    if zlib.crc32(out) & 0xFFFFFFFF != struct.unpack(">I", crc)[0]:
        raise OSError("avro snappy block CRC mismatch (corrupt block)")
    return out


def _bzip2_compress(data: bytes) -> bytes:
    import bz2

    return bz2.compress(data)


def _bzip2_decompress(data: bytes) -> bytes:
    import bz2

    return bz2.decompress(data)


def _xz_compress(data: bytes) -> bytes:
    import lzma

    return lzma.compress(data, format=lzma.FORMAT_XZ)


def _xz_decompress(data: bytes) -> bytes:
    import lzma

    return lzma.decompress(data, format=lzma.FORMAT_XZ)


def _zstd_compress(data: bytes) -> bytes:
    import pyarrow as pa

    return bytes(pa.Codec("zstd").compress(data))


def _zstd_decompress(data: bytes) -> bytes:
    import pyarrow as pa

    # Codec.decompress demands an up-front size; the streaming reader
    # walks the zstd frame itself and needs none.
    with pa.input_stream(pa.BufferReader(data), compression="zstd") as f:
        return f.read()


CODECS: dict[str, tuple] = {
    "null": (lambda b: b, lambda b: b),
    "deflate": (_deflate, _inflate),
    "snappy": (_snappy_compress, _snappy_decompress),
    "bzip2": (_bzip2_compress, _bzip2_decompress),
    "xz": (_xz_compress, _xz_decompress),
    "zstandard": (_zstd_compress, _zstd_decompress),
}


def _read_header(mv: memoryview) -> tuple[dict, bytes, int]:
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("not an Avro object container file")
    pos, meta = 4, {}
    while True:
        n, pos = _r_long(mv, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _r_long(mv, pos)
            n = -n
        for _ in range(n):
            klen, pos = _r_long(mv, pos)
            k = bytes(mv[pos : pos + klen]).decode()
            pos += klen
            vlen, pos = _r_long(mv, pos)
            meta[k] = bytes(mv[pos : pos + vlen])
            pos += vlen
    sync = bytes(mv[pos : pos + 16])
    return meta, sync, pos + 16


def write_avro(
    df: DataFrame,
    path: str,
    rows_per_block: int = 4096,
    codec: str = "null",
) -> None:
    """Write ``df`` as a directory of Avro OCF part files (one per
    partition, encoded on the executors). ``codec``: any spec codec —
    null, deflate, snappy, bzip2, xz, zstandard (r5 full matrix;
    snappy/zstandard via Arrow's bundled codecs, bzip2/xz stdlib)."""
    if codec not in CODECS:
        raise NotImplementedError(
            f"avro_py writes {sorted(CODECS)}, not {codec!r}"
        )
    os.makedirs(path, exist_ok=True)
    schema = df.schema
    schema_json = json.dumps(_record_schema(schema, "spark_row"))
    encs = [
        (f.name, _encoder(f.dataType, f.nullable), f.nullable)
        for f in schema.fields
    ]

    def write_part(batches):
        import uuid

        import pandas as pd

        out_path = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        n_rows = 0
        with open(out_path, "wb") as fh:
            fh.write(_header(schema_json, codec))
            block = io.BytesIO()
            block_n = 0

            def flush():
                nonlocal block, block_n
                if block_n:
                    payload = CODECS[codec][0](block.getvalue())
                    head = io.BytesIO()
                    _w_long(head, block_n)
                    _w_long(head, len(payload))
                    fh.write(head.getvalue())
                    fh.write(payload)
                    fh.write(SYNC)
                    block, block_n = io.BytesIO(), 0

            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    for (fname, enc, nullable), v in zip(encs, row):
                        # Arrow hands Spark NULLs to pandas as None/NaT,
                        # or NaN for float64 columns — for a NULLABLE
                        # field all three mean NULL (the NaN case is the
                        # unavoidable pandas-float ambiguity). For a
                        # non-nullable field, NaN is a real double value
                        # and None/NaT is a contract violation worth a
                        # clear error, not an opaque encoder TypeError.
                        is_nan = isinstance(v, float) and v != v
                        is_missing = v is None or (
                            hasattr(v, "__class__")
                            and v.__class__.__name__ == "NaTType"
                        )
                        if nullable and (is_missing or is_nan):
                            enc(block, None)
                        elif is_missing:
                            raise ValueError(
                                f"NULL value in non-nullable Avro field "
                                f"{fname!r} (row {n_rows})"
                            )
                        else:
                            enc(block, v)
                    block_n += 1
                    n_rows += 1
                    if block_n >= rows_per_block:
                        flush()
            flush()
        yield pd.DataFrame({"path": [out_path], "rows": [n_rows]})

    manifest = df.mapInPandas(write_part, "path string, rows long")
    manifest.collect()  # drives the write; manifest rows are tiny


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or single file) of Avro OCF files written by
    ``write_avro`` or any spec-compliant writer using the supported
    type subset. Schema comes from one file header (driver-side);
    decoding fans out per file."""
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".avro")]
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        meta, _, _ = _read_header(memoryview(fh.read()))
    avro_schema = json.loads(meta["avro.schema"].decode())
    spark_schema, _ = _spark_type(avro_schema)
    codec = meta.get("avro.codec", b"null") or b"null"
    if codec.decode() not in CODECS:
        raise NotImplementedError(
            f"avro_py reads {sorted(CODECS)}, not {codec!r}"
        )
    decs = [
        (f.name, _decoder(f.dataType, f.nullable)) for f in spark_schema.fields
    ]
    # Plain float64 pandas columns lose the NaN-vs-NULL distinction at
    # the Arrow boundary (from_pandas maps NaN -> null); the masked
    # Float64/Float32 extension dtypes keep NaN a VALUE and None a null,
    # so decoded NaNs survive — incl. in non-nullable columns, where a
    # spurious null would crash the scan.
    _float_dtype = {
        f.name: ("float64" if isinstance(f.dataType, T.DoubleType) else "float32")
        for f in spark_schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    }

    def _masked_float(vals, np_dtype):
        # pd.array() would coerce NaN inputs to NA too — the explicit
        # mask constructor is the only way to keep decoded NaN a value
        # while None stays a null.
        import numpy as np
        import pandas as pd

        data = np.array(
            [float("nan") if v is None else v for v in vals], dtype=np_dtype
        )
        mask = np.array([v is None for v in vals], dtype=bool)
        return pd.arrays.FloatingArray(data, mask)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for _, file_row in pdf.iterrows():
                mv = memoryview(bytes(file_row["content"]))
                meta_f, sync, pos = _read_header(mv)
                codec_f = meta_f.get("avro.codec", b"null") or b"null"
                cols = {name: [] for name, _ in decs}
                while pos < len(mv):
                    n, pos = _r_long(mv, pos)
                    size, pos = _r_long(mv, pos)  # block byte size
                    block = mv[pos : pos + size]  # zero-copy slice
                    pos += size
                    if codec_f != b"null":
                        block = memoryview(CODECS[codec_f.decode()][1](bytes(block)))
                    bpos = 0
                    for _ in range(n):
                        for name, dec in decs:
                            v, bpos = dec(block, bpos)
                            cols[name].append(v)
                    assert bytes(mv[pos : pos + 16]) == sync, "sync mismatch"
                    pos += 16
                # non-float columns go out as OBJECT series: a bare
                # list of [None, ...] would infer float64 (NaN) and an
                # all-null date/binary/array column then fails Arrow's
                # double->target cast at the mapInPandas boundary
                yield pd.DataFrame(
                    {
                        name: (
                            _masked_float(vals, _float_dtype[name])
                            if name in _float_dtype
                            else pd.Series(vals, dtype="object")
                        )
                        for name, vals in cols.items()
                    }
                )

    binary = spark.read.format("binaryFile").load(files)
    return binary.select("content").mapInPandas(decode, spark_schema)
