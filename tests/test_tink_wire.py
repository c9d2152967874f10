"""Tink keyset interop (r13, VERDICT r12 item 4): the wire codec is
differentially pinned against the (vendored) google.protobuf runtime
— an independent implementation of the same wire format — plus a
byte-exact static vector; the SQL surface accepts Tink's JSON keyset
format everywhere and KEYS.KEYSET_TO_JSON emits it; ciphertext bytes
are verified to be the exact Tink AesGcm layout with the independent
``cryptography`` AEAD."""
from __future__ import annotations

import base64
import json
import os

import pytest

from bigquery_etl_spark.functions import tink_wire as tw

KEY32 = bytes(range(32))
KS = {
    "primaryKeyId": 123456,
    "key": [
        {
            "keyId": 123456,
            "status": "ENABLED",
            "type": "AES_GCM_256",
            "rawKey": base64.b64encode(KEY32).decode(),
        }
    ],
}


def test_wire_roundtrip_all_key_types():
    ks = {
        "primaryKeyId": 99,
        "key": [
            {"keyId": 99, "status": "ENABLED", "type": "AES_GCM_256",
             "rawKey": base64.b64encode(os.urandom(32)).decode()},
            {"keyId": 7, "status": "DISABLED", "type": "AES_GCM_RAW",
             "rawKey": base64.b64encode(os.urandom(16)).decode()},
            {"keyId": 8, "status": "ENABLED", "type": "AES_SIV_CMAC_256",
             "rawKey": base64.b64encode(os.urandom(64)).decode()},
            {"keyId": 9, "status": "ENABLED", "type": "AES_SIV_CMAC_RAW",
             "rawKey": base64.b64encode(os.urandom(64)).decode()},
        ],
    }
    assert tw.parse_keyset(tw.serialize_keyset(ks)) == ks
    assert tw.from_tink_json(tw.to_tink_json(ks)) == ks


def test_wire_static_vector():
    """Byte-exact wire form of a fixed keyset, hand-derived from the
    public proto definitions (pinned so a codec regression is a diff,
    not a silent drift)."""
    wire = tw.serialize_keyset(KS)
    expected = (
        # Keyset.primary_key_id = 123456 (varint 0xc0c407)
        "08c0c407"
        # Keyset.key[0]: len 98
        "1262"
        # KeyData: len 88
        "0a58"
        # type_url (len 48)
        "0a30" + "type.googleapis.com/google.crypto.tink.AesGcmKey"
        .encode().hex()
        # value = AesGcmKey{key_value(3) = KEY32} (len 34)
        + "1222" + "1a20" + KEY32.hex()
        # key_material_type = SYMMETRIC(1)
        + "1801"
        # status = ENABLED(1), key_id, output_prefix_type = TINK(1)
        + "1001" + "18c0c407" + "2001"
    )
    assert wire.hex() == expected


def test_wire_differential_vs_protobuf_runtime():
    from bigquery_etl_spark._vendor import enable_vendored_protobuf

    enable_vendored_protobuf()
    try:
        from google.protobuf import (
            descriptor_pb2,
            descriptor_pool,
            message_factory,
        )
    except ImportError:
        pytest.skip("protobuf runtime not available")

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "tink_t.proto"
    fdp.package = "tt"
    fdp.syntax = "proto3"
    kd = fdp.message_type.add()
    kd.name = "KeyData"
    for n, num, ty in (("type_url", 1, 9), ("value", 2, 12),
                       ("key_material_type", 3, 13)):
        f = kd.field.add()
        f.name, f.number, f.type, f.label = n, num, ty, 1
    key = fdp.message_type.add()
    key.name = "Key"
    f = key.field.add()
    f.name, f.number, f.type, f.label = "key_data", 1, 11, 1
    f.type_name = ".tt.KeyData"
    for n, num in (("status", 2), ("key_id", 3),
                   ("output_prefix_type", 4)):
        f = key.field.add()
        f.name, f.number, f.type, f.label = n, num, 13, 1
    kset = fdp.message_type.add()
    kset.name = "Keyset"
    f = kset.field.add()
    f.name, f.number, f.type, f.label = "primary_key_id", 1, 13, 1
    f = kset.field.add()
    f.name, f.number, f.type, f.label = "key", 2, 11, 3
    f.type_name = ".tt.Key"
    gcm = fdp.message_type.add()
    gcm.name = "AesGcmKey"
    f = gcm.field.add()
    f.name, f.number, f.type, f.label = "version", 1, 13, 1
    f = gcm.field.add()
    f.name, f.number, f.type, f.label = "key_value", 3, 12, 1

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)

    def cls(name):
        desc = pool.FindMessageTypeByName(f"tt.{name}")
        try:
            return message_factory.GetMessageClass(desc)
        except AttributeError:
            return message_factory.MessageFactory(pool).GetPrototype(desc)

    Keyset, AesGcmKey = cls("Keyset"), cls("AesGcmKey")
    gk = AesGcmKey()
    gk.key_value = KEY32
    m = Keyset()
    m.primary_key_id = 123456
    e = m.key.add()
    e.key_data.type_url = (
        "type.googleapis.com/google.crypto.tink.AesGcmKey"
    )
    e.key_data.value = gk.SerializeToString(deterministic=True)
    e.key_data.key_material_type = 1
    e.status = 1
    e.key_id = 123456
    e.output_prefix_type = 1
    assert m.SerializeToString(deterministic=True) == \
        tw.serialize_keyset(KS)
    # and our parser reads the runtime's bytes back
    assert tw.parse_keyset(m.SerializeToString(deterministic=True)) == KS


def test_daead_accepts_wire_and_tink_json():
    from bigquery_etl_spark.functions import daead as D

    ks = {
        "primaryKeyId": 42,
        "key": [{"keyId": 42, "status": "ENABLED",
                 "type": "AES_SIV_CMAC_256",
                 "rawKey": base64.b64encode(os.urandom(64)).decode()}],
    }
    ct = D.daead_encrypt(json.dumps(ks).encode(), b"pt", b"ad")
    # identical ciphertext from the wire and Tink-JSON forms
    assert D.daead_encrypt(tw.serialize_keyset(ks), b"pt", b"ad") == ct
    assert D.daead_encrypt(tw.to_tink_json(ks).encode(), b"pt", b"ad") == ct
    assert D.daead_decrypt(tw.serialize_keyset(ks), ct, b"ad") == b"pt"


# ---------------------------------------------------------------- SQL surface
def test_keyset_to_json_emits_tink_format(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    r = cat.bq_sql(
        "SELECT ks, KEYS.KEYSET_TO_JSON(ks) AS tj, "
        "AEAD.ENCRYPT(ks, 'hello', 'ad') AS ct "
        "FROM (SELECT KEYS.NEW_KEYSET('AEAD_AES_GCM_256') AS ks)"
    ).collect()[0]
    d = json.loads(r.tj)
    assert d["key"][0]["keyData"]["typeUrl"].endswith("AesGcmKey")
    assert d["key"][0]["keyData"]["keyMaterialType"] == "SYMMETRIC"
    assert d["key"][0]["outputPrefixType"] == "TINK"
    internal = json.loads(bytes(r.ks).decode())
    # the Tink-JSON key bytes equal the internal key bytes
    assert tw.from_tink_json(r.tj)["key"][0]["rawKey"] == \
        internal["key"][0]["rawKey"]
    # ciphertext is the exact Tink AesGcm layout: 0x01‖keyId then
    # IV(12)‖ct‖tag(16) — verified with the independent cryptography lib
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    ct = bytes(r.ct)
    assert ct[:1] == b"\x01"
    assert int.from_bytes(ct[1:5], "big") == internal["primaryKeyId"]
    key = base64.b64decode(internal["key"][0]["rawKey"])
    assert AESGCM(key).decrypt(ct[5:17], ct[17:], b"ad") == b"hello"


def test_sql_accepts_tink_json_keyset(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    r = cat.bq_sql(
        "SELECT ks, KEYS.KEYSET_TO_JSON(ks) AS tj, "
        "AEAD.ENCRYPT(ks, 'secret', 'aad') AS ct "
        "FROM (SELECT KEYS.NEW_KEYSET('AEAD_AES_GCM_256') AS ks)"
    ).collect()[0]
    spark.createDataFrame(
        [(r.tj, bytes(r.ct))], "tj string, ct binary"
    ).createOrReplaceTempView("__tk13")
    out = cat.bq_sql(
        "SELECT AEAD.DECRYPT_STRING(CAST(tj AS BYTES), ct, 'aad') AS pt, "
        "KEYS.KEYSET_LENGTH(CAST(tj AS BYTES)) AS n FROM __tk13"
    ).collect()[0]
    assert out.pt == "secret" and out.n == 1
    # KEYSET_FROM_JSON normalizes the Tink document to internal bytes
    out2 = cat.bq_sql(
        "SELECT AEAD.DECRYPT_STRING(KEYS.KEYSET_FROM_JSON(tj), ct, "
        "'aad') AS pt FROM __tk13"
    ).collect()[0]
    assert out2.pt == "secret"


def test_siv_wire_keyset_roundtrip_on_spark(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    r = cat.bq_sql(
        "SELECT KEYS.NEW_KEYSET('DETERMINISTIC_AEAD_AES_SIV_CMAC_256') "
        "AS ks"
    ).collect()[0]
    wire = tw.serialize_keyset(json.loads(bytes(r.ks).decode()))
    spark.createDataFrame([(wire,)], "ks binary").createOrReplaceTempView(
        "__wk13"
    )
    out = cat.bq_sql(
        "SELECT AEAD.DETERMINISTIC_DECRYPT_STRING(ks, "
        "AEAD.DETERMINISTIC_ENCRYPT(ks, 'det', 'ad2'), 'ad2') AS pt "
        "FROM __wk13"
    ).collect()[0]
    assert out.pt == "det"
