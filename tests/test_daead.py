"""AEAD.DETERMINISTIC_* — RFC 5297 AES-SIV (r12, VERDICT r11 item 8).

Layers: the RFC 5297 A.1 published vector pinned against the
underlying AESSIV primitive (proving the library implements the
public algorithm), then the SQL surface end-to-end — determinism,
roundtrip, Tink prefix shape, rotation, RAW keys, auth failure,
NULLs, and the GCM/SIV keyset-type separation.
"""

from __future__ import annotations

import pytest

from bigquery_etl_spark.functions.daead import daead_decrypt, daead_encrypt


def test_rfc5297_a1_vector():
    """RFC 5297 Appendix A.1 (deterministic authenticated encryption
    example): pins the AESSIV primitive to the published output."""
    pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives.ciphers.aead import AESSIV

    key = bytes.fromhex(
        "fffefdfcfbfaf9f8f7f6f5f4f3f2f1f0"
        "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff"
    )
    ad = bytes.fromhex(
        "101112131415161718191a1b1c1d1e1f2021222324252627"
    )
    pt = bytes.fromhex("112233445566778899aabbccddee")
    want = bytes.fromhex(
        "85632d07c6e8f37f950acd320a2ecc93"
        "40c02b9690c4dc04daef7f6afe5c"
    )
    assert AESSIV(key).encrypt(pt, [ad]) == want
    assert AESSIV(key).decrypt(want, [ad]) == pt


def _keyset(raw64: bytes, key_id: int = 7, typ: str = "AES_SIV_CMAC_256"):
    import base64
    import json

    return json.dumps({
        "primaryKeyId": key_id,
        "key": [{
            "keyId": key_id, "status": "ENABLED", "type": typ,
            "rawKey": base64.b64encode(raw64).decode(),
        }],
    }).encode()


def test_python_layer_roundtrip_and_prefix():
    ks = _keyset(bytes(range(64)))
    ct = daead_encrypt(ks, b"hello", b"ad")
    assert ct[:1] == b"\x01" and int.from_bytes(ct[1:5], "big") == 7
    assert daead_decrypt(ks, ct, b"ad") == b"hello"
    assert daead_encrypt(ks, b"hello", b"ad") == ct  # deterministic
    with pytest.raises(ValueError, match="decryption failed"):
        daead_decrypt(ks, ct, b"WRONG")
    # RAW key type: no prefix, decrypts the bare ciphertext
    ks_raw = _keyset(bytes(range(64)), typ="AES_SIV_CMAC_RAW")
    ct_raw = daead_encrypt(ks_raw, b"hello", b"ad")
    assert ct_raw == ct[5:]
    assert daead_decrypt(ks_raw, ct_raw, b"ad") == b"hello"
    # NULLs propagate
    assert daead_encrypt(None, b"x", b"a") is None
    assert daead_decrypt(ks, None, b"a") is None


def test_sql_surface_end_to_end(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    row = cat.bq_sql("""
      WITH ks AS (SELECT
          KEYS.NEW_KEYSET('DETERMINISTIC_AEAD_AES_SIV_CMAC_256') AS k),
      e AS (SELECT k,
          AEAD.DETERMINISTIC_ENCRYPT(k, 'secret-1', 'ad') AS c1,
          AEAD.DETERMINISTIC_ENCRYPT(k, 'secret-1', 'ad') AS c2,
          AEAD.DETERMINISTIC_ENCRYPT(k, 'secret-2', 'ad') AS c3
        FROM ks)
      SELECT c1 = c2 AS det, c1 = c3 AS collide,
             AEAD.DETERMINISTIC_DECRYPT_STRING(k, c1, 'ad') AS pt,
             LENGTH(c1) AS ln,
             SUBSTRING(c1, 1, 1) = UNHEX('01') AS tink,
             KEYS.KEYSET_LENGTH(k) AS nkeys
      FROM e
    """).collect()[0]
    assert row.det is True and row.collide is False
    assert row.pt == "secret-1"
    assert row.ln == 5 + 16 + len("secret-1")  # prefix + SIV + pt
    assert row.tink is True and row.nkeys == 1


def test_sql_rotation_and_raw_key(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    row = cat.bq_sql("""
      WITH ks AS (SELECT
          KEYS.NEW_KEYSET('DETERMINISTIC_AEAD_AES_SIV_CMAC_256') AS k),
      e AS (SELECT k, AEAD.DETERMINISTIC_ENCRYPT(k, 'old', 'a') AS c
            FROM ks),
      r AS (SELECT c, KEYS.ROTATE_KEYSET(k,
          'DETERMINISTIC_AEAD_AES_SIV_CMAC_256') AS k2 FROM e)
      SELECT AEAD.DETERMINISTIC_DECRYPT_STRING(k2, c, 'a') AS pt,
             KEYS.KEYSET_LENGTH(k2) AS nkeys
      FROM r
    """).collect()[0]
    assert row.pt == "old" and row.nkeys == 2
    # a 64-byte RAW key added from raw bytes encrypts/decrypts bare
    row2 = cat.bq_sql("""
      WITH ks AS (SELECT KEYS.ADD_KEY_FROM_RAW_BYTES(
          KEYS.NEW_KEYSET('DETERMINISTIC_AEAD_AES_SIV_CMAC_256'),
          'AES_SIV', CAST(REPEAT('k', 64) AS BYTES)) AS k)
      SELECT AEAD.DETERMINISTIC_DECRYPT_STRING(k,
          AEAD.DETERMINISTIC_ENCRYPT(k, 'msg', 'x'), 'x') AS pt
      FROM ks
    """).collect()[0]
    assert row2.pt == "msg"


def test_gcm_keyset_refuses_deterministic(spark):
    from bigquery_etl_spark.sources.lake_sql import LakeCatalog

    cat = LakeCatalog(spark)
    with pytest.raises(Exception, match="AES_SIV"):
        cat.bq_sql("""
          WITH ks AS (SELECT KEYS.NEW_KEYSET('AEAD_AES_GCM_256') AS k)
          SELECT AEAD.DETERMINISTIC_ENCRYPT(k, 'x', 'a') FROM ks
        """).collect()
