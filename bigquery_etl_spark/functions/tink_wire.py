"""Tink keyset wire + JSON formats (r13, VERDICT r12 item 4).

The engine's internal keyset document is the small JSON shape
``{"primaryKeyId": n, "key": [{"keyId", "status", "type",
"rawKey"}]}`` — SQL-parseable, which keeps the GCM path pure codegen.
Real BigQuery/Tink estates exchange keysets as (a) the serialized
``google.crypto.tink.Keyset`` protobuf ("wire") and (b) Tink's JSON
keyset format (JsonKeysetReader/Writer). This module converts between
all three, from the PUBLIC proto definitions:

    message Keyset {
      uint32 primary_key_id = 1;
      message Key {
        KeyData key_data = 1;     // message
        KeyStatusType status = 2; // ENABLED=1 DISABLED=2 DESTROYED=3
        uint32 key_id = 3;
        OutputPrefixType output_prefix_type = 4;  // TINK=1 RAW=3
      }
      repeated Key key = 2;
    }
    message KeyData {
      string type_url = 1;
      bytes value = 2;            // serialized key proto
      KeyMaterialType key_material_type = 3;  // SYMMETRIC=1
    }
    message AesGcmKey { uint32 version = 1; bytes key_value = 3; }
    message AesSivKey { uint32 version = 1; bytes key_value = 2; }

Ciphertext bytes already interop (Tink prefix 0x01‖keyId, GCM body =
IV(12)‖ct‖tag(16), SIV per RFC 5297), so a keyset converted here
decrypts this engine's ciphertexts in Tink and vice versa.
Reference: BigQuery AEAD functions (delegated surface, reference
main.py:21, 49-50); Tink public protos (tink.proto, aes_gcm.proto,
aes_siv.proto).
"""

from __future__ import annotations

import base64
import json

_GCM_URL = "type.googleapis.com/google.crypto.tink.AesGcmKey"
_SIV_URL = "type.googleapis.com/google.crypto.tink.AesSivKey"

_STATUS_NUM = {"ENABLED": 1, "DISABLED": 2, "DESTROYED": 3}
_STATUS_NAME = {v: k for k, v in _STATUS_NUM.items()}
_PREFIX_NUM = {"TINK": 1, "LEGACY": 2, "RAW": 3, "CRUNCHY": 4}
_PREFIX_NAME = {v: k for k, v in _PREFIX_NUM.items()}


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if i >= len(b):
            raise ValueError("tink wire: truncated varint")
        c = b[i]
        n |= (c & 0x7F) << shift
        shift += 7
        i += 1
        if not (c & 0x80):
            return n, i


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _int_field(field: int, n: int) -> bytes:
    return b"" if n == 0 else _tag(field, 0) + _varint(n)


def _key_proto(key_bytes: bytes, siv: bool) -> bytes:
    """Serialized AesGcmKey/AesSivKey (version 0 omitted — proto3)."""
    return _len_field(2 if siv else 3, key_bytes)


def _internal_type(
    type_url: str, prefix: str, key_bytes: bytes
) -> str:
    if type_url == _SIV_URL:
        return "AES_SIV_CMAC_RAW" if prefix == "RAW" else "AES_SIV_CMAC_256"
    if type_url == _GCM_URL:
        if prefix == "RAW":
            return "AES_GCM_RAW"
        return "AES_GCM_256" if len(key_bytes) == 32 else "AES_GCM"
    raise ValueError(
        f"tink keyset: unsupported key type {type_url!r} (have "
        "AesGcmKey and AesSivKey)"
    )


def _type_info(internal_type: str) -> tuple[str, bool, str]:
    """internal type → (type_url, is_siv, output_prefix_type)."""
    siv = internal_type.startswith("AES_SIV")
    raw = internal_type.endswith("_RAW")
    return (
        _SIV_URL if siv else _GCM_URL,
        siv,
        "RAW" if raw else "TINK",
    )


def _parse_key_value(value: bytes, siv: bool) -> bytes:
    """key bytes out of a serialized AesGcmKey/AesSivKey."""
    i, field_want = 0, 2 if siv else 3
    key = None
    while i < len(value):
        tag, i = _read_varint(value, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            _, i = _read_varint(value, i)
        elif wire == 2:
            ln, i = _read_varint(value, i)
            payload = value[i : i + ln]
            i += ln
            if field == field_want:
                key = payload
        else:
            raise ValueError(f"tink wire: unsupported wire type {wire}")
    if key is None:
        raise ValueError("tink wire: key proto has no key_value")
    return key


# -- wire <-> internal --------------------------------------------------------
def serialize_keyset(ks: dict) -> bytes:
    """Internal keyset dict → serialized google.crypto.tink.Keyset."""
    out = _int_field(1, int(ks["primaryKeyId"]))
    for k in ks["key"]:
        url, siv, prefix = _type_info(str(k["type"]))
        key_bytes = base64.b64decode(k["rawKey"])
        kd = (
            _len_field(1, url.encode())
            + _len_field(2, _key_proto(key_bytes, siv))
            + _int_field(3, 1)  # SYMMETRIC
        )
        entry = (
            _len_field(1, kd)
            + _int_field(2, _STATUS_NUM[str(k["status"]).upper()])
            + _int_field(3, int(k["keyId"]))
            + _int_field(4, _PREFIX_NUM[prefix])
        )
        out += _len_field(2, entry)
    return out


def parse_keyset(b: bytes) -> dict:
    """Serialized google.crypto.tink.Keyset → internal keyset dict."""
    primary = 0
    keys = []
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 0:
            primary, i = _read_varint(b, i)
        elif field == 2 and wire == 2:
            ln, i = _read_varint(b, i)
            entry = b[i : i + ln]
            i += ln
            keys.append(_parse_key_entry(entry))
        elif wire == 0:
            _, i = _read_varint(b, i)
        elif wire == 2:
            ln, i = _read_varint(b, i)
            i += ln
        else:
            raise ValueError(f"tink wire: unsupported wire type {wire}")
    if not keys:
        raise ValueError("tink wire: keyset has no keys")
    return {"primaryKeyId": primary, "key": keys}


def _parse_key_entry(entry: bytes) -> dict:
    url = ""
    value = b""
    status = 0
    key_id = 0
    prefix = 0
    i = 0
    while i < len(entry):
        tag, i = _read_varint(entry, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # key_data
            ln, i = _read_varint(entry, i)
            kd = entry[i : i + ln]
            i += ln
            j = 0
            while j < len(kd):
                t2, j = _read_varint(kd, j)
                f2, w2 = t2 >> 3, t2 & 7
                if w2 == 2:
                    l2, j = _read_varint(kd, j)
                    p2 = kd[j : j + l2]
                    j += l2
                    if f2 == 1:
                        url = p2.decode()
                    elif f2 == 2:
                        value = p2
                elif w2 == 0:
                    _, j = _read_varint(kd, j)
                else:
                    raise ValueError("tink wire: bad KeyData")
        elif wire == 0:
            n, i = _read_varint(entry, i)
            if field == 2:
                status = n
            elif field == 3:
                key_id = n
            elif field == 4:
                prefix = n
        elif wire == 2:
            ln, i = _read_varint(entry, i)
            i += ln
        else:
            raise ValueError("tink wire: bad Keyset.Key")
    prefix_name = _PREFIX_NAME.get(prefix, "TINK")
    key_bytes = _parse_key_value(value, url == _SIV_URL)
    return {
        "keyId": key_id,
        "status": _STATUS_NAME.get(status, "DISABLED"),
        "type": _internal_type(url, prefix_name, key_bytes),
        "rawKey": base64.b64encode(key_bytes).decode(),
    }


# -- Tink JSON <-> internal ---------------------------------------------------
def to_tink_json(ks: dict) -> str:
    """Internal keyset dict → Tink's JSON keyset format (the document
    JsonKeysetReader accepts)."""
    out_keys = []
    for k in ks["key"]:
        url, siv, prefix = _type_info(str(k["type"]))
        key_bytes = base64.b64decode(k["rawKey"])
        out_keys.append(
            {
                "keyData": {
                    "typeUrl": url,
                    "value": base64.b64encode(
                        _key_proto(key_bytes, siv)
                    ).decode(),
                    "keyMaterialType": "SYMMETRIC",
                },
                "status": str(k["status"]).upper(),
                "keyId": int(k["keyId"]),
                "outputPrefixType": prefix,
            }
        )
    return json.dumps(
        {"primaryKeyId": int(ks["primaryKeyId"]), "key": out_keys}
    )


def from_tink_json(doc: str | dict) -> dict:
    d = json.loads(doc) if isinstance(doc, (str, bytes)) else doc
    keys = []
    for k in d["key"]:
        kd = k["keyData"]
        url = kd["typeUrl"]
        value = base64.b64decode(kd["value"])
        prefix = str(k.get("outputPrefixType", "TINK")).upper()
        key_bytes = _parse_key_value(value, url == _SIV_URL)
        keys.append(
            {
                "keyId": int(k["keyId"]),
                "status": str(k.get("status", "ENABLED")).upper(),
                "type": _internal_type(url, prefix, key_bytes),
                "rawKey": base64.b64encode(key_bytes).decode(),
            }
        )
    return {"primaryKeyId": int(d["primaryKeyId"]), "key": keys}


def sniff_to_internal(ks_bytes: bytes) -> dict:
    """Accept ANY of the three formats (internal JSON, Tink JSON, Tink
    wire) and return the internal dict — the keyset front door for the
    Python-tier AEAD (functions/daead.py)."""
    b = bytes(ks_bytes)
    if b[:1] == b"{":
        d = json.loads(b.decode("utf-8"))
        if d.get("key") and isinstance(d["key"][0], dict) and \
                "keyData" in d["key"][0]:
            return from_tink_json(d)
        return d
    return parse_keyset(b)
