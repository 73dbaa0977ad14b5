"""Minimal Apache Avro OBJECT CONTAINER FILE codec (SURVEY §2.2-A;
round 10 — the Iceberg metadata plane's wire format).

From scratch on the PUBLIC Avro 1.11 spec (no avro package in this
container): the container layout is magic ``Obj\\x01``, a file-metadata
map (``avro.schema`` JSON + ``avro.codec``), a random 16-byte sync
marker, then blocks of ``<record count><byte size><records><sync>``
with every integer a ZIGZAG VARINT. The binary encoding implemented
covers everything Iceberg manifests use: null/boolean/int/long/float/
double/bytes/string/fixed, records, arrays, maps, unions, enums, and
NAMED TYPE REFERENCES (a schema naming a previously defined record —
foreign manifest lists do this for the partition-summary struct).
Codecs: ``null`` and ``deflate`` (raw zlib, the spec's wording).

The reader is GENERIC — it decodes by the schema embedded in the file
and returns plain dicts, so sources/iceberg.py can pick fields by name
whatever writer produced the file. The writer exists so tests can
hand-build FOREIGN Iceberg layouts byte-by-byte and the q481 lane is
self-contained.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# -- zigzag varints (the spec's int/long encoding) ----------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf, pos: int):
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


# -- schema resolution ---------------------------------------------------------


def _named(schema, names: dict):
    """Register/resolve named types so later references decode."""
    if isinstance(schema, dict) and schema.get("type") in (
        "record",
        "enum",
        "fixed",
    ):
        if "name" in schema:
            names[schema["name"]] = schema
    return schema


def _resolve(schema, names: dict):
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


# -- decoder -------------------------------------------------------------------


def _decode(schema, buf, pos: int, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: branch index then value
        idx, pos = _zigzag_decode(buf, pos)
        return _decode(schema[idx], buf, pos, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _named(schema, names)
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _decode(f["type"], buf, pos, names)
            return rec, pos
        if t == "array":
            out = []
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block with byte size prefix
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = _decode(schema["items"], buf, pos, names)
                    out.append(v)
        if t == "map":
            out = {}
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    k, pos = _decode("string", buf, pos, names)
                    out[k], pos = _decode(schema["values"], buf, pos, names)
        if t == "enum":
            _named(schema, names)
            idx, pos = _zigzag_decode(buf, pos)
            return schema["symbols"][idx], pos
        if t == "fixed":
            _named(schema, names)
            size = schema["size"]
            return bytes(buf[pos : pos + size]), pos + size
        return _decode(t, buf, pos, names)  # {"type": "long", ...}
    # primitives
    if schema == "null":
        return None, pos
    if schema == "boolean":
        v = buf[pos]
        return bool(v), pos + 1
    if schema in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if schema == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        raw = bytes(buf[pos : pos + n])
        pos += n
        return (raw.decode("utf-8") if schema == "string" else raw), pos
    raise AvroError(f"unsupported avro type {schema!r}")


# -- encoder -------------------------------------------------------------------


def _encode(schema, value, out: bytearray, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value, names):
                out += _zigzag_encode(i)
                _encode(branch, value, out, names)
                return
        raise AvroError(f"no union branch for {value!r} in {schema}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _named(schema, names)
            for f in schema["fields"]:
                _encode(f["type"], value.get(f["name"]), out, names)
            return
        if t == "array":
            if value:
                out += _zigzag_encode(len(value))
                for v in value:
                    _encode(schema["items"], v, out, names)
            out += _zigzag_encode(0)
            return
        if t == "map":
            if value:
                out += _zigzag_encode(len(value))
                for k, v in value.items():
                    _encode("string", k, out, names)
                    _encode(schema["values"], v, out, names)
            out += _zigzag_encode(0)
            return
        if t == "enum":
            _named(schema, names)
            out += _zigzag_encode(schema["symbols"].index(value))
            return
        if t == "fixed":
            _named(schema, names)
            if len(value) != schema["size"]:
                raise AvroError("fixed size mismatch")
            out += value
            return
        _encode(t, value, out, names)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        out += _zigzag_encode(int(value))
        return
    if schema == "float":
        out += struct.pack("<f", value)
        return
    if schema == "double":
        out += struct.pack("<d", value)
        return
    if schema == "bytes":
        out += _zigzag_encode(len(value))
        out += value
        return
    if schema == "string":
        raw = value.encode("utf-8")
        out += _zigzag_encode(len(raw))
        out += raw
        return
    raise AvroError(f"unsupported avro type {schema!r}")


def _matches(branch, value, names: dict) -> bool:
    branch = _resolve(branch, names)
    t = branch["type"] if isinstance(branch, dict) else branch
    if value is None:
        return t == "null"
    if t in ("record",):
        return isinstance(value, dict)
    if t == "map":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(
            value, bool
        )
    if t == "boolean":
        return isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "enum":
        return isinstance(value, str)
    return t != "null"


# -- container file ------------------------------------------------------------


def read_avro(path: str):
    """-> (schema_json_dict, records as plain dicts/values)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _MAGIC:
        raise AvroError(f"{path}: not an avro container")
    names: dict = {}
    meta, pos = _decode(
        {"type": "map", "values": "bytes"}, buf, 4, names
    )
    sync = buf[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec {codec!r}")
    records = []
    n_total = len(buf)
    while pos < n_total:
        count, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise AvroError(f"{path}: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bpos = 0
        block_names = dict(names)
        for _ in range(count):
            rec, bpos = _decode(schema, block, bpos, block_names)
            records.append(rec)
    return schema, records


def write_avro(
    path: str, schema: dict, records: list, codec: str = "null"
) -> None:
    names: dict = {}
    body = bytearray()
    for rec in records:
        _encode(schema, rec, body, names)
    block = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    elif codec != "null":
        raise AvroError(f"unsupported avro codec {codec!r}")
    # deterministic sync marker (content-derived; spec requires only
    # that it match within the file)
    import hashlib

    sync = hashlib.md5(
        (os.path.basename(path) + str(len(records))).encode()
    ).digest()
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode(),
        "avro.codec": codec.encode(),
    }
    _encode(
        {"type": "map", "values": "bytes"}, meta, out, {}
    )
    out += sync
    if records:
        out += _zigzag_encode(len(records))
        out += _zigzag_encode(len(block))
        out += block
        out += sync
    with open(path, "wb") as f:
        f.write(bytes(out))
