"""Minimal Avro Object Container File reader/writer (pure Python).

Reference parity: ``geomesa-convert-avro`` ingests Avro records through
the converter DSL. No Avro library ships in this sandbox, so this module
implements the container format from the public spec directly: magic
``Obj\\x01``, metadata map (``avro.schema`` JSON + ``avro.codec``),
sync-marker-delimited blocks, zigzag-varint primitives. Supported:
flat record schemas of null/boolean/int/long/float/double/string/bytes
and nullable unions ``["null", T]``; codecs ``null`` and ``deflate``
(zlib is in the stdlib). Anything else raises with a clear message —
this is the honest subset the converter surface needs, not a full
implementation.

The writer exists so tests and fixtures can produce real container
files; the reader feeds ``avro_ingest`` batches.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "string", "bytes"}


# ---------------------------------------------------------------- decode

def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint."""
    n = 0
    shift = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        v = b[0]
        n |= (v & 0x7F) << shift
        if not (v & 0x80):
            break
        shift += 7
    return (n >> 1) ^ -(n & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _read_value(buf: io.BytesIO, typ):
    if isinstance(typ, list):  # union — only ["null", T] supported
        branch = _read_long(buf)
        return None if typ[branch] == "null" else _read_value(buf, typ[branch])
    if isinstance(typ, dict):
        typ = typ["type"] if typ.get("type") in _PRIMITIVES else typ
        if isinstance(typ, dict):
            raise NotImplementedError(
                f"avro complex type {typ.get('type')!r} not supported "
                "(flat primitive records only)")
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _read_long(buf)
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        return _read_bytes(buf).decode()
    if typ == "bytes":
        return _read_bytes(buf)
    raise NotImplementedError(f"avro type {typ!r} not supported")


def read_avro_file(path: str) -> pa.Table:
    """One container file -> arrow table (column per record field)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    # file metadata map: blocks of (count, then count key/value pairs)
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative count: block byte size follows (spec)
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise NotImplementedError("top-level avro schema must be a record")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    fields = [(fld["name"], fld["type"]) for fld in schema["fields"]]
    sync = buf.read(16)

    cols: dict[str, list] = {name: [] for name, _ in fields}
    while buf.tell() < len(data):
        count = _read_long(buf)
        nbytes = _read_long(buf)
        block = buf.read(nbytes)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            for name, typ in fields:
                cols[name].append(_read_value(bbuf, typ))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return pa.table({name: pa.array(cols[name], _arrow_type(typ))
                     for name, typ in fields})


def _arrow_type(typ):
    if isinstance(typ, list):
        nn = [t for t in typ if t != "null"]
        return _arrow_type(nn[0])
    if isinstance(typ, dict):
        # dict-annotated primitive (e.g. logicalType timestamp-millis):
        # decode as the underlying primitive, same as _read_value
        t = typ.get("type")
        if t in _PRIMITIVES:
            return _arrow_type(t)
        raise NotImplementedError(
            f"avro complex type {t!r} not supported (flat primitive "
            "records only)")
    return {
        "boolean": pa.bool_(), "int": pa.int64(), "long": pa.int64(),
        "float": pa.float32(), "double": pa.float64(),
        "string": pa.string(), "bytes": pa.binary(), "null": pa.null(),
    }[typ]


# ---------------------------------------------------------------- encode

def _write_long(out: io.BytesIO, v: int):
    n = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _write_value(out: io.BytesIO, typ, v):
    if isinstance(typ, dict) and typ.get("type") in _PRIMITIVES:
        typ = typ["type"]  # dict-annotated primitive (logicalType etc.)
    if isinstance(typ, list):
        if v is None:
            _write_long(out, typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        _write_long(out, branch)
        _write_value(out, typ[branch], v)
        return
    if typ == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out.write(struct.pack("<f", v))
    elif typ == "double":
        out.write(struct.pack("<d", v))
    elif typ == "string":
        b = v.encode()
        _write_long(out, len(b))
        out.write(b)
    elif typ == "bytes":
        _write_long(out, len(v))
        out.write(v)
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def write_avro_file(path: str, schema: dict, rows: list[dict],
                    codec: str = "null", block_rows: int = 1000):
    """Write rows (list of dicts) as an Avro OCF — test/fixture producer."""
    fields = [(fld["name"], fld["type"]) for fld in schema["fields"]]
    sync = bytes((np.arange(16) * 37 + 11).astype(np.uint8))  # deterministic
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out.write(kb)
        _write_long(out, len(v))
        out.write(v)
    _write_long(out, 0)
    out.write(sync)
    for s in range(0, len(rows), block_rows):
        chunk = rows[s:s + block_rows]
        body = io.BytesIO()
        for r in chunk:
            for name, typ in fields:
                _write_value(body, typ, r[name])
        payload = body.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(payload) + comp.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
