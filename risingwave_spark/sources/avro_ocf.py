"""Generic Avro Object Container File (OCF) reader/writer per the
PUBLIC Avro 1.11 spec (avro.apache.org/docs — "Object Container
Files"): magic `Obj\\x01`, a file-metadata map carrying `avro.schema`
(the writer schema as JSON) and `avro.codec`, a 16-byte sync marker,
then blocks of `count, byte-size, data, sync`. The datum reader is
SCHEMA-DRIVEN — it walks the embedded writer schema (record/enum/
array/map/union/fixed/primitives, zig-zag varints) and yields plain
Python dicts — so it reads OCF files written by ANY engine, not just
this one.

Why it exists here: Apache Iceberg's manifest lists and manifests are
Avro OCF files (iceberg.apache.org/spec). The reference's IcebergScan
(`src/connector/src/source/iceberg/`, batch executor
`iceberg_scan.rs`) reads them through iceberg-rust; this engine reads
them with this module (sources/iceberg_scan.py) and hands the
resulting parquet file list to Spark's native reader — metadata walk
in Python, data scan fully JVM-side.

Codecs: null and deflate (raw zlib, the spec's two required codecs).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ------------------------------------------------------------- primitives
def _read_long(buf, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1), pos  # zig-zag
        shift += 7


def _write_long(out: bytearray, n: int) -> None:
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | 0x80 if u else b)
        if not u:
            return


class _Reader:
    def __init__(self, buf: bytes, named: dict):
        self.buf = buf
        self.pos = 0
        self.named = named  # name -> resolved schema (records/enums/fixed)

    def long(self) -> int:
        v, self.pos = _read_long(self.buf, self.pos)
        return v

    def raw(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def datum(self, schema):
        if isinstance(schema, str):
            t = schema
            if t in self.named:
                return self.datum(self.named[t])
            if t == "null":
                return None
            if t == "boolean":
                return self.raw(1) == b"\x01"
            if t in ("int", "long"):
                return self.long()
            if t == "float":
                return struct.unpack("<f", self.raw(4))[0]
            if t == "double":
                return struct.unpack("<d", self.raw(8))[0]
            if t == "bytes":
                return self.raw(self.long())
            if t == "string":
                return self.raw(self.long()).decode()
            raise ValueError(f"unknown avro type {t!r}")
        if isinstance(schema, list):  # union: branch index then datum
            return self.datum(schema[self.long()])
        t = schema["type"]
        if t in ("record", "error"):
            self._remember(schema)
            return {f["name"]: self.datum(f["type"]) for f in schema["fields"]}
        if t == "enum":
            self._remember(schema)
            return schema["symbols"][self.long()]
        if t == "fixed":
            self._remember(schema)
            return self.raw(schema["size"])
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    n = -n
                    self.long()
                for _ in range(n):
                    out.append(self.datum(schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    k = self.raw(self.long()).decode()
                    out[k] = self.datum(schema["values"])
        # type may itself be a nested schema ({"type": {"type": "array"...}})
        if isinstance(t, (dict, list)):
            return self.datum(t)
        return self.datum(t)  # named/primitive reference

    def _remember(self, schema) -> None:
        name = schema.get("name")
        if name:
            self.named.setdefault(name, schema)
            ns = schema.get("namespace")
            if ns:
                self.named.setdefault(f"{ns}.{name}", schema)


def read_ocf(path: str) -> tuple[dict | list | str, list[dict]]:
    """→ (writer schema JSON, [records as plain Python values])."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    named: dict = {}
    r = _Reader(buf, named)
    r.pos = 4
    meta_schema = {"type": "map", "values": "bytes"}
    meta = r.datum(meta_schema)
    schema = json.loads(meta[b"avro.schema"] if isinstance(
        next(iter(meta), None), bytes) else meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    if isinstance(codec, bytes):
        codec = codec.decode()
    sync = r.raw(16)
    records: list = []
    while r.pos < len(buf):
        count = r.long()
        size = r.long()
        block = r.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        if r.raw(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        br = _Reader(block, named)
        for _ in range(count):
            records.append(br.datum(schema))
    return schema, records


# ---------------------------------------------------------------- writer
class _Writer:
    def __init__(self):
        self.out = bytearray()

    def long(self, n: int) -> None:
        _write_long(self.out, n)

    def raw(self, b: bytes) -> None:
        self.out += b

    def datum(self, schema, v) -> None:
        if isinstance(schema, str):
            t = schema
            if t == "null":
                return
            if t == "boolean":
                self.out.append(1 if v else 0)
            elif t in ("int", "long"):
                self.long(int(v))
            elif t == "float":
                self.raw(struct.pack("<f", float(v)))
            elif t == "double":
                self.raw(struct.pack("<d", float(v)))
            elif t == "bytes":
                self.long(len(v))
                self.raw(bytes(v))
            elif t == "string":
                b = v.encode()
                self.long(len(b))
                self.raw(b)
            else:
                raise ValueError(f"unknown avro type {t!r}")
            return
        if isinstance(schema, list):  # union: pick first matching branch
            for i, branch in enumerate(schema):
                bt = branch if isinstance(branch, str) else branch.get("type")
                if v is None and bt == "null":
                    self.long(i)
                    return
                if v is not None and bt != "null":
                    self.long(i)
                    self.datum(branch, v)
                    return
            raise ValueError(f"no union branch for {v!r} in {schema}")
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                self.datum(f["type"], v.get(f["name"]))
        elif t == "array":
            if v:
                self.long(len(v))
                for item in v:
                    self.datum(schema["items"], item)
            self.long(0)
        elif t == "map":
            if v:
                self.long(len(v))
                for k, mv in v.items():
                    self.datum("string", k)
                    self.datum(schema["values"], mv)
            self.long(0)
        elif t == "fixed":
            self.raw(bytes(v))
        elif t == "enum":
            self.long(schema["symbols"].index(v))
        else:
            self.datum(t, v)


def write_ocf(path: str, schema: dict, records: list[dict]) -> None:
    """Write an OCF (null codec) — used by the Iceberg fixture writer
    and anywhere a test needs a spec-correct container file."""
    w = _Writer()
    w.raw(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    w.long(len(meta))
    for k, v in meta.items():
        w.datum("string", k)
        w.datum("bytes", v)
    w.long(0)
    sync = os.urandom(16)
    w.raw(sync)
    if records:
        body = _Writer()
        for rec in records:
            body.datum(schema, rec)
        w.long(len(records))
        w.long(len(body.out))
        w.raw(bytes(body.out))
        w.raw(sync)
    with open(path, "wb") as f:
        f.write(bytes(w.out))
