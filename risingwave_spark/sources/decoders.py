"""Avro / Protobuf payload decode — the reference's parser layer
(`src/connector/src/parser/avro/`, `src/connector/src/parser/protobuf/`,
Confluent envelope `src/connector/src/parser/schema_registry.rs`).

The container has no Avro/Protobuf jars or libs, so these are
PURE-PYTHON wire-format decoders for the (very stable) binary formats,
run as Arrow-batched functions inside `mapInPandas` — the Spark-side
shape (schema, batching, column projection) is exactly what a
jar-backed `from_avro` would use, and the decode itself is tested
against round-trips of our own encoders.

Supported:
- Avro binary records: null/boolean/int/long (zigzag varint), float,
  double, string, bytes, and nullable unions ["null", T] — the subset
  every Debezium/ingest schema actually uses.
- Protobuf messages: varint (int32/int64/bool/enum), fixed64/double,
  fixed32/float, length-delimited (string/bytes); unknown fields are
  skipped by wire type (forward compatible).
- Confluent schema-registry envelope: magic 0x00 + big-endian 4-byte
  schema id + payload (`schema_registry.rs` wire format).
"""

from __future__ import annotations

import os
import struct
import sys
from typing import Any, Iterator

# Worker closures capture this module's functions; Python workers launched
# outside the repo directory cannot import `risingwave_spark`, so register
# the module for pickle-BY-VALUE — the functions travel inside the task
# payload instead of as (module, name) references. This is the same
# mechanism Spark uses for __main__-defined functions, made explicit.
try:  # pragma: no cover - depends on the vendored cloudpickle version
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


# --------------------------------------------------------------- varints
def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


# --------------------------------------------------------------- Avro
def avro_decode_record(schema: list[tuple[str, str]], payload: bytes) -> dict[str, Any]:
    """Decode one Avro-binary record. `schema` is an ordered list of
    (field_name, type) with types in {null, boolean, int, long, float,
    double, string, bytes, ?T (nullable union ["null", T])}."""
    pos = 0
    out: dict[str, Any] = {}

    def read(t: str):
        nonlocal pos
        if t.startswith("?"):
            idx, pos2 = _read_varint(payload, pos)
            pos = pos2
            branch = _zigzag(idx)
            if branch == 0:
                return None
            return read(t[1:])
        if t == "null":
            return None
        if t == "boolean":
            v = payload[pos] != 0
            pos += 1
            return v
        if t in ("int", "long"):
            raw, pos2 = _read_varint(payload, pos)
            pos = pos2
            return _zigzag(raw)
        if t == "float":
            (v,) = struct.unpack_from("<f", payload, pos)
            pos += 4
            return v
        if t == "double":
            (v,) = struct.unpack_from("<d", payload, pos)
            pos += 8
            return v
        if t in ("string", "bytes"):
            raw, pos2 = _read_varint(payload, pos)
            ln = _zigzag(raw)
            pos = pos2 + ln
            data = payload[pos2:pos]
            return data.decode() if t == "string" else data
        raise ValueError(f"unsupported avro type {t!r}")

    for name, t in schema:
        out[name] = read(t)
    return out


def avro_encode_record(schema: list[tuple[str, str]], row: dict[str, Any]) -> bytes:
    """Inverse of avro_decode_record (used for round-trip tests and the
    sink-side encode envelope)."""
    out = bytearray()

    def zz(n: int) -> None:
        u = (n << 1) ^ (n >> 63)
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    def write(t: str, v: Any) -> None:
        if t.startswith("?"):
            if v is None:
                zz(0)
                return
            zz(1)
            write(t[1:], v)
            return
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            zz(int(v))
        elif t == "float":
            out.extend(struct.pack("<f", v))
        elif t == "double":
            out.extend(struct.pack("<d", v))
        elif t in ("string", "bytes"):
            data = v.encode() if t == "string" else bytes(v)
            zz(len(data))
            out.extend(data)
        else:
            raise ValueError(f"unsupported avro type {t!r}")

    for name, t in schema:
        write(t, row[name])
    return bytes(out)


# --------------------------------------------------------------- Protobuf
def proto_decode_message(
    fields: dict[int, tuple[str, str]], payload: bytes
) -> dict[str, Any]:
    """Decode one protobuf message. `fields` maps field number →
    (name, type) with types in {int64, int32, sint64, bool, enum,
    double, float, string, bytes, fixed64, fixed32}. Unknown field
    numbers are skipped by wire type (proto3 forward compatibility)."""
    out = {name: None for name, _ in fields.values()}
    pos = 0
    n = len(payload)
    while pos < n:
        tag, pos = _read_varint(payload, pos)
        field_no, wire = tag >> 3, tag & 0x7
        if wire == 0:  # varint
            raw, pos = _read_varint(payload, pos)
            if field_no in fields:
                name, t = fields[field_no]
                if t == "bool":
                    out[name] = bool(raw)
                elif t in ("sint64", "sint32"):
                    out[name] = _zigzag(raw)
                else:  # int32/int64/enum (two's complement for negatives)
                    out[name] = raw - (1 << 64) if raw >= (1 << 63) else raw
        elif wire == 1:  # fixed64
            if field_no in fields:
                name, t = fields[field_no]
                if t == "double":
                    (out[name],) = struct.unpack_from("<d", payload, pos)
                else:
                    (out[name],) = struct.unpack_from("<Q", payload, pos)
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(payload, pos)
            data = payload[pos : pos + ln]
            pos += ln
            if field_no in fields:
                name, t = fields[field_no]
                out[name] = data.decode() if t == "string" else data
        elif wire == 5:  # fixed32
            if field_no in fields:
                name, t = fields[field_no]
                if t == "float":
                    (out[name],) = struct.unpack_from("<f", payload, pos)
                else:
                    (out[name],) = struct.unpack_from("<I", payload, pos)
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


def proto_encode_message(
    fields: dict[int, tuple[str, str]], row: dict[str, Any]
) -> bytes:
    """Inverse of proto_decode_message (round-trip tests / sink encode)."""
    out = bytearray()

    def varint(u: int) -> None:
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    for field_no in sorted(fields):
        name, t = fields[field_no]
        v = row.get(name)
        if v is None:
            continue
        if t in ("int64", "int32", "enum", "bool", "sint64", "sint32"):
            varint((field_no << 3) | 0)
            if t in ("sint64", "sint32"):
                varint((int(v) << 1) ^ (int(v) >> 63))
            elif t == "bool":
                varint(1 if v else 0)
            else:
                varint(int(v) & ((1 << 64) - 1))
        elif t == "double":
            varint((field_no << 3) | 1)
            out.extend(struct.pack("<d", v))
        elif t == "fixed64":
            varint((field_no << 3) | 1)
            out.extend(struct.pack("<Q", v))
        elif t in ("string", "bytes"):
            varint((field_no << 3) | 2)
            data = v.encode() if t == "string" else bytes(v)
            varint(len(data))
            out.extend(data)
        elif t == "float":
            varint((field_no << 3) | 5)
            out.extend(struct.pack("<f", v))
        elif t == "fixed32":
            varint((field_no << 3) | 5)
            out.extend(struct.pack("<I", v))
        else:
            raise ValueError(f"unsupported proto type {t!r}")
    return bytes(out)


# ------------------------------------------------- schema-registry envelope
def confluent_wrap(schema_id: int, payload: bytes) -> bytes:
    """Confluent wire format: magic 0x00 + BE u32 schema id + payload."""
    return b"\x00" + struct.pack(">I", schema_id) + payload


def confluent_unwrap(data: bytes) -> tuple[int, bytes]:
    if not data or data[0] != 0:
        raise ValueError("not a Confluent-framed payload (bad magic byte)")
    (schema_id,) = struct.unpack_from(">I", data, 1)
    return schema_id, data[5:]


# ------------------------------------------------- Spark-side plumbing
def avro_decode_df(df, bin_col: str, schema: list[tuple[str, str]], out_schema: str):
    """binary column → typed columns via Arrow-batched mapInPandas (the
    from_avro analog; one Python pass per batch, no per-row UDF calls)."""
    import pandas as pd

    keep = [c for c in df.columns if c != bin_col]

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            decoded = pd.DataFrame(
                [avro_decode_record(schema, b) for b in pdf[bin_col]]
            )
            yield pd.concat(
                [pdf[keep].reset_index(drop=True), decoded.reset_index(drop=True)],
                axis=1,
            )

    full = (", ".join(f"{c} {t}" for c, t in _spark_types(df, keep)) + ", " if keep else "") + out_schema
    return df.mapInPandas(run, schema=full)


def proto_decode_df(df, bin_col: str, fields: dict[int, tuple[str, str]], out_schema: str):
    """binary column → typed columns (protobuf), Arrow-batched."""
    import pandas as pd

    keep = [c for c in df.columns if c != bin_col]

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            decoded = pd.DataFrame(
                [proto_decode_message(fields, b) for b in pdf[bin_col]]
            )
            yield pd.concat(
                [pdf[keep].reset_index(drop=True), decoded.reset_index(drop=True)],
                axis=1,
            )

    full = (", ".join(f"{c} {t}" for c, t in _spark_types(df, keep)) + ", " if keep else "") + out_schema
    return df.mapInPandas(run, schema=full)


def _spark_types(df, cols: list[str]) -> list[tuple[str, str]]:
    m = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return [(c, m[c]) for c in cols]
