"""Debezium-JSON sink formatter — the full Kafka-Connect envelope the
reference's Kafka/Pulsar sinks emit (reference
`src/connector/src/sink/formatter/debezium_json.rs`): per-event
(key, value) JSON pairs where the key carries the pk schema+payload and
the value carries the Connect schema block (before/after/source/op/
ts_ms) plus the payload. The type mapping mirrors `field_to_json`
(debezium_json.rs:281 — the Debezium postgresql-connector table:
int4→int32, float4→float, float8→double, decimal/struct/list→string,
date→int32 + Connect Date, timestamp→int64 + Connect Timestamp, ...).

Validated against the reference's own golden
(`debezium_json.rs` test `SCHEMA_JSON_RESULT`) in
tests/test_pgsql_shim.py::test_debezium_envelope_matches_reference_golden.
This module is the wire FORMAT layer only; the broker transports are
real (sources/kafka_wire.py and the r9 broker family) and consume
these events via sources/kafka_exec.py / sink_exec.py.
"""

from __future__ import annotations

from typing import Any

# pg type name → (connect type, connect logical name)
_DBZ_TYPES = {
    "boolean": ("boolean", ""),
    "bool": ("boolean", ""),
    "int2": ("int16", ""),
    "smallint": ("int16", ""),
    "int4": ("int32", ""),
    "int": ("int32", ""),
    "integer": ("int32", ""),
    "int8": ("int64", ""),
    "bigint": ("int64", ""),
    "int256": ("string", ""),
    "float4": ("float", ""),
    "real": ("float", ""),
    "float8": ("double", ""),
    "double": ("double", ""),
    "decimal": ("string", ""),
    "numeric": ("string", ""),
    "varchar": ("string", ""),
    "text": ("string", ""),
    "date": ("int32", "org.apache.kafka.connect.data.Date"),
    "time": ("int64", "org.apache.kafka.connect.data.Time"),
    "timestamp": ("int64", "org.apache.kafka.connect.data.Timestamp"),
    "timestamptz": ("string", "io.debezium.time.ZonedTimestamp"),
    "interval": ("string", "io.debezium.time.Interval"),
    "bytea": ("bytes", ""),
    "jsonb": ("string", "io.debezium.data.Json"),
    "serial": ("int32", ""),
    "struct": ("string", ""),
    "list": ("string", ""),
    "map": ("string", ""),
}


def _dbz_name(db: str, table: str, suffix: str) -> str:
    # concat_debezium_name_field (debezium_json.rs)
    return f"RisingWave.{db}.{table}.{suffix}"


def field_to_json(name: str, pg_type: str) -> dict:
    """One column → its Connect field descriptor (field_to_json,
    debezium_json.rs:281)."""
    base = pg_type.split("(")[0].strip().lower()
    if base.endswith("[]"):
        base = "list"
    ctype, logical = _DBZ_TYPES.get(base, ("string", ""))
    out: dict[str, Any] = {"field": name, "optional": True, "type": ctype}
    if logical:
        out["name"] = logical
    return out


def schema_to_json(fields: list[tuple[str, str]], db: str, table: str) -> dict:
    """The value-side Connect schema block (schema_to_json,
    debezium_json.rs:203): before/after structs over the row fields,
    the source struct, op and ts_ms."""
    row_fields = [field_to_json(n, t) for n, t in fields]
    return {
        "type": "struct",
        "fields": [
            {
                "type": "struct",
                "fields": row_fields,
                "optional": True,
                "field": "before",
                "name": _dbz_name(db, table, "Key"),
            },
            {
                "type": "struct",
                "fields": row_fields,
                "optional": True,
                "field": "after",
                "name": _dbz_name(db, table, "Key"),
            },
            {
                "type": "struct",
                "optional": False,
                "name": _dbz_name(db, table, "Source"),
                "fields": [
                    {"type": "string", "optional": False, "field": "db"},
                    {"type": "string", "optional": True, "field": "table"},
                    {"type": "int64", "optional": False, "field": "ts_ms"},
                ],
                "field": "source",
            },
            {"type": "string", "optional": False, "field": "op"},
            {"type": "int64", "optional": False, "field": "ts_ms"},
        ],
        "optional": False,
        "name": _dbz_name(db, table, "Envelope"),
    }


def key_schema_to_json(fields: list[tuple[str, str]], pk: list[str], db: str, table: str) -> dict:
    """The key-side schema block (fields_pk_to_json)."""
    by_name = dict(fields)
    return {
        "type": "struct",
        "fields": [field_to_json(n, by_name[n]) for n in pk],
        "optional": False,
        "name": _dbz_name(db, table, "Key"),
    }


def debezium_events(
    rows: list[tuple[int, dict]],
    fields: list[tuple[str, str]],
    pk: list[str],
    db: str,
    table: str,
    ts_ms: int,
    gen_tombstone: bool = True,
) -> list[tuple[dict, dict | None]]:
    """Changelog rows (op ∈ {+1 insert, −1 delete}, with −1/+1 pairs on
    the same pk collapsing to op 'u') → (key_event, value_event) pairs,
    the reference's `format_chunk` coroutine (debezium_json.rs:98).
    Deletes yield the delete event then (optionally) the compacted-topic
    tombstone (None value)."""
    value_schema = schema_to_json(fields, db, table)
    key_schema = key_schema_to_json(fields, pk, db, table)
    source = {"db": db, "table": table, "ts_ms": ts_ms}
    out: list[tuple[dict, dict | None]] = []
    i = 0
    while i < len(rows):
        op, row = rows[i]
        key_event = {
            "schema": key_schema,
            "payload": {k: row[k] for k in pk},
        }
        if op > 0:
            payload = {"before": None, "after": row, "op": "c",
                       "ts_ms": ts_ms, "source": source}
            out.append((key_event, {"schema": value_schema, "payload": payload}))
        else:
            # a delete immediately followed by an insert of the same pk
            # is the changelog spelling of an UPDATE pair — collapse to
            # ONE 'u' event like the reference's UpdateDelete/
            # UpdateInsert branches (which emit nothing for the delete
            # half)
            if (
                i + 1 < len(rows)
                and rows[i + 1][0] > 0
                and all(rows[i + 1][1][k] == row[k] for k in pk)
            ):
                after = rows[i + 1][1]
                payload = {"before": row, "after": after, "op": "u",
                           "ts_ms": ts_ms, "source": source}
                out.append((key_event, {"schema": value_schema, "payload": payload}))
                i += 2
                continue
            payload = {"before": row, "after": None, "op": "d",
                       "ts_ms": ts_ms, "source": source}
            out.append((key_event, {"schema": value_schema, "payload": payload}))
            if gen_tombstone:
                # compacted-topic tombstone
                # (debezium_json.rs gen_tombstone branch)
                out.append((key_event, None))
        i += 1
    return out


def upsert_events(
    rows: list[tuple[int, dict]],
    pk: list[str],
) -> list[tuple[dict, dict | None]]:
    """Changelog rows → upsert-format (key, value-or-None) events, the
    reference's `sink/formatter/upsert.rs` format_chunk: key is ALWAYS
    the encoded pk; Insert/UpdateInsert carry the full row as value;
    Delete yields a None value (compacted-topic tombstone); the delete
    half of a same-pk −/+ UPDATE pair is skipped entirely (upsert
    semantics need no update-delete event)."""
    out: list[tuple[dict, dict | None]] = []
    i = 0
    while i < len(rows):
        op, row = rows[i]
        key_event = {k: row[k] for k in pk}
        if op > 0:
            out.append((key_event, dict(row)))
        elif (
            i + 1 < len(rows)
            and rows[i + 1][0] > 0
            and all(rows[i + 1][1][k] == row[k] for k in pk)
        ):
            # UpdateDelete: skipped — the paired UpdateInsert carries
            # the new value on the same key (upsert.rs `continue`)
            i += 1
            continue
        else:
            out.append((key_event, None))
        i += 1
    return out
