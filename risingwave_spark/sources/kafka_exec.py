"""Executor-side Kafka sink produce — the per-task wire producers the
reference runs in its sink actors (`src/connector/src/sink/kafka.rs`:
each sink executor owns a producer; nothing funnels through a single
node). The driver's role shrinks to routing the changelog DIFF into
pk-hashed Spark partitions; each task formats its rows and produces
them over its OWN wire client, so sink throughput scales with
executors instead of driver bandwidth.

Ordering contract preserved: a pk hashes to ONE Spark partition (all of
its −/+ rows, every chunk, in one task, sorted by (chunk, pk, op)) and
murmur2-routes to ONE Kafka partition — per-key event order is exactly
what a single-producer driver emitted, which is the only order Kafka
guarantees anyway.

Registered for pickle-BY-VALUE (with the wire/format modules it
depends on) so the closures travel inside the task payload — Python
workers never need `risingwave_spark` importable (same mechanism as
sources/decoders.py).
"""

from __future__ import annotations

import datetime
import decimal
import json
import sys
import time

try:  # pragma: no cover - depends on the vendored cloudpickle version
    from pyspark import cloudpickle as _cloudpickle

    import risingwave_spark.sources.kafka_wire as _kw
    import risingwave_spark.sources.sink_format as _sf

    for _m in (sys.modules[__name__], _kw, _sf):
        _cloudpickle.register_pickle_by_value(_m)
except Exception:  # noqa: BLE001
    pass

from risingwave_spark.sources.decoders import avro_encode_record, confluent_wrap
from risingwave_spark.sources.kafka_wire import KafkaWireClient, default_partition
from risingwave_spark.sources.sink_format import debezium_events, upsert_events


def py_val(v):
    """JSON-safe scalar (the formatters' value contract)."""
    if isinstance(v, (datetime.date, datetime.datetime, decimal.Decimal)):
        return str(v)
    return v


def format_rows(
    fmt: str, rows: list, fields: list, pk: list, db: str, table: str, ts_ms: int
) -> list:
    """Changelog rows (op, row_dict) → formatter (key, value) event
    dicts; one switch shared by the driver bootstrap and the tasks."""
    if fmt == "debezium":
        return debezium_events(rows, fields, pk, db, table, ts_ms=ts_ms)
    if fmt == "upsert":
        return upsert_events(rows, pk)
    # plain / append-only: inserts as bare row JSON, keyed by pk
    return [({k: row[k] for k in pk}, dict(row)) for op, row in rows if op > 0]


def encode_events(events: list, avro: dict | None) -> list:
    """(key_dict, value_dict|None) → (key_bytes, value_bytes|None).
    ENCODE JSON: canonical sorted-key JSON. ENCODE AVRO: Confluent-framed
    avro-binary records against the registered schema ids (reference
    `sink/encoder/avro.rs` + the registry wire format)."""
    out = []
    for k, v in events:
        if avro is not None:
            if avro.get("key_sid") is not None:
                kb = confluent_wrap(
                    avro["key_sid"], avro_encode_record(avro["key_schema"], k)
                )
            else:
                kb = json.dumps(k, sort_keys=True).encode()
            vb = (
                None
                if v is None
                else confluent_wrap(
                    avro["value_sid"], avro_encode_record(avro["value_schema"], v)
                )
            )
        else:
            kb = json.dumps(k, sort_keys=True).encode()
            vb = None if v is None else json.dumps(v, sort_keys=True).encode()
        out.append((kb, vb))
    return out


def produce_events(
    host: str,
    port: int,
    topic: str,
    nparts: int,
    events: list,
    avro: dict | None = None,
    now_ms: int | None = None,
) -> None:
    """Keyed routing with Kafka's DEFAULT partitioner (murmur2 of the
    key bytes) — a pk always lands on one partition, which is what
    preserves per-key envelope order for any consumer."""
    now = now_ms or int(time.time() * 1000)
    client = KafkaWireClient(host, port)
    try:
        by_part: dict[int, list] = {}
        for kb, vb in encode_events(events, avro):
            by_part.setdefault(default_partition(kb, nparts), []).append(
                (kb, vb, now)
            )
        for pid in sorted(by_part):
            client.produce(topic, pid, by_part[pid])
    finally:
        client.close()


def make_partition_producer(
    host: str,
    port: int,
    topic: str,
    fmt: str,
    fields: list,
    pk: list,
    db: str,
    table: str,
    nparts: int,
    avro: dict | None,
    ts_ms: int,
    op_col: str,
    cols: list,
):
    """The foreachPartition task body: rows (already pk-partitioned and
    (chunk, pk, op)-sorted) → formatter events → wire produce, one
    client per task."""

    def produce_partition(rows_iter) -> None:
        rows = [(r[op_col], {c: py_val(r[c]) for c in cols}) for r in rows_iter]
        if not rows:
            return
        events = format_rows(fmt, rows, fields, pk, db, table, ts_ms)
        if events:
            produce_events(host, port, topic, nparts, events, avro, ts_ms)

    return produce_partition
