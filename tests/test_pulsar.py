"""Pulsar connector end-to-end over the real binary protocol: a
loopback broker (sources/pulsar_broker.py) and the engine's
pure-stdlib client exchange genuine CONNECT/PRODUCER/SEND/SUBSCRIBE/
FLOW/MESSAGE/ACK frames with CRC32C-verified payload sections — the
reference's pulsar source/sink (`src/connector/src/source/pulsar/`,
`src/connector/src/sink/pulsar.rs`) speak the same protocol via the
pulsar client library. Durable-subscription cursor redelivery carries
the at-least-once contract that kafka offsets carry elsewhere."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.pulsar_broker import LoopbackPulsarBroker
from risingwave_spark.sources.pulsar_wire import PulsarWireClient

TOPIC = "persistent://public/default/t1"


@pytest.fixture()
def broker():
    b = LoopbackPulsarBroker().start()
    yield b
    b.stop()


def _pub(broker, topic, payloads, keys=None):
    c = PulsarWireClient(broker.host, broker.port)
    pname = c.create_producer(topic, producer_id=1)
    for i, p in enumerate(payloads):
        c.send(1, pname, i, p, partition_key=keys[i] if keys else None)
    c.close()


def test_pulsar_wire_cursor_redelivery(broker):
    """Protocol contract: a durable subscription redelivers un-acked
    messages on re-attach; acked ones stay consumed; independent
    subscriptions have independent cursors."""
    _pub(broker, TOPIC, [b"x", b"y", b"z"])
    c = PulsarWireClient(broker.host, broker.port)
    c.subscribe(TOPIC, "subA", consumer_id=1)
    got = c.fetch(1, 2)
    assert [p for _m, p, _k in got] == [b"x", b"y"]
    c.ack(1, got[0][0])  # ack only 'x'
    c.close()
    c2 = PulsarWireClient(broker.host, broker.port)
    c2.subscribe(TOPIC, "subA", consumer_id=2)
    got2 = c2.fetch(2, 10)
    assert [p for _m, p, _k in got2] == [b"y", b"z"]
    for m, _p, _k in got2:
        c2.ack(2, m)
    assert c2.fetch(2, 5) == []
    # an independent subscription starts from Earliest
    c2.subscribe(TOPIC, "subB", consumer_id=3)
    assert [p for _m, p, _k in c2.fetch(3, 10)] == [b"x", b"y", b"z"]
    c2.close()


def test_pulsar_table_source_plain_and_poll(spark, broker):
    url = f"pulsar://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pul_"))
    eng.sql(
        f"""CREATE TABLE plo (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'pulsar', topic = '{TOPIC}',
            service.url = '{url}'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    _pub(broker, TOPIC, [
        json.dumps({"id": i, "v": i * 10}).encode() for i in range(1, 6)
    ])
    eng.sql("CREATE MATERIALIZED VIEW plo_sum AS SELECT count(*) AS n, sum(v) AS sv FROM plo")
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM plo_sum").first()) == (5, 150)
    _pub(broker, TOPIC, [json.dumps({"id": 6, "v": 60}).encode()])
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM plo_sum").first()) == (6, 210)
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM plo_sum").first()) == (6, 210)
    _pub(broker, TOPIC, [json.dumps({"id": 7, "v": 70}).encode()])
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM plo_sum").first()) == (7, 280)


def test_pulsar_table_segmented_poll_cap(spark, broker):
    url = f"pulsar://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pulc_"))
    eng.sql(
        f"""CREATE TABLE plc (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'pulsar', topic = '{TOPIC}',
            service.url = '{url}', max.poll.records = '7'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    _pub(broker, TOPIC, [
        json.dumps({"id": i, "v": i}).encode() for i in range(30)
    ])
    from risingwave_spark import frontend as _fr

    folds: list[int] = []
    orig = _fr._fold_kafka_records

    def spy(engine, t, schema, records):
        folds.append(len(records))
        return orig(engine, t, schema, records)

    _fr._fold_kafka_records = spy
    try:
        eng.poll_sources()
    finally:
        _fr._fold_kafka_records = orig
    assert folds == [7, 7, 7, 7, 2], folds
    assert eng.sql("SELECT count(*) AS n FROM plc").first().n == 30


def test_pulsar_upsert_source_tombstones(spark, broker):
    """FORMAT UPSERT: the message partition_key is the primary key; an
    empty payload is a delete tombstone — the kafka upsert contract
    over the pulsar wire."""
    url = f"pulsar://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pulu_"))
    eng.sql(
        f"""CREATE TABLE plu (k int8 PRIMARY KEY, s varchar) WITH (
            connector = 'pulsar', topic = '{TOPIC}',
            service.url = '{url}'
        ) FORMAT UPSERT ENCODE JSON"""
    )
    _pub(
        broker, TOPIC,
        [json.dumps({"k": 1, "s": "a"}).encode(),
         json.dumps({"k": 2, "s": "b"}).encode()],
        keys=[json.dumps({"k": 1}), json.dumps({"k": 2})],
    )
    eng.poll_sources()
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM plu").collect()) == [
        (1, "a"), (2, "b"),
    ]
    # update k=1, delete k=2 (empty payload tombstone)
    _pub(
        broker, TOPIC,
        [json.dumps({"k": 1, "s": "a2"}).encode(), b""],
        keys=[json.dumps({"k": 1}), json.dumps({"k": 2})],
    )
    eng.poll_sources()
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM plu").collect()) == [
        (1, "a2"),
    ]


def test_pulsar_debezium_cdc(spark, broker):
    url = f"pulsar://{broker.host}:{broker.port}"

    def dbz(op, before, after):
        return json.dumps({"before": before, "after": after, "op": op, "ts_ms": 0}).encode()

    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_puld_"))
    eng.sql(
        f"""CREATE TABLE pld (k int8 PRIMARY KEY, s varchar) WITH (
            connector = 'pulsar', topic = '{TOPIC}',
            service.url = '{url}'
        ) FORMAT DEBEZIUM ENCODE JSON"""
    )
    _pub(broker, TOPIC, [
        dbz("c", None, {"k": 1, "s": "a"}),
        dbz("c", None, {"k": 2, "s": "b"}),
    ])
    eng.poll_sources()
    _pub(broker, TOPIC, [
        dbz("u", {"k": 1, "s": "a"}, {"k": 1, "s": "a2"}),
        dbz("d", {"k": 2, "s": "b"}, None),
    ])
    eng.poll_sources()
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM pld").collect()) == [(1, "a2")]


def test_pulsar_sink_upsert_roundtrip(spark, broker):
    """CREATE SINK ... connector='pulsar' FORMAT UPSERT: keyed
    messages with empty-payload tombstones; an independent durable
    subscription reconstructs the exact final MV state from the
    topic — inserts, updates AND deletes."""
    url = f"pulsar://{broker.host}:{broker.port}"
    out = "persistent://public/default/out"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_puls_"))
    eng.sql("CREATE TABLE st (id int8 PRIMARY KEY, v int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW smv AS SELECT id, v * 2 AS v2 FROM st"
    )
    eng.sql(
        f"CREATE SINK ok FROM smv WITH (connector='pulsar', topic='{out}', "
        f"service.url='{url}') FORMAT UPSERT ENCODE JSON"
    )
    eng.sql("INSERT INTO st VALUES (1, 5), (2, 7), (3, 9)")
    eng.sql("UPDATE st SET v = 8 WHERE id = 2")
    eng.sql("DELETE FROM st WHERE id = 3")
    # reconstruct from the wire
    c = PulsarWireClient(broker.host, broker.port)
    c.subscribe(out, "verify", consumer_id=1)
    state: dict = {}
    while True:
        batch = c.fetch(1, 32)
        if not batch:
            break
        for mid, payload, key in batch:
            k = json.loads(key)["id"]
            if payload:
                state[k] = json.loads(payload)["v2"]
            else:
                state.pop(k, None)
            c.ack(1, mid)
    c.close()
    assert state == {1: 10, 2: 16}


def test_pulsar_sink_validation_and_recovery(spark):
    b = LoopbackPulsarBroker().start()
    url = f"pulsar://{b.host}:{b.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pulv_"))
    eng.sql("CREATE TABLE vt (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW vmv AS SELECT id, v FROM vt")
    with pytest.raises(Exception, match="topic"):
        eng.sql(
            f"CREATE SINK s1 FROM vmv WITH (connector='pulsar', "
            f"service.url='{url}') FORMAT UPSERT ENCODE JSON"
        )
    with pytest.raises(Exception, match="service.url"):
        eng.sql(
            "CREATE SINK s2 FROM vmv WITH (connector='pulsar', "
            "topic='persistent://public/default/x') FORMAT UPSERT ENCODE JSON"
        )
    b.stop()
    with pytest.raises(Exception, match="unreachable"):
        eng.sql(
            f"CREATE SINK s3 FROM vmv WITH (connector='pulsar', "
            f"topic='persistent://public/default/x', service.url='{url}') "
            "FORMAT UPSERT ENCODE JSON"
        )
    # source create with a down broker: silent re-attach posture
    eng.sql(
        f"""CREATE TABLE pdown (id int8 PRIMARY KEY) WITH (
            connector = 'pulsar', topic = '{TOPIC}', service.url = '{url}'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    eng.poll_sources()  # down: no-op, not an error
    with pytest.raises(Exception, match="PRIMARY KEY"):
        eng.sql(
            f"CREATE TABLE nk (id int8) WITH (connector='pulsar', "
            f"topic='{TOPIC}', service.url='{url}') FORMAT PLAIN ENCODE JSON"
        )
