"""MQTT connector end-to-end over the real 3.1.1 wire protocol: a
loopback broker (sources/mqtt_broker.py) with persistent sessions and
the engine's pure-stdlib client exchange genuine CONNECT/SUBSCRIBE/
PUBLISH/PUBACK bytes — the reference's mqtt source/sink
(`src/connector/src/source/mqtt/`, `src/connector/src/sink/mqtt.rs`)
speak the same protocol via rumqttc. QoS-1 persistent-session
redelivery carries the at-least-once contract that kafka offsets carry
elsewhere."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.mqtt_broker import LoopbackMqttBroker
from risingwave_spark.sources.mqtt_wire import MqttClient


@pytest.fixture()
def broker():
    b = LoopbackMqttBroker().start()
    yield b
    b.stop()


def _pub(broker, topic, payloads):
    c = MqttClient(broker.host, broker.port, "test_prod")
    for p in payloads:
        c.publish(topic, p, qos=1)
    c.disconnect()


def test_mqtt_wire_qos1_redelivery(broker):
    """Spec-level QoS-1 contract: un-PUBACKed messages redeliver on the
    next connect of the same persistent session; PUBACKed ones do not."""
    c1 = MqttClient(broker.host, broker.port, "sess", clean_session=False)
    c1.subscribe("t/x", qos=1)
    c1.disconnect()
    _pub(broker, "t/x", [b"a", b"b", b"c"])
    c2 = MqttClient(broker.host, broker.port, "sess", clean_session=False)
    assert c2.session_present
    got = list(c2.drain_backlog())
    assert [pl for _p, _t, pl in got] == [b"a", b"b", b"c"]
    c2.puback(got[0][0])  # ack only 'a'
    c2.disconnect()
    c3 = MqttClient(broker.host, broker.port, "sess", clean_session=False)
    assert [pl for _p, _t, pl in c3.drain_backlog()] == [b"b", b"c"]
    c3.disconnect()


def test_mqtt_table_source_plain_and_poll(spark, broker):
    """CREATE TABLE ... WITH (connector='mqtt'): backlog queued while
    the engine is away folds at create; poll_sources() drains only new
    messages (PUBACK-confirmed) and MVs advance incrementally."""
    url = f"tcp://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mqtt_"))
    eng.sql(
        f"""CREATE TABLE mo (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'mqtt', url = '{url}', topic = 'dev/data'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    # published AFTER the subscription exists → queued in the session
    _pub(broker, "dev/data", [
        json.dumps({"id": i, "v": i * 10}).encode() for i in range(1, 6)
    ])
    eng.sql("CREATE MATERIALIZED VIEW mo_sum AS SELECT count(*) AS n, sum(v) AS sv FROM mo")
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM mo_sum").first()) == (5, 150)
    _pub(broker, "dev/data", [json.dumps({"id": 6, "v": 60}).encode()])
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM mo_sum").first()) == (6, 210)
    # restart: the durable session is the offset — replay re-attaches
    # without refolding PUBACKed messages
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM mo_sum").first()) == (6, 210)
    _pub(broker, "dev/data", [json.dumps({"id": 7, "v": 70}).encode()])
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM mo_sum").first()) == (7, 280)


def test_mqtt_table_segmented_poll_cap(spark, broker):
    """max.poll.records bounds each fold segment: a deep backlog folds
    as N bounded segments (PUBACK per segment), never one giant list."""
    url = f"tcp://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mqttc_"))
    eng.sql(
        f"""CREATE TABLE mc (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'mqtt', url = '{url}', topic = 'deep/t',
            max.poll.records = '7'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    _pub(broker, "deep/t", [
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
    assert eng.sql("SELECT count(*) AS n FROM mc").first().n == 30


def test_mqtt_debezium_cdc(spark, broker):
    url = f"tcp://{broker.host}:{broker.port}"

    def dbz(op, before, after):
        return json.dumps({"before": before, "after": after, "op": op, "ts_ms": 0}).encode()

    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mqttd_"))
    eng.sql(
        f"""CREATE TABLE md (k int8 PRIMARY KEY, s varchar) WITH (
            connector = 'mqtt', url = '{url}', topic = 'cdc/t'
        ) FORMAT DEBEZIUM ENCODE JSON"""
    )
    _pub(broker, "cdc/t", [
        dbz("c", None, {"k": 1, "s": "a"}),
        dbz("c", None, {"k": 2, "s": "b"}),
    ])
    eng.poll_sources()
    _pub(broker, "cdc/t", [
        dbz("u", {"k": 1, "s": "a"}, {"k": 1, "s": "a2"}),
        dbz("d", {"k": 2, "s": "b"}, None),
    ])
    eng.poll_sources()
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM md").collect()) == [(1, "a2")]


def test_mqtt_sink_plain_append_only(spark, broker):
    """CREATE SINK ... connector='mqtt': publishes insert payloads at
    QoS 1; a retracting MV is rejected without force_append_only (the
    reference mqtt sink is append-only only)."""
    url = f"tcp://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mqtts_"))
    eng.sql("CREATE TABLE st (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW smv AS SELECT id, v * 2 AS v2 FROM st")
    with pytest.raises(Exception, match="append"):
        eng.sql(
            f"CREATE SINK bad FROM smv WITH (connector='mqtt', url='{url}', "
            "topic='out/t') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="PLAIN"):
        eng.sql(
            f"CREATE SINK bad2 FROM smv WITH (connector='mqtt', url='{url}', "
            "topic='out/t', force_append_only='true') FORMAT UPSERT ENCODE JSON"
        )
    # a subscriber watches the sink topic
    sub = MqttClient(broker.host, broker.port, "watcher", clean_session=False)
    sub.subscribe("out/t", qos=1)
    sub.disconnect()
    eng.sql(
        f"CREATE SINK ok FROM smv WITH (connector='mqtt', url='{url}', "
        "topic='out/t', force_append_only='true') FORMAT PLAIN ENCODE JSON"
    )
    eng.sql("INSERT INTO st VALUES (1, 5), (2, 7)")
    eng.sql("INSERT INTO st VALUES (3, 9)")
    sub2 = MqttClient(broker.host, broker.port, "watcher", clean_session=False)
    got = sorted(
        tuple(json.loads(pl).values()) for _p, _t, pl in sub2.drain_backlog()
    )
    sub2.disconnect()
    assert got == [(1, 10), (2, 14), (3, 18)]


def test_mqtt_create_requires_pk_and_options(spark, broker):
    url = f"tcp://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mqtte_"))
    with pytest.raises(Exception, match="PRIMARY KEY"):
        eng.sql(
            f"CREATE TABLE nk (id int8, v int8) WITH (connector='mqtt', "
            f"url='{url}', topic='x/t') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="topic"):
        eng.sql(
            f"CREATE TABLE nt (id int8 PRIMARY KEY) WITH (connector='mqtt', "
            f"url='{url}') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="url"):
        eng.sql(
            "CREATE TABLE nu (id int8 PRIMARY KEY) WITH (connector='mqtt', "
            "topic='x/t') FORMAT PLAIN ENCODE JSON"
        )
