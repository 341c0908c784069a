"""NATS JetStream connector end-to-end over the real wire protocol: a
loopback server (sources/nats_broker.py) with durable pull consumers
and the engine's pure-stdlib client exchange genuine INFO/CONNECT/
PUB/SUB/MSG/HMSG text-protocol bytes — the reference's nats
source/sink (`src/connector/src/source/nats/`,
`src/connector/src/sink/nats.rs`) speak the same protocol via
async-nats. JetStream explicit-ack redelivery carries the
at-least-once contract that kafka offsets carry elsewhere."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.nats_broker import LoopbackNatsBroker
from risingwave_spark.sources.nats_wire import NatsClient


@pytest.fixture()
def broker():
    b = LoopbackNatsBroker().start()
    yield b
    b.stop()


def _pub(broker, subject, payloads):
    c = NatsClient(broker.host, broker.port)
    for p in payloads:
        c.js_publish(subject, p)
    c.close()


def test_nats_wire_explicit_ack_redelivery(broker):
    """JetStream pull-consumer contract: un-acked messages redeliver on
    the next pull of the same durable; acked ones do not; an unfilled
    no_wait batch terminates with a 404 status, not a hang."""
    c = NatsClient(broker.host, broker.port)
    c.js_ensure_stream("s1", ["a.b"])
    c.js_ensure_consumer("s1", "dur")
    for p in (b"x", b"y", b"z"):
        c.js_publish("a.b", p)
    got = c.js_fetch("s1", "dur", 2)
    assert [pl for _t, pl, _s in got] == [b"x", b"y"]
    c.ack(got[0][0])  # ack only 'x'
    c.close()
    c2 = NatsClient(broker.host, broker.port)
    got2 = c2.js_fetch("s1", "dur", 10)  # unfilled batch → 404 ends it
    assert [pl for _t, pl, _s in got2] == [b"y", b"z"]
    for t, _p, _s in got2:
        c2.ack(t)
    assert c2.js_fetch("s1", "dur", 5) == []
    # idempotent re-creates; conflicting subjects rejected
    c2.js_ensure_stream("s1", ["a.b"])
    c2.js_ensure_consumer("s1", "dur")
    with pytest.raises(OSError, match="already in use"):
        c2.js_ensure_stream("s1", ["other.subj"])
    c2.close()


def test_nats_table_source_plain_and_poll(spark, broker):
    """CREATE TABLE ... WITH (connector='nats'): the stream retains
    messages published while the engine is away; poll_sources() pulls
    only unacked ones and MVs advance incrementally; restart re-attaches
    the durable consumer without refolding acked messages."""
    url = f"nats://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_nats_"))
    eng.sql(
        f"""CREATE TABLE no_ (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'nats', server_url = '{url}',
            subject = 'dev.data', stream = 'devs',
            consumer.durable_name = 'rw_no'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    _pub(broker, "dev.data", [
        json.dumps({"id": i, "v": i * 10}).encode() for i in range(1, 6)
    ])
    eng.sql("CREATE MATERIALIZED VIEW no_sum AS SELECT count(*) AS n, sum(v) AS sv FROM no_")
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM no_sum").first()) == (5, 150)
    _pub(broker, "dev.data", [json.dumps({"id": 6, "v": 60}).encode()])
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM no_sum").first()) == (6, 210)
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM no_sum").first()) == (6, 210)
    _pub(broker, "dev.data", [json.dumps({"id": 7, "v": 70}).encode()])
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM no_sum").first()) == (7, 280)


def test_nats_table_segmented_poll_cap(spark, broker):
    """max.poll.records bounds each fold segment: a deep backlog folds
    as N bounded pulls (ack per segment), never one giant list — and a
    crash after a fold-without-ack redelivers exactly that segment."""
    url = f"nats://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_natsc_"))
    eng.sql(
        f"""CREATE TABLE nc (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'nats', server_url = '{url}',
            subject = 'deep.t', stream = 'deeps',
            max.poll.records = '7'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    _pub(broker, "deep.t", [
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
    assert eng.sql("SELECT count(*) AS n FROM nc").first().n == 30


def test_nats_debezium_cdc(spark, broker):
    url = f"nats://{broker.host}:{broker.port}"

    def dbz(op, before, after):
        return json.dumps({"before": before, "after": after, "op": op, "ts_ms": 0}).encode()

    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_natsd_"))
    eng.sql(
        f"""CREATE TABLE nd (k int8 PRIMARY KEY, s varchar) WITH (
            connector = 'nats', server_url = '{url}',
            subject = 'cdc.t', stream = 'cdcs'
        ) FORMAT DEBEZIUM ENCODE JSON"""
    )
    _pub(broker, "cdc.t", [
        dbz("c", None, {"k": 1, "s": "a"}),
        dbz("c", None, {"k": 2, "s": "b"}),
    ])
    eng.poll_sources()
    _pub(broker, "cdc.t", [
        dbz("u", {"k": 1, "s": "a"}, {"k": 1, "s": "a2"}),
        dbz("d", {"k": 2, "s": "b"}, None),
    ])
    eng.poll_sources()
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM nd").collect()) == [(1, "a2")]


def test_nats_sink_plain_append_only(spark, broker):
    """CREATE SINK ... connector='nats': publishes insert payloads with
    PubAck confirmation; a retracting MV is rejected without
    force_append_only (`sink/nats.rs:78-111` append-only only)."""
    url = f"nats://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_natss_"))
    eng.sql("CREATE TABLE st (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW smv AS SELECT id, v * 2 AS v2 FROM st")
    with pytest.raises(Exception, match="append"):
        eng.sql(
            f"CREATE SINK bad FROM smv WITH (connector='nats', server_url='{url}', "
            "subject='out.t', stream='outs') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="PLAIN"):
        eng.sql(
            f"CREATE SINK bad2 FROM smv WITH (connector='nats', server_url='{url}', "
            "subject='out.t', stream='outs', force_append_only='true') "
            "FORMAT UPSERT ENCODE JSON"
        )
    eng.sql(
        f"CREATE SINK ok FROM smv WITH (connector='nats', server_url='{url}', "
        "subject='out.t', stream='outs', force_append_only='true') "
        "FORMAT PLAIN ENCODE JSON"
    )
    eng.sql("INSERT INTO st VALUES (1, 5), (2, 7)")
    eng.sql("INSERT INTO st VALUES (3, 9)")
    w = NatsClient(broker.host, broker.port)
    w.js_ensure_consumer("outs", "watch")
    got = []
    while True:
        batch = w.js_fetch("outs", "watch", 16)
        if not batch:
            break
        for tok, pl, _s in batch:
            got.append(tuple(json.loads(pl).values()))
            w.ack(tok)
    w.close()
    assert sorted(got) == [(1, 10), (2, 14), (3, 18)]


def test_nats_create_requires_pk_and_options(spark, broker):
    url = f"nats://{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_natse_"))
    with pytest.raises(Exception, match="PRIMARY KEY"):
        eng.sql(
            f"CREATE TABLE nk (id int8, v int8) WITH (connector='nats', "
            f"server_url='{url}', subject='x.t', stream='xs') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="subject and stream"):
        eng.sql(
            f"CREATE TABLE nt (id int8 PRIMARY KEY) WITH (connector='nats', "
            f"server_url='{url}', subject='x.t') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="server_url"):
        eng.sql(
            "CREATE TABLE nu (id int8 PRIMARY KEY) WITH (connector='nats', "
            "subject='x.t', stream='xs') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="connect_mode"):
        eng.sql(
            f"CREATE TABLE nm (id int8 PRIMARY KEY) WITH (connector='nats', "
            f"server_url='{url}', subject='x.t', stream='xs', "
            "connect_mode='credential') FORMAT PLAIN ENCODE JSON"
        )


def test_nats_server_down_recovery(spark):
    """Server down at replay: the table re-attaches with its durable
    state and the next poll after the server returns catches up —
    recovery is never blocked on a reachable server."""
    b = LoopbackNatsBroker().start()
    url = f"nats://{b.host}:{b.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_natsr_"))
    eng.sql(
        f"""CREATE TABLE nr (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'nats', server_url = '{url}',
            subject = 'r.t', stream = 'rs',
            consumer.durable_name = 'rw_nr'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    _pub(b, "r.t", [json.dumps({"id": 1, "v": 10}).encode()])
    eng.poll_sources()
    assert eng.sql("SELECT count(*) AS n FROM nr").first().n == 1
    b.stop()
    # replay with the server down: must not raise, table state intact
    eng2 = Engine.open(spark, eng.warehouse)
    assert eng2.sql("SELECT count(*) AS n FROM nr").first().n == 1
    eng2.poll_sources()  # still down: a no-op, not an error
    # server returns ON THE SAME PORT with its stream state (a real
    # JetStream server persists streams on disk; the loopback keeps
    # them in the broker object — re-seed to model the same contract)
    b2 = LoopbackNatsBroker(host=b.host, port=b.port).start()
    try:
        c = NatsClient(b2.host, b2.port)
        c.js_ensure_stream("rs", ["r.t"])
        c.js_ensure_consumer("rs", "rw_nr")
        # seq 1 was acked before the outage; model the persisted floor
        b2.consumers[("rs", "rw_nr")]["acked"].add(1)
        b2.streams["rs"]["next"] = 2
        c.js_publish("r.t", json.dumps({"id": 2, "v": 20}).encode())
        c.close()
        eng2.poll_sources()
        assert eng2.sql("SELECT count(*) AS n FROM nr").first().n == 2
    finally:
        b2.stop()
