"""Google Pub/Sub connector end-to-end over the real v1 REST API: a
loopback emulator (sources/pubsub.py LoopbackPubSubEmulator) and the
engine's pure-stdlib REST client exchange genuine
topics:publish / subscriptions:pull / :acknowledge JSON — the
reference's google_pubsub source/sink
(`src/connector/src/source/google_pubsub/`,
`src/connector/src/sink/google_pubsub.rs`) speak the same service via
the google-cloud SDK. Subscription-side unacked retention carries the
at-least-once contract that kafka offsets carry elsewhere."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.pubsub import LoopbackPubSubEmulator, PubSubClient


@pytest.fixture()
def emu():
    e = LoopbackPubSubEmulator().start()
    yield e
    e.stop()


def _setup(emu, project="p1", topic="t1", sub="s1"):
    c = PubSubClient(f"{emu.host}:{emu.port}")
    c.create_topic(project, topic)
    c.create_subscription(project, sub, topic)
    return c


def test_pubsub_rest_ack_redelivery(emu):
    """API contract: unacked messages redeliver on the next pull of the
    same subscription; acked ones do not; a second subscription gets
    its own independent copy of every message."""
    c = _setup(emu)
    c.create_subscription("p1", "s2", "t1")
    c.publish("p1", "t1", [b"x", b"y", b"z"])
    got = c.pull("p1", "s1", 2)
    assert [d for _a, d, _m in got] == [b"x", b"y"]
    c.acknowledge("p1", "s1", [got[0][0]])
    got2 = c.pull("p1", "s1", 10)
    assert [d for _a, d, _m in got2] == [b"y", b"z"]
    c.acknowledge("p1", "s1", [a for a, _d, _m in got2])
    assert c.pull("p1", "s1", 5) == []
    # fan-out: s2 still has all three
    assert [d for _a, d, _m in c.pull("p1", "s2", 10)] == [b"x", b"y", b"z"]


def test_pubsub_table_source_plain_and_poll(spark, emu):
    """CREATE TABLE ... WITH (connector='google_pubsub'): the
    subscription retains messages while the engine is away;
    poll_sources() pulls only unacked ones and MVs advance; restart
    re-attaches without refolding acked messages."""
    c = _setup(emu, sub="engine_sub")
    host = f"{emu.host}:{emu.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_ps_"))
    eng.sql(
        f"""CREATE TABLE po (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'google_pubsub',
            pubsub.subscription = 'projects/p1/subscriptions/engine_sub',
            pubsub.emulator_host = '{host}'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    c.publish("p1", "t1", [
        json.dumps({"id": i, "v": i * 10}).encode() for i in range(1, 6)
    ])
    eng.sql("CREATE MATERIALIZED VIEW po_sum AS SELECT count(*) AS n, sum(v) AS sv FROM po")
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM po_sum").first()) == (5, 150)
    c.publish("p1", "t1", [json.dumps({"id": 6, "v": 60}).encode()])
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM po_sum").first()) == (6, 210)
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM po_sum").first()) == (6, 210)
    c.publish("p1", "t1", [json.dumps({"id": 7, "v": 70}).encode()])
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM po_sum").first()) == (7, 280)


def test_pubsub_table_segmented_poll_cap(spark, emu):
    """max.poll.records bounds each pull/fold segment, acknowledge per
    segment — a deep backlog never buffers whole on the driver."""
    c = _setup(emu, sub="cap_sub")
    host = f"{emu.host}:{emu.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_psc_"))
    eng.sql(
        f"""CREATE TABLE pc (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'google_pubsub',
            pubsub.subscription = 'projects/p1/subscriptions/cap_sub',
            pubsub.emulator_host = '{host}',
            max.poll.records = '7'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    c.publish("p1", "t1", [
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
    assert eng.sql("SELECT count(*) AS n FROM pc").first().n == 30


def test_pubsub_debezium_cdc(spark, emu):
    c = _setup(emu, sub="cdc_sub")
    host = f"{emu.host}:{emu.port}"

    def dbz(op, before, after):
        return json.dumps({"before": before, "after": after, "op": op, "ts_ms": 0}).encode()

    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_psd_"))
    eng.sql(
        f"""CREATE TABLE pd (k int8 PRIMARY KEY, s varchar) WITH (
            connector = 'google_pubsub',
            pubsub.subscription = 'projects/p1/subscriptions/cdc_sub',
            pubsub.emulator_host = '{host}'
        ) FORMAT DEBEZIUM ENCODE JSON"""
    )
    c.publish("p1", "t1", [
        dbz("c", None, {"k": 1, "s": "a"}),
        dbz("c", None, {"k": 2, "s": "b"}),
    ])
    eng.poll_sources()
    c.publish("p1", "t1", [
        dbz("u", {"k": 1, "s": "a"}, {"k": 1, "s": "a2"}),
        dbz("d", {"k": 2, "s": "b"}, None),
    ])
    eng.poll_sources()
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM pd").collect()) == [(1, "a2")]


def test_pubsub_sink_plain_append_only(spark, emu):
    """CREATE SINK ... connector='google_pubsub': batch-publishes insert
    payloads; a retracting MV is rejected without force_append_only
    (`google_pubsub.rs:126-128` append-only only)."""
    host = f"{emu.host}:{emu.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pss_"))
    eng.sql("CREATE TABLE st (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW smv AS SELECT id, v * 2 AS v2 FROM st")
    with pytest.raises(Exception, match="append"):
        eng.sql(
            f"CREATE SINK bad FROM smv WITH (connector='google_pubsub', "
            f"pubsub.project_id='p1', pubsub.topic='out', "
            f"pubsub.emulator_host='{host}') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="PLAIN"):
        eng.sql(
            f"CREATE SINK bad2 FROM smv WITH (connector='google_pubsub', "
            f"pubsub.project_id='p1', pubsub.topic='out', "
            f"pubsub.emulator_host='{host}', force_append_only='true') "
            "FORMAT DEBEZIUM ENCODE JSON"
        )
    eng.sql(
        f"CREATE SINK ok FROM smv WITH (connector='google_pubsub', "
        f"pubsub.project_id='p1', pubsub.topic='out', "
        f"pubsub.emulator_host='{host}', force_append_only='true') "
        "FORMAT PLAIN ENCODE JSON"
    )
    # a watcher subscription created AFTER the sink sees later inserts
    c = PubSubClient(host)
    c.create_subscription("p1", "watch", "out")
    eng.sql("INSERT INTO st VALUES (1, 5), (2, 7)")
    eng.sql("INSERT INTO st VALUES (3, 9)")
    got = []
    while True:
        batch = c.pull("p1", "watch", 16)
        if not batch:
            break
        got += [tuple(json.loads(d).values()) for _a, d, _m in batch]
        c.acknowledge("p1", "watch", [a for a, _d, _m in batch])
    assert sorted(got) == [(1, 10), (2, 14), (3, 18)]


def test_pubsub_create_requires_pk_and_options(spark, emu):
    host = f"{emu.host}:{emu.port}"
    _setup(emu, sub="v_sub")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pse_"))
    with pytest.raises(Exception, match="PRIMARY KEY"):
        eng.sql(
            f"CREATE TABLE nk (id int8, v int8) WITH (connector='google_pubsub', "
            f"pubsub.subscription='projects/p1/subscriptions/v_sub', "
            f"pubsub.emulator_host='{host}') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="pubsub.subscription"):
        eng.sql(
            f"CREATE TABLE ns (id int8 PRIMARY KEY) WITH (connector='google_pubsub', "
            f"pubsub.emulator_host='{host}') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="emulator_host"):
        eng.sql(
            "CREATE TABLE nh (id int8 PRIMARY KEY) WITH (connector='google_pubsub', "
            "pubsub.subscription='projects/p1/subscriptions/v_sub') "
            "FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="projects/"):
        eng.sql(
            f"CREATE TABLE nb (id int8 PRIMARY KEY) WITH (connector='google_pubsub', "
            f"pubsub.subscription='badpath', pubsub.emulator_host='{host}') "
            "FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(Exception, match="HTTP 404"):
        eng.sql(
            f"CREATE TABLE ng (id int8 PRIMARY KEY) WITH (connector='google_pubsub', "
            f"pubsub.subscription='projects/p1/subscriptions/ghost', "
            f"pubsub.emulator_host='{host}') FORMAT PLAIN ENCODE JSON"
        )
    with pytest.raises(ValueError, match="emulator_host"):
        eng.sql(
            "CREATE TABLE ncred (id int8 PRIMARY KEY) WITH (connector='google_pubsub', "
            "pubsub.subscription='projects/p1/subscriptions/v_sub', "
            "pubsub.credentials='{}') FORMAT PLAIN ENCODE JSON"
        )


def test_pubsub_emulator_down_recovery(spark):
    """Emulator down at replay: the table re-attaches with its durable
    state; the next poll after the service returns catches up."""
    e = LoopbackPubSubEmulator().start()
    host = f"{e.host}:{e.port}"
    c = _setup(e, sub="r_sub")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_psr_"))
    eng.sql(
        f"""CREATE TABLE pr (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'google_pubsub',
            pubsub.subscription = 'projects/p1/subscriptions/r_sub',
            pubsub.emulator_host = '{host}'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    c.publish("p1", "t1", [json.dumps({"id": 1, "v": 10}).encode()])
    eng.poll_sources()
    assert eng.sql("SELECT count(*) AS n FROM pr").first().n == 1
    e.stop()
    eng2 = Engine.open(spark, eng.warehouse)
    assert eng2.sql("SELECT count(*) AS n FROM pr").first().n == 1
    eng2.poll_sources()  # still down: a no-op, not an error
    # service returns on the same port with its retained state (the
    # real service persists subscriptions; re-seed the loopback to
    # model the same contract: message 1 was acked)
    e2 = LoopbackPubSubEmulator(host=e.host, port=e.port).start()
    try:
        c2 = _setup(e2, sub="r_sub")
        e2.subs["projects/p1/subscriptions/r_sub"]["acked"].add(1)
        e2._next_mid = 2
        c2.publish("p1", "t1", [json.dumps({"id": 2, "v": 20}).encode()])
        eng2.poll_sources()
        assert eng2.sql("SELECT count(*) AS n FROM pr").first().n == 2
    finally:
        e2.stop()


def test_pubsub_oauth_rs256_verified(spark):
    """pubsub.credentials: the production OAuth exchange — the
    loopback VERIFIES the RS256 assertion and demands the issued
    Bearer on /v1 requests; forged keys and bare clients are rejected
    on the wire."""
    import json as _json

    from risingwave_spark.sources.pubsub import (
        LoopbackPubSubEmulator,
        PubSubClient,
    )
    from risingwave_spark.sources.rsa_jwt import generate_keypair

    key = generate_keypair()
    emu = LoopbackPubSubEmulator(
        client_email="svc@rw.test", public_key=key).start()
    host = f"{emu.host}:{emu.port}"
    try:
        creds = {
            "client_email": "svc@rw.test",
            "private_key_n": str(key["n"]),
            "private_key_e": str(key["e"]),
            "private_key_d": str(key["d"]),
        }
        c = PubSubClient(host, credentials=creds)
        c.create_topic("p1", "sec")
        c.create_subscription("p1", "watch", "sec")
        # bare client (no token) is rejected
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            PubSubClient(host).create_topic("p1", "nope")
        # forged key fails the token exchange
        forged = dict(creds)
        forged["private_key_d"] = str(generate_keypair()["d"])
        with pytest.raises(OSError, match="401|invalid"):
            PubSubClient(host, credentials=forged).create_topic("p1", "x")
        # credentialed source + sink end-to-end (tokens ride every call
        # including the executor-side publish tasks)
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_psoa_"))
        eng.sql("CREATE TABLE st (id int8 PRIMARY KEY, v int8)")
        eng.sql("CREATE MATERIALIZED VIEW smv AS "
                "SELECT id, v * 2 AS v2 FROM st")
        eng.sql(
            f"""CREATE SINK s FROM smv WITH (connector='google_pubsub',
                pubsub.emulator_host='{host}', pubsub.project_id='p1',
                pubsub.topic='sec', force_append_only='true',
                pubsub.credentials='{_json.dumps(creds)}'
            ) FORMAT PLAIN ENCODE JSON"""
        )
        eng.sql("INSERT INTO st VALUES (1, 5), (2, 7)")
        got = sorted(
            tuple(json.loads(d).values())
            for _a, d, _m in c.pull("p1", "watch", 16)
        )
        assert got == [(1, 10), (2, 14)]
        eng.sql(
            f"""CREATE TABLE back (id int8 PRIMARY KEY, v2 int8) WITH (
                connector = 'google_pubsub',
                pubsub.emulator_host = '{host}',
                pubsub.project_id = 'p1',
                pubsub.subscription = 'projects/p1/subscriptions/watch',
                pubsub.credentials = '{_json.dumps(creds)}'
            ) FORMAT PLAIN ENCODE JSON"""
        )
        n = eng.sql("SELECT count(*) AS n FROM back").first().n
        assert n == 2
    finally:
        emu.stop()
