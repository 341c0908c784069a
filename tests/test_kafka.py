"""Kafka connector end-to-end over the REAL wire protocol: a loopback
broker fixture (sources/kafka_broker.py) and the engine's pure-stdlib
wire client exchange genuine ApiVersions/Metadata/Produce/Fetch/
ListOffsets bytes with message-format-v2 RecordBatches — the reference
runs the same shapes against a real broker in
`e2e_test/source_inline/kafka/` (reference reader:
`src/connector/src/source/kafka/source/reader.rs`, sink:
`src/connector/src/sink/kafka.rs`)."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.kafka_broker import LoopbackKafkaBroker
from risingwave_spark.sources.kafka_wire import (
    KafkaWireClient,
    crc32c,
    decode_record_batches,
    encode_record_batch,
)

NOW = 1700000000000


@pytest.fixture()
def broker():
    b = LoopbackKafkaBroker().start()
    yield b
    b.stop()


@pytest.fixture()
def client(broker):
    c = KafkaWireClient(broker.host, broker.port)
    yield c
    c.close()


def test_wire_codecs_and_crc32c():
    """CRC32C known-answer (RFC 3720 test vector) and RecordBatch v2
    round-trip including null keys/values and timestamp deltas."""
    assert crc32c(b"123456789") == 0xE3069283
    recs = [(b"k", b"v", 1000), (None, b"w", 1005), (b"t", None, 1010)]
    buf = encode_record_batch(recs, base_offset=7)
    got = decode_record_batches(buf)
    assert got == [(7, 1000, b"k", b"v"), (8, 1005, None, b"w"), (9, 1010, b"t", None)]
    # corrupt one payload byte → CRC must fail loudly
    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(bad))


def test_broker_produce_fetch_offsets(client):
    assert 0 in client.api_versions()
    base = client.produce("t1", 0, [(b"a", b"1", NOW), (b"b", b"2", NOW)])
    assert base == 0
    assert client.produce("t1", 0, [(b"c", None, NOW)]) == 2
    recs, hwm = client.fetch("t1", 0, 0)
    assert [(o, k, v) for o, _t, k, v in recs] == [
        (0, b"a", b"1"), (1, b"b", b"2"), (2, b"c", None)
    ]
    assert hwm == 3
    recs, _ = client.fetch("t1", 0, 2)
    assert [(o, k, v) for o, _t, k, v in recs] == [(2, b"c", None)]
    assert client.list_offsets("t1", 0, -2) == 0
    assert client.list_offsets("t1", 0, -1) == 3
    meta = client.metadata(["t1"])
    assert meta["topics"]["t1"]["partitions"][0]["leader"] == 0


def test_kafka_table_source_plain_and_poll(spark, broker, client):
    """CREATE TABLE ... WITH (connector='kafka') FORMAT PLAIN: initial
    catch-up at create, durable offsets, poll_sources() folds only new
    records and MVs advance incrementally (reader.rs offset contract)."""
    bs = f"{broker.host}:{broker.port}"
    client.produce("orders_t", 0, [
        (None, json.dumps({"id": i, "v": i * 10}).encode(), NOW) for i in range(1, 6)
    ])
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kafka_"))
    eng.sql(
        f"""CREATE TABLE ko (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'kafka', topic = 'orders_t',
            properties.bootstrap.server = '{bs}'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    assert eng.sql("SELECT count(*) AS n, sum(v) AS s FROM ko").first()[:] == (5, 150)
    eng.sql("CREATE MATERIALIZED VIEW ko_sum AS SELECT count(*) AS n, sum(v) AS sv FROM ko")
    client.produce("orders_t", 0, [(None, json.dumps({"id": 6, "v": 60}).encode(), NOW)])
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM ko_sum").first()) == (6, 210)
    # restart: offsets are durable — reopen folds nothing, next poll does
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM ko_sum").first()) == (6, 210)
    client.produce("orders_t", 0, [(None, json.dumps({"id": 7, "v": 70}).encode(), NOW)])
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM ko_sum").first()) == (7, 280)


def test_kafka_cdc_debezium_table(spark, broker, client):
    """Broker CDC: CREATE TABLE ... FORMAT DEBEZIUM over the kafka
    fixture topic — c/u/d envelopes fold as +after / −before+after /
    −before (debezium_parser.rs), across polls and restart."""
    bs = f"{broker.host}:{broker.port}"

    def dbz(op, before, after):
        return json.dumps({"before": before, "after": after, "op": op, "ts_ms": NOW}).encode()

    client.produce("cdc_t", 0, [
        (None, dbz("c", None, {"k": 1, "s": "a"}), NOW),
        (None, dbz("c", None, {"k": 2, "s": "b"}), NOW),
        (None, dbz("r", None, {"k": 3, "s": "c"}), NOW),
    ])
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kcdc_"))
    eng.sql(
        f"""CREATE TABLE kcdc (k int8 PRIMARY KEY, s varchar) WITH (
            connector = 'kafka', topic = 'cdc_t',
            properties.bootstrap.server = '{bs}'
        ) FORMAT DEBEZIUM ENCODE JSON"""
    )
    eng.sql("CREATE MATERIALIZED VIEW kcdc_n AS SELECT count(*) AS n FROM kcdc")
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM kcdc").collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    client.produce("cdc_t", 0, [
        (None, dbz("u", {"k": 1, "s": "a"}, {"k": 1, "s": "a2"}), NOW),
        (None, dbz("d", {"k": 2, "s": "b"}, None), NOW),
    ])
    eng.poll_sources()
    assert sorted(tuple(r) for r in eng.sql("SELECT k, s FROM kcdc").collect()) == [
        (1, "a2"), (3, "c")
    ]
    assert eng.sql("SELECT n FROM kcdc_n").first().n == 2


def test_kafka_sink_debezium_and_upsert(spark, broker, client):
    """CREATE SINK ... FORMAT DEBEZIUM/UPSERT over the wire: snapshot
    bootstrap, c/u/d envelopes with the golden formatter layout,
    upsert tombstones, and restart cursor resume without re-emitting."""
    bs = f"{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_ksink_"))
    eng.sql("CREATE TABLE st (id int8 PRIMARY KEY, grp varchar, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW smv AS SELECT grp, sum(v) AS total FROM st GROUP BY grp")
    eng.sql(
        f"""CREATE SINK sdbz FROM smv WITH (
            connector = 'kafka', topic = 'out_dbz',
            properties.bootstrap.server = '{bs}'
        ) FORMAT DEBEZIUM ENCODE JSON"""
    )
    eng.sql(
        f"""CREATE SINK sups FROM smv WITH (
            connector = 'kafka', topic = 'out_ups',
            properties.bootstrap.server = '{bs}'
        ) FORMAT UPSERT ENCODE JSON"""
    )
    eng.sql("INSERT INTO st VALUES (1,'a',5),(2,'b',7)")
    eng.sql("INSERT INTO st VALUES (3,'a',3)")
    eng.sql("DELETE FROM st WHERE id = 2")

    recs, _ = client.fetch("out_dbz", 0, 0)
    events = [
        (json.loads(k)["payload"], json.loads(v)["payload"] if v else None)
        for _o, _t, k, v in recs
    ]
    ops = [
        (p["op"],
         (p["after"] or p["before"])["grp"],
         p["after"]["total"] if p["after"] else None)
        for _k, p in events if p is not None
    ]
    assert ops == [("c", "a", 5), ("c", "b", 7), ("u", "a", 8), ("d", "b", None)]
    assert events[-1][1] is None  # compacted-topic tombstone after the d
    # value envelope carries the Connect schema block (golden layout)
    first_val = json.loads(recs[0][3])
    assert first_val["schema"]["type"] == "struct"
    assert {f["field"] for f in first_val["schema"]["fields"]} >= {"before", "after", "op"}

    recs, _ = client.fetch("out_ups", 0, 0)
    ups = [(json.loads(k)["grp"], json.loads(v)["total"] if v else None)
           for _o, _t, k, v in recs]
    assert ups == [("a", 5), ("b", 7), ("a", 8), ("b", None)]

    # restart: the sink resumes from its durable cursor — no re-emit
    eng2 = Engine.open(spark, eng.warehouse)
    eng2.sql("INSERT INTO st VALUES (4,'c',1)")
    recs, _ = client.fetch("out_ups", 0, 0)
    ups = [(json.loads(k)["grp"], json.loads(v)["total"] if v else None)
           for _o, _t, k, v in recs]
    assert ups == [("a", 5), ("b", 7), ("a", 8), ("b", None), ("c", 1)]


def test_kafka_sink_needs_key_and_options(spark, broker):
    bs = f"{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kerr_"))
    eng.sql("CREATE TABLE et (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW emv AS SELECT id, v FROM et WHERE v > 0")
    with pytest.raises(Exception, match="topic"):
        eng.sql(
            f"CREATE SINK bad FROM emv WITH (connector='kafka', "
            f"properties.bootstrap.server='{bs}')"
        )
    with pytest.raises(Exception, match="format"):
        eng.sql(
            f"CREATE SINK bad2 FROM emv WITH (connector='kafka', topic='x', "
            f"properties.bootstrap.server='{bs}') FORMAT AVRO"
        )
    # broker unreachable at create → loud failure (reference validates
    # sink connectivity at CREATE)
    with pytest.raises(Exception):
        eng.sql(
            "CREATE SINK bad3 FROM emv WITH (connector='kafka', topic='x', "
            "properties.bootstrap.server='127.0.0.1:1')"
        )
