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


def test_murmur2_matches_kafka_vectors():
    """Kafka's DefaultPartitioner hash (Utils.murmur2) — exact test
    vectors from the Kafka codebase's UtilsTest, so a Java consumer
    sees this engine's keyed messages on the partitions it expects."""
    from risingwave_spark.sources.kafka_wire import default_partition, murmur2

    def signed(x):
        return x - (1 << 32) if x >= (1 << 31) else x

    assert signed(murmur2(b"21")) == -973932308
    assert signed(murmur2(b"foobar")) == -790332482
    assert signed(murmur2(b"a-little-bit-long-string")) == -985981536
    assert signed(murmur2(b"a-little-bit-longer-string")) == -1486304829
    assert signed(murmur2(b"abc")) == 479470107
    assert 0 <= default_partition(b"anything", 7) < 7


def test_kafka_multi_partition_roundtrip(spark):
    """Multi-partition topic: the sink routes each key via murmur2 to
    ONE partition (per-key order preserved — Kafka's only ordering
    guarantee), the source fetches every partition with independent
    durable offsets, and the MV chain stays exact across polls."""
    b = LoopbackKafkaBroker(num_partitions=4).start()
    try:
        bs = f"{b.host}:{b.port}"
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kmp_"))
        eng.sql("CREATE TABLE mt (id int8 PRIMARY KEY, grp varchar, v int8)")
        eng.sql(
            "CREATE MATERIALIZED VIEW mmv AS SELECT grp, sum(v) AS total "
            "FROM mt GROUP BY grp"
        )
        eng.sql(
            f"""CREATE SINK msink FROM mmv WITH (
                connector = 'kafka', topic = 'mp_t',
                properties.bootstrap.server = '{bs}'
            ) FORMAT UPSERT ENCODE JSON"""
        )
        for i in range(40):
            eng.sql(f"INSERT INTO mt VALUES ({i}, 'g{i % 8}', {i})")
        eng.sql("DELETE FROM mt WHERE id % 10 = 0")
        # every key's messages live on exactly ONE partition, >1 used
        c = KafkaWireClient(b.host, b.port)
        seen: dict = {}
        used = set()
        for pid in range(4):
            recs, _ = c.fetch("mp_t", pid, 0)
            if recs:
                used.add(pid)
            for _o, _t, k, v in recs:
                key = json.loads(k)["grp"]
                assert seen.get(key, pid) == pid, f"key {key} split across partitions"
                seen[key] = pid
        assert len(used) > 1, "all keys landed on one partition"
        # sink bytes reconstruct to the MV state (tombstone-aware)
        want = {(r.grp, r.total) for r in eng.sql("SELECT grp, total FROM mmv").collect()}
        state = {}
        for pid in range(4):
            recs, _ = c.fetch("mp_t", pid, 0)
            for _o, _t, k, v in recs:
                key = json.loads(k)["grp"]
                if v is None:
                    state.pop(key, None)
                else:
                    state[key] = json.loads(v)["total"]
        assert {(k, v) for k, v in state.items()} == want
        # multi-partition SOURCE: disjoint plain rows on each partition,
        # per-partition durable offsets across polls
        for pid in range(4):
            c.produce("src_t", pid, [
                (None, json.dumps({"id": pid * 100 + i, "v": i}).encode(), NOW)
                for i in range(3)
            ])
        eng3 = Engine(spark, tempfile.mkdtemp(prefix="rw_kmp3_"))
        eng3.sql(
            f"""CREATE TABLE msrc (id int8 PRIMARY KEY, v int8)
            WITH (connector = 'kafka', topic = 'src_t',
                  properties.bootstrap.server = '{bs}')
            FORMAT PLAIN ENCODE JSON"""
        )
        assert eng3.sql("SELECT count(*) AS n FROM msrc").first().n == 12
        c.produce("src_t", 2, [(None, json.dumps({"id": 999, "v": 9}).encode(), NOW)])
        eng3.poll_sources()
        assert eng3.sql("SELECT count(*) AS n FROM msrc").first().n == 13
        c.close()
    finally:
        b.stop()


def test_kafka_upsert_source_closes_the_loop(spark, broker, client):
    """FORMAT UPSERT source (reference `parser/upsert_parser.rs`): an
    engine MV streams upsert events into the topic; a SECOND engine
    consumes the topic into a pk table — tombstones delete, values
    replace, last-per-key wins — and a downstream MV retracts exactly.
    This is the full sink→topic→source loop on one wire."""
    bs = f"{broker.host}:{broker.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kul_"))
    eng.sql("CREATE TABLE ut (id int8 PRIMARY KEY, grp varchar, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW umv AS SELECT grp, sum(v) AS total FROM ut GROUP BY grp")
    eng.sql(
        f"""CREATE SINK usink FROM umv WITH (
            connector = 'kafka', topic = 'loop_t',
            properties.bootstrap.server = '{bs}'
        ) FORMAT UPSERT ENCODE JSON"""
    )
    eng.sql("INSERT INTO ut VALUES (1,'a',5),(2,'b',7),(3,'a',3)")
    eng2 = Engine(spark, tempfile.mkdtemp(prefix="rw_kul2_"))
    eng2.sql(
        f"""CREATE TABLE mirror (grp varchar PRIMARY KEY, total int8)
        WITH (connector = 'kafka', topic = 'loop_t',
              properties.bootstrap.server = '{bs}')
        FORMAT UPSERT ENCODE JSON"""
    )
    eng2.sql("CREATE MATERIALIZED VIEW mn AS SELECT count(*) AS n, sum(total) AS st FROM mirror")

    def mirror_rows():
        return sorted(tuple(r) for r in eng2.sql("SELECT grp, total FROM mirror").collect())

    assert mirror_rows() == [("a", 8), ("b", 7)]
    # delete ALL of group b upstream → tombstone → mirror row vanishes
    eng.sql("DELETE FROM ut WHERE grp = 'b'")
    eng.sql("INSERT INTO ut VALUES (4,'a',2)")
    eng2.poll_sources()
    assert mirror_rows() == [("a", 10)]
    r = eng2.sql("SELECT n, st FROM mn").first()
    assert (r.n, r.st) == (1, 10)


def test_kafka_replay_tolerates_broker_down(spark):
    """Engine.open must replay a catalog holding kafka tables and sinks
    while the broker is UNREACHABLE: tables re-attach their durable
    state, sinks resume their cursor, nothing raises — and the first
    poll after the broker returns catches up (the reference reader
    reconnects rather than failing recovery)."""
    b = LoopbackKafkaBroker().start()
    bs = f"{b.host}:{b.port}"
    port = b.port
    c = KafkaWireClient(b.host, b.port)
    c.produce("rt_t", 0, [(None, json.dumps({"id": 1, "v": 10}).encode(), NOW)])
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_krd_"))
    eng.sql(
        f"""CREATE TABLE rt (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'kafka', topic = 'rt_t',
            properties.bootstrap.server = '{bs}'
        ) FORMAT PLAIN ENCODE JSON"""
    )
    eng.sql("CREATE MATERIALIZED VIEW rtm AS SELECT sum(v) AS sv FROM rt")
    eng.sql(
        f"""CREATE SINK rts FROM rtm WITH (
            connector = 'kafka', topic = 'rt_out',
            properties.bootstrap.server = '{bs}'
        ) FORMAT UPSERT ENCODE JSON"""
    )
    c.close()
    b.stop()
    # broker gone: replay must succeed on durable state alone
    eng2 = Engine.open(spark, eng.warehouse)
    assert eng2.sql("SELECT sv FROM rtm").first().sv == 10
    eng2.poll_sources()  # no-op, no raise
    # DML with the broker down: the sink leaves its chunk un-acked
    eng2.sql("INSERT INTO rt VALUES (2, 5)")
    assert eng2.sql("SELECT sv FROM rtm").first().sv == 15
    # broker returns ON THE SAME PORT: catch-up delivers the held chunk
    b2 = LoopbackKafkaBroker(port=port).start()
    try:
        c2 = KafkaWireClient(b2.host, b2.port)
        # the replacement FIXTURE starts with an empty log while the
        # engine's durable offset is 1 (real brokers persist logs):
        # pad offset 0 so the live record lands at the resume point
        c2.produce("rt_t", 0, [
            (None, json.dumps({"id": 99, "v": 0}).encode(), NOW),
            (None, json.dumps({"id": 3, "v": 1}).encode(), NOW),
        ])
        eng2.sql("INSERT INTO rt VALUES (4, 100)")  # triggers sink drain
        eng2.poll_sources()
        assert eng2.sql("SELECT sv FROM rtm").first().sv == 116
        recs, _ = c2.fetch("rt_out", 0, 0)
        vals = [json.loads(v)["sv"] for _o, _t, _k, v in recs if v is not None]
        # held chunk (15) and the new one (115/116 path) both arrive
        assert 15 in vals and vals[-1] == 116
        c2.close()
    finally:
        b2.stop()


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
