"""ENCODE AVRO/PROTOBUF through the keyless/partition_key broker
connectors (pulsar/nats/mqtt/google_pubsub) — one shared decode layer
(sources/decoders.py + the file-backed schema registry), the same
Confluent framing the kafka connector reads (reference
`parser/avro/parser.rs`, `parser/schema_registry.rs`). FORMAT PLAIN
only on these wires: no Confluent-framed message keys, so the
avro-upsert key contract doesn't apply (rejected loud)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.decoders import avro_encode_record, confluent_wrap
from risingwave_spark.sources.schema_registry import FileSchemaRegistry


def test_pulsar_avro_source_roundtrip(spark):
    from risingwave_spark.sources.pulsar_broker import LoopbackPulsarBroker
    from risingwave_spark.sources.pulsar_wire import PulsarWireClient

    b = LoopbackPulsarBroker().start()
    topic = "persistent://public/default/av"
    reg_dir = tempfile.mkdtemp(prefix="rw_preg_")
    reg = FileSchemaRegistry(reg_dir)
    schema = [("id", "long"), ("name", "?string")]
    sid = reg.register("av-value", schema)
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pulav_"))
        eng.sql(
            f"""CREATE TABLE pav (id int8 PRIMARY KEY, name varchar) WITH (
                connector = 'pulsar', topic = '{topic}',
                service.url = 'pulsar://{b.host}:{b.port}',
                schema.registry = '{reg_dir}'
            ) FORMAT PLAIN ENCODE AVRO"""
        )
        c = PulsarWireClient(b.host, b.port)
        pname = c.create_producer(topic, producer_id=1)
        for i, row in enumerate(
            [{"id": 1, "name": "a"}, {"id": 2, "name": None}, {"id": 3, "name": "c"}]
        ):
            c.send(1, pname, i, confluent_wrap(sid, avro_encode_record(schema, row)))
        c.close()
        eng.poll_sources()
        assert sorted(tuple(r) for r in eng.sql("SELECT id, name FROM pav").collect()) == [
            (1, "a"), (2, None), (3, "c"),
        ]
    finally:
        b.stop()


def test_nats_avro_source_roundtrip(spark):
    from risingwave_spark.sources.nats_broker import LoopbackNatsBroker
    from risingwave_spark.sources.nats_wire import NatsClient

    b = LoopbackNatsBroker().start()
    reg_dir = tempfile.mkdtemp(prefix="rw_nreg_")
    reg = FileSchemaRegistry(reg_dir)
    schema = [("id", "long"), ("v", "?long")]
    sid = reg.register("av.subj-value", schema)
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_natav_"))
        eng.sql(
            f"""CREATE TABLE nav (id int8 PRIMARY KEY, v int8) WITH (
                connector = 'nats',
                server_url = 'nats://{b.host}:{b.port}',
                subject = 'av.subj', stream = 'avs',
                schema.registry = '{reg_dir}'
            ) FORMAT PLAIN ENCODE AVRO"""
        )
        c = NatsClient(b.host, b.port)
        for row in [{"id": 1, "v": 10}, {"id": 2, "v": None}]:
            c.js_publish(
                "av.subj", confluent_wrap(sid, avro_encode_record(schema, row))
            )
        c.close()
        eng.poll_sources()
        assert sorted(tuple(r) for r in eng.sql("SELECT id, v FROM nav").collect()) == [
            (1, 10), (2, None),
        ]
    finally:
        b.stop()


def test_keyless_avro_requires_plain_and_registry(spark):
    """ENCODE AVRO with FORMAT UPSERT/DEBEZIUM rejects loud on keyless
    wires; a missing schema.registry option rejects loud too."""
    from risingwave_spark.sources.pulsar_broker import LoopbackPulsarBroker

    b = LoopbackPulsarBroker().start()
    url = f"pulsar://{b.host}:{b.port}"
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_avval_"))
        with pytest.raises(Exception, match="PLAIN only"):
            eng.sql(
                f"CREATE TABLE b1 (id int8 PRIMARY KEY) WITH (connector='pulsar', "
                f"topic='persistent://public/default/x', service.url='{url}', "
                "schema.registry='/tmp/rw_reg_x') FORMAT UPSERT ENCODE AVRO"
            )
        with pytest.raises(Exception, match="schema.registry"):
            eng.sql(
                f"CREATE TABLE b2 (id int8 PRIMARY KEY) WITH (connector='pulsar', "
                f"topic='persistent://public/default/x', service.url='{url}') "
                "FORMAT PLAIN ENCODE AVRO"
            )
        # mqtt previously IGNORED an ENCODE it didn't support — now loud
        with pytest.raises(Exception, match="PLAIN only"):
            eng.sql(
                "CREATE TABLE b3 (id int8 PRIMARY KEY) WITH (connector='mqtt', "
                "url='tcp://127.0.0.1:1', topic='x/t', "
                "schema.registry='/tmp/rw_reg_x') FORMAT DEBEZIUM ENCODE AVRO"
            )
    finally:
        b.stop()
