"""Connector ingest soak (round 9, VERDICT #8): fold a deep broker
backlog through source → grouped-agg MV → upsert sink at three
max.poll.records settings and record throughput plus the PYTHON driver
RSS ceiling (ru_maxrss of this process — the Python side is where the
old unbounded `recs.extend` buffered; the JVM is a separate process).

Run one cap per invocation so ru_maxrss is an honest per-cap ceiling:

    for cap in 2000 10000 60000; do
        python tests/soak_connector.py --cap $cap --rows 60000
    done
    python tests/soak_connector.py --connector pulsar --cap 10000

`--connector pulsar` runs the same shape over the binary-protocol
wire (durable subscription cursor instead of engine offsets, sink
FORMAT UPSERT with partition_key tombstone contract).

Each run prints ONE JSON line; paste results into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=10000)
    ap.add_argument("--rows", type=int, default=60000)
    ap.add_argument("--groups", type=int, default=500)
    ap.add_argument(
        "--connector",
        choices=["kafka", "pulsar", "nats", "pubsub"],
        default="kafka",
    )
    args = ap.parse_args()
    if args.connector == "pulsar":
        return soak_pulsar(args)
    if args.connector == "nats":
        return soak_nats(args)
    if args.connector == "pubsub":
        return soak_pubsub(args)

    from risingwave_spark.api import Engine
    from risingwave_spark.session import get_spark
    from risingwave_spark.sources.kafka_broker import LoopbackKafkaBroker
    from risingwave_spark.sources.kafka_wire import KafkaWireClient

    spark = get_spark("rw_connector_soak", cpus="8")
    broker = LoopbackKafkaBroker().start()
    try:
        prod = KafkaWireClient(broker.host, broker.port)
        # deep backlog BEFORE the table exists (recovery-after-downtime
        # shape); keys shift per row — no same-key densification
        t0 = time.time()
        for base in range(0, args.rows, 5000):
            prod.produce("soak_t", 0, [
                (None, json.dumps(
                    {"id": i, "grp": i % args.groups, "v": i % 97}).encode(),
                 1700000000000)
                for i in range(base, min(base + 5000, args.rows))
            ])
        prod.close()
        produce_s = time.time() - t0
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_soak_"))
        # warm the Spark/py4j machinery so ru_maxrss deltas attribute to
        # ingest, not first-query JIT/session setup
        eng.sql("CREATE TABLE skt_warm (id int8 PRIMARY KEY)")
        eng.sql("INSERT INTO skt_warm VALUES (1)")
        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.time()
        eng.sql(
            f"""CREATE TABLE skt (id int8 PRIMARY KEY, grp int8, v int8)
            WITH (connector = 'kafka', topic = 'soak_t',
                  properties.bootstrap.server = '{broker.host}:{broker.port}',
                  max.poll.records = '{args.cap}')
            FORMAT PLAIN ENCODE JSON"""
        )
        eng.sql(
            "CREATE MATERIALIZED VIEW soak_mv AS SELECT grp, count(*) AS n, "
            "sum(v) AS sv FROM skt GROUP BY grp"
        )
        eng.sql(
            f"""CREATE SINK soak_sink FROM soak_mv WITH (
                connector = 'kafka', topic = 'soak_out',
                properties.bootstrap.server = '{broker.host}:{broker.port}'
            ) FORMAT UPSERT ENCODE JSON"""
        )
        ingest_s = time.time() - t0
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        n = eng.sql("SELECT count(*) AS n FROM skt").first().n
        assert n == args.rows, f"ingested {n} != {args.rows}"
        g = eng.sql("SELECT count(*) AS g FROM soak_mv").first().g
        cons = KafkaWireClient(broker.host, broker.port)
        recs, _ = cons.fetch("soak_out", 0, 0, max_bytes=64 << 20)
        cons.close()
        out = json.dumps({
            "cap": args.cap, "rows": args.rows, "groups_in_mv": g,
            "ingest_sec": round(ingest_s, 2),
            "rows_per_sec": round(args.rows / ingest_s),
            "produce_sec": round(produce_s, 2),
            "py_rss_before_mb": rss_before // 1024,
            "py_rss_peak_mb": rss_after // 1024,
            "sink_events": len(recs),
        })
        # file, not stdout: Spark progress bars mangle stdout lines
        with open(f"/tmp/soak_connector_cap{args.cap}.json", "w") as f:
            f.write(out + "\n")
        print(out)
    finally:
        broker.stop()
        spark.stop()




def soak_pulsar(args) -> None:
    """Same soak shape over the pulsar binary protocol: deep backlog
    produced before the table exists, bounded FLOW segments, durable
    subscription cursor, upsert sink reconstructing the MV."""
    from risingwave_spark.api import Engine
    from risingwave_spark.session import get_spark
    from risingwave_spark.sources.pulsar_broker import LoopbackPulsarBroker
    from risingwave_spark.sources.pulsar_wire import PulsarWireClient

    spark = get_spark("rw_connector_soak_pulsar", cpus="8")
    broker = LoopbackPulsarBroker().start()
    topic = "persistent://public/default/soak_t"
    out_topic = "persistent://public/default/soak_out"
    try:
        t0 = time.time()
        prod = PulsarWireClient(broker.host, broker.port)
        pname = prod.create_producer(topic, producer_id=1)
        # pipelined sends (send_batch): the r9 soak measured the
        # per-SEND round trip as the bottleneck vs kafka
        prod.send_batch(1, pname, [
            (i, json.dumps(
                {"id": i, "grp": i % args.groups, "v": i % 97}).encode(),
             None)
            for i in range(args.rows)
        ])
        prod.close()
        produce_s = time.time() - t0
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_soakp_"))
        eng.sql("CREATE TABLE skt_warm (id int8 PRIMARY KEY)")
        eng.sql("INSERT INTO skt_warm VALUES (1)")
        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.time()
        eng.sql(
            f"""CREATE TABLE skt (id int8 PRIMARY KEY, grp int8, v int8)
            WITH (connector = 'pulsar', topic = '{topic}',
                  service.url = 'pulsar://{broker.host}:{broker.port}',
                  max.poll.records = '{args.cap}')
            FORMAT PLAIN ENCODE JSON"""
        )
        eng.sql(
            "CREATE MATERIALIZED VIEW soak_mv AS SELECT grp, count(*) AS n, "
            "sum(v) AS sv FROM skt GROUP BY grp"
        )
        eng.sql(
            f"""CREATE SINK soak_sink FROM soak_mv WITH (
                connector = 'pulsar', topic = '{out_topic}',
                service.url = 'pulsar://{broker.host}:{broker.port}'
            ) FORMAT UPSERT ENCODE JSON"""
        )
        ingest_s = time.time() - t0
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        n = eng.sql("SELECT count(*) AS n FROM skt").first().n
        assert n == args.rows, f"ingested {n} != {args.rows}"
        g = eng.sql("SELECT count(*) AS g FROM soak_mv").first().g
        cons = PulsarWireClient(broker.host, broker.port)
        cons.subscribe(out_topic, "soak_verify", consumer_id=1)
        events = 0
        while True:
            batch = cons.fetch(1, 4096)
            if not batch:
                break
            events += len(batch)
            for mid, _p, _k in batch:
                cons.ack(1, mid)
        cons.close()
        out = json.dumps({
            "connector": "pulsar",
            "cap": args.cap, "rows": args.rows, "groups_in_mv": g,
            "ingest_sec": round(ingest_s, 2),
            "rows_per_sec": round(args.rows / ingest_s),
            "produce_sec": round(produce_s, 2),
            "py_rss_before_mb": rss_before // 1024,
            "py_rss_peak_mb": rss_after // 1024,
            "sink_events": events,
        })
        with open(f"/tmp/soak_pulsar_cap{args.cap}.json", "w") as f:
            f.write(out + "\n")
        print(out)
    finally:
        broker.stop()
        spark.stop()


def soak_nats(args) -> None:
    """NATS JetStream pipeline: deep backlog → source → grouped MV +
    a projection MV → append-only sink (nats sinks are append-only by
    the reference's rule, nats.rs:78-111) — sink events verified via a
    durable pull consumer."""
    from risingwave_spark.api import Engine
    from risingwave_spark.session import get_spark
    from risingwave_spark.sources.nats_broker import LoopbackNatsBroker
    from risingwave_spark.sources.nats_wire import NatsClient

    spark = get_spark("rw_connector_soak_nats", cpus="8")
    broker = LoopbackNatsBroker().start()
    try:
        t0 = time.time()
        prod = NatsClient(broker.host, broker.port)
        prod.js_ensure_stream("soaks", ["soak.data"])
        for i in range(args.rows):
            prod.js_publish("soak.data", json.dumps(
                {"id": i, "grp": i % args.groups, "v": i % 97}).encode())
        prod.close()
        produce_s = time.time() - t0
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_soakn_"))
        eng.sql("CREATE TABLE skt_warm (id int8 PRIMARY KEY)")
        eng.sql("INSERT INTO skt_warm VALUES (1)")
        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.time()
        eng.sql(
            f"""CREATE TABLE skt (id int8 PRIMARY KEY, grp int8, v int8)
            WITH (connector = 'nats',
                  server_url = 'nats://{broker.host}:{broker.port}',
                  subject = 'soak.data', stream = 'soaks',
                  consumer.durable_name = 'rw_soak',
                  max.poll.records = '{args.cap}')
            FORMAT PLAIN ENCODE JSON"""
        )
        eng.sql(
            "CREATE MATERIALIZED VIEW soak_mv AS SELECT grp, count(*) AS n, "
            "sum(v) AS sv FROM skt GROUP BY grp"
        )
        eng.sql("CREATE MATERIALIZED VIEW soak_proj AS "
                "SELECT id, v FROM skt")
        eng.sql(
            f"""CREATE SINK soak_sink FROM soak_proj WITH (
                connector = 'nats',
                server_url = 'nats://{broker.host}:{broker.port}',
                subject = 'soak.out', stream = 'soakout',
                force_append_only = 'true'
            ) FORMAT PLAIN ENCODE JSON"""
        )
        ingest_s = time.time() - t0
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        n = eng.sql("SELECT count(*) AS n FROM skt").first().n
        assert n == args.rows, f"ingested {n} != {args.rows}"
        g = eng.sql("SELECT count(*) AS g FROM soak_mv").first().g
        cons = NatsClient(broker.host, broker.port)
        cons.js_ensure_consumer("soakout", "soak_verify")
        events = 0
        while True:
            batch = cons.js_fetch("soakout", "soak_verify", 4096)
            if not batch:
                break
            events += len(batch)
            for tok, _p, _s in batch:
                cons.ack(tok)
        cons.close()
        out = json.dumps({
            "connector": "nats",
            "cap": args.cap, "rows": args.rows, "groups_in_mv": g,
            "ingest_sec": round(ingest_s, 2),
            "rows_per_sec": round(args.rows / ingest_s),
            "produce_sec": round(produce_s, 2),
            "py_rss_before_mb": rss_before // 1024,
            "py_rss_peak_mb": rss_after // 1024,
            "sink_events": events,
        })
        with open(f"/tmp/soak_nats_cap{args.cap}.json", "w") as f:
            f.write(out + "\n")
        print(out)
    finally:
        broker.stop()
        spark.stop()


def soak_pubsub(args) -> None:
    """Google Pub/Sub pipeline: deep backlog → source → grouped MV +
    projection MV → append-only sink, verified via a pull
    subscription."""
    from risingwave_spark.api import Engine
    from risingwave_spark.session import get_spark
    from risingwave_spark.sources.pubsub import (
        LoopbackPubSubEmulator,
        PubSubClient,
    )

    spark = get_spark("rw_connector_soak_ps", cpus="8")
    emu = LoopbackPubSubEmulator().start()
    host = f"{emu.host}:{emu.port}"
    try:
        t0 = time.time()
        c = PubSubClient(host)
        c.create_topic("p1", "soakt")
        c.create_subscription("p1", "rw_soak", "soakt")
        for base in range(0, args.rows, 2000):
            c.publish("p1", "soakt", [
                json.dumps(
                    {"id": i, "grp": i % args.groups, "v": i % 97}).encode()
                for i in range(base, min(base + 2000, args.rows))
            ])
        produce_s = time.time() - t0
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_soakg_"))
        eng.sql("CREATE TABLE skt_warm (id int8 PRIMARY KEY)")
        eng.sql("INSERT INTO skt_warm VALUES (1)")
        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.time()
        eng.sql(
            f"""CREATE TABLE skt (id int8 PRIMARY KEY, grp int8, v int8)
            WITH (connector = 'google_pubsub',
                  pubsub.emulator_host = '{host}',
                  pubsub.project_id = 'p1',
                  pubsub.subscription = 'projects/p1/subscriptions/rw_soak',
                  max.poll.records = '{args.cap}')
            FORMAT PLAIN ENCODE JSON"""
        )
        eng.sql(
            "CREATE MATERIALIZED VIEW soak_mv AS SELECT grp, count(*) AS n, "
            "sum(v) AS sv FROM skt GROUP BY grp"
        )
        eng.sql("CREATE MATERIALIZED VIEW soak_proj AS "
                "SELECT id, v FROM skt")
        # the verify subscription must exist BEFORE the sink drains
        c.create_topic("p1", "soako")
        c.create_subscription("p1", "soak_verify", "soako")
        eng.sql(
            f"""CREATE SINK soak_sink FROM soak_proj WITH (
                connector = 'google_pubsub',
                pubsub.emulator_host = '{host}',
                pubsub.project_id = 'p1', pubsub.topic = 'soako',
                force_append_only = 'true'
            ) FORMAT PLAIN ENCODE JSON"""
        )
        ingest_s = time.time() - t0
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        n = eng.sql("SELECT count(*) AS n FROM skt").first().n
        assert n == args.rows, f"ingested {n} != {args.rows}"
        g = eng.sql("SELECT count(*) AS g FROM soak_mv").first().g
        events = 0
        while True:
            batch = c.pull("p1", "soak_verify", 1000)
            if not batch:
                break
            events += len(batch)
            c.acknowledge("p1", "soak_verify",
                          [a for a, _d, _m in batch])
        out = json.dumps({
            "connector": "pubsub",
            "cap": args.cap, "rows": args.rows, "groups_in_mv": g,
            "ingest_sec": round(ingest_s, 2),
            "rows_per_sec": round(args.rows / ingest_s),
            "produce_sec": round(produce_s, 2),
            "py_rss_before_mb": rss_before // 1024,
            "py_rss_peak_mb": rss_after // 1024,
            "sink_events": events,
        })
        with open(f"/tmp/soak_pubsub_cap{args.cap}.json", "w") as f:
            f.write(out + "\n")
        print(out)
    finally:
        emu.stop()
        spark.stop()


if __name__ == "__main__":
    main()
