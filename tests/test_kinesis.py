"""Kinesis connector end-to-end over the REAL AWS HTTP API: a loopback
service (sources/kinesis.py LoopbackKinesis) that VERIFIES genuine
SigV4 signatures, MD5 hash-range shard routing, and per-shard sequence
iterators — the engine's client signs and speaks the same bytes real
Kinesis accepts (reference `src/connector/src/source/kinesis/`,
`sink/kinesis.rs`)."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.kinesis import (
    KinesisClient,
    LoopbackKinesis,
    md5_hash_key,
    sigv4_headers,
)


@pytest.fixture()
def svc():
    s = LoopbackKinesis(shards=2, access_key="AK", secret_key="SK").start()
    yield s
    s.stop()


@pytest.fixture()
def client(svc):
    return KinesisClient(svc.endpoint, access_key="AK", secret_key="SK")


def _opts(svc):
    return (
        f"endpoint = '{svc.endpoint}', aws.region = 'us-east-1', "
        "aws.credentials.access_key_id = 'AK', "
        "aws.credentials.secret_access_key = 'SK'"
    )


def test_sigv4_and_shard_routing(svc, client):
    """Signature is deterministic per (creds, date, payload); bad
    credentials get the real service's 403; partition keys route by
    MD5 hash range and per-key order holds within a shard."""
    import datetime

    t = datetime.datetime(2015, 8, 30, 12, 36, 0, tzinfo=datetime.timezone.utc)
    h1 = sigv4_headers("POST", "h", "/", b"{}", "us-east-1", "kinesis",
                       "AKID", "SECRET", "Kinesis_20131202.X", now=t)
    h2 = sigv4_headers("POST", "h", "/", b"{}", "us-east-1", "kinesis",
                       "AKID", "SECRET", "Kinesis_20131202.X", now=t)
    assert h1["Authorization"] == h2["Authorization"]
    assert md5_hash_key("a") != md5_hash_key("b")

    d = client.describe_stream("s1")
    shards = d["StreamDescription"]["Shards"]
    assert len(shards) == 2 and shards[0]["HashKeyRange"]["StartingHashKey"] == "0"
    client.put_records("s1", [("k1", b"1"), ("k2", b"2"), ("k1", b"3")])
    per_key: dict = {}
    key_shard: dict = {}
    for s in shards:
        it = client.get_shard_iterator("s1", s["ShardId"])
        for r in client.get_records(it)["Records"]:
            per_key.setdefault(r["PartitionKey"], []).append(r["Data"])
            assert key_shard.setdefault(r["PartitionKey"], s["ShardId"]) == s["ShardId"]
    assert per_key["k1"] == [b"1", b"3"]

    bad = KinesisClient(svc.endpoint, access_key="AK", secret_key="WRONG")
    with pytest.raises(Exception, match="403"):
        bad.describe_stream("s1")


def test_kinesis_table_source_and_poll(spark, svc, client):
    """CREATE TABLE ... WITH (connector='kinesis') FORMAT PLAIN: initial
    catch-up, per-shard durable sequence offsets, poll_sources() folds
    only new records, restart resumes without double-counting."""
    client.put_records("ev_s", [
        (str(i), json.dumps({"id": i, "v": i * 10}).encode()) for i in range(1, 6)
    ])
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kin_"))
    eng.sql(
        f"""CREATE TABLE kv (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'kinesis', stream = 'ev_s', {_opts(svc)}
        ) FORMAT PLAIN ENCODE JSON"""
    )
    eng.sql("CREATE MATERIALIZED VIEW kvm AS SELECT count(*) AS n, sum(v) AS sv FROM kv")
    assert tuple(eng.sql("SELECT n, sv FROM kvm").first()) == (5, 150)
    client.put_records("ev_s", [("6", json.dumps({"id": 6, "v": 60}).encode())])
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM kvm").first()) == (6, 210)
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM kvm").first()) == (6, 210)
    client.put_records("ev_s", [("7", json.dumps({"id": 7, "v": 70}).encode())])
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM kvm").first()) == (7, 280)


def test_kinesis_sink_and_upsert_loop(spark, svc, client):
    """CREATE SINK ... connector='kinesis' FORMAT UPSERT: formatter
    events PutRecords'd with the key as partition key; empty Data = the
    tombstone spelling; a second engine consumes the stream back with
    FORMAT UPSERT and mirrors the MV across delete rounds."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kins_"))
    eng.sql("CREATE TABLE st (id int8 PRIMARY KEY, grp varchar, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW smv AS SELECT grp, sum(v) AS total FROM st GROUP BY grp")
    eng.sql(
        f"""CREATE SINK ksnk FROM smv WITH (
            connector = 'kinesis', stream = 'out_s', {_opts(svc)}
        ) FORMAT UPSERT ENCODE JSON"""
    )
    eng.sql("INSERT INTO st VALUES (1,'a',5),(2,'b',7),(3,'a',3)")
    eng2 = Engine(spark, tempfile.mkdtemp(prefix="rw_kinm_"))
    eng2.sql(
        f"""CREATE TABLE mirror (grp varchar PRIMARY KEY, total int8)
        WITH (connector = 'kinesis', stream = 'out_s', {_opts(svc)})
        FORMAT UPSERT ENCODE JSON"""
    )

    def mirror_rows():
        return sorted(tuple(r) for r in eng2.sql("SELECT grp, total FROM mirror").collect())

    assert mirror_rows() == [("a", 8), ("b", 7)]
    eng.sql("DELETE FROM st WHERE grp = 'b'")  # group vanishes → tombstone
    eng.sql("INSERT INTO st VALUES (4,'a',2)")
    eng2.poll_sources()
    assert mirror_rows() == [("a", 10)]
    # sink restart resumes from its durable cursor — no re-emit
    eng3 = Engine.open(spark, eng.warehouse)
    eng3.sql("INSERT INTO st VALUES (5,'c',1)")
    eng2.poll_sources()
    assert mirror_rows() == [("a", 10), ("c", 1)]


def test_kinesis_errors(spark, svc):
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_kine_"))
    eng.sql("CREATE TABLE et (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW emv AS SELECT id, v FROM et WHERE v > 0")
    with pytest.raises(Exception, match="stream"):
        eng.sql(
            f"CREATE SINK bad FROM emv WITH (connector='kinesis', {_opts(svc)})"
        )
    with pytest.raises(Exception, match="endpoint"):
        eng.sql(
            "CREATE TABLE kt (id int8 PRIMARY KEY) WITH "
            "(connector='kinesis', stream='x') FORMAT PLAIN ENCODE JSON"
        )
    # unreachable endpoint → loud failure at CREATE (not replay)
    with pytest.raises(Exception, match="unreachable"):
        eng.sql(
            "CREATE SINK bad2 FROM emv WITH (connector='kinesis', stream='x', "
            "endpoint='http://127.0.0.1:1')"
        )
