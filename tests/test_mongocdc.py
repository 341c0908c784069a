"""mongodb-cdc table connector over REAL change streams: aggregate
with a $changeStream stage over OP_MSG/BSON, resume tokens, spec-
shaped change events — reference `src/connector/src/source/cdc/mod.rs`
Mongodb (via Debezium's mongo connector; here the engine speaks the
protocol itself, sources/mongowire.py)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.mongowire import LoopbackMongo, MongoClient


@pytest.fixture()
def mongo():
    s = LoopbackMongo().start()
    yield s
    s.stop()


def test_change_stream_contract(mongo):
    """Events shaped per the public change-events spec; resume tokens
    consume exactly; deletes carry documentKey only."""
    c = MongoClient(mongo.host, mongo.port)
    c.insert("db", "acct", [{"_id": 1, "bal": 100}, {"_id": 2, "bal": 200}])
    c.update("db", "acct", [{"q": {"_id": 1}, "u": {"$set": {"bal": 150}}}])
    c.delete("db", "acct", [{"q": {"_id": 2}, "limit": 1}])
    events, tok = c.change_stream("db", "acct")
    assert [(e["operationType"], e["documentKey"],
             e.get("fullDocument")) for e in events] == [
        ("insert", {"_id": 1}, {"_id": 1, "bal": 100}),
        ("insert", {"_id": 2}, {"_id": 2, "bal": 200}),
        ("update", {"_id": 1}, {"_id": 1, "bal": 150}),
        ("delete", {"_id": 2}, None),
    ]
    assert all(e["ns"] == {"db": "db", "coll": "acct"} for e in events)
    # resume past the token: nothing redelivers; new events arrive
    again, tok2 = c.change_stream("db", "acct", tok)
    assert again == [] and tok2 == tok
    c.insert("db", "acct", [{"_id": 3, "bal": 300}])
    inc, _ = c.change_stream("db", "acct", tok)
    assert [(e["operationType"], e["fullDocument"]) for e in inc] == [
        ("insert", {"_id": 3, "bal": 300})
    ]
    c.close()


def test_mongocdc_table_snapshot_and_stream(spark, mongo):
    """CREATE TABLE ... connector='mongodb-cdc': initial snapshot +
    streamed changes fold through the upsert path; the committed
    resume token survives engine restart (no refold)."""
    c = MongoClient(mongo.host, mongo.port)
    c.insert("db", "up", [{"_id": 1, "v": 10}, {"_id": 2, "v": 20}])
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mgcdc_"))
    eng.sql(
        f"""CREATE TABLE m (_id int8 PRIMARY KEY, v int8) WITH (
            connector = 'mongodb-cdc', hostname = '{mongo.host}',
            port = '{mongo.port}', collection.name = 'db.up'
        )"""
    )
    eng.sql("CREATE MATERIALIZED VIEW m_sum AS "
            "SELECT count(*) AS n, sum(v) AS sv FROM m")
    assert tuple(eng.sql("SELECT n, sv FROM m_sum").first()) == (2, 30)
    c.insert("db", "up", [{"_id": 3, "v": 30}])
    c.update("db", "up", [{"q": {"_id": 1}, "u": {"$set": {"v": 15}}}])
    c.delete("db", "up", [{"q": {"_id": 2}, "limit": 1}])
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM m_sum").first()) == (2, 45)
    assert sorted(
        tuple(r) for r in eng.sql("SELECT _id, v FROM m").collect()
    ) == [(1, 15), (3, 30)]
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM m_sum").first()) == (2, 45)
    c.insert("db", "up", [{"_id": 4, "v": 40}])
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM m_sum").first()) == (3, 85)
    c.close()


def test_mongocdc_requires_id_pk(spark, mongo):
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mgpk_"))
    with pytest.raises(ValueError, match="_id"):
        eng.sql(
            f"""CREATE TABLE bad (k int8 PRIMARY KEY, v int8) WITH (
                connector = 'mongodb-cdc', hostname = '{mongo.host}',
                port = '{mongo.port}', collection.name = 'db.up'
            )"""
        )


def test_mongocdc_bounded_segments(spark, mongo, monkeypatch):
    """A deep change backlog replays in cursor-batched aggregates of
    ≤ max.poll.records events, the token committed per batch."""
    from risingwave_spark import frontend as fe

    c = MongoClient(mongo.host, mongo.port)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mgseg_"))
    eng.sql(
        f"""CREATE TABLE m (_id int8 PRIMARY KEY, v int8) WITH (
            connector = 'mongodb-cdc', hostname = '{mongo.host}',
            port = '{mongo.port}', collection.name = 'db.up',
            max.poll.records = '50'
        )"""
    )
    c.insert("db", "up", [{"_id": i, "v": i % 7} for i in range(300)])
    folds = []
    real = fe._fold_kafka_records

    def spy(engine, t, schema, recs):
        folds.append(len(recs))
        return real(engine, t, schema, recs)

    monkeypatch.setattr(fe, "_fold_kafka_records", spy)
    eng.poll_sources()
    c.close()
    assert sum(folds) == 300
    assert max(folds) <= 50
    assert len(folds) == 6
    assert eng.sql("SELECT count(*) AS n FROM m").first().n == 300
