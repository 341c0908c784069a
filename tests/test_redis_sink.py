"""Redis sink over the real RESP protocol: the loopback server
(sources/redis_store.py) parses genuine array-of-bulk-strings
commands — reference `src/connector/src/sink/redis.rs` (SET/DEL
pipelines, key_format/value_format templates)."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.redis_store import LoopbackRedis, RedisClient


@pytest.fixture()
def redis():
    r = LoopbackRedis().start()
    yield r
    r.stop()


def test_resp_wire_basic(redis):
    c = RedisClient(redis.host, redis.port)
    c.set("a", "1")
    c.set("b:x", "2")
    assert c.get("a") == "1"
    assert c.get("missing") is None
    assert c.keys("b:*") == ["b:x"]
    assert c.delete("a") == 1
    assert c.get("a") is None
    with pytest.raises(OSError, match="unknown command"):
        c.command("FLUSHDB")
    assert c.command("PING") == "PONG"  # connection survives the error
    c.close()


def test_redis_sink_upsert_and_templates(spark, redis):
    """FORMAT UPSERT: inserts/updates SET the key, deletes DEL it; the
    store converges to the exact MV state. key_format templates place
    keys exactly where the reference contract says."""
    url = f"redis://{redis.host}:{redis.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_redis_"))
    eng.sql("CREATE TABLE t (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW rmv AS SELECT id, v * 2 AS v2 FROM t")
    with pytest.raises(Exception, match="redis.url"):
        eng.sql(
            "CREATE SINK bad FROM rmv WITH (connector='redis') "
            "FORMAT UPSERT ENCODE JSON"
        )
    with pytest.raises(Exception, match="UPSERT or PLAIN"):
        eng.sql(
            f"CREATE SINK bad2 FROM rmv WITH (connector='redis', "
            f"redis.url='{url}') FORMAT DEBEZIUM ENCODE JSON"
        )
    eng.sql(
        f"CREATE SINK ok FROM rmv WITH (connector='redis', "
        f"redis.url='{url}', key_format='mv:{{id}}') FORMAT UPSERT ENCODE JSON"
    )
    eng.sql("INSERT INTO t VALUES (1, 5), (2, 7), (3, 9)")
    eng.sql("UPDATE t SET v = 8 WHERE id = 2")
    eng.sql("DELETE FROM t WHERE id = 3")
    c = RedisClient(redis.host, redis.port)
    got = {k: json.loads(v) for k, v in c.dump_all("mv:*").items()}
    c.close()
    assert got == {
        "mv:1": {"id": 1, "v2": 10},
        "mv:2": {"id": 2, "v2": 16},
    }


def test_redis_sink_unreachable(spark):
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_redisd_"))
    eng.sql("CREATE TABLE t (id int8 PRIMARY KEY)")
    eng.sql("CREATE MATERIALIZED VIEW dmv AS SELECT id FROM t")
    with pytest.raises(ValueError, match="unreachable"):
        eng.sql(
            "CREATE SINK bad FROM dmv WITH (connector='redis', "
            "redis.url='redis://127.0.0.1:1') FORMAT UPSERT ENCODE JSON"
        )
