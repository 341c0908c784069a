"""citus-cdc table connector: one postgres-cdc split per WORKER node
from `database.servers`, shard tables matched by the {table}_[0-9]+
pattern — reference `source/cdc/mod.rs:52` Citus,
`enumerator/mod.rs` DATABASE_SERVERS_KEY, `source/reader.rs:80-97`
(the table.name shard-regex rewrite)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.pgwire import LoopbackPostgres, PgWireClient


@pytest.fixture()
def workers():
    ws = [LoopbackPostgres().start() for _ in range(2)]
    yield ws
    for w in ws:
        w.stop()


def test_cituscdc_shards_across_workers(spark, workers):
    """Initial snapshot unions every shard on every worker; streamed
    changes from any shard fold by pk; non-shard tables on the same
    slot are ignored; per-worker slots survive engine restart."""
    w0, w1 = workers
    # two shards on worker 0, one on worker 1 + a decoy table
    w0.seed("CREATE TABLE dist_102008 (id BIGINT PRIMARY KEY, v BIGINT)")
    w0.seed("CREATE TABLE dist_102009 (id BIGINT PRIMARY KEY, v BIGINT)")
    w1.seed("CREATE TABLE dist_102010 (id BIGINT PRIMARY KEY, v BIGINT)")
    w1.seed("CREATE TABLE unrelated (id BIGINT PRIMARY KEY, v BIGINT)")
    w0.seed("INSERT INTO dist_102008 VALUES (1, 10)")
    w0.seed("INSERT INTO dist_102009 VALUES (2, 20)")
    w1.seed("INSERT INTO dist_102010 VALUES (3, 30)")
    servers = f"127.0.0.1:{w0.port},127.0.0.1:{w1.port}"
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_citus_"))
    eng.sql(
        f"""CREATE TABLE c (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'citus-cdc', hostname = '127.0.0.1',
            port = '{w0.port}', username = 'fed', password = 'fedpw',
            database.name = 'fedb', table.name = 'dist',
            database.servers = '{servers}'
        )"""
    )
    eng.sql("CREATE MATERIALIZED VIEW c_sum AS "
            "SELECT count(*) AS n, sum(v) AS sv FROM c")
    assert tuple(eng.sql("SELECT n, sv FROM c_sum").first()) == (3, 60)
    # streamed changes: insert on w1's shard, update on w0's, delete
    # on w0's other shard; writes to the decoy table must NOT fold
    a = PgWireClient("127.0.0.1", w0.port, "fed", "fedpw", "fedb")
    b = PgWireClient("127.0.0.1", w1.port, "fed", "fedpw", "fedb")
    b.query("INSERT INTO dist_102010 VALUES (4, 40)")
    a.query("UPDATE dist_102008 SET v = 15 WHERE id = 1")
    a.query("DELETE FROM dist_102009 WHERE id = 2")
    b.query("INSERT INTO unrelated VALUES (99, 990)")
    a.close()
    b.close()
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM c_sum").first()) == (3, 85)
    assert sorted(
        tuple(r) for r in eng.sql("SELECT id, v FROM c").collect()
    ) == [(1, 15), (3, 30), (4, 40)]
    # restart: per-worker slots are the durable offsets — no refold
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM c_sum").first()) == (3, 85)
    b2 = PgWireClient("127.0.0.1", w1.port, "fed", "fedpw", "fedb")
    b2.query("INSERT INTO dist_102010 VALUES (5, 50)")
    b2.close()
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM c_sum").first()) == (4, 135)


def test_cituscdc_requires_servers(spark):
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_citusx_"))
    with pytest.raises(ValueError, match="database.servers"):
        eng.sql(
            """CREATE TABLE bad (id int8 PRIMARY KEY) WITH (
                connector = 'citus-cdc', hostname = 'h', port = '5432',
                username = 'u', database.name = 'd', table.name = 't'
            )"""
        )
