"""mysql-cdc table connector over the REAL binlog replication
protocol: COM_BINLOG_DUMP(NON_BLOCK), FORMAT_DESCRIPTION/TABLE_MAP/
WRITE+UPDATE+DELETE_ROWS v2 events with typed binary row images —
reference `src/connector/src/source/cdc/` mysql (Debezium's binlog
reader; this engine speaks the protocol itself,
sources/mysqlwire.py MySqlBinlogClient)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.mysqlwire import (
    LoopbackMysql,
    MySqlBinlogClient,
    MySqlWireClient,
)


@pytest.fixture()
def my():
    s = LoopbackMysql().start()
    yield s
    s.stop()


def test_binlog_wire_row_events(my):
    """Protocol contract: events from a captured position replay all
    changes with typed row images (NULLs via the null bitmap); a
    position resume skips consumed events; NON_BLOCK EOFs when
    caught up."""
    my.seed("CREATE TABLE acct (id BIGINT PRIMARY KEY, bal BIGINT, nm VARCHAR)")
    c = MySqlWireClient(my.host, my.port, "fed", "fedpw", "fedb")
    pos0 = int(c.query("SHOW MASTER STATUS")[1][0][1])
    c.query("SET @master_binlog_checksum = 'NONE'")
    c.query("INSERT INTO acct VALUES (1, 100, 'a'), (2, 200, NULL)")
    c.query("UPDATE acct SET bal = bal + 50, nm = 'z' WHERE id = 1")
    c.query("DELETE FROM acct WHERE id = 2")
    b = MySqlBinlogClient(my.host, my.port, "fed", "fedpw", "fedb")
    got, last = [], pos0
    for op, tbl, before, after, pos in b.binlog_dump("binlog.000001", pos0):
        got.append((op, after))
        last = pos
    assert got == [
        ("I", {"id": 1, "bal": 100, "nm": "a"}),
        ("I", {"id": 2, "bal": 200, "nm": None}),
        ("U", {"id": 1, "bal": 150, "nm": "z"}),
        ("D", None),
    ]
    assert list(b.binlog_dump("binlog.000001", last)) == []
    c.query("INSERT INTO acct VALUES (3, 300, 'c')")
    inc = [(op, after) for op, _t, _b, after, _p in b.binlog_dump("binlog.000001", last)]
    assert inc == [("I", {"id": 3, "bal": 300, "nm": "c"})]
    b.close()
    c.close()


def test_mysqlcdc_table_snapshot_stream_restart(spark, my):
    """CREATE TABLE ... connector='mysql-cdc': position-before-snapshot
    ordering, streamed row images fold through the upsert path, and
    the committed (file, pos) survives engine restart — Debezium's
    client-side-offset posture."""
    my.seed("CREATE TABLE up (id BIGINT PRIMARY KEY, v BIGINT)")
    my.seed("INSERT INTO up VALUES (1, 10), (2, 20)")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mycdc_"))
    eng.sql(
        f"""CREATE TABLE mc (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'mysql-cdc', hostname = '{my.host}',
            port = '{my.port}', username = 'fed', password = 'fedpw',
            database.name = 'fedb', table.name = 'up'
        )"""
    )
    eng.sql("CREATE MATERIALIZED VIEW mc_sum AS SELECT count(*) AS n, sum(v) AS sv FROM mc")
    assert tuple(eng.sql("SELECT n, sv FROM mc_sum").first()) == (2, 30)
    w = MySqlWireClient(my.host, my.port, "fed", "fedpw", "fedb")
    w.query("INSERT INTO up VALUES (3, 30)")
    w.query("UPDATE up SET v = 15 WHERE id = 1")
    w.query("DELETE FROM up WHERE id = 2")
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM mc_sum").first()) == (2, 45)
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM mc_sum").first()) == (2, 45)
    w.query("INSERT INTO up VALUES (4, 40)")
    w.close()
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM mc_sum").first()) == (3, 85)
    assert sorted(tuple(r) for r in eng2.sql("SELECT id, v FROM mc").collect()) == [
        (1, 15), (3, 30), (4, 40),
    ]


def test_mysqlcdc_segmented_poll_and_validation(spark, my):
    my.seed("CREATE TABLE deep (id BIGINT PRIMARY KEY, v BIGINT)")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mycdcc_"))
    eng.sql(
        f"""CREATE TABLE dmc (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'mysql-cdc', hostname = '{my.host}',
            port = '{my.port}', username = 'fed', password = 'fedpw',
            database.name = 'fedb', table.name = 'deep',
            max.poll.records = '7'
        )"""
    )
    w = MySqlWireClient(my.host, my.port, "fed", "fedpw", "fedb")
    w.query(
        "INSERT INTO deep VALUES " + ", ".join(f"({i}, {i})" for i in range(30))
    )
    w.close()
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
    assert eng.sql("SELECT count(*) AS n FROM dmc").first().n == 30
    with pytest.raises(Exception, match="PRIMARY KEY"):
        eng.sql(
            f"CREATE TABLE nk (id int8, v int8) WITH (connector='mysql-cdc', "
            f"hostname='{my.host}', port='{my.port}', username='fed', "
            "password='fedpw', database.name='fedb', table.name='deep')"
        )
    with pytest.raises(Exception, match="hostname, username"):
        eng.sql(
            "CREATE TABLE no (id int8 PRIMARY KEY) WITH "
            "(connector='mysql-cdc', table.name='deep')"
        )
