"""postgres-cdc table connector over REAL logical replication wire:
walsender startup, CREATE_REPLICATION_SLOT, START_REPLICATION into
CopyBoth, pgoutput Relation/Insert/Update/Delete decode, Standby
Status Updates — reference `src/connector/src/source/cdc/` (postgres
via Debezium embedded; this engine speaks the protocol itself,
sources/pgwire.py)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.pgwire import (
    LoopbackPostgres,
    PgReplicationClient,
    PgWireClient,
)


@pytest.fixture()
def pg():
    s = LoopbackPostgres().start()
    yield s
    s.stop()


def test_replication_wire_slot_and_pgoutput(pg):
    """Protocol contract: a slot created before changes replays them
    all as typed pgoutput images; confirming the LSN consumes them;
    new changes arrive incrementally; unknown slots error."""
    pg.seed("CREATE TABLE acct (id BIGINT PRIMARY KEY, bal BIGINT)")
    rc = PgReplicationClient(pg.host, pg.port, "fed", "fedpw", "fedb")
    rc.create_slot("s1")
    rc.create_slot("s1")  # tolerated re-create
    c = PgWireClient(pg.host, pg.port, "fed", "fedpw", "fedb")
    c.query("INSERT INTO acct VALUES (1, 100), (2, 200)")
    c.query("UPDATE acct SET bal = bal + 50 WHERE id = 1")
    c.query("DELETE FROM acct WHERE id = 2")
    got, last = [], 0
    for op, rel, key, new, lsn in rc.drain("s1"):
        got.append((op, key, new))
        last = lsn
    assert got == [
        ("I", {"id": 1}, {"id": 1, "bal": 100}),
        ("I", {"id": 2}, {"id": 2, "bal": 200}),
        ("U", {"id": 1}, {"id": 1, "bal": 150}),
        ("D", {"id": 2}, None),
    ]
    rc.confirm(last)
    rc.finish()
    assert list(rc.drain("s1")) == []
    rc.finish()
    c.query("INSERT INTO acct VALUES (3, 300)")
    inc = [(op, new) for op, _r, _k, new, _l in rc.drain("s1")]
    assert inc == [("I", {"id": 3, "bal": 300})]
    rc.finish()
    with pytest.raises(OSError, match="does not exist"):
        list(rc.drain("ghost"))
    rc.close()
    c.close()


def test_pgcdc_table_snapshot_and_stream(spark, pg):
    """CREATE TABLE ... connector='postgres-cdc': initial snapshot +
    streamed changes fold through the upsert path; MVs advance; the
    slot's confirmed LSN survives engine restart (no refold)."""
    pg.seed("CREATE TABLE up (id BIGINT PRIMARY KEY, v BIGINT)")
    pg.seed("INSERT INTO up VALUES (1, 10), (2, 20)")  # pre-existing rows
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_cdc_"))
    eng.sql(
        f"""CREATE TABLE c (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'postgres-cdc', hostname = '{pg.host}',
            port = '{pg.port}', username = 'fed', password = 'fedpw',
            database.name = 'fedb', table.name = 'up',
            slot.name = 'rw_c_slot'
        )"""
    )
    eng.sql("CREATE MATERIALIZED VIEW c_sum AS SELECT count(*) AS n, sum(v) AS sv FROM c")
    assert tuple(eng.sql("SELECT n, sv FROM c_sum").first()) == (2, 30)
    # upstream writes arrive via poll_sources
    w = PgWireClient(pg.host, pg.port, "fed", "fedpw", "fedb")
    w.query("INSERT INTO up VALUES (3, 30)")
    w.query("UPDATE up SET v = 15 WHERE id = 1")
    w.query("DELETE FROM up WHERE id = 2")
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM c_sum").first()) == (2, 45)
    assert sorted(tuple(r) for r in eng.sql("SELECT id, v FROM c").collect()) == [
        (1, 15), (3, 30),
    ]
    # restart: the slot is the durable offset — replay re-attaches
    # without refolding confirmed changes
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM c_sum").first()) == (2, 45)
    w.query("INSERT INTO up VALUES (4, 40)")
    w.close()
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM c_sum").first()) == (3, 85)


def test_pgcdc_segmented_poll_and_validation(spark, pg):
    pg.seed("CREATE TABLE deep (id BIGINT PRIMARY KEY, v BIGINT)")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_cdcc_"))
    eng.sql(
        f"""CREATE TABLE dc (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'postgres-cdc', hostname = '{pg.host}',
            port = '{pg.port}', username = 'fed', password = 'fedpw',
            database.name = 'fedb', table.name = 'deep',
            max.poll.records = '7'
        )"""
    )
    w = PgWireClient(pg.host, pg.port, "fed", "fedpw", "fedb")
    w.query(
        "INSERT INTO deep VALUES "
        + ", ".join(f"({i}, {i})" for i in range(30))
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
    assert eng.sql("SELECT count(*) AS n FROM dc").first().n == 30
    with pytest.raises(Exception, match="PRIMARY KEY"):
        eng.sql(
            f"CREATE TABLE nk (id int8, v int8) WITH (connector='postgres-cdc', "
            f"hostname='{pg.host}', port='{pg.port}', username='fed', "
            "password='fedpw', database.name='fedb', table.name='deep')"
        )
    with pytest.raises(Exception, match="hostname, username"):
        eng.sql(
            "CREATE TABLE no (id int8 PRIMARY KEY) WITH "
            "(connector='postgres-cdc', table.name='deep')"
        )
    # mysql-cdc is implemented too (tests/test_mysqlcdc.py); its
    # missing-options validation mirrors this one
    with pytest.raises(Exception, match="hostname, username"):
        eng.sql(
            "CREATE TABLE my (id int8 PRIMARY KEY) WITH "
            "(connector='mysql-cdc', table.name='t')"
        )


def test_pgcdc_snapshot_pages_by_keyset(spark, pg, monkeypatch):
    """The initial snapshot reads keyset pages of <= max.poll.records
    rows (Debezium's chunked snapshot) and folds one page per batch —
    never the whole upstream table in one result set."""
    from risingwave_spark import frontend as fe

    pg.seed("CREATE TABLE big (id BIGINT PRIMARY KEY, v BIGINT)")
    pg.seed("INSERT INTO big SELECT range, range % 7 FROM range(300)")
    folds = []
    real = fe._fold_kafka_records

    def spy(engine, t, schema, recs):
        folds.append(len(recs))
        return real(engine, t, schema, recs)

    monkeypatch.setattr(fe, "_fold_kafka_records", spy)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pgpage_"))
    eng.sql(
        f"""CREATE TABLE c (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'postgres-cdc', hostname = '{pg.host}',
            port = '{pg.port}', username = 'fed', password = 'fedpw',
            database.name = 'fedb', table.name = 'big',
            slot.name = 'rw_page_slot', max.poll.records = '50'
        )"""
    )
    assert sum(folds) == 300
    assert max(folds) <= 50
    assert len(folds) == 6
    assert eng.sql("SELECT count(*) AS n FROM c").first().n == 300
