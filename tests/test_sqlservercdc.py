"""sqlserver-cdc table connector over the REAL CDC polling contract:
sp_cdc_enable_table, sys.fn_cdc_get_max_lsn,
cdc.fn_cdc_get_all_changes_* windows — reference
`src/connector/src/source/cdc/mod.rs:54` SqlServer +
`source/cdc/external/` (Debezium's SQL Server connector polls the
same statements; here the engine speaks TDS itself,
sources/tdswire.py)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.tdswire import (
    LoopbackSqlServer,
    SqlServerCdcReader,
    TdsClient,
)


@pytest.fixture()
def mssql():
    s = LoopbackSqlServer().start()
    yield s
    s.stop()


def test_cdc_polling_contract(mssql):
    """Enable capture → DML → the change window carries op codes and
    images; consumed LSNs never redeliver; the window is (from, to]."""
    mssql.seed("CREATE TABLE acct (id BIGINT PRIMARY KEY, bal BIGINT)")
    rd = SqlServerCdcReader(
        "127.0.0.1", mssql.port, "sa", "fedpw", "fedb", "dbo", "acct")
    rd.enable()
    assert rd.max_lsn() == 0
    c = TdsClient("127.0.0.1", mssql.port, "sa", "fedpw", "fedb")
    c.query("INSERT INTO acct VALUES (1, 100), (2, 200)")
    c.query("UPDATE acct SET bal = bal + 50 WHERE id = 1")
    c.query("DELETE FROM acct WHERE id = 2")
    hi = rd.max_lsn()
    got = [(op, row) for _l, _s, op, row in rd.changes(0, hi)]
    assert got == [
        (2, {"id": 1, "bal": 100}),
        (2, {"id": 2, "bal": 200}),
        (4, {"id": 1, "bal": 150}),
        (1, {"id": 2, "bal": 200}),
    ]
    # consumed window never redelivers; new changes arrive past it
    assert rd.changes(hi, rd.max_lsn()) == []
    c.query("INSERT INTO acct VALUES (3, 300)")
    inc = [(op, row) for _l, _s, op, row in rd.changes(hi, rd.max_lsn())]
    assert inc == [(2, {"id": 3, "bal": 300})]
    # un-enabled capture instance errors on the wire
    with pytest.raises(OSError, match="not\\s+enabled"):
        c.query("SELECT * FROM cdc.fn_cdc_get_all_changes_dbo_ghost"
                "(1, 9, N'all')")
    rd.close()
    c.close()


def test_sqlservercdc_table_snapshot_and_stream(spark, mssql):
    """CREATE TABLE ... connector='sqlserver-cdc': initial snapshot +
    streamed changes fold through the upsert path; MVs advance; the
    committed LSN survives engine restart (no refold)."""
    mssql.seed("CREATE TABLE up (id BIGINT PRIMARY KEY, v BIGINT)")
    mssql.seed("INSERT INTO up VALUES (1, 10), (2, 20)")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mscdc_"))
    eng.sql(
        f"""CREATE TABLE c (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'sqlserver-cdc', hostname = '127.0.0.1',
            port = '{mssql.port}', username = 'sa', password = 'fedpw',
            database.name = 'fedb', table.name = 'up'
        )"""
    )
    eng.sql("CREATE MATERIALIZED VIEW c_sum AS "
            "SELECT count(*) AS n, sum(v) AS sv FROM c")
    assert tuple(eng.sql("SELECT n, sv FROM c_sum").first()) == (2, 30)
    w = TdsClient("127.0.0.1", mssql.port, "sa", "fedpw", "fedb")
    w.query("INSERT INTO up VALUES (3, 30)")
    w.query("UPDATE up SET v = 15 WHERE id = 1")
    w.query("DELETE FROM up WHERE id = 2")
    w.close()
    eng.poll_sources()
    assert tuple(eng.sql("SELECT n, sv FROM c_sum").first()) == (2, 45)
    assert sorted(
        tuple(r) for r in eng.sql("SELECT id, v FROM c").collect()
    ) == [(1, 15), (3, 30)]
    # restart: the committed LSN is the durable offset
    eng2 = Engine.open(spark, eng.warehouse)
    assert tuple(eng2.sql("SELECT n, sv FROM c_sum").first()) == (2, 45)
    w = TdsClient("127.0.0.1", mssql.port, "sa", "fedpw", "fedb")
    w.query("INSERT INTO up VALUES (4, 40)")
    w.close()
    eng2.poll_sources()
    assert tuple(eng2.sql("SELECT n, sv FROM c_sum").first()) == (3, 85)


def test_sqlservercdc_bounded_segments(spark, mssql, monkeypatch):
    """A deep change backlog folds in ≤ max.poll.records segments —
    LSN sub-window paging, never one unbounded window read — and the
    committed LSN only advances at LSN boundaries."""
    from risingwave_spark import frontend as fe

    mssql.seed("CREATE TABLE up (id BIGINT PRIMARY KEY, v BIGINT)")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_msseg_"))
    eng.sql(
        f"""CREATE TABLE c (id int8 PRIMARY KEY, v int8) WITH (
            connector = 'sqlserver-cdc', hostname = '127.0.0.1',
            port = '{mssql.port}', username = 'sa', password = 'fedpw',
            database.name = 'fedb', table.name = 'up',
            max.poll.records = '50'
        )"""
    )
    w = TdsClient("127.0.0.1", mssql.port, "sa", "fedpw", "fedb")
    # 300 single-row statements = 300 LSNs
    w.query("; ".join(
        f"INSERT INTO up VALUES ({i}, {i % 7})" for i in range(300)))
    w.close()
    folds = []
    real = fe._fold_kafka_records

    def spy(engine, t, schema, recs):
        folds.append(len(recs))
        return real(engine, t, schema, recs)

    monkeypatch.setattr(fe, "_fold_kafka_records", spy)
    eng.poll_sources()
    assert sum(folds) == 300
    assert max(folds) <= 50
    assert len(folds) >= 6
    assert eng.sql("SELECT count(*) AS n FROM c").first().n == 300
