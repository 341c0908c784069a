"""Federated postgres_query over the real Postgres v3 wire protocol:
the loopback server (sources/pgwire.py LoopbackPostgres) is an
embedded DuckDB answering genuine startup/auth/Query/RowDescription/
DataRow bytes — the reference's PostgresQuery batch executor
(`postgres_query.rs`) speaks the same protocol via tokio-postgres."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.pgwire import LoopbackPostgres, PgWireClient


@pytest.fixture()
def pg():
    s = LoopbackPostgres().start()
    yield s
    s.stop()


def test_pgwire_typed_rows_nulls_and_errors(pg):
    pg.seed("CREATE TABLE ext (id BIGINT, nm VARCHAR, p DOUBLE, ok BOOLEAN, d DATE)")
    pg.seed("INSERT INTO ext VALUES (1,'a',1.5,true,'2024-01-02'),(2,NULL,-0.25,false,NULL)")
    c = PgWireClient(pg.host, pg.port, "fed", "fedpw", "fedb")
    fields, rows = c.query("SELECT * FROM ext ORDER BY id")
    assert [oid for _n, oid in fields] == [20, 1043, 701, 16, 1082]
    assert rows[0][:4] == [1, "a", 1.5, True]
    assert rows[1][1] is None and rows[1][4] is None
    # a server-side SQL error propagates as ErrorResponse, connection
    # stays usable for the next query
    with pytest.raises(OSError, match="missing_tbl"):
        c.query("SELECT * FROM missing_tbl")
    assert c.query("SELECT 41+1 AS x")[1] == [[42]]
    c.close()
    with pytest.raises(OSError, match="password authentication"):
        PgWireClient(pg.host, pg.port, "fed", "wrong", "fedb")
    with pytest.raises(OSError, match="does not exist"):
        PgWireClient(pg.host, pg.port, "ghost", "fedpw", "fedb")


def test_postgres_query_tvf_in_engine_sql(spark, pg):
    """SELECT ... FROM postgres_query('host','port','user','pw','db',
    'query'): the remote rows splice in as a relation — joinable with
    engine tables (the reference's federated lookup shape)."""
    pg.seed("CREATE TABLE dim (k BIGINT, label VARCHAR)")
    pg.seed("INSERT INTO dim VALUES (1,'one'),(2,'two'),(3,'three')")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pgq_"))
    out = eng.sql(
        f"SELECT k, label FROM postgres_query('{pg.host}', '{pg.port}', "
        f"'fed', 'fedpw', 'fedb', 'SELECT k, label FROM dim WHERE k <= 2') "
        "ORDER BY k"
    ).collect()
    assert [tuple(r) for r in out] == [(1, "one"), (2, "two")]
    # joinable with an engine table
    eng.sql("CREATE TABLE fact (k int8 PRIMARY KEY, v int8)")
    eng.sql("INSERT INTO fact VALUES (1, 10), (2, 20), (3, 30)")
    out2 = eng.sql(
        f"SELECT f.k, d.label, f.v FROM fact f JOIN postgres_query("
        f"'{pg.host}', '{pg.port}', 'fed', 'fedpw', 'fedb', "
        f"'SELECT k, label FROM dim') d ON f.k = d.k ORDER BY f.k"
    ).collect()
    assert [tuple(r) for r in out2] == [
        (1, "one", 10), (2, "two", 20), (3, "three", 30),
    ]
    # doubled-quote escaping reaches the remote intact
    out3 = eng.sql(
        f"SELECT * FROM postgres_query('{pg.host}', '{pg.port}', 'fed', "
        f"'fedpw', 'fedb', 'SELECT ''x''''y'' AS s')"
    ).collect()
    assert out3[0].s == "x'y"


def test_mysql_query_tvf_and_wire(spark):
    """mysql_query over the real MySQL client/server protocol
    (reference `mysql_query.rs`): HandshakeV10 + mysql_native_password
    scramble VERIFIED server-side, COM_QUERY text rows."""
    from risingwave_spark.sources.mysqlwire import LoopbackMysql, MySqlWireClient

    my = LoopbackMysql().start()
    try:
        my.seed("CREATE TABLE mdim (k BIGINT, w DOUBLE, ok BOOLEAN)")
        my.seed("INSERT INTO mdim VALUES (1, 0.5, true), (2, NULL, false)")
        c = MySqlWireClient(my.host, my.port, "fed", "fedpw", "fedb")
        fields, rows = c.query("SELECT * FROM mdim ORDER BY k")
        assert [tc for _n, tc in fields] == [8, 5, 1]
        assert rows == [[1, 0.5, True], [2, None, False]]
        with pytest.raises(OSError, match="ghost_tbl"):
            c.query("SELECT * FROM ghost_tbl")
        c.close()
        with pytest.raises(OSError, match="Access denied"):
            MySqlWireClient(my.host, my.port, "fed", "wrong", "fedb")
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_myq_"))
        out = eng.sql(
            f"SELECT k, w FROM mysql_query('{my.host}', '{my.port}', 'fed', "
            f"'fedpw', 'fedb', 'SELECT k, w FROM mdim') ORDER BY k"
        ).collect()
        assert [tuple(r) for r in out] == [(1, 0.5), (2, None)]
    finally:
        my.stop()


def test_postgres_query_tvf_validation(spark, pg):
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pgqv_"))
    with pytest.raises(NotImplementedError, match="6-argument"):
        eng.sql("SELECT * FROM postgres_query('my_cdc_source', 'SELECT 1')")
    with pytest.raises(ValueError, match="cannot reach"):
        eng.sql(
            "SELECT * FROM postgres_query('127.0.0.1', '1', 'u', 'p', 'db', "
            "'SELECT 1')"
        )
    # remote SQL errors surface with the server's message
    with pytest.raises(OSError, match="nope_tbl"):
        eng.sql(
            f"SELECT * FROM postgres_query('{pg.host}', '{pg.port}', 'fed', "
            f"'fedpw', 'fedb', 'SELECT * FROM nope_tbl')"
        )


def test_postgres_query_in_insert_select(spark, pg):
    """INSERT INTO ... SELECT FROM postgres_query(...): the remote
    snapshot lands in an engine table (the reference's
    remote-snapshot-into-table pattern); downstream MVs fold it like
    any DML."""
    pg.seed("CREATE TABLE src (k BIGINT, v BIGINT)")
    pg.seed("INSERT INTO src VALUES (1,10),(2,20),(3,30)")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pgins_"))
    eng.sql("CREATE TABLE tgt (k int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW tgt_sum AS SELECT sum(v) AS sv FROM tgt")
    eng.sql(
        f"INSERT INTO tgt SELECT k, v FROM postgres_query('{pg.host}', "
        f"'{pg.port}', 'fed', 'fedpw', 'fedb', 'SELECT k, v FROM src') "
        "WHERE k <= 2"
    )
    assert eng.sql("SELECT sv FROM tgt_sum").first().sv == 30
