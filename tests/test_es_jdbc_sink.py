"""Elasticsearch and JDBC(postgres-dialect) sinks over real wire
protocols: the ES loopback serves the public _bulk/_search REST
contract with Basic-auth verification (reference
`sink/elasticsearch_opensearch/`); the JDBC sink applies the
changelog as SQL over the genuine Postgres v3 wire against the
DuckDB-backed loopback (reference jdbc sink)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.es_store import EsClient, LoopbackEs
from risingwave_spark.sources.pgwire import LoopbackPostgres, PgWireClient


def test_es_bulk_auth_and_ops():
    es = LoopbackEs(username="elastic", password="pw").start()
    try:
        c = EsClient(f"http://{es.host}:{es.port}", "elastic", "pw")
        c.bulk([
            ("index", "ix", "1", {"a": 1}),
            ("index", "ix", "2", {"a": 2}),
            ("delete", "ix", "1", None),
        ])
        assert c.search("ix") == {"2": {"a": 2}}
        import urllib.error

        bad = EsClient(f"http://{es.host}:{es.port}", "elastic", "wrong")
        with pytest.raises(urllib.error.HTTPError) as e:
            bad.search("ix")
        assert e.value.code == 401
    finally:
        es.stop()


def test_es_sink_upsert_end_to_end(spark):
    """CREATE SINK connector='elasticsearch': inserts index documents,
    updates re-index under the same _id, deletes remove them — the
    index converges to the exact MV state."""
    es = LoopbackEs().start()
    url = f"http://{es.host}:{es.port}"
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_es_"))
        eng.sql("CREATE TABLE t (id int8 PRIMARY KEY, v int8)")
        eng.sql("CREATE MATERIALIZED VIEW emv AS SELECT id, v * 2 AS v2 FROM t")
        with pytest.raises(Exception, match="url and index"):
            eng.sql(
                f"CREATE SINK bad FROM emv WITH (connector='elasticsearch', "
                f"url='{url}') FORMAT UPSERT ENCODE JSON"
            )
        with pytest.raises(Exception, match="UPSERT or PLAIN"):
            eng.sql(
                f"CREATE SINK bad2 FROM emv WITH (connector='elasticsearch', "
                f"url='{url}', index='docs') FORMAT DEBEZIUM ENCODE JSON"
            )
        eng.sql(
            f"CREATE SINK ok FROM emv WITH (connector='elasticsearch', "
            f"url='{url}', index='docs') FORMAT UPSERT ENCODE JSON"
        )
        eng.sql("INSERT INTO t VALUES (1, 5), (2, 7), (3, 9)")
        eng.sql("UPDATE t SET v = 8 WHERE id = 2")
        eng.sql("DELETE FROM t WHERE id = 3")
        c = EsClient(url)
        assert c.search("docs") == {
            "1": {"id": 1, "v2": 10}, "2": {"id": 2, "v2": 16},
        }
    finally:
        es.stop()


def test_jdbc_sink_upsert_over_pg_wire(spark):
    """CREATE SINK connector='jdbc' (jdbc:postgresql://): the changelog
    applies as INSERT..ON CONFLICT / DELETE on the remote database; a
    second wire connection reads back the exact MV state."""
    pg = LoopbackPostgres().start()
    url = f"jdbc:postgresql://{pg.host}:{pg.port}/fedb"
    try:
        pg.seed("CREATE TABLE tgt (id BIGINT PRIMARY KEY, v2 BIGINT)")
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jdbc_"))
        eng.sql("CREATE TABLE t (id int8 PRIMARY KEY, v int8)")
        eng.sql("CREATE MATERIALIZED VIEW jmv AS SELECT id, v * 2 AS v2 FROM t")
        with pytest.raises(NotImplementedError, match="postgresql dialect"):
            eng.sql(
                "CREATE SINK badmy FROM jmv WITH (connector='jdbc', "
                "jdbc.url='jdbc:mysql://h:3306/db', table.name='tgt') "
                "FORMAT UPSERT ENCODE JSON"
            )
        with pytest.raises(ValueError, match="unreachable|rejected"):
            eng.sql(
                "CREATE SINK baddown FROM jmv WITH (connector='jdbc', "
                "jdbc.url='jdbc:postgresql://127.0.0.1:1/db', "
                "table.name='tgt', user='fed', password='fedpw') "
                "FORMAT UPSERT ENCODE JSON"
            )
        eng.sql(
            f"CREATE SINK ok FROM jmv WITH (connector='jdbc', "
            f"jdbc.url='{url}', table.name='tgt', user='fed', "
            "password='fedpw') FORMAT UPSERT ENCODE JSON"
        )
        eng.sql("INSERT INTO t VALUES (1, 5), (2, 7), (3, 9)")
        eng.sql("UPDATE t SET v = 8 WHERE id = 2")
        eng.sql("DELETE FROM t WHERE id = 3")
        c = PgWireClient(pg.host, pg.port, "fed", "fedpw", "fedb")
        _f, rows = c.query("SELECT id, v2 FROM tgt ORDER BY id")
        c.close()
        assert rows == [[1, 10], [2, 16]]
    finally:
        pg.stop()


def test_new_sinks_survive_engine_restart(spark):
    """Engine.open replays CREATE SINK for es/jdbc/iceberg: no double
    bootstrap (durable cursor), probes skipped during replay, and
    post-restart DML keeps flowing to all three targets."""
    import os

    from risingwave_spark.sources.iceberg_scan import IcebergTable

    es = LoopbackEs().start()
    pg = LoopbackPostgres().start()
    wh = os.path.join(tempfile.mkdtemp(prefix="rw_all3_"), "wh")
    try:
        pg.seed("CREATE TABLE tgt (id BIGINT PRIMARY KEY, v BIGINT)")
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_rs_"))
        eng.sql("CREATE TABLE t (id int8 PRIMARY KEY, v int8)")
        eng.sql("CREATE MATERIALIZED VIEW m AS SELECT id, v FROM t")
        eng.sql(
            f"CREATE SINK s_es FROM m WITH (connector='elasticsearch', "
            f"url='http://{es.host}:{es.port}', index='ix') FORMAT UPSERT ENCODE JSON"
        )
        eng.sql(
            f"CREATE SINK s_jd FROM m WITH (connector='jdbc', "
            f"jdbc.url='jdbc:postgresql://{pg.host}:{pg.port}/fedb', "
            "table.name='tgt', user='fed', password='fedpw') "
            "FORMAT UPSERT ENCODE JSON"
        )
        eng.sql(
            f"CREATE SINK s_ic FROM m WITH (connector='iceberg', "
            f"warehouse.path='{wh}', database.name='db', table.name='o', "
            "force_append_only='true') FORMAT PLAIN ENCODE JSON"
        )
        eng.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
        eng2 = Engine.open(spark, eng.warehouse)
        eng2.sql("INSERT INTO t VALUES (3, 30)")
        eng2.sql("DELETE FROM t WHERE id = 1")
        assert EsClient(f"http://{es.host}:{es.port}").search("ix") == {
            "2": {"id": 2, "v": 20}, "3": {"id": 3, "v": 30},
        }
        c = PgWireClient(pg.host, pg.port, "fed", "fedpw", "fedb")
        _f, rows = c.query("SELECT id, v FROM tgt ORDER BY id")
        c.close()
        assert rows == [[2, 20], [3, 30]]
        # iceberg is append-only: all inserts present, no dupes from
        # replay re-bootstrap
        got = sorted(
            tuple(r) for r in IcebergTable(wh, "db", "o").read(spark).collect()
        )
        assert got == [(1, 10), (2, 20), (3, 30)]
    finally:
        es.stop()
        pg.stop()
