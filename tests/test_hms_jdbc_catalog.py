"""The last two Iceberg catalogs: Hive metastore (real Thrift binary
protocol — sources/hive_metastore.py) and JDBC (the iceberg_tables
pointer table over the Postgres wire — glue_catalog.JdbcIcebergCatalog).
Reference connector_common/iceberg catalog.type='hive'/'jdbc'."""

from __future__ import annotations

import os
import tempfile
import threading
import time

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.glue_catalog import JdbcIcebergCatalog
from risingwave_spark.sources.hive_metastore import HmsClient, LoopbackHms
from risingwave_spark.sources.pgwire import LoopbackPostgres


def test_hms_thrift_crud_and_lock_serialization():
    srv = LoopbackHms().start()
    try:
        c = HmsClient("127.0.0.1", srv.port)
        c.create_table("db", "t", {"metadata_location": "/m/v1.json"})
        assert c.get_table("db", "t")[9]["metadata_location"] == "/m/v1.json"
        with pytest.raises(OSError, match="already exists"):
            c.create_table("db", "t", {})
        with pytest.raises(OSError, match="not found"):
            c.get_table("db", "ghost")
        # EXCLUSIVE lock blocks a second committer until unlock
        lid = c.lock("db", "t")
        acquired = []

        def second():
            c2 = HmsClient("127.0.0.1", srv.port)
            acquired.append(c2.lock("db", "t"))
            c2.unlock(acquired[0])
            c2.close()

        th = threading.Thread(target=second)
        th.start()
        time.sleep(0.3)
        assert th.is_alive() and not acquired  # still waiting
        c.alter_table("db", "t", {"metadata_location": "/m/v2.json"})
        c.unlock(lid)
        th.join(5)
        assert acquired  # serialized through the metastore
        assert c.get_table("db", "t")[9]["metadata_location"] == "/m/v2.json"
        c.close()
    finally:
        srv.stop()


def test_jdbc_catalog_pointer_semantics():
    pg = LoopbackPostgres().start()
    try:
        jc = JdbcIcebergCatalog(pg.host, pg.port, "fed", "fedpw", "fedb")
        jc.create_table_if_missing("db", "t", "/m/v1.json")
        jc.create_table_if_missing("db", "t", "/m/other.json")  # no-op
        assert jc.get_location("db", "t") == "/m/v1.json"
        jc.flip_pointer("db", "t", "/m/v2.json", "/m/v1.json")
        assert jc.get_location("db", "t") == "/m/v2.json"
        # stale expected pointer → guarded UPDATE touches nothing
        with pytest.raises(OSError, match="concurrent"):
            jc.flip_pointer("db", "t", "/m/v3.json", "/m/v1.json")
        with pytest.raises(OSError, match="not found"):
            jc.get_location("db", "ghost")
        jc.close()
    finally:
        pg.stop()


@pytest.mark.parametrize("cat", ["hive", "jdbc"])
def test_iceberg_sink_source_roundtrip(spark, cat):
    base = tempfile.mkdtemp(prefix=f"rw_{cat}cat_")
    wh = os.path.join(base, "wh")
    if cat == "hive":
        srv = LoopbackHms().start()
        uri = f"thrift://{srv.host}:{srv.port}"
        extra = ""
    else:
        srv = LoopbackPostgres().start()
        uri = f"jdbc:postgresql://{srv.host}:{srv.port}/fedb"
        extra = ("catalog.jdbc.user='fed', "
                 "catalog.jdbc.password='fedpw', ")
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix=f"rw_{cat}cat_e_"))
        eng.sql("CREATE TABLE ct (id int8 PRIMARY KEY, v int8)")
        eng.sql(
            "CREATE MATERIALIZED VIEW ct_mv AS SELECT id, v * 2 AS v2 "
            "FROM ct")
        eng.sql("INSERT INTO ct VALUES (1, 5)")
        eng.sql(
            f"CREATE SINK cts FROM ct_mv WITH (connector='iceberg', "
            f"warehouse.path='{wh}', database.name='db', "
            f"table.name='cout', catalog.type='{cat}', "
            f"catalog.uri='{uri}', {extra}force_append_only='true') "
            f"FORMAT PLAIN ENCODE JSON")
        eng.sql("INSERT INTO ct VALUES (2, 7)")
        eng.sql(
            f"CREATE SOURCE ctsrc WITH (connector='iceberg', "
            f"catalog.type='{cat}', catalog.uri='{uri}', {extra}"
            f"database.name='db', table.name='cout')")
        got = sorted(
            tuple(r) for r in eng.sql("SELECT * FROM ctsrc").collect())
        assert got == [(1, 10), (2, 14)]
        if cat == "hive":
            assert srv.locks == {}  # every commit released its lock
    finally:
        srv.stop()
