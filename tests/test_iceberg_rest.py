"""Iceberg REST catalog (reference
`src/connector/src/connector_common/iceberg/mod.rs` catalog.type='rest'
with catalog.uri/credential via iceberg-rust's RestCatalog): client +
loopback service speaking the PUBLIC REST Catalog OpenAPI — config,
OAuth2 client-credential tokens (VERIFIED), loadTable, createTable,
and CommitTableRequest fast-appends with optimistic
assert-ref-snapshot-id concurrency."""

from __future__ import annotations

import os
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.iceberg_rest import (
    IcebergRestCatalog,
    LoopbackIcebergRest,
)
from risingwave_spark.sources.iceberg_scan import (
    IcebergTable,
    write_append_objects,
    write_iceberg_table,
)


def _mk_parquet(spark, path, rows, schema="id bigint, v bigint"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(path)
    part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    return os.path.join(path, part)


@pytest.fixture()
def warehouse(spark):
    base = tempfile.mkdtemp(prefix="rw_icerest_")
    wh = os.path.join(base, "wh")
    f1 = _mk_parquet(spark, os.path.join(base, "d1"),
                     [(i, i * 10) for i in range(5)])
    write_iceberg_table(wh, "db", "t", snapshots=[[(f1, 5)]])
    return wh


def test_oauth_token_verification(warehouse):
    srv = LoopbackIcebergRest(warehouse, credential="cid:sec").start()
    try:
        # wrong secret → 401 at the token endpoint
        with pytest.raises(OSError):
            IcebergRestCatalog(srv.uri, credential="cid:WRONG")
        # no token at all → 401 on /v1/config
        with pytest.raises(OSError, match="401"):
            IcebergRestCatalog(srv.uri)
        cat = IcebergRestCatalog(srv.uri, credential="cid:sec")
        assert "defaults" in cat.config
    finally:
        srv.stop()


def test_load_table_and_scan(spark, warehouse):
    srv = LoopbackIcebergRest(warehouse).start()
    try:
        cat = IcebergRestCatalog(srv.uri)
        loaded = cat.load_table("db", "t")
        assert loaded["metadata-location"].endswith(".metadata.json")
        it = IcebergTable.from_metadata(loaded["metadata"])
        got = sorted(tuple(r) for r in it.read(spark).collect())
        assert got == [(i, i * 10) for i in range(5)]
        with pytest.raises(OSError, match="404"):
            cat.load_table("db", "ghost")
    finally:
        srv.stop()


def test_commit_optimistic_concurrency(spark, warehouse):
    """A stale CommitTableRequest (expected snapshot id no longer
    current) must fail with 409 CommitFailedException — the spec's
    optimistic-concurrency contract."""
    srv = LoopbackIcebergRest(warehouse).start()
    try:
        cat = IcebergRestCatalog(srv.uri)
        meta = cat.load_table("db", "t")["metadata"]
        cur = meta["current-snapshot-id"]
        meta_dir = os.path.join(warehouse, "db", "t", "metadata")
        f2 = _mk_parquet(spark, os.path.join(warehouse, "..", "d2"),
                         [(9, 90)])
        _sid, snap = write_append_objects(meta_dir, meta, [(f2, 1)])
        cat.commit_append("db", "t", cur, snap)  # wins
        # the SAME expected id again is now stale
        meta2 = cat.load_table("db", "t")["metadata"]
        _sid2, snap2 = write_append_objects(meta_dir, meta2, [(f2, 1)])
        with pytest.raises(OSError, match="409"):
            cat.commit_append("db", "t", cur, snap2)
    finally:
        srv.stop()


def test_source_over_rest_catalog(spark, warehouse):
    """CREATE SOURCE catalog.type='rest': the catalog serves the
    metadata; rows match the storage-catalog read of the same table."""
    srv = LoopbackIcebergRest(warehouse, credential="cid:sec").start()
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_icerest_e_"))
        eng.sql(
            f"""CREATE SOURCE rsrc WITH (
                connector = 'iceberg', catalog.type = 'rest',
                catalog.uri = '{srv.uri}',
                catalog.credential = 'cid:sec',
                database.name = 'db', table.name = 't'
            )"""
        )
        got = sorted(
            tuple(r) for r in eng.sql("SELECT * FROM rsrc").collect()
        )
        want = sorted(
            tuple(r)
            for r in IcebergTable(warehouse, "db", "t").read(spark).collect()
        )
        assert got == want
        # bad credential rejects at CREATE
        with pytest.raises(Exception, match="401|credential"):
            eng.sql(
                f"""CREATE SOURCE rbad WITH (
                    connector = 'iceberg', catalog.type = 'rest',
                    catalog.uri = '{srv.uri}',
                    catalog.credential = 'cid:WRONG',
                    database.name = 'db', table.name = 't'
                )"""
            )
    finally:
        srv.stop()


def test_sink_over_rest_catalog(spark):
    """CREATE SINK catalog.type='rest': bootstrap createTable through
    the service, every chunk a CommitTableRequest fast-append; the
    committed table reads back through BOTH catalog views (rest scan
    and storage walk) with identical rows — the loopback persists
    commits as metadata versions."""
    base = tempfile.mkdtemp(prefix="rw_icerests_")
    wh = os.path.join(base, "wh")
    os.makedirs(wh, exist_ok=True)
    srv = LoopbackIcebergRest(wh, credential="cid:sec").start()
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_icerests_e_"))
        eng.sql("CREATE TABLE rit (id int8 PRIMARY KEY, v int8)")
        eng.sql(
            "CREATE MATERIALIZED VIEW rit_mv AS "
            "SELECT id, v * 2 AS v2 FROM rit"
        )
        eng.sql("INSERT INTO rit VALUES (1, 5)")  # bootstrap content
        eng.sql(
            f"CREATE SINK rok FROM rit_mv WITH (connector='iceberg', "
            f"warehouse.path='{wh}', database.name='db', "
            f"table.name='rout', catalog.type='rest', "
            f"catalog.uri='{srv.uri}', catalog.credential='cid:sec', "
            "force_append_only='true') FORMAT PLAIN ENCODE JSON"
        )
        eng.sql("INSERT INTO rit VALUES (2, 7)")
        eng.sql("INSERT INTO rit VALUES (3, 9)")
        # rest view
        cat = IcebergRestCatalog(srv.uri, credential="cid:sec")
        meta = cat.load_table("db", "rout")["metadata"]
        it_rest = IcebergTable.from_metadata(meta)
        got = sorted(tuple(r) for r in it_rest.read(spark).collect())
        assert got == [(1, 10), (2, 14), (3, 18)]
        assert len(meta["snapshots"]) == 3  # bootstrap + 2 chunks
        # storage view of the same table agrees (commits persisted)
        it_store = IcebergTable(wh, "db", "rout")
        assert sorted(
            tuple(r) for r in it_store.read(spark).collect()
        ) == got
    finally:
        srv.stop()
