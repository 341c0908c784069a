"""AWS Glue catalog for Iceberg (reference connector_common/iceberg
catalog.type='glue' via iceberg-rust GlueCatalog): JSON-1.1 SigV4 RPC,
metadata_location pointer, optimistic UpdateTable commits
(sources/glue_catalog.py)."""

from __future__ import annotations

import os
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.glue_catalog import GlueClient, LoopbackGlue


def test_sigv4_verification_and_crud():
    glue = LoopbackGlue().start()
    try:
        gc = GlueClient(glue.endpoint)
        gc.create_table("db", "t", "/meta/v1.metadata.json")
        got = gc.get_table("db", "t")
        assert got["Parameters"]["metadata_location"] == (
            "/meta/v1.metadata.json")
        with pytest.raises(OSError, match="AlreadyExists"):
            gc.create_table("db", "t", "/meta/v1.metadata.json")
        with pytest.raises(OSError, match="EntityNotFound"):
            gc.get_table("db", "ghost")
        # wrong secret → signature verification failure on the wire
        with pytest.raises(OSError, match="InvalidSignature"):
            GlueClient(glue.endpoint, secret_key="WRONG").get_table(
                "db", "t")
        # optimistic pointer flip
        gc.update_pointer("db", "t", "/meta/v2.metadata.json",
                          "/meta/v1.metadata.json")
        with pytest.raises(OSError, match="ConcurrentModification"):
            gc.update_pointer("db", "t", "/meta/v3.metadata.json",
                              "/meta/v1.metadata.json")  # stale
    finally:
        glue.stop()


def test_iceberg_glue_sink_and_source_roundtrip(spark):
    base = tempfile.mkdtemp(prefix="rw_glue_t_")
    wh = os.path.join(base, "wh")
    glue = LoopbackGlue().start()
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_glue_te_"))
        eng.sql("CREATE TABLE glt (id int8 PRIMARY KEY, v int8)")
        eng.sql(
            "CREATE MATERIALIZED VIEW gl_mv AS SELECT id, v * 2 AS v2 "
            "FROM glt")
        eng.sql("INSERT INTO glt VALUES (1, 5)")
        eng.sql(
            f"CREATE SINK gls FROM gl_mv WITH (connector='iceberg', "
            f"warehouse.path='{wh}', database.name='db', "
            f"table.name='gout', catalog.type='glue', "
            f"catalog.uri='{glue.endpoint}', force_append_only='true') "
            f"FORMAT PLAIN ENCODE JSON")
        eng.sql("INSERT INTO glt VALUES (2, 7)")
        eng.sql(
            f"CREATE SOURCE glsrc WITH (connector='iceberg', "
            f"catalog.type='glue', catalog.uri='{glue.endpoint}', "
            f"database.name='db', table.name='gout')")
        got = sorted(
            tuple(r) for r in eng.sql("SELECT * FROM glsrc").collect())
        assert got == [(1, 10), (2, 14)]
        # the pointer advanced once per chunk (bootstrap + 1 insert)
        gc = GlueClient(glue.endpoint)
        loc = gc.get_table("db", "gout")["Parameters"]["metadata_location"]
        assert loc.endswith("v3.metadata.json")
    finally:
        glue.stop()
