"""Session / job administration: KILL, CANCEL JOBS, USE, DISCARD ALL,
live pg_stat_activity (reference ``handler/kill_process.rs``,
``cancel_job.rs``, ``use_db.rs``, ``discard.rs``,
``system_catalog/pg_catalog/pg_stat_activity.rs``)."""

from __future__ import annotations

import tempfile
import time

import pytest

from risingwave_spark.api import Engine


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_sess_"))
    yield e
    e.stop_pg_server()


def test_pg_stat_activity_lists_wire_sessions_and_kill(eng):
    from risingwave_spark.sources.pgwire import PgWireClient

    eng.sql("CREATE USER watcher WITH PASSWORD 'w'")
    host, port = eng.start_pg_server(
        user="root", password="rootpw", auth="md5")
    c1 = PgWireClient(host, port, "root", "rootpw", "dev")
    c2 = PgWireClient(host, port, "watcher", "w", "dev")
    rows = eng.sql(
        "SELECT pid, usename, state FROM pg_stat_activity"
        " ORDER BY pid").collect()
    users = [r.usename for r in rows]
    assert "watcher" in users and users.count("root") >= 2
    wire_pids = [r.pid for r in rows if r.usename == "watcher"]
    assert len(wire_pids) == 1
    # KILL terminates the wire session; its row disappears
    eng.sql(f"KILL {wire_pids[0]}")
    time.sleep(0.2)
    rows = eng.sql("SELECT usename FROM pg_stat_activity").collect()
    assert "watcher" not in [r.usename for r in rows]
    with pytest.raises(Exception):
        c2.query("SELECT 1")  # the socket is dead
    with pytest.raises(ValueError, match="not found"):
        eng.sql("KILL 999999")
    # pg_terminate_backend is the function spelling of the same thing
    c3 = PgWireClient(host, port, "root", "rootpw", "dev")
    pid3 = eng.sql(
        "SELECT max(pid) AS p FROM pg_stat_activity"
        " WHERE application_name = 'pgwire'").collect()[0].p
    assert eng.sql(
        f"SELECT pg_terminate_backend({pid3}) AS t").collect()[0].t is True
    c1.close()


def test_cancel_jobs_aborts_parked_backfill(eng):
    eng.sql("CREATE TABLE cjt (v1 int PRIMARY KEY, v2 int)")
    eng.sql("INSERT INTO cjt SELECT id, id FROM range(1, 31)")
    try:
        eng.sql("SET BACKGROUND_DDL = true")
        eng.sql("CREATE MATERIALIZED VIEW cj0 WITH"
                " (backfill_rate_limit = 0) AS SELECT v1, v2 FROM cjt")
        time.sleep(0.3)
        assert eng._bg_jobs["cj0"]["thread"].is_alive()  # parked
        out = eng.sql("CANCEL JOBS cj0").collect()
        assert [r.id for r in out] == ["cj0"]
        assert "cj0" not in eng._bg_jobs
        assert "cj0" not in eng.mv_handles
        # the half-built state dir is gone — recreating from scratch works
        eng.sql("SET BACKGROUND_DDL = false")
        eng.sql("CREATE MATERIALIZED VIEW cj0 AS SELECT v1, v2 FROM cjt")
        assert eng.sql(
            "SELECT count(*) AS n FROM cj0").collect()[0].n == 30
        # cancelling a finished/unknown job returns no rows
        assert eng.sql("CANCEL JOBS cj0, nosuch").collect() == []
    finally:
        eng.sql("SET BACKGROUND_DDL = false")


def test_use_database_and_discard_all(eng):
    eng.sql("CREATE DATABASE extra")
    eng.sql("USE extra")
    assert eng.sql(
        "SELECT current_database() AS d").collect()[0].d == "extra"
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("USE ghost")
    eng.sql("CREATE SCHEMA dsc")
    eng.sql("SET search_path TO dsc")
    eng.sql("DISCARD ALL")
    assert eng.sql(
        "SELECT current_database() AS d").collect()[0].d == "dev"
    assert eng.sql("SHOW search_path").collect()[0][0] == '"$user", public'
