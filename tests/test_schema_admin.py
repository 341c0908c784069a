"""Catalog administration: ALTER ... OWNER TO / SET SCHEMA / SWAP WITH
and search_path resolution (reference ``handler/alter_owner.rs:54``,
``alter_set_schema.rs:30``, ``alter_swap_rename.rs:49``,
``binder/mod.rs:116,341`` SearchPath; scenarios shaped on
``e2e_test/ddl/{alter_owner,alter_set_schema,alter_swap_rename,
search_path}.slt``)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark import users
from risingwave_spark.api import Engine


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_admin_"))
    yield e
    e.stop_pg_server()


# ------------------------------------------------------------ OWNER TO
def test_alter_owner_all_kinds(eng):
    """alter_owner.slt: every kind takes OWNER TO; pg_class.relowner
    joins against pg_roles.oid."""
    eng.sql("CREATE USER user1")
    eng.sql("CREATE TABLE t (v1 INT PRIMARY KEY, v2 INT)")
    eng.sql("ALTER TABLE t OWNER TO user1")
    rows = eng.sql(
        "SELECT pg_class.relname AS rel_name, pg_roles.rolname AS owner"
        " FROM pg_class"
        " JOIN pg_namespace ON pg_namespace.oid = pg_class.relnamespace"
        " JOIN pg_roles ON pg_roles.oid = pg_class.relowner"
        " WHERE pg_namespace.nspname NOT LIKE 'pg_%'"
        " AND pg_namespace.nspname != 'information_schema'"
        " AND pg_class.relname = 't'"
    ).collect()
    assert [(r.rel_name, r.owner) for r in rows] == [("t", "user1")]
    eng.sql("CREATE VIEW v AS (SELECT * FROM t WHERE v1 = 1)")
    eng.sql("ALTER VIEW v OWNER TO user1")
    eng.sql("CREATE MATERIALIZED VIEW mv AS SELECT v1 FROM t")
    eng.sql("ALTER MATERIALIZED VIEW mv OWNER TO user1")
    eng.sql("CREATE SCHEMA sown")
    eng.sql("ALTER SCHEMA sown OWNER TO user1")
    eng.sql("ALTER DATABASE dev OWNER TO user1")
    assert users.get_owner(eng, "v") == "user1"
    assert users.get_owner(eng, "mv") == "user1"
    assert users.get_owner(eng, "__schema_sown") == "user1"
    assert users.get_owner(eng, "__database_dev") == "user1"
    # pg_get_userbyid resolves the real catalog
    got = eng.sql(
        "SELECT pg_get_userbyid(relowner) AS u FROM pg_class"
        " WHERE relname = 'mv'"
    ).collect()
    assert got[0].u == "user1"
    # owner views: pg_views / pg_tables name the owner
    assert eng.sql(
        "SELECT viewowner FROM pg_views WHERE viewname = 'v'"
    ).collect()[0][0] == "user1"


def test_alter_owner_errors(eng):
    eng.sql("CREATE TABLE t (a INT PRIMARY KEY)")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("ALTER TABLE t OWNER TO ghost")
    with pytest.raises(ValueError, match="not found"):
        eng.sql("ALTER TABLE missing OWNER TO root")
    # a non-owner non-super session user is refused
    eng.sql("CREATE USER pleb")
    eng.session_user = "pleb"
    try:
        with pytest.raises(PermissionError):
            eng.sql("ALTER TABLE t OWNER TO pleb")
    finally:
        eng.session_user = "root"


# ---------------------------------------------------------- SET SCHEMA
def test_alter_set_schema_table_and_mv(eng):
    """alter_set_schema.slt: the move reflects in pg_tables.schemaname
    and the object answers under its qualified name; dependents keep
    tracking (the engine's schema move IS a dependent-rewriting
    rename)."""
    eng.sql("CREATE SCHEMA test_schema")
    eng.sql("CREATE TABLE test_table (u INT PRIMARY KEY, v INT)")
    eng.sql("INSERT INTO test_table VALUES (1, 2)")
    eng.sql("CREATE MATERIALIZED VIEW test_mv AS SELECT u FROM test_table")
    eng.sql("ALTER TABLE test_table SET SCHEMA public")  # no-op move
    eng.sql("ALTER TABLE test_table SET SCHEMA test_schema")
    rows = eng.sql(
        "SELECT tablename, schemaname FROM pg_tables"
        " WHERE schemaname = 'test_schema'"
    ).collect()
    assert [(r.tablename, r.schemaname) for r in rows] == [
        ("test_table", "test_schema")]
    assert eng.sql(
        "SELECT u, v FROM test_schema.test_table").collect()[0][:] == (1, 2)
    # the MV keeps updating across the move
    eng.sql("INSERT INTO test_schema.test_table VALUES (3, 4)")
    got = sorted(r.u for r in eng.sql("SELECT * FROM test_mv").collect())
    assert got == [1, 3]
    # and the MV itself moves
    eng.sql("ALTER MATERIALIZED VIEW test_mv SET SCHEMA test_schema")
    got = sorted(
        r.u for r in eng.sql(
            "SELECT * FROM test_schema.test_mv").collect())
    assert got == [1, 3]
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("ALTER TABLE test_schema.test_table SET SCHEMA ghost")


def test_alter_set_schema_source(eng):
    eng.sql("CREATE SCHEMA sq")
    eng.sql(
        "CREATE TABLE src_t (a INT PRIMARY KEY) ")
    eng.sql("ALTER TABLE src_t SET SCHEMA sq")
    assert "sq__src_t" in eng.tables and "src_t" not in eng.tables
    # back to public restores the bare name
    eng.sql("ALTER TABLE sq.src_t SET SCHEMA public")
    assert "src_t" in eng.tables


# ------------------------------------------------------------ SWAP WITH
def test_alter_swap_tables_mvs_views(eng):
    """alter_swap_rename.slt: swapped names, dependents rewritten, kind
    mismatches reproduce the reference errors."""
    eng.sql("CREATE TABLE t1 (v1 INT PRIMARY KEY, v2 INT)")
    eng.sql("CREATE TABLE t2 (v1 INT PRIMARY KEY, v2 INT)")
    eng.sql("INSERT INTO t1 VALUES (1, 10)")
    eng.sql("INSERT INTO t2 VALUES (2, 20)")
    eng.sql("CREATE MATERIALIZED VIEW mv1 AS SELECT v1 FROM t1")
    eng.sql("CREATE MATERIALIZED VIEW mv2 AS SELECT v1 FROM t2")
    eng.sql("CREATE VIEW v1 AS SELECT t1.v1 FROM t1")
    eng.sql("CREATE VIEW v2 AS SELECT t2.v2 FROM t2")
    eng.sql("ALTER TABLE t1 SWAP WITH t2")
    with pytest.raises(PermissionError, match="Permission denied"):
        eng.sql("ALTER TABLE t1 SWAP WITH mv1")
    with pytest.raises(ValueError, match="not found"):
        eng.sql("ALTER TABLE mv1 SWAP WITH mv2")
    assert eng.sql("SELECT v1, v2 FROM t1").collect()[0][:] == (2, 20)
    assert eng.sql("SELECT v1, v2 FROM t2").collect()[0][:] == (1, 10)
    # mv1 still reads the ORIGINAL t1 data (now named t2)
    assert eng.sql("SELECT * FROM mv1").collect()[0][0] == 1
    eng.sql("ALTER MATERIALIZED VIEW mv1 SWAP WITH mv2")
    assert eng.sql("SELECT * FROM mv1").collect()[0][0] == 2
    assert eng.sql("SELECT * FROM mv2").collect()[0][0] == 1
    eng.sql("ALTER VIEW v1 SWAP WITH v2")
    assert eng.sql("SELECT * FROM v1").collect()[0][0] == 20
    # the swapped MV keeps consuming its (renamed) upstream
    eng.sql("INSERT INTO t2 VALUES (3, 30)")
    got = sorted(r.v1 for r in eng.sql("SELECT * FROM mv2").collect())
    assert got == [1, 3]


def test_alter_swap_missing_sink(eng):
    with pytest.raises(ValueError, match="not found"):
        eng.sql("ALTER SINK s1 SWAP WITH s2")


# -------------------------------------------------- sink/sub rename
def test_alter_sink_rename_keeps_cursor(eng):
    """ALTER SINK ... RENAME moves the durable delivery cursor with the
    name: rows emitted before the rename are NOT re-emitted after it
    (exactly-once across the rename)."""
    import json

    from risingwave_spark.sources.kafka_broker import LoopbackKafkaBroker
    from risingwave_spark.sources.kafka_wire import KafkaWireClient

    br = LoopbackKafkaBroker().start()
    try:
        eng.sql("CREATE TABLE skr (a INT PRIMARY KEY)")
        eng.sql("CREATE MATERIALIZED VIEW skr_mv AS SELECT a FROM skr")
        eng.sql("INSERT INTO skr VALUES (1), (2)")
        eng.sql(
            "CREATE SINK skr_snk FROM skr_mv WITH (connector = 'kafka',"
            f" properties.bootstrap.server = '{br.host}:{br.port}',"
            " topic = 'skr_out', force_append_only = 'true')"
            " FORMAT PLAIN ENCODE JSON")
        eng.sql("FLUSH")
        eng.sql("ALTER SINK skr_snk RENAME TO skr_snk2")
        assert "skr_snk2" in eng.sinks and "skr_snk" not in eng.sinks
        eng.sql("INSERT INTO skr VALUES (3)")
        eng.sql("FLUSH")
        c = KafkaWireClient(br.host, br.port)
        try:
            recs, _ = c.fetch("skr_out", 0, 0)
        finally:
            c.close()
        vals = sorted(json.loads(v.decode())["a"]
                      for _o, _t, _k, v in recs)
        assert vals == [1, 2, 3]  # no duplicates across the rename
    finally:
        br.stop()


def test_alter_subscription_rename_keeps_cursor(eng):
    eng.sql("CREATE TABLE sbr (a INT PRIMARY KEY)")
    eng.sql("CREATE MATERIALIZED VIEW sbr_mv AS SELECT a FROM sbr")
    eng.sql("CREATE SUBSCRIPTION sbr_sub FROM sbr_mv"
            " WITH (retention = '1D')")
    eng.sql("INSERT INTO sbr VALUES (1)")
    # consume + commit the first chunk under the OLD name
    rows = eng.sql("DECLARE c1 SUBSCRIPTION CURSOR FOR sbr_sub").collect()
    eng.sql("ALTER SUBSCRIPTION sbr_sub RENAME TO sbr_sub2")
    subs = getattr(eng, "subscriptions", {})
    assert "sbr_sub2" in subs and "sbr_sub" not in subs
    eng.sql("INSERT INTO sbr VALUES (2)")
    got = subs["sbr_sub2"].fetch()
    assert got is not None
    frame, _token = got
    vals = sorted(r.a for r in frame.collect())
    assert 2 in vals  # the new chunk arrives under the new name


# ----------------------------------------------------------- search_path
def test_search_path_slt(eng):
    """search_path.slt end-to-end."""
    eng.sql("create schema search_path_test1")
    eng.sql("create schema search_path_test2")
    eng.sql("create table search_path_test2.test(a int primary key)")
    eng.sql("insert into search_path_test2.test values (2)")
    with pytest.raises(Exception):
        eng.sql("select * from test").collect()
    eng.sql("set search_path to search_path_test2")
    assert eng.sql("select a from test").collect()[0][0] == 2
    eng.sql(
        "set search_path to search_path_test1, no_valid_schema,"
        " search_path_test2")
    assert eng.sql("show search_path").collect()[0][0] == (
        "search_path_test1, no_valid_schema, search_path_test2")
    assert eng.sql("select a from test").collect()[0][0] == 2
    # created in the FIRST valid schema of the path
    eng.sql("create table test(a int primary key)")
    eng.sql("insert into test values (1)")
    assert eng.sql("select a from test").collect()[0][0] == 1
    assert "search_path_test1__test" in eng.tables
    eng.sql("insert into search_path_test2.test values (1)")
    eng.sql("drop table test")
    got = sorted(r.a for r in eng.sql("select a from test").collect())
    assert got == [1, 2]
    eng.sql("drop table test")
    with pytest.raises(Exception):
        eng.sql("select * from test").collect()
    # current_schema/current_schemas reflect the path
    row = eng.sql(
        "select current_schemas(true) as cs, current_schema as c"
    ).collect()[0]
    assert row.c == "search_path_test1"
    assert row.cs == ["pg_catalog", "search_path_test1",
                      "search_path_test2"]
    # reset to the default
    eng.sql('set search_path to "$user", public')
    assert eng.sql("show search_path").collect()[0][0] == '"$user", public'
    assert eng.sql(
        "select setting from pg_settings where name = 'search_path'"
    ).collect()[0][0] == '"$user", public'


def test_search_path_public_position_honored(eng):
    """public's position in the path decides which `x` wins."""
    eng.sql("create schema alt")
    eng.sql("create table x (a INT PRIMARY KEY)")
    eng.sql("insert into x values (100)")
    eng.sql("create table alt.x (a INT PRIMARY KEY)")
    eng.sql("insert into alt.x values (200)")
    eng.sql("set search_path to alt, public")
    assert eng.sql("select a from x").collect()[0][0] == 200
    eng.sql("set search_path to public, alt")
    assert eng.sql("select a from x").collect()[0][0] == 100


def test_alter_source_add_column(eng):
    """add_column.slt: the source's declared column list extends and the
    source rebuilds from the rewritten DDL; ALTER SOURCE on a connector
    TABLE redirects to ALTER TABLE (verbatim reference error)."""
    eng.sql("CREATE SOURCE s1 (v1 int) WITH (connector = 'datagen',"
            " fields.v1.kind = 'sequence', fields.v1.start = '1',"
            " fields.v1.end = '3', datagen.split.num = '1')")
    assert sorted(r.v1 for r in
                  eng.sql("SELECT v1 FROM s1").collect()) == [1, 2, 3]
    eng.sql("ALTER SOURCE s1 ADD COLUMN v2 varchar")
    rows = eng.sql("SELECT v1, v2 FROM s1").collect()
    assert sorted(r.v1 for r in rows) == [1, 2, 3]
    assert all(r.v2 is not None for r in rows)  # generated column
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER SOURCE s1 ADD COLUMN v2 int")
    # the rewritten DDL is durable: a reopened engine serves v2
    ddl = [e for e in eng._read_catalog() if e["name"] == "s1"][0]["stmt"]
    assert "v2 varchar" in ddl
    eng.sql("CREATE TABLE kt (v1 int PRIMARY KEY)")
    with pytest.raises(ValueError, match="does not exist|ALTER TABLE"):
        eng.sql("ALTER SOURCE kt ADD COLUMN v9 int")


def test_alter_mv_parallelism(spark):
    """ALTER MATERIALIZED VIEW ... SET PARALLELISM binds to the MV's
    maintenance-fold shuffle partitioning, persists across reopen, and
    DEFAULT clears it (reference handler/alter_parallelism.rs)."""
    import tempfile

    wh = tempfile.mkdtemp(prefix="rw_par_")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE pt (k int PRIMARY KEY, v int)")
    eng.sql("CREATE MATERIALIZED VIEW pmv AS"
            " SELECT v, count(*) AS n FROM pt GROUP BY v")
    eng.sql("ALTER MATERIALIZED VIEW pmv SET PARALLELISM = 3")
    assert eng.mv_handles["pmv"].view.parallelism == 3
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    eng.sql("INSERT INTO pt VALUES (1, 10), (2, 10), (3, 20)")
    # the scoped swap restored the session conf
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    got = sorted(tuple(r) for r in
                 eng.sql("SELECT v, n FROM pmv").collect())
    assert got == [(10, 2), (20, 1)]
    # persists across reopen via the #alter# DDL record
    eng2 = Engine.open(spark, wh)
    assert eng2.mv_handles["pmv"].view.parallelism == 3
    eng2.sql("ALTER MATERIALIZED VIEW pmv SET PARALLELISM = DEFAULT")
    assert eng2.mv_handles["pmv"].view.parallelism is None
    with pytest.raises(ValueError, match="positive"):
        eng2.sql("ALTER MATERIALIZED VIEW pmv SET PARALLELISM = 0")
