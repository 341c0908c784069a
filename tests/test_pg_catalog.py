"""pg_catalog compatibility layer (reference
src/frontend/src/catalog/system_catalog/pg_catalog/ — all 42 relations —
and the compat functions of binder builtin_scalar.rs:442-694 /
expr format_type.rs / function_impl pg_get_viewdef.rs, cast_regclass.rs)."""

import re
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.functions.pg_catalog import _EMPTY_VIEWS


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_pgcat_"))
    e.sql(
        """
        CREATE TABLE pgc_t (
            id int8 PRIMARY KEY, name text, price float8,
            tags text[], ts timestamptz
        );
        CREATE MATERIALIZED VIEW pgc_mv AS
        SELECT name, count(*) AS n FROM pgc_t GROUP BY name;
        CREATE VIEW pgc_v AS SELECT id, name FROM pgc_t;
        """
    )
    e.sql(
        "INSERT INTO pgc_t VALUES "
        "(1, 'a', 2.5, ARRAY['x'], '2024-01-01 00:00:00'), "
        "(2, 'b', 3.5, ARRAY['y'], '2024-01-02 00:00:00')"
    )
    return e


def test_pg_class_relkinds(eng):
    rows = eng.sql(
        "SELECT c.relname, c.relkind FROM pg_catalog.pg_class c "
        "JOIN pg_catalog.pg_namespace n ON c.relnamespace = n.oid "
        "WHERE n.nspname = 'public' ORDER BY c.relname"
    ).collect()
    kinds = {r.relname: r.relkind for r in rows}
    assert kinds["pgc_t"] == "r"
    assert kinds["pgc_mv"] == "m"
    assert kinds["pgc_v"] == "v"


def test_pg_class_lists_system_tables(eng):
    # pg_class.rs UNIONs rw_system_tables in — the catalog relations
    # themselves are visible with relkind 'r' under nspname pg_catalog
    rows = eng.sql(
        "SELECT c.relname FROM pg_class c "
        "JOIN pg_namespace n ON c.relnamespace = n.oid "
        "WHERE n.nspname = 'pg_catalog' AND c.relname IN "
        "('pg_class', 'pg_type', 'pg_namespace')"
    ).collect()
    assert len(rows) == 3


def test_pg_attribute_format_type(eng):
    rows = eng.sql(
        "SELECT a.attname, a.attnum, "
        "format_type(a.atttypid, a.atttypmod) AS typ, a.attnotnull "
        "FROM pg_attribute a JOIN pg_class c ON a.attrelid = c.oid "
        "WHERE c.relname = 'pgc_t' ORDER BY a.attnum"
    ).collect()
    got = [(r.attname, r.attnum, r.typ, r.attnotnull) for r in rows]
    assert got == [
        ("id", 1, "bigint", True),  # PK column is NOT NULL
        ("name", 2, "character varying", False),
        ("price", 3, "double precision", False),
        ("tags", 4, "character varying[]", False),
        ("ts", 5, "timestamp with time zone", False),
    ]


def test_format_type_edge_cases(eng):
    row = eng.sql(
        "SELECT format_type(16, 0) AS a, format_type(9527, 0) AS b, "
        "format_type(NULL, 0) AS c"
    ).collect()[0]
    # exact contract of format_type.rs:21 test vectors
    assert (row.a, row.b, row.c) == ("boolean", "???", None)


def test_pg_type_typarray_links(eng):
    rows = eng.sql(
        "SELECT t.typname, a.typname AS arr FROM pg_type t "
        "JOIN pg_type a ON t.typarray = a.oid "
        "WHERE t.typname IN ('int8', 'varchar', 'numeric') ORDER BY t.typname"
    ).collect()
    assert [(r.typname, r.arr) for r in rows] == [
        ("int8", "_int8"), ("numeric", "_numeric"), ("varchar", "_varchar"),
    ]


def test_regclass_and_relation_size(eng):
    row = eng.sql(
        "SELECT 'pgc_t'::regclass AS oid, "
        "pg_relation_size('pgc_t'::regclass) AS sz, "
        "pg_relation_size('pgc_v'::regclass) AS vsz"
    ).collect()[0]
    assert row.oid >= 16384
    assert row.sz > 0  # table has durable state parquet
    assert row.vsz == 0  # plain view has no storage


def test_regclass_unknown_relation_raises(eng):
    with pytest.raises(Exception, match="does not exist"):
        eng.sql("SELECT 'no_such_rel'::regclass")


def test_pg_get_viewdef(eng):
    row = eng.sql(
        "SELECT pg_get_viewdef('pgc_v'::regclass) AS d1, "
        "pg_get_viewdef('pgc_mv'::regclass) AS d2"
    ).collect()[0]
    assert row.d1 == "SELECT id, name FROM pgc_t"
    assert row.d2.startswith("SELECT name, count(*) AS n")


def test_session_functions(eng):
    row = eng.sql(
        "SELECT current_database() AS db, current_schema AS sch, "
        "current_user AS usr, session_user AS susr, version() AS v, "
        "pg_backend_pid() AS pid"
    ).collect()[0]
    assert row.db == "dev"
    assert row.sch == "public"
    assert row.usr == "root" and row.susr == "root"
    assert re.match(r"PostgreSQL 13\.14\.0-RisingWave-", row.v)
    assert row.pid > 0


def test_privilege_and_misc_functions(eng):
    row = eng.sql(
        "SELECT has_table_privilege('root', 'pgc_t', 'SELECT') AS p1, "
        "has_schema_privilege('public', 'USAGE') AS p2, "
        "pg_encoding_to_char(6) AS enc, obj_description(16384) AS od, "
        "col_description(16384, 1) AS cd, pg_is_in_recovery() AS rec, "
        "pg_stat_get_numscans(16384) AS ns"
    ).collect()[0]
    assert row.p1 is True and row.p2 is True
    assert row.enc == "UTF8"
    assert row.od == "" and row.cd is None
    assert row.rec is False and row.ns == 0


def test_pg_tables_views_matviews(eng):
    tabs = [
        r.tablename
        for r in eng.sql(
            "SELECT tablename FROM pg_tables WHERE schemaname = 'public'"
        ).collect()
    ]
    assert "pgc_t" in tabs
    views = eng.sql(
        "SELECT viewname, definition FROM pg_views "
        "WHERE viewname = 'pgc_v'"
    ).collect()
    assert views[0].definition == "SELECT id, name FROM pgc_t"
    mv = eng.sql(
        "SELECT matviewname, ispopulated, definition FROM pg_matviews"
    ).collect()[0]
    assert mv.matviewname == "pgc_mv" and mv.ispopulated is True


def test_pg_constraint_pk(eng):
    row = eng.sql(
        "SELECT con.conname, con.contype, con.conkey FROM pg_constraint con "
        "JOIN pg_class c ON con.conrelid = c.oid WHERE c.relname = 'pgc_t'"
    ).collect()[0]
    assert row.conname == "pgc_t_pkey"
    assert row.contype == "p"
    assert list(row.conkey) == [1]  # id is attnum 1


def test_pg_user_roles_database_settings(eng):
    u = eng.sql("SELECT usename, usesuper FROM pg_user").collect()[0]
    assert u.usename == "root" and u.usesuper is True
    r = eng.sql("SELECT rolname, rolcanlogin FROM pg_roles").collect()[0]
    assert r.rolname == "root" and r.rolcanlogin is True
    d = eng.sql("SELECT datname FROM pg_database ORDER BY oid").collect()
    assert d[0].datname == "dev"
    s = {
        row.name: row.setting
        for row in eng.sql("SELECT name, setting FROM pg_settings").collect()
    }
    assert s["server_encoding"] == "UTF8"
    assert "timezone" in s


def test_every_pg_relation_is_selectable(eng):
    names = sorted(_EMPTY_VIEWS) + [
        "pg_attribute", "pg_class", "pg_constraint", "pg_database",
        "pg_matviews", "pg_namespace", "pg_proc", "pg_roles", "pg_settings",
        "pg_shadow", "pg_stat_activity", "pg_tables", "pg_type", "pg_user",
        "pg_views",
    ]
    assert len(names) == 41  # the reference's full pg_catalog file list
    for n in names:
        eng.sql(f"SELECT * FROM pg_catalog.{n} LIMIT 3").collect()


def test_psql_d_pattern(eng):
    """The introspection join psql's \\d issues (pg_class ⋈ pg_namespace
    with pg_table_is_visible) — the canonical client pattern."""
    rows = eng.sql(
        "SELECT n.nspname AS schema, c.relname AS name, "
        "CASE c.relkind WHEN 'r' THEN 'table' WHEN 'v' THEN 'view' "
        "WHEN 'm' THEN 'materialized view' END AS type, "
        "pg_get_userbyid(c.relowner) AS owner "
        "FROM pg_class c LEFT JOIN pg_namespace n ON n.oid = c.relnamespace "
        "WHERE c.relkind IN ('r','v','m') AND n.nspname = 'public' "
        "AND pg_table_is_visible(c.oid) ORDER BY 1, 2"
    ).collect()
    by_name = {r.name: (r.type, r.owner) for r in rows}
    assert by_name["pgc_t"] == ("table", "root")
    assert by_name["pgc_mv"] == ("materialized view", "root")
    assert by_name["pgc_v"] == ("view", "root")


def test_pg_proc_lists_udfs(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_pgproc_"))
    e.sql(
        "CREATE FUNCTION pgc_double(x int8) RETURNS int8 "
        "LANGUAGE sql AS 'SELECT x * 2'"
    )
    rows = e.sql(
        "SELECT proname, prokind, prorettype FROM pg_proc "
        "WHERE proname = 'pgc_double'"
    ).collect()
    assert rows[0].prokind == "f"
    assert rows[0].prorettype == 20  # int8


def test_pg_typeof(eng):
    row = eng.sql(
        "SELECT pg_typeof(1::int8) AS a, pg_typeof('x'::text) AS b, "
        "pg_typeof(1.5::float8) AS c, pg_typeof(CAST(1 AS decimal(10,2))) AS d"
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (
        "bigint", "character varying", "double precision", "numeric"
    )


def test_string_literal_with_pg_catalog_prefix_untouched(eng):
    # the qualifier strip must not reach into string literals
    row = eng.sql(
        "SELECT 'pg_catalog.pg_class' AS s, length('pg_catalog.') AS n"
    ).collect()[0]
    assert row.s == "pg_catalog.pg_class" and row.n == 11


def test_information_schema_views(eng):
    """information_schema (reference system_catalog/information_schema/
    — tables, columns, views, schemata, table_constraints,
    key_column_usage): the ANSI introspection spellings BI tools use."""
    rows = eng.sql(
        "SELECT table_name, table_type FROM information_schema.tables "
        "WHERE table_schema = 'public' ORDER BY table_name"
    ).collect()
    kinds = {r.table_name: r.table_type for r in rows}
    assert kinds["pgc_t"] == "BASE TABLE"
    assert kinds["pgc_mv"] == "MATERIALIZED VIEW"
    assert kinds["pgc_v"] == "VIEW"
    cols = eng.sql(
        "SELECT column_name, ordinal_position, data_type, is_nullable "
        "FROM information_schema.columns WHERE table_name = 'pgc_t' "
        "ORDER BY ordinal_position"
    ).collect()
    assert [(c.column_name, c.data_type) for c in cols][:2] == [
        ("id", "bigint"), ("name", "character varying")]
    sch = [r.schema_name for r in eng.sql(
        "SELECT schema_name FROM information_schema.schemata").collect()]
    assert {"public", "pg_catalog", "information_schema"} <= set(sch)
    tc = eng.sql(
        "SELECT constraint_name, constraint_type FROM "
        "information_schema.table_constraints "
        "WHERE table_name = 'pgc_t'").collect()
    assert (tc[0].constraint_name, tc[0].constraint_type) == (
        "pgc_t_pkey", "PRIMARY KEY")
    kcu = eng.sql(
        "SELECT column_name, ordinal_position FROM "
        "information_schema.key_column_usage "
        "WHERE table_name = 'pgc_t'").collect()
    assert [(k.column_name, k.ordinal_position) for k in kcu] == [("id", 1)]
    vd = eng.sql(
        "SELECT view_definition FROM information_schema.views "
        "WHERE table_name = 'pgc_v'").collect()
    assert vd[0].view_definition == "SELECT id, name FROM pgc_t"
