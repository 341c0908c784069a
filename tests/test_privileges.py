"""Users + GRANT/REVOKE privilege system (reference
``handler/create_user.rs:111``, ``handler/alter_user.rs``,
``handler/drop_user.rs``, ``handler/handle_privilege.rs:201`` grant /
``:243`` revoke, bind-time checks ``handler/privilege.rs``;
``e2e_test/ddl/privilege.slt`` shapes these scenarios)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark import users
from risingwave_spark.api import Engine


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_priv_"))
    yield e
    e.stop_pg_server()


def _as(eng, user, stmt):
    """Run one statement with the session user set (what the pgwire
    front door does per connection)."""
    prev = getattr(eng, "session_user", "root")
    eng.session_user = user
    try:
        return eng.sql(stmt)
    finally:
        eng.session_user = prev


# ------------------------------------------------------- user catalog
def test_create_alter_drop_user(eng):
    eng.sql("CREATE USER u1 WITH PASSWORD 'pw1'")
    u = users.get_user(eng, "u1")
    assert u is not None and u["can_login"] and not u["is_super"]
    assert u["auth"]["md5"] != "pw1"  # verifier, not plaintext
    eng.sql("CREATE USER u2 WITH SUPERUSER CREATEDB NOLOGIN")
    u2 = users.get_user(eng, "u2")
    assert u2["is_super"] and u2["can_create_db"] and not u2["can_login"]
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE USER u1")
    eng.sql("ALTER USER u2 WITH NOSUPERUSER LOGIN")
    u2 = users.get_user(eng, "u2")
    assert not u2["is_super"] and u2["can_login"]
    eng.sql("ALTER USER u2 RENAME TO u3")
    assert users.get_user(eng, "u2") is None
    assert users.get_user(eng, "u3") is not None
    eng.sql("DROP USER u1")
    assert users.get_user(eng, "u1") is None
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("DROP USER nosuch")
    eng.sql("DROP USER IF EXISTS nosuch")  # no error


def test_user_catalog_survives_restart(spark):
    wh = tempfile.mkdtemp(prefix="rw_privre_")
    e1 = Engine(spark, wh)
    e1.sql("CREATE USER u1 WITH PASSWORD 'pw'")
    e1.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    e1.sql("GRANT SELECT ON t TO u1")
    e2 = Engine.open(spark, wh)
    assert users.get_user(e2, "u1") is not None
    assert users.has_privilege(e2, "u1", "SELECT", "t")


def test_non_super_cannot_create_users_or_superusers(eng):
    eng.sql("CREATE USER peon WITH PASSWORD 'x'")
    with pytest.raises(PermissionError, match="privilege"):
        _as(eng, "peon", "CREATE USER other")
    eng.sql("ALTER USER peon WITH CREATEUSER")
    _as(eng, "peon", "CREATE USER other")  # now allowed
    with pytest.raises(PermissionError, match="superuser"):
        _as(eng, "peon", "CREATE USER boss WITH SUPERUSER")


# -------------------------------------------------------- grant/revoke
def test_table_select_grant_revoke_cycle(eng):
    """The privilege.slt core loop: denied → GRANT → allowed →
    REVOKE → denied."""
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY, b int8)")
    eng.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
    eng.sql("CREATE USER u1 WITH PASSWORD 'pw'")
    with pytest.raises(PermissionError, match="permission denied"):
        _as(eng, "u1", "SELECT * FROM t")
    eng.sql("GRANT SELECT ON t TO u1")
    assert _as(eng, "u1", "SELECT count(*) AS n FROM t").first()["n"] == 2
    with pytest.raises(PermissionError, match="permission denied"):
        _as(eng, "u1", "INSERT INTO t VALUES (3, 30)")
    eng.sql("GRANT INSERT ON t TO u1")
    _as(eng, "u1", "INSERT INTO t VALUES (3, 30)")
    eng.sql("REVOKE SELECT, INSERT ON t FROM u1")
    with pytest.raises(PermissionError, match="permission denied"):
        _as(eng, "u1", "SELECT * FROM t")


def test_update_delete_privileges(eng):
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY, b int8)")
    eng.sql("INSERT INTO t VALUES (1, 10)")
    eng.sql("CREATE USER u1")
    with pytest.raises(PermissionError):
        _as(eng, "u1", "UPDATE t SET b = 11 WHERE a = 1")
    with pytest.raises(PermissionError):
        _as(eng, "u1", "DELETE FROM t WHERE a = 1")
    eng.sql("GRANT UPDATE, DELETE ON t TO u1")
    _as(eng, "u1", "UPDATE t SET b = 11 WHERE a = 1")
    _as(eng, "u1", "DELETE FROM t WHERE a = 1")


def test_owner_has_implicit_privileges(eng):
    eng.sql("CREATE USER maker")
    eng.sql("GRANT CREATE ON SCHEMA public TO maker")
    _as(eng, "maker", "CREATE TABLE own_t (a int8 PRIMARY KEY)")
    assert users.get_owner(eng, "own_t") == "maker"
    # owner needs no explicit grants on their own table
    _as(eng, "maker", "INSERT INTO own_t VALUES (1)")
    assert _as(eng, "maker", "SELECT count(*) AS n FROM own_t").first()["n"] == 1
    _as(eng, "maker", "DROP TABLE own_t")


def test_mview_and_source_are_select_only(eng):
    """INSERT on a source/mview is an invalid privilege type
    (privilege.slt `statement error` arms; acl ALL_AVAILABLE_*_MODES)."""
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("CREATE MATERIALIZED VIEW m AS SELECT count(*) AS n FROM t")
    eng.sql("CREATE USER u1")
    with pytest.raises(ValueError, match="[Ii]nvalid privilege"):
        eng.sql("GRANT INSERT ON MATERIALIZED VIEW m TO u1")
    eng.sql("GRANT SELECT ON MATERIALIZED VIEW m TO u1")
    assert _as(eng, "u1", "SELECT n FROM m").first()["n"] == 0
    with pytest.raises(ValueError, match="[Ii]nvalid privilege"):
        eng.sql("GRANT INSERT ON ALL SOURCES IN SCHEMA public TO u1")
    with pytest.raises(ValueError, match="[Ii]nvalid privilege"):
        eng.sql("GRANT INSERT ON DATABASE dev TO u1")


def test_grant_on_all_tables_in_schema(eng):
    eng.sql("CREATE SCHEMA s1")
    eng.sql("CREATE TABLE s1.a (k int8 PRIMARY KEY)")
    eng.sql("CREATE TABLE s1.b (k int8 PRIMARY KEY)")
    eng.sql("INSERT INTO s1.a VALUES (1)")
    eng.sql("CREATE USER u1")
    eng.sql("GRANT ALL PRIVILEGES ON ALL TABLES IN SCHEMA s1 TO u1")
    assert _as(eng, "u1", "SELECT count(*) AS n FROM s1.a").first()["n"] == 1
    _as(eng, "u1", "INSERT INTO s1.b VALUES (5)")
    eng.sql("REVOKE ALL PRIVILEGES ON ALL TABLES IN SCHEMA s1 FROM u1")
    with pytest.raises(PermissionError):
        _as(eng, "u1", "SELECT * FROM s1.a")


def test_create_requires_schema_privilege(eng):
    eng.sql("CREATE SCHEMA locked")
    eng.sql("CREATE USER u1")
    with pytest.raises(PermissionError, match="permission denied"):
        _as(eng, "u1", "CREATE TABLE locked.t (a int8 PRIMARY KEY)")
    eng.sql("GRANT CREATE ON SCHEMA locked TO u1")
    _as(eng, "u1", "CREATE TABLE locked.t (a int8 PRIMARY KEY)")


def test_grant_option_chain_and_revoke_grant_option_for(eng):
    """WITH GRANT OPTION lets a non-owner re-grant; REVOKE GRANT OPTION
    FOR removes only the re-grant ability (privilege.slt database arm)."""
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("CREATE USER alice")
    eng.sql("CREATE USER bob")
    eng.sql("GRANT SELECT ON t TO alice")
    # no grant option → alice cannot re-grant
    with pytest.raises(PermissionError):
        _as(eng, "alice", "GRANT SELECT ON t TO bob")
    eng.sql("GRANT SELECT ON t TO alice WITH GRANT OPTION")
    _as(eng, "alice", "GRANT SELECT ON t TO bob")
    assert users.has_privilege(eng, "bob", "SELECT", "t")
    eng.sql("REVOKE GRANT OPTION FOR SELECT ON t FROM alice")
    # privilege stays, re-granting is gone
    assert users.has_privilege(eng, "alice", "SELECT", "t")
    with pytest.raises(PermissionError):
        _as(eng, "alice", "GRANT SELECT ON t TO bob")


def test_grant_to_missing_user_or_object_errors(eng):
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("GRANT SELECT ON t TO ghost")
    eng.sql("CREATE USER u1")
    with pytest.raises(ValueError, match="does not exist|unknown"):
        eng.sql("GRANT SELECT ON nosuch_table TO u1")
    with pytest.raises(ValueError, match="does not exist|unknown"):
        eng.sql("GRANT ALL ON DATABASE db_invalid TO u1")


def test_drop_requires_ownership(eng):
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("CREATE USER u1")
    eng.sql("GRANT SELECT ON t TO u1")
    with pytest.raises(PermissionError, match="owner"):
        _as(eng, "u1", "DROP TABLE t")


def test_drop_object_cascades_its_grants(eng):
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("CREATE USER u1")
    eng.sql("GRANT SELECT ON t TO u1")
    eng.sql("DROP TABLE t")
    st = users.load_state(eng)
    assert not any(p["obj"] == "t" for p in st["privileges"])
    assert "t" not in st["owners"]


def test_drop_user_with_privileges_revokes_them(eng):
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("CREATE USER u1")
    eng.sql("GRANT SELECT ON t TO u1")
    eng.sql("DROP USER u1")
    st = users.load_state(eng)
    assert not any(p["user"] == "u1" for p in st["privileges"])


def test_drop_user_owning_objects_is_refused(eng):
    eng.sql("CREATE USER maker")
    eng.sql("GRANT CREATE ON SCHEMA public TO maker")
    _as(eng, "maker", "CREATE TABLE owned (a int8 PRIMARY KEY)")
    with pytest.raises(ValueError, match="owned|cannot be dropped"):
        eng.sql("DROP USER maker")
    _as(eng, "maker", "DROP TABLE owned")
    eng.sql("DROP USER maker")


# ----------------------------------------------------- pg_catalog truth
def test_pg_user_and_pg_roles_reflect_catalog(eng):
    eng.sql("CREATE USER u1 WITH PASSWORD 'pw' CREATEDB")
    eng.sql("CREATE USER u2 WITH SUPERUSER NOLOGIN")
    rows = {r["usename"]: r for r in
            eng.sql("SELECT usename, usesuper, usecreatedb FROM pg_user"
                    ).collect()}
    assert set(rows) >= {"root", "u1", "u2"}
    assert rows["u1"]["usecreatedb"] and not rows["u1"]["usesuper"]
    assert rows["u2"]["usesuper"]
    roles = {r["rolname"]: r for r in
             eng.sql("SELECT rolname, rolsuper, rolcanlogin FROM pg_roles"
                     ).collect()}
    assert not roles["u2"]["rolcanlogin"] and roles["u1"]["rolcanlogin"]


def test_has_table_privilege_function(eng):
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("CREATE USER u1")
    assert not eng.sql(
        "SELECT has_table_privilege('u1', 't', 'SELECT') AS p"
    ).first()["p"]
    eng.sql("GRANT SELECT ON t TO u1")
    assert eng.sql(
        "SELECT has_table_privilege('u1', 't', 'SELECT') AS p"
    ).first()["p"]
    assert not eng.sql(
        "SELECT has_table_privilege('u1', 't', 'INSERT') AS p"
    ).first()["p"]
    # schema flavor
    eng.sql("CREATE SCHEMA s9")
    assert not eng.sql(
        "SELECT has_schema_privilege('u1', 's9', 'CREATE') AS p"
    ).first()["p"]
    eng.sql("GRANT CREATE ON SCHEMA s9 TO u1")
    assert eng.sql(
        "SELECT has_schema_privilege('u1', 's9', 'CREATE') AS p"
    ).first()["p"]


# -------------------------------------------------- pgwire front door
def test_pgserver_authenticates_catalog_users(spark, eng):
    """A catalog user connects with their own password; wrong password
    and NOLOGIN users are refused (reference user_authentication.rs +
    pg_protocol.rs startup)."""
    from risingwave_spark.sources.pgwire import PgWireClient

    eng.sql("CREATE USER wired WITH PASSWORD 'wpw'")
    eng.sql("CREATE USER nolog WITH PASSWORD 'x' NOLOGIN")
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("INSERT INTO t VALUES (1), (2)")
    eng.sql("GRANT SELECT ON t TO wired")
    host, port = eng.start_pg_server(
        user="root", password="rootpw", auth="scram-sha-256")
    c = PgWireClient(host, port, "wired", "wpw", "dev")
    _f, rows = c.query("SELECT count(*) AS n FROM t")
    assert rows == [[2]]
    c.close()
    with pytest.raises(Exception, match="password|authentication"):
        PgWireClient(host, port, "wired", "WRONG", "dev")
    with pytest.raises(Exception, match="login|not permitted"):
        PgWireClient(host, port, "nolog", "x", "dev")
    with pytest.raises(Exception, match="does not exist"):
        PgWireClient(host, port, "ghost", "x", "dev")


def test_pgserver_enforces_privileges_per_session(spark, eng):
    """Two concurrent wire sessions run as different users: the grantee
    reads, the other is denied — per-connection session identity."""
    from risingwave_spark.sources.pgwire import PgWireClient

    eng.sql("CREATE USER can_read WITH PASSWORD 'a'")
    eng.sql("CREATE USER cannot WITH PASSWORD 'b'")
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("INSERT INTO t VALUES (7)")
    eng.sql("GRANT SELECT ON t TO can_read")
    host, port = eng.start_pg_server(
        user="root", password="rootpw", auth="md5")
    ok = PgWireClient(host, port, "can_read", "a", "dev")
    nope = PgWireClient(host, port, "cannot", "b", "dev")
    assert ok.query("SELECT a FROM t")[1] == [[7]]
    with pytest.raises(Exception, match="permission denied"):
        nope.query("SELECT a FROM t")
    # after the denial the grantee's session still works
    assert ok.query("SELECT a FROM t")[1] == [[7]]
    ok.close()
    nope.close()


def test_pgserver_grant_over_the_wire(spark, eng):
    """GRANT issued BY a wire superuser session takes effect for
    another live session (privilege.slt over the socket)."""
    from risingwave_spark.sources.pgwire import PgWireClient

    eng.sql("CREATE USER boss WITH SUPERUSER PASSWORD 'bosspw'")
    eng.sql("CREATE USER emp WITH PASSWORD 'emppw'")
    eng.sql("CREATE TABLE t (a int8 PRIMARY KEY)")
    eng.sql("INSERT INTO t VALUES (1)")
    host, port = eng.start_pg_server(
        user="root", password="rootpw", auth="md5")
    boss = PgWireClient(host, port, "boss", "bosspw", "dev")
    emp = PgWireClient(host, port, "emp", "emppw", "dev")
    with pytest.raises(Exception, match="permission denied"):
        emp.query("SELECT * FROM t")
    boss.query("GRANT SELECT ON t TO emp")
    assert emp.query("SELECT a FROM t")[1] == [[1]]
    boss.query("REVOKE SELECT ON t FROM emp")
    with pytest.raises(Exception, match="permission denied"):
        emp.query("SELECT * FROM t")
    boss.close()
    emp.close()


def test_execute_privilege_on_functions(eng):
    """EXECUTE on UDFs (reference acl: Function objects take
    AclMode::Execute; privilege.rs checks it per call site)."""
    eng.sql("CREATE USER runner")
    eng.sql("CREATE TABLE ft (a int8 PRIMARY KEY)")
    eng.sql("INSERT INTO ft VALUES (3)")
    eng.sql("GRANT SELECT ON ft TO runner")
    eng.sql("CREATE FUNCTION fx(x int8) RETURNS int8 LANGUAGE sql"
            " AS 'SELECT x * 2'")
    with pytest.raises(PermissionError, match="permission denied"):
        _as(eng, "runner", "SELECT fx(a) FROM ft")
    eng.sql("GRANT EXECUTE ON FUNCTION fx TO runner")
    assert _as(eng, "runner", "SELECT fx(a) AS r FROM ft").collect()[0][0] == 6
    eng.sql("REVOKE EXECUTE ON FUNCTION fx FROM runner")
    with pytest.raises(PermissionError, match="permission denied"):
        _as(eng, "runner", "SELECT fx(a) FROM ft")
    # EXECUTE is also required to CREATE an MV over the function
    eng.sql("GRANT CREATE ON SCHEMA public TO runner")
    with pytest.raises(PermissionError, match="permission denied"):
        _as(eng, "runner",
            "CREATE MATERIALIZED VIEW fmv AS SELECT a, fx(a) AS r FROM ft")
    # invalid mode for the object kind is the reference's error text
    with pytest.raises(ValueError, match="Invalid privilege type"):
        eng.sql("GRANT SELECT ON FUNCTION fx TO runner")
