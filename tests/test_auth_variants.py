"""Auth-variant coverage for the wire clients (VERDICT r8 / COVERAGE
"remaining gates": scram/md5/caching_sha2 auth).

Postgres: md5 (double-md5 per the frontend/backend protocol docs) and
SCRAM-SHA-256 (RFC 5802/7677) — the methods the reference's postgres
driver negotiates for postgres-cdc and the jdbc sink. MySQL:
caching_sha2_password (the 8.0 default plugin the reference's Debezium
path authenticates with). All server-side VERIFIED by the loopback
fixtures — wrong passwords are genuinely rejected."""

import pytest

from risingwave_spark.sources.mysqlwire import (
    LoopbackMysql,
    MySqlWireClient,
    caching_sha2_scramble,
)
from risingwave_spark.sources.pgwire import (
    LoopbackPostgres,
    PgWireClient,
    _md5_auth_response,
    _ScramClient,
)


def test_scram_sha256_rfc7677_vector():
    """The published RFC 7677 §3 example (user/pencil, fixed nonces) —
    pins the whole derivation: PBKDF2, proof, server signature."""
    c = _ScramClient("user", "pencil")
    c.nonce = "rOprNGfwEbeRWgbNEkqO"
    c.client_first_bare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = (
        "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    final = c.final(server_first)
    assert final == (
        "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    # and the server signature the RFC publishes verifies cleanly
    c.verify("v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    with pytest.raises(OSError, match="server signature"):
        c.verify("v=AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=")


def test_md5_response_shape():
    out = _md5_auth_response("fed", "fedpw", b"\x01\x02\x03\x04")
    assert out.startswith(b"md5") and len(out) == 35
    # deterministic given (user, password, salt)
    assert out == _md5_auth_response("fed", "fedpw", b"\x01\x02\x03\x04")
    assert out != _md5_auth_response("fed", "fedpw", b"\x04\x03\x02\x01")


@pytest.mark.parametrize("mode", ["password", "md5", "scram-sha-256"])
def test_pg_auth_roundtrip_and_rejection(mode):
    srv = LoopbackPostgres(auth=mode).start()
    try:
        srv.seed("CREATE TABLE t (a INT); INSERT INTO t VALUES (1), (2)")
        c = PgWireClient("127.0.0.1", srv.port, "fed", "fedpw", "fedb")
        _fields, rows = c.query("SELECT a FROM t ORDER BY a")
        assert rows == [[1], [2]]
        c.close()
        with pytest.raises(OSError, match="authentication failed"):
            PgWireClient("127.0.0.1", srv.port, "fed", "WRONG", "fedb")
    finally:
        srv.stop()


@pytest.mark.parametrize(
    "plugin", ["mysql_native_password", "caching_sha2_password"]
)
def test_mysql_auth_roundtrip_and_rejection(plugin):
    srv = LoopbackMysql(auth_plugin=plugin).start()
    try:
        srv.seed("CREATE TABLE t (a INT); INSERT INTO t VALUES (1), (2)")
        c = MySqlWireClient("127.0.0.1", srv.port, "fed", "fedpw", "fedb")
        _fields, rows = c.query("SELECT a FROM t ORDER BY a")
        assert rows == [[1], [2]]
        c.close()
        with pytest.raises(OSError, match="Access denied"):
            MySqlWireClient("127.0.0.1", srv.port, "fed", "WRONG", "fedb")
    finally:
        srv.stop()


def test_caching_sha2_scramble_properties():
    s = caching_sha2_scramble("fedpw", b"n" * 20)
    assert len(s) == 32  # SHA256-sized
    assert s != caching_sha2_scramble("fedpw", b"m" * 20)  # nonce-bound
    assert caching_sha2_scramble("", b"n" * 20) == b""  # empty password


def test_federated_query_over_scram(spark):
    """postgres_query() TVF (reference batch executor
    postgres_query.rs:31) negotiating SCRAM-SHA-256 end-to-end — the
    full engine path, not just the client class."""
    import tempfile

    from risingwave_spark.api import Engine

    srv = LoopbackPostgres(auth="scram-sha-256").start()
    try:
        srv.seed(
            "CREATE TABLE dim (id INT, name VARCHAR);"
            "INSERT INTO dim VALUES (1, 'a'), (2, 'b')"
        )
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_scramq_"))
        rows = eng.sql(
            f"SELECT * FROM postgres_query('127.0.0.1', '{srv.port}', "
            f"'fed', 'fedpw', 'fedb', 'SELECT id, name FROM dim ORDER BY id')"
        ).collect()
        assert [(r.id, r.name) for r in rows] == [(1, "a"), (2, "b")]
    finally:
        srv.stop()


def test_rsa_oaep_and_pkcs1_pem_roundtrip():
    from risingwave_spark.sources.rsa_jwt import (
        generate_keypair,
        oaep_decrypt,
        oaep_encrypt,
        public_key_from_pem,
        public_key_pem,
    )

    key = generate_keypair()
    pub = public_key_from_pem(public_key_pem(key))
    assert pub["n"] == key["n"] and pub["e"] == key["e"]
    ct = oaep_encrypt(pub, b"secret\x00")
    assert oaep_decrypt(key, ct) == b"secret\x00"
    # OAEP is randomized; tampering breaks the lHash check
    assert ct != oaep_encrypt(pub, b"secret\x00")
    with pytest.raises(ValueError, match="decryption error"):
        oaep_decrypt(key, ct[:-1] + bytes([ct[-1] ^ 1]))


def test_mysql_caching_sha2_full_auth_rsa_exchange():
    """The empty-cache path of caching_sha2_password (MySQL 8.0 full
    authentication): server demands 0x04, client requests the public
    key (0x02), XORs the NUL-terminated password with the nonce and
    sends it RSA-OAEP-encrypted; the loopback decrypts and VERIFIES."""
    srv = LoopbackMysql(
        auth_plugin="caching_sha2_password", force_full_auth=True
    ).start()
    try:
        srv.seed("CREATE TABLE t (a INT); INSERT INTO t VALUES (7)")
        c = MySqlWireClient("127.0.0.1", srv.port, "fed", "fedpw", "fedb")
        assert c.query("SELECT a FROM t")[1] == [[7]]
        c.close()
        with pytest.raises(OSError, match="Access denied"):
            MySqlWireClient("127.0.0.1", srv.port, "fed", "WRONG", "fedb")
    finally:
        srv.stop()


def test_pg_tls_scram_plus_channel_binding():
    """SCRAM-SHA-256-PLUS over GENUINE TLS (RFC 7677 + RFC 5929
    tls-server-end-point): the loopback mints a self-signed cert via
    the openssl CLI, the client hashes the session certificate into
    the signed auth message, and the server VERIFIES both the proof
    and the channel binding. Closes the engine's last auth gate."""
    srv = LoopbackPostgres(auth="scram-sha-256-plus", tls=True).start()
    try:
        srv.seed("CREATE TABLE t (a INT); INSERT INTO t VALUES (5), (9)")
        c = PgWireClient("127.0.0.1", srv.port, "fed", "fedpw", "fedb",
                         sslmode="require")
        _fields, rows = c.query("SELECT a FROM t ORDER BY a")
        assert rows == [[5], [9]]
        c.close()
        # wrong password still fails through the -PLUS exchange
        with pytest.raises(OSError, match="authentication failed"):
            PgWireClient("127.0.0.1", srv.port, "fed", "WRONG", "fedb",
                         sslmode="require")
        # a plaintext client is refused outright (server requires SSL)
        with pytest.raises(OSError):
            PgWireClient("127.0.0.1", srv.port, "fed", "fedpw", "fedb")
    finally:
        srv.stop()


def test_pg_tls_scram_plus_requires_binding_mech():
    """A TLS session whose client picks the NON-PLUS mechanism is
    rejected when the server mandates channel binding — and a
    tampered c= attribute (MITM posture: wrong cert hash) fails even
    with the correct password."""
    from risingwave_spark.sources import pgwire as pw

    srv = LoopbackPostgres(auth="scram-sha-256-plus", tls=True).start()
    try:
        real = pw._ScramClient

        class NoBind(real):
            def __init__(self, user, password, n_user=False, cb_data=None):
                super().__init__(user, password, n_user, None)

        pw._ScramClient = NoBind  # client downgrades to no binding
        try:
            with pytest.raises(OSError,
                               match="channel binding|binding"):
                PgWireClient("127.0.0.1", srv.port, "fed", "fedpw",
                             "fedb", sslmode="require")
        finally:
            pw._ScramClient = real

        class WrongCb(real):
            def __init__(self, user, password, n_user=False, cb_data=None):
                super().__init__(user, password, n_user,
                                 b"\x00" * 32 if cb_data else None)

        pw._ScramClient = WrongCb  # MITM presents a different cert
        try:
            with pytest.raises(OSError, match="binding"):
                PgWireClient("127.0.0.1", srv.port, "fed", "fedpw",
                             "fedb", sslmode="require")
        finally:
            pw._ScramClient = real
    finally:
        srv.stop()


def test_pg_tls_plain_scram_over_tls_ok():
    """TLS with auth=scram-sha-256 (no -PLUS mandate): the client
    prefers -PLUS when offered, and it verifies."""
    srv = LoopbackPostgres(auth="scram-sha-256", tls=True).start()
    try:
        srv.seed("CREATE TABLE t (a INT); INSERT INTO t VALUES (3)")
        c = PgWireClient("127.0.0.1", srv.port, "fed", "fedpw", "fedb",
                         sslmode="require")
        assert c.query("SELECT a FROM t")[1] == [[3]]
        c.close()
    finally:
        srv.stop()
