"""Pure-stdlib PostgreSQL v3 wire-protocol client + loopback server
(reference `src/batch/executors/src/executor/postgres_query.rs`: the
`postgres_query(hostname, port, username, password, database, query)`
table function runs a query on an external Postgres via
tokio-postgres; this module speaks the same PUBLIC protocol —
postgresql.org/docs "Frontend/Backend Protocol" — with stdlib
sockets).

Client flow: StartupMessage (protocol 3.0, user/database params) →
AuthenticationCleartextPassword → PasswordMessage → AuthenticationOk
→ ReadyForQuery; then simple Query ('Q') → RowDescription ('T') with
type OIDs → DataRow ('D') text-format values → CommandComplete ('C')
→ ReadyForQuery ('Z'); ErrorResponse ('E') raises with the server's
message. The same bytes work against a real Postgres with
password/trust, md5 OR scram-sha-256 auth: the client negotiates all
three (md5 per the protocol's double-md5 contract; SCRAM-SHA-256 per
RFC 5802/7677 with full server-signature verification — stdlib
pbkdf2_hmac/hmac only). Channel-binding -PLUS variants need TLS and
stay gated loud.

`LoopbackPostgres` is the in-sandbox stand-in for the external
database: it serves the genuine v3 protocol (auth=password|md5|
scram-sha-256, each VERIFIED server-side — the scram path recomputes
StoredKey from the client proof exactly as a real server does) and
executes each query on an embedded DuckDB
connection — a REAL SQL engine answering over real Postgres wire
bytes, so the federated path is exercised end-to-end: wire handshake,
auth, type-OID mapping, NULL handling, error propagation.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading


def _nodelay_connect(addr, timeout=None):
    """connect + TCP_NODELAY: every protocol here is request-
    reply; Nagle's algorithm turns small write-write-read
    exchanges into ~40 ms delayed-ACK stalls per round trip."""
    s = socket.create_connection(addr, timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s


# type OIDs (pg_type.dat — public catalog numbers)
OID_BOOL = 16
OID_INT8 = 20
OID_INT2 = 21
OID_INT4 = 23
OID_TEXT = 25
OID_FLOAT4 = 700
OID_FLOAT8 = 701
OID_VARCHAR = 1043
OID_DATE = 1082
OID_TIMESTAMP = 1114
OID_NUMERIC = 1700

OID_TO_SPARK = {
    OID_BOOL: "boolean",
    OID_INT2: "int",
    OID_INT4: "int",
    OID_INT8: "bigint",
    OID_FLOAT4: "float",
    OID_FLOAT8: "double",
    OID_NUMERIC: "double",
    OID_TEXT: "string",
    OID_VARCHAR: "string",
    OID_DATE: "date",
    OID_TIMESTAMP: "timestamp",
}


def _msg(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack(">I", len(body) + 4) + body


# ------------------------------------------------------------- auth variants
# md5 and SCRAM-SHA-256 per the PUBLIC specs (PostgreSQL frontend/backend
# protocol §SASL authentication; RFC 5802/7677) — the two auth methods the
# reference's connector stack negotiates through its postgres driver for
# postgres-cdc and the jdbc sink (the engine previously gated both loud).
# Everything is stdlib: hashlib.pbkdf2_hmac + hmac.


def _md5_auth_response(user: str, password: str, salt: bytes) -> bytes:
    """PG md5 auth: 'md5' || md5hex(md5hex(password||user) || salt)."""
    import hashlib

    inner = hashlib.md5((password + user).encode()).hexdigest()
    return b"md5" + hashlib.md5(inner.encode() + salt).hexdigest().encode()


# ------------------------------------------------------------ TLS material
# Real TLS for the loopback fixtures and the pgserver front door: a
# self-signed cert minted once per process via the openssl CLI (the
# container ships OpenSSL 3.x; no python `cryptography` needed), and the
# RFC 5929 tls-server-end-point channel-binding data SCRAM-SHA-256-PLUS
# (RFC 7677 §1, PG protocol §SASL) hashes into the proof.

_TLS_DIR: str | None = None


def self_signed_material() -> tuple[str, str]:
    """→ (cert_pem_path, key_pem_path), minted once per process."""
    global _TLS_DIR
    import os as _os
    import subprocess
    import tempfile

    if _TLS_DIR is not None:
        return (_os.path.join(_TLS_DIR, "cert.pem"),
                _os.path.join(_TLS_DIR, "key.pem"))
    d = tempfile.mkdtemp(prefix="rw_tls_")
    cert, key = _os.path.join(d, "cert.pem"), _os.path.join(d, "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-sha256",
         "-keyout", key, "-out", cert, "-days", "30", "-nodes",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    _TLS_DIR = d
    return cert, key


def make_server_ssl_context(cert: str, key: str):
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    return ctx


def cb_tls_server_end_point(cert_der: bytes) -> bytes:
    """RFC 5929 tls-server-end-point: hash of the server certificate.
    The signature hash decides the digest; MD5/SHA-1 upgrade to
    SHA-256 — this fixture's certs are SHA-256-signed, so SHA-256
    unconditionally."""
    import hashlib

    return hashlib.sha256(cert_der).digest()


def _scram_keys(password: str, salt: bytes, iters: int):
    """RFC 5802 key derivation → (salted, client_key, stored_key,
    server_key)."""
    import hashlib
    import hmac as _hmac

    salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)
    ckey = _hmac.new(salted, b"Client Key", hashlib.sha256).digest()
    stored = hashlib.sha256(ckey).digest()
    skey = _hmac.new(salted, b"Server Key", hashlib.sha256).digest()
    return salted, ckey, stored, skey


def _scram_hmac(key: bytes, msg: bytes) -> bytes:
    import hashlib
    import hmac as _hmac

    return _hmac.new(key, msg, hashlib.sha256).digest()


class _ScramClient:
    """Client side of SCRAM-SHA-256 (gs2 'n,,' on plaintext) and
    SCRAM-SHA-256-PLUS (RFC 5802 §6 channel binding: gs2
    'p=tls-server-end-point,,' and c= carrying base64(gs2-header ||
    cb-data), cb-data the RFC 5929 hash of the server cert)."""

    def __init__(self, user: str, password: str, n_user: bool = False,
                 cb_data: bytes | None = None):
        import base64
        import os as _os

        self.password = password
        self.nonce = base64.b64encode(_os.urandom(18)).decode()
        # PG sends the username through the startup packet; SCRAM n= is
        # conventionally empty in libpq. MongoDB (sources/mongowire.py)
        # carries the username in n= — n_user=True.
        self.client_first_bare = (
            f"n={user if n_user else ''},r={self.nonce}"
        )
        self.gs2 = ("p=tls-server-end-point,," if cb_data is not None
                    else "n,,")
        self.cb_data = cb_data or b""
        self.client_first = self.gs2 + self.client_first_bare

    def final(self, server_first: str) -> str:
        import base64

        attrs = dict(kv.split("=", 1) for kv in server_first.split(","))
        if not attrs["r"].startswith(self.nonce):
            raise OSError("scram: server nonce does not extend client nonce")
        salt = base64.b64decode(attrs["s"])
        iters = int(attrs["i"])
        salted, ckey, stored, skey = _scram_keys(self.password, salt, iters)
        c = base64.b64encode(self.gs2.encode() + self.cb_data).decode()
        without_proof = f"c={c},r={attrs['r']}"
        auth_msg = ",".join(
            [self.client_first_bare, server_first, without_proof]
        ).encode()
        sig = _scram_hmac(stored, auth_msg)
        proof = bytes(a ^ b for a, b in zip(ckey, sig))
        self._server_sig = _scram_hmac(skey, auth_msg)
        return without_proof + ",p=" + base64.b64encode(proof).decode()

    def verify(self, server_final: str) -> None:
        import base64

        attrs = dict(kv.split("=", 1) for kv in server_final.split(","))
        if base64.b64decode(attrs["v"]) != self._server_sig:
            raise OSError("scram: server signature verification failed")


class PgWireClient:
    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, timeout: float = 10.0,
                 replication: bool = False, sslmode: str = "disable"):
        self.sock = _nodelay_connect((host, port), timeout=timeout)
        self._buf = b""
        self._cb_data: bytes | None = None
        if sslmode not in ("disable", "require"):
            raise ValueError(f"unsupported sslmode {sslmode!r}")
        if sslmode == "require":
            # SSLRequest → 'S' → genuine TLS handshake; the session
            # cert's DER feeds SCRAM-PLUS channel binding. The fixture
            # certs are self-signed, so verification is disabled here
            # (libpq's sslmode=require posture: encrypt, don't verify).
            import ssl as _ssl

            self.sock.sendall(struct.pack(">II", 8, 80877103))
            r = self.sock.recv(1)
            if r != b"S":
                raise OSError("server refused SSL (sslmode=require)")
            ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False
            ctx.verify_mode = _ssl.CERT_NONE
            self.sock = ctx.wrap_socket(self.sock, server_hostname=host)
            self._cb_data = cb_tls_server_end_point(
                self.sock.getpeercert(binary_form=True))
        pairs = [("user", user), ("database", database)]
        if replication:
            # walsender mode (postgres protocol: replication=database
            # enables CREATE_REPLICATION_SLOT / START_REPLICATION)
            pairs.append(("replication", "database"))
        params = b""
        for k, v in pairs:
            params += k.encode() + b"\x00" + v.encode() + b"\x00"
        body = struct.pack(">I", 196608) + params + b"\x00"  # protocol 3.0
        self.sock.sendall(struct.pack(">I", len(body) + 4) + body)
        while True:
            tag, payload = self._read_msg()
            if tag == b"R":
                (code,) = struct.unpack(">I", payload[:4])
                if code == 0:
                    continue  # AuthenticationOk
                if code == 3:  # CleartextPassword
                    self.sock.sendall(_msg(b"p", password.encode() + b"\x00"))
                    continue
                if code == 5:  # MD5Password (salt in payload[4:8])
                    self.sock.sendall(_msg(
                        b"p",
                        _md5_auth_response(user, password, payload[4:8])
                        + b"\x00",
                    ))
                    continue
                if code == 10:  # SASL — mechanism list, NUL-separated
                    mechs = payload[4:].rstrip(b"\x00").split(b"\x00")
                    # prefer channel binding when the session is TLS
                    # and the server offers -PLUS (libpq's choice)
                    if (self._cb_data is not None
                            and b"SCRAM-SHA-256-PLUS" in mechs):
                        mech = b"SCRAM-SHA-256-PLUS"
                        scram = _ScramClient(user, password,
                                             cb_data=self._cb_data)
                    elif b"SCRAM-SHA-256" in mechs:
                        mech = b"SCRAM-SHA-256"
                        scram = _ScramClient(user, password)
                    else:
                        raise NotImplementedError(
                            f"postgres SASL mechanisms {mechs} — only "
                            "SCRAM-SHA-256[-PLUS] are supported"
                        )
                    first = scram.client_first.encode()
                    self.sock.sendall(_msg(
                        b"p",
                        mech + b"\x00"
                        + struct.pack(">I", len(first)) + first,
                    ))
                    continue
                if code == 11:  # SASLContinue: server-first-message
                    final = scram.final(payload[4:].decode())
                    self.sock.sendall(_msg(b"p", final.encode()))
                    continue
                if code == 12:  # SASLFinal: verify server signature
                    scram.verify(payload[4:].decode())
                    continue
                raise NotImplementedError(
                    f"postgres auth method {code} is not supported "
                    "(password/md5/scram-sha-256 are)"
                )
            if tag == b"E":
                raise OSError(f"postgres error: {self._err_text(payload)}")
            if tag == b"Z":
                return  # ReadyForQuery
            # ParameterStatus / BackendKeyData / NoticeResponse: skip

    # ------------------------------------------------------------ wire io
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("postgres connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_msg(self) -> tuple[bytes, bytes]:
        tag = self._read_exact(1)
        (n,) = struct.unpack(">I", self._read_exact(4))
        return tag, self._read_exact(n - 4)

    @staticmethod
    def _err_text(payload: bytes) -> str:
        parts = {}
        i = 0
        while i < len(payload) and payload[i] != 0:
            code = chr(payload[i])
            j = payload.index(b"\x00", i + 1)
            parts[code] = payload[i + 1:j].decode()
            i = j + 1
        return parts.get("M", "unknown error")

    # -------------------------------------------------------------- query
    def query(self, sql: str) -> tuple[list[tuple[str, int]], list[list]]:
        """Simple-query protocol → ([(column, type_oid)], rows) with
        text-format values decoded per OID (None for NULL)."""
        self.sock.sendall(_msg(b"Q", sql.encode() + b"\x00"))
        fields: list[tuple[str, int]] = []
        rows: list[list] = []
        err = None
        while True:
            tag, payload = self._read_msg()
            if tag == b"T":
                (nf,) = struct.unpack(">H", payload[:2])
                i = 2
                fields = []
                for _ in range(nf):
                    j = payload.index(b"\x00", i)
                    name = payload[i:j].decode()
                    _tbl, _col, typoid, _len, _mod, _fmt = struct.unpack(
                        ">IHIhih", payload[j + 1:j + 19])
                    fields.append((name, typoid))
                    i = j + 19
            elif tag == b"D":
                (nc,) = struct.unpack(">H", payload[:2])
                i = 2
                row = []
                for c in range(nc):
                    (ln,) = struct.unpack(">i", payload[i:i + 4])
                    i += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(_decode_text(payload[i:i + ln], fields[c][1]))
                        i += ln
                rows.append(row)
            elif tag == b"E":
                err = self._err_text(payload)
            elif tag == b"Z":
                if err:
                    raise OSError(f"postgres error: {err}")
                return fields, rows
            # 'C' CommandComplete / 'N' notices: continue to ReadyForQuery

    def query_prepared(
        self, sql: str, params: list | None = None,
        param_oids: list[int] | None = None,
        result_formats: list[int] | None = None,
    ) -> tuple[list[tuple[str, int]], list[list], str]:
        """Extended-query protocol (Parse/Bind/Describe/Execute/Sync)
        with text-format $N parameters → (fields, rows, command_tag).
        None params ship as NULL; everything else as str(v) text.
        param_oids declares the parameter types in Parse (drives the
        server's literal quoting); result_formats ships Bind's
        result-column format codes (default: all text)."""
        params = params or []
        oids = param_oids or []
        body = (b"\x00" + sql.encode() + b"\x00"
                + struct.pack(">H", len(oids))
                + struct.pack(f">{len(oids)}I", *oids))
        out = _msg(b"P", body)
        pb = b"\x00\x00" + struct.pack(">H", 0)  # unnamed portal/stmt, fmts
        pb += struct.pack(">H", len(params))
        for p in params:
            if p is None:
                pb += struct.pack(">i", -1)
            else:
                t = str(p).encode()
                pb += struct.pack(">i", len(t)) + t
        rfs = result_formats or []
        pb += struct.pack(">H", len(rfs)) + struct.pack(
            f">{len(rfs)}H", *rfs)
        out += _msg(b"B", pb)
        out += _msg(b"D", b"P\x00")  # describe the unnamed portal
        out += _msg(b"E", b"\x00" + struct.pack(">i", 0))
        out += _msg(b"S", b"")
        self.sock.sendall(out)
        fields: list[tuple[str, int]] = []
        rows: list[list] = []
        cmd_tag = ""
        err = None
        while True:
            tag, payload = self._read_msg()
            if tag == b"T":
                (nf,) = struct.unpack(">H", payload[:2])
                i = 2
                fields = []
                for _ in range(nf):
                    j = payload.index(b"\x00", i)
                    name = payload[i:j].decode()
                    _tbl, _col, typoid, _len, _mod, _fmt = struct.unpack(
                        ">IHIhih", payload[j + 1:j + 19])
                    fields.append((name, typoid))
                    i = j + 19
            elif tag == b"D":
                (nc,) = struct.unpack(">H", payload[:2])
                i = 2
                row = []
                for c in range(nc):
                    (ln,) = struct.unpack(">i", payload[i:i + 4])
                    i += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(
                            _decode_text(payload[i:i + ln], fields[c][1]))
                        i += ln
                rows.append(row)
            elif tag == b"C":
                cmd_tag = payload.rstrip(b"\x00").decode()
            elif tag == b"E":
                err = self._err_text(payload)
            elif tag == b"Z":
                if err:
                    raise OSError(f"postgres error: {err}")
                return fields, rows, cmd_tag
            # '1' ParseComplete / '2' BindComplete / 'n' NoData: skip

    def describe_statement(
        self, sql: str, param_oids: list[int] | None = None,
    ) -> tuple[list[int], list[tuple[str, int]] | None]:
        """Parse + Describe('S') + Sync → (parameter OIDs, row fields
        or None for NoData) — the statement-level describe PgJDBC and
        asyncpg issue before binding."""
        oids = param_oids or []
        body = (b"\x00" + sql.encode() + b"\x00"
                + struct.pack(">H", len(oids))
                + struct.pack(f">{len(oids)}I", *oids))
        out = _msg(b"P", body) + _msg(b"D", b"S\x00") + _msg(b"S", b"")
        self.sock.sendall(out)
        poids: list[int] = []
        fields: list[tuple[str, int]] | None = None
        err = None
        while True:
            tag, payload = self._read_msg()
            if tag == b"t":
                (np,) = struct.unpack(">H", payload[:2])
                poids = list(struct.unpack_from(f">{np}I", payload, 2))
            elif tag == b"T":
                (nf,) = struct.unpack(">H", payload[:2])
                i = 2
                fields = []
                for _ in range(nf):
                    j = payload.index(b"\x00", i)
                    name = payload[i:j].decode()
                    _tbl, _col, typoid, _l, _m, _f = struct.unpack(
                        ">IHIhih", payload[j + 1:j + 19])
                    fields.append((name, typoid))
                    i = j + 19
            elif tag == b"E":
                err = self._err_text(payload)
            elif tag == b"Z":
                if err:
                    raise OSError(f"postgres error: {err}")
                return poids, fields
            # '1' ParseComplete / 'n' NoData: skip ('n' leaves None)

    def close(self) -> None:
        try:
            self.sock.sendall(_msg(b"X", b""))  # Terminate
            self.sock.close()
        except OSError:
            pass


def _decode_text(b: bytes, oid: int):
    s = b.decode()
    if oid in (OID_INT2, OID_INT4, OID_INT8):
        return int(s)
    if oid in (OID_FLOAT4, OID_FLOAT8, OID_NUMERIC):
        return float(s)
    if oid == OID_BOOL:
        return s in ("t", "true", "1")
    if oid == OID_DATE:
        import datetime

        return datetime.date.fromisoformat(s)
    if oid == OID_TIMESTAMP:
        import datetime

        return datetime.datetime.fromisoformat(s)
    return s


# --------------------------------------------------------------- loopback
def _arrow_oid(t) -> int:
    """Arrow type → pg OID (DuckDB's DB-API type codes are the coarse
    generic ones; the Arrow schema carries the exact types)."""
    import pyarrow.types as pt

    if pt.is_boolean(t):
        return OID_BOOL
    if pt.is_int8(t) or pt.is_int16(t):
        return OID_INT2
    if pt.is_int32(t):
        return OID_INT4
    if pt.is_integer(t):  # int64 + unsigned
        return OID_INT8
    if pt.is_float32(t):
        return OID_FLOAT4
    if pt.is_floating(t):
        return OID_FLOAT8
    if pt.is_decimal(t):
        return OID_NUMERIC
    if pt.is_date(t):
        return OID_DATE
    if pt.is_timestamp(t):
        return OID_TIMESTAMP
    return OID_VARCHAR


def _pg_text(v, oid: int) -> bytes:
    if oid == OID_BOOL:
        return b"t" if v else b"f"
    return str(v).encode()


class LoopbackPostgres:
    """A DuckDB database answering over the genuine Postgres v3 wire:
    startup + cleartext-password auth, simple queries, text-format
    rows, ErrorResponse propagation. `seed(sql)` prepares server-side
    state (tables the federated query will read)."""

    def __init__(self, user: str = "fed", password: str = "fedpw",
                 database: str = "fedb", host: str = "127.0.0.1", port: int = 0,
                 auth: str = "password", tls: bool = False):
        import duckdb

        if auth not in ("password", "md5", "scram-sha-256",
                        "scram-sha-256-plus"):
            raise ValueError(f"unsupported auth mode {auth!r}")
        if auth == "scram-sha-256-plus" and not tls:
            raise ValueError("scram-sha-256-plus needs tls=True "
                             "(channel binding hashes the session cert)")
        self.user, self.password, self.database = user, password, database
        self.auth = auth
        self.tls = tls
        self._ssl_ctx = None
        self._cert_der = b""
        if tls:
            import ssl as _ssl

            cert, key = self_signed_material()
            self._ssl_ctx = make_server_ssl_context(cert, key)
            with open(cert) as f:
                self._cert_der = _ssl.PEM_cert_to_DER_cert(f.read())
        self._db = duckdb.connect()
        self._dblock = threading.Lock()
        # logical replication state: the WAL is a change list
        # [(table, op 'I'|'U'|'D', key_dict, new_dict|None)], lsn =
        # 1-based index; slots remember their confirmed position
        self.wal: list[tuple] = []
        self.slots: dict[str, int] = {}
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                self._buf = b""
                try:
                    (n,) = struct.unpack(">I", self._read_exact(4))
                    startup = self._read_exact(n - 4)
                    (proto,) = struct.unpack(">I", startup[:4])
                    if proto == 80877103:  # SSLRequest
                        if server._ssl_ctx is not None:
                            # genuine TLS handshake on the accepted
                            # socket; everything after rides the
                            # encrypted session
                            self.request.sendall(b"S")
                            self.request = server._ssl_ctx.wrap_socket(
                                self.request, server_side=True)
                            self._buf = b""
                        else:
                            self.request.sendall(b"N")  # plaintext
                        (n,) = struct.unpack(">I", self._read_exact(4))
                        startup = self._read_exact(n - 4)
                        (proto,) = struct.unpack(">I", startup[:4])
                    elif server.tls:
                        self._send_err(
                            "this server requires SSL (tls=True)")
                        return
                    params = dict(
                        zip(*[iter(startup[4:].rstrip(b"\x00").split(b"\x00"))] * 2)
                    )
                    if params.get(b"user", b"").decode() != server.user:
                        self._send_err(f"role {params.get(b'user')} does not exist")
                        return
                    # genuine auth exchange — cleartext, md5 or full
                    # SCRAM-SHA-256, all VERIFIED server-side
                    if not self._authenticate():
                        return
                    self.request.sendall(_msg(b"R", struct.pack(">I", 0)))
                    self.request.sendall(_msg(b"Z", b"I"))
                    while True:
                        tag, payload = self._read_msg()
                        if tag == b"X" or tag == b"":
                            return
                        if tag != b"Q":
                            self._send_err(f"unsupported message {tag!r}")
                            self.request.sendall(_msg(b"Z", b"I"))
                            continue
                        sql = payload.rstrip(b"\x00").decode()
                        import re as _re

                        mrep = _re.match(
                            r"\s*CREATE_REPLICATION_SLOT\s+(\w+)\s+LOGICAL\b",
                            sql, _re.I,
                        )
                        if mrep:
                            slot = mrep.group(1)
                            with server._dblock:
                                if slot in server.slots:
                                    self._send_err(
                                        f'replication slot "{slot}" already exists')
                                    self.request.sendall(_msg(b"Z", b"I"))
                                    continue
                                server.slots[slot] = len(server.wal)
                            self.request.sendall(
                                _msg(b"C", b"CREATE_REPLICATION_SLOT\x00"))
                            self.request.sendall(_msg(b"Z", b"I"))
                            continue
                        mstart = _re.match(
                            r"\s*START_REPLICATION\s+SLOT\s+(\w+)\s+LOGICAL\b",
                            sql, _re.I,
                        )
                        if mstart:
                            self._serve_replication(mstart.group(1))
                            continue
                        mdml = _re.match(
                            r"\s*(INSERT\s+INTO|UPDATE|DELETE\s+FROM)\s+(\w+)",
                            sql, _re.I,
                        )
                        if mdml:
                            try:
                                n_aff = server._exec_dml_with_wal(
                                    mdml.group(1).split()[0].upper(),
                                    mdml.group(2), sql,
                                )
                            except Exception as e:  # noqa: BLE001 — DB error → wire error
                                self._send_err(str(e))
                                self.request.sendall(_msg(b"Z", b"I"))
                                continue
                            self.request.sendall(
                                _msg(b"C", f"OK {n_aff}".encode() + b"\x00"))
                            self.request.sendall(_msg(b"Z", b"I"))
                            continue
                        try:
                            with server._dblock:
                                cur = server._db.execute(sql)
                                if cur.description is None:
                                    cols, rows = [], []
                                else:
                                    tbl = cur.fetch_arrow_table()
                                    cols = [
                                        (f.name, _arrow_oid(f.type))
                                        for f in tbl.schema
                                    ]
                                    rows = [
                                        [d[f.name] for f in tbl.schema]
                                        for d in tbl.to_pylist()
                                    ]
                        except Exception as e:  # noqa: BLE001 — DB error → wire error
                            self._send_err(str(e))
                            self.request.sendall(_msg(b"Z", b"I"))
                            continue
                        if cols:
                            body = struct.pack(">H", len(cols))
                            for name, oid in cols:
                                body += name.encode() + b"\x00" + struct.pack(
                                    ">IHIhih", 0, 0, oid, -1, -1, 0)
                            self.request.sendall(_msg(b"T", body))
                            for row in rows:
                                rb = struct.pack(">H", len(row))
                                for v, (_n, oid) in zip(row, cols):
                                    if v is None:
                                        rb += struct.pack(">i", -1)
                                    else:
                                        tv = _pg_text(v, oid)
                                        rb += struct.pack(">i", len(tv)) + tv
                                self.request.sendall(_msg(b"D", rb))
                        self.request.sendall(
                            _msg(b"C", f"SELECT {len(rows)}".encode() + b"\x00"))
                        self.request.sendall(_msg(b"Z", b"I"))
                except OSError:
                    return

            def _read_exact(self, n):
                while len(self._buf) < n:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        raise OSError("closed")
                    self._buf += chunk
                out, self._buf = self._buf[:n], self._buf[n:]
                return out

            def _read_msg(self):
                tag = self._read_exact(1)
                (n,) = struct.unpack(">I", self._read_exact(4))
                return tag, self._read_exact(n - 4)

            def _send_err(self, text: str) -> None:
                body = b"SERROR\x00CXX000\x00M" + text.encode() + b"\x00\x00"
                self.request.sendall(_msg(b"E", body))

            def _authenticate(self) -> bool:
                """Server side of the negotiated auth method; returns
                False (after an ErrorResponse) on verification failure."""
                import base64
                import hashlib
                import os as _os

                if server.auth == "password":
                    self.request.sendall(_msg(b"R", struct.pack(">I", 3)))
                    tag, payload = self._read_msg()
                    if (tag != b"p"
                            or payload.rstrip(b"\x00").decode()
                            != server.password):
                        self._send_err("password authentication failed")
                        return False
                    return True
                if server.auth == "md5":
                    salt = _os.urandom(4)
                    self.request.sendall(
                        _msg(b"R", struct.pack(">I", 5) + salt))
                    tag, payload = self._read_msg()
                    want = _md5_auth_response(
                        server.user, server.password, salt)
                    if tag != b"p" or payload.rstrip(b"\x00") != want:
                        self._send_err("password authentication failed")
                        return False
                    return True
                # scram-sha-256[-plus]: full RFC 5802 exchange with
                # real proof verification (StoredKey recomputed from
                # the client proof); -PLUS additionally verifies the
                # c= channel binding against THIS session's cert hash
                # (RFC 5929 tls-server-end-point)
                mechs = (b"SCRAM-SHA-256-PLUS\x00SCRAM-SHA-256\x00\x00"
                         if server.tls else b"SCRAM-SHA-256\x00\x00")
                self.request.sendall(_msg(
                    b"R", struct.pack(">I", 10) + mechs))
                tag, payload = self._read_msg()
                mech, rest = payload.split(b"\x00", 1)
                (n,) = struct.unpack(">I", rest[:4])
                client_first = rest[4:4 + n].decode()
                if tag != b"p" or mech not in (
                        b"SCRAM-SHA-256", b"SCRAM-SHA-256-PLUS"):
                    self._send_err("unsupported SASL mechanism")
                    return False
                if (server.auth == "scram-sha-256-plus"
                        and mech != b"SCRAM-SHA-256-PLUS"):
                    self._send_err(
                        "channel binding is required "
                        "(SCRAM-SHA-256-PLUS)")
                    return False
                if mech == b"SCRAM-SHA-256-PLUS" and not server.tls:
                    self._send_err(
                        "SCRAM-SHA-256-PLUS requires an SSL connection")
                    return False
                head, _authzid, bare = client_first.split(",", 2)
                gs2 = f"{head},{_authzid},"
                if mech == b"SCRAM-SHA-256-PLUS":
                    if head != "p=tls-server-end-point":
                        self._send_err(
                            "unsupported channel binding type "
                            f"{head!r}")
                        return False
                    expect_cb = cb_tls_server_end_point(server._cert_der)
                else:
                    expect_cb = b""
                cnonce = dict(
                    kv.split("=", 1) for kv in bare.split(","))["r"]
                salt = _os.urandom(16)
                iters = 4096
                snonce = cnonce + base64.b64encode(_os.urandom(12)).decode()
                server_first = (
                    f"r={snonce},s={base64.b64encode(salt).decode()},"
                    f"i={iters}"
                )
                self.request.sendall(_msg(
                    b"R",
                    struct.pack(">I", 11) + server_first.encode()))
                tag, payload = self._read_msg()
                client_final = payload.decode()
                attrs = dict(
                    kv.split("=", 1) for kv in client_final.split(","))
                # c= binds the gs2 header (and for -PLUS the session
                # cert hash) into the signed auth message — a MITM
                # terminating TLS presents a different cert and fails
                # here even with a correct password
                if attrs["c"] != base64.b64encode(
                        gs2.encode() + expect_cb).decode():
                    self._send_err("channel binding verification failed")
                    return False
                without_proof = client_final.rsplit(",p=", 1)[0]
                auth_msg = ",".join(
                    [bare, server_first, without_proof]).encode()
                _salted, _ckey, stored, skey = _scram_keys(
                    server.password, salt, iters)
                proof = base64.b64decode(attrs["p"])
                sig = _scram_hmac(stored, auth_msg)
                ckey_rec = bytes(a ^ b for a, b in zip(proof, sig))
                if (attrs["r"] != snonce
                        or hashlib.sha256(ckey_rec).digest() != stored):
                    self._send_err("password authentication failed")
                    return False
                v = base64.b64encode(
                    _scram_hmac(skey, auth_msg)).decode()
                self.request.sendall(_msg(
                    b"R", struct.pack(">I", 12) + f"v={v}".encode()))
                return True

            # ------------------------------------------- logical replication
            def _copydata(self, payload: bytes) -> None:
                self.request.sendall(_msg(b"d", payload))

            def _xlog(self, lsn: int, msg: bytes) -> None:
                self._copydata(
                    b"w" + struct.pack(">QQq", lsn, lsn, 0) + msg)

            def _serve_replication(self, slot: str) -> None:
                """START_REPLICATION → CopyBoth: stream the WAL past the
                slot's confirmed position as pgoutput messages
                (Relation once per table, Begin/change/Commit per
                entry), one trailing keepalive, then consume Standby
                Status Updates until CopyDone."""
                with server._dblock:
                    if slot not in server.slots:
                        self._send_err(f'replication slot "{slot}" does not exist')
                        self.request.sendall(_msg(b"Z", b"I"))
                        return
                    pos = server.slots[slot]
                    backlog = list(enumerate(server.wal[pos:], start=pos + 1))
                    wal_end = len(server.wal)
                self.request.sendall(_msg(b"W", b"\x00\x00\x00"))
                announced: dict[str, int] = {}
                for lsn, (tbl, op, key, new) in backlog:
                    if tbl not in announced:
                        relid = len(announced) + 1
                        announced[tbl] = relid
                        cols, pks = server._table_schema(tbl)
                        body = b"R" + struct.pack(">I", relid)
                        body += b"public\x00" + tbl.encode() + b"\x00"
                        body += b"d"  # replica identity default
                        body += struct.pack(">H", len(cols))
                        for cname, oid in cols:
                            body += bytes([1 if cname in pks else 0])
                            body += cname.encode() + b"\x00"
                            body += struct.pack(">Ii", oid, -1)
                        self._xlog(lsn, body)
                    relid = announced[tbl]
                    cols, pks = server._table_schema(tbl)
                    self._xlog(lsn, b"B" + struct.pack(">QqI", lsn, 0, lsn))

                    def tup(d: dict) -> bytes:
                        out = struct.pack(">H", len(cols))
                        for cname, oid in cols:
                            v = d.get(cname)
                            if v is None:
                                out += b"n"
                            else:
                                tv = _pg_text(v, oid)
                                out += b"t" + struct.pack(">i", len(tv)) + tv
                        return out

                    if op == "I":
                        self._xlog(lsn, b"I" + struct.pack(">I", relid) + b"N" + tup(new))
                    elif op == "U":
                        self._xlog(lsn, b"U" + struct.pack(">I", relid) + b"N" + tup(new))
                    else:
                        self._xlog(lsn, b"D" + struct.pack(">I", relid) + b"K" + tup(key))
                    self._xlog(lsn, b"C\x00" + struct.pack(">QQq", lsn, lsn, 0))
                # keepalive after the full backlog = the caught-up signal
                self._copydata(b"k" + struct.pack(">Qq", wal_end, 0) + b"\x00")
                while True:
                    tag, payload = self._read_msg()
                    if tag == b"d" and payload[:1] == b"r":
                        (flushed,) = struct.unpack_from(">Q", payload, 9)
                        with server._dblock:
                            # confirm = flushed lsn (client sends lsn+1)
                            server.slots[slot] = max(
                                server.slots[slot], min(flushed - 1, wal_end))
                    elif tag == b"c":  # CopyDone both ways, back to queries
                        self.request.sendall(_msg(b"c", b""))
                        self.request.sendall(_msg(b"C", b"COPY 0\x00"))
                        self.request.sendall(_msg(b"Z", b"I"))
                        return
                    elif tag in (b"X", b""):
                        return

        class Server(socketserver.ThreadingTCPServer):
            def process_request(self, request, client_address):
                # TCP_NODELAY on the accept side too: reply bytes must
                # not sit in Nagle's buffer waiting for a delayed ACK
                request.setsockopt(
                    socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                super().process_request(request, client_address)
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def seed(self, sql: str) -> None:
        with self._dblock:
            self._db.execute(sql)

    def _table_schema(self, table: str) -> tuple[list[tuple[str, int]], set]:
        """(ordered [(col, pg oid)], pk column set) — pgoutput Relation
        metadata, from DuckDB's catalog."""
        tbl = self._db.execute(f"SELECT * FROM {table} LIMIT 0").fetch_arrow_table()
        cols = [(f.name, _arrow_oid(f.type)) for f in tbl.schema]
        info = self._db.execute(f"PRAGMA table_info('{table}')").fetchall()
        pks = {r[1] for r in info if r[5]}
        return cols, pks or {c for c, _ in cols}  # no pk → replident full

    def _exec_dml_with_wal(self, verb: str, table: str, sql: str) -> int:
        with self._dblock:
            cols, pks = self._table_schema(table)
            n, entries = duck_exec_dml_with_wal(
                self._db, verb, table, sql, [c for c, _ in cols], pks)
            self.wal.extend(entries)
            return n

    def start(self) -> "LoopbackPostgres":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


# -------------------------------------------------------- logical replication
def _cstr(buf: bytes, i: int) -> tuple[str, int]:
    j = buf.index(b"\x00", i)
    return buf[i:j].decode(), j + 1


def _tuple_data(buf: bytes, i: int, cols: list[tuple[str, int]]):
    """pgoutput TupleData → (dict by column name, next offset); text
    format per column type oid ('n' NULL, 'u' unchanged → omitted)."""
    (n,) = struct.unpack_from(">H", buf, i)
    i += 2
    out = {}
    for c in range(n):
        kind = buf[i:i + 1]
        i += 1
        name, oid = cols[c]
        if kind == b"n":
            out[name] = None
        elif kind == b"u":
            continue  # TOAST-unchanged: not part of the image
        elif kind == b"t":
            (ln,) = struct.unpack_from(">i", buf, i)
            i += 4
            out[name] = _decode_text(buf[i:i + ln], oid)
            i += ln
        else:
            raise OSError(f"unknown TupleData kind {kind!r}")
    return out, i


class PgReplicationClient(PgWireClient):
    """Logical-replication consumer speaking the PUBLIC protocol
    (postgresql.org/docs "Streaming Replication Protocol" +
    "Logical Streaming Replication Protocol" / pgoutput): walsender
    startup, CREATE_REPLICATION_SLOT ... LOGICAL pgoutput,
    START_REPLICATION into CopyBoth, XLogData-framed pgoutput
    messages (Begin/Relation/Insert/Update/Delete/Commit), Standby
    Status Updates confirming the flushed LSN — the server-side slot
    is the durable offset, exactly the contract the reference's
    postgres-cdc source consumes through Debezium."""

    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, timeout: float = 10.0):
        super().__init__(host, port, user, password, database,
                         timeout=timeout, replication=True)
        self._relations: dict[int, dict] = {}

    def create_slot(self, name: str) -> None:
        try:
            self.query(f"CREATE_REPLICATION_SLOT {name} LOGICAL pgoutput")
        except OSError as e:
            if "already exists" not in str(e):
                raise

    def drain(self, slot: str, publication: str = "rw_pub"):
        """START_REPLICATION and yield ('I'|'U'|'D', relation, key_dict,
        new_dict|None, lsn) for every pending change, ending when the
        server's keepalive says the stream is caught up. Call
        `confirm(lsn)` after each durable fold, `finish()` to leave
        CopyBoth cleanly."""
        self.sock.sendall(_msg(
            b"Q",
            (
                f"START_REPLICATION SLOT {slot} LOGICAL 0/0 "
                f"(proto_version '1', publication_names '{publication}')"
            ).encode() + b"\x00",
        ))
        tag, _payload = self._read_msg()
        if tag == b"E":
            raise OSError(f"postgres error: {self._err_text(_payload)}")
        if tag != b"W":  # CopyBothResponse
            raise OSError(f"expected CopyBothResponse, got {tag!r}")
        last_lsn = 0
        while True:
            tag, payload = self._read_msg()
            if tag != b"d":  # CopyData carries everything in CopyBoth
                raise OSError(f"unexpected message {tag!r} in CopyBoth")
            kind = payload[:1]
            if kind == b"k":  # keepalive: walEnd, ts, replyRequested
                (wal_end,) = struct.unpack_from(">Q", payload, 1)
                if payload[17] == 1 and last_lsn:
                    self.confirm(last_lsn)
                if wal_end <= last_lsn or wal_end == 0:
                    return  # caught up: everything the server has
                # the loopback (single-writer) sends its keepalive only
                # AFTER the full backlog, so reaching here still means
                # caught-up; a real server interleaves keepalives —
                # callers polling one would loop drain() again
                return
            if kind != b"w":
                raise OSError(f"unexpected CopyData kind {kind!r}")
            # XLogData: start lsn, end lsn, server ts, then pgoutput
            (start_lsn,) = struct.unpack_from(">Q", payload, 1)
            last_lsn = max(last_lsn, start_lsn)
            msg = payload[25:]
            mtype = msg[:1]
            if mtype == b"R":
                (relid,) = struct.unpack_from(">I", msg, 1)
                i = 5
                _ns, i = _cstr(msg, i)
                rel, i = _cstr(msg, i)
                i += 1  # replica identity
                (ncols,) = struct.unpack_from(">H", msg, i)
                i += 2
                cols, keycols = [], []
                for _ in range(ncols):
                    flags = msg[i]
                    i += 1
                    cname, i = _cstr(msg, i)
                    (typoid, _typmod) = struct.unpack_from(">Ii", msg, i)
                    i += 8
                    cols.append((cname, typoid))
                    if flags & 1:
                        keycols.append(cname)
                self._relations[relid] = {
                    "name": rel, "cols": cols,
                    "keys": keycols or [c for c, _ in cols],
                }
            elif mtype in (b"I", b"U", b"D"):
                (relid,) = struct.unpack_from(">I", msg, 1)
                rel = self._relations[relid]
                i = 5
                old = None
                if mtype in (b"U", b"D") and msg[i:i + 1] in (b"K", b"O"):
                    i += 1
                    old, i = _tuple_data(msg, i, rel["cols"])
                new = None
                if mtype in (b"I", b"U"):
                    if msg[i:i + 1] != b"N":
                        raise OSError("expected new tuple")
                    new, i = _tuple_data(msg, i + 1, rel["cols"])
                src = old if old is not None else (new or {})
                key = {k: src.get(k) for k in rel["keys"]}
                if new is not None:
                    key = {k: new.get(k, key.get(k)) for k in rel["keys"]}
                yield (mtype.decode(), rel["name"], key, new, start_lsn)
            # 'B' Begin / 'C' Commit frame the txn; nothing to extract

    def confirm(self, lsn: int) -> None:
        """Standby Status Update: written/flushed/applied = lsn+1 —
        the server advances the slot's confirmed position (the durable
        offset commit)."""
        body = b"r" + struct.pack(">QQQq", lsn + 1, lsn + 1, lsn + 1, 0) + b"\x00"
        self.sock.sendall(_msg(b"d", body))

    def finish(self) -> None:
        """Leave CopyBoth: CopyDone both ways, drain to ReadyForQuery."""
        self.sock.sendall(_msg(b"c", b""))
        while True:
            tag, _p = self._read_msg()
            if tag == b"Z":
                return


def duck_exec_dml_with_wal(
    db, verb: str, table: str, sql: str, names: list[str], pks: set,
) -> tuple[int, list[tuple]]:
    """Execute a data-modifying statement on the embedded DuckDB AND
    capture its change images — the loopback databases' shared
    stand-in for real WAL/binlog decoding (the WIRE formats the
    clients consume are genuine pgoutput / binlog events either way):
    INSERT runs with RETURNING * for the new images, DELETE
    pre-selects the old rows for the key images, UPDATE applies the
    SET list through a SELECT then delete+reinserts (DuckDB's ART
    index rejects in-place UPDATE on a PK'd table — documented
    delete+insert limitation; same images either way). Caller holds
    the db lock. → (affected rows, [(table, op, key, new|None)])."""
    import re as _re

    entries: list[tuple] = []
    if verb == "DELETE":
        mw = _re.search(r"\bWHERE\b(.*)$", sql, _re.I | _re.S)
        where = f" WHERE {mw.group(1)}" if mw else ""
        old = db.execute(
            f"SELECT * FROM {table}{where}").fetch_arrow_table().to_pylist()
        db.execute(sql)
        for d in old:
            entries.append((table, "D", {k: d.get(k) for k in pks}, None))
        return len(old), entries
    if verb == "UPDATE":
        m = _re.match(
            r"\s*UPDATE\s+\w+\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?\s*;?\s*$",
            sql, _re.I | _re.S,
        )
        if not m:
            raise ValueError(f"cannot parse UPDATE: {sql!r}")
        sets = {}
        depth, cur_part, parts = 0, "", []
        for ch in m.group(1):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur_part)
                cur_part = ""
            else:
                cur_part += ch
        parts.append(cur_part)
        for part in parts:
            col, _, expr = part.partition("=")
            sets[col.strip().lower()] = expr.strip()
        where = f" WHERE {m.group(2)}" if m.group(2) else ""
        sel = ", ".join(
            f"({sets[n.lower()]}) AS {n}" if n.lower() in sets else n
            for n in names
        )
        new_rows = db.execute(
            f"SELECT {sel} FROM {table}{where}").fetch_arrow_table().to_pylist()
        db.execute(f"DELETE FROM {table}{where}")
        if new_rows:
            ph = ", ".join(["?"] * len(names))
            db.executemany(
                f"INSERT INTO {table} ({', '.join(names)}) VALUES ({ph})",
                [[d.get(n) for n in names] for d in new_rows],
            )
    else:
        cur = db.execute(sql.rstrip().rstrip(";") + " RETURNING *")
        new_rows = cur.fetch_arrow_table().to_pylist()
    op = "I" if verb == "INSERT" else "U"
    for d in new_rows:
        row = {n: d.get(n) for n in names}
        entries.append((table, op, {k: row.get(k) for k in pks}, row))
    return len(new_rows), entries
