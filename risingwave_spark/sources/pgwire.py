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
password/trust auth (scram/md5 are gated loud — no hashing handshake
material needed in-sandbox).

`LoopbackPostgres` is the in-sandbox stand-in for the external
database: it serves the genuine v3 protocol (including the cleartext
auth exchange) and executes each query on an embedded DuckDB
connection — a REAL SQL engine answering over real Postgres wire
bytes, so the federated path is exercised end-to-end: wire handshake,
auth, type-OID mapping, NULL handling, error propagation.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

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


class PgWireClient:
    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        params = b""
        for k, v in (("user", user), ("database", database)):
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
                raise NotImplementedError(
                    f"postgres auth method {code} (md5/scram) needs crypto "
                    "handshake material; use password or trust auth"
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
                 database: str = "fedb", host: str = "127.0.0.1", port: int = 0):
        import duckdb

        self.user, self.password, self.database = user, password, database
        self._db = duckdb.connect()
        self._dblock = threading.Lock()
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                self._buf = b""
                try:
                    (n,) = struct.unpack(">I", self._read_exact(4))
                    startup = self._read_exact(n - 4)
                    (proto,) = struct.unpack(">I", startup[:4])
                    if proto == 80877103:  # SSLRequest: refuse, plaintext
                        self.request.sendall(b"N")
                        (n,) = struct.unpack(">I", self._read_exact(4))
                        startup = self._read_exact(n - 4)
                        (proto,) = struct.unpack(">I", startup[:4])
                    params = dict(
                        zip(*[iter(startup[4:].rstrip(b"\x00").split(b"\x00"))] * 2)
                    )
                    if params.get(b"user", b"").decode() != server.user:
                        self._send_err(f"role {params.get(b'user')} does not exist")
                        return
                    # genuine cleartext auth exchange
                    self.request.sendall(_msg(b"R", struct.pack(">I", 3)))
                    tag, payload = self._read_msg()
                    if tag != b"p" or payload.rstrip(b"\x00").decode() != server.password:
                        self._send_err("password authentication failed")
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

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def seed(self, sql: str) -> None:
        with self._dblock:
            self._db.execute(sql)

    def start(self) -> "LoopbackPostgres":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
