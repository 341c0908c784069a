"""Pure-stdlib MySQL client/server wire protocol (reference
`src/batch/executors/src/executor/mysql_query.rs`: the
`mysql_query(hostname, port, username, password, database, query)`
table function runs a query on an external MySQL via mysql_async;
this module speaks the same PUBLIC protocol — dev.mysql.com
"Client/Server Protocol" — with stdlib sockets and hashlib).

Client flow: HandshakeV10 (server greeting with a 20-byte nonce) →
HandshakeResponse41 with the mysql_native_password scramble
(`SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw)))` — plain SHA1, public
spec) → OK/ERR; then COM_QUERY → column-count, column definitions
(type codes), text-protocol result rows (length-encoded strings,
0xFB NULL) terminated by EOF packets; ERR packets raise with the
server's message. caching_sha2_password (the 8.0 default) is fully
implemented: the fast path (SHA256 scramble, auth-moredata 0x03) and
the full path (0x04 — request the server's RSA public key and send
the password XOR nonce under RSAES-OAEP, rsa_jwt.py), per the public
dev.mysql.com caching_sha2_password description.

`LoopbackMysql` is the in-sandbox stand-in for the external database:
genuine packet framing, a real auth exchange (it verifies the
client's scramble against its own nonce), and each COM_QUERY executed
on an embedded DuckDB — a real SQL engine answering over real MySQL
wire bytes.
"""

from __future__ import annotations

import hashlib
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


# column type codes (public include/field_types.h values)
T_TINY = 1
T_LONG = 3
T_FLOAT = 4
T_DOUBLE = 5
T_LONGLONG = 8
T_DATE = 10
T_DATETIME = 12
T_NEWDECIMAL = 246
T_VAR_STRING = 253

TYPE_TO_SPARK = {
    T_TINY: "boolean",
    T_LONG: "int",
    T_LONGLONG: "bigint",
    T_FLOAT: "float",
    T_DOUBLE: "double",
    T_NEWDECIMAL: "double",
    T_DATE: "date",
    T_DATETIME: "timestamp",
    T_VAR_STRING: "string",
}

CAP_PROTOCOL_41 = 0x0200
CAP_CONNECT_WITH_DB = 0x0008
CAP_SECURE_CONNECTION = 0x8000
CAP_PLUGIN_AUTH = 0x00080000


def native_scramble(password: str, nonce: bytes) -> bytes:
    """mysql_native_password: SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw)))."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def caching_sha2_scramble(password: str, nonce: bytes) -> bytes:
    """caching_sha2_password (the MySQL 8.0 default) fast-auth scramble:
    SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) || nonce). The server's
    auth cache holds k2 = SHA256(SHA256(pw)), from which it recovers
    SHA256(pw) = scramble XOR SHA256(k2 || nonce) and checks
    SHA256(recovered) == k2 — a real verification, which the loopback
    performs verbatim (PUBLIC algorithm: MySQL 8.0 reference manual,
    caching_sha2_password fast authentication)."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(hashlib.sha256(h1).digest() + nonce).digest()
    return bytes(a ^ b for a, b in zip(h1, h2))


def _lenenc_int(buf: bytes, i: int) -> tuple[int, int]:
    b = buf[i]
    if b < 0xFB:
        return b, i + 1
    if b == 0xFC:
        return struct.unpack_from("<H", buf, i + 1)[0], i + 3
    if b == 0xFD:
        return int.from_bytes(buf[i + 1:i + 4], "little"), i + 4
    return struct.unpack_from("<Q", buf, i + 1)[0], i + 9


def _enc_lenenc_int(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + struct.pack("<Q", n)


def _enc_lenenc_str(s: bytes) -> bytes:
    return _enc_lenenc_int(len(s)) + s


def _lenenc_str(buf: bytes, i: int) -> tuple[bytes | None, int]:
    if buf[i] == 0xFB:  # NULL
        return None, i + 1
    n, i = _lenenc_int(buf, i)
    return buf[i:i + n], i + n


class _Conn:
    """Packet framing shared by both ends: 3-byte LE length + seq id."""

    def __init__(self, sock):
        self.sock = sock
        self._buf = b""
        self.seq = 0

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("mysql connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_packet(self) -> bytes:
        hdr = self._read_exact(4)
        n = int.from_bytes(hdr[:3], "little")
        self.seq = hdr[3] + 1
        return self._read_exact(n)

    def send_packet(self, payload: bytes) -> None:
        self.sock.sendall(
            len(payload).to_bytes(3, "little") + bytes([self.seq & 0xFF]) + payload
        )
        self.seq += 1


def _err_packet(payload: bytes) -> str:
    # 0xFF errno(2) '#' sqlstate(5) message
    return payload[9:].decode(errors="replace")


class MySqlWireClient:
    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, timeout: float = 10.0):
        self.conn = _Conn(_nodelay_connect((host, port), timeout=timeout))
        greeting = self.conn.read_packet()
        if greeting[0] == 0xFF:
            raise OSError(f"mysql error: {_err_packet(greeting)}")
        if greeting[0] != 10:
            raise OSError(f"unsupported mysql protocol version {greeting[0]}")
        i = greeting.index(b"\x00", 1) + 1  # server version
        i += 4  # thread id
        nonce = greeting[i:i + 8]
        i += 8 + 1  # filler
        i += 2 + 1 + 2 + 2  # cap-low, charset, status, cap-high
        auth_len = greeting[i]
        i += 1 + 10  # reserved
        nonce += greeting[i:i + max(13, auth_len - 8)].rstrip(b"\x00")
        i += max(13, auth_len - 8)
        plugin = greeting[i:].split(b"\x00", 1)[0].decode() if i < len(greeting) else ""
        if plugin and plugin not in (
            "mysql_native_password", "caching_sha2_password"
        ):
            raise NotImplementedError(
                f"mysql auth plugin {plugin!r} is not supported; use "
                "mysql_native_password or caching_sha2_password"
            )
        nonce = nonce[:20]
        caps = (CAP_PROTOCOL_41 | CAP_CONNECT_WITH_DB
                | CAP_SECURE_CONNECTION | CAP_PLUGIN_AUTH)
        if plugin == "caching_sha2_password":
            auth = caching_sha2_scramble(password, nonce)
        else:
            plugin = "mysql_native_password"
            auth = native_scramble(password, nonce)
        resp = (
            struct.pack("<IIB", caps, 1 << 24, 33) + b"\x00" * 23
            + user.encode() + b"\x00"
            + bytes([len(auth)]) + auth
            + database.encode() + b"\x00"
            + plugin.encode() + b"\x00"
        )
        self.conn.send_packet(resp)
        ok = self.conn.read_packet()
        while True:
            if ok[0] == 0xFF:
                raise OSError(f"mysql error: {_err_packet(ok)}")
            if ok[0] == 0x01:  # AuthMoreData (caching_sha2 sub-states)
                if ok[1:2] == b"\x03":  # fast-auth success → OK follows
                    ok = self.conn.read_packet()
                    continue
                if ok[1:2] == b"\x04":  # full authentication needed
                    # the plaintext path requires TLS; over clear TCP
                    # the protocol prescribes the RSA key exchange:
                    # request the server public key (0x02), XOR the
                    # NUL-terminated password with the nonce, OAEP-
                    # encrypt, send (MySQL 8.0 caching_sha2 full auth)
                    from risingwave_spark.sources.rsa_jwt import (
                        oaep_encrypt,
                        public_key_from_pem,
                    )

                    self.conn.send_packet(b"\x02")
                    pk = self.conn.read_packet()
                    if pk[0] != 0x01:
                        raise OSError(
                            f"mysql full auth: expected public key, got "
                            f"0x{pk[0]:02x}")
                    pub = public_key_from_pem(pk[1:])
                    pw = password.encode() + b"\x00"
                    xored = bytes(
                        b ^ nonce[i % len(nonce)]
                        for i, b in enumerate(pw))
                    self.conn.send_packet(oaep_encrypt(pub, xored))
                    ok = self.conn.read_packet()
                    continue
                raise OSError(
                    f"mysql auth: unexpected AuthMoreData state "
                    f"0x{ok[1]:02x}")
            if ok[0] == 0xFE and len(ok) > 1:  # AuthSwitchRequest
                sw_plugin, rest = ok[1:].split(b"\x00", 1)
                sw_nonce = rest.rstrip(b"\x00")[:20]
                if sw_plugin == b"mysql_native_password":
                    self.conn.send_packet(
                        native_scramble(password, sw_nonce))
                elif sw_plugin == b"caching_sha2_password":
                    self.conn.send_packet(
                        caching_sha2_scramble(password, sw_nonce))
                else:
                    raise NotImplementedError(
                        f"auth switch to {sw_plugin!r} unsupported")
                ok = self.conn.read_packet()
                continue
            break  # OK packet

    def query(self, sql: str) -> tuple[list[tuple[str, int]], list[list]]:
        """COM_QUERY text protocol → ([(column, type_code)], rows) with
        values decoded per type code (None for NULL)."""
        self.conn.seq = 0
        self.conn.send_packet(b"\x03" + sql.encode())
        first = self.conn.read_packet()
        if first[0] == 0xFF:
            raise OSError(f"mysql error: {_err_packet(first)}")
        if first[0] == 0x00:
            return [], []  # OK packet: statement with no result set
        ncols, _ = _lenenc_int(first, 0)
        fields: list[tuple[str, int]] = []
        for _ in range(ncols):
            col = self.conn.read_packet()
            i = 0
            vals = []
            for _k in range(6):  # catalog, schema, table, org_table, name, org_name
                v, i = _lenenc_str(col, i)
                vals.append(v)
            i += 1 + 2 + 4  # filler, charset, column length
            ctype = col[i]
            fields.append((vals[4].decode(), ctype))
        pkt = self.conn.read_packet()
        if not (pkt[0] == 0xFE and len(pkt) < 9):
            raise OSError("expected EOF after column definitions")
        rows: list[list] = []
        while True:
            pkt = self.conn.read_packet()
            if pkt[0] == 0xFE and len(pkt) < 9:
                return fields, rows
            if pkt[0] == 0xFF:
                raise OSError(f"mysql error: {_err_packet(pkt)}")
            i = 0
            row = []
            for c in range(ncols):
                v, i = _lenenc_str(pkt, i)
                row.append(None if v is None else _decode_text(v, fields[c][1]))
            rows.append(row)

    def close(self) -> None:
        try:
            self.conn.seq = 0
            self.conn.send_packet(b"\x01")  # COM_QUIT
            self.conn.sock.close()
        except OSError:
            pass


def _decode_text(b: bytes, ctype: int):
    s = b.decode()
    if ctype in (T_LONG, T_LONGLONG):
        return int(s)
    if ctype in (T_FLOAT, T_DOUBLE, T_NEWDECIMAL):
        return float(s)
    if ctype == T_TINY:
        return s not in ("0", "")
    if ctype == T_DATE:
        import datetime

        return datetime.date.fromisoformat(s)
    if ctype == T_DATETIME:
        import datetime

        return datetime.datetime.fromisoformat(s)
    return s


# --------------------------------------------------------------- loopback
def _arrow_mysql_type(t) -> int:
    import pyarrow.types as pt

    if pt.is_boolean(t):
        return T_TINY
    if pt.is_int32(t) or pt.is_int16(t) or pt.is_int8(t):
        return T_LONG
    if pt.is_integer(t):
        return T_LONGLONG
    if pt.is_float32(t):
        return T_FLOAT
    if pt.is_floating(t):
        return T_DOUBLE
    if pt.is_decimal(t):
        return T_NEWDECIMAL
    if pt.is_date(t):
        return T_DATE
    if pt.is_timestamp(t):
        return T_DATETIME
    return T_VAR_STRING


class LoopbackMysql:
    """A DuckDB database answering over the genuine MySQL wire:
    HandshakeV10 with a fresh nonce, scramble VERIFICATION, COM_QUERY
    text-protocol result sets, ERR packets. `seed(sql)` prepares
    server-side state."""

    def __init__(self, user: str = "fed", password: str = "fedpw",
                 database: str = "fedb", host: str = "127.0.0.1", port: int = 0,
                 auth_plugin: str = "mysql_native_password",
                 force_full_auth: bool = False):
        import os

        import duckdb

        if auth_plugin not in (
            "mysql_native_password", "caching_sha2_password"
        ):
            raise ValueError(f"unsupported auth plugin {auth_plugin!r}")
        self.user, self.password, self.database = user, password, database
        self.auth_plugin = auth_plugin
        #: simulate an EMPTY auth cache: every caching_sha2 login takes
        #: the full-authentication path (0x04 → RSA key exchange) — the
        #: first-ever login against a real 8.0 server
        self.force_full_auth = force_full_auth
        if force_full_auth:
            from risingwave_spark.sources.rsa_jwt import generate_keypair

            self.rsa_key = generate_keypair()
        self._db = duckdb.connect()
        self._dblock = threading.Lock()
        # virtual binlog: [(table, op 'I'|'U'|'D', key_dict, new_dict)],
        # position = entry index ("binlog.000001")
        self.binlog: list[tuple] = []
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                conn = _Conn(self.request)
                try:
                    nonce = os.urandom(20)
                    greeting = (
                        bytes([10]) + b"8.0.0-loopback\x00"
                        + struct.pack("<I", 1)
                        + nonce[:8] + b"\x00"
                        + struct.pack("<H", (CAP_PROTOCOL_41 | CAP_CONNECT_WITH_DB
                                             | CAP_SECURE_CONNECTION) & 0xFFFF)
                        + bytes([33])
                        + struct.pack("<H", 2)
                        + struct.pack("<H", (CAP_PLUGIN_AUTH
                                             | CAP_SECURE_CONNECTION) >> 16)
                        + bytes([21]) + b"\x00" * 10
                        + nonce[8:] + b"\x00"
                        + server.auth_plugin.encode() + b"\x00"
                    )
                    conn.send_packet(greeting)
                    resp = conn.read_packet()
                    # HandshakeResponse41: caps(4) maxpkt(4) charset(1) 23x0
                    i = 4 + 4 + 1 + 23
                    j = resp.index(b"\x00", i)
                    user_in = resp[i:j].decode()
                    i = j + 1
                    alen = resp[i]
                    auth = resp[i + 1:i + 1 + alen]
                    if (server.auth_plugin == "caching_sha2_password"
                            and server.force_full_auth):
                        # empty-cache path: 0x04 full auth → public-key
                        # request → OAEP-encrypted XORed password,
                        # decrypted and VERIFIED server-side
                        from risingwave_spark.sources.rsa_jwt import (
                            oaep_decrypt,
                            public_key_pem,
                        )

                        if user_in != server.user:
                            ok = False
                        else:
                            conn.send_packet(b"\x01\x04")
                            req = conn.read_packet()
                            if req != b"\x02":
                                return  # protocol violation
                            conn.send_packet(
                                b"\x01" + public_key_pem(server.rsa_key))
                            enc = conn.read_packet()
                            try:
                                xored = oaep_decrypt(server.rsa_key, enc)
                            except ValueError:
                                ok = False
                            else:
                                pw = bytes(
                                    b ^ nonce[i % len(nonce)]
                                    for i, b in enumerate(xored))
                                ok = (pw.rstrip(b"\x00").decode(
                                    errors="replace") == server.password)
                        # falls through to the shared error/OK + command
                        # loop below (no fast-auth 0x03 in full mode)
                    elif server.auth_plugin == "caching_sha2_password":
                        # fast-auth verification from the cache entry
                        # k2 = SHA256(SHA256(pw)) — recover SHA256(pw)
                        # from the scramble, re-hash, compare (the real
                        # server's cached-path check)
                        h1 = hashlib.sha256(
                            server.password.encode()).digest()
                        k2 = hashlib.sha256(h1).digest()
                        mask = hashlib.sha256(k2 + nonce).digest()
                        recovered = bytes(
                            a ^ b for a, b in zip(auth, mask))
                        ok = (user_in == server.user and len(auth) == 32
                              and hashlib.sha256(recovered).digest() == k2)
                    else:
                        ok = (user_in == server.user
                              and auth == native_scramble(
                                  server.password, nonce))
                    if not ok:
                        conn.send_packet(
                            b"\xff" + struct.pack("<H", 1045) + b"#28000"
                            + b"Access denied (password mismatch)")
                        return
                    if (server.auth_plugin == "caching_sha2_password"
                            and not server.force_full_auth):
                        conn.send_packet(b"\x01\x03")  # fast-auth success
                    conn.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")  # OK
                    while True:
                        conn.seq = 0
                        pkt = conn.read_packet()
                        if not pkt or pkt[0] == 0x01:  # COM_QUIT
                            return
                        if pkt[0] == COM_BINLOG_DUMP:
                            pos, _flags, _sid = struct.unpack_from("<IHI", pkt, 1)
                            server._serve_binlog(conn, pos)
                            continue
                        if pkt[0] != 0x03:  # only COM_QUERY
                            conn.send_packet(
                                b"\xff" + struct.pack("<H", 1047) + b"#08S01"
                                + b"unsupported command")
                            continue
                        sql = pkt[1:].decode()
                        import re as _re

                        if _re.match(r"\s*SET\s+@", sql, _re.I):
                            # session vars (@master_binlog_checksum etc.)
                            conn.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")
                            continue
                        if _re.match(r"\s*SHOW\s+MASTER\s+STATUS\b", sql, _re.I):
                            with server._dblock:
                                pos = len(server.binlog)
                            conn.send_packet(_enc_lenenc_int(2))
                            for cname in ("File", "Position"):
                                nb = cname.encode()
                                conn.send_packet(
                                    _enc_lenenc_str(b"def") + _enc_lenenc_str(b"")
                                    + _enc_lenenc_str(b"") + _enc_lenenc_str(b"")
                                    + _enc_lenenc_str(nb) + _enc_lenenc_str(nb)
                                    + b"\x0c" + struct.pack("<HIB", 33, 255,
                                                            T_VAR_STRING)
                                    + struct.pack("<HB", 0, 0) + b"\x00\x00")
                            conn.send_packet(b"\xfe\x00\x00\x02\x00")
                            conn.send_packet(
                                _enc_lenenc_str(b"binlog.000001")
                                + _enc_lenenc_str(str(pos).encode()))
                            conn.send_packet(b"\xfe\x00\x00\x02\x00")
                            continue
                        mdml = _re.match(
                            r"\s*(INSERT\s+INTO|UPDATE|DELETE\s+FROM)\s+(\w+)",
                            sql, _re.I,
                        )
                        if mdml:
                            try:
                                n_aff = server._exec_dml_with_binlog(
                                    mdml.group(1).split()[0].upper(),
                                    mdml.group(2), sql,
                                )
                            except Exception as e:  # noqa: BLE001 — DB error → ERR
                                conn.send_packet(
                                    b"\xff" + struct.pack("<H", 1064) + b"#42000"
                                    + str(e).encode()[:400])
                                continue
                            conn.send_packet(
                                b"\x00" + _enc_lenenc_int(n_aff)
                                + b"\x00\x02\x00\x00\x00")
                            continue
                        try:
                            with server._dblock:
                                cur = server._db.execute(sql)
                                if cur.description is None:
                                    conn.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")
                                    continue
                                tbl = cur.fetch_arrow_table()
                        except Exception as e:  # noqa: BLE001 — DB error → ERR packet
                            conn.send_packet(
                                b"\xff" + struct.pack("<H", 1064) + b"#42000"
                                + str(e).encode()[:400])
                            continue
                        cols = [(f.name, _arrow_mysql_type(f.type)) for f in tbl.schema]
                        conn.send_packet(_enc_lenenc_int(len(cols)))
                        for name, ctype in cols:
                            nb = name.encode()
                            conn.send_packet(
                                _enc_lenenc_str(b"def") + _enc_lenenc_str(b"")
                                + _enc_lenenc_str(b"") + _enc_lenenc_str(b"")
                                + _enc_lenenc_str(nb) + _enc_lenenc_str(nb)
                                + b"\x0c" + struct.pack("<HIB", 33, 255, ctype)
                                + struct.pack("<HB", 0, 0) + b"\x00\x00")
                        conn.send_packet(b"\xfe\x00\x00\x02\x00")  # EOF
                        for d in tbl.to_pylist():
                            out = b""
                            for (name, ctype) in cols:
                                v = d[name]
                                if v is None:
                                    out += b"\xfb"
                                else:
                                    if ctype == T_TINY:
                                        v = 1 if v else 0
                                    out += _enc_lenenc_str(str(v).encode())
                            conn.send_packet(out)
                        conn.send_packet(b"\xfe\x00\x00\x02\x00")  # EOF
                except OSError:
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

    def _mysql_schema(self, table: str) -> tuple[list[tuple[str, int]], set]:
        """(ordered [(col, mysql type code)], pk set) for binlog events
        — the loopback emits the TINY/LONGLONG/DOUBLE/VARCHAR subset."""
        tbl = self._db.execute(f"SELECT * FROM {table} LIMIT 0").fetch_arrow_table()
        cols = [(f.name, _arrow_mysql_type(f.type)) for f in tbl.schema]
        cols = [
            (n, t if t in (T_TINY, T_LONGLONG, T_DOUBLE) else T_VAR_STRING)
            for n, t in cols
        ]
        info = self._db.execute(f"PRAGMA table_info('{table}')").fetchall()
        pks = {r[1] for r in info if r[5]}
        return cols, pks or {c for c, _ in cols}

    def _exec_dml_with_binlog(self, verb: str, table: str, sql: str) -> int:
        from risingwave_spark.sources.pgwire import duck_exec_dml_with_wal

        with self._dblock:
            cols, pks = self._mysql_schema(table)
            n, entries = duck_exec_dml_with_wal(
                self._db, verb, table, sql, [c for c, _ in cols], pks)
            self.binlog.extend(entries)
            return n

    def _serve_binlog(self, conn, pos: int) -> None:
        """COM_BINLOG_DUMP(NON_BLOCK): FORMAT_DESCRIPTION, then per
        pending entry a TABLE_MAP + ROWS event pair (v2, full
        included-column bitmaps, minimal before-images for U/D), then
        the EOF packet — the protocol's own caught-up signal."""
        with self._dblock:
            backlog = list(enumerate(self.binlog[pos:], start=pos + 1))
        fde = _event(FDE_EVENT, pos, struct.pack("<H", 4) + b"\x00" * 50
                     + struct.pack("<IB", 0, 19) + b"\x00" * 39)
        conn.send_packet(b"\x00" + fde)
        for next_pos, (table, op, key, new) in backlog:
            with self._dblock:
                cols, _pks = self._mysql_schema(table)
            table_id = 7  # single-table streams: a constant id is fine
            meta = b""
            for _n, ct in cols:
                if ct == T_VAR_STRING:
                    meta += struct.pack("<H", 65535)
                elif ct == T_DOUBLE:
                    meta += bytes([8])
            names_blob = b"".join(n.encode() + b"\x00" for n, _ in cols)
            tm_body = (
                table_id.to_bytes(6, "little") + struct.pack("<H", 1)
                + bytes([len(self.database)]) + self.database.encode() + b"\x00"
                + bytes([len(table)]) + table.encode() + b"\x00"
                + _lenenc(len(cols)) + bytes(ct for _n, ct in cols)
                + _enc_lenenc_str(meta)
                + names_blob
            )
            conn.send_packet(b"\x00" + _event(TABLE_MAP_EVENT, next_pos, tm_body))
            nb = _bitmap(len(cols))
            post = table_id.to_bytes(6, "little") + struct.pack("<HH", 1, 2)
            if op == "I":
                body = post + _lenenc(len(cols)) + nb + _row_image(cols, new)
                etype = WRITE_ROWS_V2
            elif op == "U":
                body = (post + _lenenc(len(cols)) + nb + nb
                        + _row_image(cols, key) + _row_image(cols, new))
                etype = UPDATE_ROWS_V2
            else:
                body = post + _lenenc(len(cols)) + nb + _row_image(cols, key)
                etype = DELETE_ROWS_V2
            conn.send_packet(b"\x00" + _event(etype, next_pos, body))
        conn.send_packet(b"\xfe\x00\x00\x02\x00")  # EOF: caught up

    def start(self) -> "LoopbackMysql":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


# ------------------------------------------------------------- binlog layer
# (mysql-cdc: the reference rides Debezium's binlog reader; this engine
# speaks the PUBLIC replication slice itself — dev.mysql.com "Replication
# Protocol": COM_BINLOG_DUMP with the NON_BLOCK flag, FORMAT_DESCRIPTION/
# TABLE_MAP/WRITE+UPDATE+DELETE_ROWS v2 events, EOF when caught up.)
FDE_EVENT = 15
TABLE_MAP_EVENT = 19
WRITE_ROWS_V2 = 30
UPDATE_ROWS_V2 = 31
DELETE_ROWS_V2 = 32

COM_BINLOG_DUMP = 0x12
BINLOG_DUMP_NON_BLOCK = 0x01


def _event(etype: int, log_pos: int, body: bytes) -> bytes:
    """19-byte v4 event header (LE): ts, type, server_id, size, pos, flags."""
    size = 19 + len(body)
    return (
        struct.pack("<IBIIIH", 0, etype, 1, size, log_pos, 0) + body
    )


def _lenenc(n: int) -> bytes:
    return _enc_lenenc_int(n)


def _bitmap(n: int, all_set: bool = True) -> bytes:
    nbytes = (n + 7) // 8
    if not all_set:
        return b"\x00" * nbytes
    out = bytearray(b"\xff" * nbytes)
    if n % 8:
        out[-1] = (1 << (n % 8)) - 1
    return bytes(out)


def _binlog_value(ctype: int, v) -> bytes:
    if ctype == T_TINY:
        return struct.pack("<b", 1 if v else 0)
    if ctype == T_LONGLONG:
        return struct.pack("<q", int(v))
    if ctype == T_DOUBLE:
        return struct.pack("<d", float(v))
    b = str(v).encode()
    return struct.pack("<H", len(b)) + b  # VARCHAR, 2-byte length


def _row_image(cols: list[tuple[str, int]], d: dict | None) -> bytes:
    """null-bitmap + packed non-null values for one row image; a
    missing dict entry is NULL (update before-images carry key cols
    only under minimal row image)."""
    nulls = bytearray((len(cols) + 7) // 8)
    vals = b""
    for i, (name, ctype) in enumerate(cols):
        v = None if d is None else d.get(name)
        if v is None:
            nulls[i // 8] |= 1 << (i % 8)
        else:
            vals += _binlog_value(ctype, v)
    return bytes(nulls) + vals


def _decode_row_image(buf: bytes, i: int, cols: list[tuple[str, int]]):
    nbytes = (len(cols) + 7) // 8
    nulls = buf[i:i + nbytes]
    i += nbytes
    out = {}
    for c, (name, ctype) in enumerate(cols):
        if nulls[c // 8] & (1 << (c % 8)):
            out[name] = None
            continue
        if ctype == T_TINY:
            out[name] = bool(struct.unpack_from("<b", buf, i)[0])
            i += 1
        elif ctype == T_LONGLONG:
            out[name] = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif ctype == T_DOUBLE:
            out[name] = struct.unpack_from("<d", buf, i)[0]
            i += 8
        else:  # VARCHAR with 2-byte length (metadata max_len 65535)
            (ln,) = struct.unpack_from("<H", buf, i)
            i += 2
            out[name] = buf[i:i + ln].decode()
            i += ln
    return out, i


class MySqlBinlogClient(MySqlWireClient):
    """Binlog consumer: COM_BINLOG_DUMP(NON_BLOCK) streams events from
    the requested position and EOFs when caught up — exactly the
    polling shape the connector needs; the engine stores the committed
    position durably, the same client-side-offset posture Debezium's
    mysql reader uses (mysql has no server-side consumer state)."""

    def binlog_dump(self, filename: str, pos: int, server_id: int = 1000):
        """→ yields ('I'|'U'|'D', table, before|None, after|None,
        next_pos) until the EOF packet (caught up)."""
        self.conn.seq = 0
        self.conn.send_packet(
            bytes([COM_BINLOG_DUMP])
            + struct.pack("<IHI", pos, BINLOG_DUMP_NON_BLOCK, server_id)
            + filename.encode()
        )
        tables: dict[int, dict] = {}
        while True:
            pkt = self.conn.read_packet()
            if pkt[0] == 0xFE and len(pkt) < 9:
                return  # EOF: caught up
            if pkt[0] == 0xFF:
                raise OSError(f"mysql error: {_err_packet(pkt)}")
            ev = pkt[1:]  # strip the 0x00 OK byte
            _ts, etype, _sid, _size, log_pos, _flags = struct.unpack_from(
                "<IBIIIH", ev, 0)
            body = ev[19:]
            if etype == TABLE_MAP_EVENT:
                table_id = int.from_bytes(body[0:6], "little")
                i = 8  # table_id(6) + flags(2)
                sl = body[i]
                i += 1 + sl + 1  # schema + NUL
                tl = body[i]
                tbl = body[i + 1:i + 1 + tl].decode()
                i += 1 + tl + 1
                ncols, i = _lenenc_int(body, i)
                ctypes = list(body[i:i + ncols])
                i += ncols
                meta, i = _lenenc_str(body, i)
                names_blob = body[i:]
                # column names ride a trailing NUL-joined blob (loopback
                # extension carrying what mysql exposes via metadata
                # queries; Debezium resolves names the same way —
                # out-of-band from the event stream)
                names = [
                    n.decode() for n in names_blob.split(b"\x00") if n
                ]
                tables[table_id] = {
                    "name": tbl,
                    "cols": list(zip(names, ctypes)),
                }
            elif etype in (WRITE_ROWS_V2, UPDATE_ROWS_V2, DELETE_ROWS_V2):
                table_id = int.from_bytes(body[0:6], "little")
                t = tables[table_id]
                i = 8
                (extra_len,) = struct.unpack_from("<H", body, i)
                i += extra_len  # extra_len counts its own two bytes
                ncols, i = _lenenc_int(body, i)
                nb = (ncols + 7) // 8
                i += nb  # included-columns bitmap (all set)
                if etype == UPDATE_ROWS_V2:
                    i += nb  # second bitmap
                    before, i = _decode_row_image(body, i, t["cols"])
                    after, i = _decode_row_image(body, i, t["cols"])
                    yield ("U", t["name"], before, after, log_pos)
                elif etype == WRITE_ROWS_V2:
                    after, i = _decode_row_image(body, i, t["cols"])
                    yield ("I", t["name"], None, after, log_pos)
                else:
                    before, i = _decode_row_image(body, i, t["cols"])
                    yield ("D", t["name"], before, None, log_pos)
            # FDE / ROTATE / XID: positioning noise for this consumer
