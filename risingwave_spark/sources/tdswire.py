"""Pure-stdlib SQL Server TDS client + loopback server (reference
`src/connector/src/sink/sqlserver.rs`: the sqlserver sink speaks TDS
via the tiberius crate; this module implements the PUBLIC [MS-TDS]
protocol directly — microsoft.com/openspecs MS-TDS).

Client flow: PRELOGIN (version + ENCRYPT_NOT_SUP) → LOGIN7 (TDS 7.4,
UCS-2 fields, the spec's password obfuscation: nibble-swap XOR 0xA5)
→ LOGINACK/DONE → SQLBatch (ALL_HEADERS + UCS-2 SQL text) →
COLMETADATA/ROW/DONE token stream (ERROR tokens raise with the
server's message). Types decoded: INTN (nullable int), FLTN
(nullable float8), NVARCHAR (USHORT byte-length, 0xFFFF NULL), BITN.

`LoopbackSqlServer` is the in-sandbox stand-in: genuine TDS framing
and token streams over an embedded DuckDB — it VERIFIES the LOGIN7
credentials (unscrambling the password exactly as a real server
does), so wrong passwords are rejected on the wire. T-SQL MERGE is
not in DuckDB's dialect, so the sink's upsert applies as
DELETE+INSERT per event (same effect; divergence documented on
_SqlServerSink).
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

# token ids
_TOK_COLMETADATA = 0x81
_TOK_ERROR = 0xAA
_TOK_LOGINACK = 0xAD
_TOK_ROW = 0xD1
_TOK_DONE = 0xFD
# type ids
_T_INTN = 0x26
_T_FLTN = 0x6D
_T_BITN = 0x68
_T_NVARCHAR = 0xE7


def _ucs2(s: str) -> bytes:
    return s.encode("utf-16-le")


def scramble_password(password: str) -> bytes:
    """LOGIN7 password obfuscation ([MS-TDS] §2.2.6.4): per UCS-2
    byte, swap the nibbles then XOR with 0xA5."""
    out = bytearray()
    for b in _ucs2(password):
        out.append((((b & 0x0F) << 4) | (b >> 4)) ^ 0xA5)
    return bytes(out)


def unscramble_password(data: bytes) -> str:
    raw = bytearray()
    for b in data:
        x = b ^ 0xA5
        raw.append(((x & 0x0F) << 4) | (x >> 4))
    return bytes(raw).decode("utf-16-le")


class _Tds:
    """Message framing shared by both ends: 8-byte packet header
    (type, status EOM, BE length). Outgoing messages are split into
    packets of the negotiated size (MS-TDS 2.2.3.1.3: a message is a
    sequence of packets, EOM status set only on the last) — the >H
    length field caps a single packet at 65,535 bytes, and a real
    server rejects packets over the LOGIN7-negotiated size anyway."""

    #: negotiated packet size (LOGIN7 requests 4096; servers echo it)
    PACKET_SIZE = 4096

    def __init__(self, sock):
        self.sock = sock
        self._buf = b""

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("tds connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_message(self) -> tuple[int, bytes]:
        payload = b""
        while True:
            hdr = self._read_exact(8)
            ptype, status = hdr[0], hdr[1]
            (ln,) = struct.unpack(">H", hdr[2:4])
            payload += self._read_exact(ln - 8)
            if status & 0x01:  # EOM
                return ptype, payload

    def send_message(self, ptype: int, payload: bytes) -> None:
        body_max = self.PACKET_SIZE - 8
        out = bytearray()
        view = memoryview(payload)
        off = 0
        while True:
            chunk = view[off:off + body_max]
            off += len(chunk)
            eom = 0x01 if off >= len(payload) else 0x00
            out += bytes([ptype, eom])
            out += struct.pack(">H", len(chunk) + 8)
            out += b"\x00\x00\x00\x00"
            out += chunk
            if eom:
                break
        self.sock.sendall(bytes(out))


def _b_varchar(s: str) -> bytes:
    return bytes([len(s)]) + _ucs2(s)


def _us_varchar(s: str) -> bytes:
    return struct.pack("<H", len(s)) + _ucs2(s)


class TdsClient:
    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, timeout: float = 10.0):
        self.conn = _Tds(
            socket.create_connection((host, port), timeout=timeout))
        # PRELOGIN: VERSION + ENCRYPTION(NOT_SUP) option table
        opts = [(0x00, b"\x0c\x00\x00\x00\x00\x00"), (0x01, b"\x02")]
        head_len = 5 * len(opts) + 1
        off, head, data = head_len, b"", b""
        for tok, d in opts:
            head += bytes([tok]) + struct.pack(">HH", off, len(d))
            off += len(d)
            data += d
        self.conn.send_message(0x12, head + b"\xff" + data)
        self.conn.read_message()  # server prelogin echo
        # LOGIN7
        fixed_after_len = (
            struct.pack("<I", 0x74000004)      # TDS 7.4
            + struct.pack("<I", 4096)          # packet size
            + struct.pack("<I", 0)             # client prog ver
            + struct.pack("<I", 1)             # pid
            + struct.pack("<I", 0)             # connection id
            + bytes([0x00, 0x00, 0x00, 0x00])  # option/type flags
            + struct.pack("<i", 0)             # client tz
            + struct.pack("<I", 0x409)         # lcid
        )
        var_fields = [
            ("rw-host", _ucs2), (user, _ucs2),
            (password, lambda s: scramble_password(s)),
            ("risingwave_spark", _ucs2), (host, _ucs2),
            ("", _ucs2),  # unused/extension
            ("rw-tds", _ucs2), ("us_english", _ucs2), (database, _ucs2),
        ]
        # offsets table: 9 string pairs + clientID(6) + SSPI + AtchDB
        # + ChangePassword + cbSSPILong
        table_len = 9 * 4 + 6 + 4 + 4 + 4 + 4
        data_off = 4 + len(fixed_after_len) + table_len
        table, blob = b"", b""
        for s, enc in var_fields:
            d = enc(s)
            table += struct.pack("<HH", data_off + len(blob), len(s))
            blob += d
        table += b"\x01\x02\x03\x04\x05\x06"        # client mac
        table += struct.pack("<HH", data_off + len(blob), 0)  # SSPI
        table += struct.pack("<HH", data_off + len(blob), 0)  # AtchDB
        table += struct.pack("<HH", data_off + len(blob), 0)  # ChangePwd
        table += struct.pack("<I", 0)                # cbSSPILong
        body = fixed_after_len + table + blob
        self.conn.send_message(
            0x10, struct.pack("<I", len(body) + 4) + body)
        self._parse_tokens(self.conn.read_message()[1])  # LOGINACK/ERROR

    # ------------------------------------------------------------ query
    def query(self, sql: str) -> tuple[list[str], list[list]]:
        headers = (
            struct.pack("<I", 22) + struct.pack("<I", 18)
            + struct.pack("<H", 2) + b"\x00" * 8 + struct.pack("<I", 1)
        )
        self.conn.send_message(0x01, headers + _ucs2(sql))
        return self._parse_tokens(self.conn.read_message()[1])

    def _parse_tokens(self, buf: bytes) -> tuple[list[str], list[list]]:
        i, cols, types, rows = 0, [], [], []
        while i < len(buf):
            tok = buf[i]
            i += 1
            if tok == _TOK_LOGINACK:
                (ln,) = struct.unpack_from("<H", buf, i)
                i += 2 + ln
            elif tok == _TOK_DONE:
                i += 12  # status, curcmd, 8-byte rowcount (TDS 7.2+)
            elif tok == _TOK_ERROR:
                (ln,) = struct.unpack_from("<H", buf, i)
                body = buf[i + 2:i + 2 + ln]
                (nchars,) = struct.unpack_from("<H", body, 6)
                msg = body[8:8 + nchars * 2].decode("utf-16-le")
                raise OSError(f"sqlserver error: {msg}")
            elif tok == _TOK_COLMETADATA:
                (n,) = struct.unpack_from("<H", buf, i)
                i += 2
                for _ in range(n):
                    i += 4 + 2  # usertype (7.2+), flags
                    t = buf[i]
                    i += 1
                    if t in (_T_INTN, _T_FLTN, _T_BITN):
                        i += 1  # max len
                    elif t == _T_NVARCHAR:
                        i += 2 + 5  # maxlen + collation
                    else:
                        raise OSError(f"unsupported TDS type 0x{t:x}")
                    types.append(t)
                    nl = buf[i]
                    i += 1
                    cols.append(buf[i:i + nl * 2].decode("utf-16-le"))
                    i += nl * 2
            elif tok == _TOK_ROW:
                row = []
                for t in types:
                    if t in (_T_INTN, _T_FLTN, _T_BITN):
                        ln = buf[i]
                        i += 1
                        if ln == 0:
                            row.append(None)
                        elif t == _T_INTN:
                            row.append(int.from_bytes(
                                buf[i:i + ln], "little", signed=True))
                            i += ln
                        elif t == _T_BITN:
                            row.append(bool(buf[i]))
                            i += ln
                        else:
                            (v,) = struct.unpack_from("<d", buf, i)
                            row.append(v)
                            i += ln
                    else:  # NVARCHAR
                        (bl,) = struct.unpack_from("<H", buf, i)
                        i += 2
                        if bl == 0xFFFF:
                            row.append(None)
                        else:
                            row.append(buf[i:i + bl].decode("utf-16-le"))
                            i += bl
                rows.append(row)
            else:
                raise OSError(f"unexpected TDS token 0x{tok:x}")
        return cols, rows

    def close(self) -> None:
        try:
            self.conn.sock.close()
        except OSError:
            pass


class LoopbackSqlServer:
    """DuckDB answering over genuine TDS framing and token streams,
    with real LOGIN7 credential verification."""

    def __init__(self, user: str = "sa", password: str = "fedpw",
                 database: str = "fedb", host: str = "127.0.0.1",
                 port: int = 0):
        import duckdb

        self.user, self.password, self.database = user, password, database
        self._db = duckdb.connect()
        self._dblock = threading.Lock()
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                conn = _Tds(self.request)
                try:
                    ptype, _payload = conn.read_message()
                    if ptype != 0x12:
                        return
                    # echo a minimal PRELOGIN: VERSION + ENCRYPT_NOT_SUP
                    opts = [(0x00, b"\x0c\x00\x07\xd0\x00\x00"),
                            (0x01, b"\x02")]
                    off = 5 * len(opts) + 1
                    head, data = b"", b""
                    for tok, d in opts:
                        head += bytes([tok]) + struct.pack(
                            ">HH", off, len(d))
                        off += len(d)
                        data += d
                    conn.send_message(0x04, head + b"\xff" + data)
                    ptype, payload = conn.read_message()
                    if ptype != 0x10 or not self._check_login(payload):
                        conn.send_message(0x04, self._error(
                            18456, "Login failed for user"))
                        return
                    ack_body = (
                        b"\x01" + struct.pack("<I", 0x74000004)
                        + _b_varchar("rw-loopback")
                        + b"\x00\x00\x00\x01"
                    )
                    ack = (bytes([_TOK_LOGINACK])
                           + struct.pack("<H", len(ack_body)) + ack_body)
                    done = (bytes([_TOK_DONE])
                            + struct.pack("<HHQ", 0, 0, 0))
                    conn.send_message(0x04, ack + done)
                    while True:
                        ptype, payload = conn.read_message()
                        if ptype != 0x01:
                            return
                        (hlen,) = struct.unpack_from("<I", payload, 0)
                        sql = payload[hlen:].decode("utf-16-le")
                        conn.send_message(0x04, self._run(sql))
                except OSError:
                    return

            def _check_login(self, payload: bytes) -> bool:
                # fixed part: 4 len + 24 fixed + lcid4 = offset table at 36
                base = 36
                offs = []
                for k in range(9):
                    o, ln = struct.unpack_from("<HH", payload, base + k * 4)
                    offs.append((o, ln))
                # ibOffsets are from the start of the LOGIN7 message,
                # which includes the leading Length DWORD — exactly how
                # the client computed data_off
                uoff, ulen = offs[1]
                poff, plen = offs[2]
                user_in = payload[uoff:uoff + ulen * 2].decode("utf-16-le")
                pw_in = unscramble_password(payload[poff:poff + plen * 2])
                return (user_in == server.user
                        and pw_in == server.password)

            @staticmethod
            def _error(num: int, msg: str) -> bytes:
                body = (struct.pack("<iBB", num, 1, 14)
                        + _us_varchar(msg) + _b_varchar("rw-loopback")
                        + _b_varchar("") + struct.pack("<i", 1))
                return (bytes([_TOK_ERROR])
                        + struct.pack("<H", len(body)) + body
                        + bytes([_TOK_DONE])
                        + struct.pack("<HHQ", 0x02, 0, 0))

            def _run(self, sql: str) -> bytes:
                with server._dblock:
                    try:
                        cur = server._db.execute(sql)
                        if cur.description:
                            out = cur.fetchall()
                            cols = [
                                (d[0], str(d[1])) for d in cur.description
                            ]
                        else:
                            out, cols = [], []
                    except Exception as e:  # noqa: BLE001
                        return self._error(50000, str(e))
                if not cols:
                    return (bytes([_TOK_DONE])
                            + struct.pack("<HHQ", 0x10, 0, 0))
                types = []
                meta = bytes([_TOK_COLMETADATA]) + struct.pack(
                    "<H", len(cols))
                for ci, (cname, _duck_t) in enumerate(cols):
                    # duckdb's DBAPI reports generic names ("NUMBER");
                    # type from the first non-NULL value instead
                    sample = next(
                        (r[ci] for r in out if r[ci] is not None), None)
                    if isinstance(sample, bool):
                        tds_t, info = _T_BITN, bytes([_T_BITN, 1])
                    elif isinstance(sample, int):
                        tds_t, info = _T_INTN, bytes([_T_INTN, 8])
                    elif isinstance(sample, float):
                        tds_t, info = _T_FLTN, bytes([_T_FLTN, 8])
                    else:
                        tds_t = _T_NVARCHAR
                        info = (bytes([_T_NVARCHAR])
                                + struct.pack("<H", 8000)
                                + b"\x09\x04\x00\x00\x00")
                    types.append(tds_t)
                    meta += (struct.pack("<IH", 0, 0) + info
                             + _b_varchar(cname))
                rows = b""
                for r in out:
                    rows += bytes([_TOK_ROW])
                    for t, v in zip(types, r):
                        if t == _T_INTN:
                            rows += (b"\x00" if v is None else
                                     b"\x08" + int(v).to_bytes(
                                         8, "little", signed=True))
                        elif t == _T_FLTN:
                            rows += (b"\x00" if v is None else
                                     b"\x08" + struct.pack("<d", float(v)))
                        elif t == _T_BITN:
                            rows += (b"\x00" if v is None else
                                     b"\x01" + bytes([1 if v else 0]))
                        else:
                            if v is None:
                                rows += b"\xff\xff"
                            else:
                                d = _ucs2(str(v))
                                rows += struct.pack("<H", len(d)) + d
                done = (bytes([_TOK_DONE])
                        + struct.pack("<HHQ", 0x10, 0, len(out)))
                return meta + rows + done

        class Server(socketserver.ThreadingTCPServer):
            daemon_threads = True
            allow_reuse_address = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def seed(self, sql: str) -> None:
        with self._dblock:
            self._db.execute(sql)

    def rows(self, table: str) -> list[tuple]:
        with self._dblock:
            return self._db.execute(
                f"SELECT * FROM {table}").fetchall()

    def start(self) -> "LoopbackSqlServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
