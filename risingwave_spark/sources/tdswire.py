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

import re
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
            _nodelay_connect((host, port), timeout=timeout))
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


#: sqlserver CDC __$operation codes (public: learn.microsoft.com
#: cdc.fn_cdc_get_all_changes): 1=delete 2=insert 3=update-before
#: 4=update-after
_CDC_DELETE, _CDC_INSERT, _CDC_UPDATE_AFTER = 1, 2, 4

_CDC_ENABLE_RX = re.compile(
    r"EXEC\s+sys\.sp_cdc_enable_table\s+@source_schema\s*=\s*N?'(\w+)'\s*,"
    r"\s*@source_name\s*=\s*N?'(\w+)'", re.I)
_CDC_MAX_LSN_RX = re.compile(
    r"^\s*SELECT\s+sys\.fn_cdc_get_max_lsn\(\)", re.I)
_CDC_CHANGES_RX = re.compile(
    r"FROM\s+cdc\.fn_cdc_get_all_changes_(\w+)\s*\(\s*(\d+)\s*,\s*(\d+)"
    r"\s*,\s*N?'all'\s*\)", re.I)
_DML_RX = re.compile(
    r"^\s*(INSERT\s+INTO|UPDATE|DELETE\s+FROM)\s+(\w+)", re.I)


def _split_tsql(batch: str) -> list[str]:
    """Split a T-SQL batch on semicolons outside string literals."""
    out, cur, in_str = [], [], False
    for ch in batch:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
        else:
            cur.append(ch)
    s = "".join(cur).strip()
    if s:
        out.append(s)
    return out


class LoopbackSqlServer:
    """DuckDB answering over genuine TDS framing and token streams,
    with real LOGIN7 credential verification.

    CDC surface (the Debezium/reference polling contract —
    `src/connector/src/source/cdc/external/sql_server.rs`): after
    `EXEC sys.sp_cdc_enable_table @source_schema=..., @source_name=...`
    every DML on that table is captured into a change table; clients
    poll `SELECT sys.fn_cdc_get_max_lsn()` and read
    `cdc.fn_cdc_get_all_changes_<schema>_<table>(from, to, 'all')`
    getting __$start_lsn/__$seqval/__$operation + the row image.
    Divergences, documented: LSNs are integers rendered in decimal
    (real SQL Server: binary(10) hex) and 'all' mode only — updates
    appear as a single operation-4 after-image (no operation-3 before
    row); deletes carry the full before row, as real change tables
    do."""

    def __init__(self, user: str = "sa", password: str = "fedpw",
                 database: str = "fedb", host: str = "127.0.0.1",
                 port: int = 0):
        import duckdb

        self.user, self.password, self.database = user, password, database
        self._db = duckdb.connect()
        self._dblock = threading.Lock()
        #: capture instance ("schema_table") → source table name
        self.cdc_captures: dict[str, str] = {}
        #: capture instance → [(lsn, seqval, op, row_dict)]
        self.cdc_changes: dict[str, list] = {}
        self._lsn = 0
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
                # ---- CDC surface (intercepted before DuckDB) --------
                m = _CDC_ENABLE_RX.search(sql)
                if m:
                    cap = f"{m.group(1)}_{m.group(2)}"
                    with server._dblock:
                        server.cdc_captures[cap] = m.group(2)
                        server.cdc_changes.setdefault(cap, [])
                    return (bytes([_TOK_DONE])
                            + struct.pack("<HHQ", 0x10, 0, 0))
                if _CDC_MAX_LSN_RX.match(sql):
                    with server._dblock:
                        return self._result(["lsn"], [(server._lsn,)])
                m = _CDC_CHANGES_RX.search(sql)
                if m:
                    cap, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
                    with server._dblock:
                        if cap not in server.cdc_captures:
                            return self._error(
                                313, f"capture instance {cap!r} is not "
                                "enabled (sp_cdc_enable_table)")
                        table = server.cdc_captures[cap]
                        names = [d[0] for d in server._db.execute(
                            f"SELECT * FROM {table} LIMIT 0").description]
                        hdr = ["__$start_lsn", "__$seqval", "__$operation"]
                        rows = [
                            tuple([lsn, seq, op] + [row.get(n) for n in names])
                            for lsn, seq, op, row in server.cdc_changes[cap]
                            if lo <= lsn <= hi
                        ]
                    return self._result(hdr + names, rows)
                # DML on a CDC-enabled table: capture change images the
                # way the real server's capture job would (multi-
                # statement batches split so each statement captures)
                if server.cdc_captures:
                    stmts = _split_tsql(sql)
                    if len(stmts) > 1:
                        res = b""
                        for s in stmts:
                            res = self._run(s)
                            if res[:1] == bytes([_TOK_ERROR]):
                                return res
                        return res
                    md = _DML_RX.match(sql)
                    if md:
                        tbl = md.group(2)
                        caps = [c for c, t in server.cdc_captures.items()
                                if t == tbl]
                        if caps:
                            return self._run_dml_cdc(
                                md.group(1).split()[0].upper(), tbl,
                                sql, caps)
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
                return self._result([c for c, _t in cols], out)

            def _run_dml_cdc(self, verb: str, table: str, sql: str,
                             caps: list[str]) -> bytes:
                from risingwave_spark.sources.pgwire import (
                    duck_exec_dml_with_wal,
                )

                with server._dblock:
                    try:
                        names = [d[0] for d in server._db.execute(
                            f"SELECT * FROM {table} LIMIT 0").description]
                        info = server._db.execute(
                            f"PRAGMA table_info('{table}')").fetchall()
                        pks = {r[1] for r in info if r[5]} or set(names)
                        if verb == "DELETE":
                            # real change tables store the FULL before
                            # row for deletes — capture it before the
                            # delete applies
                            mw = re.search(r"\bWHERE\b(.*)$", sql,
                                           re.I | re.S)
                            where = (f" WHERE {mw.group(1)}" if mw
                                     else "")
                            old = server._db.execute(
                                f"SELECT * FROM {table}{where}"
                            ).fetch_arrow_table().to_pylist()
                            server._db.execute(sql)
                            n = len(old)
                            entries = [
                                (table, "D",
                                 {k: d.get(k) for k in pks}, dict(d))
                                for d in old
                            ]
                        else:
                            n, entries = duck_exec_dml_with_wal(
                                server._db, verb, table, sql, names, pks)
                    except Exception as e:  # noqa: BLE001
                        return self._error(50000, str(e))
                    server._lsn += 1
                    for seq, (_tbl, op, key, new) in enumerate(entries):
                        code = {"I": _CDC_INSERT, "U": _CDC_UPDATE_AFTER,
                                "D": _CDC_DELETE}[op]
                        row = new if new is not None else dict(key)
                        for cap in caps:
                            server.cdc_changes[cap].append(
                                (server._lsn, seq, code, row))
                return (bytes([_TOK_DONE])
                        + struct.pack("<HHQ", 0x10, 0, n))

            def _result(self, names: list[str], out: list) -> bytes:
                types = []
                meta = bytes([_TOK_COLMETADATA]) + struct.pack(
                    "<H", len(names))
                for ci, cname in enumerate(names):
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
            def process_request(self, request, client_address):
                # TCP_NODELAY on the accept side too: reply bytes must
                # not sit in Nagle's buffer waiting for a delayed ACK
                request.setsockopt(
                    socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                super().process_request(request, client_address)
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


class SqlServerCdcReader:
    """Client side of the SQL Server CDC polling contract (reference
    `src/connector/src/source/cdc/mod.rs:54` SqlServer +
    `source/cdc/external/` — Debezium's SQL Server connector polls the
    same three statements): enable capture, poll the max LSN, read the
    change-table window since the saved LSN. Operations map per the
    public cdc.fn_cdc_get_all_changes contract: 2=insert and 4=update
    after-image → upsert, 1=delete → tombstone (3, the update
    before-image, is only emitted in 'all update old' mode, which this
    reader does not request)."""

    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, schema: str, table: str):
        self.client = TdsClient(host, port, user, password, database)
        self.capture = f"{schema}_{table}"
        self.schema, self.table = schema, table

    def enable(self) -> None:
        """EXEC sys.sp_cdc_enable_table — idempotent on the loopback
        (a real server errors if already enabled; callers catch)."""
        self.client.query(
            f"EXEC sys.sp_cdc_enable_table @source_schema = "
            f"N'{self.schema}', @source_name = N'{self.table}', "
            f"@role_name = NULL"
        )

    def max_lsn(self) -> int:
        _cols, rows = self.client.query(
            "SELECT sys.fn_cdc_get_max_lsn() AS lsn")
        return int(rows[0][0] or 0)

    def snapshot(self) -> tuple[list[str], list[list]]:
        return self.client.query(f"SELECT * FROM {self.table}")

    def changes(self, from_lsn: int, to_lsn: int):
        """Change rows with from_lsn < lsn <= to_lsn →
        [(lsn, seqval, op_code, row_dict)] ordered by (lsn, seqval)."""
        if to_lsn <= from_lsn:
            return []
        cols, rows = self.client.query(
            f"SELECT * FROM cdc.fn_cdc_get_all_changes_{self.capture}"
            f"({from_lsn + 1}, {to_lsn}, N'all') "
            "ORDER BY __$start_lsn, __$seqval"
        )
        out = []
        for r in rows:
            d = dict(zip(cols, r))
            lsn = int(d.pop("__$start_lsn"))
            seq = int(d.pop("__$seqval"))
            op = int(d.pop("__$operation"))
            out.append((lsn, seq, op, d))
        out.sort(key=lambda x: (x[0], x[1]))
        return out

    def close(self) -> None:
        self.client.close()
