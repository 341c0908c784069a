"""Hive Metastore catalog for Iceberg — client + loopback over the
REAL Thrift binary protocol (PUBLIC specs: thrift.apache.org
TBinaryProtocol; the HMS IDL `hive_metastore.thrift` shipped with
Apache Hive).

Reference parity: `src/connector/src/connector_common/iceberg/mod.rs`
catalog.type='hive' (iceberg-rust HmsCatalog). The Iceberg-on-Hive
contract implemented here is the real one: the table's `parameters`
map carries `metadata_location`; a writer commits under the
metastore's table LOCK (lock → alter_table → unlock — the
HiveCatalog commit sequence), so concurrent committers serialize on
the server exactly as with a real HMS.

The codec is a generic TBinaryProtocol reader/writer (strict
version headers, struct/map/list field framing, unknown-field skip),
so the client parses real HMS replies — it extracts what it needs
(tableName/dbName/parameters) and skips StorageDescriptor & friends
field-by-field per the thrift skipping rules.
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


# thrift type ids
T_STOP, T_BOOL, T_BYTE, T_DOUBLE = 0, 2, 3, 4
T_I16, T_I32, T_I64, T_STRING = 6, 8, 10, 11
T_STRUCT, T_MAP, T_SET, T_LIST = 12, 13, 14, 15
_VERSION = 0x80010000
M_CALL, M_REPLY, M_EXCEPTION = 1, 2, 3


class _Proto:
    """TBinaryProtocol over a socket (strict write, strict read)."""

    def __init__(self, sock):
        self.sock = sock
        self._buf = b""
        self._out = bytearray()

    # ------------------------------------------------------------ read
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("thrift connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_i32(self) -> int:
        return struct.unpack(">i", self._read_exact(4))[0]

    def read_message_begin(self) -> tuple[str, int, int]:
        size = self.read_i32()
        if size >= 0:
            raise OSError("unframed thrift without strict header")
        mtype = size & 0xFF
        ln = self.read_i32()
        name = self._read_exact(ln).decode()
        seq = self.read_i32()
        return name, mtype, seq

    def read_field(self) -> tuple[int, int]:
        t = self._read_exact(1)[0]
        if t == T_STOP:
            return T_STOP, 0
        (fid,) = struct.unpack(">h", self._read_exact(2))
        return t, fid

    def read_value(self, t: int):
        if t == T_BOOL:
            return bool(self._read_exact(1)[0])
        if t == T_BYTE:
            return self._read_exact(1)[0]
        if t == T_DOUBLE:
            return struct.unpack(">d", self._read_exact(8))[0]
        if t == T_I16:
            return struct.unpack(">h", self._read_exact(2))[0]
        if t == T_I32:
            return self.read_i32()
        if t == T_I64:
            return struct.unpack(">q", self._read_exact(8))[0]
        if t == T_STRING:
            return self._read_exact(self.read_i32()).decode(
                errors="replace")
        if t == T_STRUCT:
            out = {}
            while True:
                ft, fid = self.read_field()
                if ft == T_STOP:
                    return out
                out[fid] = self.read_value(ft)
        if t == T_MAP:
            kt, vt = self._read_exact(1)[0], self._read_exact(1)[0]
            n = self.read_i32()
            return {
                self.read_value(kt): self.read_value(vt) for _ in range(n)
            }
        if t in (T_LIST, T_SET):
            et = self._read_exact(1)[0]
            n = self.read_i32()
            return [self.read_value(et) for _ in range(n)]
        raise OSError(f"unsupported thrift type {t}")

    # ----------------------------------------------------------- write
    def w(self, b: bytes) -> None:
        self._out += b

    def write_message_begin(self, name: str, mtype: int, seq: int) -> None:
        self.w(struct.pack(">I", _VERSION | mtype))
        self.write_string(name)
        self.w(struct.pack(">i", seq))

    def write_string(self, s: str) -> None:
        b = s.encode()
        self.w(struct.pack(">i", len(b)) + b)

    def write_field(self, t: int, fid: int) -> None:
        self.w(bytes([t]) + struct.pack(">h", fid))

    def write_stop(self) -> None:
        self.w(b"\x00")

    def write_map_begin(self, kt: int, vt: int, n: int) -> None:
        self.w(bytes([kt, vt]) + struct.pack(">i", n))

    def flush(self) -> None:
        self.sock.sendall(bytes(self._out))
        self._out = bytearray()


def _write_table_struct(p: _Proto, db: str, name: str,
                        parameters: dict) -> None:
    """HMS Table struct — the fields this engine carries: 1 tableName,
    2 dbName, 9 parameters (the full IDL has many more; readers skip)."""
    p.write_field(T_STRING, 1)
    p.write_string(name)
    p.write_field(T_STRING, 2)
    p.write_string(db)
    p.write_field(T_MAP, 9)
    p.write_map_begin(T_STRING, T_STRING, len(parameters))
    for k, v in parameters.items():
        p.write_string(k)
        p.write_string(v)
    p.write_stop()


class HmsClient:
    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.p = _Proto(
            _nodelay_connect((host, port), timeout=timeout))
        self._seq = 0

    def _call(self, method: str, write_args) -> dict:
        self._seq += 1
        p = self.p
        p.write_message_begin(method, M_CALL, self._seq)
        write_args(p)
        p.write_stop()  # args struct end
        p.flush()
        name, mtype, _seq = p.read_message_begin()
        if mtype == M_EXCEPTION:
            exc = p.read_value(T_STRUCT)
            raise OSError(f"hms {method}: {exc.get(1, exc)}")
        result = p.read_value(T_STRUCT)
        # thrift convention: field 0 = success; fields 1.. = declared
        # exceptions
        for fid, v in result.items():
            if fid != 0:
                msg = v.get(1, v) if isinstance(v, dict) else v
                raise OSError(f"hms {method}: {msg}")
        return result.get(0, {})

    def get_table(self, db: str, name: str) -> dict:
        def args(p):
            p.write_field(T_STRING, 1)
            p.write_string(db)
            p.write_field(T_STRING, 2)
            p.write_string(name)

        return self._call("get_table", args)

    def create_table(self, db: str, name: str, parameters: dict) -> None:
        def args(p):
            p.write_field(T_STRUCT, 1)
            _write_table_struct(p, db, name, parameters)

        self._call("create_table", args)

    def alter_table(self, db: str, name: str, parameters: dict) -> None:
        def args(p):
            p.write_field(T_STRING, 1)
            p.write_string(db)
            p.write_field(T_STRING, 2)
            p.write_string(name)
            p.write_field(T_STRUCT, 3)
            _write_table_struct(p, db, name, parameters)

        self._call("alter_table", args)

    def lock(self, db: str, name: str) -> int:
        """LockRequest{1: components[LockComponent{1: type EXCLUSIVE=3,
        2: level TABLE=2, 3: dbname, 4: tablename}], 2: user, 3: host}
        → LockResponse{1: lockid, 2: state}."""
        def args(p):
            p.write_field(T_STRUCT, 1)  # LockRequest
            p.write_field(T_LIST, 1)
            p.w(bytes([T_STRUCT]) + struct.pack(">i", 1))
            p.write_field(T_I32, 1)
            p.w(struct.pack(">i", 3))  # EXCLUSIVE
            p.write_field(T_I32, 2)
            p.w(struct.pack(">i", 2))  # TABLE
            p.write_field(T_STRING, 3)
            p.write_string(db)
            p.write_field(T_STRING, 4)
            p.write_string(name)
            p.write_stop()  # LockComponent
            p.write_field(T_STRING, 2)
            p.write_string("rw")
            p.write_field(T_STRING, 3)
            p.write_string("localhost")
            p.write_stop()  # LockRequest

        resp = self._call("lock", args)
        if resp.get(2) != 1:  # ACQUIRED
            raise OSError(f"hms lock not acquired: state {resp.get(2)}")
        return resp[1]

    def unlock(self, lockid: int) -> None:
        def args(p):
            p.write_field(T_STRUCT, 1)  # UnlockRequest
            p.write_field(T_I64, 1)
            p.w(struct.pack(">q", lockid))
            p.write_stop()

        self._call("unlock", args)

    def close(self) -> None:
        try:
            self.p.sock.close()
        except OSError:
            pass


class LoopbackHms:
    """The metastore: genuine TBinaryProtocol service holding Table
    parameter maps, with EXCLUSIVE table locks serializing committers
    (one live lock per table; a second lock() call blocks until
    unlock — the mutual exclusion a real HMS provides)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.tables: dict[tuple, dict] = {}  # (db, name) -> parameters
        self.locks: dict[tuple, int] = {}    # (db, name) -> lockid
        self._next_lock = 100
        self._lock = threading.Condition()
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                p = _Proto(self.request)
                try:
                    while True:
                        name, _mtype, seq = p.read_message_begin()
                        args = p.read_value(T_STRUCT)
                        try:
                            result = server._serve(name, args)
                            p.write_message_begin(name, M_REPLY, seq)
                            self._write_result(p, result)
                        except _HmsError as e:
                            p.write_message_begin(name, M_REPLY, seq)
                            p.write_field(T_STRUCT, 1)
                            p.write_field(T_STRING, 1)
                            p.write_string(str(e))
                            p.write_stop()
                            p.write_stop()
                        p.flush()
                except OSError:
                    return

            @staticmethod
            def _write_result(p: _Proto, result) -> None:
                if result is None:
                    p.write_stop()
                    return
                kind, payload = result
                if kind == "table":
                    db, name, params = payload
                    p.write_field(T_STRUCT, 0)
                    _write_table_struct(p, db, name, params)
                elif kind == "lock":
                    p.write_field(T_STRUCT, 0)
                    p.write_field(T_I64, 1)
                    p.w(struct.pack(">q", payload))
                    p.write_field(T_I32, 2)
                    p.w(struct.pack(">i", 1))  # ACQUIRED
                    p.write_stop()
                p.write_stop()

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

    def _serve(self, method: str, args: dict):
        if method == "get_table":
            key = (args[1], args[2])
            with self._lock:
                if key not in self.tables:
                    raise _HmsError(f"table {key} not found")
                return "table", (key[0], key[1], dict(self.tables[key]))
        if method == "create_table":
            tbl = args[1]
            key = (tbl[2], tbl[1])
            with self._lock:
                if key in self.tables:
                    raise _HmsError(f"table {key} already exists")
                self.tables[key] = dict(tbl.get(9, {}))
            return None
        if method == "alter_table":
            key = (args[1], args[2])
            tbl = args[3]
            with self._lock:
                if key not in self.tables:
                    raise _HmsError(f"table {key} not found")
                self.tables[key] = dict(tbl.get(9, {}))
            return None
        if method == "lock":
            req = args[1]
            comp = req[1][0]
            key = (comp[3], comp[4])
            with self._lock:
                while key in self.locks:
                    self._lock.wait(timeout=10)
                self._next_lock += 1
                self.locks[key] = self._next_lock
                return "lock", self._next_lock
        if method == "unlock":
            lockid = args[1][1]
            with self._lock:
                for k, v in list(self.locks.items()):
                    if v == lockid:
                        del self.locks[k]
                self._lock.notify_all()
            return None
        raise _HmsError(f"unknown method {method!r}")

    def start(self) -> "LoopbackHms":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class _HmsError(Exception):
    pass
