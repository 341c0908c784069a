"""OLAP-store HTTP sink layer: ClickHouse (the public HTTP interface)
and Doris/StarRocks (the public Stream Load API).

Reference parity:

* `src/connector/src/sink/clickhouse.rs` — options clickhouse.url/
  user/password/database/table (+ clickhouse.delete.column for the
  ReplacingMergeTree upsert posture). The reference drives the
  clickhouse crate (HTTP under the hood); here the HTTP interface is
  spoken directly: `POST /?query=INSERT INTO db.t FORMAT JSONEachRow`
  with JSON-lines body, credentials in the documented
  X-ClickHouse-User / X-ClickHouse-Key headers (VERIFIED by the
  loopback).
* `src/connector/src/sink/doris.rs`, `starrocks.rs`,
  `doris_starrocks_connector.rs:249` — Stream Load:
  `PUT {url}/api/{db}/{table}/_stream_load`, Basic auth, a unique
  label per load, JSON-lines rows carrying the delete sign
  (`__DORIS_DELETE_SIGN__` doris — doris_starrocks_connector.rs:37;
  `__op` starrocks — :38): 0 = upsert, 1 = delete, applied by the
  primary-key table model.

The loopbacks are the in-sandbox stand-ins: LoopbackClickHouse
executes on an embedded DuckDB; LoopbackStreamLoad keeps a
pk-keyed store and applies the delete signs exactly as a
primary-key-model table does, so tests reconstruct the final state
from what actually crossed the wire.
"""

from __future__ import annotations

import base64
import http.server
import json
import socket
import socketserver
import threading
import urllib.parse
import urllib.request


# ------------------------------------------------------------- clickhouse
class ClickHouseClient:
    def __init__(self, url: str, user: str = "default", password: str = "",
                 timeout: float = 30.0):
        self.base = url.rstrip("/")
        self.user, self.password = user, password
        self.timeout = timeout

    def _call(self, sql: str, body: bytes = b"") -> bytes:
        q = urllib.parse.urlencode({"query": sql})
        req = urllib.request.Request(
            f"{self.base}/?{q}", data=body or None, method="POST",
            headers={
                "X-ClickHouse-User": self.user,
                "X-ClickHouse-Key": self.password,
            })
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            raise OSError(
                f"clickhouse error: HTTP {e.code} "
                f"{e.read().decode(errors='replace')[:300]}"
            ) from e

    def insert_json_each_row(self, database: str, table: str,
                             rows: list[dict]) -> None:
        body = "\n".join(
            json.dumps(r, sort_keys=True) for r in rows
        ).encode() + b"\n"
        self._call(
            f"INSERT INTO {database}.{table} FORMAT JSONEachRow", body)

    def query_json(self, sql: str) -> list[dict]:
        out = self._call(f"{sql} FORMAT JSONEachRow")
        return [json.loads(x) for x in out.decode().splitlines() if x]


class LoopbackClickHouse:
    def __init__(self, user: str = "default", password: str = "chpw",
                 host: str = "127.0.0.1", port: int = 0):
        import duckdb

        self.user, self.password = user, password
        self._db = duckdb.connect()
        self._lock = threading.Lock()
        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, body: bytes):
                self.send_response(code)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if (self.headers.get("X-ClickHouse-User") != server.user
                        or self.headers.get("X-ClickHouse-Key")
                        != server.password):
                    return self._reply(403, b"Authentication failed")
                qs = urllib.parse.urlparse(self.path).query
                sql = dict(urllib.parse.parse_qsl(qs)).get("query", "")
                body = self.rfile.read(
                    int(self.headers.get("content-length") or 0))
                import re as _re

                m = _re.match(
                    r"\s*INSERT\s+INTO\s+([\w.]+)\s+FORMAT\s+JSONEachRow",
                    sql, _re.I)
                with server._lock:
                    try:
                        if m:
                            rows = [json.loads(x) for x in
                                    body.decode().splitlines() if x]
                            if rows:
                                import pandas as pd

                                df = pd.DataFrame(rows)
                                tbl = m.group(1).replace(".", "_")
                                cols = ", ".join(df.columns)
                                server._db.register("__chin", df)
                                server._db.execute(
                                    f"INSERT INTO {tbl} ({cols}) "
                                    f"SELECT {cols} FROM __chin")
                            return self._reply(200, b"")
                        sql2 = _re.sub(r"\s+FORMAT\s+JSONEachRow\s*$", "",
                                       sql, flags=_re.I)
                        # db.table spellings map to db_table duckdb names
                        sql2 = _re.sub(
                            r"\b(\w+)\.(\w+)\b(?!\s*\()", r"\1_\2", sql2)
                        cur = server._db.execute(sql2)
                        if cur.description is None:
                            return self._reply(200, b"")
                        cols = [d[0] for d in cur.description]
                        lines = [
                            json.dumps(dict(zip(cols, r)), default=str)
                            for r in cur.fetchall()
                        ]
                        return self._reply(
                            200, ("\n".join(lines) + "\n").encode())
                    except Exception as e:  # noqa: BLE001
                        return self._reply(
                            400, f"DB::Exception: {e}".encode())

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
        self.url = f"http://{self.host}:{self.port}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def seed(self, sql: str) -> None:
        with self._lock:
            self._db.execute(sql)

    def start(self) -> "LoopbackClickHouse":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


# ------------------------------------------------------------ stream load
DORIS_DELETE_SIGN = "__DORIS_DELETE_SIGN__"
STARROCKS_DELETE_SIGN = "__op"


class StreamLoadClient:
    """doris_starrocks_connector.rs:249 — one PUT per load with a
    unique label; a non-Success Status raises."""

    def __init__(self, url: str, user: str, password: str,
                 timeout: float = 30.0):
        self.base = url.rstrip("/")
        token = base64.b64encode(f"{user}:{password}".encode()).decode()
        self.auth = f"Basic {token}"
        self.timeout = timeout
        self._n = 0

    def load(self, database: str, table: str, rows: list[dict],
             label_prefix: str = "rw", label: str | None = None) -> dict:
        """An explicit ``label`` makes the load idempotent across
        process boundaries (per-task loads name their label from the
        durable epoch + partition id); the default counter labels are
        only unique within one client's lifetime."""
        self._n += 1
        body = "\n".join(
            json.dumps(r, sort_keys=True) for r in rows
        ).encode() + b"\n"
        req = urllib.request.Request(
            f"{self.base}/api/{database}/{table}/_stream_load",
            data=body, method="PUT",
            headers={
                "Authorization": self.auth,
                "label": label or f"{label_prefix}-{self._n}",
                "format": "json",
                "read_json_by_line": "true",
            })
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                resp = json.loads(r.read())
        except urllib.error.HTTPError as e:
            raise OSError(
                f"stream load error: HTTP {e.code} "
                f"{e.read().decode(errors='replace')[:300]}"
            ) from e
        # "Label Already Exists" on a retry means the load already
        # committed — the label IS the exactly-once lever, so a replay
        # is success, not failure (the reference's DORIS_SUCCESS_STATUS
        # plus the documented label-dedup contract)
        if resp.get("Status") not in (
                "Success", "Publish Timeout", "Label Already Exists"):
            raise OSError(f"stream load failed: {resp}")
        return resp


class LoopbackStreamLoad:
    """A primary-key-model table store behind the Stream Load API:
    rows with delete-sign 0 upsert by pk, 1 delete — the Doris/
    StarRocks table-model behavior. Duplicate labels are rejected
    (the API's exactly-once lever)."""

    def __init__(self, user: str = "root", password: str = "dpw",
                 delete_sign: str = DORIS_DELETE_SIGN,
                 host: str = "127.0.0.1", port: int = 0):
        self.user, self.password = user, password
        self.delete_sign = delete_sign
        self.tables: dict[tuple, dict] = {}   # (db, tbl) -> {pk: row}
        self.pks: dict[tuple, list[str]] = {}
        self.labels: set[str] = set()
        self._lock = threading.Lock()
        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                want = base64.b64encode(
                    f"{server.user}:{server.password}".encode()).decode()
                if self.headers.get("Authorization") != f"Basic {want}":
                    return self._reply(401, {
                        "Status": "Fail", "Message": "access denied"})
                import re as _re

                m = _re.match(r"^/api/([^/]+)/([^/]+)/_stream_load$",
                              self.path)
                if m is None:
                    return self._reply(404, {
                        "Status": "Fail", "Message": "bad path"})
                key = (m.group(1), m.group(2))
                label = self.headers.get("label", "")
                body = self.rfile.read(
                    int(self.headers.get("content-length") or 0))
                rows = [json.loads(x) for x in
                        body.decode().splitlines() if x]
                with server._lock:
                    if key not in server.pks:
                        return self._reply(404, {
                            "Status": "Fail",
                            "Message": f"table {key} not found"})
                    if label in server.labels:
                        return self._reply(200, {
                            "Status": "Label Already Exists",
                            "Message": f"label {label} reused"})
                    server.labels.add(label)
                    store = server.tables[key]
                    pk = server.pks[key]
                    for r in rows:
                        sign = str(r.pop(server.delete_sign, "0"))
                        k = tuple(r.get(c) for c in pk)
                        if sign == "1":
                            store.pop(k, None)
                        else:
                            store[k] = r
                return self._reply(200, {
                    "TxnId": len(server.labels), "Label": label,
                    "Status": "Success", "Message": "OK",
                    "NumberTotalRows": len(rows),
                    "NumberLoadedRows": len(rows)})

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
        self.url = f"http://{self.host}:{self.port}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def create_table(self, db: str, table: str, pk: list[str]) -> None:
        with self._lock:
            self.tables.setdefault((db, table), {})
            self.pks[(db, table)] = pk

    def rows(self, db: str, table: str) -> list[dict]:
        with self._lock:
            return list(self.tables.get((db, table), {}).values())

    def start(self) -> "LoopbackStreamLoad":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
