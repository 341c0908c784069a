"""AWS Glue catalog for Iceberg tables — client + loopback over the
PUBLIC Glue API (docs.aws.amazon.com/glue/latest/webapi: JSON-1.1
X-Amz-Target RPC with SigV4, service "glue").

Reference parity: `src/connector/src/connector_common/iceberg/mod.rs`
catalog.type='glue' (iceberg-rust's GlueCatalog). The Iceberg-on-Glue
contract implemented here is the real one: the table's `Parameters`
carry `metadata_location`; a writer commits by writing the NEW
metadata file itself and flipping the pointer through UpdateTable,
passing the `previous_metadata_location` it read — the loopback
rejects a stale flip with ConcurrentModificationException exactly as
Glue-backed Iceberg does (optimistic locking on the pointer).

SigV4 signing/verification reuses the shared helper
(sources/kinesis.py sigv4_headers); the loopback VERIFIES every
request signature — wrong credentials are rejected on the wire.
"""

from __future__ import annotations

import json
import socket
import threading
import urllib.request

from risingwave_spark.sources.kinesis import sigv4_headers

_CTYPE = "application/x-amz-json-1.1"


class GlueClient:
    def __init__(self, endpoint: str, region: str = "us-east-1",
                 access_key: str = "test", secret_key: str = "test",
                 timeout: float = 30.0):
        self.base = endpoint.rstrip("/")
        self.host = self.base.split("://", 1)[-1]
        self.region = region
        self.access_key, self.secret_key = access_key, secret_key
        self.timeout = timeout

    def _call(self, action: str, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        hdrs = sigv4_headers(
            "POST", self.host, "/", body, self.region, "glue",
            self.access_key, self.secret_key, f"AWSGlue.{action}",
            content_type=_CTYPE)
        req = urllib.request.Request(
            self.base + "/", data=body, headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")
            raise OSError(
                f"glue {action}: HTTP {e.code} {detail[:300]}") from e

    def get_table(self, database: str, name: str) -> dict:
        return self._call(
            "GetTable", {"DatabaseName": database, "Name": name})["Table"]

    def create_table(self, database: str, name: str,
                     metadata_location: str) -> None:
        self._call("CreateTable", {
            "DatabaseName": database,
            "TableInput": {
                "Name": name,
                "TableType": "EXTERNAL_TABLE",
                "Parameters": {
                    "table_type": "ICEBERG",
                    "metadata_location": metadata_location,
                },
            },
        })

    def update_pointer(self, database: str, name: str,
                       new_location: str, previous_location: str) -> None:
        """The Iceberg-on-Glue commit: flip metadata_location with the
        expected previous pointer (optimistic concurrency)."""
        self._call("UpdateTable", {
            "DatabaseName": database,
            "TableInput": {
                "Name": name,
                "TableType": "EXTERNAL_TABLE",
                "Parameters": {
                    "table_type": "ICEBERG",
                    "metadata_location": new_location,
                    "previous_metadata_location": previous_location,
                },
            },
        })


class JdbcIcebergCatalog:
    """The Iceberg JDBC catalog (iceberg.apache.org spec: the
    `iceberg_tables` pointer table — catalog_name/table_namespace/
    table_name/metadata_location/previous_metadata_location — with
    optimistic UPDATE ... WHERE metadata_location = <expected>
    commits). Reference: connector_common/iceberg catalog.type='jdbc'
    via iceberg-rust's JdbcCatalog. Speaks the Postgres v3 wire
    through sources/pgwire.py — any PG-compatible database (or the
    DuckDB-backed loopback) serves as the catalog store."""

    TABLE_DDL = (
        "CREATE TABLE IF NOT EXISTS iceberg_tables ("
        "catalog_name VARCHAR, table_namespace VARCHAR, "
        "table_name VARCHAR, metadata_location VARCHAR, "
        "previous_metadata_location VARCHAR)"
    )

    def __init__(self, host: str, port: int, user: str, password: str,
                 database: str, catalog_name: str = "rw"):
        from risingwave_spark.sources.pgwire import PgWireClient

        self._client = PgWireClient(host, int(port), user, password,
                                    database)
        self.catalog_name = catalog_name
        self._client.query(self.TABLE_DDL)

    @staticmethod
    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def get_location(self, namespace: str, table: str) -> str:
        _f, rows = self._client.query(
            "SELECT metadata_location FROM iceberg_tables WHERE "
            f"catalog_name = {self._q(self.catalog_name)} AND "
            f"table_namespace = {self._q(namespace)} AND "
            f"table_name = {self._q(table)}")
        if not rows:
            raise OSError(
                f"iceberg jdbc catalog: table {namespace}.{table} "
                "not found")
        return rows[0][0]

    def create_table_if_missing(self, namespace: str, table: str,
                                metadata_location: str) -> None:
        _f, rows = self._client.query(
            "SELECT 1 FROM iceberg_tables WHERE "
            f"catalog_name = {self._q(self.catalog_name)} AND "
            f"table_namespace = {self._q(namespace)} AND "
            f"table_name = {self._q(table)}")
        if rows:
            return
        self._client.query(
            "INSERT INTO iceberg_tables VALUES ("
            f"{self._q(self.catalog_name)}, {self._q(namespace)}, "
            f"{self._q(table)}, {self._q(metadata_location)}, NULL)")

    def flip_pointer(self, namespace: str, table: str,
                     new_location: str, previous_location: str) -> None:
        """Optimistic commit: UPDATE guarded on the expected current
        pointer; zero rows touched = a concurrent writer won."""
        self._client.query(
            "UPDATE iceberg_tables SET "
            f"metadata_location = {self._q(new_location)}, "
            f"previous_metadata_location = {self._q(previous_location)} "
            f"WHERE catalog_name = {self._q(self.catalog_name)} AND "
            f"table_namespace = {self._q(namespace)} AND "
            f"table_name = {self._q(table)} AND "
            f"metadata_location = {self._q(previous_location)}")
        # verify the flip landed (the wire reports command completion,
        # not row counts, through this client — re-read the pointer)
        if self.get_location(namespace, table) != new_location:
            raise OSError(
                "iceberg jdbc catalog: concurrent commit — pointer "
                f"moved past {previous_location!r}")

    def close(self) -> None:
        self._client.close()


class LoopbackGlue:
    """The catalog service: SigV4-VERIFYING JSON-1.1 RPC holding the
    metadata_location pointer per (database, table)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 region: str = "us-east-1",
                 access_key: str = "test", secret_key: str = "test"):
        import http.server
        import socket
        import socketserver

        self.region = region
        self.access_key, self.secret_key = access_key, secret_key
        self.tables: dict[tuple, dict] = {}  # (db, name) -> Parameters
        self._lock = threading.Lock()
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("content-type", _CTYPE)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                import datetime
                import hmac as _hmac

                n = int(self.headers.get("content-length") or 0)
                body = self.rfile.read(n) if n else b""
                target = self.headers.get("X-Amz-Target", "")
                try:
                    t = datetime.datetime.strptime(
                        self.headers.get("X-Amz-Date", ""),
                        "%Y%m%dT%H%M%SZ",
                    ).replace(tzinfo=datetime.timezone.utc)
                except ValueError:
                    return self._reply(
                        403, {"__type": "InvalidSignatureException"})
                want = sigv4_headers(
                    "POST", self.headers.get("Host", ""), "/", body,
                    store.region, "glue", store.access_key,
                    store.secret_key, target, now=t, content_type=_CTYPE,
                )["Authorization"]
                if not _hmac.compare_digest(
                        self.headers.get("Authorization", ""), want):
                    return self._reply(
                        403, {"__type": "InvalidSignatureException"})
                action = target.split(".")[-1]
                code, resp = store._serve(action, json.loads(body or b"{}"))
                self._reply(code, resp)

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
        self.endpoint = f"http://{self.host}:{self.port}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def _serve(self, action: str, req: dict) -> tuple[int, dict]:
        with self._lock:
            if action == "GetTable":
                key = (req["DatabaseName"], req["Name"])
                if key not in self.tables:
                    return 400, {"__type": "EntityNotFoundException",
                                 "Message": f"table {key} not found"}
                return 200, {"Table": {
                    "Name": key[1], "DatabaseName": key[0],
                    "Parameters": dict(self.tables[key])}}
            if action == "CreateTable":
                ti = req["TableInput"]
                key = (req["DatabaseName"], ti["Name"])
                if key in self.tables:
                    return 400, {"__type": "AlreadyExistsException",
                                 "Message": f"table {key} exists"}
                self.tables[key] = dict(ti.get("Parameters", {}))
                return 200, {}
            if action == "UpdateTable":
                ti = req["TableInput"]
                key = (req["DatabaseName"], ti["Name"])
                if key not in self.tables:
                    return 400, {"__type": "EntityNotFoundException",
                                 "Message": f"table {key} not found"}
                params = dict(ti.get("Parameters", {}))
                expect = params.get("previous_metadata_location")
                current = self.tables[key].get("metadata_location")
                if expect != current:
                    # the Iceberg-on-Glue optimistic-lock failure
                    return 400, {
                        "__type": "ConcurrentModificationException",
                        "Message": (
                            f"metadata_location is {current!r}, "
                            f"caller expected {expect!r}")}
                self.tables[key] = params
                return 200, {}
            return 400, {"__type": "UnknownOperationException",
                         "Message": action}

    def start(self) -> "LoopbackGlue":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
