"""Apache Iceberg REST catalog — client + loopback service over the
PUBLIC REST Catalog OpenAPI (iceberg.apache.org/rest-catalog-spec).

Reference parity: `src/connector/src/connector_common/iceberg/mod.rs`
(catalog.type = 'rest' with catalog.uri / catalog.credential /
catalog.oauth2_server_uri — iceberg-rust's RestCatalog under the
reference's source `source/iceberg/` and sink `sink/iceberg/`). The
engine previously gated REST catalogs loud; this module un-gates them
with the same loopback-fixture posture as the other connector
families: a real HTTP service speaking the spec's JSON shapes, with
OAuth2 client-credential VERIFICATION when a credential is set.

Endpoints served / consumed:

* ``GET /v1/config`` — CatalogConfig (defaults/overrides)
* ``POST /v1/oauth/tokens`` — OAuth2 client_credentials grant
  (RFC 6749 §4.4 urlencoded form), bearer token REQUIRED on every
  other call once a credential is configured
* ``GET /v1/{prefix}namespaces/{ns}/tables/{tbl}`` — LoadTableResult
  ``{"metadata-location": ..., "metadata": {...}}``
* ``POST /v1/{prefix}namespaces/{ns}/tables`` — CreateTableRequest
  (idempotent here: 409 on exists, which the client treats as ok)
* ``POST /v1/{prefix}namespaces/{ns}/tables/{tbl}`` —
  CommitTableRequest: ``requirements`` of type
  ``assert-ref-snapshot-id`` (optimistic concurrency on the main
  branch — a stale writer gets 409 CommitFailedException exactly as
  the spec prescribes) and ``updates`` of ``add-snapshot`` +
  ``set-snapshot-ref``, the fast-append commit shape iceberg-rust
  sends.

The loopback persists every accepted commit as a NEW
``v{N}.metadata.json`` under the table's metadata dir and flips the
version hint, so the same table remains readable through the storage
catalog — both catalog views stay consistent.
"""

from __future__ import annotations

import json
import os
import re
import secrets
import socket
import threading
import urllib.parse
import urllib.request


class IcebergRestCatalog:
    """Client side: config handshake, optional OAuth2 token fetch,
    loadTable, createTable, fast-append commit."""

    def __init__(self, uri: str, credential: str | None = None,
                 prefix: str = "", timeout: float = 30.0):
        self.base = uri.rstrip("/")
        self.prefix = (prefix.strip("/") + "/") if prefix else ""
        self.timeout = timeout
        self._token = None
        if credential:
            cid, _, secret = credential.partition(":")
            form = urllib.parse.urlencode({
                "grant_type": "client_credentials",
                "client_id": cid, "client_secret": secret,
                "scope": "catalog",
            }).encode()
            req = urllib.request.Request(
                f"{self.base}/v1/oauth/tokens", data=form,
                headers={"content-type":
                         "application/x-www-form-urlencoded"})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                self._token = json.loads(r.read())["access_token"]
        self.config = self._call("GET", "/v1/config")

    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        hdrs = {"content-type": "application/json"}
        if self._token:
            hdrs["Authorization"] = f"Bearer {self._token}"
        req = urllib.request.Request(
            f"{self.base}{path}",
            data=json.dumps(body).encode() if body is not None else None,
            method=method, headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")
            raise OSError(
                f"iceberg rest catalog {method} {path}: HTTP {e.code} "
                f"{detail[:300]}"
            ) from e

    def load_table(self, namespace: str, table: str) -> dict:
        """→ LoadTableResult (metadata-location + metadata)."""
        return self._call(
            "GET",
            f"/v1/{self.prefix}namespaces/{namespace}/tables/{table}")

    def create_table_if_missing(self, namespace: str, table: str,
                                location: str) -> None:
        try:
            self._call(
                "POST", f"/v1/{self.prefix}namespaces/{namespace}/tables",
                {"name": table, "location": location, "schema":
                 {"type": "struct", "fields": []}})
        except OSError as e:
            if "409" not in str(e):
                raise

    def commit_append(self, namespace: str, table: str,
                      expected_snapshot_id: int | None,
                      snapshot: dict) -> dict:
        """The spec's CommitTableRequest for a fast-append: optimistic
        requirement on main + add-snapshot/set-snapshot-ref updates."""
        body = {
            "identifier": {"namespace": [namespace], "name": table},
            "requirements": [{
                "type": "assert-ref-snapshot-id", "ref": "main",
                "snapshot-id": expected_snapshot_id,
            }],
            "updates": [
                {"action": "add-snapshot", "snapshot": snapshot},
                {"action": "set-snapshot-ref", "ref-name": "main",
                 "type": "branch",
                 "snapshot-id": snapshot["snapshot-id"]},
            ],
        }
        return self._call(
            "POST",
            f"/v1/{self.prefix}namespaces/{namespace}/tables/{table}",
            body)


class LoopbackIcebergRest:
    """The catalog service: spec-shaped JSON over real HTTP, OAuth2
    client-credential verification, optimistic-concurrency commits
    persisted as new metadata versions under the warehouse dir."""

    def __init__(self, warehouse: str, credential: str | None = None,
                 host: str = "127.0.0.1", port: int = 0):
        import http.server
        import socket
        import socketserver

        self.warehouse = warehouse
        self.credential = credential  # "client_id:client_secret"
        self.tokens: set[str] = set()
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

            def _err(self, code: int, etype: str, msg: str):
                self._reply(code, {"error": {
                    "message": msg, "type": etype, "code": code}})

            def _authed(self) -> bool:
                if server.credential is None:
                    return True
                tok = self.headers.get("Authorization", "")
                return (tok.startswith("Bearer ")
                        and tok[7:] in server.tokens)

            def _body(self) -> bytes:
                n = int(self.headers.get("content-length") or 0)
                return self.rfile.read(n)

            def do_GET(self):
                if self.path == "/v1/config":
                    if not self._authed():
                        return self._err(401, "NotAuthorizedException",
                                         "missing/invalid bearer token")
                    return self._reply(200, {"defaults": {},
                                             "overrides": {}})
                m = re.match(
                    r"^/v1/namespaces/([^/]+)/tables/([^/]+)$", self.path)
                if m:
                    if not self._authed():
                        return self._err(401, "NotAuthorizedException",
                                         "missing/invalid bearer token")
                    ns, tbl = m.group(1), m.group(2)
                    meta = server._load(ns, tbl)
                    if meta is None:
                        return self._err(
                            404, "NoSuchTableException",
                            f"table {ns}.{tbl} not found")
                    loc, metadata = meta
                    return self._reply(200, {
                        "metadata-location": loc, "metadata": metadata})
                self._err(404, "NotFoundException", self.path)

            def do_POST(self):
                if self.path == "/v1/oauth/tokens":
                    form = dict(urllib.parse.parse_qsl(
                        self._body().decode()))
                    want = (server.credential or ":").split(":", 1)
                    if (form.get("grant_type") != "client_credentials"
                            or form.get("client_id") != want[0]
                            or form.get("client_secret") != want[1]):
                        return self._err(401, "NotAuthorizedException",
                                         "invalid client credentials")
                    tok = secrets.token_urlsafe(16)
                    server.tokens.add(tok)
                    return self._reply(200, {
                        "access_token": tok, "token_type": "bearer",
                        "expires_in": 3600})
                if not self._authed():
                    return self._err(401, "NotAuthorizedException",
                                     "missing/invalid bearer token")
                m = re.match(r"^/v1/namespaces/([^/]+)/tables$", self.path)
                if m:
                    req = json.loads(self._body())
                    ns, tbl = m.group(1), req["name"]
                    if server._load(ns, tbl) is not None:
                        return self._err(
                            409, "AlreadyExistsException",
                            f"table {ns}.{tbl} exists")
                    from risingwave_spark.sources.iceberg_scan import (
                        create_empty_table,
                    )

                    create_empty_table(server.warehouse, ns, tbl)
                    loc, metadata = server._load(ns, tbl)
                    return self._reply(200, {
                        "metadata-location": loc, "metadata": metadata})
                m = re.match(
                    r"^/v1/namespaces/([^/]+)/tables/([^/]+)$", self.path)
                if m:
                    return self._commit(m.group(1), m.group(2))
                self._err(404, "NotFoundException", self.path)

            def _commit(self, ns: str, tbl: str):
                req = json.loads(self._body())
                with server._lock:
                    meta = server._load(ns, tbl)
                    if meta is None:
                        return self._err(404, "NoSuchTableException",
                                         f"table {ns}.{tbl} not found")
                    _loc, metadata = meta
                    cur = metadata.get("current-snapshot-id")
                    for r in req.get("requirements", []):
                        if (r.get("type") == "assert-ref-snapshot-id"
                                and r.get("ref") == "main"
                                and r.get("snapshot-id") != cur):
                            # the spec's optimistic-concurrency failure
                            return self._err(
                                409, "CommitFailedException",
                                f"requirement failed: main is at "
                                f"{cur}, expected {r.get('snapshot-id')}")
                    for u in req.get("updates", []):
                        act = u.get("action")
                        if act == "add-snapshot":
                            metadata["snapshots"] = (
                                metadata.get("snapshots", [])
                                + [u["snapshot"]])
                        elif act == "set-snapshot-ref":
                            metadata["current-snapshot-id"] = (
                                u["snapshot-id"])
                        else:
                            return self._err(
                                400, "UnsupportedOperationException",
                                f"update action {act!r}")
                    loc = server._persist(ns, tbl, metadata)
                return self._reply(200, {
                    "metadata-location": loc, "metadata": metadata})

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
        self.uri = f"http://{self.host}:{self.port}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    # ------------------------------------------------------ catalog state
    def _meta_dir(self, ns: str, tbl: str) -> str:
        return os.path.join(self.warehouse, ns, tbl, "metadata")

    def _load(self, ns: str, tbl: str) -> tuple[str, dict] | None:
        meta_dir = self._meta_dir(ns, tbl)
        hint = os.path.join(meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            return None
        with open(hint) as f:
            version = int(f.read().strip())
        path = os.path.join(meta_dir, f"v{version}.metadata.json")
        with open(path) as f:
            return path, json.load(f)

    def _persist(self, ns: str, tbl: str, metadata: dict) -> str:
        """Write the committed metadata as v{N+1} + hint flip — keeps
        the storage-catalog view of the same table consistent."""
        meta_dir = self._meta_dir(ns, tbl)
        with open(os.path.join(meta_dir, "version-hint.text")) as f:
            version = int(f.read().strip())
        path = os.path.join(meta_dir, f"v{version + 1}.metadata.json")
        with open(path, "w") as f:
            json.dump(metadata, f)
        tmp = os.path.join(meta_dir, ".version-hint.tmp")
        with open(tmp, "w") as f:
            f.write(str(version + 1))
        os.replace(tmp, os.path.join(meta_dir, "version-hint.text"))
        return path

    def start(self) -> "LoopbackIcebergRest":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
