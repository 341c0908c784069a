"""BigQuery sink layer over the REAL REST API with REAL OAuth2
service-account auth (reference `src/connector/src/sink/big_query.rs`:
options bigquery.project / bigquery.dataset / bigquery.table /
bigquery.credentials / auto_create from its serde renames; the
reference writes through the gRPC Storage Write API via
gcp-bigquery-client — this engine uses the public REST
`tabledata.insertAll` streaming-insert contract instead, the same
append semantics over HTTP/JSON, a documented transport divergence).

Auth is the genuine Google service-account flow (RFC 7523 JWT-bearer
grant): a RS256-signed JWT assertion ({iss: client_email, scope,
aud: token_uri, iat/exp}) POSTed to the token endpoint for a bearer
token. The loopback VERIFIES the assertion's signature against the
service account's registered public key (sources/rsa_jwt.py) and
rejects forged/foreign tokens — closing the "OAuth/RS256" gate with
real cryptography, not a stub.

Credentials JSON carries the key as integer fields (private_key_n/e/d)
instead of a PEM blob — the one in-sandbox divergence (no ASN.1
parser); everything from the JWT onward is the public protocol.

insertAll `insertId` best-effort dedup is implemented loopback-side
exactly as BigQuery documents it, so sink retries are idempotent.
"""

from __future__ import annotations

import json
import socket
import threading
import urllib.parse
import urllib.request

from risingwave_spark.sources.rsa_jwt import (
    generate_keypair,
    jwt_decode_verify,
    jwt_encode,
)

_SCOPE = "https://www.googleapis.com/auth/bigquery"


def make_service_account(project: str, email: str | None = None) -> dict:
    """A test-fixture service-account document (the shape GCP's JSON
    key files carry, with the integer-key divergence noted above)."""
    key = generate_keypair()
    return {
        "type": "service_account",
        "project_id": project,
        "client_email": email or f"rw-sink@{project}.iam.gserviceaccount.com",
        "private_key_id": "k1",
        "private_key_n": key["n"],
        "private_key_e": key["e"],
        "private_key_d": key["d"],
        # token_uri is filled in by the caller once the service is up
        "token_uri": None,
    }


class BigQueryClient:
    def __init__(self, credentials: dict, endpoint: str,
                 timeout: float = 30.0):
        self.creds = credentials
        self.base = endpoint.rstrip("/")
        self.timeout = timeout
        self._bearer = None

    # ------------------------------------------------------------- auth
    def _token(self) -> str:
        if self._bearer:
            return self._bearer
        key = {
            "n": int(self.creds["private_key_n"]),
            "e": int(self.creds["private_key_e"]),
            "d": int(self.creds["private_key_d"]),
        }
        token_uri = self.creds["token_uri"] or f"{self.base}/token"
        import time as _time

        now = int(_time.time())
        assertion = jwt_encode(
            {
                "iss": self.creds["client_email"],
                "scope": _SCOPE,
                "aud": token_uri,
                "iat": now,
                "exp": now + 3600,
            },
            key,
            kid=self.creds.get("private_key_id"),
        )
        form = urllib.parse.urlencode({
            "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "assertion": assertion,
        }).encode()
        req = urllib.request.Request(
            token_uri, data=form,
            headers={"content-type": "application/x-www-form-urlencoded"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                self._bearer = json.loads(r.read())["access_token"]
        except urllib.error.HTTPError as e:
            raise OSError(
                f"bigquery oauth token request failed: HTTP {e.code} "
                f"{e.read().decode(errors='replace')[:200]}"
            ) from e
        return self._bearer

    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.base}{path}",
            data=json.dumps(body).encode() if body is not None else None,
            method=method,
            headers={
                "content-type": "application/json",
                "Authorization": f"Bearer {self._token()}",
            })
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as e:
            raise OSError(
                f"bigquery {method} {path}: HTTP {e.code} "
                f"{e.read().decode(errors='replace')[:300]}"
            ) from e

    # -------------------------------------------------------------- api
    def insert_all(self, project: str, dataset: str, table: str,
                   rows: list[tuple[str, dict]]) -> None:
        """rows: (insertId, json row) — tabledata.insertAll; raises on
        any per-row insertError (the sink's loud failure path)."""
        resp = self._call(
            "POST",
            f"/bigquery/v2/projects/{project}/datasets/{dataset}"
            f"/tables/{table}/insertAll",
            {
                "kind": "bigquery#tableDataInsertAllRequest",
                "rows": [{"insertId": i, "json": r} for i, r in rows],
            })
        if resp.get("insertErrors"):
            raise OSError(f"bigquery insertAll errors: {resp['insertErrors']}")

    def create_table(self, project: str, dataset: str, table: str) -> None:
        """tables.insert (auto_create); 409-on-exists is fine."""
        try:
            self._call(
                "POST",
                f"/bigquery/v2/projects/{project}/datasets/{dataset}/tables",
                {"tableReference": {
                    "projectId": project, "datasetId": dataset,
                    "tableId": table}})
        except OSError as e:
            if "409" not in str(e):
                raise

    def query(self, project: str, sql: str) -> list[list]:
        """jobs.query (the read-back path for tests): typed text rows
        in the API's {rows: [{f: [{v: ...}]}]} framing."""
        resp = self._call(
            "POST", f"/bigquery/v2/projects/{project}/queries",
            {"query": sql, "useLegacySql": False})
        return [[c["v"] for c in row["f"]] for row in resp.get("rows", [])]


class LoopbackBigQuery:
    """The in-sandbox BigQuery: OAuth2 token endpoint with RS256
    assertion VERIFICATION, insertAll with documented insertId
    best-effort dedup, tables.insert, and jobs.query answered by an
    embedded DuckDB over the streamed rows."""

    def __init__(self, client_email: str, public_key: dict,
                 host: str = "127.0.0.1", port: int = 0):
        import http.server
        import secrets as _secrets
        import socket
        import socketserver

        import duckdb

        self.client_email = client_email
        self.public_key = {"n": int(public_key["n"]),
                           "e": int(public_key["e"])}
        self.tokens: set[str] = set()
        self.tables: dict[tuple, list[dict]] = {}
        self._seen_ids: dict[tuple, set] = {}
        self._db = duckdb.connect()
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

            def _err(self, code: int, msg: str):
                self._reply(code, {"error": {"code": code, "message": msg}})

            def _body(self) -> bytes:
                return self.rfile.read(
                    int(self.headers.get("content-length") or 0))

            def do_POST(self):
                if self.path == "/token":
                    form = dict(urllib.parse.parse_qsl(
                        self._body().decode()))
                    if form.get("grant_type") != (
                            "urn:ietf:params:oauth:grant-type:jwt-bearer"):
                        return self._err(400, "unsupported grant_type")
                    try:
                        claims = jwt_decode_verify(
                            form.get("assertion", ""), server.public_key)
                    except ValueError as e:
                        return self._err(401, f"invalid_grant: {e}")
                    if claims.get("iss") != server.client_email:
                        return self._err(
                            401, f"unknown issuer {claims.get('iss')!r}")
                    if _SCOPE not in (claims.get("scope") or ""):
                        return self._err(401, "missing bigquery scope")
                    tok = _secrets.token_urlsafe(16)
                    server.tokens.add(tok)
                    return self._reply(200, {
                        "access_token": tok, "token_type": "Bearer",
                        "expires_in": 3600})
                auth = self.headers.get("Authorization", "")
                if not (auth.startswith("Bearer ")
                        and auth[7:] in server.tokens):
                    return self._err(401, "missing/invalid bearer token")
                import re as _re

                m = _re.match(
                    r"^/bigquery/v2/projects/([^/]+)/datasets/([^/]+)"
                    r"/tables/([^/]+)/insertAll$", self.path)
                if m:
                    return self._insert_all(m.group(1), m.group(2),
                                            m.group(3))
                m = _re.match(
                    r"^/bigquery/v2/projects/([^/]+)/datasets/([^/]+)"
                    r"/tables$", self.path)
                if m:
                    req = json.loads(self._body())
                    tid = req["tableReference"]["tableId"]
                    key = (m.group(1), m.group(2), tid)
                    with server._lock:
                        if key in server.tables:
                            return self._err(409, "Already Exists")
                        server.tables[key] = []
                        server._seen_ids[key] = set()
                    return self._reply(200, {"kind": "bigquery#table"})
                m = _re.match(
                    r"^/bigquery/v2/projects/([^/]+)/queries$", self.path)
                if m:
                    return self._query(m.group(1))
                self._err(404, self.path)

            def _insert_all(self, project, dataset, table):
                key = (project, dataset, table)
                req = json.loads(self._body())
                with server._lock:
                    if key not in server.tables:
                        return self._err(
                            404, f"table {dataset}.{table} not found")
                    seen = server._seen_ids[key]
                    for r in req.get("rows", []):
                        iid = r.get("insertId")
                        if iid is not None and iid in seen:
                            continue  # best-effort dedup, as documented
                        if iid is not None:
                            seen.add(iid)
                        server.tables[key].append(r["json"])
                return self._reply(200, {
                    "kind": "bigquery#tableDataInsertAllResponse"})

            def _query(self, project):
                req = json.loads(self._body())
                sql = req["query"]
                with server._lock:
                    # register every table of this project as
                    # dataset_table views over the streamed JSON rows
                    import re as _re2

                    q = sql
                    for (p, d, t), rows in server.tables.items():
                        if p != project:
                            continue
                        view = f"{d}_{t}"
                        q = _re2.sub(
                            rf"\b{_re2.escape(d)}\.{_re2.escape(t)}\b",
                            view, q)
                        server._db.execute(f'DROP VIEW IF EXISTS "{view}"')
                        if rows:
                            import pandas as _pd  # noqa: F401

                            df = _pd.DataFrame(rows)
                            server._db.register(view + "_df", df)
                            server._db.execute(
                                f'CREATE VIEW "{view}" AS '
                                f'SELECT * FROM "{view}_df"')
                        else:
                            server._db.execute(
                                f'CREATE VIEW "{view}" AS SELECT 1 AS x '
                                "WHERE false")
                    try:
                        cur = server._db.execute(q)
                        out = cur.fetchall()
                        cols = [d[0] for d in cur.description]
                    except Exception as e:  # noqa: BLE001
                        return self._err(400, f"query error: {e}")
                return self._reply(200, {
                    "kind": "bigquery#queryResponse",
                    "schema": {"fields": [{"name": c} for c in cols]},
                    "jobComplete": True,
                    "rows": [
                        {"f": [{"v": None if v is None else str(v)}
                               for v in row]}
                        for row in out
                    ],
                })

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
        self.endpoint = f"http://{self.host}:{self.port}"
        self.token_uri = f"{self.endpoint}/token"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def start(self) -> "LoopbackBigQuery":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
