"""GCS + Azure Blob object-store clients and loopback services
(reference `src/connector/src/source/filesystem/opendal_source/`:
the gcs/azblob file sources list a bucket/container and read objects;
option names from their serde renames — gcs.bucket_name,
azblob.container_name, azblob.credentials.account_name/account_key).

GCS speaks the PUBLIC JSON API (cloud.google.com/storage/docs/json_api):
`GET /storage/v1/b/{bucket}/o?prefix=…` lists, `?alt=media` downloads,
`POST /upload/storage/v1/…?uploadType=media` uploads. The loopback
serves the emulator contract (fake-gcs-server /
STORAGE_EMULATOR_HOST): no Authorization required — the real
service's OAuth token flow is the RS256 service-account exchange the
bigquery sink already implements (sources/rsa_jwt.py + bigquery.py);
pointing this client at real GCS means attaching that same Bearer
token, the REST bytes are otherwise identical.

Azure Blob speaks the PUBLIC Blob service REST API
(learn.microsoft.com/rest/api/storageservices) with GENUINE SharedKey
signing: HMAC-SHA256 over the canonical string (verb, 12 standard
headers, canonicalized x-ms-* headers, canonicalized resource with
sorted query params) keyed by the base64 account key — and the
loopback VERIFIES every signature, the same posture as the S3/Kinesis
fixtures.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import http.server
import json
import socket
import socketserver
import threading
import urllib.parse
import urllib.request
from xml.sax.saxutils import escape as _xml_escape


# ------------------------------------------------------------------- GCS
#: OAuth scope for Cloud Storage (public constant)
_GCS_SCOPE = "https://www.googleapis.com/auth/devstorage.read_write"


class GcsClient:
    """JSON-API client. Without credentials: the emulator posture
    (no Authorization; fake-gcs-server / STORAGE_EMULATOR_HOST). With
    a service-account credentials dict (client_email, private_key
    n/e/d, optional token_uri): the real service's OAuth flow — an
    RS256-signed JWT assertion (sources/rsa_jwt.py) exchanged for a
    Bearer token, attached to every request, exactly the bigquery
    sink's exchange."""

    def __init__(self, endpoint: str, timeout: float = 30.0,
                 credentials: dict | None = None):
        self.base = endpoint.rstrip("/")
        self.timeout = timeout
        self.creds = credentials
        self._bearer: str | None = None

    def _token(self) -> str:
        if self._bearer:
            return self._bearer
        import time as _time

        from risingwave_spark.sources.rsa_jwt import jwt_encode

        key = {
            "n": int(self.creds["private_key_n"]),
            "e": int(self.creds["private_key_e"]),
            "d": int(self.creds["private_key_d"]),
        }
        token_uri = self.creds.get("token_uri") or f"{self.base}/token"
        now = int(_time.time())
        assertion = jwt_encode(
            {
                "iss": self.creds["client_email"],
                "scope": _GCS_SCOPE,
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
                f"gcs oauth token request failed: HTTP {e.code} "
                f"{e.read().decode(errors='replace')[:200]}"
            ) from e
        return self._bearer

    def _headers(self) -> dict:
        if self.creds is None:
            return {}
        return {"Authorization": f"Bearer {self._token()}"}

    def _get(self, path: str) -> bytes:
        req = urllib.request.Request(
            f"{self.base}{path}", headers=self._headers())
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return r.read()

    def list_objects(self, bucket: str, prefix: str = "") -> list[tuple[str, int]]:
        q = f"?prefix={urllib.parse.quote(prefix, safe='')}" if prefix else ""
        data = json.loads(self._get(f"/storage/v1/b/{bucket}/o{q}"))
        return [(o["name"], int(o.get("size", 0))) for o in data.get("items", [])]

    def get_object(self, bucket: str, name: str) -> bytes:
        enc = urllib.parse.quote(name, safe="")
        return self._get(f"/storage/v1/b/{bucket}/o/{enc}?alt=media")

    def put_object(self, bucket: str, name: str, data: bytes) -> None:
        enc = urllib.parse.quote(name, safe="")
        req = urllib.request.Request(
            f"{self.base}/upload/storage/v1/b/{bucket}/o"
            f"?uploadType=media&name={enc}",
            data=data, method="POST",
            headers={"content-type": "application/octet-stream",
                     **self._headers()},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            r.read()


class LoopbackGcs:
    """In-sandbox GCS. Default: the emulator contract (no auth — what
    fake-gcs-server serves). With (client_email, public_key): the REAL
    service's posture — /token VERIFIES the RS256 assertion signature
    and storage requests demand the issued Bearer token."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 client_email: str | None = None,
                 public_key: dict | None = None):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.client_email = client_email
        self.public_key = (
            {"n": int(public_key["n"]), "e": int(public_key["e"])}
            if public_key else None)
        self.tokens: set[str] = set()
        self._lock = threading.Lock()
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, body: bytes, ctype="application/json"):
                self.send_response(code)
                self.send_header("content-type", ctype)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                if store.client_email is None:
                    return True  # emulator posture
                auth = self.headers.get("Authorization", "")
                if auth.startswith("Bearer ") and auth[7:] in store.tokens:
                    return True
                self._reply(401, b'{"error": "missing/invalid bearer"}')
                return False

            def _serve_token(self) -> None:
                import secrets as _secrets

                from risingwave_spark.sources.rsa_jwt import (
                    jwt_decode_verify,
                )

                n = int(self.headers.get("content-length") or 0)
                form = dict(urllib.parse.parse_qsl(
                    self.rfile.read(n).decode()))
                if form.get("grant_type") != (
                        "urn:ietf:params:oauth:grant-type:jwt-bearer"):
                    return self._reply(
                        400, b'{"error": "unsupported grant_type"}')
                try:
                    claims = jwt_decode_verify(
                        form.get("assertion", ""), store.public_key)
                except ValueError as e:
                    return self._reply(
                        401,
                        json.dumps(
                            {"error": f"invalid_grant: {e}"}).encode())
                if claims.get("iss") != store.client_email:
                    return self._reply(
                        401, b'{"error": "unknown issuer"}')
                if _GCS_SCOPE not in (claims.get("scope") or ""):
                    return self._reply(
                        401, b'{"error": "missing storage scope"}')
                tok = _secrets.token_urlsafe(16)
                store.tokens.add(tok)
                self._reply(200, json.dumps({
                    "access_token": tok, "token_type": "Bearer",
                    "expires_in": 3600}).encode())

            def do_GET(self):
                if not self._authed():
                    return
                parsed = urllib.parse.urlsplit(self.path)
                parts = parsed.path.strip("/").split("/")
                # /storage/v1/b/{bucket}/o[/{object}]
                if parts[:3] != ["storage", "v1", "b"] or len(parts) < 5:
                    self._reply(404, b'{"error": "not found"}')
                    return
                bucket = parts[3]
                if len(parts) == 5:  # list
                    prefix = urllib.parse.parse_qs(parsed.query).get("prefix", [""])[0]
                    with store._lock:
                        items = [
                            {"name": k, "size": str(len(v))}
                            for (b, k), v in sorted(store.objects.items())
                            if b == bucket and k.startswith(prefix)
                        ]
                    self._reply(200, json.dumps({"items": items}).encode())
                    return
                name = urllib.parse.unquote("/".join(parts[5:]))
                with store._lock:
                    data = store.objects.get((bucket, name))
                if data is None:
                    self._reply(404, b'{"error": "no such object"}')
                elif "alt=media" in parsed.query:
                    self._reply(200, data, ctype="application/octet-stream")
                else:
                    self._reply(200, json.dumps(
                        {"name": name, "size": str(len(data))}).encode())

            def do_POST(self):
                parsed = urllib.parse.urlsplit(self.path)
                if parsed.path == "/token" and store.client_email:
                    return self._serve_token()
                if not self._authed():
                    return
                parts = parsed.path.strip("/").split("/")
                if parts[:4] != ["upload", "storage", "v1", "b"] or len(parts) < 6:
                    self._reply(404, b'{"error": "not found"}')
                    return
                bucket = parts[4]
                q = urllib.parse.parse_qs(parsed.query)
                name = q.get("name", [""])[0]
                n = int(self.headers.get("content-length") or 0)
                data = self.rfile.read(n) if n else b""
                with store._lock:
                    store.objects[(bucket, name)] = data
                self._reply(200, json.dumps(
                    {"name": name, "size": str(len(data))}).encode())

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

    def start(self) -> "LoopbackGcs":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


# ----------------------------------------------------------------- Azblob
def azblob_shared_key(
    verb: str,
    account: str,
    key_b64: str,
    path: str,
    query: str,
    ms_headers: dict[str, str],
    content_length: str = "",
) -> str:
    """SharedKey signature (Blob service 2009-09-19+ canonical string):
    verb, 12 standard-header slots, canonicalized x-ms-* headers,
    canonicalized resource (/account/path + sorted query params)."""
    canon_headers = "".join(
        f"{k}:{v}\n" for k, v in sorted(ms_headers.items())
    )
    canon_res = f"/{account}{path}"
    if query:
        params = sorted(
            (k, ",".join(vs))
            for k, vs in urllib.parse.parse_qs(query, keep_blank_values=True).items()
        )
        canon_res += "".join(f"\n{k}:{v}" for k, v in params)
    string_to_sign = (
        f"{verb}\n\n\n{content_length}\n\n\n\n\n\n\n\n\n"
        f"{canon_headers}{canon_res}"
    )
    sig = hmac.new(
        base64.b64decode(key_b64), string_to_sign.encode(), hashlib.sha256
    ).digest()
    return f"SharedKey {account}:{base64.b64encode(sig).decode()}"


class AzblobClient:
    def __init__(self, endpoint: str, account: str, key_b64: str,
                 timeout: float = 30.0):
        self.base = endpoint.rstrip("/")
        self.account, self.key = account, key_b64
        self.timeout = timeout

    def _call(self, verb: str, path: str, query: str = "", body: bytes = b"",
              extra_ms: dict | None = None) -> bytes:
        ms = {"x-ms-date": "Thu, 01 Jan 1970 00:00:00 GMT",
              "x-ms-version": "2021-08-06"}
        if extra_ms:
            ms.update(extra_ms)
        clen = str(len(body)) if body else ""
        auth = azblob_shared_key(
            verb, self.account, self.key, path, query, ms, clen)
        url = f"{self.base}{path}" + (f"?{query}" if query else "")
        req = urllib.request.Request(
            url, data=body if verb == "PUT" else None, method=verb,
            headers={**ms, "Authorization": auth},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return r.read()

    def list_blobs(self, container: str, prefix: str = "") -> list[tuple[str, int]]:
        from xml.etree import ElementTree

        q = "restype=container&comp=list"
        if prefix:
            q += f"&prefix={urllib.parse.quote(prefix, safe='')}"
        xml = self._call("GET", f"/{container}", q)
        root = ElementTree.fromstring(xml)
        out = []
        for b in root.iter("Blob"):
            out.append((
                b.find("Name").text,
                int(b.find("Properties/Content-Length").text),
            ))
        return out

    def get_blob(self, container: str, name: str) -> bytes:
        return self._call("GET", f"/{container}/{urllib.parse.quote(name)}")

    def put_blob(self, container: str, name: str, data: bytes) -> None:
        self._call(
            "PUT", f"/{container}/{urllib.parse.quote(name)}", body=data,
            extra_ms={"x-ms-blob-type": "BlockBlob"},
        )


class LoopbackAzblob:
    """In-memory container store serving the Blob REST slice with REAL
    SharedKey signature verification on every request."""

    def __init__(self, account: str = "devacct",
                 key_b64: str = base64.b64encode(b"devkey-devkey-devkey").decode(),
                 host: str = "127.0.0.1", port: int = 0):
        self.account, self.key = account, key_b64
        self.blobs: dict[tuple[str, str], bytes] = {}
        self._lock = threading.Lock()
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, body: bytes, ctype="application/xml"):
                self.send_response(code)
                self.send_header("content-type", ctype)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _verified(self, verb: str, body: bytes) -> bool:
                parsed = urllib.parse.urlsplit(self.path)
                ms = {
                    k.lower(): v for k, v in self.headers.items()
                    if k.lower().startswith("x-ms-")
                }
                clen = str(len(body)) if body else ""
                want = azblob_shared_key(
                    verb, store.account, store.key, parsed.path,
                    parsed.query, ms, clen)
                return hmac.compare_digest(
                    self.headers.get("Authorization", ""), want)

            def do_GET(self):
                if not self._verified("GET", b""):
                    self._reply(403, b"<Error><Code>AuthenticationFailed</Code></Error>")
                    return
                parsed = urllib.parse.urlsplit(self.path)
                parts = parsed.path.lstrip("/").split("/", 1)
                container = parts[0]
                q = urllib.parse.parse_qs(parsed.query)
                if q.get("comp") == ["list"]:
                    prefix = q.get("prefix", [""])[0]
                    with store._lock:
                        blobs = sorted(
                            (k, len(v)) for (c, k), v in store.blobs.items()
                            if c == container and k.startswith(prefix)
                        )
                    body = (
                        '<?xml version="1.0"?><EnumerationResults><Blobs>'
                        + "".join(
                            f"<Blob><Name>{_xml_escape(k)}</Name><Properties>"
                            f"<Content-Length>{n}</Content-Length>"
                            "</Properties></Blob>"
                            for k, n in blobs
                        )
                        + "</Blobs></EnumerationResults>"
                    ).encode()
                    self._reply(200, body)
                    return
                name = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
                with store._lock:
                    data = store.blobs.get((container, name))
                if data is None:
                    self._reply(404, b"<Error><Code>BlobNotFound</Code></Error>")
                else:
                    self._reply(200, data, ctype="application/octet-stream")

            def do_PUT(self):
                n = int(self.headers.get("content-length") or 0)
                body = self.rfile.read(n) if n else b""
                if not self._verified("PUT", body):
                    self._reply(403, b"<Error><Code>AuthenticationFailed</Code></Error>")
                    return
                parts = urllib.parse.urlsplit(self.path).path.lstrip("/").split("/", 1)
                if len(parts) != 2 or not parts[1]:
                    self._reply(400, b"<Error><Code>InvalidUri</Code></Error>")
                    return
                with store._lock:
                    store.blobs[(parts[0], urllib.parse.unquote(parts[1]))] = body
                self._reply(201, b"")

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

    def start(self) -> "LoopbackAzblob":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
