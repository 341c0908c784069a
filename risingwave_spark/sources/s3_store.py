"""Pure-stdlib Amazon S3 REST client + loopback object store
(reference `src/connector/src/source/filesystem/s3/` S3 file source:
ListObjectsV2 over the bucket, per-object reads; option names from
`S3PropertiesCommon` — s3.region_name, s3.bucket_name, match_pattern,
s3.credentials.access/secret, s3.endpoint_url).

Speaks the PUBLIC S3 REST API (docs.aws.amazon.com/AmazonS3/latest/
API): path-style GET /{bucket}?list-type=2&prefix=…, GET/PUT
/{bucket}/{key}, each request signed with AWS Signature Version 4 for
the `s3` service (canonical request with the query string,
x-amz-content-sha256, host;x-amz-content-sha256;x-amz-date signed
headers). `LoopbackS3` VERIFIES every signature against the same
canonical derivation before serving — the in-sandbox stand-in for the
service, same fixture posture as the Kinesis loopback; point
s3.endpoint_url at a real endpoint (or MinIO) and the bytes are the
same.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import http.server
import socket
import socketserver
import threading
import urllib.parse
import urllib.request
from xml.etree import ElementTree


def _sign(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def s3_sigv4(
    method: str,
    host: str,
    path: str,
    query: str,
    body: bytes,
    region: str,
    access_key: str,
    secret_key: str,
    now: datetime.datetime | None = None,
) -> dict:
    """SigV4 for S3 REST-style requests (spec: canonical URI + canonical
    query string + signed host/x-amz-content-sha256/x-amz-date)."""
    t = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    datestamp = t.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()
    canonical_query = "&".join(sorted(query.split("&"))) if query else ""
    canonical_headers = (
        f"host:{host}\n"
        f"x-amz-content-sha256:{payload_hash}\n"
        f"x-amz-date:{amz_date}\n"
    )
    signed = "host;x-amz-content-sha256;x-amz-date"
    canonical_request = "\n".join(
        [method, path, canonical_query, canonical_headers, signed, payload_hash]
    )
    scope = f"{datestamp}/{region}/s3/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical_request.encode()).hexdigest(),
    ])
    k = _sign(("AWS4" + secret_key).encode(), datestamp)
    k = _sign(k, region)
    k = _sign(k, "s3")
    k = _sign(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    return {
        "X-Amz-Date": amz_date,
        "X-Amz-Content-Sha256": payload_hash,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed}, Signature={signature}"
        ),
    }


class S3Client:
    def __init__(self, endpoint: str, region: str = "us-east-1",
                 access_key: str = "test", secret_key: str = "test",
                 timeout: float = 30.0):
        self.base = endpoint.rstrip("/")
        self.host = self.base.split("://", 1)[-1]
        self.region = region
        self.access_key, self.secret_key = access_key, secret_key
        self.timeout = timeout

    def _call(self, method: str, path: str, query: str = "", body: bytes = b"") -> bytes:
        hdrs = s3_sigv4(method, self.host, path, query, body, self.region,
                        self.access_key, self.secret_key)
        url = f"{self.base}{path}" + (f"?{query}" if query else "")
        req = urllib.request.Request(url, data=body if method == "PUT" else None,
                                     method=method, headers=hdrs)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read()

    def list_objects(self, bucket: str, prefix: str = "") -> list[tuple[str, int]]:
        """ListObjectsV2 → [(key, size)] (single page is plenty for the
        loopback; the builder path on a real cluster paginates via the
        hadoop-aws committer instead)."""
        q = "list-type=2"
        if prefix:
            q += f"&prefix={urllib.parse.quote(prefix, safe='')}"
        xml = self._call("GET", f"/{bucket}", q)
        root = ElementTree.fromstring(xml)
        ns = root.tag.split("}")[0] + "}" if root.tag.startswith("{") else ""
        out = []
        for c in root.findall(f"{ns}Contents"):
            out.append((c.find(f"{ns}Key").text, int(c.find(f"{ns}Size").text)))
        return out

    def get_object(self, bucket: str, key: str) -> bytes:
        return self._call("GET", f"/{bucket}/{urllib.parse.quote(key)}")

    def put_object(self, bucket: str, key: str, data: bytes) -> None:
        self._call("PUT", f"/{bucket}/{urllib.parse.quote(key)}", body=data)


class LoopbackS3:
    """In-memory bucket store serving the S3 REST slice the connector
    needs, with REAL SigV4 verification on every request."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 region: str = "us-east-1",
                 access_key: str = "test", secret_key: str = "test"):
        self.region = region
        self.access_key, self.secret_key = access_key, secret_key
        self.objects: dict[tuple[str, str], bytes] = {}
        self._lock = threading.Lock()
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, body: bytes, ctype: str = "application/xml"):
                self.send_response(code)
                self.send_header("content-type", ctype)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _verified(self, method: str, body: bytes) -> bool:
                parsed = urllib.parse.urlsplit(self.path)
                want = s3_sigv4(
                    method, self.headers.get("Host", ""), parsed.path,
                    parsed.query, body, store.region, store.access_key,
                    store.secret_key,
                    now=datetime.datetime.strptime(
                        self.headers.get("X-Amz-Date", "19700101T000000Z"),
                        "%Y%m%dT%H%M%SZ",
                    ).replace(tzinfo=datetime.timezone.utc),
                )["Authorization"]
                return hmac.compare_digest(
                    self.headers.get("Authorization", ""), want
                )

            def do_GET(self):
                if not self._verified("GET", b""):
                    self._reply(403, b"<Error><Code>SignatureDoesNotMatch</Code></Error>")
                    return
                parsed = urllib.parse.urlsplit(self.path)
                parts = parsed.path.lstrip("/").split("/", 1)
                bucket = parts[0]
                if len(parts) == 1 or not parts[1]:  # ListObjectsV2
                    q = urllib.parse.parse_qs(parsed.query)
                    prefix = q.get("prefix", [""])[0]
                    with store._lock:
                        keys = sorted(
                            (k, len(v)) for (b, k), v in store.objects.items()
                            if b == bucket and k.startswith(prefix)
                        )
                    body = (
                        '<?xml version="1.0"?><ListBucketResult>'
                        + "".join(
                            f"<Contents><Key>{k}</Key><Size>{n}</Size></Contents>"
                            for k, n in keys
                        )
                        + f"<KeyCount>{len(keys)}</KeyCount><IsTruncated>false"
                        "</IsTruncated></ListBucketResult>"
                    ).encode()
                    self._reply(200, body)
                    return
                key = urllib.parse.unquote(parts[1])
                with store._lock:
                    data = store.objects.get((bucket, key))
                if data is None:
                    self._reply(404, b"<Error><Code>NoSuchKey</Code></Error>")
                else:
                    self._reply(200, data, ctype="application/octet-stream")

            def do_PUT(self):
                n = int(self.headers.get("content-length") or 0)
                body = self.rfile.read(n) if n else b""
                if not self._verified("PUT", body):
                    self._reply(403, b"<Error><Code>SignatureDoesNotMatch</Code></Error>")
                    return
                parts = urllib.parse.urlsplit(self.path).path.lstrip("/").split("/", 1)
                if len(parts) != 2 or not parts[1]:
                    self._reply(400, b"<Error><Code>InvalidRequest</Code></Error>")
                    return
                with store._lock:
                    store.objects[(parts[0], urllib.parse.unquote(parts[1]))] = body
                self._reply(200, b"")

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

    def start(self) -> "LoopbackS3":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
