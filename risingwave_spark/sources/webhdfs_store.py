"""WebHDFS file sink backend — client + loopback over the PUBLIC
WebHDFS REST API (hadoop.apache.org/docs/stable/hadoop-project-dist/
hadoop-hdfs/WebHDFS.html).

Reference parity: `src/connector/src/sink/file_sink/webhdfs.rs`
(options webhdfs.endpoint / webhdfs.path; opendal's webhdfs backend).
The protocol's signature two-step CREATE is implemented faithfully:
``PUT /webhdfs/v1/{path}?op=CREATE`` answers **307 Temporary
Redirect** with the datanode Location, and the client re-PUTs the
data there — the loopback plays both namenode and datanode roles and
only accepts data on the redirected URL (a client that skips the
dance fails). Reads: ``GET op=OPEN``; listing: ``GET op=LISTSTATUS``
returning the spec's FileStatuses JSON."""

from __future__ import annotations

import json
import socket
import threading
import urllib.parse
import urllib.request


class WebHdfsClient:
    def __init__(self, endpoint: str, timeout: float = 30.0):
        self.base = endpoint.rstrip("/")
        self.timeout = timeout

    def create(self, path: str, data: bytes) -> None:
        """The two-step CREATE: namenode 307 → datanode PUT."""
        url = f"{self.base}/webhdfs/v1{path}?op=CREATE&overwrite=true"

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, *a, **k):
                return None

        opener = urllib.request.build_opener(_NoRedirect)
        req = urllib.request.Request(url, method="PUT")
        try:
            opener.open(req, timeout=self.timeout)
            raise OSError(
                "webhdfs CREATE did not redirect (expected 307 to the "
                "datanode)")
        except urllib.error.HTTPError as e:
            if e.code != 307:
                raise OSError(
                    f"webhdfs CREATE: HTTP {e.code} "
                    f"{e.read().decode(errors='replace')[:200]}") from e
            location = e.headers["Location"]
        req2 = urllib.request.Request(location, data=data, method="PUT")
        with urllib.request.urlopen(req2, timeout=self.timeout) as r:
            if r.status not in (200, 201):
                raise OSError(f"webhdfs datanode PUT: HTTP {r.status}")

    def open(self, path: str) -> bytes:
        url = f"{self.base}/webhdfs/v1{path}?op=OPEN"
        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            return r.read()

    def list_status(self, path: str) -> list[dict]:
        url = f"{self.base}/webhdfs/v1{path}?op=LISTSTATUS"
        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            return json.loads(r.read())["FileStatuses"]["FileStatus"]


class LoopbackWebHdfs:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import http.server
        import socket
        import socketserver

        self.files: dict[str, bytes] = {}
        self._lock = threading.Lock()
        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, body: bytes = b"",
                       headers: dict | None = None):
                self.send_response(code)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _parse(self):
                u = urllib.parse.urlparse(self.path)
                q = dict(urllib.parse.parse_qsl(u.query))
                assert u.path.startswith("/webhdfs/v1")
                return u.path[len("/webhdfs/v1"):], q

            def do_PUT(self):
                path, q = self._parse()
                op = q.get("op", "").upper()
                n = int(self.headers.get("content-length") or 0)
                data = self.rfile.read(n) if n else b""
                if op == "CREATE" and "datanode" not in q:
                    # namenode role: redirect to "the datanode"
                    host, port = server.host, server.port
                    loc = (f"http://{host}:{port}/webhdfs/v1{path}"
                           f"?op=CREATE&datanode=true")
                    return self._reply(307, headers={"Location": loc})
                if op == "CREATE":
                    with server._lock:
                        server.files[path] = data
                    return self._reply(201)
                self._reply(400, b'{"RemoteException":{}}')

            def do_GET(self):
                path, q = self._parse()
                op = q.get("op", "").upper()
                with server._lock:
                    if op == "OPEN":
                        if path not in server.files:
                            return self._reply(404)
                        return self._reply(200, server.files[path])
                    if op == "LISTSTATUS":
                        names = [
                            p[len(path):].lstrip("/")
                            for p in server.files
                            if p.startswith(path.rstrip("/") + "/")
                        ]
                        body = json.dumps({"FileStatuses": {"FileStatus": [
                            {"pathSuffix": n, "type": "FILE",
                             "length": len(server.files[
                                 path.rstrip("/") + "/" + n])}
                            for n in names
                        ]}}).encode()
                        return self._reply(200, body)
                self._reply(400)

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
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def start(self) -> "LoopbackWebHdfs":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
