"""Elasticsearch/OpenSearch sink layer over the REAL REST API
(reference `src/connector/src/sink/elasticsearch_opensearch/`: bulk
indexer with index-on-upsert / delete-on-retract ops, `_id` built
from the pk columns joined by `delimiter`; options url/index/
username/password/delimiter from its serde renames).

The client speaks the public `_bulk` NDJSON contract
(elastic.co/guide — Bulk API): action lines
`{"index": {"_index": …, "_id": …}}` followed by the document, or
`{"delete": {…}}` alone; Basic auth when credentials are set. The
loopback service serves `_bulk`, `_search` and `_doc` lookups over
the same JSON shapes and VERIFIES the Authorization header — the
in-sandbox stand-in for a cluster, same fixture posture as the other
loopbacks.
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


class EsClient:
    def __init__(self, url: str, username: str | None = None,
                 password: str | None = None, timeout: float = 30.0):
        self.base = url.rstrip("/")
        self.auth = None
        if username is not None:
            token = base64.b64encode(f"{username}:{password or ''}".encode()).decode()
            self.auth = f"Basic {token}"
        self.timeout = timeout

    def _call(self, method: str, path: str, body: bytes = b"",
              ctype: str = "application/json") -> dict:
        hdrs = {"content-type": ctype}
        if self.auth:
            hdrs["Authorization"] = self.auth
        req = urllib.request.Request(
            f"{self.base}{path}", data=body or None, method=method, headers=hdrs)
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read() or b"{}")

    def bulk(self, actions: list[tuple[str, str, str, dict | None]]) -> dict:
        """actions: (op 'index'|'delete', index, id, doc|None) → one
        _bulk call in NDJSON framing."""
        lines = []
        for op, index, _id, doc in actions:
            lines.append(json.dumps({op: {"_index": index, "_id": _id}}))
            if op == "index":
                lines.append(json.dumps(doc, sort_keys=True))
        body = ("\n".join(lines) + "\n").encode()
        resp = self._call("POST", "/_bulk", body, ctype="application/x-ndjson")
        if resp.get("errors"):
            raise OSError(f"elasticsearch bulk errors: {resp}")
        return resp

    def search(self, index: str) -> dict[str, dict]:
        """All docs of an index → {_id: _source} (verification helper)."""
        resp = self._call("GET", f"/{index}/_search")
        return {
            h["_id"]: h["_source"] for h in resp.get("hits", {}).get("hits", [])
        }


class LoopbackEs:
    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 username: str | None = None, password: str | None = None):
        self.docs: dict[tuple[str, str], dict] = {}
        self._lock = threading.Lock()
        want_auth = None
        if username is not None:
            token = base64.b64encode(f"{username}:{password or ''}".encode()).decode()
            want_auth = f"Basic {token}"
        store = self

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

            def _authed(self) -> bool:
                return want_auth is None or self.headers.get("Authorization") == want_auth

            def do_POST(self):
                if not self._authed():
                    self._reply(401, {"error": "unauthorized"})
                    return
                if urllib.parse.urlsplit(self.path).path != "/_bulk":
                    self._reply(404, {"error": "unknown endpoint"})
                    return
                n = int(self.headers.get("content-length") or 0)
                lines = [
                    ln for ln in self.rfile.read(n).decode().split("\n") if ln
                ]
                items = []
                i = 0
                with store._lock:
                    while i < len(lines):
                        action = json.loads(lines[i])
                        op = next(iter(action))
                        meta = action[op]
                        key = (meta["_index"], str(meta["_id"]))
                        if op == "index":
                            store.docs[key] = json.loads(lines[i + 1])
                            i += 2
                        elif op == "delete":
                            store.docs.pop(key, None)
                            i += 1
                        else:
                            self._reply(400, {"error": f"unsupported op {op}"})
                            return
                        items.append({op: {"_index": key[0], "_id": key[1],
                                           "status": 200}})
                self._reply(200, {"errors": False, "items": items})

            def do_GET(self):
                if not self._authed():
                    self._reply(401, {"error": "unauthorized"})
                    return
                parts = urllib.parse.urlsplit(self.path).path.strip("/").split("/")
                if len(parts) == 2 and parts[1] == "_search":
                    with store._lock:
                        hits = [
                            {"_index": ix, "_id": _id, "_source": doc}
                            for (ix, _id), doc in sorted(store.docs.items())
                            if ix == parts[0]
                        ]
                    self._reply(200, {"hits": {"total": {"value": len(hits)},
                                               "hits": hits}})
                    return
                if len(parts) == 3 and parts[1] == "_doc":
                    with store._lock:
                        doc = store.docs.get((parts[0], parts[2]))
                    if doc is None:
                        self._reply(404, {"found": False})
                    else:
                        self._reply(200, {"found": True, "_source": doc})
                    return
                self._reply(404, {"error": "unknown endpoint"})

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

    def start(self) -> "LoopbackEs":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
