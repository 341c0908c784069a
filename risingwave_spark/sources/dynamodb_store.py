"""DynamoDB sink layer over the REAL AWS JSON 1.0 API with genuine
SigV4 signing (reference `src/connector/src/sink/dynamodb.rs`:
batched PutItem/DeleteItem writes keyed by the table's key schema;
options table/dynamodb.table + the shared aws endpoint/credential
set).

The client issues the public `DynamoDB_20120810.*` actions
(docs.aws.amazon.com/amazondynamodb/latest/APIReference) —
CreateTable, PutItem, DeleteItem, Scan — as X-Amz-Target JSON-RPC
posts with DynamoDB's typed attribute values ({"S": …}, {"N": …},
{"BOOL": …}, {"NULL": true}), signed with the same SigV4 derivation
the Kinesis connector uses (content-type x-amz-json-1.0). The
loopback service VERIFIES every signature before serving — the same
fixture posture as the Kinesis/S3 loopbacks.
"""

from __future__ import annotations

import http.server
import json
import socket
import socketserver
import threading
import urllib.request

from risingwave_spark.sources.kinesis import sigv4_headers

CTYPE = "application/x-amz-json-1.0"


def to_attr(v):
    """Python value → DynamoDB typed attribute value."""
    if v is None:
        return {"NULL": True}
    if isinstance(v, bool):
        return {"BOOL": v}
    if isinstance(v, (int, float)):
        return {"N": repr(v) if isinstance(v, float) else str(v)}
    return {"S": str(v)}


def from_attr(av: dict):
    t, v = next(iter(av.items()))
    if t == "NULL":
        return None
    if t == "BOOL":
        return bool(v)
    if t == "N":
        f = float(v)
        return int(f) if f.is_integer() else f
    return v


class DynamoClient:
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
        target = f"DynamoDB_20120810.{action}"
        hdrs = sigv4_headers(
            "POST", self.host, "/", body, self.region, "dynamodb",
            self.access_key, self.secret_key, target, content_type=CTYPE,
        )
        req = urllib.request.Request(self.base + "/", data=body, headers=hdrs)
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read() or b"{}")

    def create_table(self, table: str, key_attrs: list[str]) -> dict:
        return self._call("CreateTable", {
            "TableName": table,
            "KeySchema": [
                {"AttributeName": k, "KeyType": "HASH" if i == 0 else "RANGE"}
                for i, k in enumerate(key_attrs)
            ],
        })

    def put_item(self, table: str, item: dict) -> None:
        self._call("PutItem", {
            "TableName": table,
            "Item": {k: to_attr(v) for k, v in item.items()},
        })

    def delete_item(self, table: str, key: dict) -> None:
        self._call("DeleteItem", {
            "TableName": table,
            "Key": {k: to_attr(v) for k, v in key.items()},
        })

    def scan(self, table: str) -> list[dict]:
        resp = self._call("Scan", {"TableName": table})
        return [
            {k: from_attr(av) for k, av in item.items()}
            for item in resp.get("Items", [])
        ]


class LoopbackDynamo:
    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 region: str = "us-east-1",
                 access_key: str = "test", secret_key: str = "test"):
        self.region = region
        self.access_key, self.secret_key = access_key, secret_key
        # table -> {"keys": [attr...], "items": {key_tuple: item_dict}}
        self.tables: dict[str, dict] = {}
        self._lock = threading.Lock()
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("content-type", CTYPE)
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
                        self.headers.get("X-Amz-Date", ""), "%Y%m%dT%H%M%SZ"
                    ).replace(tzinfo=datetime.timezone.utc)
                except ValueError:
                    self._reply(403, {"__type": "InvalidSignatureException"})
                    return
                want = sigv4_headers(
                    "POST", self.headers.get("Host", ""), "/", body,
                    store.region, "dynamodb", store.access_key,
                    store.secret_key, target, now=t, content_type=CTYPE,
                )["Authorization"]
                if not _hmac.compare_digest(
                    self.headers.get("Authorization", ""), want
                ):
                    self._reply(403, {"__type": "InvalidSignatureException"})
                    return
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
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "LoopbackDynamo":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def _serve(self, action: str, req: dict) -> tuple[int, dict]:
        with self._lock:
            if action == "CreateTable":
                name = req["TableName"]
                if name not in self.tables:
                    self.tables[name] = {
                        "keys": [k["AttributeName"] for k in req["KeySchema"]],
                        "items": {},
                    }
                return 200, {"TableDescription": {"TableName": name}}
            t = self.tables.get(req.get("TableName", ""))
            if t is None:
                return 400, {"__type": "ResourceNotFoundException",
                             "message": f"table {req.get('TableName')!r} not found"}
            if action == "PutItem":
                item = req["Item"]
                key = tuple(json.dumps(item.get(k)) for k in t["keys"])
                if any(item.get(k) is None for k in t["keys"]):
                    return 400, {"__type": "ValidationException",
                                 "message": "missing key attribute"}
                t["items"][key] = item
                return 200, {}
            if action == "DeleteItem":
                key = tuple(json.dumps(req["Key"].get(k)) for k in t["keys"])
                t["items"].pop(key, None)
                return 200, {}
            if action == "Scan":
                items = [t["items"][k] for k in sorted(t["items"])]
                return 200, {"Items": items, "Count": len(items)}
        return 400, {"__type": "UnknownOperationException"}
