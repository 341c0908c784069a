"""Kinesis connector wire layer — the REAL AWS Kinesis Data Streams
HTTP API (public spec: docs.aws.amazon.com/kinesis/latest/APIReference):
JSON bodies POSTed with `X-Amz-Target: Kinesis_20131202.<Action>`,
signed with genuine AWS Signature Version 4 (the public SigV4 spec,
implemented with stdlib hmac/hashlib — same discipline as the webhook
source's HMAC validation).

Reference parity: `src/connector/src/source/kinesis/` (shard readers
with per-shard sequence offsets) and `sink/kinesis.rs` (PutRecords with
partition keys). The reference links the AWS SDK; this engine has no
SDK in-sandbox, so the client speaks the wire directly — the same
bytes work against real Kinesis (endpoint + credentials are config).
The loopback fixture VERIFIES each request's SigV4 signature against
its configured credentials before serving it, so the signing path is
exercised end-to-end, not stubbed.

Shard routing follows the real service contract: MD5(partition key)
as a 128-bit integer against each shard's hash-key range.
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import hmac
import json
import socket
import threading
import urllib.request


# ---------------------------------------------------------------- SigV4
def _sign(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sigv4_headers(
    method: str,
    host: str,
    path: str,
    body: bytes,
    region: str,
    service: str,
    access_key: str,
    secret_key: str,
    amz_target: str,
    now: datetime.datetime | None = None,
    content_type: str = "application/x-amz-json-1.1",
) -> dict:
    """AWS Signature Version 4 (public signing spec): canonical request
    → string-to-sign → derived signing key → Authorization header."""
    t = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    datestamp = t.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()
    canonical_headers = (
        f"content-type:{content_type}\n"
        f"host:{host}\n"
        f"x-amz-date:{amz_date}\n"
        f"x-amz-target:{amz_target}\n"
    )
    signed_headers = "content-type;host;x-amz-date;x-amz-target"
    canonical_request = "\n".join(
        [method, path, "", canonical_headers, signed_headers, payload_hash]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )
    k = _sign(("AWS4" + secret_key).encode(), datestamp)
    k = _sign(k, region)
    k = _sign(k, service)
    k = _sign(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    return {
        "Content-Type": content_type,
        "X-Amz-Date": amz_date,
        "X-Amz-Target": amz_target,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"
        ),
    }


def md5_hash_key(partition_key: str) -> int:
    """Real Kinesis shard routing: MD5 of the partition key as a
    128-bit big-endian integer, compared against shard hash ranges."""
    return int.from_bytes(hashlib.md5(partition_key.encode()).digest(), "big")


# ------------------------------------------------------------- the client
class KinesisClient:
    """Minimal Kinesis API client over urllib: DescribeStream /
    PutRecords / GetShardIterator / GetRecords — the verbs a source
    reader and sink writer need (reference kinesis reader's
    per-shard-iterator poll loop)."""

    def __init__(
        self,
        endpoint: str,
        region: str = "us-east-1",
        access_key: str = "test",
        secret_key: str = "test",
    ):
        self.endpoint = endpoint.rstrip("/")
        self.host = endpoint.split("://", 1)[-1].rstrip("/")
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key

    def _call(self, action: str, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        target = f"Kinesis_20131202.{action}"
        headers = sigv4_headers(
            "POST", self.host, "/", body, self.region, "kinesis",
            self.access_key, self.secret_key, target,
        )
        req = urllib.request.Request(
            self.endpoint + "/", data=body, headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read().decode() or "{}")

    def describe_stream(self, stream: str) -> dict:
        return self._call("DescribeStream", {"StreamName": stream})

    def put_records(self, stream: str, records: list[tuple[str, bytes]]) -> dict:
        """records = [(partition_key, data_bytes)]."""
        return self._call(
            "PutRecords",
            {
                "StreamName": stream,
                "Records": [
                    {"PartitionKey": pk, "Data": base64.b64encode(d).decode()}
                    for pk, d in records
                ],
            },
        )

    def get_shard_iterator(
        self, stream: str, shard_id: str, seq: str | None = None
    ) -> str:
        p: dict = {"StreamName": stream, "ShardId": shard_id}
        if seq is None:
            p["ShardIteratorType"] = "TRIM_HORIZON"
        else:
            p["ShardIteratorType"] = "AFTER_SEQUENCE_NUMBER"
            p["StartingSequenceNumber"] = seq
        return self._call("GetShardIterator", p)["ShardIterator"]

    def get_records(self, iterator: str, limit: int = 10000) -> dict:
        out = self._call("GetRecords", {"ShardIterator": iterator, "Limit": limit})
        for r in out.get("Records", []):
            r["Data"] = base64.b64decode(r["Data"])
        return out


# ----------------------------------------------------------- the fixture
class LoopbackKinesis:
    """In-memory Kinesis service on a loopback HTTP listener. Verifies
    every request's SigV4 signature against its configured credentials
    (403 on mismatch — the real service's behavior), routes partition
    keys to shards by MD5 hash range, and serves shard iterators as
    (stream, shard, position) tokens."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        shards: int = 1,
        access_key: str = "test",
        secret_key: str = "test",
        region: str = "us-east-1",
    ):
        import http.server

        self.n_shards = shards
        self.access_key, self.secret_key, self.region = access_key, secret_key, region
        self._streams: dict[str, list[list]] = {}  # stream -> [shard records]
        self._lock = threading.Lock()
        svc = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                target = self.headers.get("X-Amz-Target", "")
                status, resp = svc._serve(self.headers, body, target)
                data = json.dumps(resp).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        import socket
        import socketserver

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
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "LoopbackKinesis":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # ---------------------------------------------------------- serving
    def _verify(self, headers, body: bytes, target: str) -> bool:
        auth = headers.get("Authorization", "")
        amz_date = headers.get("X-Amz-Date", "")
        host = headers.get("Host", f"{self.host}:{self.port}")
        try:
            t = datetime.datetime.strptime(amz_date, "%Y%m%dT%H%M%SZ").replace(
                tzinfo=datetime.timezone.utc
            )
        except ValueError:
            return False
        want = sigv4_headers(
            "POST", host, "/", body, self.region, "kinesis",
            self.access_key, self.secret_key, target, now=t,
        )["Authorization"]
        return hmac.compare_digest(auth, want)

    def _shard_for(self, pk: str) -> int:
        space = 1 << 128
        width = space // self.n_shards
        return min(md5_hash_key(pk) // width, self.n_shards - 1)

    def _serve(self, headers, body: bytes, target: str):
        if not self._verify(headers, body, target):
            return 403, {"__type": "IncompleteSignatureException"}
        action = target.rsplit(".", 1)[-1]
        p = json.loads(body.decode() or "{}")
        with self._lock:
            if action == "DescribeStream":
                name = p["StreamName"]
                self._streams.setdefault(name, [[] for _ in range(self.n_shards)])
                space = 1 << 128
                width = space // self.n_shards
                shards = [
                    {
                        "ShardId": f"shardId-{i:012d}",
                        "HashKeyRange": {
                            "StartingHashKey": str(i * width),
                            "EndingHashKey": str(
                                (i + 1) * width - 1 if i < self.n_shards - 1 else space - 1
                            ),
                        },
                    }
                    for i in range(self.n_shards)
                ]
                return 200, {
                    "StreamDescription": {
                        "StreamName": name,
                        "StreamStatus": "ACTIVE",
                        "Shards": shards,
                    }
                }
            if action == "PutRecords":
                name = p["StreamName"]
                logs = self._streams.setdefault(
                    name, [[] for _ in range(self.n_shards)]
                )
                results = []
                import time as _time

                now = _time.time()
                for r in p["Records"]:
                    sid = self._shard_for(r["PartitionKey"])
                    seq = len(logs[sid])
                    logs[sid].append(
                        {
                            "SequenceNumber": str(seq),
                            "PartitionKey": r["PartitionKey"],
                            "Data": r["Data"],
                            "ApproximateArrivalTimestamp": now,
                        }
                    )
                    results.append(
                        {"ShardId": f"shardId-{sid:012d}", "SequenceNumber": str(seq)}
                    )
                return 200, {"FailedRecordCount": 0, "Records": results}
            if action == "GetShardIterator":
                name, shard = p["StreamName"], p["ShardId"]
                sid = int(shard.rsplit("-", 1)[-1])
                if p.get("ShardIteratorType") == "TRIM_HORIZON":
                    pos = 0
                else:
                    pos = int(p["StartingSequenceNumber"]) + 1
                return 200, {"ShardIterator": json.dumps([name, sid, pos])}
            if action == "GetRecords":
                name, sid, pos = json.loads(p["ShardIterator"])
                logs = self._streams.setdefault(
                    name, [[] for _ in range(self.n_shards)]
                )
                recs = logs[sid][pos : pos + int(p.get("Limit", 10000))]
                nxt = json.dumps([name, sid, pos + len(recs)])
                return 200, {
                    "Records": recs,
                    "NextShardIterator": nxt,
                    "MillisBehindLatest": 0,
                }
        return 400, {"__type": "UnknownOperationException"}
