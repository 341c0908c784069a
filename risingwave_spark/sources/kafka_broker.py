"""Loopback Kafka broker fixture — a single-node, plaintext,
auto-create-topics broker speaking the same wire slice the client does
(ApiVersions v0, Metadata v1, Produce v3, Fetch v4, ListOffsets v1),
message format v2 only.

This is the in-sandbox stand-in for a real cluster (reference
`e2e_test/source_inline/` runs against a real broker the same way):
the engine's kafka source/sink talk to it over genuine protocol bytes
on a TCP socket, so the whole connector path — produce → fetch →
decode → changelog fold → formatter → produce — is exercised
end-to-end without jars. Retention, replication, consumer groups and
compression are out of scope: the engine tracks its own offsets
durably (the reference reader also manages offsets itself,
`source/kafka/source/reader.rs` — it never relies on broker-side
group commits)."""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
import time

from risingwave_spark.sources.kafka_wire import (
    API_FETCH,
    API_LIST_OFFSETS,
    API_METADATA,
    API_PRODUCE,
    API_VERSIONS,
    Reader,
    decode_record_batches,
    enc_bytes,
    enc_i8,
    enc_i16,
    enc_i32,
    enc_i64,
    enc_string,
    encode_record_batch,
)


class LoopbackKafkaBroker:
    """In-memory broker, `num_partitions` partitions per topic. Topics
    auto-create on first produce or metadata mention (broker default
    auto.create.topics.enable)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, num_partitions: int = 1):
        self.num_partitions = num_partitions
        self._log: dict[tuple[str, int], list] = {}  # (topic,part) -> records
        self._lock = threading.Lock()
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    while True:
                        hdr = self._recv_n(4)
                        if hdr is None:
                            return
                        (n,) = struct.unpack(">i", hdr)
                        raw = self._recv_n(n)
                        if raw is None:
                            return
                        resp = broker._dispatch(raw)
                        self.request.sendall(struct.pack(">i", len(resp)) + resp)
                except (ConnectionError, OSError):
                    return

            def _recv_n(self, n):
                buf = bytearray()
                while len(buf) < n:
                    c = self.request.recv(n - len(buf))
                    if not c:
                        return None
                    buf += c
                return bytes(buf)

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

    def start(self) -> "LoopbackKafkaBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def _topic(self, name: str, partition: int = 0) -> list:
        return self._log.setdefault((name, partition), [])

    # ------------------------------------------------------------ dispatch
    def _dispatch(self, raw: bytes) -> bytes:
        r = Reader(raw)
        api_key, api_version, corr = r.i16(), r.i16(), r.i32()
        r.string()  # client_id
        head = enc_i32(corr)
        if api_key == API_VERSIONS:
            keys = [(API_PRODUCE, 0, 3), (API_FETCH, 0, 4), (API_LIST_OFFSETS, 0, 1),
                    (API_METADATA, 0, 1), (API_VERSIONS, 0, 0)]
            body = enc_i16(0) + enc_i32(len(keys)) + b"".join(
                enc_i16(k) + enc_i16(lo) + enc_i16(hi) for k, lo, hi in keys
            )
            return head + body
        if api_key == API_METADATA:
            return head + self._metadata(r, api_version)
        if api_key == API_PRODUCE:
            return head + self._produce(r)
        if api_key == API_FETCH:
            return head + self._fetch(r)
        if api_key == API_LIST_OFFSETS:
            return head + self._list_offsets(r)
        # UNSUPPORTED_VERSION-style refusal: error code 35 where a
        # header fits; for unknown apis just close by raising
        raise ValueError(f"unsupported api_key {api_key}")

    def _metadata(self, r: Reader, version: int) -> bytes:
        n = r.i32()
        with self._lock:
            if n < 0:
                topics = sorted({t for t, _ in self._log})
            else:
                topics = [r.string() for _ in range(n)]
                for t in topics:
                    for p in range(self.num_partitions):
                        self._topic(t, p)  # auto-create all partitions
        body = enc_i32(1) + enc_i32(0) + enc_string(self.host) + enc_i32(self.port) + enc_string(None)
        body += enc_i32(0)  # controller_id
        body += enc_i32(len(topics))
        for t in topics:
            body += enc_i16(0) + enc_string(t) + enc_i8(0)  # error, name, internal
            body += enc_i32(self.num_partitions)
            for p in range(self.num_partitions):
                body += enc_i16(0) + enc_i32(p) + enc_i32(0)  # error, pid, leader
                body += enc_i32(1) + enc_i32(0)  # replicas [0]
                body += enc_i32(1) + enc_i32(0)  # isr [0]
        return body

    def _produce(self, r: Reader) -> bytes:
        r.string()  # transactional_id
        r.i16()  # acks (single node: always fully acked)
        r.i32()  # timeout
        resps = b""
        ntop = r.i32()
        out_topics = []
        for _ in range(ntop):
            topic = r.string()
            parts = []
            for _ in range(r.i32()):
                pid = r.i32()
                record_set = r.bytes_()
                recs = decode_record_batches(record_set or b"")
                with self._lock:
                    log = self._topic(topic, pid)
                    base = len(log)
                    now = int(time.time() * 1000)
                    for _off, ts, key, value in recs:
                        log.append((ts if ts >= 0 else now, key, value))
                parts.append((pid, 0, base))
            out_topics.append((topic, parts))
        resps += enc_i32(len(out_topics))
        for topic, parts in out_topics:
            resps += enc_string(topic) + enc_i32(len(parts))
            for pid, err, base in parts:
                resps += enc_i32(pid) + enc_i16(err) + enc_i64(base) + enc_i64(-1)
        resps += enc_i32(0)  # throttle_time
        return resps

    def _fetch(self, r: Reader) -> bytes:
        r.i32()  # replica_id
        r.i32()  # max_wait
        r.i32()  # min_bytes
        r.i32()  # max_bytes
        r.i8()  # isolation
        body = enc_i32(0)  # throttle_time
        ntop = r.i32()
        body += enc_i32(ntop)
        for _ in range(ntop):
            topic = r.string()
            nparts = r.i32()
            body += enc_string(topic) + enc_i32(nparts)
            for _ in range(nparts):
                pid = r.i32()
                fetch_offset = r.i64()
                part_max_bytes = r.i32()
                with self._lock:
                    log = list(self._topic(topic, pid))
                hwm = len(log)
                if fetch_offset < hwm:
                    # honor the partition max_bytes cap like a real
                    # broker: accumulate records until the estimated
                    # wire size crosses it, always making ≥1 record of
                    # progress (Kafka's own fetch contract) — this is
                    # what lets the engine's segment-wise ingest bound
                    # its per-poll memory
                    slice_, size = [], 0
                    for ts, k, v in log[fetch_offset:]:
                        size += 70 + len(k or b"") + len(v or b"")
                        if slice_ and size > part_max_bytes:
                            break
                        slice_.append((k, v, ts))
                    rs = encode_record_batch(slice_, base_offset=fetch_offset)
                else:
                    rs = b""
                body += (
                    enc_i32(pid)
                    + enc_i16(0)
                    + enc_i64(hwm)  # high watermark
                    + enc_i64(hwm)  # last stable offset
                    + enc_i32(0)  # aborted txns
                    + enc_bytes(rs)
                )
        return body

    def _list_offsets(self, r: Reader) -> bytes:
        r.i32()  # replica_id
        body = b""
        ntop = r.i32()
        body += enc_i32(ntop)
        for _ in range(ntop):
            topic = r.string()
            nparts = r.i32()
            body += enc_string(topic) + enc_i32(nparts)
            for _ in range(nparts):
                pid = r.i32()
                ts = r.i64()
                with self._lock:
                    n = len(self._topic(topic, pid))
                off = 0 if ts == -2 else n
                body += enc_i32(pid) + enc_i16(0) + enc_i64(-1) + enc_i64(off)
        return body
