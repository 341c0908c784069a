"""Loopback Pulsar broker fixture — a single-node broker speaking the
binary-protocol slice the client does (CONNECT/CONNECTED, PRODUCER,
SEND/SEND_RECEIPT, SUBSCRIBE, FLOW, MESSAGE, ACK, CLOSE_*, PING/PONG),
payload frames with verified CRC32C — the in-sandbox stand-in for a
real `pulsar standalone` (reference e2e pulsar cases run against one
the same way); the engine's source/sink exchange genuine protocol
bytes with it over a TCP socket.

State model: one message log per topic (ledgerId 0, entryId =
append index — a real broker's managed ledger spreads entries over
BookKeeper ledgers; one ledger is the single-node equivalent);
subscriptions are durable cursors keyed (topic, subscription) holding
the set of individually-acked entry ids. FLOW delivers up to `permits`
UNACKED messages synchronously on the consumer's connection —
a real broker dispatches asynchronously from other threads; the
synchronous order makes the client's PING barrier an exact
end-of-backlog boundary (documented divergence, same pattern as the
other loopback fixtures). Partitioned topics, batching, compression
and TLS are out of scope."""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from risingwave_spark.sources.kafka_wire import crc32c
from risingwave_spark.sources.pulsar_wire import (
    ACK,
    CLOSE_CONSUMER,
    CLOSE_PRODUCER,
    CONNECT,
    CONNECTED,
    FLOW,
    MAGIC,
    MESSAGE,
    PING,
    PONG,
    PRODUCER,
    PRODUCER_SUCCESS,
    SEND,
    SEND_RECEIPT,
    SUBSCRIBE,
    SUCCESS,
    UNSUBSCRIBE,
    base_command,
    decode_fields,
    f_bytes,
    f_str,
    f_varint,
    message_id,
    one,
    parse_message_id,
)


class LoopbackPulsarBroker:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._lock = threading.Lock()
        # topic -> [(metadata bytes, payload bytes)], entryId = index
        self.topics: dict[str, list] = {}
        # (topic, subscription) -> {"acked": set[int]}
        self.subs: dict[tuple[str, str], dict] = {}
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                self._buf = b""
                self._producers: dict[int, str] = {}   # producer_id -> topic
                self._consumers: dict[int, tuple[str, str]] = {}
                try:
                    while True:
                        frame = self._read_frame()
                        if frame is None:
                            return
                        broker._dispatch(self, *frame)
                except OSError:
                    return

            def _recv_exact(self, n):
                while len(self._buf) < n:
                    try:
                        chunk = self.request.recv(65536)
                    except OSError:
                        return None
                    if not chunk:
                        return None
                    self._buf += chunk
                out, self._buf = self._buf[:n], self._buf[n:]
                return out

            def _read_frame(self):
                hdr = self._recv_exact(4)
                if hdr is None:
                    return None
                (total,) = struct.unpack(">I", hdr)
                frame = self._recv_exact(total)
                if frame is None:
                    return None
                (csize,) = struct.unpack(">I", frame[:4])
                cmd = decode_fields(frame[4:4 + csize])
                metadata = payload = None
                rest = frame[4 + csize:]
                if rest:
                    magic, crc = struct.unpack(">HI", rest[:6])
                    tail = rest[6:]
                    if magic != MAGIC or crc32c(tail) != crc:
                        raise OSError("payload checksum mismatch")
                    (msize,) = struct.unpack(">I", tail[:4])
                    metadata = tail[4:4 + msize]
                    payload = tail[4 + msize:]
                return one(cmd, 1), cmd, metadata, payload

            def send_cmd(self, cmd: bytes) -> None:
                self.request.sendall(
                    struct.pack(">II", 4 + len(cmd), len(cmd)) + cmd)

            def send_payload_cmd(self, cmd: bytes, metadata: bytes, payload: bytes) -> None:
                tail = struct.pack(">I", len(metadata)) + metadata + payload
                body = (
                    struct.pack(">I", len(cmd)) + cmd
                    + struct.pack(">HI", MAGIC, crc32c(tail)) + tail
                )
                self.request.sendall(struct.pack(">I", len(body)) + body)

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

    def start(self) -> "LoopbackPulsarBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # ----------------------------------------------------------- commands
    def _dispatch(self, h, ctype, cmd, metadata, payload) -> None:
        if ctype == CONNECT:
            h.send_cmd(base_command(
                CONNECTED, f_str(1, "loopback-pulsar") + f_varint(2, 19)))
        elif ctype == PING:
            h.send_cmd(base_command(PONG, b""))
        elif ctype == PONG:
            pass
        elif ctype == PRODUCER:
            p = decode_fields(cmd[PRODUCER][0])
            topic = one(p, 1, b"").decode()
            pid, rid = one(p, 2, 0), one(p, 3, 0)
            with self._lock:
                self.topics.setdefault(topic, [])
            h._producers[pid] = topic
            h.send_cmd(base_command(
                PRODUCER_SUCCESS,
                f_varint(1, rid) + f_str(2, f"loopback-{pid}")))
        elif ctype == SEND:
            s = decode_fields(cmd[SEND][0])
            pid, seq = one(s, 1, 0), one(s, 2, 0)
            topic = h._producers.get(pid)
            if topic is None:
                raise OSError("SEND before PRODUCER")
            with self._lock:
                log = self.topics[topic]
                entry = len(log)
                log.append((metadata or b"", payload or b""))
            h.send_cmd(base_command(
                SEND_RECEIPT,
                f_varint(1, pid) + f_varint(2, seq)
                + f_bytes(3, message_id(0, entry))))
        elif ctype == SUBSCRIBE:
            s = decode_fields(cmd[SUBSCRIBE][0])
            topic = one(s, 1, b"").decode()
            sub = one(s, 2, b"").decode()
            cid, rid = one(s, 4, 0), one(s, 5, 0)
            with self._lock:
                self.topics.setdefault(topic, [])
                self.subs.setdefault((topic, sub), {"acked": set()})
            h._consumers[cid] = (topic, sub)
            h.send_cmd(base_command(SUCCESS, f_varint(1, rid)))
        elif ctype == FLOW:
            f = decode_fields(cmd[FLOW][0])
            cid, permits = one(f, 1, 0), one(f, 2, 0)
            topic, sub = h._consumers[cid]
            with self._lock:
                log = list(self.topics.get(topic, []))
                acked = set(self.subs[(topic, sub)]["acked"])
            n = 0
            for entry, (md, pl) in enumerate(log):
                if n >= permits:
                    break
                if entry in acked:
                    continue
                mcmd = base_command(
                    MESSAGE,
                    f_varint(1, cid) + f_bytes(2, message_id(0, entry)))
                h.send_payload_cmd(mcmd, md, pl)
                n += 1
        elif ctype == ACK:
            a = decode_fields(cmd[ACK][0])
            cid = one(a, 1, 0)
            topic, sub = h._consumers[cid]
            with self._lock:
                for mid in a.get(3, []):
                    _ledger, entry = parse_message_id(mid)
                    self.subs[(topic, sub)]["acked"].add(entry)
        elif ctype in (CLOSE_PRODUCER, CLOSE_CONSUMER, UNSUBSCRIBE):
            c = decode_fields(cmd[ctype][0])
            h.send_cmd(base_command(SUCCESS, f_varint(1, one(c, 2, 0))))
        else:
            raise OSError(f"unsupported command type {ctype}")
