"""Pure-stdlib NATS + JetStream wire client (reference
`/root/reference/src/connector/src/source/nats/` source and
`src/connector/src/sink/nats.rs` sink, which speak the same protocol
via async-nats). NATS core is a TEXT protocol (nats-io docs,
"NATS protocol"): the server greets with `INFO {json}`, the client
answers `CONNECT {json}`, and the rest is `PUB/SUB/UNSUB/MSG/HMSG/
PING/PONG/+OK/-ERR` lines with CRLF framing and raw payload bytes.

Durable consumption rides JetStream, which is itself layered on core
NATS request/reply (the reference uses async-nats' pull consumers —
`nats/source/reader.rs` `consumer::pull::Config`):

- publish-with-reply to a stream subject → server answers a PubAck
  (`{"stream":..,"seq":..}`) on the reply inbox;
- `$JS.API.STREAM.CREATE.<stream>` / `$JS.API.CONSUMER.DURABLE.
  CREATE.<stream>.<durable>` are JSON request/reply API calls;
- a pull is a PUB to `$JS.API.CONSUMER.MSG.NEXT.<stream>.<durable>`
  with `{"batch":N,"no_wait":true}` and an inbox reply; messages come
  back as MSGs on the inbox whose OWN reply subject is the ack token
  (`$JS.ACK.<stream>.<durable>.<delivered>.<sseq>.<dseq>.<ts>.
  <pending>`), and a 404 `HMSG` status terminates an unfilled batch;
- acking is publishing `+ACK` to that token subject.

At-least-once ingest contract: the engine folds a changelog segment
FIRST and acks its messages after — an un-acked message stays pending
on the durable consumer and redelivers on the next pull, JetStream's
own explicit-ack redelivery playing the role Kafka's uncommitted
offsets play elsewhere in this engine.
"""

from __future__ import annotations

import json
import socket
import uuid


def _nodelay_connect(addr, timeout=None):
    """connect + TCP_NODELAY: every protocol here is request-
    reply; Nagle's algorithm turns small write-write-read
    exchanges into ~40 ms delayed-ACK stalls per round trip."""
    s = socket.create_connection(addr, timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s



class NatsClient:
    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = _nodelay_connect((host, port), timeout=timeout)
        self._buf = b""
        self._sid = 0
        # server greets first: INFO {json}
        op = self._read_op()
        if op[0] != "INFO":
            raise OSError(f"expected INFO from server, got {op[0]}")
        self.server_info = op[1]
        self._send(
            b"CONNECT "
            + json.dumps(
                {"verbose": False, "pedantic": False, "lang": "python", "headers": True}
            ).encode()
            + b"\r\n"
        )

    # ------------------------------------------------------------ wire io
    def _send(self, data: bytes) -> None:
        self.sock.sendall(data)

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("nats connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("nats connection closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_op(self):
        """Parse ONE protocol operation. PING is answered inline (the
        server drops clients that miss the ping deadline)."""
        while True:
            line = self._read_line()
            if not line:
                continue
            word = line.split(b" ", 1)[0].upper()
            if word == b"PING":
                self._send(b"PONG\r\n")
                continue
            if word in (b"PONG", b"+OK"):
                continue
            if word == b"-ERR":
                return ("-ERR", line[4:].strip().decode())
            if word == b"INFO":
                return ("INFO", json.loads(line[4:].strip() or b"{}"))
            if word == b"MSG":
                # MSG <subject> <sid> [reply-to] <#bytes>
                parts = line.decode().split()
                subject, sid = parts[1], parts[2]
                reply = parts[3] if len(parts) == 5 else None
                nbytes = int(parts[-1])
                payload = self._read_exact(nbytes)
                self._read_exact(2)  # trailing CRLF
                return ("MSG", subject, sid, reply, payload)
            if word == b"HMSG":
                # HMSG <subject> <sid> [reply-to] <hdr_len> <total_len>
                parts = line.decode().split()
                subject, sid = parts[1], parts[2]
                reply = parts[3] if len(parts) == 6 else None
                hdr_len, total = int(parts[-2]), int(parts[-1])
                hdrs = self._read_exact(hdr_len)
                payload = self._read_exact(total - hdr_len)
                self._read_exact(2)
                return ("HMSG", subject, sid, reply, hdrs, payload)
            raise OSError(f"unexpected nats op {line[:40]!r}")

    # --------------------------------------------------------- core nats
    def publish(self, subject: str, payload: bytes, reply: str | None = None) -> None:
        head = f"PUB {subject} {reply + ' ' if reply else ''}{len(payload)}\r\n"
        self._send(head.encode() + payload + b"\r\n")

    def subscribe(self, subject: str) -> str:
        self._sid += 1
        sid = str(self._sid)
        self._send(f"SUB {subject} {sid}\r\n".encode())
        return sid

    def unsubscribe(self, sid: str) -> None:
        self._send(f"UNSUB {sid}\r\n".encode())

    def request(self, subject: str, payload: bytes) -> bytes:
        """Core request/reply: publish with a fresh inbox reply subject
        and wait for the single response MSG."""
        inbox = f"_INBOX.{uuid.uuid4().hex}"
        sid = self.subscribe(inbox)
        self.publish(subject, payload, reply=inbox)
        while True:
            op = self._read_op()
            if op[0] == "-ERR":
                raise OSError(f"nats error: {op[1]}")
            if op[0] in ("MSG", "HMSG") and op[2] == sid:
                self.unsubscribe(sid)
                return op[-1]

    # ---------------------------------------------------------- jetstream
    def js_ensure_stream(self, stream: str, subjects: list[str]) -> None:
        cfg = {"name": stream, "subjects": subjects, "retention": "limits"}
        resp = json.loads(self.request(f"$JS.API.STREAM.CREATE.{stream}", json.dumps(cfg).encode()))
        # an identical re-create succeeds server-side (idempotent); a
        # name collision with DIFFERENT config is the real error
        if resp.get("error"):
            raise OSError(f"STREAM.CREATE failed: {resp['error']['description']}")

    def js_ensure_consumer(self, stream: str, durable: str) -> None:
        cfg = {
            "stream_name": stream,
            "config": {
                "durable_name": durable,
                "ack_policy": "explicit",
                "deliver_policy": "all",
                "replay_policy": "instant",
            },
        }
        resp = json.loads(
            self.request(
                f"$JS.API.CONSUMER.DURABLE.CREATE.{stream}.{durable}",
                json.dumps(cfg).encode(),
            )
        )
        if resp.get("error"):
            raise OSError(
                f"CONSUMER.DURABLE.CREATE failed: {resp['error']['description']}"
            )

    def js_publish(self, subject: str, payload: bytes) -> int:
        """Publish to a stream-bound subject; the PubAck carries the
        assigned stream sequence."""
        ack = json.loads(self.request(subject, payload))
        if ack.get("error"):
            raise OSError(f"js publish failed: {ack['error']}")
        return int(ack["seq"])

    def js_fetch(self, stream: str, durable: str, batch: int) -> list[tuple[str, bytes, int]]:
        """One pull: up to `batch` pending messages as (ack_token,
        payload, stream_seq). A 404/408 status HMSG terminates an
        unfilled batch — exact end-of-backlog, no idle timeouts."""
        inbox = f"_INBOX.{uuid.uuid4().hex}"
        sid = self.subscribe(inbox)
        req = json.dumps({"batch": batch, "no_wait": True}).encode()
        self.publish(f"$JS.API.CONSUMER.MSG.NEXT.{stream}.{durable}", req, reply=inbox)
        out: list[tuple[str, bytes, int]] = []
        while len(out) < batch:
            op = self._read_op()
            if op[0] == "-ERR":
                raise OSError(f"nats error: {op[1]}")
            if op[0] == "HMSG" and op[2] == sid:
                break  # status message (404 No Messages / 408 timeout)
            if op[0] == "MSG" and op[2] == sid:
                ack_token = op[3]
                if not ack_token or not ack_token.startswith("$JS.ACK."):
                    raise OSError("pull message without a $JS.ACK reply token")
                # $JS.ACK.<stream>.<durable>.<delivered>.<sseq>.<dseq>.<ts>.<pending>
                sseq = int(ack_token.split(".")[5])
                out.append((ack_token, op[4], sseq))
        self.unsubscribe(sid)
        return out

    def ack(self, ack_token: str) -> None:
        self.publish(ack_token, b"+ACK")

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass
