"""Loopback NATS server fixture with the JetStream slice the connector
needs — the in-sandbox stand-in for a `nats-server -js` (reference
`e2e_test` nats cases run against a real one the same way). Speaks the
genuine text protocol on a TCP socket: `INFO`/`CONNECT`, `PUB/SUB/
UNSUB`, `MSG`/`HMSG`, `PING/PONG` — so the engine's client
(`nats_wire.py`) exchanges the same bytes it would with a real server.

JetStream subset, all layered on core request/reply exactly as in the
real server:

- `$JS.API.STREAM.CREATE.<stream>` — named stream binding subjects;
- `$JS.API.CONSUMER.DURABLE.CREATE.<stream>.<durable>` — durable pull
  consumer with explicit acks;
- publish-with-reply to a bound subject stores the message and answers
  a PubAck `{"stream":..,"seq":..}`;
- `$JS.API.CONSUMER.MSG.NEXT.<stream>.<durable>` with
  `{"batch":N,"no_wait":true}` delivers up to N UNACKED messages in
  stream-sequence order (each MSG's reply subject is its `$JS.ACK.…`
  token) and terminates an unfilled batch with a `NATS/1.0 404 No
  Messages` status HMSG;
- publishing to an ack token marks that stream sequence consumed.

Divergence from a real server (documented, matching the loopback-
fixture pattern of kafka_broker.py): un-acked messages redeliver on
the NEXT pull immediately rather than after the consumer's ack_wait
timer — same messages, sooner; the at-least-once contract is
identical. Clustering, limits, purge/TTL and wildcard stream subjects
are out of scope.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading


class LoopbackNatsBroker:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._lock = threading.Lock()
        # stream -> {"subjects": [..], "msgs": {seq: (subject, payload)}, "next": int}
        self.streams: dict[str, dict] = {}
        # (stream, durable) -> {"acked": set[int]}
        self.consumers: dict[tuple[str, str], dict] = {}
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                self._buf = b""
                self._subs: dict[str, str] = {}  # sid -> subject
                self._wlock = threading.Lock()
                try:
                    self._sendall(b'INFO {"server_id":"loopback","jetstream":true,"headers":true}\r\n')
                    while True:
                        line = self._read_line()
                        if line is None:
                            return
                        if not line:
                            continue
                        word = line.split(b" ", 1)[0].upper()
                        if word == b"CONNECT":
                            self._sendall(b"+OK\r\n")
                        elif word == b"PING":
                            self._sendall(b"PONG\r\n")
                        elif word in (b"PONG", b"+OK"):
                            pass
                        elif word == b"SUB":
                            parts = line.decode().split()
                            # SUB <subject> [queue] <sid>
                            self._subs[parts[-1]] = parts[1]
                        elif word == b"UNSUB":
                            self._subs.pop(line.decode().split()[1], None)
                        elif word == b"PUB":
                            parts = line.decode().split()
                            subject = parts[1]
                            reply = parts[2] if len(parts) == 4 else None
                            nbytes = int(parts[-1])
                            payload = self._read_exact(nbytes)
                            self._read_exact(2)
                            broker._on_pub(self, subject, reply, payload)
                        else:
                            return  # unknown op: drop the connection
                except OSError:
                    return

            # ------------------------------------------------ conn io
            def _sendall(self, data: bytes) -> None:
                with self._wlock:
                    self.request.sendall(data)

            def _read_exact(self, n):
                while len(self._buf) < n:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        raise OSError("closed")
                    self._buf += chunk
                out, self._buf = self._buf[:n], self._buf[n:]
                return out

            def _read_line(self):
                while b"\r\n" not in self._buf:
                    try:
                        chunk = self.request.recv(65536)
                    except OSError:
                        return None
                    if not chunk:
                        return None
                    self._buf += chunk
                line, self._buf = self._buf.split(b"\r\n", 1)
                return line

            def deliver(self, subject: str, payload: bytes, reply: str | None = None) -> bool:
                """MSG to this connection if it subscribes `subject`."""
                for sid, pat in list(self._subs.items()):
                    if pat == subject or (pat.endswith(".>") and subject.startswith(pat[:-1])):
                        head = f"MSG {subject} {sid} {reply + ' ' if reply else ''}{len(payload)}\r\n"
                        self._sendall(head.encode() + payload + b"\r\n")
                        return True
                return False

            def deliver_status(self, subject: str, code: int, text: str) -> bool:
                hdr = f"NATS/1.0 {code} {text}\r\n\r\n".encode()
                for sid, pat in list(self._subs.items()):
                    if pat == subject:
                        head = f"HMSG {subject} {sid} {len(hdr)} {len(hdr)}\r\n"
                        self._sendall(head.encode() + hdr + b"\r\n")
                        return True
                return False

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

    def start(self) -> "LoopbackNatsBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # ------------------------------------------------------------ routing
    def _reply(self, handler, reply: str | None, payload: bytes) -> None:
        if reply:
            handler.deliver(reply, payload)

    def _on_pub(self, handler, subject: str, reply: str | None, payload: bytes) -> None:
        if subject.startswith("$JS.API."):
            self._js_api(handler, subject, reply, payload)
            return
        if subject.startswith("$JS.ACK."):
            # $JS.ACK.<stream>.<durable>.<delivered>.<sseq>.<dseq>.<ts>.<pending>
            parts = subject.split(".")
            key = (parts[2], parts[3])
            with self._lock:
                c = self.consumers.get(key)
                if c is not None:
                    c["acked"].add(int(parts[5]))
            return
        stored = False
        with self._lock:
            for s in self.streams.values():
                if subject in s["subjects"]:
                    seq = s["next"]
                    s["next"] += 1
                    s["msgs"][seq] = (subject, payload)
                    stored = True
                    name = [k for k, v in self.streams.items() if v is s][0]
                    break
        if stored:
            self._reply(handler, reply, json.dumps({"stream": name, "seq": seq}).encode())
            return
        # plain core pub: route to this connection's own matching subs
        # (enough for request/reply inboxes; cross-connection core
        # fan-out is out of connector scope)
        handler.deliver(subject, payload)

    def _js_api(self, handler, subject: str, reply: str | None, payload: bytes) -> None:
        parts = subject.split(".")
        op = ".".join(parts[2:4])
        if op == "STREAM.CREATE":
            cfg = json.loads(payload or b"{}")
            name = parts[4]
            with self._lock:
                if name in self.streams:
                    cur = self.streams[name]
                    if set(cfg.get("subjects") or []) != set(cur["subjects"]):
                        self._reply(handler, reply, json.dumps({
                            "error": {"code": 400, "description": "stream name already in use with a different configuration"}
                        }).encode())
                        return
                else:
                    self.streams[name] = {
                        "subjects": list(cfg.get("subjects") or [name]),
                        "msgs": {},
                        "next": 1,
                    }
            self._reply(handler, reply, json.dumps(
                {"config": {"name": name}, "created": True}).encode())
        elif op == "CONSUMER.DURABLE":
            # $JS.API.CONSUMER.DURABLE.CREATE.<stream>.<durable>
            stream, durable = parts[5], parts[6]
            with self._lock:
                if stream not in self.streams:
                    self._reply(handler, reply, json.dumps(
                        {"error": {"code": 404, "description": "stream not found"}}).encode())
                    return
                self.consumers.setdefault((stream, durable), {"acked": set()})
            self._reply(handler, reply, json.dumps(
                {"stream_name": stream, "name": durable}).encode())
        elif op == "CONSUMER.MSG":
            # $JS.API.CONSUMER.MSG.NEXT.<stream>.<durable>
            stream, durable = parts[5], parts[6]
            req = json.loads(payload or b"{}")
            batch = int(req.get("batch", 1))
            with self._lock:
                s = self.streams.get(stream)
                c = self.consumers.get((stream, durable))
                if s is None or c is None:
                    out = None
                else:
                    out = [
                        (seq, subj, pl)
                        for seq, (subj, pl) in sorted(s["msgs"].items())
                        if seq not in c["acked"]
                    ][:batch]
            if out is None:
                self._reply(handler, reply, json.dumps(
                    {"error": {"code": 404, "description": "consumer not found"}}).encode())
                return
            for i, (seq, subj, pl) in enumerate(out):
                token = f"$JS.ACK.{stream}.{durable}.1.{seq}.{seq}.0.0"
                handler.deliver(reply, pl, reply=token)
            if len(out) < batch and req.get("no_wait"):
                handler.deliver_status(reply, 404, "No Messages")
        else:
            self._reply(handler, reply, json.dumps(
                {"error": {"code": 400, "description": f"unknown api {subject}"}}).encode())
