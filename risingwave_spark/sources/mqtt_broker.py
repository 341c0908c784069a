"""Loopback MQTT 3.1.1 broker fixture — persistent sessions, QoS 0/1,
'+'/'#' topic filters; the in-sandbox stand-in for the real broker the
reference's mqtt connector talks to (reference
`src/connector/src/source/mqtt/`, `src/connector/src/sink/mqtt.rs`).

Persistent-session semantics carry the connector's at-least-once
contract (the spec's own mechanism, not an invention of this fixture):
a clean_session=0 subscriber's QoS-1 messages queue while it is
disconnected; on reconnect the broker redelivers everything not yet
PUBACKed, and messages whose PUBACK never arrived (consumer crash
mid-fold) return to the queue at disconnect. The engine's poll loop
PUBACKs only after the changelog segment folds — so a crash redelivers
exactly the unfolded tail, the same redelivery window as the kafka
connector's uncommitted offsets.

Like the kafka fixture, state is in-memory for the broker's lifetime;
a production broker persists sessions to disk — the engine-side
protocol is identical."""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from risingwave_spark.sources.mqtt_wire import (
    CONNACK,
    CONNECT,
    DISCONNECT,
    PINGREQ,
    PINGRESP,
    PUBACK,
    PUBLISH,
    SUBACK,
    SUBSCRIBE,
    UNSUBACK,
    UNSUBSCRIBE,
    enc_str,
    packet,
)


def topic_matches(filt: str, topic: str) -> bool:
    """MQTT filter match: '+' one level, '#' trailing multi-level."""
    fparts, tparts = filt.split("/"), topic.split("/")
    for i, f in enumerate(fparts):
        if f == "#":
            return True
        if i >= len(tparts):
            return False
        if f != "+" and f != tparts[i]:
            return False
    return len(fparts) == len(tparts)


class _Session:
    def __init__(self):
        self.subs: dict[str, int] = {}  # filter -> qos
        self.queue: list[tuple[str, bytes]] = []  # undelivered qos1


class LoopbackMqttBroker:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sessions: dict[str, _Session] = {}
        self._lock = threading.Lock()
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                self._buf = b""
                session = None
                try:
                    while True:
                        got = self._read_packet()
                        if got is None:
                            return
                        t, flags, body = got
                        if t == CONNECT:
                            session = broker._connect(self, body)
                        elif t == SUBSCRIBE:
                            pid = struct.unpack(">H", body[:2])[0]
                            pos, grants = 2, b""
                            while pos < len(body):
                                ln = struct.unpack(">H", body[pos : pos + 2])[0]
                                filt = body[pos + 2 : pos + 2 + ln].decode()
                                qos = body[pos + 2 + ln]
                                pos += 3 + ln
                                with broker._lock:
                                    session.subs[filt] = qos
                                grants += bytes([min(qos, 1)])
                            self.request.sendall(
                                packet(SUBACK, 0, struct.pack(">H", pid) + grants)
                            )
                        elif t == UNSUBSCRIBE:
                            pid = struct.unpack(">H", body[:2])[0]
                            pos = 2
                            while pos < len(body):
                                ln = struct.unpack(">H", body[pos : pos + 2])[0]
                                filt = body[pos + 2 : pos + 2 + ln].decode()
                                pos += 2 + ln
                                with broker._lock:
                                    session.subs.pop(filt, None)
                            self.request.sendall(
                                packet(UNSUBACK, 0, struct.pack(">H", pid))
                            )
                        elif t == PUBLISH:
                            qos = (flags >> 1) & 0x3
                            tlen = struct.unpack(">H", body[:2])[0]
                            topic = body[2 : 2 + tlen].decode()
                            pos = 2 + tlen
                            if qos > 0:
                                pid = struct.unpack(">H", body[pos : pos + 2])[0]
                                pos += 2
                            payload = body[pos:]
                            broker._route(topic, payload)
                            if qos > 0:
                                self.request.sendall(
                                    packet(PUBACK, 0, struct.pack(">H", pid))
                                )
                        elif t == PUBACK:
                            pid = struct.unpack(">H", body[:2])[0]
                            entry = (
                                session._inflight.pop(pid, None)
                                if session is not None else None
                            )
                            if entry is not None:
                                with broker._lock:
                                    try:
                                        session.queue.remove(entry)
                                    except ValueError:
                                        pass
                        elif t == PINGREQ:
                            self.request.sendall(packet(PINGRESP, 0, b""))
                        elif t == DISCONNECT:
                            return
                except (ConnectionError, OSError):
                    # inflight entries stay in session.queue (only a
                    # PUBACK removes them) — the spec's
                    # redelivery-on-reconnect
                    return

            # -------------------------------------------------- wire io
            def _recv_exact(self, n):
                while len(self._buf) < n:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        return None
                    self._buf += chunk
                out, self._buf = self._buf[:n], self._buf[n:]
                return out

            def _read_packet(self):
                h = self._recv_exact(1)
                if h is None:
                    return None
                mult, rem = 1, 0
                while True:
                    b = self._recv_exact(1)
                    if b is None:
                        return None
                    rem += (b[0] & 0x7F) * mult
                    if not (b[0] & 0x80):
                        break
                    mult *= 128
                body = self._recv_exact(rem) if rem else b""
                if body is None:
                    return None
                return h[0] >> 4, h[0] & 0x0F, body

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

    def start(self) -> "LoopbackMqttBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # ------------------------------------------------------------ logic
    def _connect(self, handler, body: bytes):
        pos = struct.unpack(">H", body[:2])[0] + 2  # skip protocol name
        pos += 1  # level
        flags = body[pos]
        pos += 1 + 2  # flags + keepalive
        ln = struct.unpack(">H", body[pos : pos + 2])[0]
        client_id = body[pos + 2 : pos + 2 + ln].decode()
        clean = bool(flags & 0x02)
        with self._lock:
            present = client_id in self._sessions and not clean
            if clean or client_id not in self._sessions:
                self._sessions[client_id] = _Session()
            session = self._sessions[client_id]
            backlog = list(session.queue)
        handler.request.sendall(
            packet(CONNACK, 0, bytes([1 if present else 0, 0]))
        )
        # push the queued backlog, DUP set (these are redeliveries in
        # spec terms), before handling any later packet — this in-order
        # guarantee is what makes the client's drain-until-PINGRESP an
        # exact backlog boundary
        inflight: dict[int, tuple[str, bytes]] = {}
        pid = 0
        for topic, payload in backlog[:60000]:
            pid += 1
            inflight[pid] = (topic, payload)
            pkt_body = enc_str(topic) + struct.pack(">H", pid) + payload
            handler.request.sendall(packet(PUBLISH, 0x0A, pkt_body))  # dup|qos1
        # the PUBACK branch reads from this dict
        return _BoundSession(session, inflight)

    def _route(self, topic: str, payload: bytes) -> None:
        with self._lock:
            for session in self._sessions.values():
                for filt, qos in session.subs.items():
                    if topic_matches(filt, topic):
                        if qos >= 1:
                            session.queue.append((topic, payload))
                        break


class _BoundSession:
    """A connection's view of its session: subscription writes hit the
    durable session; PUBACK bookkeeping uses the connection's inflight
    map."""

    def __init__(self, session: _Session, inflight: dict):
        self._session = session
        self._inflight = inflight

    @property
    def subs(self):
        return self._session.subs

    @property
    def queue(self):
        return self._session.queue
