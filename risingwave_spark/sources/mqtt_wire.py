"""Pure-stdlib MQTT 3.1.1 wire client (reference
`/root/reference/src/connector/src/source/mqtt/` source and
`src/connector/src/sink/mqtt.rs` sink, which speak the same protocol
via rumqttc). Implements the packet slice the connector needs:
CONNECT/CONNACK (persistent sessions via clean_session=0),
SUBSCRIBE/SUBACK, PUBLISH QoS 0/1 with PUBACK both directions,
PINGREQ/PINGRESP, DISCONNECT — genuine MQTT bytes on a TCP socket, so
the same client works against any real broker.

At-least-once ingest contract: the engine's source poll receives queued
QoS-1 PUBLISHes from its durable session and sends PUBACK only AFTER
the corresponding changelog segment folds — an un-PUBACKed message
redelivers on the next connect (the broker re-queues inflight messages
on disconnect), which is MQTT's own QoS-1 redelivery, playing the role
Kafka's uncommitted offsets play elsewhere in this engine.

End-of-backlog detection without timeouts: after CONNECT the client
sends PINGREQ; the broker handles packets in order, so every queued
PUBLISH is on the wire before the PINGRESP — 'drain until PINGRESP' is
an exact backlog boundary (no sleep-based idle detection).
"""

from __future__ import annotations

import socket
import struct


def _nodelay_connect(addr, timeout=None):
    """connect + TCP_NODELAY: every protocol here is request-
    reply; Nagle's algorithm turns small write-write-read
    exchanges into ~40 ms delayed-ACK stalls per round trip."""
    s = socket.create_connection(addr, timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s


CONNECT = 1
CONNACK = 2
PUBLISH = 3
PUBACK = 4
SUBSCRIBE = 8
SUBACK = 9
UNSUBSCRIBE = 10
UNSUBACK = 11
PINGREQ = 12
PINGRESP = 13
DISCONNECT = 14


def enc_remaining_len(n: int) -> bytes:
    """MQTT variable-length remaining-length encoding (7 bits/byte,
    continuation high bit) — spec section 2.2.3."""
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def enc_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + enc_remaining_len(len(body)) + body


class MqttClient:
    def __init__(
        self,
        host: str,
        port: int,
        client_id: str,
        clean_session: bool = True,
        timeout: float = 10.0,
    ):
        self.sock = _nodelay_connect((host, port), timeout=timeout)
        self._buf = b""
        self._pid = 0
        self.session_present = self._connect(client_id, clean_session)

    # ------------------------------------------------------------ wire io
    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("mqtt broker closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_packet(self) -> tuple[int, int, bytes]:
        """Returns (type, flags, body)."""
        (h,) = self._recv_exact(1)
        mult, rem = 1, 0
        while True:
            (b,) = self._recv_exact(1)
            rem += (b & 0x7F) * mult
            if not (b & 0x80):
                break
            mult *= 128
        body = self._recv_exact(rem) if rem else b""
        return h >> 4, h & 0x0F, body

    def _next_pid(self) -> int:
        self._pid = (self._pid % 65535) + 1
        return self._pid

    # ------------------------------------------------------------ packets
    def _connect(self, client_id: str, clean_session: bool) -> bool:
        flags = 0x02 if clean_session else 0x00
        body = enc_str("MQTT") + bytes([4, flags]) + struct.pack(">H", 60)
        body += enc_str(client_id)
        self.sock.sendall(packet(CONNECT, 0, body))
        t, _f, b = self.read_packet()
        if t != CONNACK or b[1] != 0:
            raise ConnectionError(f"mqtt CONNACK refused: {b!r}")
        return bool(b[0] & 1)  # session-present flag

    def subscribe(self, topic: str, qos: int = 1) -> None:
        pid = self._next_pid()
        body = struct.pack(">H", pid) + enc_str(topic) + bytes([qos])
        self.sock.sendall(packet(SUBSCRIBE, 0x02, body))
        # SUBACK may arrive after queued PUBLISHes on a resumed session;
        # buffer anything else until it shows (drain() replays the buffer)
        self._pending: list = getattr(self, "_pending", [])
        while True:
            t, f, b = self.read_packet()
            if t == SUBACK and struct.unpack(">H", b[:2])[0] == pid:
                if b[2] >= 0x80:
                    raise ValueError(f"mqtt SUBACK refused topic {topic!r}")
                return
            self._pending.append((t, f, b))

    def publish(self, topic: str, payload: bytes, qos: int = 1) -> None:
        if qos == 0:
            self.sock.sendall(packet(PUBLISH, 0, enc_str(topic) + payload))
            return
        pid = self._next_pid()
        body = enc_str(topic) + struct.pack(">H", pid) + payload
        self.sock.sendall(packet(PUBLISH, 0x02, body))  # qos1
        while True:
            t, _f, b = self.read_packet()
            if t == PUBACK and struct.unpack(">H", b[:2])[0] == pid:
                return
            self._pending = getattr(self, "_pending", [])
            self._pending.append((t, _f, b))

    def puback(self, pid: int) -> None:
        self.sock.sendall(packet(PUBACK, 0, struct.pack(">H", pid)))

    def drain_backlog(self):
        """Yield (packet_id, topic, payload) for every PUBLISH queued in
        this session, ending EXACTLY at the backlog boundary: a PINGREQ
        is sent first and the broker's in-order handling guarantees the
        PINGRESP trails every queued message."""
        self.sock.sendall(packet(PINGREQ, 0, b""))
        pending = getattr(self, "_pending", [])
        self._pending = []
        while True:
            if pending:
                t, f, body = pending.pop(0)
            else:
                t, f, body = self.read_packet()
            if t == PINGRESP:
                return
            if t != PUBLISH:
                continue
            qos = (f >> 1) & 0x3
            tlen = struct.unpack(">H", body[:2])[0]
            topic = body[2 : 2 + tlen].decode()
            pos = 2 + tlen
            pid = 0
            if qos > 0:
                pid = struct.unpack(">H", body[pos : pos + 2])[0]
                pos += 2
            yield pid, topic, body[pos:]

    def disconnect(self) -> None:
        try:
            self.sock.sendall(packet(DISCONNECT, 0, b""))
            # wait for the broker's EOF: its handler processes the
            # stream in order, so EOF confirms every earlier PUBACK was
            # applied before a successor connection snapshots the queue
            self.sock.settimeout(5.0)
            while self.sock.recv(65536):
                pass
        except OSError:
            pass
        self.sock.close()
