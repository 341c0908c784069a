"""Pure-stdlib Apache Pulsar binary-protocol client (reference
`/root/reference/src/connector/src/source/pulsar/` source and
`src/connector/src/sink/pulsar.rs` sink, which speak the same protocol
via the `pulsar` Rust client). Implements the PUBLIC wire contract
(pulsar.apache.org "Pulsar binary protocol specification",
PulsarApi.proto):

- framing: `[totalSize u32][commandSize u32][BaseCommand protobuf]`,
  and for SEND/MESSAGE a payload section
  `[magic 0x0e01][crc32c u32][metadataSize u32][MessageMetadata]
  [payload]` where the Castagnoli checksum covers everything after
  itself;
- commands: CONNECT/CONNECTED, PRODUCER/PRODUCER_SUCCESS,
  SEND/SEND_RECEIPT, SUBSCRIBE/SUCCESS, FLOW, MESSAGE, ACK
  (individual), CLOSE_PRODUCER/CLOSE_CONSUMER, PING/PONG, ERROR;
- protobuf messages hand-encoded/decoded with a minimal varint codec —
  field numbers follow the public PulsarApi.proto (BaseCommand sub-
  command field numbers equal their Type enum values).

Durable consumption contract (the engine's at-least-once): SUBSCRIBE
with durable=true + initialPosition=Earliest creates/attaches the
broker-side subscription CURSOR; the engine acks a message only AFTER
its changelog segment folds, so un-acked messages redeliver on the
next attach — Pulsar's own subscription semantics playing the role
Kafka's uncommitted offsets play elsewhere in this engine.

End-of-backlog detection without timeouts: after FLOW the client sends
PING; the loopback broker handles commands in order, so every
available MESSAGE is on the wire before the PONG — an exact backlog
boundary. (A real broker dispatches from other threads; against one,
replace the PONG barrier with a receive timeout — documented
divergence, loopback-fixture pattern.)
"""

from __future__ import annotations

import socket
import struct

from risingwave_spark.sources.kafka_wire import crc32c


def _nodelay_connect(addr, timeout=None):
    """connect + TCP_NODELAY: every protocol here is request-
    reply; Nagle's algorithm turns small write-write-read
    exchanges into ~40 ms delayed-ACK stalls per round trip."""
    s = socket.create_connection(addr, timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s


# BaseCommand.Type enum values == BaseCommand sub-command field numbers
# (public PulsarApi.proto layout)
CONNECT = 2
CONNECTED = 3
SUBSCRIBE = 4
PRODUCER = 5
SEND = 6
SEND_RECEIPT = 7
SEND_ERROR = 8
MESSAGE = 9
ACK = 10
FLOW = 11
UNSUBSCRIBE = 12
SUCCESS = 13
ERROR = 14
CLOSE_PRODUCER = 15
CLOSE_CONSUMER = 16
PRODUCER_SUCCESS = 17
PING = 18
PONG = 19

MAGIC = 0x0E01


# --------------------------------------------------------------- protobuf
def enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def f_varint(field: int, v: int) -> bytes:
    return enc_varint(field << 3) + enc_varint(v)


def f_bytes(field: int, b: bytes) -> bytes:
    return enc_varint((field << 3) | 2) + enc_varint(len(b)) + b


def f_str(field: int, s: str) -> bytes:
    return f_bytes(field, s.encode())


def dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def decode_fields(buf: bytes) -> dict[int, list]:
    """field number → list of raw values (int for varint/fixed, bytes
    for length-delimited) in occurrence order."""
    out: dict[int, list] = {}
    i = 0
    while i < len(buf):
        key, i = dec_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = dec_varint(buf, i)
        elif wire == 2:
            n, i = dec_varint(buf, i)
            v = buf[i:i + n]
            i += n
        elif wire == 5:
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        elif wire == 1:
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def one(fields: dict, n: int, default=None):
    return fields[n][0] if n in fields else default


def message_id(ledger: int, entry: int) -> bytes:
    # MessageIdData: ledgerId=1, entryId=2
    return f_varint(1, ledger) + f_varint(2, entry)


def parse_message_id(b: bytes) -> tuple[int, int]:
    f = decode_fields(b)
    return one(f, 1, 0), one(f, 2, 0)


def base_command(ctype: int, body: bytes) -> bytes:
    # BaseCommand: type=1 (enum), sub-command field number == ctype
    return f_varint(1, ctype) + f_bytes(ctype, body)


class PulsarWireClient:
    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = _nodelay_connect((host, port), timeout=timeout)
        self._buf = b""
        self._req = 0
        # CommandConnect: client_version=1, protocol_version=4
        self._send_cmd(base_command(
            CONNECT, f_str(1, "rw-spark") + f_varint(4, 19)))
        ctype, cmd, _m, _p = self._read_frame()
        if ctype != CONNECTED:
            raise OSError(f"expected CONNECTED, got command type {ctype}")

    # ------------------------------------------------------------ framing
    def _send_cmd(self, cmd: bytes) -> None:
        self.sock.sendall(struct.pack(">II", 4 + len(cmd), len(cmd)) + cmd)

    def _send_payload_cmd(self, cmd: bytes, metadata: bytes, payload: bytes) -> None:
        tail = struct.pack(">I", len(metadata)) + metadata + payload
        body = (
            struct.pack(">I", len(cmd)) + cmd
            + struct.pack(">HI", MAGIC, crc32c(tail)) + tail
        )
        self.sock.sendall(struct.pack(">I", len(body)) + body)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("pulsar connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_frame(self):
        """→ (type, command-fields dict, metadata bytes|None,
        payload bytes|None). PINGs are answered inline."""
        while True:
            (total,) = struct.unpack(">I", self._recv_exact(4))
            frame = self._recv_exact(total)
            (csize,) = struct.unpack(">I", frame[:4])
            cmd = decode_fields(frame[4:4 + csize])
            ctype = one(cmd, 1)
            metadata = payload = None
            rest = frame[4 + csize:]
            if rest:
                magic, crc = struct.unpack(">HI", rest[:6])
                tail = rest[6:]
                if magic != MAGIC or crc32c(tail) != crc:
                    raise OSError("pulsar payload checksum mismatch")
                (msize,) = struct.unpack(">I", tail[:4])
                metadata = tail[4:4 + msize]
                payload = tail[4 + msize:]
            if ctype == PING:
                self._send_cmd(base_command(PONG, b""))
                continue
            if ctype == ERROR:
                err = decode_fields(cmd[ERROR][0])
                raise OSError(
                    f"pulsar broker error: {one(err, 3, b'').decode()}"
                )
            return ctype, cmd, metadata, payload

    def _next_req(self) -> int:
        self._req += 1
        return self._req

    # ----------------------------------------------------------- producer
    def create_producer(self, topic: str, producer_id: int = 0) -> str:
        rid = self._next_req()
        self._send_cmd(base_command(
            PRODUCER,
            f_str(1, topic) + f_varint(2, producer_id) + f_varint(3, rid)))
        ctype, cmd, _m, _p = self._read_frame()
        if ctype != PRODUCER_SUCCESS:
            raise OSError(f"producer create failed (type {ctype})")
        ps = decode_fields(cmd[PRODUCER_SUCCESS][0])
        return one(ps, 2, b"").decode()

    def send(
        self,
        producer_id: int,
        producer_name: str,
        seq: int,
        payload: bytes,
        partition_key: str | None = None,
    ) -> tuple[int, int]:
        """One SEND → SEND_RECEIPT round trip; → (ledgerId, entryId)."""
        # MessageMetadata: producer_name=1, sequence_id=2,
        # publish_time=3, partition_key=6
        md = f_str(1, producer_name) + f_varint(2, seq) + f_varint(3, 0)
        if partition_key is not None:
            md += f_str(6, partition_key)
        cmd = base_command(SEND, f_varint(1, producer_id) + f_varint(2, seq))
        self._send_payload_cmd(cmd, md, payload)
        ctype, rcmd, _m, _p = self._read_frame()
        if ctype == SEND_ERROR:
            raise OSError("pulsar SEND rejected")
        if ctype != SEND_RECEIPT:
            raise OSError(f"expected SEND_RECEIPT, got type {ctype}")
        rc = decode_fields(rcmd[SEND_RECEIPT][0])
        return parse_message_id(one(rc, 3, b""))

    def send_batch(
        self,
        producer_id: int,
        producer_name: str,
        messages: list[tuple[int, bytes, str | None]],
        window: int = 64,
    ) -> None:
        """PIPELINED sends: write up to `window` SEND frames before
        draining their receipts, same socket (the reference's pulsar
        client pipelines sends the same way — a round trip per message
        was the measured bottleneck in SCALING.md's r9 soak).
        messages = [(seq, payload, partition_key|None)]."""
        i = 0
        while i < len(messages):
            burst = messages[i:i + window]
            i += len(burst)
            for seq, payload, key in burst:
                md = (f_str(1, producer_name) + f_varint(2, seq)
                      + f_varint(3, 0))
                if key is not None:
                    md += f_str(6, key)
                cmd = base_command(
                    SEND, f_varint(1, producer_id) + f_varint(2, seq))
                self._send_payload_cmd(cmd, md, payload)
            for _ in burst:
                ctype, _rcmd, _m, _p = self._read_frame()
                if ctype == SEND_ERROR:
                    raise OSError("pulsar SEND rejected")
                if ctype != SEND_RECEIPT:
                    raise OSError(
                        f"expected SEND_RECEIPT, got type {ctype}")

    # ----------------------------------------------------------- consumer
    def subscribe(self, topic: str, subscription: str, consumer_id: int = 0) -> None:
        """Durable shared subscription from Earliest — the broker-side
        cursor is the engine's offset state."""
        rid = self._next_req()
        body = (
            f_str(1, topic) + f_str(2, subscription)
            + f_varint(3, 1)              # subType Shared
            + f_varint(4, consumer_id) + f_varint(5, rid)
            + f_varint(8, 1)              # durable
            + f_varint(13, 1)             # initialPosition Earliest
        )
        self._send_cmd(base_command(SUBSCRIBE, body))
        ctype, _c, _m, _p = self._read_frame()
        if ctype != SUCCESS:
            raise OSError(f"subscribe failed (type {ctype})")

    def fetch(self, consumer_id: int, max_n: int) -> list[tuple[tuple[int, int], bytes, str | None]]:
        """FLOW max_n permits, then drain MESSAGEs until the PING/PONG
        barrier → [((ledgerId, entryId), payload, partition_key)]."""
        self._send_cmd(base_command(
            FLOW, f_varint(1, consumer_id) + f_varint(2, max_n)))
        self._send_cmd(base_command(PING, b""))
        out: list[tuple[tuple[int, int], bytes, str | None]] = []
        while True:
            ctype, cmd, metadata, payload = self._read_frame()
            if ctype == PONG:
                return out
            if ctype != MESSAGE:
                raise OSError(f"unexpected command type {ctype} during fetch")
            mc = decode_fields(cmd[MESSAGE][0])
            mid = parse_message_id(one(mc, 2, b""))
            key = None
            if metadata:
                mdf = decode_fields(metadata)
                if 6 in mdf:
                    key = mdf[6][0].decode()
            out.append((mid, payload or b"", key))

    def ack(self, consumer_id: int, mid: tuple[int, int]) -> None:
        # CommandAck: consumer_id=1, ack_type=2 (Individual=0),
        # message_id=3
        self._send_cmd(base_command(
            ACK,
            f_varint(1, consumer_id) + f_varint(2, 0)
            + f_bytes(3, message_id(*mid))))

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass
