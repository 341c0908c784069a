"""Kafka wire protocol — the minimal REAL protocol slice a source
reader and sink writer need: ApiVersions / Metadata / Produce / Fetch /
ListOffsets over plaintext TCP with message-format-v2 RecordBatches
(varint records, CRC32C), the same bytes a modern broker speaks.

Reference parity: `src/connector/src/source/kafka/source/reader.rs`
(consumer poll loop → SourceMessage offsets) and
`src/connector/src/sink/kafka.rs` (producer delivering formatter
key/value pairs). The reference links librdkafka; this engine has no
broker jars in-sandbox, so the wire layer is pure stdlib — the webhook
source proved the pattern (sources/webhook.py). Encodings follow the
public Kafka protocol spec (kafka.apache.org/protocol): non-flexible
API versions only (no compact/tagged fields), message format v2 only
(v0/v1 were removed in Kafka 4.0).

Client and broker share these codecs, so tests exercise genuine
request/response bytes end-to-end on a loopback socket.
"""

from __future__ import annotations

import socket
import struct
import threading


def _nodelay_connect(addr, timeout=None):
    """connect + TCP_NODELAY: every protocol here is request-
    reply; Nagle's algorithm turns small write-write-read
    exchanges into ~40 ms delayed-ACK stalls per round trip."""
    s = socket.create_connection(addr, timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s


# ---------------------------------------------------------------- CRC32C
# Castagnoli CRC (polynomial 0x1EDC6F41, reflected 0x82F63B78) — the
# checksum RecordBatch v2 mandates (zlib.crc32 is CRC32/IEEE, not this).
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ------------------------------------------------------------- primitives
def enc_i8(v):
    return struct.pack(">b", v)


def enc_i16(v):
    return struct.pack(">h", v)


def enc_i32(v):
    return struct.pack(">i", v)


def enc_i64(v):
    return struct.pack(">q", v)


def enc_string(s: str | None) -> bytes:
    if s is None:
        return enc_i16(-1)
    b = s.encode()
    return enc_i16(len(b)) + b


def enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return enc_i32(-1)
    return enc_i32(len(b)) + b


def enc_varint(v: int) -> bytes:
    """Zigzag varint (records use these for every length/delta)."""
    z = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        if z & ~0x7F:
            out.append((z & 0x7F) | 0x80)
            z >>= 7
        else:
            out.append(z)
            return bytes(out)


class Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i8(self):
        return struct.unpack(">b", self.take(1))[0]

    def i16(self):
        return struct.unpack(">h", self.take(2))[0]

    def i32(self):
        return struct.unpack(">i", self.take(4))[0]

    def i64(self):
        return struct.unpack(">q", self.take(8))[0]

    def string(self):
        n = self.i16()
        return None if n < 0 else self.take(n).decode()

    def bytes_(self):
        n = self.i32()
        return None if n < 0 else self.take(n)

    def varint(self) -> int:
        shift, z = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)


# -------------------------------------------------- RecordBatch (magic 2)
def encode_record_batch(
    records: list[tuple[bytes | None, bytes | None, int]], base_offset: int
) -> bytes:
    """records = [(key, value, timestamp_ms)] → one message-format-v2
    RecordBatch (uncompressed, no headers). CRC32C covers everything
    from `attributes` to the end, exactly per spec."""
    first_ts = records[0][2] if records else -1
    max_ts = max((r[2] for r in records), default=-1)
    recs = bytearray()
    for i, (key, value, ts) in enumerate(records):
        body = bytearray()
        body += enc_i8(0)  # record attributes (raw int8, unused)
        body += enc_varint(ts - first_ts)  # timestampDelta
        body += enc_varint(i)  # offsetDelta
        for part in (key, value):
            if part is None:
                body += enc_varint(-1)
            else:
                body += enc_varint(len(part)) + part
        body += enc_varint(0)  # headers count
        recs += enc_varint(len(body)) + body
    # from attributes(2) on: what the CRC covers
    tail = (
        enc_i16(0)  # attributes: no compression, no txn
        + enc_i32(max(len(records) - 1, 0))  # lastOffsetDelta
        + enc_i64(first_ts)
        + enc_i64(max_ts)
        + enc_i64(-1)  # producerId
        + enc_i16(-1)  # producerEpoch
        + enc_i32(-1)  # baseSequence
        + enc_i32(len(records))
        + bytes(recs)
    )
    head = (
        enc_i32(0)  # partitionLeaderEpoch
        + enc_i8(2)  # magic
        + struct.pack(">I", crc32c(tail))
    )
    batch = head + tail
    return enc_i64(base_offset) + enc_i32(len(batch)) + batch


def decode_record_batches(buf: bytes) -> list[tuple[int, int, bytes | None, bytes | None]]:
    """Concatenated RecordBatches → [(offset, timestamp_ms, key, value)].
    Verifies each batch's CRC32C (a corrupt fetch must fail loudly, the
    same contract librdkafka enforces)."""
    out = []
    r = Reader(buf)
    while r.pos + 12 <= len(r.buf):
        base_offset = r.i64()
        blen = r.i32()
        if r.pos + blen > len(r.buf):
            break  # trailing partial batch (spec: client ignores it)
        body = Reader(r.take(blen))
        body.i32()  # partitionLeaderEpoch
        magic = body.i8()
        if magic != 2:
            raise ValueError(f"unsupported message format magic {magic}")
        crc = struct.unpack(">I", body.take(4))[0]
        rest = body.buf[body.pos :]
        if crc32c(rest) != crc:
            raise ValueError("RecordBatch CRC32C mismatch")
        body.i16()  # attributes
        body.i32()  # lastOffsetDelta
        first_ts = body.i64()
        body.i64()  # maxTimestamp
        body.i64()  # producerId
        body.i16()  # producerEpoch
        body.i32()  # baseSequence
        n = body.i32()
        for _ in range(n):
            rlen = body.varint()
            rec = Reader(body.take(rlen))
            rec.i8()  # record attributes (raw int8, unused)
            ts_delta = rec.varint()
            off_delta = rec.varint()
            klen = rec.varint()
            key = rec.take(klen) if klen >= 0 else None
            vlen = rec.varint()
            value = rec.take(vlen) if vlen >= 0 else None
            hn = rec.varint()
            for _ in range(hn):  # headers: skip
                hk = rec.varint()
                rec.take(hk)
                hv = rec.varint()
                if hv > 0:
                    rec.take(hv)
            out.append((base_offset + off_delta, first_ts + ts_delta, key, value))
    return out


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (org.apache.kafka.common.utils.Utils.murmur2,
    seed 0x9747b28c) — the DEFAULT partitioner hashes keys with this,
    so keyed messages land on the same partition a Java producer would
    pick. uint32 domain; callers mask to positive."""
    m, r = 0x5BD1E995, 24
    h = (0x9747B28C ^ len(data)) & 0xFFFFFFFF
    n4 = len(data) // 4 * 4
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
    tail = len(data) % 4
    if tail == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if tail >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if tail >= 1:
        h ^= data[n4] & 0xFF
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def default_partition(key: bytes, num_partitions: int) -> int:
    """Kafka DefaultPartitioner for keyed messages:
    toPositive(murmur2(key)) % numPartitions."""
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


# ------------------------------------------------------------- the client
API_PRODUCE, API_FETCH, API_LIST_OFFSETS, API_METADATA, API_VERSIONS = 0, 1, 2, 3, 18


class KafkaWireClient:
    """Blocking single-connection Kafka client: enough protocol for a
    source reader (metadata → list_offsets → fetch loop) and a sink
    producer (produce with acks=-1). One in-flight request at a time —
    ordering is the caller's (the reference reader is also a serial
    poll loop per split)."""

    def __init__(self, host: str, port: int, client_id: str = "risingwave-spark"):
        import socket

        self.sock = _nodelay_connect((host, port), timeout=30)
        self.client_id = client_id
        self._corr = 0
        self._lock = threading.Lock()

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def _roundtrip(self, api_key: int, api_version: int, body: bytes) -> Reader:
        with self._lock:
            self._corr += 1
            corr = self._corr
            header = (
                enc_i16(api_key)
                + enc_i16(api_version)
                + enc_i32(corr)
                + enc_string(self.client_id)
            )
            msg = header + body
            self.sock.sendall(enc_i32(len(msg)) + msg)
            raw = self._recv_frame()
        r = Reader(raw)
        got = r.i32()
        if got != corr:
            raise ValueError(f"correlation id mismatch: sent {corr}, got {got}")
        return r

    def _recv_frame(self) -> bytes:
        hdr = self._recv_n(4)
        (n,) = struct.unpack(">i", hdr)
        return self._recv_n(n)

    def _recv_n(self, n: int) -> bytes:
        chunks = bytearray()
        while len(chunks) < n:
            c = self.sock.recv(n - len(chunks))
            if not c:
                raise ConnectionError("broker closed the connection")
            chunks += c
        return bytes(chunks)

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._roundtrip(API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise ValueError(f"ApiVersions error {err}")
        out = {}
        for _ in range(r.i32()):
            k, lo, hi = r.i16(), r.i16(), r.i16()
            out[k] = (lo, hi)
        return out

    def metadata(self, topics: list[str] | None = None) -> dict:
        body = enc_i32(-1) if topics is None else (
            enc_i32(len(topics)) + b"".join(enc_string(t) for t in topics)
        )
        r = self._roundtrip(API_METADATA, 1, body)
        brokers = []
        for _ in range(r.i32()):
            nid, host, port, rack = r.i32(), r.string(), r.i32(), r.string()
            brokers.append({"node_id": nid, "host": host, "port": port, "rack": rack})
        controller = r.i32()
        tops = {}
        for _ in range(r.i32()):
            terr, tname, _internal = r.i16(), r.string(), r.i8()
            parts = []
            for _ in range(r.i32()):
                perr, pid, leader = r.i16(), r.i32(), r.i32()
                replicas = [r.i32() for _ in range(r.i32())]
                isr = [r.i32() for _ in range(r.i32())]
                parts.append({"error": perr, "partition": pid, "leader": leader,
                              "replicas": replicas, "isr": isr})
            tops[tname] = {"error": terr, "partitions": parts}
        return {"brokers": brokers, "controller": controller, "topics": tops}

    def produce(
        self,
        topic: str,
        partition: int,
        records: list[tuple[bytes | None, bytes | None, int]],
        acks: int = -1,
        timeout_ms: int = 30000,
    ) -> int:
        """Produce one batch; returns the broker-assigned base offset."""
        record_set = encode_record_batch(records, base_offset=0)
        body = (
            enc_string(None)  # transactional_id
            + enc_i16(acks)
            + enc_i32(timeout_ms)
            + enc_i32(1)  # one topic
            + enc_string(topic)
            + enc_i32(1)  # one partition
            + enc_i32(partition)
            + enc_bytes(record_set)
        )
        r = self._roundtrip(API_PRODUCE, 3, body)
        base = -1
        for _ in range(r.i32()):
            r.string()  # topic
            for _ in range(r.i32()):
                _pid, err, base = r.i32(), r.i16(), r.i64()
                r.i64()  # log_append_time
                if err:
                    raise ValueError(f"Produce error {err} on {topic}/{partition}")
        r.i32()  # throttle_time
        return base

    def list_offsets(self, topic: str, partition: int, timestamp: int = -1) -> int:
        """timestamp -1 = latest (log end), -2 = earliest."""
        body = (
            enc_i32(-1)  # replica_id
            + enc_i32(1)
            + enc_string(topic)
            + enc_i32(1)
            + enc_i32(partition)
            + enc_i64(timestamp)
        )
        r = self._roundtrip(API_LIST_OFFSETS, 1, body)
        r.i32()  # responses count (1)
        r.string()
        r.i32()  # partitions count (1)
        _pid, err = r.i32(), r.i16()
        r.i64()  # timestamp
        off = r.i64()
        if err:
            raise ValueError(f"ListOffsets error {err} on {topic}/{partition}")
        return off

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_bytes: int = 8 << 20,
        max_wait_ms: int = 100,
    ) -> tuple[list[tuple[int, int, bytes | None, bytes | None]], int]:
        """Fetch from `offset`; returns (records, high_watermark)."""
        body = (
            enc_i32(-1)  # replica_id
            + enc_i32(max_wait_ms)
            + enc_i32(1)  # min_bytes
            + enc_i32(max_bytes)
            + enc_i8(0)  # isolation_level: read_uncommitted
            + enc_i32(1)
            + enc_string(topic)
            + enc_i32(1)
            + enc_i32(partition)
            + enc_i64(offset)
            + enc_i32(max_bytes)
        )
        r = self._roundtrip(API_FETCH, 4, body)
        r.i32()  # throttle_time
        records, hwm = [], 0
        for _ in range(r.i32()):
            r.string()  # topic
            for _ in range(r.i32()):
                _pid, err, hwm = r.i32(), r.i16(), r.i64()
                r.i64()  # last_stable_offset
                for _ in range(r.i32()):  # aborted transactions
                    r.i64()
                    r.i64()
                rs = r.bytes_()
                if err:
                    raise ValueError(f"Fetch error {err} on {topic}/{partition}")
                if rs:
                    records.extend(decode_record_batches(rs))
        # batches re-deliver from their base offset — trim below the ask
        return [x for x in records if x[0] >= offset], hwm
