"""Pure-stdlib MongoDB wire client + loopback server (reference
`src/connector/src/sink/mongodb.rs`: the mongodb sink drives the
official Rust driver's bulk update/delete commands; this module
speaks the PUBLIC protocol directly — mongodb.com/docs "MongoDB Wire
Protocol": OP_MSG (opcode 2013) framing around BSON command
documents — bsonspec.org for the element encoding).

Implemented:

* BSON encode/decode for the sink's value domain: double, string,
  embedded document, array, bool, null, int64 (ints widen to int64,
  matching the engine's JSON-safe event values).
* OP_MSG request/response with kind-0 body sections.
* SCRAM-SHA-256 authentication per the MongoDB SASL contract
  (`saslStart`/`saslContinue` command conversation over the same
  RFC 5802 exchange as Postgres — the scram machinery is shared from
  sources/pgwire.py, with MongoDB's n=<user> convention). The
  loopback VERIFIES the client proof; wrong passwords are rejected.
* Commands: insert / update ({"q", "u": {"$set": ...}, "upsert"}) /
  delete ({"q", "limit": 1}) / find — the exact bulk shapes
  mongodb.rs builds (`mongodb.rs:531-560`).

`LoopbackMongo` stores documents per (db, collection) keyed by the
BSON of `_id` — upsert/delete semantics identical to a real server
for the sink's workload.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

# module-top import: _ScramClient must be a by-value global of this
# module (sink_exec registers both modules pickle-by-value) — a
# function-body import dies on executor workers that cannot import
# the package at all
from risingwave_spark.sources.pgwire import _ScramClient


def _nodelay_connect(addr, timeout=None):
    """connect + TCP_NODELAY: every protocol here is request-
    reply; Nagle's algorithm turns small write-write-read
    exchanges into ~40 ms delayed-ACK stalls per round trip."""
    s = socket.create_connection(addr, timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s


OP_MSG = 2013


# ------------------------------------------------------------------- BSON
def bson_encode(doc: dict) -> bytes:
    out = bytearray()
    for k, v in doc.items():
        key = k.encode() + b"\x00"
        if isinstance(v, bool):
            out += b"\x08" + key + (b"\x01" if v else b"\x00")
        elif isinstance(v, int):
            out += b"\x12" + key + struct.pack("<q", v)
        elif isinstance(v, float):
            out += b"\x01" + key + struct.pack("<d", v)
        elif isinstance(v, str):
            s = v.encode() + b"\x00"
            out += b"\x02" + key + struct.pack("<i", len(s)) + s
        elif v is None:
            out += b"\x0a" + key
        elif isinstance(v, dict):
            out += b"\x03" + key + bson_encode(v)
        elif isinstance(v, (list, tuple)):
            arr = {str(i): x for i, x in enumerate(v)}
            out += b"\x04" + key + bson_encode(arr)
        elif isinstance(v, bytes):
            out += (b"\x05" + key + struct.pack("<i", len(v)) + b"\x00" + v)
        else:
            raise TypeError(f"bson: unsupported type {type(v).__name__}")
    return struct.pack("<i", len(out) + 5) + bytes(out) + b"\x00"


def bson_decode(buf: bytes, offset: int = 0) -> tuple[dict, int]:
    (total,) = struct.unpack_from("<i", buf, offset)
    end = offset + total - 1  # trailing NUL
    i = offset + 4
    doc: dict = {}
    while i < end:
        t = buf[i]
        i += 1
        j = buf.index(b"\x00", i)
        key = buf[i:j].decode()
        i = j + 1
        if t == 0x01:
            (v,) = struct.unpack_from("<d", buf, i)
            i += 8
        elif t == 0x02:
            (ln,) = struct.unpack_from("<i", buf, i)
            v = buf[i + 4:i + 4 + ln - 1].decode()
            i += 4 + ln
        elif t in (0x03, 0x04):
            v, i = bson_decode(buf, i)
            if t == 0x04:
                v = [v[str(k)] for k in range(len(v))]
        elif t == 0x05:
            (ln,) = struct.unpack_from("<i", buf, i)
            v = buf[i + 5:i + 5 + ln]
            i += 5 + ln
        elif t == 0x08:
            v = bool(buf[i])
            i += 1
        elif t == 0x0A:
            v = None
        elif t == 0x10:
            (v,) = struct.unpack_from("<i", buf, i)
            i += 4
        elif t == 0x12:
            (v,) = struct.unpack_from("<q", buf, i)
            i += 8
        else:
            raise ValueError(f"bson: unsupported element type 0x{t:x}")
        doc[key] = v
    return doc, end + 1


# ----------------------------------------------------------------- OP_MSG
class _Msg:
    def __init__(self, sock):
        self.sock = sock
        self._buf = b""
        self._req = 0

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("mongodb connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_msg(self) -> tuple[int, dict]:
        hdr = self._read_exact(16)
        ln, req, _resp, op = struct.unpack("<iiii", hdr)
        body = self._read_exact(ln - 16)
        if op != OP_MSG:
            raise OSError(f"unsupported mongodb opcode {op}")
        # flagBits(4) + kind byte 0 + document
        if body[4] != 0:
            raise OSError("only kind-0 OP_MSG sections supported")
        doc, _ = bson_decode(body, 5)
        return req, doc

    def send_msg(self, doc: dict, response_to: int = 0) -> int:
        self._req += 1
        body = struct.pack("<I", 0) + b"\x00" + bson_encode(doc)
        self.sock.sendall(
            struct.pack("<iiii", len(body) + 16, self._req, response_to,
                        OP_MSG) + body)
        return self._req


class MongoClient:
    def __init__(self, host: str, port: int, user: str | None = None,
                 password: str | None = None, timeout: float = 10.0):
        self.conn = _Msg(
            _nodelay_connect((host, port), timeout=timeout))
        if user is not None:
            self._auth(user, password or "")

    def _auth(self, user: str, password: str) -> None:
        """SCRAM-SHA-256 SASL conversation (saslStart/saslContinue on
        $db admin — the driver handshake mongodb documents)."""
        scram = _ScramClient(user, password, n_user=True)
        r1 = self.command({
            "saslStart": 1, "mechanism": "SCRAM-SHA-256",
            "payload": scram.client_first.encode(), "$db": "admin",
        })
        server_first = (
            r1["payload"].decode()
            if isinstance(r1["payload"], bytes) else str(r1["payload"]))
        final = scram.final(server_first)
        r2 = self.command({
            "saslContinue": 1, "conversationId": r1["conversationId"],
            "payload": final.encode(), "$db": "admin",
        })
        server_final = (
            r2["payload"].decode()
            if isinstance(r2["payload"], bytes) else str(r2["payload"]))
        scram.verify(server_final)
        if not r2.get("done"):
            self.command({
                "saslContinue": 1, "conversationId": r1["conversationId"],
                "payload": b"", "$db": "admin",
            })

    def command(self, doc: dict) -> dict:
        self.conn.send_msg(doc)
        _req, resp = self.conn.read_msg()
        if resp.get("ok") != 1.0 and resp.get("ok") != 1:
            raise OSError(
                f"mongodb error: {resp.get('errmsg', resp)}")
        if resp.get("writeErrors"):
            raise OSError(f"mongodb write errors: {resp['writeErrors']}")
        return resp

    def update(self, db: str, coll: str, updates: list[dict]) -> dict:
        return self.command({
            "update": coll, "ordered": True, "updates": updates,
            "$db": db})

    def delete(self, db: str, coll: str, deletes: list[dict]) -> dict:
        return self.command({
            "delete": coll, "ordered": True, "deletes": deletes,
            "$db": db})

    def insert(self, db: str, coll: str, docs: list[dict]) -> dict:
        return self.command({
            "insert": coll, "ordered": True, "documents": docs, "$db": db})

    def change_stream(
        self, db: str, coll: str, resume_after: str = "",
        batch_size: int | None = None,
    ) -> tuple[list[dict], str]:
        """Poll the collection's change stream (aggregate with a
        $changeStream stage, resuming past the saved token) →
        (events, resume_token). Each event: operationType
        insert|update|delete, documentKey, fullDocument (absent on
        delete), _id._data the resume token — an OPAQUE string, never
        parsed client-side (real MongoDB tokens are hex-encoded
        KeyStrings; the only contract is that the server can resume
        from one). The returned token is the cursor's
        postBatchResumeToken when present (the spec's batch-end pin),
        else the last event's token, else resume_after unchanged.
        batch_size bounds one reply (the cursor-batching contract) —
        pollers loop with the returned token until the batch comes
        back empty."""
        pipeline = [{"$changeStream": (
            {"resumeAfter": {"_data": resume_after}} if resume_after
            else {})}]
        cursor = {"batchSize": batch_size} if batch_size else {}
        r = self.command({"aggregate": coll, "$db": db,
                          "pipeline": pipeline, "cursor": cursor})
        events = r["cursor"]["firstBatch"]
        pbrt = r["cursor"].get("postBatchResumeToken")
        if isinstance(pbrt, dict) and pbrt.get("_data"):
            return events, str(pbrt["_data"])
        if events:
            return events, str(events[-1]["_id"]["_data"])
        return events, resume_after

    def operation_time(self) -> str:
        """Current server operation time as an OPAQUE resume-point
        token (the standard command-reply field) — what a snapshotting
        client pins its change-stream resume point with BEFORE reading
        the collection. Never parsed client-side."""
        return str(self.command({"ping": 1, "$db": "admin"}).get(
            "operationTime", ""))

    def find(self, db: str, coll: str, filter: dict | None = None,
             sort: dict | None = None,
             limit: int | None = None) -> list[dict]:
        cmd = {"find": coll, "$db": db}
        if filter:
            cmd["filter"] = filter
        if sort:
            cmd["sort"] = sort
        if limit:
            cmd["limit"] = limit
        resp = self.command(cmd)
        return resp["cursor"]["firstBatch"]

    def find_paged(self, db: str, coll: str, batch: int):
        """_id-keyset paged scan (Debezium's chunked collection
        snapshot): sorted by _id, ≤ batch docs per page, resuming past
        the last _id — a huge collection never arrives in one reply."""
        last = None
        while True:
            flt = {"_id": {"$gt": last}} if last is not None else None
            page = self.find(db, coll, filter=flt, sort={"_id": 1},
                             limit=batch)
            if not page:
                return
            yield page
            if len(page) < batch:
                return
            last = page[-1].get("_id")

    def close(self) -> None:
        try:
            self.conn.sock.close()
        except OSError:
            pass


def _render_tok(n: int) -> str:
    """Internal oplog sequence → wire resume token. Shaped like real
    MongoDB tokens (hex-encoded, '82'-prefixed KeyString look, fixed
    width so lexical order == event order); clients treat it as
    OPAQUE — only this server ever compares or generates them."""
    return "82%030x" % n


class LoopbackMongo:
    """In-memory document store answering over genuine OP_MSG framing,
    with real SCRAM-SHA-256 verification when credentials are set."""

    def __init__(self, user: str | None = None, password: str = "",
                 host: str = "127.0.0.1", port: int = 0):
        self.user, self.password = user, password
        self.colls: dict[tuple, dict] = {}  # (db, coll) -> {idbson: doc}
        # change-stream oplog: (db, coll) -> [(token, optype, key, full)]
        # — every write appends a spec-shaped change event; aggregate
        # with a $changeStream stage replays events past resumeAfter.
        # Divergence, documented: no live tailing via getMore — a poll
        # re-issues aggregate with the last resume token (valid real-
        # Mongo usage; deterministic like the broker loopbacks).
        self.oplog: dict[tuple, list] = {}
        self._optime = 0
        self._lock = threading.Lock()
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                conn = _Msg(self.request)
                authed = server.user is None
                scram_state: dict = {}
                try:
                    while True:
                        req, doc = conn.read_msg()
                        cmd = next(iter(doc))
                        if cmd == "saslStart":
                            resp = self._sasl_start(doc, scram_state)
                        elif cmd == "saslContinue":
                            resp, ok = self._sasl_continue(
                                doc, scram_state)
                            authed = authed or ok
                        elif not authed:
                            resp = {"ok": 0.0,
                                    "errmsg": "command requires auth",
                                    "code": 13}
                        elif cmd == "insert":
                            resp = self._insert(doc)
                        elif cmd == "update":
                            resp = self._update(doc)
                        elif cmd == "delete":
                            resp = self._delete(doc)
                        elif cmd == "find":
                            resp = self._find(doc)
                        elif cmd == "aggregate":
                            resp = self._aggregate(doc)
                        elif cmd in ("ping", "hello", "isMaster"):
                            # command replies carry operationTime (the
                            # public field clients pin snapshots with;
                            # here = the latest oplog optime)
                            with server._lock:
                                resp = {"ok": 1.0, "operationTime":
                                        _render_tok(server._optime)}
                        else:
                            resp = {"ok": 0.0,
                                    "errmsg": f"no such command {cmd!r}"}
                        conn.send_msg(resp, response_to=req)
                except OSError:
                    return

            # ------------------------------------------------ scram
            def _sasl_start(self, doc, state):
                import base64
                import os as _os

                payload = doc["payload"]
                first = (payload.decode()
                         if isinstance(payload, bytes) else str(payload))
                bare = first.split(",", 2)[2]
                attrs = dict(kv.split("=", 1) for kv in bare.split(","))
                if attrs.get("n") != server.user:
                    return {"ok": 0.0, "errmsg": "auth failed"}
                cnonce = attrs["r"]
                salt = _os.urandom(16)
                snonce = cnonce + base64.b64encode(
                    _os.urandom(12)).decode()
                server_first = (
                    f"r={snonce},s={base64.b64encode(salt).decode()},"
                    "i=4096")
                state.update(bare=bare, salt=salt, snonce=snonce,
                             server_first=server_first)
                return {"ok": 1.0, "conversationId": 1, "done": False,
                        "payload": server_first.encode()}

            def _sasl_continue(self, doc, state):
                import base64
                import hashlib

                from risingwave_spark.sources.pgwire import (
                    _scram_hmac,
                    _scram_keys,
                )

                payload = doc["payload"]
                if not payload:  # the final empty round
                    return {"ok": 1.0, "conversationId": 1,
                            "done": True, "payload": b""}, True
                final = (payload.decode()
                         if isinstance(payload, bytes) else str(payload))
                attrs = dict(kv.split("=", 1) for kv in final.split(","))
                without_proof = final.rsplit(",p=", 1)[0]
                auth_msg = ",".join(
                    [state["bare"], state["server_first"],
                     without_proof]).encode()
                _s, _c, stored, skey = _scram_keys(
                    server.password, state["salt"], 4096)
                proof = base64.b64decode(attrs["p"])
                sig = _scram_hmac(stored, auth_msg)
                ckey = bytes(a ^ b for a, b in zip(proof, sig))
                if (attrs.get("r") != state["snonce"]
                        or hashlib.sha256(ckey).digest() != stored):
                    return {"ok": 0.0, "errmsg": "auth failed"}, False
                v = base64.b64encode(
                    _scram_hmac(skey, auth_msg)).decode()
                return {"ok": 1.0, "conversationId": 1, "done": False,
                        "payload": f"v={v}".encode()}, True

            # ---------------------------------------------- commands
            @staticmethod
            def _matches(q: dict, d: dict) -> bool:
                return all(d.get(k) == v for k, v in q.items())

            def _coll(self, doc, cmd):
                return server.colls.setdefault(
                    (doc["$db"], doc[cmd]), {})

            @staticmethod
            def _log(ns, optype, key, full):
                """Append a spec-shaped change event (caller holds the
                lock). Token = monotonic optime, the resume cursor."""
                server._optime += 1
                server.oplog.setdefault(ns, []).append(
                    (server._optime, optype, key, full))

            def _insert(self, doc):
                with server._lock:
                    ns = (doc["$db"], doc["insert"])
                    coll = self._coll(doc, "insert")
                    for d in doc.get("documents", []):
                        coll[bson_encode({"_id": d.get("_id")})] = d
                        self._log(ns, "insert", {"_id": d.get("_id")},
                                  dict(d))
                return {"ok": 1.0, "n": len(doc.get("documents", []))}

            @staticmethod
            def _by_id(coll, q):
                """O(1) fast path when the filter is exactly {_id: x}
                (the collection dict is keyed by the _id's bson)."""
                if set(q) == {"_id"}:
                    d = coll.get(bson_encode({"_id": q["_id"]}))
                    return [d] if d is not None else []
                return None

            def _update(self, doc):
                n = 0
                with server._lock:
                    ns = (doc["$db"], doc["update"])
                    coll = self._coll(doc, "update")
                    for u in doc.get("updates", []):
                        q, set_doc = u["q"], u["u"].get("$set", {})
                        hit = False
                        fast = self._by_id(coll, q)
                        cands = (fast if fast is not None
                                 else [d for d in list(coll.values())
                                       if self._matches(q, d)])
                        for d in cands:
                            d.update(set_doc)
                            self._log(ns, "update",
                                      {"_id": d.get("_id")}, dict(d))
                            hit = True
                            n += 1
                        if not hit and u.get("upsert"):
                            d = dict(q)
                            d.update(set_doc)
                            coll[bson_encode(
                                {"_id": d.get("_id")})] = d
                            self._log(ns, "insert",
                                      {"_id": d.get("_id")}, dict(d))
                            n += 1
                return {"ok": 1.0, "n": n}

            def _delete(self, doc):
                n = 0
                with server._lock:
                    ns = (doc["$db"], doc["delete"])
                    coll = self._coll(doc, "delete")
                    for spec in doc.get("deletes", []):
                        q = spec["q"]
                        if set(q) == {"_id"}:  # O(1) fast path
                            key = bson_encode({"_id": q["_id"]})
                            d = coll.pop(key, None)
                            if d is not None:
                                self._log(ns, "delete",
                                          {"_id": d.get("_id")}, None)
                                n += 1
                            continue
                        for key, d in list(coll.items()):
                            if self._matches(q, d):
                                del coll[key]
                                self._log(ns, "delete",
                                          {"_id": d.get("_id")}, None)
                                n += 1
                                if spec.get("limit") == 1:
                                    break
                return {"ok": 1.0, "n": n}

            def _aggregate(self, doc):
                """aggregate with a $changeStream stage: events past
                resumeAfter._data, shaped per the public change-events
                spec (mongodb.com/docs change-events): _id resume
                token, operationType, ns, documentKey, fullDocument
                (update events carry the post-image — the
                fullDocument: updateLookup posture)."""
                pipeline = doc.get("pipeline") or []
                if not (pipeline and "$changeStream" in pipeline[0]):
                    return {"ok": 0.0, "errmsg":
                            "only $changeStream aggregates are supported"}
                cs = pipeline[0]["$changeStream"] or {}
                after = ""
                tok = cs.get("resumeAfter")
                if isinstance(tok, dict):
                    # tokens are opaque strings; this server generates
                    # them fixed-width so lexical order == event order
                    after = str(tok.get("_data", ""))
                ns = (doc["$db"], doc["aggregate"])
                # cursor.batchSize bounds the reply (the real API's
                # cursor batching; pollers resume past the last token)
                limit = int((doc.get("cursor") or {}).get(
                    "batchSize") or 0) or None
                with server._lock:
                    events = [
                        {
                            "_id": {"_data": _render_tok(t)},
                            "operationType": op,
                            "ns": {"db": ns[0], "coll": ns[1]},
                            "documentKey": key,
                            **({"fullDocument": full}
                               if full is not None else {}),
                        }
                        for t, op, key, full
                        in server.oplog.get(ns, [])
                        if _render_tok(t) > after
                    ][:limit]
                    # postBatchResumeToken (the spec's batch-end pin):
                    # the last delivered event's token when the batch
                    # was truncated, else the newest token scanned for
                    # the namespace (so an empty poll still advances
                    # the caller's pin to "now").
                    log = server.oplog.get(ns, [])
                    if limit and len(events) == limit:
                        pbrt = events[-1]["_id"]["_data"]
                    elif log:
                        pbrt = max(after, _render_tok(log[-1][0]))
                    else:
                        pbrt = after
                return {"ok": 1.0, "cursor": {
                    "id": 0,
                    "ns": f"{ns[0]}.{ns[1]}",
                    "firstBatch": events,
                    **({"postBatchResumeToken": {"_data": pbrt}}
                       if pbrt else {})}}

            def _find(self, doc):
                """find with the snapshot-pager's surface: filter
                ({_id: {$gt: x}} or equality), sort ({_id: 1}), limit
                — the subset Debezium's chunked collection snapshot
                issues."""
                flt = doc.get("filter") or {}
                limit = int(doc.get("limit") or 0) or None
                with server._lock:
                    coll = self._coll(doc, "find")
                    docs = list(coll.values())
                if flt:
                    def keep(d):
                        for k, cond in flt.items():
                            if isinstance(cond, dict):
                                if "$gt" in cond and not (
                                        d.get(k) is not None
                                        and d[k] > cond["$gt"]):
                                    return False
                            elif d.get(k) != cond:
                                return False
                        return True
                    docs = [d for d in docs if keep(d)]
                if doc.get("sort"):
                    for k, direction in reversed(
                            list(doc["sort"].items())):
                        docs.sort(key=lambda d: d.get(k),
                                  reverse=direction < 0)
                if limit:
                    docs = docs[:limit]
                return {"ok": 1.0, "cursor": {
                    "id": 0,
                    "ns": f"{doc['$db']}.{doc['find']}",
                    "firstBatch": docs}}

        class Server(socketserver.ThreadingTCPServer):
            def process_request(self, request, client_address):
                # TCP_NODELAY on the accept side too: reply bytes must
                # not sit in Nagle's buffer waiting for a delayed ACK
                request.setsockopt(
                    socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                super().process_request(request, client_address)
            daemon_threads = True
            allow_reuse_address = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def docs(self, db: str, coll: str) -> list[dict]:
        with self._lock:
            return list(self.colls.get((db, coll), {}).values())

    def start(self) -> "LoopbackMongo":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
