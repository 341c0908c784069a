"""Pure-stdlib Redis RESP client + loopback server (reference
`src/connector/src/sink/redis.rs`: redis-rs pipelines of SET/DEL —
upsert writes the value JSON under the key, a retraction deletes the
key; options redis.url + key_format/value_format templates).

Speaks the PUBLIC RESP protocol (redis.io/docs/reference/protocol-spec):
commands as arrays of bulk strings (`*N\\r\\n$len\\r\\n…`), replies as
simple strings / bulk strings / integers / arrays / errors. The
loopback serves SET/GET/DEL/KEYS/PING over the same bytes — the
in-sandbox stand-in for a server; point redis.url at a real one and
the bytes are identical.
"""

from __future__ import annotations

import fnmatch
import socket
import socketserver
import threading


def _nodelay_connect(addr, timeout=None):
    """connect + TCP_NODELAY: every protocol here is request-
    reply; Nagle's algorithm turns small write-write-read
    exchanges into ~40 ms delayed-ACK stalls per round trip."""
    s = socket.create_connection(addr, timeout=timeout)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s



class RedisClient:
    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = _nodelay_connect((host, port), timeout=timeout)
        self._buf = b""
        if self.command("PING") != "PONG":
            raise OSError("redis PING failed")

    # ------------------------------------------------------------ wire io
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("redis connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise OSError("redis connection closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _read_reply(self):
        line = self._read_line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest.decode()
        if t == b"-":
            raise OSError(f"redis error: {rest.decode()}")
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            if n < 0:
                return None
            out = self._read_exact(n)
            self._read_exact(2)
            return out.decode()
        if t == b"*":
            return [self._read_reply() for _ in range(int(rest))]
        raise OSError(f"unexpected RESP type {t!r}")

    def command(self, *args: str):
        out = f"*{len(args)}\r\n".encode()
        for a in args:
            b = a.encode()
            out += f"${len(b)}\r\n".encode() + b + b"\r\n"
        self.sock.sendall(out)
        return self._read_reply()

    # ------------------------------------------------------------ helpers
    def set(self, key: str, value: str) -> None:
        self.command("SET", key, value)

    def get(self, key: str):
        return self.command("GET", key)

    def delete(self, key: str) -> int:
        return self.command("DEL", key)

    def keys(self, pattern: str = "*") -> list[str]:
        return sorted(self.command("KEYS", pattern))

    def dump_all(self, pattern: str = "*") -> dict[str, str]:
        return {k: self.get(k) for k in self.keys(pattern)}

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class LoopbackRedis:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.data: dict[str, str] = {}
        self._lock = threading.Lock()
        store = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                self._buf = b""
                try:
                    while True:
                        cmd = self._read_command()
                        if cmd is None:
                            return
                        self._dispatch([c.decode() for c in cmd])
                except OSError:
                    return

            def _read_exact(self, n):
                while len(self._buf) < n:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        return None
                    self._buf += chunk
                out, self._buf = self._buf[:n], self._buf[n:]
                return out

            def _read_line(self):
                while b"\r\n" not in self._buf:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        return None
                    self._buf += chunk
                line, self._buf = self._buf.split(b"\r\n", 1)
                return line

            def _read_command(self):
                line = self._read_line()
                if line is None or not line.startswith(b"*"):
                    return None
                n = int(line[1:])
                out = []
                for _ in range(n):
                    hdr = self._read_line()
                    if hdr is None or not hdr.startswith(b"$"):
                        return None
                    ln = int(hdr[1:])
                    body = self._read_exact(ln)
                    if body is None:
                        return None
                    self._read_exact(2)
                    out.append(body)
                return out

            def _send(self, data: bytes):
                self.request.sendall(data)

            def _bulk(self, s: str | None):
                if s is None:
                    self._send(b"$-1\r\n")
                else:
                    b = s.encode()
                    self._send(f"${len(b)}\r\n".encode() + b + b"\r\n")

            def _dispatch(self, cmd: list[str]):
                op = cmd[0].upper()
                if op == "PING":
                    self._send(b"+PONG\r\n")
                elif op == "SET" and len(cmd) == 3:
                    with store._lock:
                        store.data[cmd[1]] = cmd[2]
                    self._send(b"+OK\r\n")
                elif op == "GET" and len(cmd) == 2:
                    with store._lock:
                        v = store.data.get(cmd[1])
                    self._bulk(v)
                elif op == "DEL":
                    with store._lock:
                        n = sum(store.data.pop(k, None) is not None for k in cmd[1:])
                    self._send(f":{n}\r\n".encode())
                elif op == "KEYS" and len(cmd) == 2:
                    with store._lock:
                        ks = [k for k in store.data if fnmatch.fnmatch(k, cmd[1])]
                    self._send(f"*{len(ks)}\r\n".encode())
                    for k in ks:
                        self._bulk(k)
                else:
                    self._send(f"-ERR unknown command '{cmd[0]}'\r\n".encode())

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

    def start(self) -> "LoopbackRedis":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
