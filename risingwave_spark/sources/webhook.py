"""Webhook source: HTTP ingestion into an engine table with per-request
signature validation — the reference's webhook connector
(`src/frontend/src/webhook/mod.rs`, e2e_test/webhook/webhook_source.slt).

Architecture mirrors the reference exactly: validation is FRONTEND work,
not stream-engine work — `verify_signature` (webhook/utils.rs:77-105)
binds a 3-input row (headers jsonb, secret string, payload bytes) and
evaluates the compiled VALIDATE expression per request; only accepted
payloads reach the table (the reference fast-inserts one jsonb row).
Here the VALIDATE expression is compiled ONCE at CREATE into a Python
callable (the driver-side analog of `ExprImpl::eval_row`); the HTTP
listener is a stdlib ThreadingHTTPServer routing
POST /webhook/<database>/<schema>/<table> (mod.rs:237). The insert goes
through the engine's normal DML path, so downstream MVs fold the rows
like any other write (wait_for_persistence=true semantics: the request
returns only after the row is durable).

The expression evaluator supports the validation grammar the reference
e2e suite exercises: secure_compare, `headers->>'k'`, `||`,
encode(.., 'hex'/'base64'), hmac(key, msg, 'sha1'/'sha256'),
sha256(..), convert_to(s, 'UTF8'), convert_from(b, 'utf8'), string
literals, and the bound identifiers (`headers`, `data`, the declared
secret name). Anything else is rejected loudly at CREATE time.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from risingwave_spark.sqlparse import SqlParseError, Tok, tokenize


class _EvalP:
    """Cursor over the VALIDATE expression's tokens."""

    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def eat(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def try_op(self, val: str) -> bool:
        t = self.peek()
        if t is not None and t.kind == "op" and t.val == val:
            self.i += 1
            return True
        return False

    def expect_op(self, val: str) -> None:
        t = self.peek()
        if t is None or t.kind != "op" or t.val != val:
            raise SqlParseError(
                f"expected {val!r} in VALIDATE expression"
                + (f" near {t.val!r}" if t is not None else "")
            )
        self.i += 1


def _unquote_str(lexeme: str) -> str:
    return lexeme[1:-1].replace("''", "'")


def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("utf-8")
    raise SqlParseError(f"cannot use {type(v).__name__} as bytea in VALIDATE")


def _as_str(v) -> str:
    if isinstance(v, str):
        return v
    raise SqlParseError(f"cannot use {type(v).__name__} as text in VALIDATE")


def compile_validate(expr_text: str, secret_name: str | None, secret_value: str):
    """Compile a VALIDATE signature expression into
    `fn(headers: dict[str, str], body: bytes) -> bool`.

    The closure is built once at CREATE (reference builds the ExprNode
    once and `eval_row`s it per request); unsupported constructs fail
    HERE, not at request time."""
    toks = tokenize(expr_text)
    p = _EvalP(toks)

    def parse_concat():
        # `a || b || c` — the only binary operator the validation
        # grammar uses (webhook_source.slt forms)
        parts = [parse_postfix()]
        while p.try_op("||"):
            parts.append(parse_postfix())
        if len(parts) == 1:
            return parts[0]

        def run(env):
            vals = [pt(env) for pt in parts]
            if any(isinstance(v, bytes) for v in vals):
                raise SqlParseError("|| of bytea needs convert_from(..) first")
            return "".join(_as_str(v) for v in vals)

        return run

    def parse_postfix():
        base = parse_primary()
        # `headers->>'key'`: the tokenizer splits ->> as '-','>','>'
        t0, t1, t2 = p.peek(0), p.peek(1), p.peek(2)
        if (
            t0 is not None and t0.kind == "op" and t0.val == "-"
            and t1 is not None and t1.kind == "op" and t1.val == ">"
            and t2 is not None and t2.kind == "op" and t2.val == ">"
        ):
            p.eat(), p.eat(), p.eat()
            keyt = p.peek()
            if keyt is None or keyt.kind != "str":
                raise SqlParseError("->> in VALIDATE needs a string key")
            p.eat()
            key = _unquote_str(keyt.val)

            def run(env):
                obj = base(env)
                if not isinstance(obj, dict):
                    raise SqlParseError("->> applied to a non-object")
                return obj.get(key)

            return run
        return base

    def parse_primary():
        t = p.peek()
        if t is None:
            raise SqlParseError("unexpected end of VALIDATE expression")
        if t.kind == "str":
            p.eat()
            lit = _unquote_str(t.val)
            return lambda env: lit
        if t.kind == "op" and t.val == "(":
            p.eat()
            inner = parse_concat()
            p.expect_op(")")
            return inner
        if t.kind != "ident":
            raise SqlParseError(f"unsupported token {t.val!r} in VALIDATE")
        name = t.val
        p.eat()
        nxt = p.peek()
        if nxt is not None and nxt.kind == "op" and nxt.val == "(":
            return parse_call(name.lower())
        # bound identifiers: headers / data / the declared secret name
        low = name.lower()
        if low == "headers":
            return lambda env: env["headers"]
        if low == "data":
            return lambda env: env["data"]
        if secret_name is not None and name == secret_name:
            return lambda env: secret_value
        raise SqlParseError(
            f"unknown identifier {name!r} in VALIDATE (bound names: "
            f"headers, data"
            + (f", {secret_name}" if secret_name else "")
            + ")"
        )

    def parse_args():
        p.expect_op("(")
        args = []
        if not p.try_op(")"):
            while True:
                args.append(parse_concat())
                if p.try_op(")"):
                    break
                p.expect_op(",")
        return args

    def parse_call(fn: str):
        args = parse_args()

        def need(n):
            if len(args) != n:
                raise SqlParseError(f"{fn}() takes {n} arguments in VALIDATE")

        if fn == "secure_compare":
            # constant-time comparison (reference expr_secure_compare;
            # our functions/pgsql secure_compare contract)
            need(2)
            return lambda env: _hmac.compare_digest(
                _as_bytes(args[0](env) or ""), _as_bytes(args[1](env) or "")
            )
        if fn == "hmac":
            need(3)

            def run(env):
                algo = _as_str(args[2](env)).lower()
                if algo not in ("sha1", "sha256"):
                    raise SqlParseError(f"hmac algo {algo!r} not supported")
                return _hmac.new(
                    _as_bytes(args[0](env)), _as_bytes(args[1](env)),
                    getattr(hashlib, algo),
                ).digest()

            return run
        if fn in ("sha256", "sha1"):
            need(1)
            h = getattr(hashlib, fn)
            return lambda env: h(_as_bytes(args[0](env))).digest()
        if fn == "encode":
            need(2)

            def run(env):
                enc = _as_str(args[1](env)).lower()
                raw = _as_bytes(args[0](env))
                if enc == "hex":
                    return raw.hex()
                if enc == "base64":
                    return base64.b64encode(raw).decode("ascii")
                raise SqlParseError(f"encode format {enc!r} not supported")

            return run
        if fn == "convert_to":
            need(2)
            return lambda env: _as_str(args[0](env)).encode("utf-8")
        if fn == "convert_from":
            need(2)
            return lambda env: _as_bytes(args[0](env)).decode("utf-8")
        raise SqlParseError(f"function {fn!r} is not in the VALIDATE grammar")

    compiled = parse_concat()
    if p.peek() is not None:
        raise SqlParseError(
            f"unexpected trailing input in VALIDATE near {p.peek().val!r}"
        )

    def validator(headers: dict, body: bytes) -> bool:
        out = compiled({"headers": headers, "data": body})
        if not isinstance(out, bool):
            raise SqlParseError("VALIDATE expression must return boolean")
        return out

    return validator


class WebhookServer:
    """POST /webhook/<database>/<schema>/<table> → validate → insert.

    Status mapping mirrors mod.rs handle_post_request: 404 unknown
    table, 401 failed signature, 422 unparseable JSON body, 200 after
    the row is durably inserted (wait_for_persistence=true)."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                try:
                    code, msg = outer._handle(self)
                except Exception as e:  # internal error
                    code, msg = 500, str(e)
                body = json.dumps({"error": msg}).encode() if code != 200 else b"{}"
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.host = host
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="webhook-server", daemon=True
        )
        self._thread.start()

    def _handle(self, req) -> tuple[int, str]:
        parts = [s for s in req.path.split("/") if s]
        if len(parts) != 4 or parts[0] != "webhook":
            return 404, f"unknown route {req.path!r}"
        _db, _schema, table = parts[1], parts[2], parts[3]
        hook = self.engine.webhooks.get(table)
        if hook is None:
            return 404, f"no webhook table {table!r}"
        n = int(req.headers.get("Content-Length", "0"))
        body = req.rfile.read(n)
        headers = {k.lower(): v for k, v in req.headers.items()}
        if not hook["validator"](headers, body):
            return 401, "Signature verification failed"
        try:
            json.loads(body)
        except Exception as e:
            return 422, f"Failed to parse body: {e}"
        # single-row fast insert through the engine's DML path (the
        # reference's fast_insert to the compute node); serialized so
        # concurrent webhooks do not interleave table commits
        with self.engine._webhook_dml_lock:
            hook["insert"](body.decode("utf-8"))
        return 200, ""

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self._thread.join(timeout=5)
