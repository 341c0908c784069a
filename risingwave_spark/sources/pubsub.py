"""Google Cloud Pub/Sub connector layer over the REAL REST/JSON API
(reference `/root/reference/src/connector/src/source/google_pubsub/`
source and `src/connector/src/sink/google_pubsub.rs` sink, which speak
the same service via the google-cloud SDK; option names from their
serde renames — `pubsub.subscription`, `pubsub.emulator_host`,
`pubsub.project_id`, `pubsub.topic`).

The client issues the public `pubsub.googleapis.com/v1` REST calls —
`PUT /v1/projects/P/topics/T`, `POST …/topics/T:publish`,
`PUT /v1/projects/P/subscriptions/S`, `POST …/subscriptions/S:pull`,
`POST …/subscriptions/S:acknowledge` — with base64 message data,
exactly the wire contract the Google Pub/Sub emulator serves
(`gcloud beta emulators pubsub`); point `pubsub.emulator_host` at a
real emulator and the same bytes work. Auth is the emulator posture
(no OAuth token needed); against production an Authorization: Bearer
header would ride the same requests — credential acquisition is gated
out of this container.

`LoopbackPubSubEmulator` is the in-sandbox stand-in serving that REST
surface: topics fan messages out to their subscriptions; a pull
returns UNACKED messages with ackIds; acknowledged ids stop
redelivering. (Divergence, same as the other loopback fixtures:
unacked messages redeliver on the NEXT pull rather than after the
ackDeadline timer — same messages, sooner; the at-least-once contract
is identical.)
"""

from __future__ import annotations

import base64
import http.server
import json
import socket
import socketserver
import threading
import urllib.error
import urllib.request

# module-top import: must be a by-value global for executor-side
# credentialed publishes (sink_exec registers pickle-by-value)
from risingwave_spark.sources.rsa_jwt import jwt_encode

#: OAuth scope for Pub/Sub (public constant)
_PUBSUB_SCOPE = "https://www.googleapis.com/auth/pubsub"


class PubSubClient:
    """Minimal REST client for the v1 Pub/Sub API. Without credentials:
    the emulator posture (no Authorization). With a service-account
    credentials dict (client_email, private_key n/e/d, optional
    token_uri): the production OAuth flow — an RS256 JWT assertion
    (sources/rsa_jwt.py) exchanged for a Bearer token riding every
    request, the same exchange the bigquery sink and GCS client
    speak."""

    def __init__(self, emulator_host: str, timeout: float = 10.0,
                 credentials: dict | None = None):
        host = emulator_host.split("://", 1)[-1]
        self.base = f"http://{host}/v1"
        self.timeout = timeout
        self.creds = credentials
        self._bearer: str | None = None

    def _token(self) -> str:
        if self._bearer:
            return self._bearer
        import time as _time
        import urllib.parse as _up

        key = {
            "n": int(self.creds["private_key_n"]),
            "e": int(self.creds["private_key_e"]),
            "d": int(self.creds["private_key_d"]),
        }
        token_uri = (self.creds.get("token_uri")
                     or self.base.rsplit("/v1", 1)[0] + "/token")
        now = int(_time.time())
        assertion = jwt_encode(
            {
                "iss": self.creds["client_email"],
                "scope": _PUBSUB_SCOPE,
                "aud": token_uri,
                "iat": now,
                "exp": now + 3600,
            },
            key,
            kid=self.creds.get("private_key_id"),
        )
        form = _up.urlencode({
            "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "assertion": assertion,
        }).encode()
        req = urllib.request.Request(
            token_uri, data=form,
            headers={"content-type": "application/x-www-form-urlencoded"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                self._bearer = json.loads(r.read())["access_token"]
        except urllib.error.HTTPError as e:
            raise OSError(
                f"pubsub oauth token request failed: HTTP {e.code} "
                f"{e.read().decode(errors='replace')[:200]}"
            ) from e
        return self._bearer

    def _call(self, method: str, path: str, payload: dict | None = None) -> dict:
        body = json.dumps(payload or {}).encode()
        headers = {"content-type": "application/json"}
        if self.creds is not None:
            headers["Authorization"] = f"Bearer {self._token()}"
        req = urllib.request.Request(
            f"{self.base}/{path}", data=body, method=method,
            headers=headers,
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read() or b"{}")

    # ------------------------------------------------------------- admin
    def create_topic(self, project: str, topic: str) -> dict:
        return self._call("PUT", f"projects/{project}/topics/{topic}")

    def create_subscription(self, project: str, sub: str, topic: str) -> dict:
        return self._call(
            "PUT",
            f"projects/{project}/subscriptions/{sub}",
            {"topic": f"projects/{project}/topics/{topic}", "ackDeadlineSeconds": 10},
        )

    # -------------------------------------------------------------- data
    def publish(self, project: str, topic: str, payloads: list[bytes]) -> list[str]:
        resp = self._call(
            "POST",
            f"projects/{project}/topics/{topic}:publish",
            {"messages": [
                {"data": base64.b64encode(p).decode()} for p in payloads
            ]},
        )
        return resp.get("messageIds", [])

    def pull(self, project: str, sub: str, max_messages: int) -> list[tuple[str, bytes, int]]:
        """→ [(ackId, data, messageId)] for up to max_messages UNACKED
        messages; returnImmediately gives an exact empty response at
        end-of-backlog (no long-poll hang)."""
        resp = self._call(
            "POST",
            f"projects/{project}/subscriptions/{sub}:pull",
            {"maxMessages": max_messages, "returnImmediately": True},
        )
        out = []
        for rm in resp.get("receivedMessages", []):
            m = rm["message"]
            out.append(
                (rm["ackId"], base64.b64decode(m.get("data", "")), int(m["messageId"]))
            )
        return out

    def acknowledge(self, project: str, sub: str, ack_ids: list[str]) -> None:
        if ack_ids:
            self._call(
                "POST",
                f"projects/{project}/subscriptions/{sub}:acknowledge",
                {"ackIds": ack_ids},
            )


def parse_subscription_path(path: str) -> tuple[str, str]:
    """'projects/P/subscriptions/S' → (P, S)."""
    parts = path.strip("/").split("/")
    if len(parts) != 4 or parts[0] != "projects" or parts[2] != "subscriptions":
        raise ValueError(
            f"pubsub.subscription must be projects/<p>/subscriptions/<s>, got {path!r}"
        )
    return parts[1], parts[3]


class LoopbackPubSubEmulator:
    """Default: the emulator contract (no auth — what the gcloud
    emulator serves). With (client_email, public_key): production's
    posture — /token VERIFIES the RS256 assertion and /v1 requests
    demand the issued Bearer token."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 client_email: str | None = None,
                 public_key: dict | None = None):
        self._lock = threading.Lock()
        # "projects/P/topics/T" -> [sub_path, ...]
        self.topics: dict[str, list[str]] = {}
        # sub_path -> {"msgs": {mid: data}, "acked": set[mid]}
        self.subs: dict[str, dict] = {}
        self._next_mid = 1
        self.client_email = client_email
        self.public_key = (
            {"n": int(public_key["n"]), "e": int(public_key["e"])}
            if public_key else None)
        self.tokens: set[str] = set()
        emu = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _body(self) -> dict:
                n = int(self.headers.get("content-length") or 0)
                raw = self.rfile.read(n) if n else b""
                return json.loads(raw or b"{}")

            def _raw_body(self) -> bytes:
                n = int(self.headers.get("content-length") or 0)
                return self.rfile.read(n) if n else b""

            def _reply(self, code: int, payload: dict) -> None:
                out = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def _authed(self) -> bool:
                if emu.client_email is None:
                    return True  # emulator posture
                auth = self.headers.get("Authorization", "")
                if auth.startswith("Bearer ") and auth[7:] in emu.tokens:
                    return True
                self._reply(401, {"error": {
                    "code": 401, "message": "missing/invalid bearer"}})
                return False

            def _serve_token(self) -> None:
                import secrets as _secrets
                import urllib.parse as _up

                from risingwave_spark.sources.rsa_jwt import (
                    jwt_decode_verify,
                )

                form = dict(_up.parse_qsl(self._raw_body().decode()))
                if form.get("grant_type") != (
                        "urn:ietf:params:oauth:grant-type:jwt-bearer"):
                    return self._reply(400, {"error": "bad grant_type"})
                try:
                    claims = jwt_decode_verify(
                        form.get("assertion", ""), emu.public_key)
                except ValueError as e:
                    return self._reply(
                        401, {"error": f"invalid_grant: {e}"})
                if claims.get("iss") != emu.client_email:
                    return self._reply(401, {"error": "unknown issuer"})
                if _PUBSUB_SCOPE not in (claims.get("scope") or ""):
                    return self._reply(
                        401, {"error": "missing pubsub scope"})
                tok = _secrets.token_urlsafe(16)
                emu.tokens.add(tok)
                self._reply(200, {"access_token": tok,
                                  "token_type": "Bearer",
                                  "expires_in": 3600})

            def do_PUT(self):
                if not self._authed():
                    return
                path = self.path.removeprefix("/v1/").strip("/")
                body = self._body()
                code, resp = emu._admin(path, body)
                self._reply(code, resp)

            def do_POST(self):
                if self.path == "/token" and emu.client_email:
                    return self._serve_token()
                if not self._authed():
                    return
                path = self.path.removeprefix("/v1/")
                if ":" not in path:
                    self._reply(404, {"error": {"message": f"unknown {path}"}})
                    return
                resource, verb = path.rsplit(":", 1)
                code, resp = emu._data(resource.strip("/"), verb, self._body())
                self._reply(code, resp)

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

    def start(self) -> "LoopbackPubSubEmulator":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # ------------------------------------------------------------ routes
    def _admin(self, path: str, body: dict) -> tuple[int, dict]:
        parts = path.split("/")
        with self._lock:
            if len(parts) == 4 and parts[2] == "topics":
                self.topics.setdefault(path, [])
                return 200, {"name": path}
            if len(parts) == 4 and parts[2] == "subscriptions":
                topic = body.get("topic", "")
                if topic not in self.topics:
                    return 404, {"error": {"message": f"topic {topic!r} not found"}}
                if path not in self.subs:
                    self.subs[path] = {"msgs": {}, "acked": set()}
                    self.topics[topic].append(path)
                return 200, {"name": path, "topic": topic}
        return 404, {"error": {"message": f"unknown resource {path}"}}

    def _data(self, resource: str, verb: str, body: dict) -> tuple[int, dict]:
        with self._lock:
            if verb == "publish":
                if resource not in self.topics:
                    return 404, {"error": {"message": f"topic {resource!r} not found"}}
                ids = []
                for m in body.get("messages", []):
                    mid = self._next_mid
                    self._next_mid += 1
                    data = m.get("data", "")
                    for sub in self.topics[resource]:
                        self.subs[sub]["msgs"][mid] = data
                    ids.append(str(mid))
                return 200, {"messageIds": ids}
            if resource not in self.subs:
                return 404, {"error": {"message": f"subscription {resource!r} not found"}}
            s = self.subs[resource]
            if verb == "pull":
                n = int(body.get("maxMessages", 1))
                out = [
                    {
                        "ackId": f"ack-{mid}",
                        "message": {
                            "data": data,
                            "messageId": str(mid),
                            "publishTime": "1970-01-01T00:00:00Z",
                        },
                    }
                    for mid, data in sorted(s["msgs"].items())
                    if mid not in s["acked"]
                ][:n]
                # an empty pull answers {} (the emulator omits the key)
                return 200, ({"receivedMessages": out} if out else {})
            if verb == "acknowledge":
                for aid in body.get("ackIds", []):
                    s["acked"].add(int(aid.removeprefix("ack-")))
                return 200, {}
        return 404, {"error": {"message": f"unknown verb {verb}"}}
