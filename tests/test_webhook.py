"""Webhook source end-to-end: HTTP POST → signature validation →
table insert → MV fold, mirroring the reference's
e2e_test/webhook/webhook_source.slt + sender.py over a real localhost
HTTP listener (reference service: `src/frontend/src/webhook/mod.rs`)."""

from __future__ import annotations

import hashlib
import hmac
import json
import tempfile
import urllib.error
import urllib.request

import pytest

from risingwave_spark.api import Engine

SECRET = "TEST_WEBHOOK"
MESSAGE = {
    "event": "order.created",
    "source": "github",
    "data": {"order_id": 1234, "amount": 99.99},
}


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_webhook_"))
    e.sql(f"CREATE SECRET test_secret WITH (backend = 'meta') AS '{SECRET}'")
    yield e
    e.stop_webhook_server()


def _post(port, table, body: bytes, headers: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/webhook/dev/public/{table}",
        data=body,
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


def _sig(algo, payload: bytes, prefix=""):
    return prefix + hmac.new(SECRET.encode(), payload, getattr(hashlib, algo)).hexdigest()


def test_webhook_github_hmac_end_to_end(eng):
    # reference create_table.slt.part github_hmac_sha1 — note the
    # trailing comma inside WITH, exactly as the slt spells it
    eng.sql(
        """create table github_hmac_sha1 (
             data JSONB
           ) WITH (
             connector = 'webhook',
           ) VALIDATE SECRET test_secret AS secure_compare(
             headers->>'x-hub-signature',
             'sha1=' || encode(hmac(test_secret, data, 'sha1'), 'hex')
           )"""
    )
    _, port = eng.start_webhook_server()
    body = json.dumps(MESSAGE).encode()
    assert _post(port, "github_hmac_sha1", body,
                 {"X-Hub-Signature": _sig("sha1", body, "sha1=")}) == 200
    rows = eng.sql("SELECT data FROM github_hmac_sha1").collect()
    assert len(rows) == 1 and json.loads(rows[0][0]) == MESSAGE

    # wrong signature → 401, no new row (mod.rs: UNAUTHORIZED)
    assert _post(port, "github_hmac_sha1", body,
                 {"X-Hub-Signature": "sha1=deadbeef"}) == 401
    assert eng.sql("SELECT count(*) AS n FROM github_hmac_sha1").first().n == 1

    # unparseable JSON after a VALID signature → 422 (mod.rs:121)
    bad = b"{not json"
    assert _post(port, "github_hmac_sha1", bad,
                 {"X-Hub-Signature": _sig("sha1", bad, "sha1=")}) == 422


def test_webhook_sha256_and_plain_auth_and_mv(eng):
    eng.sql(
        """create table github_hmac_sha256 (data JSONB) WITH (connector = 'webhook')
           VALIDATE SECRET test_secret AS secure_compare(
             headers->>'x-hub-signature-256',
             'sha256=' || encode(hmac(test_secret, data, 'sha256'), 'hex'))"""
    )
    # rudderstack form: plain authorization header match
    eng.sql(
        """create table rudderstack (data JSONB) WITH (connector = 'webhook')
           VALIDATE SECRET test_secret AS secure_compare(
             headers->>'authorization', test_secret)"""
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW hook_counts AS "
        "SELECT count(*) AS n FROM github_hmac_sha256"
    )
    _, port = eng.start_webhook_server()
    body = json.dumps(MESSAGE).encode()
    assert _post(port, "github_hmac_sha256", body,
                 {"X-Hub-Signature-256": _sig("sha256", body, "sha256=")}) == 200
    assert _post(port, "rudderstack", body, {"Authorization": SECRET}) == 200
    assert _post(port, "rudderstack", body, {"Authorization": "nope"}) == 401
    assert eng.sql("SELECT n FROM hook_counts").first().n == 1
    assert eng.sql("SELECT count(*) AS n FROM rudderstack").first().n == 1


def test_webhook_raw_string_secret_and_routes(eng):
    # validate_raw_string form: VALIDATE AS without SECRET — the secret
    # is inlined as a literal
    eng.sql(
        f"""create table validate_raw_string (data JSONB) WITH (connector = 'webhook')
            VALIDATE AS secure_compare(
              headers->>'x-hub-signature',
              'sha1=' || encode(hmac('{SECRET}', data, 'sha1'), 'hex'))"""
    )
    _, port = eng.start_webhook_server()
    body = json.dumps({"k": "v'quoted'"}).encode()
    assert _post(port, "validate_raw_string", body,
                 {"X-Hub-Signature": _sig("sha1", body, "sha1=")}) == 200
    got = json.loads(eng.sql("SELECT data FROM validate_raw_string").first()[0])
    assert got == {"k": "v'quoted'"}
    # unknown table → 404
    assert _post(port, "nope", body, {}) == 404


def test_webhook_backslash_payloads_stored_raw(eng):
    """The reference fast-insert stores RAW payload bytes
    (webhook/mod.rs:119-129). Payloads containing backslash escapes —
    \\" inside JSON strings, \\\\, \\n, even a trailing backslash —
    must round-trip byte-exact, not through SQL literal text where the
    parser would process the escapes (ADVICE r7)."""
    eng.sql(
        """create table bs_hook (data JSONB) WITH (connector = 'webhook')
           VALIDATE SECRET test_secret AS secure_compare(
             headers->>'authorization', test_secret)"""
    )
    _, port = eng.start_webhook_server()
    msg = {
        "quote": 'he said "hi"',          # \" in the wire bytes
        "path": "C:\\dir\\file",           # literal backslashes
        "text": "line1\nline2\ttabbed",    # control escapes
        "tail": "ends with backslash \\",
    }
    body = json.dumps(msg).encode()
    assert _post(port, "bs_hook", body, {"Authorization": SECRET}) == 200
    stored = eng.sql("SELECT data FROM bs_hook").first()[0]
    assert stored == body.decode(), f"payload mangled: {stored!r}"
    assert json.loads(stored) == msg


def test_webhook_ddl_errors(eng):
    # VALIDATE on a non-webhook table is a parse error (parser.rs:2605)
    with pytest.raises(Exception, match="webhook"):
        eng.sql(
            "create table t1 (data JSONB) WITH (connector = 'posix_fs') "
            "VALIDATE SECRET test_secret AS secure_compare(headers->>'a', test_secret)"
        )
    # webhook without VALIDATE is rejected
    with pytest.raises(Exception, match="VALIDATE"):
        eng.sql("create table t2 (data JSONB) WITH (connector = 'webhook')")
    # unknown secret
    with pytest.raises(Exception, match="secret"):
        eng.sql(
            "create table t3 (data JSONB) WITH (connector = 'webhook') "
            "VALIDATE SECRET nosuch AS secure_compare(headers->>'a', nosuch)"
        )
    eng.sql(
        "create table wh (data JSONB) WITH (connector = 'webhook') "
        "VALIDATE SECRET test_secret AS secure_compare(headers->>'a', test_secret)"
    )
    # reference: "Adding/dropping a column of a table with webhook has
    # not been implemented."
    with pytest.raises(Exception, match="webhook has not"):
        eng.sql("ALTER TABLE wh ADD COLUMN new_col int")


def test_webhook_survives_catalog_replay(spark):
    """The VALIDATE clause is recorded DDL: a fresh Engine over the same
    warehouse re-compiles the validator and keeps accepting posts."""
    wh = tempfile.mkdtemp(prefix="rw_webhook_replay_")
    e1 = Engine(spark, wh)
    e1.sql(f"CREATE SECRET test_secret WITH (backend = 'meta') AS '{SECRET}'")
    e1.sql(
        "create table wh (data JSONB) WITH (connector = 'webhook') "
        "VALIDATE SECRET test_secret AS secure_compare("
        "headers->>'authorization', test_secret)"
    )
    _, port = e1.start_webhook_server()
    body = json.dumps({"n": 1}).encode()
    assert _post(port, "wh", body, {"Authorization": SECRET}) == 200
    e1.stop_webhook_server()

    e2 = Engine.open(spark, wh)  # replay
    try:
        assert "wh" in e2.webhooks
        _, port2 = e2.start_webhook_server()
        body2 = json.dumps({"n": 2}).encode()
        assert _post(port2, "wh", body2, {"Authorization": SECRET}) == 200
        assert _post(port2, "wh", body2, {"Authorization": "bad"}) == 401
        n = e2.sql("SELECT count(*) AS n FROM wh").first().n
        assert n == 2
    finally:
        e2.stop_webhook_server()


def test_webhook_hubspot_v2_sha256_form(eng):
    """The hubspot v2 shape (reference create_table.slt.part
    hubspot_sha256_v2): sha256 over secret || 'POST' || url ||
    convert_from(data, 'utf8') — exercises the sha256 / convert_to /
    convert_from arms of the compiled VALIDATE evaluator."""
    import hashlib

    url = "http://127.0.0.1:4560/webhook/dev/public/hubspot_sha256_v2"
    eng.sql(
        f"""create table hubspot_sha256_v2 (data JSONB) WITH (connector = 'webhook')
            VALIDATE SECRET test_secret AS secure_compare(
              headers->>'x-hubspot-signature',
              encode(sha256(convert_to(
                (test_secret || 'POST' || '{url}' || convert_from(data, 'utf8'))
              , 'UTF8')), 'hex'))"""
    )
    _, port = eng.start_webhook_server()
    body = json.dumps({"event": "contact.created"}).encode()
    sig = hashlib.sha256(
        (SECRET + "POST" + url + body.decode()).encode()
    ).hexdigest()
    assert _post(port, "hubspot_sha256_v2", body, {"X-HubSpot-Signature": sig}) == 200
    assert _post(port, "hubspot_sha256_v2", body, {"X-HubSpot-Signature": "bad"}) == 401
    assert eng.sql("SELECT count(*) AS n FROM hubspot_sha256_v2").first().n == 1
