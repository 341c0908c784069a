"""Cloud-auth sink families (the last gated sinks in COVERAGE.md):
BigQuery (REST insertAll + REAL OAuth2 RS256 service-account flow),
Snowflake (S3-staged JSON files, the reference's own posture —
`sink/file_sink/s3.rs` SnowflakeSink), SQL Server (real MS-TDS wire,
`sink/sqlserver.rs`), plus the pure-stdlib RSA/JWT primitive they
authenticate with (sources/rsa_jwt.py)."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.bigquery import (
    BigQueryClient,
    LoopbackBigQuery,
    make_service_account,
)
from risingwave_spark.sources.rsa_jwt import (
    generate_keypair,
    jwt_decode_verify,
    jwt_encode,
    rs256_sign,
    rs256_verify,
)
from risingwave_spark.sources.tdswire import (
    LoopbackSqlServer,
    TdsClient,
    scramble_password,
    unscramble_password,
)


# ------------------------------------------------------------- rsa / jwt
def test_rsa_sign_verify_and_tamper():
    key = generate_keypair()
    sig = rs256_sign(key, b"payload")
    assert rs256_verify(key, b"payload", sig)
    assert not rs256_verify(key, b"payloaX", sig)
    assert not rs256_verify(key, b"payload", sig[:-1] + b"\x00")
    other = generate_keypair()
    assert not rs256_verify(other, b"payload", sig)


def test_jwt_roundtrip_and_forgery():
    key = generate_keypair()
    tok = jwt_encode({"iss": "a@b", "exp": 1}, key, kid="k1")
    assert jwt_decode_verify(tok, key) == {"iss": "a@b", "exp": 1}
    with pytest.raises(ValueError, match="signature"):
        jwt_decode_verify(tok[:-6] + "AAAAAA", key)
    with pytest.raises(ValueError, match="malformed"):
        jwt_decode_verify("not.a", key)


# ------------------------------------------------------------- sqlserver
def test_tds_password_obfuscation_roundtrip():
    # the spec's transform is an involution pair
    for pw in ("fedpw", "", "päss wörd", "a" * 40):
        assert unscramble_password(scramble_password(pw)) == pw


def test_tds_query_types_and_errors():
    srv = LoopbackSqlServer().start()
    try:
        srv.seed(
            "CREATE TABLE t (a BIGINT, b VARCHAR, c DOUBLE, d BOOLEAN);"
            "INSERT INTO t VALUES (1, 'x', 1.5, true), (2, NULL, NULL, NULL)"
        )
        c = TdsClient("127.0.0.1", srv.port, "sa", "fedpw", "fedb")
        cols, rows = c.query("SELECT a, b, c, d FROM t ORDER BY a")
        assert cols == ["a", "b", "c", "d"]
        assert rows == [[1, "x", 1.5, True], [2, None, None, None]]
        with pytest.raises(OSError, match="sqlserver error"):
            c.query("SELECT definitely_broken FROM nowhere")
        c.close()
        with pytest.raises(OSError, match="Login failed"):
            TdsClient("127.0.0.1", srv.port, "sa", "WRONG", "fedb")
    finally:
        srv.stop()


def test_tds_multi_packet_message():
    # a SQLBatch whose UCS-2 payload exceeds the 4096-byte negotiated
    # packet size (and the 64 KiB >H single-packet ceiling) must split
    # into multiple packets with EOM only on the last (MS-TDS 2.2.3.1.3)
    srv = LoopbackSqlServer().start()
    try:
        srv.seed("CREATE TABLE big (a BIGINT, s VARCHAR)")
        c = TdsClient("127.0.0.1", srv.port, "sa", "fedpw", "fedb")
        # ~200 KB of T-SQL in one batch: 1000 INSERTs with 90-char strings
        stmts = "; ".join(
            f"INSERT INTO big VALUES ({i}, '{'x' * 90}')"
            for i in range(1000)
        )
        assert len(stmts.encode("utf-16-le")) > 65527
        c.query(stmts)
        _cols, rows = c.query("SELECT count(*) AS n, min(a) AS lo, "
                              "max(a) AS hi FROM big")
        assert rows == [[1000, 0, 999]]
        c.close()
    finally:
        srv.stop()


def test_sqlserver_sink_upsert_roundtrip(spark):
    srv = LoopbackSqlServer().start()
    try:
        srv.seed("CREATE TABLE outt (id BIGINT, v2 BIGINT)")
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_mss_t_"))
        eng.sql("CREATE TABLE mst (id int8 PRIMARY KEY, v int8)")
        eng.sql(
            "CREATE MATERIALIZED VIEW ms_mv AS SELECT id, v * 2 AS v2 "
            "FROM mst"
        )
        eng.sql("INSERT INTO mst VALUES (1, 5)")  # bootstrap content
        eng.sql(
            f"CREATE SINK mss FROM ms_mv WITH (connector='sqlserver', "
            f"sqlserver.host='127.0.0.1', sqlserver.port='{srv.port}', "
            f"sqlserver.user='sa', sqlserver.password='fedpw', "
            f"sqlserver.database='fedb', sqlserver.table='outt', "
            f"primary_key='id') FORMAT UPSERT ENCODE JSON"
        )
        eng.sql("INSERT INTO mst VALUES (2, 7)")
        eng.sql("UPDATE mst SET v = 6 WHERE id = 1")
        eng.sql("DELETE FROM mst WHERE id = 2")
        assert sorted(srv.rows("outt")) == [(1, 12)]
        # missing table / bad login reject at CREATE
        with pytest.raises(Exception, match="lacks the table|unreachable"):
            eng.sql(
                f"CREATE SINK mss2 FROM ms_mv WITH (connector='sqlserver', "
                f"sqlserver.host='127.0.0.1', sqlserver.port='{srv.port}', "
                f"sqlserver.user='sa', sqlserver.password='fedpw', "
                f"sqlserver.database='fedb', sqlserver.table='ghost', "
                f"primary_key='id') FORMAT UPSERT ENCODE JSON"
            )
    finally:
        srv.stop()


# -------------------------------------------------------------- bigquery
def test_bigquery_oauth_rejects_forged_key():
    sa = make_service_account("proj")
    srv = LoopbackBigQuery(
        sa["client_email"],
        {"n": sa["private_key_n"], "e": sa["private_key_e"]},
    ).start()
    try:
        sa["token_uri"] = srv.token_uri
        good = BigQueryClient(sa, srv.endpoint)
        good.create_table("proj", "ds", "t")
        bad = dict(sa)
        bad["private_key_d"] = 123457  # wrong private exponent
        with pytest.raises(OSError, match="401"):
            BigQueryClient(bad, srv.endpoint)._token()
        stranger = make_service_account("proj", email="evil@proj.iam")
        stranger["token_uri"] = srv.token_uri
        with pytest.raises(OSError, match="401"):
            BigQueryClient(stranger, srv.endpoint)._token()
    finally:
        srv.stop()


def test_bigquery_insert_id_dedup():
    sa = make_service_account("proj")
    srv = LoopbackBigQuery(
        sa["client_email"],
        {"n": sa["private_key_n"], "e": sa["private_key_e"]},
    ).start()
    try:
        sa["token_uri"] = srv.token_uri
        c = BigQueryClient(sa, srv.endpoint)
        c.create_table("proj", "ds", "t")
        c.insert_all("proj", "ds", "t", [("a", {"x": 1}), ("b", {"x": 2})])
        c.insert_all("proj", "ds", "t", [("b", {"x": 2}), ("c", {"x": 3})])
        rows = c.query("proj", "SELECT x FROM ds.t ORDER BY x")
        assert [r[0] for r in rows] == ["1", "2", "3"]  # 'b' deduped
    finally:
        srv.stop()


def test_bigquery_sink_upsert_gated(spark):
    sa = make_service_account("proj")
    srv = LoopbackBigQuery(
        sa["client_email"],
        {"n": sa["private_key_n"], "e": sa["private_key_e"]},
    ).start()
    try:
        sa["token_uri"] = srv.token_uri
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_bq_t_"))
        eng.sql("CREATE TABLE bt (id int8 PRIMARY KEY, v int8)")
        eng.sql("CREATE MATERIALIZED VIEW bt_mv AS SELECT id, v FROM bt")
        creds = json.dumps(sa).replace("'", "''")
        with pytest.raises(NotImplementedError, match="Storage Write"):
            eng.sql(
                f"CREATE SINK b1 FROM bt_mv WITH (connector='bigquery', "
                f"bigquery.project='proj', bigquery.dataset='ds', "
                f"bigquery.table='t', bigquery.endpoint='{srv.endpoint}', "
                f"bigquery.credentials='{creds}') FORMAT UPSERT ENCODE JSON"
            )
    finally:
        srv.stop()


# ------------------------------------------------------------- snowflake
def test_snowflake_sink_stages_json(spark):
    from risingwave_spark.sources.s3_store import LoopbackS3, S3Client

    s3 = LoopbackS3().start()
    try:
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_sf_t_"))
        eng.sql("CREATE TABLE sft (id int8 PRIMARY KEY, v int8)")
        eng.sql(
            "CREATE MATERIALIZED VIEW sf_mv AS SELECT id, v + 1 AS v1 "
            "FROM sft"
        )
        eng.sql("INSERT INTO sft VALUES (1, 5)")
        eng.sql(
            f"CREATE SINK sfs FROM sf_mv WITH (connector='snowflake', "
            f"snowflake.s3_bucket='stage', snowflake.s3_path='rw/out', "
            f"snowflake.aws_access_key_id='test', "
            f"snowflake.aws_secret_access_key='test', "
            f"s3.endpoint_url='http://{s3.host}:{s3.port}', "
            f"force_append_only='true') FORMAT PLAIN ENCODE JSON"
        )
        eng.sql("INSERT INTO sft VALUES (2, 7)")
        c = S3Client(f"http://{s3.host}:{s3.port}")
        objs = c.list_objects("stage", prefix="rw/out/")
        assert len(objs) == 2  # bootstrap object + one chunk object
        rows = []
        for key, _n in objs:
            # opendal_sink.rs naming: {executor_id}_{epoch}.json
            assert key.split("/")[-1].count("_") == 1
            assert key.endswith(".json")
            for line in c.get_object("stage", key).decode().splitlines():
                rows.append(json.loads(line))
        assert sorted((r["id"], r["v1"]) for r in rows) == [(1, 6), (2, 8)]
        # non-plain formats reject at CREATE (plain JSON only —
        # opendal_sink.rs plain_json_for_snowflake_only)
        with pytest.raises(ValueError, match="PLAIN only"):
            eng.sql(
                f"CREATE SINK sfbad FROM sf_mv WITH (connector='snowflake', "
                f"snowflake.s3_bucket='stage', "
                f"s3.endpoint_url='http://{s3.host}:{s3.port}') "
                f"FORMAT UPSERT ENCODE JSON"
            )
        # a retracting MV without force_append_only rejects at CREATE
        with pytest.raises(Exception, match="append"):
            eng.sql(
                f"CREATE SINK sfbad2 FROM sf_mv WITH (connector='snowflake', "
                f"snowflake.s3_bucket='stage', "
                f"s3.endpoint_url='http://{s3.host}:{s3.port}') "
                f"FORMAT PLAIN ENCODE JSON"
            )
    finally:
        s3.stop()
