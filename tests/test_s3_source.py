"""S3 file source over the real REST API: the loopback store
(sources/s3_store.py) verifies genuine SigV4 signatures on every
ListObjectsV2/GetObject/PutObject — reference
`src/connector/src/source/filesystem/s3/` (S3PropertiesCommon option
names)."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.s3_store import LoopbackS3, S3Client


@pytest.fixture()
def s3():
    s = LoopbackS3().start()
    yield s
    s.stop()


def test_s3_rest_sigv4_and_objects(s3):
    import urllib.error

    c = S3Client(f"http://{s3.host}:{s3.port}")
    c.put_object("b", "d/x.json", b'{"a":1}\n')
    c.put_object("b", "d/y.json", b'{"a":2}\n')
    c.put_object("b", "e/z.json", b'{"a":3}\n')
    assert c.list_objects("b", "d/") == [("d/x.json", 8), ("d/y.json", 8)]
    assert c.get_object("b", "e/z.json") == b'{"a":3}\n'
    with pytest.raises(urllib.error.HTTPError) as e:
        c.get_object("b", "ghost")
    assert e.value.code == 404
    bad = S3Client(f"http://{s3.host}:{s3.port}", secret_key="wrong")
    with pytest.raises(urllib.error.HTTPError) as e:
        bad.list_objects("b")
    assert e.value.code == 403


def test_s3_create_source_json_with_match_pattern(spark, s3):
    c = S3Client(f"http://{s3.host}:{s3.port}")
    for i in range(3):
        c.put_object(
            "lake", f"events/part-{i}.json",
            "".join(
                f'{{"id": {j}, "v": {j * 10}}}\n' for j in range(i * 4, i * 4 + 4)
            ).encode(),
        )
    c.put_object("lake", "events/readme.txt", b"not data")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_s3src_"))
    eng.sql(
        f"""CREATE SOURCE s3ev WITH (
            connector = 's3', s3.bucket_name = 'lake',
            s3.region_name = 'us-east-1',
            s3.credentials.access = 'test', s3.credentials.secret = 'test',
            s3.endpoint_url = 'http://{s3.host}:{s3.port}',
            match_pattern = 'events/*.json', format = 'json'
        )"""
    )
    row = eng.sql("SELECT count(*) AS n, sum(v) AS sv FROM s3ev").first()
    assert (row.n, row.sv) == (12, sum(j * 10 for j in range(12)))
    with pytest.raises(ValueError, match="no objects"):
        eng.sql(
            f"""CREATE SOURCE s3miss WITH (
                connector = 's3', s3.bucket_name = 'lake',
                s3.endpoint_url = 'http://{s3.host}:{s3.port}',
                match_pattern = 'nothing/*', format = 'json'
            )"""
        )
    with pytest.raises(ValueError, match="bucket_name"):
        eng.sql(
            f"""CREATE SOURCE s3nb WITH (
                connector = 's3',
                s3.endpoint_url = 'http://{s3.host}:{s3.port}'
            )"""
        )


def test_gcs_create_source(spark):
    """GCS file source over the public JSON API (emulator posture —
    the same REST surface fake-gcs-server serves)."""
    from risingwave_spark.sources.cloud_store import GcsClient, LoopbackGcs

    g = LoopbackGcs().start()
    try:
        c = GcsClient(f"http://{g.host}:{g.port}")
        for i in range(2):
            c.put_object(
                "lake", f"ev/p{i}.json",
                "".join(f'{{"id": {j}}}\n' for j in range(i * 3, i * 3 + 3)).encode(),
            )
        c.put_object("lake", "ev/skip.csv", b"id\n99\n")
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_gcs_"))
        eng.sql(
            f"""CREATE SOURCE gev WITH (
                connector = 'gcs', gcs.bucket_name = 'lake',
                gcs.endpoint_url = 'http://{g.host}:{g.port}',
                match_pattern = 'ev/*.json', format = 'json'
            )"""
        )
        assert eng.sql("SELECT count(*) AS n FROM gev").first().n == 6
    finally:
        g.stop()


def test_gcs_oauth_rs256_verified(spark):
    """gcs.credential: the REAL OAuth exchange — the loopback VERIFIES
    the RS256 assertion signature and demands the issued Bearer on
    storage requests; a forged key is rejected on the wire."""
    import json as _json

    from risingwave_spark.sources.cloud_store import GcsClient, LoopbackGcs
    from risingwave_spark.sources.rsa_jwt import generate_keypair

    key = generate_keypair()
    g = LoopbackGcs(client_email="svc@rw.test", public_key=key).start()
    try:
        creds = {
            "client_email": "svc@rw.test",
            "private_key_n": str(key["n"]),
            "private_key_e": str(key["e"]),
            "private_key_d": str(key["d"]),
        }
        c = GcsClient(f"http://{g.host}:{g.port}", credentials=creds)
        c.put_object("lake", "auth/p0.json", b'{"id": 1}\n{"id": 2}\n')
        # unauthenticated access is rejected by the verifying loopback
        bare = GcsClient(f"http://{g.host}:{g.port}")
        with pytest.raises(Exception, match="401"):
            bare.list_objects("lake")
        # a forged private key fails the token exchange
        forged = dict(creds)
        forged["private_key_d"] = str(generate_keypair()["d"])
        with pytest.raises(OSError, match="401|invalid"):
            GcsClient(f"http://{g.host}:{g.port}",
                      credentials=forged).list_objects("lake")
        # the credentialed SOURCE path reads through OAuth end-to-end
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_gcso_"))
        eng.sql(
            f"""CREATE SOURCE gsec WITH (
                connector = 'gcs', gcs.bucket_name = 'lake',
                gcs.endpoint_url = 'http://{g.host}:{g.port}',
                gcs.credential = '{_json.dumps(creds)}',
                match_pattern = 'auth/*.json', format = 'json'
            )"""
        )
        assert eng.sql("SELECT count(*) AS n FROM gsec").first().n == 2
        # the credentialed SINK stages objects under the same token
        eng.sql("CREATE TABLE gt (a int8 PRIMARY KEY)")
        eng.sql("CREATE MATERIALIZED VIEW gmv AS SELECT a FROM gt")
        eng.sql(
            f"""CREATE SINK gsink FROM gmv WITH (
                connector = 'gcs', gcs.bucket_name = 'lake',
                gcs.path = 'out',
                gcs.endpoint_url = 'http://{g.host}:{g.port}',
                gcs.credential = '{_json.dumps(creds)}',
                force_append_only = 'true'
            ) FORMAT PLAIN ENCODE JSON"""
        )
        eng.sql("INSERT INTO gt VALUES (7), (8)")
        staged = [k for k, _sz in c.list_objects("lake", "out/")]
        assert staged, "sink staged no objects"
    finally:
        g.stop()


def test_azblob_create_source_sharedkey(spark):
    """Azblob file source over the Blob REST API with GENUINE
    SharedKey signing — the loopback verifies each signature."""
    import urllib.error

    from risingwave_spark.sources.cloud_store import AzblobClient, LoopbackAzblob

    a = LoopbackAzblob().start()
    try:
        c = AzblobClient(f"http://{a.host}:{a.port}", a.account, a.key)
        c.put_blob("cont", "d/p0.json", b'{"id": 1}\n{"id": 2}\n')
        c.put_blob("cont", "d/p1.json", b'{"id": 3}\n')
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_az_"))
        eng.sql(
            f"""CREATE SOURCE aev WITH (
                connector = 'azblob', azblob.container_name = 'cont',
                azblob.credentials.account_name = '{a.account}',
                azblob.credentials.account_key = '{a.key}',
                azblob.endpoint_url = 'http://{a.host}:{a.port}',
                match_pattern = 'd/*.json', format = 'json'
            )"""
        )
        assert eng.sql("SELECT sum(id) AS s FROM aev").first().s == 6
        # wrong key → the service rejects the signature
        bad = AzblobClient(
            f"http://{a.host}:{a.port}", a.account, "d3Jvbmca"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            bad.list_blobs("cont")
        assert e.value.code == 403
        with pytest.raises(Exception, match="account_name/account_key"):
            eng.sql(
                f"""CREATE SOURCE abad WITH (
                    connector = 'azblob', azblob.container_name = 'cont',
                    azblob.endpoint_url = 'http://{a.host}:{a.port}'
                )"""
            )
    finally:
        a.stop()
