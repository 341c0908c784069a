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
