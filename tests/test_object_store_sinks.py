"""Object-store FILE SINKS over their real REST APIs (reference
`sink/file_sink/{s3,gcs,azblob}.rs`): connector='s3'/'gcs'/'azblob'
with an endpoint stage JSON-lines objects per chunk; without an
endpoint they keep the local-path posture. The s3 path shares the
snowflake sink implementation (s3.rs:164-200 — snowflake IS the s3
file sink), covered by sink_snowflake_roundtrip."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.cloud_store import (
    AzblobClient,
    GcsClient,
    LoopbackAzblob,
    LoopbackGcs,
)
from risingwave_spark.sources.s3_store import LoopbackS3, S3Client


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_osink_t_"))
    e.sql("CREATE TABLE ot (id int8 PRIMARY KEY, v int8)")
    e.sql("CREATE MATERIALIZED VIEW o_mv AS SELECT id, v + 1 AS v1 FROM ot")
    e.sql("INSERT INTO ot VALUES (1, 5)")
    return e


def _rows(blobs: list[bytes]) -> list[tuple]:
    out = []
    for b in blobs:
        for line in b.decode().splitlines():
            d = json.loads(line)
            out.append((d["id"], d["v1"]))
    return sorted(out)


def test_s3_file_sink_real_put(eng):
    s3 = LoopbackS3().start()
    try:
        eng.sql(
            f"CREATE SINK os3 FROM o_mv WITH (connector='s3', "
            f"s3.bucket_name='b1', s3.path='out', "
            f"s3.credentials.access='test', s3.credentials.secret='test', "
            f"s3.endpoint_url='http://{s3.host}:{s3.port}', "
            f"force_append_only='true') FORMAT PLAIN ENCODE JSON")
        eng.sql("INSERT INTO ot VALUES (2, 7)")
        c = S3Client(f"http://{s3.host}:{s3.port}")
        blobs = [c.get_object("b1", k)
                 for k, _ in c.list_objects("b1", "out/")]
        assert _rows(blobs) == [(1, 6), (2, 8)]
    finally:
        s3.stop()


def test_gcs_and_azblob_file_sinks(eng):
    gcs = LoopbackGcs().start()
    az = LoopbackAzblob().start()
    try:
        eng.sql(
            f"CREATE SINK ogcs FROM o_mv WITH (connector='gcs', "
            f"gcs.bucket_name='b2', gcs.path='out', "
            f"gcs.endpoint_url='http://{gcs.host}:{gcs.port}', "
            f"force_append_only='true') FORMAT PLAIN ENCODE JSON")
        eng.sql(
            f"CREATE SINK oaz FROM o_mv WITH (connector='azblob', "
            f"azblob.container_name='c1', azblob.path='out', "
            f"azblob.endpoint_url='http://{az.host}:{az.port}', "
            f"azblob.credentials.account_name='{az.account}', "
            f"azblob.credentials.account_key='{az.key}', "
            f"force_append_only='true') FORMAT PLAIN ENCODE JSON")
        eng.sql("INSERT INTO ot VALUES (3, 9)")
        gc = GcsClient(f"http://{gcs.host}:{gcs.port}")
        got = _rows([gc.get_object("b2", k)
                     for k, _ in gc.list_objects("b2", "out/")])
        assert got == [(1, 6), (3, 10)]
        ac = AzblobClient(f"http://{az.host}:{az.port}", az.account, az.key)
        got = _rows([ac.get_blob("c1", k)
                     for k, _ in ac.list_blobs("c1", "out/")])
        assert got == [(1, 6), (3, 10)]
        # non-plain formats reject (append-only staged files)
        with pytest.raises(ValueError, match="PLAIN only"):
            eng.sql(
                f"CREATE SINK obad FROM o_mv WITH (connector='gcs', "
                f"gcs.bucket_name='b2', "
                f"gcs.endpoint_url='http://{gcs.host}:{gcs.port}') "
                f"FORMAT UPSERT ENCODE JSON")
    finally:
        gcs.stop()
        az.stop()


def test_local_path_posture_without_endpoint(eng, spark):
    # connector='s3' WITHOUT an endpoint keeps the local file-sink
    # behavior (parquet chunks under path) — backwards compatible
    import os

    path = os.path.join(tempfile.mkdtemp(prefix="rw_oslocal_"), "out")
    eng.sql(
        f"CREATE SINK oloc FROM o_mv WITH (connector='s3', "
        f"path='{path}') FORMAT PLAIN ENCODE JSON")
    eng.sql("INSERT INTO ot VALUES (4, 11)")
    df = spark.read.option("recursiveFileLookup", "true").parquet(path)
    assert df.filter("id = 4").count() == 1


def test_webhdfs_file_sink_two_step_create(eng):
    """WebHDFS (reference sink/file_sink/webhdfs.rs): the spec's
    namenode-307-then-datanode-PUT dance, played by both roles of the
    loopback — a direct PUT without the redirect is rejected."""
    import urllib.error
    import urllib.request

    from risingwave_spark.sources.webhdfs_store import (
        LoopbackWebHdfs,
        WebHdfsClient,
    )

    srv = LoopbackWebHdfs().start()
    try:
        eng.sql(
            f"CREATE SINK whs FROM o_mv WITH (connector='webhdfs', "
            f"webhdfs.endpoint='{srv.endpoint}', webhdfs.path='/rw/out', "
            f"force_append_only='true') FORMAT PLAIN ENCODE JSON")
        eng.sql("INSERT INTO ot VALUES (5, 13)")
        c = WebHdfsClient(srv.endpoint)
        files = c.list_status("/rw/out")
        rows = _rows([c.open("/rw/out/" + f["pathSuffix"]) for f in files])
        assert rows == [(1, 6), (5, 14)]
        # op=OPEN on a missing file 404s
        with pytest.raises(urllib.error.HTTPError):
            c.open("/rw/out/ghost.json")
    finally:
        srv.stop()
