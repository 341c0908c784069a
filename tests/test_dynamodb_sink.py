"""DynamoDB sink over the real AWS JSON 1.0 API: the loopback
(sources/dynamodb_store.py) verifies SigV4 on every action —
reference `src/connector/src/sink/dynamodb.rs`."""

from __future__ import annotations

import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.dynamodb_store import DynamoClient, LoopbackDynamo


def test_dynamodb_sink_upsert_end_to_end(spark):
    d = LoopbackDynamo().start()
    ep = f"http://{d.host}:{d.port}"
    try:
        c = DynamoClient(ep)
        c.create_table("tgt", ["id"])
        eng = Engine(spark, tempfile.mkdtemp(prefix="rw_dyn_"))
        eng.sql("CREATE TABLE t (id int8 PRIMARY KEY, v int8)")
        eng.sql("CREATE MATERIALIZED VIEW dmv AS SELECT id, v * 2 AS v2 FROM t")
        with pytest.raises(Exception, match="table and endpoint"):
            eng.sql(
                f"CREATE SINK bad FROM dmv WITH (connector='dynamodb', "
                f"endpoint='{ep}') FORMAT UPSERT ENCODE JSON"
            )
        with pytest.raises(ValueError, match="create it first"):
            eng.sql(
                f"CREATE SINK bad2 FROM dmv WITH (connector='dynamodb', "
                f"table='ghost', endpoint='{ep}') FORMAT UPSERT ENCODE JSON"
            )
        eng.sql(
            f"CREATE SINK ok FROM dmv WITH (connector='dynamodb', "
            f"table='tgt', endpoint='{ep}') FORMAT UPSERT ENCODE JSON"
        )
        eng.sql("INSERT INTO t VALUES (1, 5), (2, 7), (3, 9)")
        eng.sql("UPDATE t SET v = 8 WHERE id = 2")
        eng.sql("DELETE FROM t WHERE id = 3")
        assert c.scan("tgt") == [
            {"id": 1, "v2": 10}, {"id": 2, "v2": 16},
        ]
    finally:
        d.stop()
