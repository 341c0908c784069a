"""CREATE CONNECTION — named, reusable connector configuration
(reference ``handler/create_connection.rs:89``,
``handler/drop_connection.rs``, dependency counting in the meta store;
scenarios shaped on ``e2e_test/source_inline/connection/ddl.slt``)."""

from __future__ import annotations

import json
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.kafka_broker import LoopbackKafkaBroker
from risingwave_spark.sources.kafka_wire import KafkaWireClient

NOW = 1700000000000


@pytest.fixture()
def broker():
    b = LoopbackKafkaBroker().start()
    yield b
    b.stop()


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="rw_conn_"))
    yield e
    e.stop_pg_server()


def _seed(broker, topic, rows):
    c = KafkaWireClient(broker.host, broker.port)
    try:
        c.produce(topic, 0, [
            (None, json.dumps(r).encode(), NOW) for r in rows])
    finally:
        c.close()


def test_connection_ddl_validation(eng, broker):
    eng.sql("CREATE SECRET sec_b WITH (backend = 'meta') AS "
            f"'{broker.host}:{broker.port}'")
    with pytest.raises(ValueError, match="unknown field `foo`"):
        eng.sql("CREATE CONNECTION conn WITH (type = 'kafka',"
                " properties.bootstrap.server = secret sec_b, foo = 'bar')")
    with pytest.raises(ValueError,
                       match='Connection type "kinesis" is not supported'):
        eng.sql("CREATE CONNECTION conn WITH (type = 'kinesis')")
    with pytest.raises(ValueError, match="unknown secret"):
        eng.sql("CREATE CONNECTION conn WITH (type = 'kafka',"
                " properties.bootstrap.server = secret ghost)")
    eng.sql("CREATE CONNECTION conn WITH (type = 'kafka',"
            " properties.bootstrap.server = secret sec_b)")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE CONNECTION conn WITH (type = 'kafka')")
    eng.sql("CREATE CONNECTION IF NOT EXISTS conn WITH (type = 'kafka')")
    rows = eng.sql(
        "SELECT name, type_ FROM rw_catalog.rw_connections").collect()
    assert [(r[0], r[1]) for r in rows] == [("conn", "CONNECTION_TYPE_KAFKA")]
    # the connection pins its secret
    with pytest.raises(PermissionError, match="secret used by 1"):
        eng.sql("DROP SECRET sec_b")
    eng.sql("DROP CONNECTION conn")
    eng.sql("DROP SECRET sec_b")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("DROP CONNECTION conn")
    eng.sql("DROP CONNECTION IF EXISTS conn")


def test_connection_source_and_sink_share(eng, broker):
    """One connection rides a TABLE (ingest) AND a SINK (egress) —
    the ddl.slt round trip."""
    _seed(broker, "conn_in", [{"a": i, "b": f"x{i}"} for i in range(3)])
    eng.sql("CREATE SECRET sec_b WITH (backend = 'meta') AS "
            f"'{broker.host}:{broker.port}'")
    eng.sql("CREATE CONNECTION conn WITH (type = 'kafka',"
            " properties.bootstrap.server = secret sec_b,"
            " properties.security.protocol = 'plaintext')")
    with pytest.raises(ValueError, match="Duplicated key"):
        eng.sql("CREATE TABLE t1 (a INT PRIMARY KEY, b VARCHAR) WITH ("
                " connector = 'kafka', connection = conn,"
                " topic = 'conn_in',"
                " properties.security.protocol = 'plaintext')"
                " FORMAT PLAIN ENCODE JSON")
    with pytest.raises(ValueError, match="not compatible"):
        eng.sql("CREATE TABLE t1 (a INT PRIMARY KEY, b VARCHAR) WITH ("
                " connector = 'kinesis', connection = conn,"
                " stream = 's', region = 'us-east-1')"
                " FORMAT PLAIN ENCODE JSON")
    eng.sql("CREATE TABLE t1 (a INT PRIMARY KEY, b VARCHAR) WITH ("
            " connector = 'kafka', connection = conn, topic = 'conn_in')"
            " FORMAT PLAIN ENCODE JSON")
    eng.sql("FLUSH")
    got = sorted((r.a, r.b) for r in
                 eng.sql("SELECT a, b FROM t1").collect())
    assert got == [(0, "x0"), (1, "x1"), (2, "x2")]
    # sink through the SAME connection
    eng.sql("CREATE TABLE src_data (a INT PRIMARY KEY, b VARCHAR)")
    eng.sql("INSERT INTO src_data VALUES (10, 'y'), (11, 'z')")
    eng.sql("CREATE MATERIALIZED VIEW src_mv AS"
            " SELECT a, b FROM src_data")
    eng.sql("CREATE SINK snk FROM src_mv WITH (connector = 'kafka',"
            " connection = conn, topic = 'conn_out',"
            " force_append_only = 'true') FORMAT PLAIN ENCODE JSON")
    eng.sql("FLUSH")
    c = KafkaWireClient(broker.host, broker.port)
    try:
        recs, _hwm = c.fetch("conn_out", 0, 0)
    finally:
        c.close()
    vals = sorted(json.loads(v.decode())["a"] for _o, _ts, _k, v in recs)
    assert vals == [10, 11]
    # both objects pin the connection; the connection pins the secret
    with pytest.raises(PermissionError, match="connection used by 2"):
        eng.sql("DROP CONNECTION conn")
    with pytest.raises(PermissionError, match="secret used by 3"):
        eng.sql("DROP SECRET sec_b")
    eng.sql("DROP SINK snk")
    eng.sql("DROP TABLE t1")
    eng.sql("DROP CONNECTION conn")
    eng.sql("DROP SECRET sec_b")


def test_connection_survives_restart(spark, broker):
    wh = tempfile.mkdtemp(prefix="rw_connre_")
    e1 = Engine(spark, wh)
    e1.sql("CREATE CONNECTION conn WITH (type = 'kafka',"
           " properties.bootstrap.server = "
           f"'{broker.host}:{broker.port}')")
    e2 = Engine(spark, wh)
    rows = e2.sql("SHOW CONNECTIONS").collect()
    assert rows[0][0] == "conn" and rows[0][1] == "kafka"
