"""Executor-side produce for the non-kafka broker sinks — the per-task
wire producers the reference runs in its sink actors (each sink
executor owns a writer: `sink/kinesis.rs`, `sink/pulsar.rs`,
`sink/mqtt.rs`, `sink/nats.rs`, `sink/google_pubsub.rs`; nothing
funnels through a single node). The driver's role shrinks to routing
the changelog DIFF into pk-hashed Spark partitions; each task formats
its sorted rows and produces them over its OWN wire client, so sink
throughput scales with executors instead of driver bandwidth — the
same contract sources/kafka_exec.py established for the kafka sink.

Ordering: a pk hashes to ONE Spark partition (all of its −/+ rows,
every chunk, in one task, sorted by (chunk, pk, op)); kinesis routes
by partition key and pulsar by message key, so per-key event order is
what a single producer emitted — the only order those systems
guarantee anyway. The append-only families (mqtt/nats/pubsub) carry
keyless inserts where cross-task order is unspecified by the service
itself.

Registered for pickle-BY-VALUE (with the wire/format modules it
depends on) so the closures travel inside the task payload — Python
workers never need `risingwave_spark` importable (the
sources/decoders.py mechanism).
"""

from __future__ import annotations

import json
import sys
import uuid

try:  # pragma: no cover - depends on the vendored cloudpickle version
    from pyspark import cloudpickle as _cloudpickle

    import risingwave_spark.sources.bigquery as _bq
    import risingwave_spark.sources.cloud_store as _cs
    import risingwave_spark.sources.dynamodb_store as _dy
    import risingwave_spark.sources.es_store as _es
    import risingwave_spark.sources.kafka_exec as _ke
    import risingwave_spark.sources.kinesis as _kin
    import risingwave_spark.sources.mongowire as _mo
    import risingwave_spark.sources.mqtt_wire as _mq
    import risingwave_spark.sources.nats_wire as _na
    import risingwave_spark.sources.olap_http as _oh
    import risingwave_spark.sources.pgwire as _pg
    import risingwave_spark.sources.pubsub as _ps
    import risingwave_spark.sources.pulsar_wire as _pw
    import risingwave_spark.sources.redis_store as _rd
    import risingwave_spark.sources.rsa_jwt as _rj
    import risingwave_spark.sources.s3_store as _s3
    import risingwave_spark.sources.sink_format as _sf
    import risingwave_spark.sources.tdswire as _td
    import risingwave_spark.sources.webhdfs_store as _wh

    for _m in (sys.modules[__name__], _bq, _cs, _dy, _es, _ke, _kin,
               _mo, _mq, _na, _oh, _pg, _ps, _pw, _rd, _rj, _s3, _sf,
               _td, _wh):
        _cloudpickle.register_pickle_by_value(_m)
except Exception:  # noqa: BLE001
    pass

# module-top imports: these names become by-value globals of the task
# closures (the registered modules travel inside the pickle) — a
# function-body `from risingwave_spark...` import would fail on
# executor workers that can't import the package at all
from risingwave_spark.sources.bigquery import BigQueryClient
from risingwave_spark.sources.cloud_store import AzblobClient, GcsClient
from risingwave_spark.sources.dynamodb_store import DynamoClient
from risingwave_spark.sources.es_store import EsClient
from risingwave_spark.sources.kafka_exec import format_rows, py_val
from risingwave_spark.sources.mongowire import MongoClient
from risingwave_spark.sources.olap_http import (
    ClickHouseClient,
    StreamLoadClient,
)
from risingwave_spark.sources.redis_store import RedisClient
from risingwave_spark.sources.kinesis import KinesisClient
from risingwave_spark.sources.mqtt_wire import MqttClient
from risingwave_spark.sources.nats_wire import NatsClient
from risingwave_spark.sources.pgwire import PgWireClient
from risingwave_spark.sources.pubsub import PubSubClient
from risingwave_spark.sources.pulsar_wire import PulsarWireClient
from risingwave_spark.sources.s3_store import S3Client
from risingwave_spark.sources.tdswire import TdsClient
from risingwave_spark.sources.webhdfs_store import WebHdfsClient


def _task_pid() -> int:
    """This task's Spark partition id — the per-task writer identity
    the staged families put into object names / load labels. The
    repartition that feeds foreachPartition hashes pk columns, so a
    replay of the SAME chunk lands every row in the SAME pid: staged
    object names and Stream Load labels are replay-stable."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else 0


def _produce_kinesis(cfg: dict, topic: str, events: list) -> None:
    """PutRecords from the task (reference kinesis.rs: each sink actor
    puts its own records; the partition key preserves per-key order)."""
    client = KinesisClient(
        cfg["endpoint"], region=cfg["region"],
        access_key=cfg["access"], secret_key=cfg["secret"])
    records = []
    for k, v in events:
        kb = json.dumps(k, sort_keys=True)
        data = b"" if v is None else json.dumps(v, sort_keys=True).encode()
        records.append((kb, data))
    if records:
        client.put_records(topic, records)


def _produce_mqtt(cfg: dict, topic: str, events: list) -> None:
    c = MqttClient(cfg["host"], cfg["port"],
                   f"rw_pub_{uuid.uuid4().hex[:8]}")
    try:
        for _k, v in events:
            if v is None:
                continue  # no tombstones in an append-only stream
            c.publish(topic, json.dumps(v, sort_keys=True).encode(), qos=1)
    finally:
        c.disconnect()


def _produce_nats(cfg: dict, topic: str, events: list) -> None:
    c = NatsClient(cfg["host"], cfg["port"])
    try:
        for _k, v in events:
            if v is None:
                continue  # no tombstones in an append-only stream
            c.js_publish(topic, json.dumps(v, sort_keys=True).encode())
    finally:
        c.close()


def _produce_pubsub(cfg: dict, topic: str, events: list) -> None:
    payloads = [
        json.dumps(v, sort_keys=True).encode()
        for _k, v in events
        if v is not None  # no tombstones in an append-only stream
    ]
    if payloads:
        PubSubClient(cfg["host"], credentials=cfg.get("creds")).publish(
            cfg["project"], topic, payloads)


def _produce_pulsar(cfg: dict, topic: str, events: list) -> None:
    """Pipelined SENDs over the task's own socket (send_batch —
    receipts drain per window, not per message)."""
    c = PulsarWireClient(cfg["host"], cfg["port"])
    try:
        pname = c.create_producer(topic, producer_id=0)
        msgs = []
        for i, (k, v) in enumerate(events):
            key = json.dumps(k, sort_keys=True)
            payload = (b"" if v is None
                       else json.dumps(v, sort_keys=True).encode())
            msgs.append((i, payload, key))
        c.send_batch(0, pname, msgs)
    finally:
        c.close()


def _produce_es(cfg: dict, topic: str, events: list) -> None:
    """One _bulk call per task (reference elasticsearch_opensearch/:
    index-on-upsert / delete-on-retract; _id = pk values joined by the
    delimiter). Per-doc op order holds: a pk lives in one task."""
    client = EsClient(cfg["url"], username=cfg.get("username"),
                      password=cfg.get("password"))
    actions = []
    for k, v in events:
        _id = cfg["delimiter"].join(str(x) for x in k.values())
        if v is None:
            actions.append(("delete", topic, _id, None))
        else:
            actions.append(("index", topic, _id, v))
    if actions:
        client.bulk(actions)


def _jdbc_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _produce_jdbc(cfg: dict, topic: str, events: list) -> None:
    """Batched statements from the task over the task's own PG
    connection (reference sink/remote.rs: each sink actor owns a JDBC
    writer): same batching contract as the driver-side path —
    consecutive upserts collapse into one multi-row INSERT ... ON
    CONFLICT, retractions into one OR-of-keys DELETE. Cross-task
    safety: a pk lives in ONE task, so no two tasks touch one row."""
    c = PgWireClient(cfg["host"], cfg["port"], cfg["user"],
                     cfg["password"], cfg["db"])
    cols, pk, fmt = cfg["cols"], cfg["pk"], cfg["fmt"]
    collist = ", ".join(cols)
    sets = ", ".join(
        f"{col} = excluded.{col}" for col in cols if col not in pk
    ) or f"{pk[0]} = excluded.{pk[0]}"
    ins: list = []
    ins_keys: set = set()
    dels: list = []

    def flush_ins():
        if not ins:
            return
        sql = f"INSERT INTO {topic} ({collist}) VALUES " + ", ".join(ins)
        if fmt == "upsert":
            sql += f" ON CONFLICT ({', '.join(pk)}) DO UPDATE SET {sets}"
        c.query(sql)
        ins.clear()
        ins_keys.clear()

    def flush_dels():
        if not dels:
            return
        c.query(f"DELETE FROM {topic} WHERE "
                + " OR ".join(f"({w})" for w in dels))
        dels.clear()

    try:
        for k, v in events:
            kt = tuple(str(k[col]) for col in pk)
            if v is None:
                flush_ins()
                dels.append(" AND ".join(
                    f"{col} = {_jdbc_lit(k[col])}" for col in pk))
                if len(dels) >= 500:
                    flush_dels()
                continue
            flush_dels()
            if kt in ins_keys:
                flush_ins()
            ins_keys.add(kt)
            ins.append(
                "(" + ", ".join(_jdbc_lit(v.get(col)) for col in cols)
                + ")")
            if len(ins) >= 500:
                flush_ins()
        flush_dels()
        flush_ins()
    finally:
        c.close()


def _produce_redis(cfg: dict, topic: str, events: list) -> None:
    """SET/DEL from the task over its own RESP connection (reference
    sink/redis.rs pipelines per writer). Key templates mirror the
    driver-side path byte-for-byte."""
    c = RedisClient(cfg["host"], cfg["port"])
    try:
        for k, v in events:
            if cfg["key_format"]:
                key = cfg["key_format"]
                src = dict(v or {})
                src.update(k)
                for col, val in src.items():
                    key = key.replace("{" + col + "}", str(val))
            else:
                key = f"{cfg['table']}:{json.dumps(k, sort_keys=True)}"
            if v is None:
                c.delete(key)
                continue
            if cfg["value_format"]:
                val = cfg["value_format"]
                for col, cv in v.items():
                    val = val.replace("{" + col + "}", str(cv))
            else:
                val = json.dumps(v, sort_keys=True)
            c.set(key, val)
    finally:
        c.close()


def _produce_dynamodb(cfg: dict, topic: str, events: list) -> None:
    """PutItem/DeleteItem from the task (reference sink/dynamodb.rs:
    each writer signs its own requests)."""
    c = DynamoClient(cfg["endpoint"], region=cfg["region"],
                     access_key=cfg["access"], secret_key=cfg["secret"])
    for k, v in events:
        if v is None:
            c.delete_item(topic, {col: k[col] for col in cfg["pk"]})
        else:
            c.put_item(topic, v)


def _produce_mongodb(cfg: dict, topic: str, events: list) -> None:
    """Bulk update/delete/insert commands from the task (reference
    sink/mongodb.rs per-writer bulks). CONSECUTIVE same-type runs
    batch into one command — never regrouped across types, so a
    key's delete-then-insert order inside a chunk is preserved."""
    c = MongoClient(cfg["host"], cfg["port"], cfg["user"],
                    cfg["password"])
    mdb, coll, pk, fmt = cfg["mdb"], cfg["coll"], cfg["pk"], cfg["fmt"]

    def mongo_id(k):
        return k[pk[0]] if len(pk) == 1 else {col: k[col] for col in pk}

    try:
        run_type = None
        run: list = []

        def flush():
            nonlocal run, run_type
            if not run:
                return
            if run_type == "delete":
                c.delete(mdb, coll, run)
            elif run_type == "update":
                c.update(mdb, coll, run)
            else:
                c.insert(mdb, coll, run)
            run = []
            run_type = None

        for k, v in events:
            if v is None:
                kind, item = "delete", {"q": {"_id": mongo_id(k)},
                                        "limit": 1}
            elif fmt == "upsert":
                row = dict(v)
                row["_id"] = mongo_id(k)
                kind, item = "update", {
                    "q": {"_id": row["_id"]},
                    "u": {"$set": row}, "upsert": True, "multi": False}
            else:
                kind, item = "insert", dict(v)
            if kind != run_type:
                flush()
                run_type = kind
            run.append(item)
            if len(run) >= 500:
                flush()
                run_type = None
        flush()
    finally:
        c.close()


# ------------------------------------------------- staged / HTTP-batch
# The staged families write their chunk's DATA from tasks (reference
# posture: per-actor sink writers — `sink/file_sink/opendal_sink.rs`
# writes one object per executor per epoch; `doris_starrocks_
# connector.rs` one labeled load per writer). The driver keeps only
# routing (pk-hash repartition) and, where a protocol has one, the
# transactional commit. Object names / labels derive from
# (executor_id, epoch, partition id) — all replay-stable — so a
# crash-replay of the same chunk overwrites/dedupes instead of
# duplicating.


def _staged_lines(events: list) -> bytes | None:
    rows = [v for _k, v in events if v is not None]
    if not rows:
        return None
    return "\n".join(
        json.dumps(v, sort_keys=True) for v in rows
    ).encode() + b"\n"


def _staged_key(cfg: dict) -> str:
    base = f"{cfg['path']}/" if cfg.get("path") else ""
    return f"{base}{cfg['executor_id']}-{_task_pid()}_{cfg['epoch']}.json"


def _stage_s3(cfg: dict, topic: str, events: list) -> None:
    """One SigV4 PutObject per non-empty task (s3/snowflake file
    sinks): `{path}/{executor_id}-{pid}_{epoch}.json`."""
    data = _staged_lines(events)
    if data is None:
        return
    S3Client(cfg["endpoint"], region=cfg["region"],
             access_key=cfg["access"], secret_key=cfg["secret"]
             ).put_object(cfg["bucket"], _staged_key(cfg), data)


def _stage_gcs(cfg: dict, topic: str, events: list) -> None:
    data = _staged_lines(events)
    if data is None:
        return
    GcsClient(cfg["endpoint"], credentials=cfg.get("creds")
              ).put_object(cfg["bucket"], _staged_key(cfg), data)


def _stage_azblob(cfg: dict, topic: str, events: list) -> None:
    data = _staged_lines(events)
    if data is None:
        return
    AzblobClient(cfg["endpoint"], cfg["account"], cfg["key"]
                 ).put_blob(cfg["bucket"], _staged_key(cfg), data)


def _stage_webhdfs(cfg: dict, topic: str, events: list) -> None:
    data = _staged_lines(events)
    if data is None:
        return
    key = (f"{cfg['path']}/{cfg['executor_id']}-{_task_pid()}"
           f"_{cfg['epoch']}.json")
    WebHdfsClient(cfg["endpoint"]).create(key, data)


def _produce_bigquery(cfg: dict, topic: str, events: list) -> None:
    """insertAll from the task; insertIds mix (epoch, pid, index,
    content) so only a true replay of the same chunk dedupes."""
    import hashlib

    pid = _task_pid()
    rows = []
    for i, (_k, v) in enumerate(events):
        if v is None:
            continue  # append-only: no tombstones
        body = json.dumps(v, sort_keys=True)
        iid = hashlib.md5(
            f"{cfg['epoch']}:{pid}:{i}:{body}".encode()).hexdigest()
        rows.append((iid, v))
    if rows:
        BigQueryClient(cfg["creds"], cfg["endpoint"]).insert_all(
            cfg["project"], cfg["dataset"], topic, rows)


def _produce_clickhouse(cfg: dict, topic: str, events: list) -> None:
    """JSONEachRow INSERT per task (ReplacingMergeTree posture:
    upserts insert sign 0, retractions insert the pk row with sign 1
    — the table engine collapses on merge)."""
    rows = []
    for k, v in events:
        if v is None:
            if cfg["fmt"] == "upsert":
                row = dict(k)
                row[cfg["delete_column"]] = 1
                rows.append(row)
            continue
        row = dict(v)
        if cfg["fmt"] == "upsert":
            row[cfg["delete_column"]] = 0
        rows.append(row)
    if rows:
        ClickHouseClient(cfg["url"], cfg["user"], cfg["password"]
                         ).insert_json_each_row(cfg["database"], topic, rows)


def _produce_streamload(cfg: dict, topic: str, events: list) -> None:
    """One labeled Stream Load PUT per non-empty task; the label
    `{prefix}-{epoch}-p{pid}` is replay-stable, and 'Label Already
    Exists' is the success-shaped idempotent-replay outcome."""
    rows = []
    for k, v in events:
        if v is None:
            row = dict(k)
            row[cfg["delete_sign"]] = "1"
            rows.append(row)
        else:
            row = dict(v)
            if cfg["fmt"] == "upsert":
                row[cfg["delete_sign"]] = "0"
            rows.append(row)
    if rows:
        StreamLoadClient(cfg["url"], cfg["user"], cfg["password"]).load(
            cfg["database"], topic, rows,
            label=f"rw_{cfg['table']}-{cfg['epoch']}-p{_task_pid()}")


def _produce_sqlserver(cfg: dict, topic: str, events: list) -> None:
    """T-SQL batches over the task's own TDS connection (reference
    sink/sqlserver.rs per-writer tiberius clients): retraction →
    DELETE, upsert → DELETE+INSERT on the pk, append-only → INSERT;
    many statements per SQLBatch round trip. A pk lives in ONE task,
    so no two tasks touch one remote row."""
    cols, pk, fmt = cfg["cols"], cfg["pk"], cfg["fmt"]
    stmts = []
    for k, v in events:
        where = " AND ".join(f"{col} = {_jdbc_lit(k[col])}" for col in pk)
        if v is None:
            stmts.append(f"DELETE FROM {topic} WHERE {where}")
            continue
        collist = ", ".join(cols)
        vals = ", ".join(_jdbc_lit(v.get(col)) for col in cols)
        if fmt == "upsert":
            stmts.append(f"DELETE FROM {topic} WHERE {where}")
        stmts.append(f"INSERT INTO {topic} ({collist}) VALUES ({vals})")
    if not stmts:
        return
    c = TdsClient(cfg["host"], cfg["port"], cfg["user"], cfg["password"],
                  cfg["db"])
    try:
        for i in range(0, len(stmts), 500):
            c.query("; ".join(stmts[i:i + 500]))
    finally:
        c.close()


_PRODUCERS = {
    "kinesis": _produce_kinesis,
    "mqtt": _produce_mqtt,
    "nats": _produce_nats,
    "google_pubsub": _produce_pubsub,
    "pulsar": _produce_pulsar,
    "elasticsearch": _produce_es,
    "jdbc": _produce_jdbc,
    "redis": _produce_redis,
    "dynamodb": _produce_dynamodb,
    "mongodb": _produce_mongodb,
    "s3_file": _stage_s3,
    "gcs_file": _stage_gcs,
    "azblob_file": _stage_azblob,
    "webhdfs_file": _stage_webhdfs,
    "bigquery": _produce_bigquery,
    "clickhouse": _produce_clickhouse,
    "streamload": _produce_streamload,
    "sqlserver": _produce_sqlserver,
}


def make_sink_partition_producer(
    family: str,
    cfg: dict,
    topic: str,
    fmt: str,
    fields: list,
    pk: list,
    db: str,
    table: str,
    ts_ms: int,
    op_col: str,
    cols: list,
):
    """The foreachPartition task body: rows (already pk-partitioned and
    (chunk, pk, op)-sorted) → formatter events → wire produce, one
    client per task."""
    produce = _PRODUCERS[family]

    def produce_partition(rows_iter) -> None:
        rows = [(r[op_col], {c: py_val(r[c]) for c in cols})
                for r in rows_iter]
        if not rows:
            return
        events = format_rows(fmt, rows, fields, pk, db, table, ts_ms)
        if events:
            produce(cfg, topic, events)

    return produce_partition
