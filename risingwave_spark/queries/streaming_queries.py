"""Real Structured-Streaming queries declared to the driver: each one runs
a genuine streaming job (readStream → stateful transform → memory sink or
MV runtime) and returns the final result DataFrame, oracle-checked against
the equivalent one-shot batch SQL — the reference's batch-vs-streaming
snapshot-equivalence gate (`e2e_test/streaming/nexmark_snapshot.slt`).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import EVENTS_US, o_msum, tables
from risingwave_spark.streaming.mv import run_changelog, with_ops


def _event_stream(spark, sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(stream_df, mode: str):
    name = "q" + uuid.uuid4().hex[:12]
    q = stream_df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return name


@register(
    "stream_tumble_agg",
    oracle=f"""
SELECT date_trunc('hour', ts) AS ws, event_type,
       count(*) AS n, {o_msum('value', 10000)} AS total
FROM {EVENTS_US} e
GROUP BY ws, event_type ORDER BY ws, event_type
""",
)
def stream_tumble_agg(spark, sf_dir):
    """Streaming tumbling-window agg (reference streaming HashAgg over
    tumble windows) run to completion, hash-compared with batch SQL."""
    sdf = _event_stream(spark, sf_dir)
    agg = (
        sdf.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 10000, 0).cast("long")) / 10000.0).alias("total"),
        )
    )
    name = _run_to_memory(agg, "complete")
    return spark.sql(f"SELECT w.start AS ws, event_type, n, total FROM {name}")


@register(
    "stream_dedup_agg",
    oracle=f"""
SELECT event_type, count(*) AS n FROM (
  SELECT DISTINCT ON (event_id) event_id, event_type FROM {EVENTS_US} e ORDER BY event_id
) d GROUP BY event_type ORDER BY event_type
""",
)
def stream_dedup_agg(spark, sf_dir):
    """Streaming dropDuplicates (reference AppendOnlyDedup
    `dedup/append_only_dedup.rs:27`) feeding a streaming agg."""
    sdf = _event_stream(spark, sf_dir)
    agg = (
        sdf.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = _run_to_memory(agg, "complete")
    return spark.sql(f"SELECT event_type, n FROM {name}")


@register(
    "stream_mv_incremental",
    oracle=f"""
SELECT user_id, count(*) AS cnt,
       {o_msum('value', 10000)} AS total,
       min(value) AS vmin, max(value) AS vmax
FROM {EVENTS_US} e
GROUP BY user_id ORDER BY user_id
""",
)
def stream_mv_incremental(spark, sf_dir):
    """The MV runtime end-to-end: events split into 4 changelog chunks,
    folded incrementally through MaterializedGroupAgg (values-state +
    affected-group re-agg, `risingwave_spark/streaming/mv.py`); final MV
    must equal the one-shot batch aggregate."""
    ev = tables(spark, sf_dir)["events"]
    chunks = [with_ops(ev.filter(F.col("event_id") % 4 == i), 1) for i in range(4)]
    state_dir = tempfile.mkdtemp(prefix="rw_mv_")
    return run_changelog(spark, state_dir, chunks, ["user_id"], "event_id", "value")
