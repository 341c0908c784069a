"""Streaming-operator coverage over the `events` table.

Mirrors the reference's per-operator streaming suites
(`/root/reference/e2e_test/streaming/`): tumble/hop windows, sessionization,
append-only dedup, group top-n, over-window, as-of join, interval
(stream-stream) join, dynamic/temporal filter. Batch-expressible analogs are
oracle-checked; real Structured Streaming runs live in
`risingwave_spark/streaming/` and tests/test_streaming.py.

Oracle note: `events.ts` is ns in parquet; the catalog exposes µs, so every
oracle goes through the EVENTS_US view (CAST(ts AS TIMESTAMP)).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from risingwave_spark.operators.asof import asof_join_backward
from risingwave_spark.operators.dedup import dedup_first_per_key
from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import EVENTS_US, msum, o_msum, tables


@register(
    "ev_tumble_agg",
    oracle=f"""
SELECT date_trunc('hour', ts) AS ws, event_type,
       count(*) AS n, {o_msum('value', 10000)} AS total
FROM {EVENTS_US} e
GROUP BY ws, event_type ORDER BY ws, event_type
""",
)
def ev_tumble_agg(spark, sf_dir):
    """Tumbling window agg (reference tumble TVF + HashAgg;
    `e2e_test/streaming/` window suites). Streaming runtime equivalent:
    groupBy(window(ts, '1 hour')) — see tests/test_streaming.py."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), msum("value", 10000).alias("total"))
        .orderBy("ws", "event_type")
    )


@register(
    "ev_hop_agg",
    oracle=f"""
SELECT ws, event_type, count(*) AS n
FROM (
  SELECT e.*, w.ws
  FROM {EVENTS_US} e,
       unnest([time_bucket(INTERVAL '5 minutes', e.ts),
               time_bucket(INTERVAL '5 minutes', e.ts) - INTERVAL '5 minutes']) w(ws)
  WHERE e.ts >= w.ws AND e.ts < w.ws + INTERVAL '10 minutes'
) h
GROUP BY ws, event_type ORDER BY ws, event_type
""",
)
def ev_hop_agg(spark, sf_dir):
    """Hopping (sliding) window expansion (reference HopWindow executor,
    `hop_window.rs:25/31`): window(ts, 10m, 5m) emits one row per covering
    window, exactly the reference's row-expansion semantics."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .orderBy("ws", "event_type")
    )


@register(
    "ev_session_agg",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes' OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM {EVENTS_US} e
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM gaps GROUP BY user_id ORDER BY user_id
""",
)
def ev_session_agg(spark, sf_dir):
    """Sessionization (reference SESSION window frames, `session.rs:42`):
    lag-gap detection + cumulative session ids. Streaming equivalent is
    session_window() (tests/test_streaming.py)."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    gaps = t["events"].withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0),
    )
    return (
        gaps.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


@register(
    "ev_dedup_first",
    oracle=f"""
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM {EVENTS_US} e
) d WHERE rn = 1 ORDER BY user_id, event_type
""",
)
def ev_dedup_first(spark, sf_dir):
    """First-row-wins dedup / DISTINCT ON (reference AppendOnlyDedup,
    `dedup/append_only_dedup.rs:27`; streaming = dropDuplicates)."""
    t = tables(spark, sf_dir)
    return dedup_first_per_key(
        t["events"].select("user_id", "event_type", "event_id", "ts"),
        ["user_id", "event_type"],
        "ts",
        "event_id",
    )


@register(
    "ev_group_topn",
    oracle=f"""
SELECT event_type, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM {EVENTS_US} e
) t WHERE rn <= 3 ORDER BY event_type, value DESC
""",
)
def ev_group_topn(spark, sf_dir):
    """Streaming GroupTopN analog (reference `top_n/group_top_n.rs:64`)."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "value")
    )


@register(
    "ev_over_window",
    oracle=f"""
SELECT event_id, user_id,
       row_number() OVER w AS rn,
       lag(value)   OVER w AS prev_value,
       round(CAST(sum(CAST(round(value*10000,0) AS BIGINT)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)/10000.0, 4) AS running_value
FROM {EVENTS_US} e
WHERE user_id < 10
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, rn
""",
)
def ev_over_window(spark, sf_dir):
    """OverWindow on a stream (reference `over_window/general.rs:48`)."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        t["events"]
        .filter(F.col("user_id") < 10)
        .select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.lag("value").over(w).alias("prev_value"),
            F.round(
                F.sum(F.round(F.col("value") * 10000, 0).cast("long")).over(wf) / 10000.0, 4
            ).alias("running_value"),
        )
    )


@register(
    "ev_asof_join",
    oracle=f"""
SELECT p.event_id, p.user_id, p.ts, c.event_id AS click_id
FROM (SELECT * FROM {EVENTS_US} e WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts, max(event_id) AS event_id
           FROM {EVENTS_US} e WHERE event_type = 'click' GROUP BY user_id, ts) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
)
def ev_asof_join(spark, sf_dir):
    """Event-time as-of join (reference AsOfJoin `asof_join.rs:110`):
    each purchase matched to the user's latest click at-or-before it.
    Spark lacks the operator → union + last(ignorenulls) over one
    key-partitioned window (operators/asof.py)."""
    t = tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # equal-timestamp clicks resolve to max event_id INSIDE the as-of
    # window's sort order (right_order) — previously a separate
    # groupBy(user, ts) pre-aggregation, i.e. one extra shuffle of the
    # whole click stream before the as-of key shuffle (guide §2.4)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    return asof_join_backward(
        purchases, clicks,
        key="user_id", right_key="c_user",
        left_ts="ts", right_ts="c_ts",
        payload_cols=["click_id"],
        how="inner",
        right_order=["click_id"],
    )


@register(
    "ev_interval_join",
    oracle=f"""
SELECT p.user_id, count(*) AS n_pairs
FROM (SELECT * FROM {EVENTS_US} e WHERE event_type = 'purchase') p
JOIN (SELECT * FROM {EVENTS_US} e WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts BETWEEN p.ts - INTERVAL '10 minutes' AND p.ts
GROUP BY p.user_id ORDER BY p.user_id
""",
)
def ev_interval_join(spark, sf_dir):
    """Stream-stream interval join (reference HashJoin with inequality →
    watermark-driven state cleaning, `hash_join.rs:129`): views within
    10 min before a purchase. Equi-join on user + time-band filter; in
    streaming this is the watermarked stream-stream join pattern."""
    t = tables(spark, sf_dir)
    p = t["events"].filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("p_ts")
    )
    v = t["events"].filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "ev_temporal_filter",
    oracle=f"""
SELECT event_type, count(*) AS n_recent
FROM {EVENTS_US} e
WHERE ts > (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL '7 days' FROM events)
GROUP BY event_type ORDER BY event_type
""",
)
def ev_temporal_filter(spark, sf_dir):
    """Temporal/dynamic filter (reference DynamicFilter
    `dynamic_filter.rs:39`, powering `ts > now() - interval`): the RHS is a
    1-row aggregate that re-evaluates per micro-batch; here the batch analog
    uses max(ts) as the clock."""
    t = tables(spark, sf_dir)
    clock = t["events"].agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    return (
        t["events"]
        .join(F.broadcast(clock))
        .filter(F.col("ts") > F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )


@register(
    "ev_temporal_join",
    oracle=f"""
SELECT e.event_id, c.c_name, c.c_mktsegment
FROM {EVENTS_US} e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'signup' ORDER BY e.event_id
""",
)
def ev_temporal_join(spark, sf_dir):
    """Stream-table (temporal) join (reference TemporalJoin
    `temporal_join.rs:44`, `FOR SYSTEM_TIME AS OF PROCTIME()`): the stream
    joins the current table snapshot; in micro-batch terms this is a
    stream-static broadcast join re-resolved per batch."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type") == "signup")
        .join(F.broadcast(t["customer"]), F.col("user_id") == F.col("c_custkey"))
        .select("event_id", "c_name", "c_mktsegment")
    )


@register(
    "ev_asof_left",
    oracle=f"""
SELECT p.event_id, p.user_id, p.ts, c.event_id AS click_id
FROM (SELECT * FROM {EVENTS_US} e WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
                FROM {EVENTS_US} e WHERE event_type = 'click' GROUP BY user_id, ts) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
)
def ev_asof_left(spark, sf_dir):
    """As-of LEFT OUTER join (reference asof left outer,
    `proto/plan_common.proto:134-148` + `asof_join.rs:110`): purchases
    with no earlier click keep a NULL match."""
    t = tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join_backward(
        purchases, clicks,
        key="user_id", right_key="c_user",
        left_ts="ts", right_ts="c_ts",
        payload_cols=["click_id"],
        how="left",
    )


@register(
    "rowid_gen",
    oracle=f"""
SELECT row_number() OVER (ORDER BY ts, event_id) AS _row_id,
       event_id, user_id
FROM {EVENTS_US} e WHERE event_id < 500 ORDER BY _row_id
""",
)
def rowid_gen(spark, sf_dir):
    """RowIdGen (reference `row_id_gen.rs:25`, Serial row ids for tables
    without pk): ids must be unique AND stable across restarts, so the
    generator is offset-based (dense rank over arrival order), not
    monotonically_increasing_id (partition-dependent, restart-unstable —
    the documented caveat)."""
    from pyspark.sql import Window as W

    t = tables(spark, sf_dir)
    w = W.orderBy("ts", "event_id")
    return (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select(F.row_number().over(w).alias("_row_id"), "event_id", "user_id")
        .orderBy("_row_id")
    )


@register(
    "ev_temporal_nonequi",
    oracle=f"""
SELECT b.band, count(*) AS n, min(e.value) AS vmin, max(e.value) AS vmax
FROM {EVENTS_US} e
JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 500.0), ('high', 500.0, 1e18))
     AS b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band ORDER BY b.band
""",
)
def ev_temporal_nonequi(spark, sf_dir):
    """Nested-loop temporal join (reference NestedLoopTemporalJoin,
    `nested_loop_temporal_join.rs:39`): stream rows matched to a tiny
    banding table on a RANGE condition — stream-static crossJoin+filter,
    broadcast nested loop in the plan (the only correct strategy for a
    non-equi dimension lookup)."""
    t = tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        t["events"]
        .join(F.broadcast(bands), (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .orderBy("band")
    )
