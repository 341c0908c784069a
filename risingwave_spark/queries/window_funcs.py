"""Window (OVER) function coverage.

Parity targets (SURVEY.md §2.4): kinds row_number/rank/dense_rank/lag/lead
plus any-agg-OVER (`src/expr/core/src/window_function/kind.rs:27-38`);
ROWS and RANGE frames (`call.rs:151`, `rows.rs:29`, `range.rs:42`); batch
runtime SortOverWindow (`sort_over_window.rs:34`), GroupTopN
(`group_top_n.rs:43`).

Determinism: every ORDER BY carries a unique-key tiebreak so rank
functions agree cross-engine; frame aggregations over doubles use the
exact-cents trick (integer sums are order-independent).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import tables


@register(
    "win_rank_kinds",
    oracle="""
SELECT o_orderkey,
       row_number() OVER w AS rn,
       rank()       OVER w2 AS rk,
       dense_rank() OVER w2 AS drk
FROM orders
WHERE o_custkey < 20
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderstatus)
ORDER BY o_orderkey
""",
)
def win_rank_kinds(spark, sf_dir):
    t = tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w2 = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 20)
        .select(
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w2).alias("rk"),
            F.dense_rank().over(w2).alias("drk"),
        )
    )


@register(
    "win_group_topn",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3 AND o_custkey < 100
ORDER BY o_custkey, o_totalprice DESC, o_orderkey
""",
)
def win_group_topn(spark, sf_dir):
    """Rank-filter → top-k per group (reference GroupTopN
    `group_top_n.rs:43` and the OverWindow→TopN rule
    `rule/over_window_to_topn_rule.rs:53`)."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "win_lag_lead",
    oracle="""
SELECT l_orderkey, l_linenumber,
       lag(l_quantity)           OVER w AS prev_qty,
       lead(l_quantity)          OVER w AS next_qty,
       lag(l_quantity, 2, -1.0)  OVER w AS prev2_qty
FROM lineitem
WHERE l_orderkey < 300
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
ORDER BY l_orderkey, l_linenumber
""",
)
def win_lag_lead(spark, sf_dir):
    t = tables(spark, sf_dir)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.lag("l_quantity").over(w).alias("prev_qty"),
            F.lead("l_quantity").over(w).alias("next_qty"),
            F.lag("l_quantity", 2, -1.0).over(w).alias("prev2_qty"),
        )
    )


@register(
    "win_running_sum",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT))
            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)/100.0 AS running_qty,
       count(*) OVER (PARTITION BY l_orderkey) AS n_lines
FROM lineitem WHERE l_orderkey < 300
ORDER BY l_orderkey, l_linenumber
""",
)
def win_running_sum(spark, sf_dir):
    t = tables(spark, sf_dir)
    w = (
        W.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = W.partitionBy("l_orderkey")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).over(w) / 100.0).alias("running_qty"),
            F.count(F.lit(1)).over(wp).alias("n_lines"),
        )
    )


@register(
    "win_rows_frame",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT))
            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS BIGINT)/100.0 AS moving_sum
FROM lineitem WHERE l_orderkey < 300
ORDER BY l_orderkey, l_linenumber
""",
)
def win_rows_frame(spark, sf_dir):
    """Bounded ROWS frame (reference `rows.rs:29`)."""
    t = tables(spark, sf_dir)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(-2, 1)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).over(w) / 100.0).alias("moving_sum"),
        )
    )


@register(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, o_totalprice,
       count(*) OVER (ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT)
                      RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS n_in_band
FROM orders WHERE o_custkey < 30
ORDER BY o_orderkey
""",
)
def win_range_frame(spark, sf_dir):
    """RANGE frame with typed offset (reference `range.rs:42`). The range
    key is price-in-cents (bigint) so the frame bound is integral and
    bit-identical cross-engine."""
    t = tables(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = W.orderBy(cents).rangeBetween(-100000, W.currentRow)
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 30)
        .select("o_orderkey", "o_totalprice", F.count(F.lit(1)).over(w).alias("n_in_band"))
    )


@register(
    "win_first_last_nth",
    oracle="""
SELECT l_orderkey, l_linenumber,
       first_value(l_partkey) OVER w AS first_part,
       last_value(l_partkey)  OVER w AS last_part,
       nth_value(l_partkey, 2) OVER w AS second_part
FROM lineitem WHERE l_orderkey < 200
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY l_orderkey, l_linenumber
""",
)
def win_first_last_nth(spark, sf_dir):
    t = tables(spark, sf_dir)
    w = (
        W.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.first("l_partkey").over(w).alias("first_part"),
            F.last("l_partkey").over(w).alias("last_part"),
            F.nth_value("l_partkey", 2).over(w).alias("second_part"),
        )
    )


@register(
    "win_ntile_dist",
    oracle="""
SELECT c_custkey,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd
FROM customer WHERE c_custkey < 100
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
""",
)
def win_ntile_dist(spark, sf_dir):
    t = tables(spark, sf_dir)
    w = W.orderBy("c_acctbal", "c_custkey")
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 100)
        .select(
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
    )


@register(
    "win_agg_over_partition",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) OVER (PARTITION BY c_nationkey) AS BIGINT)/100.0 AS nation_bal,
       max(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_max,
       min(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_min
FROM customer WHERE c_custkey < 200
ORDER BY c_custkey
""",
)
def win_agg_over_partition(spark, sf_dir):
    t = tables(spark, sf_dir)
    w = W.partitionBy("c_nationkey")
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            "c_nationkey",
            (F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).over(w) / 100.0).alias("nation_bal"),
            F.max("c_acctbal").over(w).alias("nation_max"),
            F.min("c_acctbal").over(w).alias("nation_min"),
        )
    )


@register(
    "topn_with_ties",
    oracle="""
SELECT o_orderstatus, o_totalprice FROM (
  SELECT o_orderstatus, o_totalprice,
         rank() OVER (ORDER BY round(o_totalprice / 1000, 0) DESC) AS rk
  FROM orders
) t WHERE rk <= 5 ORDER BY o_totalprice DESC, o_orderstatus
""",
)
def topn_with_ties(spark, sf_dir):
    """TopN WITH TIES (reference `top_n` WITH TIES support,
    `top_n/top_n_plain.rs:79`): rank() (not row_number) keeps every row
    tied with the k-th — coarsened to 1k buckets so ties actually occur."""
    t = tables(spark, sf_dir)
    w = W.orderBy(F.desc(F.round(F.col("o_totalprice") / 1000, 0)))
    return (
        t["orders"]
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 5)
        .select("o_orderstatus", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderstatus")
    )


@register(
    "win_frame_exclude",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT))
            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                  EXCLUDE CURRENT ROW) AS BIGINT) AS others_cents
FROM lineitem WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
""",
)
def win_frame_exclude(spark, sf_dir):
    """Frame EXCLUDE CURRENT ROW (reference FrameExclusion,
    `window_function/call.rs:151`): Spark has no EXCLUDE clause — the
    identity `frame_sum − current_row` re-expresses it exactly (DuckDB
    oracle uses the native EXCLUDE)."""
    t = tables(spark, sf_dir)
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    # an excluded frame with no other rows is EMPTY → sum is NULL (PG and
    # DuckDB semantics), not 0 — guard on the partition row count
    others = F.when(
        F.count(F.lit(1)).over(w) > 1, F.sum(cents).over(w) - cents
    )
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 400)
        .select(
            "l_orderkey",
            "l_linenumber",
            others.alias("others_cents"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "win_session_frame",
    oracle="""
WITH marks AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 10 MINUTE
              THEN 0 ELSE 1 END AS new_s
  FROM events WHERE user_id < 50
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
)
SELECT user_id, event_id,
       CAST(count(*) OVER (PARTITION BY user_id, sid) AS BIGINT) AS sess_n,
       CAST(sum(CAST(round(value*100, 0) AS BIGINT))
            OVER (PARTITION BY user_id, sid) AS BIGINT) AS sess_cents
FROM sess ORDER BY user_id, event_id
""",
)
def win_session_frame(spark, sf_dir):
    """SESSION over-window frame (reference
    `window_function/session.rs` SessionFrameBounds; SQL `agg OVER
    (... ORDER BY ts SESSION WITH GAP INTERVAL '10' MINUTE)`): each
    row's frame is its gap-delimited session. Two native window passes
    (mark+running-sum session ids, then partition-by-session aggregates)
    — no Python, one shuffle, whole-stage codegen throughout."""
    from risingwave_spark.operators.session_frame import (
        session_frame_window,
        with_session_id,
    )

    t = tables(spark, sf_dir)
    df = t["events"].filter(F.col("user_id") < 50)
    sess = with_session_id(
        df, ["user_id"], "ts", gap_seconds=600, tiebreak=["event_id"]
    )
    sw = session_frame_window(["user_id"])
    return (
        sess.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(sw).alias("sess_n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .over(sw)
            .alias("sess_cents"),
        )
        .orderBy("user_id", "event_id")
    )
