"""Aggregate-function coverage.

Parity targets (SURVEY.md §2.3, reference `src/expr/impl/src/aggregate/`):
general.rs (count/sum/avg/min/max/stddev/var), bit_and/or/xor, bool_and/or,
string_agg, array_agg, first/last_value, mode, percentile_cont/disc,
approx_count_distinct, DISTINCT modifier, FILTER clause, ordered-set input.

Determinism notes: stddev/var/corr are summation-order-sensitive → rounded
to 4 decimals on both sides; mode is computed manually (count + tiebreak)
because engines break frequency ties differently; string_agg/array_agg are
explicitly ordered.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import EVENTS_US, msum, o_msum, tables


@register(
    "agg_stats",
    oracle="""
SELECT c_nationkey,
       round(stddev_samp(c_acctbal), 4) AS sd_samp,
       round(stddev_pop(c_acctbal), 4)  AS sd_pop,
       round(var_samp(c_acctbal), 4)    AS v_samp,
       round(var_pop(c_acctbal), 4)     AS v_pop
FROM customer WHERE c_nationkey < 5
GROUP BY c_nationkey ORDER BY c_nationkey
""",
)
def agg_stats(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_nationkey") < 5)
        .groupBy("c_nationkey")
        .agg(
            F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_samp"),
            F.round(F.stddev_pop("c_acctbal"), 4).alias("sd_pop"),
            F.round(F.var_samp("c_acctbal"), 4).alias("v_samp"),
            F.round(F.var_pop("c_acctbal"), 4).alias("v_pop"),
        )
    )


@register(
    "agg_corr_covar",
    oracle="""
SELECT round(corr(l_quantity, l_extendedprice), 4) AS r,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS cv
FROM lineitem WHERE l_orderkey < 5000
""",
)
def agg_corr_covar(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 5000)
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("r"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cv"),
        )
    )


@register(
    "agg_minmax_by",
    oracle="""
SELECT c_nationkey,
       arg_min(c_name, c_acctbal) AS poorest,
       arg_max(c_name, c_acctbal) AS richest
FROM customer WHERE c_nationkey < 10
GROUP BY c_nationkey ORDER BY c_nationkey
""",
)
def agg_minmax_by(spark, sf_dir):
    """min_by/max_by (reference first_last_value.rs / general.rs).
    c_acctbal values are distinct in practice → no tie ambiguity."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_nationkey") < 10)
        .groupBy("c_nationkey")
        .agg(
            F.min_by("c_name", "c_acctbal").alias("poorest"),
            F.max_by("c_name", "c_acctbal").alias("richest"),
        )
    )


@register(
    "agg_bit_ops",
    oracle="""
SELECT l_returnflag,
       bit_and(l_linenumber) AS band,
       bit_or(l_linenumber)  AS bor,
       bit_xor(l_linenumber) AS bxor
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_bit_ops(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("band"),
            F.bit_or("l_linenumber").alias("bor"),
            F.bit_xor("l_linenumber").alias("bxor"),
        )
    )


@register(
    "agg_bool_ops",
    oracle="""
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000.0)   AS all_big,
       bool_or(o_totalprice > 400000.0)  AS any_huge
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def agg_bool_ops(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_big"),
            F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_huge"),
        )
    )


@register(
    "agg_string_agg",
    oracle="""
SELECT r_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS members
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_regionkey ORDER BY r_regionkey
""",
)
def agg_string_agg(spark, sf_dir):
    """string_agg with ORDER BY (reference string_agg.rs + ordered-set input
    orderby.rs:26): Spark = sort_array(collect_list) + array_join — the
    sort key is the value itself so pre-shuffle order is irrelevant."""
    t = tables(spark, sf_dir)
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("members"))
    )


@register(
    "agg_array_agg",
    oracle="""
SELECT o_custkey, list_aggregate(list_sort(list(o_orderkey)), 'string_agg', '|') AS order_keys
FROM orders WHERE o_custkey < 20
GROUP BY o_custkey ORDER BY o_custkey
""",
)
def agg_array_agg(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 20)
        .groupBy("o_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("o_orderkey")), "|").alias("order_keys")
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS nd_parts,
       count(DISTINCT l_suppkey) AS nd_supps,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_count_distinct(spark, sf_dir):
    """Multi-distinct aggregation (reference distinct_agg_rule.rs:35 splits
    these; Spark's RewriteDistinctAggregates does the same expand)."""
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.countDistinct("l_suppkey").alias("nd_supps"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_filter_clause",
    oracle=f"""
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       {o_msum('o_totalprice')} AS total,
       {o_msum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END")} AS urgent_total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def agg_filter_clause(spark, sf_dir):
    """FILTER (WHERE ...) clause (reference aggregation/filter.rs:24)."""
    t = tables(spark, sf_dir)
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.when(urgent, 1)).alias("n_urgent"),
            msum("o_totalprice").alias("total"),
            msum(F.when(urgent, F.col("o_totalprice")).otherwise(0)).alias("urgent_total"),
        )
    )


@register(
    "agg_percentile",
    oracle="""
SELECT c_nationkey,
       round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY c_acctbal), 4) AS median_bal,
       round(percentile_cont(0.95) WITHIN GROUP (ORDER BY c_acctbal), 4) AS p95_bal,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS median_disc
FROM customer WHERE c_nationkey < 5
GROUP BY c_nationkey ORDER BY c_nationkey
""",
)
def agg_percentile(spark, sf_dir):
    """percentile_cont/disc (reference percentile_cont.rs, percentile_disc.rs).
    Spark `percentile` is the exact interpolated (cont) variant; disc =
    the smallest value whose cume_dist ≥ p, via min_by over ranked rows."""
    t = tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_nationkey") < 5)
    cont = c.groupBy("c_nationkey").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
        F.round(F.percentile("c_acctbal", F.lit(0.95)), 4).alias("p95_bal"),
    )
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal")
    disc = (
        c.select("c_nationkey", "c_acctbal", F.cume_dist().over(w).alias("cd"))
        .filter(F.col("cd") >= 0.5)
        .groupBy("c_nationkey")
        .agg(F.min("c_acctbal").alias("median_disc"))
    )
    return cont.join(disc, "c_nationkey").select(
        "c_nationkey", "median_bal", "p95_bal", "median_disc"
    )


@register(
    "agg_mode_manual",
    oracle="""
SELECT event_type, k AS mode_k FROM (
  SELECT event_type, k, row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, k) AS rn
  FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS cnt
        FROM events GROUP BY 1, 2) c
) r WHERE rn = 1 ORDER BY event_type
""",
)
def agg_mode_manual(spark, sf_dir):
    """mode() (reference mode.rs) computed as count+rank with explicit
    tiebreak — engines disagree on frequency-tie resolution otherwise."""
    t = tables(spark, sf_dir)
    cnt = (
        t["events"]
        .select("event_type", F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("event_type", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("k"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("k").alias("mode_k"))
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
SELECT l_returnflag, true AS within_2pct
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def agg_approx_count_distinct(spark, sf_dir):
    """approx_count_distinct (HLL) — reference has a registers-based
    implementation (`approx_count_distinct/mod.rs:36-44`); Spark's
    HyperLogLog++ estimate differs from any other engine's, so the
    oracle-checkable claim is the SKETCH CONTRACT itself: per group,
    |estimate − exact| / exact ≤ 2% (rsd is set to 1%, so 2% is ≥2σ)."""
    t = tables(spark, sf_dir)
    got = t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return got.select(
        "l_returnflag",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.02
        ).alias("within_2pct"),
    ).orderBy("l_returnflag")


@register(
    "agg_sum0_coalesce",
    oracle="""
SELECT o_orderstatus,
       coalesce(CAST(sum(CAST(round(CASE WHEN o_totalprice > 900000.0 THEN o_totalprice END*100,0) AS BIGINT)) AS BIGINT)/100.0, 0.0) AS sum0_huge
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def agg_sum0_coalesce(spark, sf_dir):
    """sum0 (sum defaulting to 0 on empty input, reference general.rs)."""
    t = tables(spark, sf_dir)
    huge = F.when(F.col("o_totalprice") > 900000.0, F.col("o_totalprice"))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(F.coalesce(msum(huge), F.lit(0.0)).alias("sum0_huge"))
    )


@register(
    "agg_first_last",
    oracle=f"""
SELECT event_type,
       first(value ORDER BY ts, event_id) AS first_val,
       last(value ORDER BY ts, event_id) AS last_val,
       count(*) AS n
FROM {EVENTS_US} e GROUP BY event_type ORDER BY event_type
""",
)
def agg_first_last(spark, sf_dir):
    """first_value/last_value with ORDER BY (reference
    `aggregate/first_last_value.rs:1`): realized as min_by/max_by over a
    (ts, event_id) ordering struct — single-pass, partial-agg friendly,
    no window/sort needed."""
    t = tables(spark, sf_dir)
    ordk = F.struct("ts", "event_id")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.min_by("value", ordk).alias("first_val"),
            F.max_by("value", ordk).alias("last_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_json_agg",
    oracle=f"""
WITH k AS (
  SELECT user_id, event_type, CAST(props->>'k' AS BIGINT) AS kv
  FROM {EVENTS_US} e WHERE event_id < 400
),
per_type AS (
  SELECT user_id, event_type, count(*) AS n FROM k GROUP BY user_id, event_type
)
SELECT p.user_id,
       (SELECT to_json(list_sort(list(kv))) FROM k WHERE k.user_id = p.user_id) AS j_arr,
       '{{' || string_agg('"' || event_type || '":' || n, ',' ORDER BY event_type) || '}}' AS j_obj
FROM per_type p GROUP BY p.user_id ORDER BY p.user_id
""",
)
def agg_json_agg(spark, sf_dir):
    """jsonb_agg / jsonb_object_agg (reference `aggregate/jsonb_agg.rs:1`):
    array agg → sorted JSON array; object agg → JSON object keyed by
    event_type (entries sorted so serialization is deterministic)."""
    t = tables(spark, sf_dir)
    k = (
        t["events"]
        .filter(F.col("event_id") < 400)
        .select("user_id", "event_type", F.get_json_object("props", "$.k").cast("long").alias("kv"))
    )
    arrs = k.groupBy("user_id").agg(
        F.to_json(F.sort_array(F.collect_list("kv"))).alias("j_arr")
    )
    per_type = k.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    objs = per_type.groupBy("user_id").agg(
        F.to_json(
            F.map_from_entries(F.sort_array(F.collect_list(F.struct("event_type", "n"))))
        ).alias("j_obj")
    )
    return arrs.join(objs, "user_id").orderBy("user_id")


@register(
    "agg_regr_manual",
    oracle=f"""
WITH s AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(round(value*1000,0) AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(round(value*1000,0) AS BIGINT) * CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(round(value*1000,0) AS BIGINT) * CAST(round(value*1000,0) AS BIGINT)) AS BIGINT) AS sxx
  FROM {EVENTS_US} e GROUP BY event_type
)
SELECT event_type,
       round((n*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx), 8) AS slope_scaled,
       round((sy - ((n*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)) * sx) / n, 6) AS intercept
FROM s ORDER BY event_type
""",
)
def agg_regr_manual(spark, sf_dir):
    """Linear-regression aggregates (regr_slope / regr_intercept family):
    assembled from EXACT integer moment sums (x scaled to int thousandths,
    y integral) so the result is order-independent — native regr_* over
    doubles would differ across engines by summation order."""
    t = tables(spark, sf_dir)
    x = F.round(F.col("value") * 1000, 0).cast("long")
    y = F.get_json_object("props", "$.k").cast("long")
    s = (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return s.select(
        "event_type",
        F.round(slope, 8).alias("slope_scaled"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
    ).orderBy("event_type")
