"""CH-benCHmark slice (reference `e2e_test/ch_benchmark/batch/*.slt.part`)
— the TPC-H-style analytics queries CH-benCHmark runs over a TPC-C
schema. The sandbox testdata is TPC-H-shaped, so each query keeps the
reference query's OPERATOR SHAPE under this fixed schema mapping:

    orderline → lineitem        (ol_number → l_linenumber,
                                 ol_amount → l_extendedprice,
                                 ol_delivery_d → l_shipdate)
    orders    → orders          (o_entry_d → o_orderdate,
                                 o_ol_cnt  → count(lineitems per order),
                                 o_carrier_id ∈ {1,2} → l_returnflag = 'R')
    customer  → customer

`o_ol_cnt` is a STORED column in TPC-C; deriving it makes the CH shapes
genuinely different from their TPC-H q-number siblings: a per-order
pre-aggregation feeds the outer GROUP BY (aggregate-of-aggregate), which
is the interesting planning case (two shuffle stages, the first keyed on
order id — Catalyst reuses the join exchange where possible).

Determinism: double aggregates use the exact-cents pattern
(`queries/util.py`); per-row round() is HALF_UP in both engines for
positive amounts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import o_msum, tables

_CUT = "1995-06-01"


@register(
    "ch_q1",
    oracle=f"""
SELECT l_linenumber,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice, 0) AS BIGINT)) AS BIGINT) AS sum_amount,
       round((CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT)/100.0)
             / count(*), 0) AS avg_qty,
       round((CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)/100.0)
             / count(*), 0) AS avg_amount,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate > DATE '{_CUT}'
GROUP BY l_linenumber ORDER BY l_linenumber
""",
)
def ch_q1(spark, sf_dir):
    """CH-benCHmark Q1 (`ch_benchmark/batch/q1.slt.part`): per-LINE-NUMBER
    pricing summary after a delivery-date cut — unlike TPC-H q1 the group
    key is ol_number (l_linenumber), a 7-value key with heavy per-group
    volume; the plan is scan → partial agg → 1 exchange → final agg."""
    li = tables(spark, sf_dir)["lineitem"].filter(F.col("l_shipdate") > F.lit(_CUT))
    qty_cents = F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")) / 100.0
    amt_cents = F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 100.0
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice"), 0).cast("long")).alias("sum_amount"),
            F.round(qty_cents / F.count(F.lit(1)), 0).alias("avg_qty"),
            F.round(amt_cents / F.count(F.lit(1)), 0).alias("avg_amount"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "ch_q4",
    oracle=f"""
WITH cnt AS (SELECT l_orderkey, count(*) AS ol_cnt FROM lineitem GROUP BY l_orderkey)
SELECT ol_cnt, count(*) AS order_count
FROM orders JOIN cnt ON o_orderkey = l_orderkey
WHERE o_orderdate >= DATE '1994-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate >= o_orderdate)
GROUP BY ol_cnt ORDER BY ol_cnt
""",
)
def ch_q4(spark, sf_dir):
    """CH-benCHmark Q4 (`q4.slt.part`): order counts grouped by the
    DERIVED per-order line count (TPC-C's stored o_ol_cnt), gated by a
    correlated EXISTS on delivery-after-entry — two aggregation levels
    plus a semi-join, all hash-keyed on the order id so the exchanges
    line up."""
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    cnt = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("ol_cnt"))
    o = t["orders"].filter(F.col("o_orderdate") >= F.lit("1994-01-01"))
    delivered = li.select("l_orderkey", "l_shipdate")
    o_ok = o.join(
        delivered,
        (o["o_orderkey"] == delivered["l_orderkey"])
        & (delivered["l_shipdate"] >= o["o_orderdate"]),
        "left_semi",
    )
    return (
        o_ok.join(cnt, o_ok["o_orderkey"] == cnt["l_orderkey"])
        .groupBy("ol_cnt")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("ol_cnt")
    )


@register(
    "ch_q6",
    oracle=f"""
SELECT {o_msum('l_extendedprice')} AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_quantity BETWEEN 1 AND 100000
""",
)
def ch_q6(spark, sf_dir):
    """CH-benCHmark Q6 (`q6.slt.part`): single-scalar revenue over a
    delivery-date + quantity band — both predicates push to the parquet
    scan (PushedFilters), the agg is a two-phase partial/final pair."""
    from risingwave_spark.queries.util import msum

    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_quantity").between(1, 100000)
        )
        .agg(msum("l_extendedprice").alias("revenue"))
    )


@register(
    "ch_q12",
    oracle="""
WITH cnt AS (SELECT l_orderkey, count(*) AS ol_cnt FROM lineitem GROUP BY l_orderkey)
SELECT ol_cnt,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey AND o_orderdate <= l_shipdate
JOIN cnt ON cnt.l_orderkey = o_orderkey
GROUP BY ol_cnt ORDER BY ol_cnt
""",
)
def ch_q12(spark, sf_dir):
    """CH-benCHmark Q12 (`q12.slt.part`): shipping-priority line counts
    grouped by the derived o_ol_cnt — the orders⋈lineitem join carries a
    non-equi entry≤delivery band, then a second join brings the per-order
    count in; all three hash on the order key (one exchange reused)."""
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    o = t["orders"]
    cnt = li.groupBy(F.col("l_orderkey").alias("c_ok")).agg(
        F.count(F.lit(1)).alias("ol_cnt")
    )
    j = o.join(
        li,
        (li["l_orderkey"] == o["o_orderkey"])
        & (o["o_orderdate"] <= li["l_shipdate"]),
    ).join(cnt, F.col("c_ok") == o["o_orderkey"])
    high = F.col("l_returnflag") == "R"
    return (
        j.groupBy("ol_cnt")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ol_cnt")
    )


@register(
    "ch_q18",
    oracle="""
SELECT c_name, o_orderkey, o_orderdate, ol_cnt, amount
FROM (
  SELECT c_name, o_orderkey, o_orderdate,
         count(*) AS ol_cnt,
         (CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)/100.0)
           AS amount
  FROM customer
  JOIN orders ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY c_name, o_orderkey, o_orderdate
) t WHERE amount > 400000.0
ORDER BY amount DESC, o_orderkey
""",
)
def ch_q18(spark, sf_dir):
    """CH-benCHmark Q18 (`q18.slt.part`): large-volume orders — customer
    ⋈ orders ⋈ lineitem, per-order aggregate, HAVING on the aggregated
    amount (the reference's `having sum(ol_amount) > 200`, threshold
    scaled to this data), ordered by amount."""
    t = tables(spark, sf_dir)
    j = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    amt = F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 100.0
    return (
        j.groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.count(F.lit(1)).alias("ol_cnt"), amt.alias("amount"))
        .filter(F.col("amount") > 400000.0)
        .orderBy(F.desc("amount"), "o_orderkey")
    )
