"""TPC-H-style batch query suite, adapted to the driver's slimmed star schema
(no partsupp; no l_commitdate/l_receiptdate; see FIXTURES.md).

Reference coverage: the reference runs TPC-H q1-q22 as both batch and
streaming correctness suites (`e2e_test/batch/tpch.slt`,
`e2e_test/streaming/tpch/` in /root/reference). These exercise the batch
operator inventory of SURVEY.md §2.1: scan, filter, project, hash agg,
hash join (inner/outer/semi/anti), nested-loop join, sort, top-n, limit.

Scale notes (100 TB posture): every query is declarative DataFrame API —
Catalyst does pushdown/pruning/join-ordering; fixed-cardinality dims
(region/nation) are explicitly broadcast, larger dims are left to AQE;
aggregates are partial-agg friendly (no collect/driver loops anywhere).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import mavg, msum, o_mavg, o_msum, tables

def _rev():
    # lazy: F.col needs an active SparkContext in classic mode
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REV = "l_extendedprice*(1-l_discount)"


@register(
    "tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {o_msum('l_quantity')} AS sum_qty,
       {o_msum('l_extendedprice')} AS sum_base_price,
       {o_msum(_O_REV)} AS sum_disc_price,
       {o_msum(_O_REV + '*(1+l_tax)')} AS sum_charge,
       {o_mavg('l_quantity')} AS avg_qty,
       {o_mavg('l_extendedprice')} AS avg_price,
       {o_mavg('l_discount', 1000000)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark, sf_dir):
    """Pricing summary: scan → filter → hash agg → sort.

    Parity: batch HashAgg (`src/batch/executors/src/executor/hash_agg.rs:79`),
    Filter (`filter.rs:28`), Sort (`order_by.rs:51`) in the reference.
    """
    t = tables(spark, sf_dir)
    charge = _rev() * (1 + F.col("l_tax"))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            msum("l_quantity").alias("sum_qty"),
            msum("l_extendedprice").alias("sum_base_price"),
            msum(_rev()).alias("sum_disc_price"),
            msum(charge).alias("sum_charge"),
            mavg("l_quantity").alias("avg_qty"),
            mavg("l_extendedprice").alias("avg_price"),
            mavg("l_discount", 1000000).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3",
    oracle=f"""
SELECT l_orderkey, {o_msum(_O_REV)} AS revenue, o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3(spark, sf_dir):
    """Shipping priority: 3-way hash join → agg → top-n.

    Parity: HashJoin (`join/hash_join.rs:62`) + TopN (`top_n.rs:37`).
    """
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].filter(F.col("o_orderdate") < "1998-03-15"), F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_shipdate") > "1998-03-15"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(msum(_rev()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q4",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def tpch_q4(spark, sf_dir):
    """Order priority check: left-semi join (EXISTS) with extra condition.

    Parity: HashJoin LeftSemi (`join/mod.rs:38-54`).
    """
    t = tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    return (
        o.join(
            t["lineitem"],
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q5",
    oracle=f"""
SELECT n_name, {o_msum(_O_REV)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
""",
)
def tpch_q5(spark, sf_dir):
    """Local supplier volume: 6-way join with broadcast dims.

    Parity: multi-way HashJoin + join-ordering rules
    (`rule/left_deep_tree_join_ordering_rule.rs` in the reference);
    Spark: Catalyst/AQE reorders, region+nation broadcast.
    """
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(msum(_rev()).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@register(
    "tpch_q6",
    oracle=f"""
SELECT {o_msum('l_extendedprice*l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def tpch_q6(spark, sf_dir):
    """Forecast revenue change: pushed-down filter + global agg (no group)."""
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(msum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "tpch_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {o_msum(_O_REV)} AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7(spark, sf_dir):
    """Volume shipping between two nations: self-joined dim, year extract."""
    t = tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["supplier"]
        .join(
            t["lineitem"].filter(
                (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(msum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q9",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {o_msum(_O_REV + ' - p_retailprice*l_quantity*0.1')} AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
ORDER BY n_name, o_year DESC
""",
)
def tpch_q9(spark, sf_dir):
    """Product-type profit (adapted: no partsupp → retailprice-based cost)."""
    t = tables(spark, sf_dir)
    amount = _rev() - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    return (
        t["part"]
        .filter(F.col("p_name").like("%red%"))
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(msum(amount).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name, {o_msum(_O_REV)} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10(spark, sf_dir):
    """Returned-item reporting: join + agg + top 20."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(msum(_rev()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13(spark, sf_dir):
    """Customer order-count distribution: left outer join + two-level agg."""
    t = tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14",
    oracle=f"""
SELECT 100.00 * {o_msum("CASE WHEN p_type = 'ECONOMY' THEN " + _O_REV + " ELSE 0 END")}
       / {o_msum(_O_REV)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def tpch_q14(spark, sf_dir):
    """Promotion effect: conditional aggregation ratio."""
    t = tables(spark, sf_dir)
    promo = F.when(F.col("p_type") == "ECONOMY", _rev()).otherwise(F.lit(0))
    return (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01"))
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * msum(promo) / msum(_rev())).alias("promo_revenue"))
    )


@register(
    "tpch_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {o_msum(_O_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def tpch_q15(spark, sf_dir):
    """Top supplier: CTE + scalar-subquery max (MaxOneRow parity,
    `max_one_row.rs:23`). Exact-cents revenue makes the equality safe."""
    t = tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(msum(_rev()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17",
    oracle=f"""
SELECT {o_msum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue: correlated scalar subquery → join with
    per-key aggregate (integer-valued quantities sum exactly → avg is
    order-independent)."""
    t = tables(spark, sf_dir)
    avg_qty = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((F.lit(0.2) * (F.sum("l_quantity") / F.count("l_quantity"))).alias("qty_limit"))
    )
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_brand") == "Brand#2"), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg((msum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def tpch_q18(spark, sf_dir):
    """Large-volume customers: IN-subquery (semi join) over HAVING agg."""
    t = tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q19",
    oracle=f"""
SELECT {o_msum(_O_REV)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def tpch_q19(spark, sf_dir):
    """Discounted revenue: OR-of-ANDs predicate (disjunctive join filter)."""
    t = tables(spark, sf_dir)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#2") & sz.between(1, 15) & q.between(1, 21))
        | ((br == "Brand#17") & sz.between(1, 25) & q.between(10, 30))
        | ((br == "Brand#25") & sz.between(1, 35) & q.between(20, 40))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(msum(_rev()).alias("revenue"))
    )


@register(
    "tpch_q20",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'blue%'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 100
)
ORDER BY s_name
""",
)
def tpch_q20(spark, sf_dir):
    """Potential part promotion: nested semi-join over grouped HAVING."""
    t = tables(spark, sf_dir)
    shippers = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(t["part"].filter(F.col("p_name").like("blue%")), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100)
    )
    return (
        t["supplier"]
        .join(shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def tpch_q21(spark, sf_dir):
    """Suppliers-kept-waiting (adapted): semi + anti correlated EXISTS pair."""
    t = tables(spark, sf_dir)
    l1 = t["lineitem"].filter(F.col("l_returnflag") == "R")
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey"))
    )
    return (
        t["supplier"]
        .join(l1, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"].filter(F.col("o_orderstatus") == "F"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey")) & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey")) & (F.col("l3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "tpch_q22",
    oracle="""
SELECT cntrycode, count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT)/100.0 AS totacctbal
FROM (
  SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
) t
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def tpch_q22(spark, sf_dir):
    """Global sales opportunity: scalar subquery + anti join.

    Note: the scalar avg(c_acctbal) is a double sum whose order differs per
    engine, but it only gates a comparison against values ~1e3 apart —
    boundary collisions are practically impossible.
    """
    t = tables(spark, sf_dir)
    c = t["customer"]
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            t["orders"].filter(F.col("o_orderdate") >= "2000-01-01"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy((F.col("c_custkey") % 10).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            msum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "tpch_q2",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS ps_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT ps.l_partkey AS partkey, ps.ps_cost, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON ps.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM part JOIN eu ON p_partkey = eu.partkey
WHERE p_size = 15 AND p_type = 'STANDARD'
  AND ps_cost = (SELECT min(e2.ps_cost) FROM eu e2 WHERE e2.partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2(spark, sf_dir):
    """Minimum-cost supplier (adapted: unit price over lineitem stands in
    for partsupp.ps_supplycost — the driver schema has no partsupp).

    Plan shape parity with reference q2: multi-way join + correlated
    scalar-subquery-on-aggregate (MaxOneRow, `max_one_row.rs:23`),
    realized as a per-part min re-join. region/nation are broadcast.
    """
    t = tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_cost"))
    )
    eu = (
        ps.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("l_partkey").alias("partkey"), "ps_cost", "s_acctbal", "s_name", "n_name")
    )
    # per-part min via a window over the (already filtered-down) joined
    # rows — ONE pass over eu instead of aggregate + re-join, which would
    # evaluate the whole lineitem aggregation subtree twice
    from pyspark.sql import Window as W

    w = W.partitionBy("partkey")
    return (
        t["part"]
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .join(eu, F.col("p_partkey") == F.col("partkey"))
        .withColumn("min_cost", F.min("ps_cost").over(w))
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q8",
    oracle=f"""
SELECT o_year,
       round({o_msum("CASE WHEN sup_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {o_msum('volume')}, 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS sup_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) v
GROUP BY o_year ORDER BY o_year
""",
)
def tpch_q8(spark, sf_dir):
    """National market share: 8-way join, conditional-agg ratio per year.

    Parity: the deepest join tree in the reference suite (join-order
    rules `merge_multijoin_rule.rs`); here Catalyst/AQE order it.
    Both msum legs are exact-cents, so the ratio is deterministic.
    """
    t = tables(spark, sf_dir)
    v = (
        t["part"]
        .filter(F.col("p_type") == "ECONOMY")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            t["orders"].filter(
                F.col("o_orderdate").between("1995-01-01", "1996-12-31")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"].select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .join(
            F.broadcast(t["nation"].select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("sup_nation"))),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            (_rev()).alias("volume"),
            "sup_nation",
        )
    )
    return (
        v.groupBy("o_year")
        .agg(
            F.round(
                msum(F.when(F.col("sup_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / msum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q11",
    oracle=f"""
WITH natps AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT l_partkey AS ps_partkey, {o_msum('val')} AS part_value
FROM natps
GROUP BY l_partkey
HAVING {o_msum('val')} > (SELECT {o_msum('val')} * 0.0001 FROM natps)
ORDER BY part_value DESC, ps_partkey
""",
)
def tpch_q11(spark, sf_dir):
    """Important stock (adapted: l_extendedprice*l_quantity stands in for
    ps_supplycost*ps_availqty): group agg filtered against a global scalar
    aggregate — the reference plans this as a DynamicFilter
    (`dynamic_filter.rs:39`); here a broadcast 1-row crossJoin.
    """
    t = tables(spark, sf_dir)
    natps = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("val"))
    )
    per_part = natps.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        msum("val").alias("part_value")
    )
    total = natps.agg((msum("val") * 0.0001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@register(
    "tpch_q12",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def tpch_q12(spark, sf_dir):
    """Shipping-mode priority (adapted: l_returnflag stands in for
    l_shipmode; the driver schema has no shipmode/commitdate).
    Join + conditional counts — map-side partial agg keeps the shuffle at
    group-key cardinality.
    """
    t = tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(
            t["lineitem"].filter(
                (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_q16(spark, sf_dir):
    """Supplier counts by part attributes (adapted: negative account
    balance stands in for the 'Customer Complaints' supplier exclusion).

    Parity: NOT IN → anti join (`join/mod.rs:38-54` left anti) + distinct
    aggregation (`aggregation/distinct.rs:31`).
    """
    t = tables(spark, sf_dir)
    return (
        t["part"]
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(
            t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
