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


@register(
    "ch_q3",
    oracle=f"""
SELECT l_orderkey, o_orderdate,
       round((CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)/100.0), 0) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate > DATE '{_CUT}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate
""",
)
def ch_q3(spark, sf_dir):
    """CH-benCHmark Q3 (`ch_benchmark/batch/q3.slt.part`): unshipped-order
    revenue per ORDER (group key = the join key itself, unlike TPC-H q3's
    top-10) — the per-order aggregate reuses the join's hash partitioning,
    so Catalyst plans ONE exchange for join + group."""
    t = tables(spark, sf_dir)
    rev = F.round(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 100.0, 0
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate") > F.lit(_CUT))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate")
    )


@register(
    "ch_q7",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
GROUP BY n1.n_name, n2.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def ch_q7(spark, sf_dir):
    """CH-benCHmark Q7 (`batch/q7.slt.part`): supplier-nation ×
    customer-nation × year volume — TWO aliases of the nation dim in one
    plan (both broadcast); unlike TPC-H q7 there is no nation-pair filter,
    the full matrix aggregates."""
    t = tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "revenue_cents"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "ch_q9",
    oracle="""
SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS amount_cents
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%re%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY n_name, l_year
ORDER BY n_name, l_year DESC
""",
)
def ch_q9(spark, sf_dir):
    """CH-benCHmark Q9 (`batch/q9.slt.part`): product-profit rollup by
    nation × year with an item-name LIKE filter — same shape as the
    reference's i_data LIKE; no partsupp in the CH schema so the cost
    term drops, making the name-filtered part join the selective edge."""
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").like("%re%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("l_year"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "amount_cents"
            )
        )
        .orderBy("n_name", F.desc("l_year"))
    )


@register(
    "ch_q14",
    oracle=f"""
SELECT round(
  100.0 * (CAST(sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(round(l_extendedprice*100,0) AS BIGINT) ELSE 0 END) AS BIGINT))
  / (CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate > DATE '{_CUT}'
""",
)
def ch_q14(spark, sf_dir):
    """CH-benCHmark Q14 (`batch/q14.slt.part`): promo revenue share — a
    conditional aggregate pair over one join, one output row (the
    reference's i_data LIKE 'PR%' maps to the PROMO p_type); both sums
    exact-cents so the single division is bit-identical cross-engine."""
    t = tables(spark, sf_dir)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > F.lit(_CUT))
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * promo / F.sum(cents), 4).alias("promo_revenue"))
    )


@register(
    "ch_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem WHERE l_shipdate >= DATE '{_CUT}' GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_cents = (SELECT max(total_cents) FROM revenue)
ORDER BY s_suppkey
""",
)
def ch_q15(spark, sf_dir):
    """CH-benCHmark Q15 (`batch/q15.slt.part`): top supplier via the
    revenue view + scalar-subquery max (MaxOneRow) — the view is shared
    between the join input and the subquery, the plan-reuse case."""
    t = tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= F.lit(_CUT))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "total_cents"
            )
        )
    )
    mx = revenue.agg(F.max("total_cents").alias("m"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_cents") == F.col("m"))
        .select("s_suppkey", "s_name", "total_cents")
        .orderBy("s_suppkey")
    )


@register(
    "ch_q21",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
GROUP BY s_name ORDER BY numwait DESC, s_name
""",
)
def ch_q21(spark, sf_dir):
    """CH-benCHmark Q21 (`batch/q21.slt.part`): suppliers who shipped
    after the order entry date on multi-supplier orders — a correlated
    EXISTS against the same fact table (left-semi self-join keyed on the
    order, with the supplier-inequality residual)."""
    t = tables(spark, sf_dir)
    l1 = t["lineitem"].select(
        F.col("l_orderkey").alias("l1_ok"),
        F.col("l_suppkey").alias("l1_sk"),
        F.col("l_shipdate").alias("l1_ship"),
    )
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    late = (
        l1.join(t["orders"], F.col("l1_ok") == F.col("o_orderkey"))
        .filter(F.col("l1_ship") > F.col("o_orderdate"))
        .join(
            l2,
            (F.col("l2_ok") == F.col("l1_ok")) & (F.col("l2_sk") != F.col("l1_sk")),
            "left_semi",
        )
    )
    return (
        late.join(t["supplier"], F.col("l1_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "ch_q22",
    oracle="""
SELECT CAST(c_custkey % 10 AS BIGINT) AS country_code,
       count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer
WHERE c_acctbal > (
        SELECT (CAST(sum(CAST(round(c_acctbal*10000,0) AS BIGINT)) AS BIGINT)/10000.0)
               / count(*)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY country_code ORDER BY country_code
""",
)
def ch_q22(spark, sf_dir):
    """CH-benCHmark Q22 (`batch/q22.slt.part`): dormant high-balance
    customers per country code (the phone-prefix maps to c_custkey % 10
    under this synthetic schema) — scalar-subquery average (exact
    scaled-sum / count), anti-join against orders, then group."""
    t = tables(spark, sf_dir)
    pos = t["customer"].filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        (
            (F.sum(F.round(F.col("c_acctbal") * 10000, 0).cast("long")) / 10000.0)
            / F.count(F.lit(1))
        ).alias("a")
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("long").alias("country_code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias(
                "totacctbal_cents"
            ),
        )
        .orderBy("country_code")
    )


@register(
    "ch_q12_mv",
    oracle=f"""
SELECT o_orderpriority, count(*) AS n_late
FROM (SELECT * FROM orders WHERE o_orderkey % 5 <> 0) o
JOIN (SELECT * FROM lineitem WHERE l_linenumber <> 3) l
  ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > DATE '{_CUT}'
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def ch_q12_mv(spark, sf_dir):
    """CH-benCHmark Q12 as a STREAMING MV (reference
    `ch_benchmark/streaming/q12.slt.part` — every CH streaming query is a
    CREATE MATERIALIZED VIEW over multi-way stream joins): orders ⋈
    lineitem with BOTH sides engine tables (true stream-stream join,
    compiled onto RetractableStreamJoin through the SQL front door),
    group key from the dimension side, composite lineitem pk, deletes on
    both sides. The maintained MV equals the batch query over the
    survivors."""
    import tempfile

    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_ch12mv_"))
    eng.sql(
        f"""
        CREATE TABLE ch12_o (o_orderkey int8 PRIMARY KEY, o_orderpriority text);
        CREATE TABLE ch12_l (
            l_orderkey int8, l_linenumber int4, l_shipdate date,
            PRIMARY KEY (l_orderkey, l_linenumber)
        );
        CREATE MATERIALIZED VIEW ch12mv AS
        SELECT o.o_orderpriority, count(*) AS n_late
        FROM ch12_l l JOIN ch12_o o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > DATE '{_CUT}'
        GROUP BY o.o_orderpriority
        """
    )
    eng.sql("INSERT INTO ch12_o SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0")
    eng.sql("INSERT INTO ch12_l SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem WHERE l_orderkey % 2 = 0")
    eng.sql("INSERT INTO ch12_o SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 2 = 1")
    eng.sql("INSERT INTO ch12_l SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem WHERE l_orderkey % 2 = 1")
    eng.sql("DELETE FROM ch12_o WHERE o_orderkey % 5 = 0")
    eng.sql("DELETE FROM ch12_l WHERE l_linenumber = 3")
    return eng.sql(
        "SELECT o_orderpriority, n_late FROM ch12mv ORDER BY o_orderpriority"
    )
