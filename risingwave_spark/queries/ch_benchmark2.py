"""CH-benCHmark completion — the ten queries missing after round 4
(q2, q5, q8, q10, q11, q13, q16, q17, q19, q20; reference
`e2e_test/ch_benchmark/batch/q{N}.slt.part`), plus MV-runtime variants
of representative CH shapes (`ch_benchmark/streaming/` runs every one
of these as CREATE MATERIALIZED VIEW).

Same fixed schema mapping as `ch_benchmark.py` (orderline → lineitem,
o_entry_d → o_orderdate, i_data/i_price → p_name/p_retailprice); the
TPC-C `stock` table has no testdata analog, so its role — per-(item,
warehouse) quantity rows keyed to a derived supplier — maps onto
lineitem's (l_partkey, l_suppkey, l_quantity) triples, which preserves
every operator shape (min-per-item subquery join, IN-with-HAVING,
count-distinct-supplier) while staying honest about the data.

Determinism: exact-cents sums, integral quantities cast to BIGINT,
ratio divisions done once over exact integers (see queries/util.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import o_msum, tables

_CUT = "1995-06-01"


@register(
    "ch_q2",
    oracle="""
WITH m AS (
  SELECT l_partkey AS m_pk, min(l_quantity) AS m_qty
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name LIKE 'EUROP%'
  GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name, n_name, p_partkey, p_name
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%s%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN m        ON l_partkey = m_pk AND l_quantity = m_qty
WHERE r_name LIKE 'EUROP%'
ORDER BY n_name, s_name, p_partkey
""",
)
def ch_q2(spark, sf_dir):
    """CH-benCHmark Q2 (`batch/q2.slt.part`): cheapest-source supplier per
    item — a min-per-item aggregate SUBQUERY joined back on (item, exact
    min quantity), the decorrelated-scalar-subquery shape. The min
    subquery and the outer probe share the same join tree; region/nation
    dims broadcast, and the min table (one row per part) broadcasts into
    the final match."""
    t = tables(spark, sf_dir)
    eu = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name").like("EUROP%"))),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    li_eu = t["lineitem"].join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
    m = li_eu.groupBy(F.col("l_partkey").alias("m_pk")).agg(
        F.min("l_quantity").alias("m_qty")
    )
    return (
        li_eu.join(
            t["part"].filter(F.col("p_name").like("%s%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(m),
            (F.col("l_partkey") == F.col("m_pk"))
            & (F.col("l_quantity") == F.col("m_qty")),
        )
        .select("s_suppkey", "s_name", "n_name", "p_partkey", "p_name")
        .distinct()
        .orderBy("n_name", "s_name", "p_partkey")
    )


@register(
    "ch_q5",
    oracle=f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND o_orderdate >= DATE '{_CUT}'
GROUP BY n_name ORDER BY revenue_cents DESC, n_name
""",
)
def ch_q5(spark, sf_dir):
    """CH-benCHmark Q5 (`batch/q5.slt.part`): regional revenue by
    supplier nation — unlike TPC-H q5 there is NO customer-nation =
    supplier-nation constraint (CH drops it), so the join tree is a
    plain 6-way chain: facts shuffle on their keys once, all three
    dimension legs broadcast."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate") >= F.lit(_CUT))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.desc("revenue_cents"), "n_name")
    )


@register(
    "ch_q8",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
       round(CAST(sum(CASE WHEN n2.n_name IN ('NATION_3', 'NATION_4')
                 THEN CAST(round(l_extendedprice*100,0) AS BIGINT) ELSE 0 END) AS BIGINT)
             * 1.0
             / CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT), 4)
         AS mkt_share
FROM lineitem
JOIN part      ON l_partkey = p_partkey AND p_partkey < 1000
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY l_year ORDER BY l_year
""",
)
def ch_q8(spark, sf_dir):
    """CH-benCHmark Q8 (`batch/q8.slt.part`): market share of two
    supplier nations per year — TWO nation aliases (customer-side under a
    region filter, supplier-side feeding the CASE), conditional-sum /
    total-sum over exact cents so the one division is bit-stable."""
    t = tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    share = F.sum(
        F.when(F.col("supp_nation").isin("NATION_3", "NATION_4"), cents).otherwise(
            F.lit(0)
        )
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_partkey") < 1000)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n1_reg") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").cast("long").alias("l_year"))
        .agg(F.round(share * 1.0 / F.sum(cents), 4).alias("mkt_share"))
        .orderBy("l_year")
    )


@register(
    "ch_q10",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '{_CUT}' AND o_orderdate <= l_shipdate
GROUP BY c_custkey, c_name, n_name
HAVING CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) > 0
ORDER BY revenue_cents DESC, c_custkey
""",
)
def ch_q10(spark, sf_dir):
    """CH-benCHmark Q10 (`batch/q10.slt.part`): per-customer revenue on
    orders entered before delivery (entry ≤ delivery — a NON-EQUI band
    riding the equi join), customer nation attached, HAVING over the
    aggregate."""
    t = tables(spark, sf_dir)
    li = t["lineitem"]
    o = t["orders"]
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("o_orderdate") <= F.col("l_shipdate")),
        )
        .filter(F.col("o_orderdate") >= F.lit(_CUT))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "revenue_cents"
            )
        )
        .filter(F.col("revenue_cents") > 0)
        .orderBy(F.desc("revenue_cents"), "c_custkey")
    )


@register(
    "ch_q11",
    oracle="""
WITH g AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) AS ordercount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, ordercount FROM g
WHERE ordercount > (SELECT sum(ordercount) * 0.005 FROM g)
ORDER BY ordercount DESC, l_partkey
""",
)
def ch_q11(spark, sf_dir):
    """CH-benCHmark Q11 (`batch/q11.slt.part`): important stock per item
    for one nation's suppliers, HAVING over a scalar fraction of the
    GLOBAL total — the 1-row threshold subquery broadcasts into a
    DynamicFilter-style compare (the reference feeds it as a 1-row
    stream, `dynamic_filter.rs:39`)."""
    t = tables(spark, sf_dir)
    g = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("ordercount"))
    )
    thr = g.agg((F.sum("ordercount") * 0.005).alias("thr"))
    return (
        g.join(F.broadcast(thr))
        .filter(F.col("ordercount") > F.col("thr"))
        .select("l_partkey", "ordercount")
        .orderBy(F.desc("ordercount"), "l_partkey")
    )


@register(
    "ch_q13",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority LIKE '1%'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def ch_q13(spark, sf_dir):
    """CH-benCHmark Q13 (`batch/q13.slt.part`): customer order-count
    distribution — LEFT OUTER join with the filter INSIDE the join
    condition (customers with zero qualifying orders must survive with
    count 0), then a second aggregation over the counts."""
    t = tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderpriority").like("1%"))
    counts = (
        t["customer"]
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "ch_q16",
    oracle="""
SELECT p_name, substr(p_type, 1, 3) AS brand, p_retailprice,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_name NOT LIKE '%red%'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_name, brand, p_retailprice
ORDER BY supplier_cnt DESC, p_name, p_retailprice
""",
)
def ch_q16(spark, sf_dir):
    """CH-benCHmark Q16 (`batch/q16.slt.part`): supplier count per item
    excluding flagged suppliers — NOT-LIKE pushdown on the item dim,
    NOT IN → left-anti against the flagged-supplier set (s_acctbal < 0
    stands in for the reference's su_comment LIKE '%bad%'; the slimmed
    supplier schema has no comment column), count(DISTINCT) on top."""
    t = tables(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(~F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy(
            "p_name",
            F.substring("p_type", 1, 3).alias("brand"),
            "p_retailprice",
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_name", "p_retailprice")
    )


@register(
    "ch_q17",
    oracle="""
WITH t AS (
  SELECT l_partkey AS t_pk,
         (CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT)/100.0)
           / count(*) AS a
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'MEDIUM'
  GROUP BY l_partkey
)
SELECT round((CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)/100.0)
             / 2.0, 0) AS avg_yearly
FROM lineitem JOIN t ON l_partkey = t_pk
WHERE l_quantity <= a
""",
)
def ch_q17(spark, sf_dir):
    """CH-benCHmark Q17 (`batch/q17.slt.part`): small-quantity-order
    revenue — per-item average-quantity subquery joined back with a
    below-average band (the avg computed as exact-cents sum / count, so
    the `quantity <= avg` comparison is bit-identical cross-engine)."""
    t = tables(spark, sf_dir)
    avg_q = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "MEDIUM")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("l_partkey").alias("t_pk"))
        .agg(
            (
                (F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")) / 100.0)
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(avg_q), F.col("l_partkey") == F.col("t_pk"))
        .filter(F.col("l_quantity") <= F.col("a"))
        .agg(
            F.round(
                (F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 100.0)
                / 2.0,
                0,
            ).alias("avg_yearly")
        )
    )


@register(
    "ch_q19",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_type = 'ECONOMY' AND l_quantity BETWEEN 1 AND 10
       AND p_retailprice BETWEEN 1 AND 400000 AND l_linenumber IN (1,2,3))
   OR (p_type = 'MEDIUM' AND l_quantity BETWEEN 1 AND 10
       AND p_retailprice BETWEEN 1 AND 400000 AND l_linenumber IN (1,2,4))
   OR (p_type = 'SMALL' AND l_quantity BETWEEN 1 AND 10
       AND p_retailprice BETWEEN 1 AND 400000 AND l_linenumber IN (1,5,3))
""",
)
def ch_q19(spark, sf_dir):
    """CH-benCHmark Q19 (`batch/q19.slt.part`): disjunctive three-branch
    band join — an equi join on the item key with an OR-of-conjunctions
    residual (each branch pairs an item filter with a lineitem filter);
    Catalyst keeps the equi key in the hash join and evaluates the OR as
    a post-join filter."""
    t = tables(spark, sf_dir)
    qty = F.col("l_quantity").between(1, 10)
    price = F.col("p_retailprice").between(1, 400000)
    branch = lambda ptype, lns: (  # noqa: E731
        (F.col("p_type") == ptype) & qty & price & F.col("l_linenumber").isin(lns)
    )
    cond = (
        branch("ECONOMY", [1, 2, 3])
        | branch("MEDIUM", [1, 2, 4])
        | branch("SMALL", [1, 5, 3])
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "revenue_cents"
            )
        )
    )


@register(
    "ch_q20",
    oracle=f"""
SELECT s_name FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%o%')
      AND l_shipdate > DATE '{_CUT}'
    GROUP BY l_partkey, l_suppkey
    HAVING 2 * max(l_quantity) > sum(l_quantity))
ORDER BY s_name
""",
)
def ch_q20(spark, sf_dir):
    """CH-benCHmark Q20 (`batch/q20.slt.part`): suppliers holding excess
    stock of matching items — a grouped HAVING subquery under an IN
    (left-semi), itself filtered by a second IN on the item dim (the
    reference's `2*s_quantity > sum(ol_quantity)` maps to the same
    excess-over-demand inequality on the lineitem grouping)."""
    t = tables(spark, sf_dir)
    items = t["part"].filter(F.col("p_name").like("%o%")).select("p_partkey")
    excess = (
        t["lineitem"]
        .filter(F.col("l_shipdate") > F.lit(_CUT))
        .join(F.broadcast(items), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.max("l_quantity").alias("mx"), F.sum("l_quantity").alias("tot"))
        .filter(2 * F.col("mx") > F.col("tot"))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------- MV variants
@register(
    "ch_mv_q1",
    oracle=f"""
SELECT l_linenumber,
       CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS amount_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate > DATE '{_CUT}' AND l_orderkey % 9 <> 0
GROUP BY l_linenumber ORDER BY l_linenumber
""",
)
def ch_mv_q1(spark, sf_dir):
    """CH-benCHmark Q1 THROUGH THE MV RUNTIME (reference
    `ch_benchmark/streaming/q1.slt.part` — the streaming suite runs every
    CH query as a CREATE MATERIALIZED VIEW): single-table retractable
    agg MV over the orderline stream, folded in two changelog rounds
    plus a delete round; hash-matched against the batch twin over the
    survivors (the reference's MV-vs-batch snapshot gate)."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_chmv1_"))
    eng.sql(
        f"""
        CREATE TABLE ch1_l (
            l_orderkey int8, l_linenumber int4, l_quantity float8,
            l_extendedprice float8, l_shipdate date,
            PRIMARY KEY (l_orderkey, l_linenumber)
        );
        CREATE MATERIALIZED VIEW ch1mv AS
        SELECT l_linenumber,
               sum(CAST(round(l_quantity,0) AS BIGINT)) AS sum_qty,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS amount_cents,
               count(*) AS count_order
        FROM ch1_l WHERE l_shipdate > DATE '{_CUT}'
        GROUP BY l_linenumber
        """
    )
    sel = (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate "
        "FROM lineitem"
    )
    eng.sql(f"INSERT INTO ch1_l {sel} WHERE l_orderkey % 2 = 0")
    eng.sql(f"INSERT INTO ch1_l {sel} WHERE l_orderkey % 2 = 1")
    eng.sql("DELETE FROM ch1_l WHERE l_orderkey % 9 = 0")
    return eng.sql(
        "SELECT l_linenumber, sum_qty, amount_cents, count_order FROM ch1mv "
        "ORDER BY l_linenumber"
    )


@register(
    "ch_mv_q6",
    oracle=f"""
SELECT 1 AS g,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate > DATE '{_CUT}' AND l_quantity BETWEEN 1 AND 100000
  AND l_orderkey % 9 <> 0
""",
)
def ch_mv_q6(spark, sf_dir):
    """CH-benCHmark Q6 as a GLOBAL-aggregate MV (streaming suite
    `q6.slt.part` — the reference's SimpleAgg executor: one group, value
    state): the SQL surface expresses the single group as a constant
    derived key; retractions (the delete round) fold the sum back
    down."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_chmv6_"))
    eng.sql(
        f"""
        CREATE TABLE ch6_l (
            l_orderkey int8, l_linenumber int4, l_quantity float8,
            l_extendedprice float8, l_shipdate date,
            PRIMARY KEY (l_orderkey, l_linenumber)
        );
        CREATE MATERIALIZED VIEW ch6mv AS
        SELECT 1 AS g,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS revenue_cents
        FROM ch6_l
        WHERE l_shipdate > DATE '{_CUT}' AND l_quantity BETWEEN 1 AND 100000
        GROUP BY 1
        """
    )
    sel = (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate "
        "FROM lineitem"
    )
    eng.sql(f"INSERT INTO ch6_l {sel} WHERE l_orderkey % 2 = 0")
    eng.sql(f"INSERT INTO ch6_l {sel} WHERE l_orderkey % 2 = 1")
    eng.sql("DELETE FROM ch6_l WHERE l_orderkey % 9 = 0")
    return eng.sql("SELECT g, revenue_cents FROM ch6mv")


@register(
    "ch_mv_q3",
    oracle=f"""
SELECT o_orderkey,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM (SELECT * FROM customer WHERE c_custkey % 5 <> 0) c
JOIN (SELECT * FROM orders WHERE o_orderkey % 7 <> 0) o ON c_custkey = o_custkey
JOIN (SELECT * FROM lineitem WHERE l_linenumber <> 2) l ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate > DATE '{_CUT}'
GROUP BY o_orderkey ORDER BY o_orderkey
""",
)
def ch_mv_q3(spark, sf_dir):
    """CH-benCHmark Q3 as a THREE-WAY stream-stream join MV (streaming
    suite `q3.slt.part`: customer ⋈ orders ⋈ orderline, all three
    changelogs — compiled onto the left-deep StreamJoinChainMv through
    the SQL front door): per-order revenue with filters on both dims,
    deletes on ALL THREE tables propagate through the chain."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_chmv3_"))
    eng.sql(
        f"""
        CREATE TABLE ch3_c (c_custkey int8 PRIMARY KEY, c_mktsegment text);
        CREATE TABLE ch3_o (o_orderkey int8 PRIMARY KEY, o_custkey int8, o_orderdate date);
        CREATE TABLE ch3_l (
            l_orderkey int8, l_linenumber int4, l_extendedprice float8,
            PRIMARY KEY (l_orderkey, l_linenumber)
        );
        CREATE MATERIALIZED VIEW ch3mv AS
        SELECT o.o_orderkey,
               sum(CAST(round(l.l_extendedprice*100,0) AS BIGINT)) AS revenue_cents
        FROM ch3_c c JOIN ch3_o o ON c.c_custkey = o.o_custkey
        JOIN ch3_l l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate > DATE '{_CUT}'
        GROUP BY o.o_orderkey
        """
    )
    eng.sql("INSERT INTO ch3_c SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0")
    eng.sql("INSERT INTO ch3_o SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE o_orderkey % 2 = 0")
    eng.sql("INSERT INTO ch3_l SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 0")
    eng.sql("INSERT INTO ch3_c SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 1")
    eng.sql("INSERT INTO ch3_o SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE o_orderkey % 2 = 1")
    eng.sql("INSERT INTO ch3_l SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_orderkey % 2 = 1")
    eng.sql("DELETE FROM ch3_c WHERE c_custkey % 5 = 0")
    eng.sql("DELETE FROM ch3_o WHERE o_orderkey % 7 = 0")
    eng.sql("DELETE FROM ch3_l WHERE l_linenumber = 2")
    return eng.sql("SELECT o_orderkey, revenue_cents FROM ch3mv ORDER BY o_orderkey")


@register(
    "ch_mv_q14",
    oracle="""
SELECT 1 AS g,
       CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                THEN CAST(round(l_extendedprice*100,0) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_orderkey % 7 <> 0
""",
)
def ch_mv_q14(spark, sf_dir):
    """CH-benCHmark Q14 (promo revenue share,
    `ch_benchmark/streaming/q14.slt.part`) as a TWO-SIDED stream-stream
    JOIN MV through the SQL surface: orderline and item are both engine
    tables (deletes on the fact side retract through the join's
    changelog into the global agg); the promo share's two sums are
    exact-cents so the MV hash-matches its batch twin."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_chmv14_"))
    eng.sql(
        """
        CREATE TABLE ch14_i (p_id int8 PRIMARY KEY, p_kind text);
        CREATE TABLE ch14_l (
            ol_okey int8, ol_ln int4, ol_item int8, ol_price float8,
            PRIMARY KEY (ol_okey, ol_ln)
        );
        CREATE MATERIALIZED VIEW ch14mv AS
        SELECT 1 AS g,
               sum(CASE WHEN p_kind LIKE 'PROMO%'
                   THEN CAST(round(ol_price*100,0) AS BIGINT)
                   ELSE 0 END) AS promo_cents,
               sum(CAST(round(ol_price*100,0) AS BIGINT)) AS total_cents
        FROM ch14_l JOIN ch14_i ON ol_item = p_id
        GROUP BY g
        """
    )
    eng.sql("INSERT INTO ch14_i SELECT p_partkey, p_type FROM part")
    sel = "SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice FROM lineitem"
    eng.sql(f"INSERT INTO ch14_l {sel} WHERE l_orderkey % 2 = 0")
    eng.sql(f"INSERT INTO ch14_l {sel} WHERE l_orderkey % 2 = 1")
    eng.sql("DELETE FROM ch14_l WHERE ol_okey % 7 = 0")
    return eng.sql("SELECT g, promo_cents, total_cents FROM ch14mv")


@register(
    "ch_mv_q18",
    oracle="""
SELECT c_name, o_orderkey, count(*) AS n_lines,
       CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey % 5 <> 0
GROUP BY c_name, o_orderkey
HAVING sum(CAST(round(l_quantity,0) AS BIGINT)) > 120
ORDER BY c_name, o_orderkey
""",
)
def ch_mv_q18(spark, sf_dir):
    """CH-benCHmark Q18 (large orders,
    `ch_benchmark/streaming/q18.slt.part`) as a THREE-WAY stream-stream
    join MV with GROUP BY + HAVING through the SQL surface: the
    left-deep changelog cascade (orders → customer → orderline) feeds a
    group-agg level whose HAVING threshold groups appear/disappear as
    order lines arrive and retract."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_chmv18_"))
    eng.sql(
        """
        CREATE TABLE ch18_o (o_id int8 PRIMARY KEY, o_cid int8);
        CREATE TABLE ch18_c (c_id int8 PRIMARY KEY, c_nm text);
        CREATE TABLE ch18_l (
            l_okey int8, l_ln int4, l_qty float8,
            PRIMARY KEY (l_okey, l_ln)
        );
        CREATE MATERIALIZED VIEW ch18mv AS
        SELECT c_nm, o_id, count(*) AS n_lines,
               sum(CAST(round(l_qty,0) AS BIGINT)) AS total_qty
        FROM ch18_o
        JOIN ch18_c ON o_cid = c_id
        JOIN ch18_l ON l_okey = o_id
        GROUP BY c_nm, o_id
        HAVING sum(CAST(round(l_qty,0) AS BIGINT)) > 120
        """
    )
    eng.sql("INSERT INTO ch18_c SELECT c_custkey, c_name FROM customer")
    eng.sql("INSERT INTO ch18_o SELECT o_orderkey, o_custkey FROM orders")
    sel = "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
    eng.sql(f"INSERT INTO ch18_l {sel} WHERE l_orderkey % 2 = 0")
    eng.sql(f"INSERT INTO ch18_l {sel} WHERE l_orderkey % 2 = 1")
    eng.sql("DELETE FROM ch18_o WHERE o_id % 5 = 0")
    return eng.sql(
        "SELECT c_nm AS c_name, o_id AS o_orderkey, n_lines, total_qty "
        "FROM ch18mv ORDER BY c_name, o_orderkey"
    )


@register(
    "ch_mv_q9",
    oracle="""
SELECT p_brand, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS rev_cents
FROM (SELECT * FROM part WHERE p_partkey % 4 <> 0) p
JOIN (SELECT * FROM lineitem WHERE l_linenumber <> 3) l ON p_partkey = l_partkey
JOIN (SELECT * FROM supplier WHERE s_suppkey % 11 <> 0) s ON l_suppkey = s_suppkey
JOIN (SELECT * FROM orders WHERE o_orderkey % 6 <> 0) o ON l_orderkey = o_orderkey
GROUP BY p_brand ORDER BY p_brand
""",
)
def ch_mv_q9(spark, sf_dir):
    """CH-benCHmark Q9 shape as a FOUR-way stream-stream join MV
    (streaming suite `q9.slt.part`: part ⋈ orderline ⋈ supplier ⋈
    orders, every input a changelog — the deepest left-deep
    StreamJoinChainMv exercised through the SQL front door): per-brand
    revenue; the delete round hits ALL FOUR tables and each retraction
    cascades through three join levels into the agg."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_chmv9_"))
    eng.sql(
        """
        CREATE TABLE ch9_p (p_partkey int8 PRIMARY KEY, p_brand text);
        CREATE TABLE ch9_l (
            l_orderkey int8, l_linenumber int4, l_partkey int8,
            l_suppkey int8, l_extendedprice float8,
            PRIMARY KEY (l_orderkey, l_linenumber)
        );
        CREATE TABLE ch9_s (s_suppkey int8 PRIMARY KEY, s_name text);
        CREATE TABLE ch9_o (o_orderkey int8 PRIMARY KEY, o_orderdate date);
        CREATE MATERIALIZED VIEW ch9mv AS
        SELECT p_brand, count(*) AS n,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS rev_cents
        FROM ch9_p
        JOIN ch9_l ON p_partkey = l_partkey
        JOIN ch9_s ON l_suppkey = s_suppkey
        JOIN ch9_o ON l_orderkey = o_orderkey
        GROUP BY p_brand
        """
    )
    eng.sql("INSERT INTO ch9_p SELECT p_partkey, p_brand FROM part")
    eng.sql("INSERT INTO ch9_s SELECT s_suppkey, s_name FROM supplier")
    sel = (
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        "l_extendedprice FROM lineitem"
    )
    eng.sql(f"INSERT INTO ch9_l {sel} WHERE l_orderkey % 2 = 0")
    eng.sql("INSERT INTO ch9_o SELECT o_orderkey, o_orderdate FROM orders")
    eng.sql(f"INSERT INTO ch9_l {sel} WHERE l_orderkey % 2 = 1")
    # retraction round on every input
    eng.sql("DELETE FROM ch9_p WHERE p_partkey % 4 = 0")
    eng.sql("DELETE FROM ch9_l WHERE l_linenumber = 3")
    eng.sql("DELETE FROM ch9_s WHERE s_suppkey % 11 = 0")
    eng.sql("DELETE FROM ch9_o WHERE o_orderkey % 6 = 0")
    return eng.sql("SELECT p_brand, n, rev_cents FROM ch9mv ORDER BY p_brand")
