"""CH-benCHmark THROUGH THE MV RUNTIME, completion — the reference runs
every CH query as a materialized view (`e2e_test/ch_benchmark/streaming/
q1-q22.slt.part`); `ch_benchmark2.py` proved 7 of them, this module adds
the remaining 15 (q2, q4, q5, q7, q8, q10, q11, q13, q15, q16, q17,
q19, q20, q21, q22), reusing the batch suite's fixed schema mapping
(`ch_benchmark.py` — orderline → lineitem etc.) and the shared TPC-H MV
fold harness (`tpch_mv._tpch_eng`: same tables, same survivor moduli,
same retraction rounds). Each MV compiles through the SQL front door —
comma joins, stacked views, correlated/uncorrelated subqueries — and
hash-matches its DuckDB batch twin over the survivors.
"""

from __future__ import annotations

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.tpch_mv import (
    SURV_C,
    SURV_L,
    SURV_O,
    _tpch_eng,
    surv_l,
    surv_o,
)

_CUT = "1995-06-01"


@register(
    "ch_mv_q2",
    oracle=f"""
WITH m AS (
  SELECT l_partkey AS m_pk, min(l_quantity) AS m_qty
  FROM {surv_l(2)} l
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name LIKE 'EUROP%'
  GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name, n_name, p_partkey, p_name
FROM {surv_l(2)} l
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%s%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN m        ON l_partkey = m_pk AND l_quantity = m_qty
WHERE r_name LIKE 'EUROP%'
ORDER BY n_name, s_name, p_partkey
""",
)
def ch_mv_q2(spark, sf_dir):
    """CH Q2 through the MV runtime (reference `streaming/q2.slt.part`:
    cheapest-source supplier via a min-per-item derived table): the m
    view is a stacked chain-agg MV feeding the outer comma join as a
    join input with BOTH the item key and the exact-min quantity as
    equi keys; SELECT DISTINCT rewrites onto the group-agg level."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv2_",
        ["lineitem", "part", "supplier", "nation", "region"],
        """
        CREATE MATERIALIZED VIEW chm2m AS
        select l_partkey as m_pk, min(l_quantity) as m_qty
        from lineitem, supplier, nation, region
        where l_suppkey = s_suppkey
          and s_nationkey = n_nationkey
          and n_regionkey = r_regionkey
          and r_name like 'EUROP%'
        group by m_pk;
        CREATE MATERIALIZED VIEW chm2 AS
        select distinct s_suppkey, s_name, n_name, p_partkey, p_name
        from lineitem, part, supplier, nation, region, chm2m
        where p_partkey = l_partkey
          and p_name like '%s%'
          and l_suppkey = s_suppkey
          and s_nationkey = n_nationkey
          and n_regionkey = r_regionkey
          and r_name like 'EUROP%'
          and l_partkey = m_pk
          and l_quantity = m_qty
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql(
        "SELECT s_suppkey, s_name, n_name, p_partkey, p_name FROM chm2 "
        "ORDER BY n_name, s_name, p_partkey"
    )


@register(
    "ch_mv_q4",
    oracle=f"""
WITH cnt AS (SELECT l_orderkey, count(*) AS ol_cnt FROM {SURV_L} l GROUP BY l_orderkey)
SELECT ol_cnt, count(*) AS order_count
FROM {SURV_O} o JOIN cnt ON o_orderkey = cnt.l_orderkey
WHERE o_orderdate >= DATE '1994-01-01'
  AND EXISTS (SELECT 1 FROM {SURV_L} l2
              WHERE l2.l_orderkey = o_orderkey AND l2.l_shipdate >= o_orderdate)
GROUP BY ol_cnt ORDER BY ol_cnt
""",
)
def ch_mv_q4(spark, sf_dir):
    """CH Q4 through the MV runtime (reference `streaming/q4.slt.part`:
    order counts by the DERIVED per-order line count, gated by a
    correlated EXISTS): the ol_cnt view is a stacked agg MV whose key
    is the chain's group key, and the EXISTS desugars onto a semi step
    with the delivery-after-entry residual."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv4_",
        ["orders", "lineitem"],
        """
        CREATE MATERIALIZED VIEW chm4cnt AS
        select l_orderkey, count(*) as ol_cnt from lineitem group by l_orderkey;
        CREATE MATERIALIZED VIEW chm4 AS
        select ol_cnt, count(*) as order_count
        from orders, chm4cnt
        where o_orderkey = l_orderkey
          and o_orderdate >= date '1994-01-01'
          and exists (select 1 from lineitem l2
                      where l2.l_orderkey = o_orderkey
                        and l2.l_shipdate >= o_orderdate)
        group by ol_cnt
        """,
        rounds=1,
    )
    return eng.sql("SELECT ol_cnt, order_count FROM chm4 ORDER BY ol_cnt")


@register(
    "ch_mv_q5",
    oracle=f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM {SURV_C} c, {surv_o(3)} o, {surv_l(3)} l, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE' AND o_orderdate >= DATE '{_CUT}'
GROUP BY n_name ORDER BY n_name
""",
)
def ch_mv_q5(spark, sf_dir):
    """CH Q5 through the MV runtime (reference `streaming/q5.slt.part`:
    regional revenue WITHOUT TPC-H q5's customer-nation constraint — a
    plain 6-way comma chain)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv5_",
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
        f"""
        CREATE MATERIALIZED VIEW chm5 AS
        select n_name,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) as revenue_cents
        from customer, orders, lineitem, supplier, nation, region
        where c_custkey = o_custkey
          and l_orderkey = o_orderkey
          and l_suppkey = s_suppkey
          and s_nationkey = n_nationkey
          and n_regionkey = r_regionkey
          and r_name = 'EUROPE'
          and o_orderdate >= date '{_CUT}'
        group by n_name
        """,
        sample=3,
        rounds=1,
    )
    return eng.sql("SELECT n_name, revenue_cents FROM chm5 ORDER BY n_name")


@register(
    "ch_mv_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM {surv_l(4)} l
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN {surv_o(4)} o ON l_orderkey = o_orderkey
JOIN {SURV_C} c ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
GROUP BY n1.n_name, n2.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def ch_mv_q7(spark, sf_dir):
    """CH Q7 through the MV runtime (reference `streaming/q7.slt.part`:
    the FULL supplier-nation × customer-nation × year matrix — both
    nation roles as column-renamed chain inputs, no pair filter)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv7_",
        ["lineitem", "supplier", "orders", "customer"],
        """
        CREATE MATERIALIZED VIEW chm7 AS
        select supp_nation, cust_nation,
               CAST(extract(year from o_orderdate) AS BIGINT) as l_year,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) as revenue_cents
        from lineitem, supplier, orders, customer, n1, n2
        where l_suppkey = s_suppkey
          and s_nationkey = n1_nationkey
          and l_orderkey = o_orderkey
          and o_custkey = c_custkey
          and c_nationkey = n2_nationkey
        group by supp_nation, cust_nation, l_year
        """,
        sample=4,
        rounds=1,
        extra=[
            ("n1", "n1_nationkey int8 PRIMARY KEY, supp_nation text",
             "SELECT n_nationkey, n_name FROM src_nation"),
            ("n2", "n2_nationkey int8 PRIMARY KEY, cust_nation text",
             "SELECT n_nationkey, n_name FROM src_nation"),
        ],
    )
    return eng.sql(
        "SELECT supp_nation, cust_nation, l_year, revenue_cents FROM chm7 "
        "ORDER BY supp_nation, cust_nation, l_year"
    )


@register(
    "ch_mv_q8",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
       round(CAST(sum(CASE WHEN n2.n_name IN ('NATION_3', 'NATION_4')
                 THEN CAST(round(l_extendedprice*100,0) AS BIGINT) ELSE 0 END) AS BIGINT)
             * 1.0
             / CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT), 4)
         AS mkt_share
FROM {surv_l(4)} l
JOIN part      ON l_partkey = p_partkey AND p_partkey < 1000
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN {surv_o(4)} o ON l_orderkey = o_orderkey
JOIN {SURV_C} c ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY l_year ORDER BY l_year
""",
)
def ch_mv_q8(spark, sf_dir):
    """CH Q8 through the MV runtime (reference `streaming/q8.slt.part`:
    9-relation market share): the customer⋈nation⋈region EUROPE arm is
    a stacked keyed MV feeding the main 6-input chain (view-stacking,
    same split as tpch_mv_q8)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv8_",
        ["part", "lineitem", "supplier", "orders", "customer", "region"],
        """
        CREATE MATERIALIZED VIEW chm8c AS
        select c_custkey, count(*) as n_roles
        from customer, n1, region
        where c_nationkey = n1_nationkey
          and n1_regionkey = r_regionkey
          and r_name = 'EUROPE'
        group by c_custkey;
        CREATE MATERIALIZED VIEW chm8 AS
        select CAST(extract(year from o_orderdate) AS BIGINT) as l_year,
               round(sum(case when sup_nation in ('NATION_3', 'NATION_4')
                         then CAST(round(l_extendedprice*100,0) AS BIGINT) else 0L end)
                     * 1.0D
                     / sum(CAST(round(l_extendedprice*100,0) AS BIGINT)), 4) as mkt_share
        from part, lineitem, supplier, orders, chm8c, n2
        where l_partkey = p_partkey
          and p_partkey < 1000
          and l_suppkey = s_suppkey
          and s_nationkey = n2_nationkey
          and l_orderkey = o_orderkey
          and o_custkey = c_custkey
        group by l_year
        """,
        sample=4,
        rounds=1,
        extra=[
            ("n1", "n1_nationkey int8 PRIMARY KEY, n1_regionkey int8",
             "SELECT n_nationkey, n_regionkey FROM src_nation"),
            ("n2", "n2_nationkey int8 PRIMARY KEY, sup_nation text",
             "SELECT n_nationkey, n_name FROM src_nation"),
        ],
    )
    return eng.sql("SELECT l_year, mkt_share FROM chm8 ORDER BY l_year")


@register(
    "ch_mv_q10",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM {SURV_C} c
JOIN {SURV_O} o ON c_custkey = o_custkey
JOIN {surv_l(2)} l ON l_orderkey = o_orderkey AND o_orderdate <= l_shipdate
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '{_CUT}'
GROUP BY c_custkey, c_name, n_name
HAVING CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) > 0
ORDER BY c_custkey
""",
)
def ch_mv_q10(spark, sf_dir):
    """CH Q10 through the MV runtime (reference `streaming/q10.slt.part`:
    entry-before-delivery band riding the equi join — the multi-table
    conjunct stays the join step's residual — plus HAVING over the
    aggregate)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv10_",
        ["customer", "orders", "lineitem", "nation"],
        f"""
        CREATE MATERIALIZED VIEW chm10 AS
        select c_custkey, c_name, n_name,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) as revenue_cents
        from customer, orders, lineitem, nation
        where c_custkey = o_custkey
          and l_orderkey = o_orderkey
          and o_orderdate >= date '{_CUT}'
          and o_orderdate <= l_shipdate
          and c_nationkey = n_nationkey
        group by c_custkey, c_name, n_name
        having sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) > 0
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql(
        "SELECT c_custkey, c_name, n_name, revenue_cents FROM chm10 ORDER BY c_custkey"
    )


@register(
    "ch_mv_q11",
    oracle=f"""
WITH g AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) AS ordercount
  FROM {surv_l(2)} l
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, ordercount FROM g
WHERE ordercount > (SELECT sum(ordercount) * 0.001 FROM g)
ORDER BY l_partkey
""",
)
def ch_mv_q11(spark, sf_dir):
    """CH Q11 through the MV runtime (reference `streaming/q11.slt.part`:
    HAVING over a 0.5%%-of-global-total scalar — the DynamicFilter
    shape): the scalar re-evaluates per fold and re-splices groups when
    the total moves."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv11_",
        ["lineitem", "supplier", "nation"],
        """
        CREATE MATERIALIZED VIEW chm11 AS
        select l_partkey,
               sum(CAST(round(l_quantity,0) AS BIGINT)) as ordercount
        from lineitem, supplier, nation
        where l_suppkey = s_suppkey
          and s_nationkey = n_nationkey
          and n_name = 'NATION_7'
        group by l_partkey
        having sum(CAST(round(l_quantity,0) AS BIGINT)) > (
            select sum(CAST(round(l_quantity,0) AS BIGINT)) * 0.001
            from lineitem, supplier, nation
            where l_suppkey = s_suppkey
              and s_nationkey = n_nationkey
              and n_name = 'NATION_7'
        )
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT l_partkey, ordercount FROM chm11 ORDER BY l_partkey")


@register(
    "ch_mv_q13",
    oracle=f"""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM {SURV_C} c
  LEFT JOIN {SURV_O} o ON o_custkey = c_custkey AND o_orderpriority LIKE '1%'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def ch_mv_q13(spark, sf_dir):
    """CH Q13 through the MV runtime (reference `streaming/q13.slt.part`:
    order-count distribution with the priority filter INSIDE the left
    join condition — stacked MV-on-MV, zero-order customers survive)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv13_",
        ["customer", "orders"],
        """
        CREATE MATERIALIZED VIEW chm13a AS
        select c_custkey, count(o_orderkey) as c_count
        from customer left outer join orders
          on o_custkey = c_custkey and o_orderpriority like '1%'
        group by c_custkey;
        CREATE MATERIALIZED VIEW chm13 AS
        select c_count, count(*) as custdist
        from chm13a group by c_count
        """,
    )
    return eng.sql(
        "SELECT c_count, custdist FROM chm13 ORDER BY custdist DESC, c_count DESC"
    )


@register(
    "ch_mv_q15",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents
  FROM {SURV_L} l WHERE l_shipdate >= DATE '{_CUT}' GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_cents = (SELECT max(total_cents) FROM revenue)
ORDER BY s_suppkey
""",
)
def ch_mv_q15(spark, sf_dir):
    """CH Q15 through the MV runtime (reference `streaming/q15.slt.part`:
    the shared revenue view + scalar max): the view is ONE maintained
    MV consumed by both the join input and the read-time max — the
    reference's plan-reuse case."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv15_",
        ["supplier", "lineitem"],
        f"""
        CREATE MATERIALIZED VIEW chm15rev AS
        select l_suppkey as supplier_no,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) as total_cents
        from lineitem
        where l_shipdate >= date '{_CUT}'
        group by supplier_no;
        CREATE MATERIALIZED VIEW chm15 AS
        select s_suppkey, s_name, total_cents
        from supplier, chm15rev
        where s_suppkey = supplier_no
          and total_cents = (select max(total_cents) from chm15rev)
        """,
        rounds=1,
    )
    return eng.sql("SELECT s_suppkey, s_name, total_cents FROM chm15 ORDER BY s_suppkey")


@register(
    "ch_mv_q16",
    oracle=f"""
SELECT p_name, substr(p_type, 1, 3) AS brand, p_retailprice,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM {surv_l(2)} l
JOIN part ON l_partkey = p_partkey
WHERE p_name NOT LIKE '%red%'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_name, brand, p_retailprice
ORDER BY p_name, p_retailprice
""",
)
def ch_mv_q16(spark, sf_dir):
    """CH Q16 through the MV runtime (reference `streaming/q16.slt.part`:
    NOT LIKE item pushdown + NOT IN anti step + count DISTINCT, with a
    substr-derived group key)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv16_",
        ["lineitem", "part", "supplier"],
        """
        CREATE MATERIALIZED VIEW chm16 AS
        select p_name, substr(p_type, 1, 3) as brand, p_retailprice,
               count(distinct l_suppkey) as supplier_cnt
        from lineitem, part
        where l_partkey = p_partkey
          and p_name not like '%red%'
          and l_suppkey not in (select s_suppkey from supplier where s_acctbal < 0)
        group by p_name, brand, p_retailprice
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql(
        "SELECT p_name, brand, p_retailprice, supplier_cnt FROM chm16 "
        "ORDER BY p_name, p_retailprice"
    )


@register(
    "ch_mv_q17",
    oracle=f"""
WITH t AS (
  SELECT l_partkey AS t_pk,
         (CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT)/100.0)
           / count(*) AS a
  FROM {surv_l(2)} l GROUP BY l_partkey
)
SELECT round((CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)/100.0)
             / 2.0, 0) AS avg_yearly
FROM {surv_l(2)} l
JOIN part ON l_partkey = p_partkey AND p_type = 'MEDIUM'
JOIN t ON l_partkey = t_pk
WHERE l_quantity <= a
""",
)
def ch_mv_q17(spark, sf_dir):
    """CH Q17 through the MV runtime (reference `streaming/q17.slt.part`:
    below-average-quantity revenue — the per-item average is a
    CORRELATED scalar subquery desugared onto a helper agg MV joined
    into the chain; exact-cents average keeps the band comparison
    bit-stable)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv17_",
        ["lineitem", "part"],
        """
        CREATE MATERIALIZED VIEW chm17 AS
        select round((sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0D)
                     / 2.0D, 0) as avg_yearly
        from lineitem, part
        where l_partkey = p_partkey
          and p_type = 'MEDIUM'
          and l_quantity <= (
            select (sum(CAST(round(l_quantity*100,0) AS BIGINT))/100.0D)/count(*)
            from lineitem l2 where l2.l_partkey = p_partkey
          )
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT avg_yearly FROM chm17")


@register(
    "ch_mv_q19",
    oracle=f"""
SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM {surv_l(2)} l JOIN part ON l_partkey = p_partkey
WHERE (p_type = 'ECONOMY' AND l_quantity BETWEEN 1 AND 10
       AND p_retailprice BETWEEN 1 AND 400000 AND l_linenumber IN (1,2,3))
   OR (p_type = 'MEDIUM' AND l_quantity BETWEEN 1 AND 10
       AND p_retailprice BETWEEN 1 AND 400000 AND l_linenumber IN (1,2,4))
   OR (p_type = 'SMALL' AND l_quantity BETWEEN 1 AND 10
       AND p_retailprice BETWEEN 1 AND 400000 AND l_linenumber IN (1,5,3))
""",
)
def ch_mv_q19(spark, sf_dir):
    """CH Q19 through the MV runtime (reference `streaming/q19.slt.part`:
    the three-branch disjunctive band join — the common equi conjunct
    factors out of the OR as the join key, the disjunction stays the
    residual filter)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv19_",
        ["lineitem", "part"],
        """
        CREATE MATERIALIZED VIEW chm19 AS
        select sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) as revenue_cents
        from lineitem, part
        where (l_partkey = p_partkey and p_type = 'ECONOMY'
               and l_quantity between 1 and 10
               and p_retailprice between 1 and 400000 and l_linenumber in (1,2,3))
           or (l_partkey = p_partkey and p_type = 'MEDIUM'
               and l_quantity between 1 and 10
               and p_retailprice between 1 and 400000 and l_linenumber in (1,2,4))
           or (l_partkey = p_partkey and p_type = 'SMALL'
               and l_quantity between 1 and 10
               and p_retailprice between 1 and 400000 and l_linenumber in (1,5,3))
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT revenue_cents FROM chm19")


@register(
    "ch_mv_q20",
    oracle=f"""
SELECT s_name FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey FROM {surv_l(2)} l
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%o%')
      AND l_shipdate > DATE '{_CUT}'
    GROUP BY l_partkey, l_suppkey
    HAVING 2 * max(l_quantity) > sum(l_quantity))
ORDER BY s_name
""",
)
def ch_mv_q20(spark, sf_dir):
    """CH Q20 through the MV runtime (reference `streaming/q20.slt.part`:
    NESTED subqueries — the IN-subquery's own body contains another IN,
    which desugars recursively while the helper MV compiles; the outer
    grouped HAVING groups by a SUPERSET of the IN column, fine for semi
    multiplicity)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv20_",
        ["supplier", "nation", "lineitem", "part"],
        f"""
        CREATE MATERIALIZED VIEW chm20 AS
        select s_name
        from supplier, nation
        where s_nationkey = n_nationkey
          and n_name = 'NATION_7'
          and s_suppkey in (
            select l_suppkey from lineitem
            where l_partkey in (select p_partkey from part where p_name like '%o%')
              and l_shipdate > date '{_CUT}'
            group by l_partkey, l_suppkey
            having 2 * max(l_quantity) > sum(l_quantity)
          )
        order by s_name
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT s_name FROM chm20 ORDER BY s_name")


@register(
    "ch_mv_q21",
    oracle=f"""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN {surv_l(3)} l1 ON s_suppkey = l1.l_suppkey
JOIN {surv_o(3)} o ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM {surv_l(3)} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
GROUP BY s_name ORDER BY s_name
""",
)
def ch_mv_q21(spark, sf_dir):
    """CH Q21 through the MV runtime (reference `streaming/q21.slt.part`:
    late shipments on multi-supplier orders — the EXISTS over the same
    fact stream desugars onto a semi step with the supplier-inequality
    residual; the late-shipment band is a residual on the orders
    step)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv21_",
        ["supplier", "lineitem", "orders"],
        """
        CREATE MATERIALIZED VIEW chm21 AS
        select s_name, count(*) as numwait
        from supplier, lineitem l1, orders
        where s_suppkey = l1.l_suppkey
          and o_orderkey = l1.l_orderkey
          and l1.l_shipdate > o_orderdate
          and exists (select 1 from lineitem l2
                      where l2.l_orderkey = l1.l_orderkey
                        and l2.l_suppkey <> l1.l_suppkey)
        group by s_name
        """,
        sample=3,
        rounds=1,
    )
    return eng.sql("SELECT s_name, numwait FROM chm21 ORDER BY s_name")


@register(
    "ch_mv_q22",
    oracle=f"""
SELECT CAST(c_custkey % 10 AS BIGINT) AS country_code,
       count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM {SURV_C} c
WHERE c_acctbal > (
        SELECT (CAST(sum(CAST(round(c_acctbal*10000,0) AS BIGINT)) AS BIGINT)/10000.0)
               / count(*)
        FROM {SURV_C} c2 WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM {SURV_O} o WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '1998-01-01')
GROUP BY country_code ORDER BY country_code
""",
)
def ch_mv_q22(spark, sf_dir):
    """CH Q22 through the MV runtime (reference `streaming/q22.slt.part`:
    dormant high-balance customers): anti step for the no-orders gate,
    exact-scaled-sum average as the moving scalar threshold
    (DynamicFilter re-splice)."""
    eng = _tpch_eng(
        spark, sf_dir, "rw_chmv22_",
        ["customer", "orders"],
        """
        CREATE MATERIALIZED VIEW chm22 AS
        select CAST(c_custkey % 10 AS BIGINT) as country_code,
               count(*) as numcust,
               sum(CAST(round(c_acctbal*100,0) AS BIGINT)) as totacctbal_cents
        from customer
        where c_acctbal > (
            select (sum(CAST(round(c_acctbal*10000,0) AS BIGINT))/10000.0D)/count(*)
            from customer where c_acctbal > 0.0
        )
        and not exists (select 1 from orders where o_custkey = c_custkey
                        and o_orderdate >= date '1998-01-01')
        group by country_code
        """,
    )
    return eng.sql(
        "SELECT country_code, numcust, totacctbal_cents FROM chm22 ORDER BY country_code"
    )
