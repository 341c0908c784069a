"""TPC-H THROUGH THE MV RUNTIME — the reference maintains all 22 TPC-H
queries as materialized views (`e2e_test/streaming/tpch/views/
q1-q22.slt.part`) and gates MV-vs-batch snapshot equivalence
(`e2e_test/streaming/tpch_snapshot.slt`). The batch suite in `tpch.py`
proves the QUERY SHAPES; this module proves the STREAMING ENGINE on
them: each query compiles through `Engine.sql("CREATE MATERIALIZED
VIEW ...")` using the reference's own comma-join spelling, the base
tables fold in as changelog batches (two insert rounds per fact table,
then DELETE rounds exercising retraction on every maintained side), and
the incrementally-maintained MV is hash-compared against the DuckDB
batch twin over the surviving rows — the driver's compare IS the
snapshot-equivalence gate.

Query constants follow the adapted batch suite (`tpch.py` — the driver
schema has no partsupp / l_commitdate / p_container etc.; FIXTURES.md).

Scale posture: every MV here maintains with the O(touched-buckets)
fold/splice loop (streaming/mv.py) and the retractable join chain
(streaming/join.py) — per-batch cost is bounded by the batch's touched
keys, never the MV or state size. Comma joins desugar at compile time
into the same left-deep chain the reference plans
(`create_mv.rs:87` → stream_hash_join tree).
"""

from __future__ import annotations

import tempfile

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import tables

# ---- shared fold protocol ------------------------------------------
# Facts fold in pk-parity rounds then delete a modulus slice each; dims
# load in one round (no deletes — the reference's tpch streaming suite
# mutates the fact streams). Deep join chains (4+ tables) fold a
# deterministic 1/`sample` orderkey slice of orders+lineitem to keep
# the per-query wall time bounded — the chain work per level is
# O(folded rows), and thousands of joined rows still flow. The DuckDB
# twin below must see the same survivors.
SURV_L = "(SELECT * FROM lineitem WHERE l_orderkey % 13 <> 0)"
SURV_O = "(SELECT * FROM orders WHERE o_orderkey % 17 <> 0)"
SURV_C = "(SELECT * FROM customer WHERE c_custkey % 19 <> 0)"


def surv_l(sample: int | None = None) -> str:
    cond = "l_orderkey % 13 <> 0" + (f" AND l_orderkey % {sample} = 0" if sample else "")
    return f"(SELECT * FROM lineitem WHERE {cond})"


def surv_o(sample: int | None = None) -> str:
    cond = "o_orderkey % 17 <> 0" + (f" AND o_orderkey % {sample} = 0" if sample else "")
    return f"(SELECT * FROM orders WHERE {cond})"

_T = {
    "customer": (
        "c_custkey int8 PRIMARY KEY, c_name text, c_nationkey int8, "
        "c_acctbal float8, c_mktsegment text",
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment "
        "FROM src_customer",
    ),
    "orders": (
        "o_orderkey int8 PRIMARY KEY, o_custkey int8, o_orderstatus text, "
        "o_totalprice float8, o_orderdate timestamp, o_orderpriority text",
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate, o_orderpriority FROM src_orders",
    ),
    "lineitem": (
        "l_orderkey int8, l_partkey int8, l_suppkey int8, l_linenumber int4, "
        "l_quantity float8, l_extendedprice float8, l_discount float8, "
        "l_tax float8, l_returnflag text, l_linestatus text, l_shipdate timestamp, "
        "PRIMARY KEY (l_orderkey, l_linenumber)",
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate FROM src_lineitem",
    ),
    "part": (
        "p_partkey int8 PRIMARY KEY, p_name text, p_brand text, p_type text, "
        "p_size int4, p_retailprice float8",
        "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice "
        "FROM src_part",
    ),
    "supplier": (
        "s_suppkey int8 PRIMARY KEY, s_name text, s_nationkey int8, "
        "s_acctbal float8",
        "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM src_supplier",
    ),
    "nation": (
        "n_nationkey int8 PRIMARY KEY, n_name text, n_regionkey int8",
        "SELECT n_nationkey, n_name, n_regionkey FROM src_nation",
    ),
    "region": (
        "r_regionkey int8 PRIMARY KEY, r_name text",
        "SELECT r_regionkey, r_name FROM src_region",
    ),
}

_DIMS = ("part", "supplier", "nation", "region")
_FACTS = (("customer", "c_custkey"), ("orders", "o_orderkey"), ("lineitem", "l_orderkey"))
_DELETES = (("lineitem", "l_orderkey", 13), ("orders", "o_orderkey", 17), ("customer", "c_custkey", 19))


def _tpch_eng(
    spark,
    sf_dir,
    prefix: str,
    tbls: list[str],
    ddl: str,
    sample: int | None = None,
    rounds: int = 2,
    extra: list[tuple[str, str, str]] | None = None,
):
    """Engine with the requested TPC-H tables (created empty, canonical
    names so MV bodies read exactly like the reference views), the
    query's MVs created BEFORE any data, then the standard changelog
    fold: dims one round, facts `rounds` parity rounds, delete rounds.
    `sample` restricts orders+lineitem to the `orderkey % sample = 0`
    slice (deep chains — see module note). `extra` adds custom dim
    tables [(name, cols_ddl, insert_sql)] for bodies that want a
    derived dimension; self-joins (`nation n1, nation n2`, reference
    q7/q8) no longer need it — the chain compiler renames each role's
    columns per alias."""
    from risingwave_spark.api import Engine

    t = tables(spark, sf_dir)
    for name in tbls:
        t[name].createOrReplaceTempView(f"src_{name}")
    if extra and "nation" not in tbls:
        t["nation"].createOrReplaceTempView("src_nation")
    eng = Engine(spark, tempfile.mkdtemp(prefix=prefix))
    for name in tbls:
        eng.sql(f"CREATE TABLE {name} ({_T[name][0]})")
    for name, cols, _ins in extra or []:
        eng.sql(f"CREATE TABLE {name} ({cols})")
    eng.sql(ddl)
    for name, _cols, ins in extra or []:
        eng.sql(f"INSERT INTO {name} {ins}")
    for name in tbls:
        if name in _DIMS:
            eng.sql(f"INSERT INTO {name} {_T[name][1]}")

    def _samp(name: str, key: str) -> str:
        if sample and name in ("orders", "lineitem"):
            k = "o_orderkey" if name == "orders" else "l_orderkey"
            return f" AND {k} % {sample} = 0"
        return ""

    for rnd in range(rounds):
        for name, key in _FACTS:
            if name in tbls:
                eng.sql(
                    f"INSERT INTO {name} {_T[name][1]} "
                    f"WHERE {key} % {rounds} = {rnd}{_samp(name, key)}"
                )
    for name, key, mod in _DELETES:
        if name in tbls:
            eng.sql(f"DELETE FROM {name} WHERE {key} % {mod} = 0")
    return eng


_O_REV = "l_extendedprice*(1-l_discount)"


def _o_cents(expr: str, scale: int = 100) -> str:
    """DuckDB exact-cents sum → double with the same value Spark's
    `sum(CAST(round(e*100,0) AS BIGINT))/100.0D` produces."""
    return f"(CAST(sum(CAST(round(({expr})*{scale},0) AS BIGINT)) AS BIGINT)/{scale}.0)"


def _s_cents(expr: str, scale: int = 100) -> str:
    """Spark SQL exact-cents sum for MV bodies."""
    return f"sum(CAST(round(({expr})*{scale},0) AS BIGINT))/{scale}.0D"


@register(
    "tpch_mv_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_o_cents('l_quantity')} AS sum_qty,
       {_o_cents('l_extendedprice')} AS sum_base_price,
       {_o_cents(_O_REV)} AS sum_disc_price,
       {_o_cents(_O_REV + '*(1+l_tax)')} AS sum_charge,
       round({_o_cents('l_quantity', 10000)}/count(*), 4) AS avg_qty,
       round({_o_cents('l_extendedprice', 10000)}/count(*), 4) AS avg_price,
       round({_o_cents('l_discount', 10000)}/count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM {SURV_L} l
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def tpch_mv_q1(spark, sf_dir):
    """TPC-H q1 as a retractable agg MV (reference
    `e2e_test/streaming/tpch/views/q1.slt.part` — the exact view body,
    exact-cents sums for cross-engine determinism): two insert rounds
    then the delete round fold through MaterializedView; the final MV
    equals the batch aggregate over survivors."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv1_",
        ["lineitem"],
        f"""
        CREATE MATERIALIZED VIEW tq1 AS
        select
          l_returnflag,
          l_linestatus,
          {_s_cents('l_quantity')} as sum_qty,
          {_s_cents('l_extendedprice')} as sum_base_price,
          {_s_cents(_O_REV)} as sum_disc_price,
          {_s_cents(_O_REV + '*(1+l_tax)')} as sum_charge,
          round(({_s_cents('l_quantity', 10000)})/count(*), 4) as avg_qty,
          round(({_s_cents('l_extendedprice', 10000)})/count(*), 4) as avg_price,
          round(({_s_cents('l_discount', 10000)})/count(*), 4) as avg_disc,
          count(*) as count_order
        from lineitem
        where l_shipdate <= date '1998-09-02'
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
        """,
    )
    return eng.sql(
        "SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, "
        "sum_disc_price, sum_charge, avg_qty, avg_price, avg_disc, "
        "count_order FROM tq1 ORDER BY l_returnflag, l_linestatus"
    )


@register(
    "tpch_mv_q3",
    oracle=f"""
SELECT l_orderkey, {_o_cents(_O_REV)} AS revenue, o_orderdate
FROM {SURV_C} c, {SURV_O} o, {SURV_L} l
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
)
def tpch_mv_q3(spark, sf_dir):
    """TPC-H q3 as a comma-join + agg + TopN MV (reference
    `views/q3.slt.part` — comma FROM list, WHERE equi joins, ORDER BY
    ... LIMIT): the body desugars onto a 3-level retractable join chain
    with a group-agg level and an ordered read bound; deletes on all
    three tables retract through the chain."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv3_",
        ["customer", "orders", "lineitem"],
        f"""
        CREATE MATERIALIZED VIEW tq3 AS
        select
          l_orderkey,
          {_s_cents(_O_REV)} as revenue,
          o_orderdate
        from
          customer,
          orders,
          lineitem
        where
          c_mktsegment = 'BUILDING'
          and c_custkey = o_custkey
          and l_orderkey = o_orderkey
          and o_orderdate < date '1998-03-15'
          and l_shipdate > date '1998-03-15'
        group by
          l_orderkey,
          o_orderdate
        order by
          revenue desc,
          l_orderkey
        LIMIT 10
        """,
    )
    return eng.sql("SELECT l_orderkey, revenue, o_orderdate FROM tq3")


@register(
    "tpch_mv_q5",
    oracle=f"""
SELECT n_name, {_o_cents(_O_REV)} AS revenue
FROM {SURV_C} c, {surv_o(3)} o, {surv_l(3)} l, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
""",
)
def tpch_mv_q5(spark, sf_dir):
    """TPC-H q5 as a 6-way comma-join agg MV (reference
    `views/q5.slt.part` verbatim shape): the desugar builds a 5-level
    retractable chain — including the non-adjacent c_nationkey =
    s_nationkey equi conjunct attaching at the supplier level — with a
    group-agg level keyed on the dimension-derived n_name."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv5_",
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
        f"""
        CREATE MATERIALIZED VIEW tq5 AS
        select
          n_name,
          {_s_cents(_O_REV)} as revenue
        from
          customer,
          orders,
          lineitem,
          supplier,
          nation,
          region
        where
          c_custkey = o_custkey
          and l_orderkey = o_orderkey
          and l_suppkey = s_suppkey
          and c_nationkey = s_nationkey
          and s_nationkey = n_nationkey
          and n_regionkey = r_regionkey
          and r_name = 'ASIA'
          and o_orderdate >= date '1996-01-01'
          and o_orderdate < date '1997-01-01'
        group by
          n_name
        order by
          revenue desc
        """,
        sample=3,
        rounds=1,
    )
    return eng.sql("SELECT n_name, revenue FROM tq5 ORDER BY n_name")


@register(
    "tpch_mv_q6",
    oracle=f"""
SELECT {_o_cents('l_extendedprice*l_discount')} AS revenue
FROM {SURV_L} l
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def tpch_mv_q6(spark, sf_dir):
    """TPC-H q6 as a GLOBAL-aggregate MV (reference `views/q6.slt.part`
    — the SimpleAgg executor: one group, value state), in the
    reference's exact no-GROUP-BY spelling (native SimpleAgg MV path,
    round-7 session 5); the delete round folds the sum back down. BETWEEN survives the conjunct splitter (its AND is not a
    conjunction boundary)."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv6_",
        ["lineitem"],
        f"""
        CREATE MATERIALIZED VIEW tq6 AS
        select
          {_s_cents('l_extendedprice*l_discount')} as revenue
        from
          lineitem
        where
          l_shipdate >= date '1996-01-01'
          and l_shipdate < date '1997-01-01'
          and l_discount between 0.05 and 0.07
          and l_quantity < 24
        """,
    )
    return eng.sql("SELECT revenue FROM tq6")


@register(
    "tpch_mv_q9",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {_o_cents(_O_REV + ' - p_retailprice*l_quantity*0.1')} AS sum_profit
FROM part, {surv_l(3)} l, supplier, {surv_o(3)} o, nation
WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
ORDER BY n_name, o_year DESC
""",
)
def tpch_mv_q9(spark, sf_dir):
    """TPC-H q9 as a 5-way comma-join agg MV with DERIVED group keys
    (reference `views/q9.slt.part`: nation = renamed n_name, o_year =
    extract(year ...) — the key_of annotation path; adapted cost model,
    tpch.py q9): the p_name LIKE filter pushes below the join into the
    part input's state."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv9_",
        ["part", "lineitem", "supplier", "orders", "nation"],
        f"""
        CREATE MATERIALIZED VIEW tq9 AS
        select
          n_name as nation,
          CAST(extract(year from o_orderdate) AS BIGINT) as o_year,
          {_s_cents(_O_REV + ' - p_retailprice*l_quantity*0.1')} as sum_profit
        from
          part,
          lineitem,
          supplier,
          orders,
          nation
        where
          s_suppkey = l_suppkey
          and p_partkey = l_partkey
          and o_orderkey = l_orderkey
          and s_nationkey = n_nationkey
          and p_name like '%red%'
        group by
          nation,
          o_year
        order by
          nation,
          o_year desc
        """,
        sample=3,
        rounds=1,
    )
    return eng.sql("SELECT nation, o_year, sum_profit FROM tq9 ORDER BY nation, o_year")


@register(
    "tpch_mv_q10",
    oracle=f"""
SELECT c_custkey, c_name, {_o_cents(_O_REV)} AS revenue, c_acctbal, n_name
FROM {SURV_C} c, {SURV_O} o, {SURV_L} l, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def tpch_mv_q10(spark, sf_dir):
    """TPC-H q10 as a 4-way comma-join agg + TopN MV (reference
    `views/q10.slt.part`): the o_orderdate range and l_returnflag
    filters push below the join into the orders/lineitem input states;
    the LIMIT 20 is the ordered read bound."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv10_",
        ["customer", "orders", "lineitem", "nation"],
        f"""
        CREATE MATERIALIZED VIEW tq10 AS
        select
          c_custkey,
          c_name,
          {_s_cents(_O_REV)} as revenue,
          c_acctbal,
          n_name
        from
          customer,
          orders,
          lineitem,
          nation
        where
          c_custkey = o_custkey
          and l_orderkey = o_orderkey
          and o_orderdate >= date '1996-10-01'
          and o_orderdate < date '1997-01-01'
          and l_returnflag = 'R'
          and c_nationkey = n_nationkey
        group by
          c_custkey,
          c_name,
          c_acctbal,
          n_name
        order by
          revenue desc,
          c_custkey
        limit 20
        """,
        rounds=1,
    )
    return eng.sql("SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM tq10")


@register(
    "tpch_mv_q12",
    oracle=f"""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM {SURV_O} o, {SURV_L} l
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def tpch_mv_q12(spark, sf_dir):
    """TPC-H q12 as a 2-way comma-join agg MV with conditional counts
    (reference `views/q12.slt.part`; adapted columns, tpch.py q12): the
    shipdate range pushes into the lineitem input state."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv12_",
        ["orders", "lineitem"],
        """
        CREATE MATERIALIZED VIEW tq12 AS
        select
            l_returnflag,
            sum(case when o_orderpriority = '1-URGENT'
                or o_orderpriority = '2-HIGH' then 1 else 0 end) as high_line_count,
            sum(case when o_orderpriority <> '1-URGENT'
                and o_orderpriority <> '2-HIGH' then 1 else 0 end) as low_line_count
        from
            orders,
            lineitem
        where
            o_orderkey = l_orderkey
            and l_shipdate >= date '1996-01-01'
            and l_shipdate < date '1997-01-01'
        group by
            l_returnflag
        order by
            l_returnflag
        """,
    )
    return eng.sql(
        "SELECT l_returnflag, high_line_count, low_line_count FROM tq12 "
        "ORDER BY l_returnflag"
    )


@register(
    "tpch_mv_q13",
    oracle=f"""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM {SURV_C} c LEFT OUTER JOIN {SURV_O} o
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_mv_q13(spark, sf_dir):
    """TPC-H q13 as STACKED MVs — the reference's subquery-FROM
    (`views/q13.slt.part` c_orders derived table) spelled as MV-on-MV:
    the inner LEFT OUTER join + per-customer count maintains as a
    stream-join MV (the join-condition filter is a pushed right-side
    predicate — preserved-side rows still null-pad), and the outer
    count-distribution MV folds the inner's Update-pair changelog.
    Deletes re-bucket customers across c_count groups through BOTH
    levels."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv13_",
        ["customer", "orders"],
        """
        CREATE MATERIALIZED VIEW tq13a AS
        select
          c_custkey,
          count(o_orderkey) as c_count
        from
          customer left outer join orders on
            c_custkey = o_custkey
            and o_orderpriority <> '1-URGENT'
        group by
          c_custkey;
        CREATE MATERIALIZED VIEW tq13 AS
        select
          c_count,
          count(*) as custdist
        from
          tq13a
        group by
          c_count
        """,
    )
    return eng.sql(
        "SELECT c_count, custdist FROM tq13 ORDER BY custdist DESC, c_count DESC"
    )


@register(
    "tpch_mv_q14",
    oracle=f"""
SELECT 100.00 * {_o_cents("CASE WHEN p_type = 'ECONOMY' THEN " + _O_REV + " ELSE 0 END")}
       / {_o_cents(_O_REV)} AS promo_revenue
FROM {SURV_L} l, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
""",
)
def tpch_mv_q14(spark, sf_dir):
    """TPC-H q14 as a comma-join GLOBAL-agg MV (reference
    `views/q14.slt.part`: promo-revenue ratio; adapted filter, tpch.py
    q14): constant derived group key over the 2-table chain; both ratio
    legs are exact-cents so retraction keeps the division
    deterministic."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv14_",
        ["lineitem", "part"],
        f"""
        CREATE MATERIALIZED VIEW tq14 AS
        select
          100.00 * ({_s_cents("case when p_type = 'ECONOMY' then " + _O_REV + " else 0 end")})
            / ({_s_cents(_O_REV)}) as promo_revenue
        from
          lineitem,
          part
        where
          l_partkey = p_partkey
          and l_shipdate >= date '1996-09-01'
          and l_shipdate < date '1996-10-01'
        """,
    )
    return eng.sql("SELECT promo_revenue FROM tq14")


@register(
    "tpch_mv_q18",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM {SURV_C} c, {SURV_O} o,
     (SELECT l_orderkey, CAST(sum(CAST(round(l_quantity,0) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM {SURV_L} l GROUP BY l_orderkey) s
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND sum_qty > 300
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)
def tpch_mv_q18(spark, sf_dir):
    """TPC-H q18 (reference `views/q18.slt.part`: IN over a grouped
    HAVING subquery) spelled via the MV-as-join-input path — the
    reference's subquery unnesting (`apply_to_join_rule.rs:22`) done as
    a helper agg MV joined into the chain: the per-order quantity MV's
    changelog feeds the main chain, the threshold is a pushed
    pre-filter on that input, and the ordered LIMIT 100 is the TopN
    read bound. A lineitem delete that drops an order under the
    threshold retracts it from the result."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv18_",
        ["customer", "orders", "lineitem"],
        """
        CREATE MATERIALIZED VIEW tq18s AS
        select l_orderkey, sum(CAST(round(l_quantity,0) AS BIGINT)) as sum_qty
        from lineitem group by l_orderkey;
        CREATE MATERIALIZED VIEW tq18 AS
        select
          c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        from
          customer,
          orders,
          tq18s
        where
          c_custkey = o_custkey
          and o_orderkey = l_orderkey
          and sum_qty > 300
        order by
          o_totalprice desc,
          o_orderkey
        LIMIT 100
        """,
        rounds=1,
    )
    return eng.sql(
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, "
        "sum_qty FROM tq18"
    )


@register(
    "tpch_mv_q19",
    oracle=f"""
SELECT {_o_cents(_O_REV)} AS revenue
FROM {surv_l(2)} l, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#2'
       AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#17'
       AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#25'
       AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def tpch_mv_q19(spark, sf_dir):
    """TPC-H q19 (reference `views/q19.slt.part`: the OR-of-ANDs whose
    every branch repeats `p_partkey = l_partkey`): the desugar factors
    the common equi conjunct out of the OR as the join key — the
    reference's q19 plan — and keeps the whole disjunction as the
    residual filter; a global-agg level on top."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv19_",
        ["lineitem", "part"],
        f"""
        CREATE MATERIALIZED VIEW tq19 AS
        select
          {_s_cents(_O_REV)} as revenue
        from
          lineitem,
          part
        where
          (p_partkey = l_partkey and p_brand = 'Brand#2'
           and p_size between 1 and 15 and l_quantity between 1 and 21)
          or
          (p_partkey = l_partkey and p_brand = 'Brand#17'
           and p_size between 1 and 25 and l_quantity between 10 and 30)
          or
          (p_partkey = l_partkey and p_brand = 'Brand#25'
           and p_size between 1 and 35 and l_quantity between 20 and 40)
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT revenue FROM tq19")


@register(
    "tpch_mv_q4",
    oracle=f"""
SELECT o_orderpriority, count(*) AS order_count
FROM {SURV_O} o
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM {SURV_L} l
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def tpch_mv_q4(spark, sf_dir):
    """TPC-H q4 through the MV runtime (reference `views/q4.slt.part`:
    correlated EXISTS): the subquery desugars onto a LEFT SEMI join
    step against a deduplicating helper MV, with the non-equi
    correlation (l_shipdate > o_orderdate) as the step's residual
    condition — the reference's apply-to-join unnesting. Lineitem
    deletes that remove an order's last late item retract it."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv4_",
        ["orders", "lineitem"],
        """
        CREATE MATERIALIZED VIEW tq4 AS
        select
          o_orderpriority,
          count(*) as order_count
        from
          orders
        where
          o_orderdate >= date '1996-07-01'
          and o_orderdate < date '1996-10-01'
          and exists (
            select 1 from lineitem
            where l_orderkey = o_orderkey and l_shipdate > o_orderdate
          )
        group by
          o_orderpriority
        order by
          o_orderpriority
        """,
        rounds=1,
    )
    return eng.sql(
        "SELECT o_orderpriority, order_count FROM tq4 ORDER BY o_orderpriority"
    )


@register(
    "tpch_mv_q16",
    oracle=f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part, {SURV_L} l
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_mv_q16(spark, sf_dir):
    """TPC-H q16 through the MV runtime (reference `views/q16.slt.part`:
    NOT IN subquery + count DISTINCT; adapted exclusion, tpch.py q16):
    the NOT IN desugars onto a LEFT ANTI step against a helper MV over
    supplier, and the distinct count runs in the chain's agg
    recompute."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv16_",
        ["part", "lineitem", "supplier"],
        """
        CREATE MATERIALIZED VIEW tq16 AS
        select
            p_brand,
            p_type,
            p_size,
            count(distinct l_suppkey) as supplier_cnt
        from
            part,
            lineitem
        where
            p_partkey = l_partkey
            and p_brand <> 'Brand#45'
            and p_type <> 'PROMO'
            and p_size in (1, 4, 9, 14, 19, 23, 36, 45)
            and l_suppkey not in (
                select s_suppkey from supplier where s_acctbal < 0
            )
        group by
            p_brand,
            p_type,
            p_size
        order by
            supplier_cnt desc,
            p_brand,
            p_type,
            p_size
        """,
        rounds=1,
    )
    return eng.sql(
        "SELECT p_brand, p_type, p_size, supplier_cnt FROM tq16 "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    )


@register(
    "tpch_mv_q17",
    oracle=f"""
SELECT {_o_cents('l_extendedprice')} / 7.0 AS avg_yearly
FROM {surv_l(2)} l, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#2'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM {surv_l(2)} l2
                    WHERE l2.l_partkey = l.l_partkey)
""",
)
def tpch_mv_q17(spark, sf_dir):
    """TPC-H q17 through the MV runtime (reference `views/q17.slt.part`:
    CORRELATED scalar subquery): desugars onto a per-partkey helper agg
    MV inner-joined into the chain with the comparison as a residual —
    the reference's decorrelated DynamicFilter plan. A lineitem delete
    moves the per-part average AND the qualifying rows in the same
    fold."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv17_",
        ["lineitem", "part"],
        f"""
        CREATE MATERIALIZED VIEW tq17 AS
        select
          ({_s_cents('l_extendedprice')}) / 7.0D as avg_yearly
        from
          lineitem,
          part
        where
          p_partkey = l_partkey
          and p_brand = 'Brand#2'
          and l_quantity < (
            select 0.2 * avg(l_quantity) from lineitem l2
            where l2.l_partkey = p_partkey
          )
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT avg_yearly FROM tq17")


@register(
    "tpch_mv_q20",
    oracle=f"""
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM {SURV_L} l, part
  WHERE p_partkey = l_partkey AND p_name LIKE 'blue%'
    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 100
)
ORDER BY s_name
""",
)
def tpch_mv_q20(spark, sf_dir):
    """TPC-H q20 through the MV runtime (reference `views/q20.slt.part`:
    IN over a grouped-HAVING subquery whose FROM is itself a comma
    join; adapted shape, tpch.py q20): the helper MV compiles
    recursively — its own comma join desugars onto a chain — and feeds
    the outer semi step."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv20_",
        ["supplier", "lineitem", "part"],
        """
        CREATE MATERIALIZED VIEW tq20 AS
        select
          s_name,
          s_acctbal
        from
          supplier
        where
          s_suppkey in (
            select
              l_suppkey
            from
              lineitem,
              part
            where
              p_partkey = l_partkey
              and p_name like 'blue%'
              and l_shipdate >= date '1996-01-01'
              and l_shipdate < date '1997-01-01'
            group by
              l_suppkey
            having
              sum(l_quantity) > 100
          )
        order by
          s_name
        """,
        rounds=1,
    )
    return eng.sql("SELECT s_name, s_acctbal FROM tq20 ORDER BY s_name")


@register(
    "tpch_mv_q11",
    oracle=f"""
WITH natps AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS val
  FROM {surv_l(2)} l
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT l_partkey AS ps_partkey, {_o_cents('val')} AS part_value
FROM natps
GROUP BY l_partkey
HAVING {_o_cents('val')} > (SELECT {_o_cents('val')} * 0.0001 FROM natps)
ORDER BY part_value DESC, ps_partkey
""",
)
def tpch_mv_q11(spark, sf_dir):
    """TPC-H q11 through the MV runtime (reference `views/q11.slt.part`:
    HAVING against an uncorrelated scalar subquery — the reference's
    DynamicFilter plan; adapted value model, tpch.py q11): the scalar
    re-evaluates against the live tables after every fold and a moved
    value re-splices the MV's groups, so groups crossing the 0.01%%
    threshold in EITHER direction stay exact under deletes."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv11_",
        ["lineitem", "supplier", "nation"],
        f"""
        CREATE MATERIALIZED VIEW tq11 AS
        select
            l_partkey as ps_partkey,
            {_s_cents('l_extendedprice * l_quantity')} as part_value
        from
            lineitem,
            supplier,
            nation
        where
            l_suppkey = s_suppkey
            and s_nationkey = n_nationkey
            and n_name = 'NATION_7'
        group by
            ps_partkey
        having
            {_s_cents('l_extendedprice * l_quantity')} > (
                select {_s_cents('l_extendedprice * l_quantity')} * 0.0001
                from lineitem, supplier, nation
                where l_suppkey = s_suppkey and s_nationkey = n_nationkey
                  and n_name = 'NATION_7'
            )
        order by
            part_value desc,
            ps_partkey
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT ps_partkey, part_value FROM tq11 ORDER BY ps_partkey")


@register(
    "tpch_mv_q15",
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {_o_cents(_O_REV)} AS total_revenue
  FROM {SURV_L} l
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
)
def tpch_mv_q15(spark, sf_dir):
    """TPC-H q15 through the MV runtime (reference `views/q15.slt.part`:
    the revenue0 CTE + `= (SELECT max(...))` top-supplier filter): the
    CTE is a stacked helper MV feeding the main chain as a join input;
    the uncorrelated max evaluates against the maintained revenue0 at
    read (row-grain project — always fresh), exact-cents equality."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv15_",
        ["supplier", "lineitem"],
        f"""
        CREATE MATERIALIZED VIEW revenue0 AS
        select
          l_suppkey as supplier_no,
          {_s_cents(_O_REV)} as total_revenue
        from lineitem
        where l_shipdate >= date '1996-01-01' and l_shipdate < date '1996-04-01'
        group by supplier_no;
        CREATE MATERIALIZED VIEW tq15 AS
        select
          s_suppkey,
          s_name,
          total_revenue
        from
          supplier,
          revenue0
        where
          s_suppkey = supplier_no
          and total_revenue = (
            select max(total_revenue) from revenue0
          )
        order by
          s_suppkey
        """,
        rounds=1,
    )
    return eng.sql("SELECT s_suppkey, s_name, total_revenue FROM tq15 ORDER BY s_suppkey")


@register(
    "tpch_mv_q22",
    oracle=f"""
SELECT cntrycode, count(*) AS numcust, {_o_cents('c_acctbal')} AS totacctbal
FROM (
  SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode, c_acctbal
  FROM {SURV_C} c
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM {SURV_C} c2 WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM {SURV_O} o WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
) t
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def tpch_mv_q22(spark, sf_dir):
    """TPC-H q22 through the MV runtime (reference `views/q22.slt.part`:
    uncorrelated scalar + correlated NOT EXISTS): the anti step handles
    the no-recent-orders filter incrementally, and the moving average
    threshold re-splices groups via the scalar dependency (DynamicFilter
    on the RHS stream)."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv22_",
        ["customer", "orders"],
        """
        CREATE MATERIALIZED VIEW tq22 AS
        select
            CAST(c_custkey % 10 AS BIGINT) as cntrycode,
            count(*) as numcust,
            sum(CAST(round(c_acctbal*100,0) AS BIGINT))/100.0D as totacctbal
        from
            customer
        where
            c_acctbal > (
                select avg(c_acctbal) from customer where c_acctbal > 0.0
            )
            and not exists (
                select 1 from orders
                where o_custkey = c_custkey and o_orderdate >= date '2000-01-01'
            )
        group by
            cntrycode
        order by
            cntrycode
        """,
    )
    return eng.sql("SELECT cntrycode, numcust, totacctbal FROM tq22 ORDER BY cntrycode")


@register(
    "tpch_mv_q21",
    oracle=f"""
SELECT s_name, numwait FROM (
  SELECT s_name, count(*) AS numwait
  FROM supplier, {surv_l(3)} l1, {surv_o(3)} o
  WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
    AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM {surv_l(3)} l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM {surv_l(3)} l3
                    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
  GROUP BY s_name
) t ORDER BY numwait DESC, s_name LIMIT 100
""",
)
def tpch_mv_q21(spark, sf_dir):
    """TPC-H q21 through the MV runtime (reference `views/q21.slt.part`:
    the EXISTS + NOT EXISTS pair over self-joined lineitem; adapted
    filters, tpch.py q21): both subqueries desugar onto helper MVs over
    the SAME lineitem stream — a semi step and an anti step with
    correlated non-equi residuals — stacked on the 3-way chain, with
    the TopN read bound on top."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv21_",
        ["supplier", "lineitem", "orders"],
        """
        CREATE MATERIALIZED VIEW tq21 AS
        select
            s_name,
            count(*) as numwait
        from
            supplier,
            lineitem l1,
            orders
        where
            s_suppkey = l1.l_suppkey
            and o_orderkey = l1.l_orderkey
            and o_orderstatus = 'F'
            and l1.l_returnflag = 'R'
            and exists (
                select 1 from lineitem l2
                where l2.l_orderkey = l1.l_orderkey
                  and l2.l_suppkey <> l1.l_suppkey
            )
            and not exists (
                select 1 from lineitem l3
                where l3.l_orderkey = l1.l_orderkey
                  and l3.l_suppkey <> l1.l_suppkey
                  and l3.l_returnflag = 'R'
            )
        group by
            s_name
        order by
            numwait desc,
            s_name
        LIMIT 100
        """,
        sample=3,
        rounds=1,
    )
    return eng.sql("SELECT s_name, numwait FROM tq21")


@register(
    "tpch_mv_q7",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_o_cents(_O_REV)} AS revenue
FROM supplier
JOIN {surv_l(3)} l ON s_suppkey = l_suppkey
JOIN {surv_o(3)} o ON o_orderkey = l_orderkey
JOIN {SURV_C} c ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def tpch_mv_q7(spark, sf_dir):
    """TPC-H q7 through the MV runtime in the reference's OWN spelling
    (`views/q7.slt.part`: `nation n1, nation n2` self-join, alias-
    qualified columns): the chain compiler renames each nation role's
    columns per alias, the two-nation OR stays a residual over the join
    result, and the shipdate BETWEEN pushes into the lineitem input."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv7_",
        ["supplier", "lineitem", "orders", "customer", "nation"],
        f"""
        CREATE MATERIALIZED VIEW tq7 AS
        select
          n1.n_name as supp_nation,
          n2.n_name as cust_nation,
          CAST(extract(year from l_shipdate) AS BIGINT) as l_year,
          {_s_cents(_O_REV)} as revenue
        from
          supplier,
          lineitem,
          orders,
          customer,
          nation n1,
          nation n2
        where
          s_suppkey = l_suppkey
          and o_orderkey = l_orderkey
          and c_custkey = o_custkey
          and s_nationkey = n1.n_nationkey
          and c_nationkey = n2.n_nationkey
          and (
            (n1.n_name = 'NATION_3' and n2.n_name = 'NATION_7')
            or (n1.n_name = 'NATION_7' and n2.n_name = 'NATION_3')
          )
          and l_shipdate between timestamp '1996-01-01' and timestamp '1997-12-31'
        group by
          supp_nation,
          cust_nation,
          l_year
        order by
          supp_nation,
          cust_nation,
          l_year
        """,
        sample=3,
        rounds=1,
    )
    return eng.sql(
        "SELECT supp_nation, cust_nation, l_year, revenue FROM tq7 "
        "ORDER BY supp_nation, cust_nation, l_year"
    )


@register(
    "tpch_mv_q8",
    oracle=f"""
SELECT o_year,
       round({_o_cents("CASE WHEN sup_nation = 'NATION_3' THEN " + _O_REV + " ELSE 0 END")}
             / {_o_cents(_O_REV)}, 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice, l_discount, n2.n_name AS sup_nation
  FROM part
  JOIN {surv_l(4)} l ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN {surv_o(4)} o ON l_orderkey = o_orderkey
  JOIN {SURV_C} c ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) v
GROUP BY o_year ORDER BY o_year
""",
)
def tpch_mv_q8(spark, sf_dir):
    """TPC-H q8 through the MV runtime (reference `views/q8.slt.part`:
    the deepest join in the suite — 8 relations including both nation
    roles): split as stacked MVs — the customer⋈nation⋈region AMERICA
    arm maintains as its own keyed MV feeding the 6-input main chain as
    a join input (the reference's view-stacking; one 7-level cascade
    exceeds the default driver heap on plan depth alone). Both nation
    roles are the REAL nation table (alias-qualified, as the reference
    spells them); p_type / o_orderdate filters push into their input
    states. The reference's n2 select-list role rides as
    `n2.n_name AS sup_nation` through the chain's alias rename."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv8_",
        ["part", "lineitem", "supplier", "orders", "customer", "region", "nation"],
        f"""
        CREATE MATERIALIZED VIEW tq8c AS
        select
          c_custkey,
          count(*) as n_roles
        from
          customer,
          nation n1,
          region
        where
          c_nationkey = n1.n_nationkey
          and n1.n_regionkey = r_regionkey
          and r_name = 'AMERICA'
        group by
          c_custkey;
        CREATE MATERIALIZED VIEW tq8 AS
        select
          CAST(extract(year from o_orderdate) AS INT) as o_year,
          round(({_s_cents("case when n2.n_name = 'NATION_3' then " + _O_REV + " else 0 end")})
                / ({_s_cents(_O_REV)}), 6) as mkt_share
        from
          part,
          lineitem,
          supplier,
          orders,
          tq8c,
          nation n2
        where
          p_partkey = l_partkey
          and s_suppkey = l_suppkey
          and l_orderkey = o_orderkey
          and o_custkey = c_custkey
          and s_nationkey = n2.n_nationkey
          and o_orderdate between timestamp '1995-01-01' and timestamp '1996-12-31'
          and p_type = 'ECONOMY'
        group by
          o_year
        order by
          o_year
        """,
        sample=4,
        rounds=1,
    )
    return eng.sql("SELECT o_year, mkt_share FROM tq8 ORDER BY o_year")


@register(
    "tpch_mv_q2",
    oracle=f"""
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice / l_quantity) AS ps_cost
  FROM {surv_l(2)} l GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM part
JOIN ps ON p_partkey = partkey
JOIN supplier ON suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
  AND ps_cost = (SELECT min(e2.ps_cost) FROM ps e2 WHERE e2.partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_mv_q2(spark, sf_dir):
    """TPC-H q2 through the MV runtime (reference `views/q2.slt.part`:
    the correlated min-cost subquery + comma joins + ORDER/LIMIT 100;
    adapted cost model, tpch.py q2): the unit-cost CTE is a stacked
    helper MV feeding the chain, the correlated min desugars onto a
    per-part helper agg MV (MV-on-MV over the CTE) inner-joined with
    the equality as residual, and the LIMIT is the TopN read bound."""
    eng = _tpch_eng(
        spark,
        sf_dir,
        "rw_tpchmv2_",
        ["part", "lineitem", "supplier", "nation", "region"],
        """
        CREATE MATERIALIZED VIEW tq2ps AS
        select
          l_partkey as partkey,
          l_suppkey as suppkey,
          min(l_extendedprice / l_quantity) as ps_cost
        from lineitem
        group by partkey, suppkey;
        CREATE MATERIALIZED VIEW tq2 AS
        select
          s_acctbal,
          s_name,
          n_name,
          p_partkey,
          p_brand
        from
          part,
          tq2ps,
          supplier,
          nation,
          region
        where
          p_partkey = partkey
          and suppkey = s_suppkey
          and s_nationkey = n_nationkey
          and n_regionkey = r_regionkey
          and r_name = 'EUROPE'
          and p_type = 'STANDARD'
          and ps_cost = (
            select min(e2.ps_cost) from tq2ps e2 where e2.partkey = p_partkey
          )
        order by
          s_acctbal desc,
          n_name,
          s_name,
          p_partkey
        LIMIT 100
        """,
        sample=2,
        rounds=1,
    )
    return eng.sql("SELECT s_acctbal, s_name, n_name, p_partkey, p_brand FROM tq2")
