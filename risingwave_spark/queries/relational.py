"""Relational operator coverage: every join type, set ops, grouping sets,
limit/offset, values/series/unnest, subquery shapes, pivot/unpivot.

Parity targets (reference, SURVEY.md §2.1/§2.6):
- join types `proto/plan_common.proto:134-148` + `join/hash_join.rs:62`,
  `join/nested_loop_join.rs:45` (theta), null-safe equality
- set-op rules `rule/intersect_to_semi_join_rule.rs`,
  `rule/except_to_anti_join_rule.rs`, `rule/union_to_distinct_rule.rs`
- Expand / grouping sets `expand.rs:26`,
  `rule/grouping_sets_to_expand_rule.rs:71`
- Limit `limit.rs:30`, TopN `top_n.rs:37`, Values `values.rs:31`,
  TableFunction `table_function.rs:26`, ProjectSet `project_set.rs:34`

All Spark-side plans are declarative (Catalyst handles pushdown/pruning);
the only explicit physical hints are broadcasts of fixed-size dims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import msum, o_msum, tables


# ---------------------------------------------------------------- joins

@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice
FROM customer LEFT OUTER JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 400000.0
WHERE c_custkey < 100
ORDER BY c_custkey, o_orderkey
""",
)
def join_left_outer(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 100)
        .join(
            t["orders"].filter(F.col("o_totalprice") > 400000.0),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "join_right_outer",
    oracle="""
SELECT c_custkey, o_orderkey
FROM orders RIGHT OUTER JOIN customer ON c_custkey = o_custkey AND o_orderkey < 500
WHERE c_custkey < 100
""",
)
def join_right_outer(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 500)
        .join(
            t["customer"].filter(F.col("c_custkey") < 100),
            F.col("c_custkey") == F.col("o_custkey"),
            "right_outer",
        )
        .select("c_custkey", "o_orderkey")
    )


@register(
    "join_full_outer",
    oracle="""
SELECT a.k AS lk, b.k AS rk, a.n AS ln, b.n AS rn
FROM (SELECT c_nationkey AS k, count(*) AS n FROM customer WHERE c_acctbal > 9000 GROUP BY 1) a
FULL OUTER JOIN
     (SELECT s_nationkey AS k, count(*) AS n FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) b
  ON a.k = b.k
""",
)
def join_full_outer(spark, sf_dir):
    t = tables(spark, sf_dir)
    a = (
        t["customer"].filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("lk")).agg(F.count(F.lit(1)).alias("ln"))
    )
    b = (
        t["supplier"].filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("rk")).agg(F.count(F.lit(1)).alias("rn"))
    )
    return a.join(b, F.col("lk") == F.col("rk"), "full_outer").select("lk", "rk", "ln", "rn")


@register(
    "join_semi_anti",
    oracle="""
SELECT
  (SELECT count(*) FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)) AS n_semi,
  (SELECT count(*) FROM part WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)) AS n_anti
""",
)
def join_semi_anti(spark, sf_dir):
    t = tables(spark, sf_dir)
    big = t["lineitem"].filter(F.col("l_quantity") > 45)
    semi = t["part"].join(big, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    anti = t["part"].join(big, F.col("l_partkey") == F.col("p_partkey"), "left_anti")
    return (
        semi.agg(F.count(F.lit(1)).alias("n_semi"))
        .crossJoin(anti.agg(F.count(F.lit(1)).alias("n_anti")))
    )


@register(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation WHERE n_regionkey <> r_regionkey
ORDER BY r_name, n_name
""",
)
def join_cross(spark, sf_dir):
    """Cartesian product + theta filter → Catalyst BNLJ (NestedLoopJoin
    parity, `join/nested_loop_join.rs:45`). Only ever on bounded inputs."""
    t = tables(spark, sf_dir)
    return (
        t["region"]
        .crossJoin(t["nation"])
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("r_name", "n_name")
    )


@register(
    "join_non_equi",
    oracle="""
SELECT p_partkey, count(*) AS n_heavy
FROM part JOIN lineitem ON p_partkey = l_partkey AND l_quantity > p_size
WHERE p_partkey < 200
GROUP BY p_partkey ORDER BY p_partkey
""",
)
def join_non_equi(spark, sf_dir):
    """Equi-key + residual non-equi condition (hash join w/ filter)."""
    t = tables(spark, sf_dir)
    return (
        t["part"].filter(F.col("p_partkey") < 200)
        .join(
            t["lineitem"],
            (F.col("p_partkey") == F.col("l_partkey")) & (F.col("l_quantity") > F.col("p_size")),
        )
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_heavy"))
    )


@register(
    "join_null_safe",
    oracle="""
SELECT a.c_custkey AS ck, b.s_suppkey AS sk
FROM (SELECT c_custkey, nullif(c_nationkey, 7) AS k FROM customer WHERE c_custkey < 50) a
JOIN (SELECT s_suppkey, nullif(s_nationkey, 7) AS k FROM supplier WHERE s_suppkey < 50) b
  ON a.k IS NOT DISTINCT FROM b.k
ORDER BY ck, sk
""",
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (`IS NOT DISTINCT FROM`), parity with the
    `null_safe` ctor flag of the reference's HashJoin (`hash_join.rs:129`)."""
    t = tables(spark, sf_dir)
    a = (
        t["customer"].filter(F.col("c_custkey") < 50)
        .select("c_custkey", F.expr("nullif(c_nationkey, 7)").alias("ak"))
    )
    b = (
        t["supplier"].filter(F.col("s_suppkey") < 50)
        .select("s_suppkey", F.expr("nullif(s_nationkey, 7)").alias("bk"))
    )
    return (
        a.join(b, F.col("ak").eqNullSafe(F.col("bk")))
        .select(F.col("c_custkey").alias("ck"), F.col("s_suppkey").alias("sk"))
    )


# ---------------------------------------------------------------- set ops

@register(
    "setop_union_all",
    oracle="""
SELECT k FROM (
  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9990
  UNION ALL
  SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9990
) t ORDER BY k
""",
)
def setop_union_all(spark, sf_dir):
    t = tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_acctbal") > 9990).select(F.col("c_nationkey").alias("k"))
    b = t["supplier"].filter(F.col("s_acctbal") > 9990).select(F.col("s_nationkey").alias("k"))
    return a.unionAll(b)


@register(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
UNION
SELECT s_nationkey FROM supplier WHERE s_acctbal > 9900
ORDER BY k
""",
)
def setop_union_distinct(spark, sf_dir):
    t = tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_acctbal") > 9900).select(F.col("c_nationkey").alias("k"))
    b = t["supplier"].filter(F.col("s_acctbal") > 9900).select(F.col("s_nationkey").alias("k"))
    return a.union(b).distinct()


@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
INTERSECT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
ORDER BY k
""",
)
def setop_intersect(spark, sf_dir):
    t = tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_acctbal") > 9900).select(F.col("c_nationkey").alias("k"))
    b = t["supplier"].filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("k"))
    return a.intersect(b)


@register(
    "setop_except",
    oracle="""
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
ORDER BY k
""",
)
def setop_except(spark, sf_dir):
    t = tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_acctbal") > 9900).select(F.col("c_nationkey").alias("k"))
    b = t["supplier"].filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("k"))
    return a.subtract(b)


# ------------------------------------------------------- grouping sets

@register(
    "agg_rollup",
    oracle="""
SELECT r_name, n_name, count(*) AS n, GROUPING(r_name, n_name) AS gid
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY gid, r_name, n_name
""",
)
def agg_rollup(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .select("r_name", "n_name", "n", "gid")
    )


@register(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n, GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""",
)
def agg_cube(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .select("l_returnflag", "l_linestatus", "n", "gid")
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus, {o_msum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag, l_linestatus
""",
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — Catalyst Expand (reference `expand.rs:26`)."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(cast(round(l_quantity*100, 0) as bigint))/CAST(100.0 AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ------------------------------------------------------ order/limit/misc

@register(
    "topn_orderby_limit",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
)
def topn_orderby_limit(spark, sf_dir):
    """TopN: Spark plans orderBy+limit as TakeOrderedAndProject — heap
    top-k per partition + merge, no full sort (reference `top_n.rs:37`)."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 20
""",
)
def limit_offset(spark, sf_dir):
    t = tables(spark, sf_dir)
    return t["orders"].orderBy("o_orderkey").offset(20).limit(10).select("o_orderkey")


@register(
    "sort_nulls_order",
    oracle="""
SELECT k, v FROM (
  SELECT c_custkey AS k, nullif(c_acctbal, 0.0) AS v FROM customer WHERE c_custkey < 200
) t ORDER BY v DESC NULLS FIRST, k LIMIT 50
""",
)
def sort_nulls_order(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 200)
        .select(F.col("c_custkey").alias("k"), F.expr("nullif(c_acctbal, 0.0)").alias("v"))
        .orderBy(F.col("v").desc_nulls_first(), F.col("k"))
        .limit(50)
    )


@register(
    "distinct_project",
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer WHERE c_nationkey < 5
ORDER BY c_mktsegment, c_nationkey
""",
)
def distinct_project(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["customer"].filter(F.col("c_nationkey") < 5)
        .select("c_mktsegment", "c_nationkey").distinct()
    )


@register(
    "values_literal",
    oracle="""
SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, NULL, NULL)) t(id, tag, score)
ORDER BY id
""",
)
def values_literal(spark, sf_dir):
    """Literal rows (reference Values executor `values.rs:31`)."""
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)], "id int, tag string, score double"
    )


@register(
    "generate_series",
    oracle="""
SELECT CAST(g AS INT) AS g, CAST(g*g AS INT) AS sq FROM generate_series(1, 100) t(g) ORDER BY g
""",
)
def generate_series(spark, sf_dir):
    """generate_series TVF (reference `table_function.rs:26`); Spark:
    explode(sequence()). At scale prefer spark.range (distributed)."""
    return (
        spark.range(1, 101)
        .select(F.col("id").cast("int").alias("g"))
        .select("g", (F.col("g") * F.col("g")).cast("int").alias("sq"))
    )


@register(
    "unnest_ordinality",
    oracle="""
SELECT vec_id, CAST(i - 1 AS INT) AS pos, CAST(embedding[i] AS DOUBLE) AS e
FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)
WHERE vec_id < 3 ORDER BY vec_id, pos
""",
)
def unnest_ordinality(spark, sf_dir):
    """unnest WITH ORDINALITY (reference ProjectSet `project_set.rs:34`)
    → posexplode."""
    t = tables(spark, sf_dir)
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 3)
        .select("vec_id", F.posexplode("embedding").alias("pos", "e"))
        .select("vec_id", "pos", F.col("e").cast("double").alias("e"))
    )


@register(
    "pivot_conditional",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(round(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END * 100, 0) AS BIGINT)) AS BIGINT)/100.0 AS qty_o,
       CAST(sum(CAST(round(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END * 100, 0) AS BIGINT)) AS BIGINT)/100.0 AS qty_f
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def pivot_conditional(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(msum("l_quantity"))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


@register(
    "unpivot_stack",
    oracle="""
SELECT c_custkey, m, v FROM (
  SELECT c_custkey, 'acctbal' AS m, c_acctbal AS v FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c_custkey, 'nationkey' AS m, CAST(c_nationkey AS DOUBLE) AS v FROM customer WHERE c_custkey < 10
) t ORDER BY c_custkey, m
""",
)
def unpivot_stack(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 10)
        .select("c_custkey", F.col("c_acctbal"), F.col("c_nationkey").cast("double"))
        .unpivot("c_custkey", ["c_acctbal", "c_nationkey"], "m", "v")
        .withColumn("m", F.regexp_replace("m", "^c_", ""))
    )


@register(
    "scalar_subquery",
    oracle="""
SELECT count(*) AS n_above FROM customer
WHERE c_acctbal > (SELECT percentile_cont(0.9) WITHIN GROUP (ORDER BY c_acctbal) FROM customer)
""",
)
def scalar_subquery(spark, sf_dir):
    """Scalar subquery (MaxOneRow parity `max_one_row.rs:23`). Exact
    percentile on distinct-ish doubles is deterministic cross-engine."""
    t = tables(spark, sf_dir)
    p90 = t["customer"].agg(F.percentile(F.col("c_acctbal"), F.lit(0.9)).alias("p"))
    return (
        t["customer"]
        .join(F.broadcast(p90))
        .filter(F.col("c_acctbal") > F.col("p"))
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@register(
    "in_subquery",
    oracle="""
SELECT count(*) AS n FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderstatus = 'F'
""",
)
def in_subquery(spark, sf_dir):
    t = tables(spark, sf_dir)
    mach = t["customer"].filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return (
        t["orders"].filter(F.col("o_orderstatus") == "F")
        .join(mach, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "setop_intersect_all",
    oracle="""
SELECT c_nationkey FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 0
  INTERSECT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
) t ORDER BY c_nationkey
""",
)
def setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL (multiset semantics — the reference plans INTERSECT
    via semi-join + dedup, ALL keeps multiplicities min(l,r))."""
    t = tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_acctbal") > 0).select("c_nationkey")
    b = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return a.intersectAll(b).orderBy("c_nationkey")


@register(
    "setop_except_all",
    oracle="""
SELECT c_nationkey FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 0
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
) t ORDER BY c_nationkey
""",
)
def setop_except_all(spark, sf_dir):
    """EXCEPT ALL (multiset difference — reference except→anti-join rule,
    ALL keeps max(l−r, 0) copies)."""
    t = tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_acctbal") > 0).select("c_nationkey")
    b = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return a.exceptAll(b).orderBy("c_nationkey")


@register(
    "join_right_semi_anti",
    oracle="""
SELECT 'semi' AS kind, count(*) AS n
FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000) o
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'anti', count(*)
FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000) o
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
ORDER BY kind
""",
)
def join_right_semi_anti(spark, sf_dir):
    """Right semi / right anti joins (reference join types
    `proto/plan_common.proto:134-148`): Spark spells them by swapping the
    sides of leftsemi/leftanti — the probe/build roles the reference's
    right-variants encode physically."""
    t = tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        t["orders"].filter(F.col("o_totalprice") > 100000).select("o_custkey").distinct()
    )
    # right semi of (cust ⋈ big) == left semi with sides swapped
    semi = big.join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    anti = big.join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return (
        semi.agg(F.count(F.lit(1)).alias("n")).select(F.lit("semi").alias("kind"), "n")
        .unionByName(
            anti.agg(F.count(F.lit(1)).alias("n")).select(F.lit("anti").alias("kind"), "n")
        )
        .orderBy("kind")
    )
