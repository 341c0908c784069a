"""Property-based differential fuzzing — the reference's SqlSmith analog
(`src/tests/sqlsmith/README.md:1-5`): hypothesis generates random
valid-by-construction filter/group/aggregate queries from a tiny AST; each
is rendered BOTH as a Spark DataFrame plan and as DuckDB SQL and the
results must match exactly (same harness as the driver's oracle gate).

Determinism: numeric constants are drawn on a coarse grid, double sums use
the exact-cents pattern, and count/min/max are order-independent.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
OPS = ["<", "<=", ">", ">="]

predicates = st.lists(
    st.one_of(
        st.tuples(
            st.just("num"),
            st.sampled_from(NUM_COLS),
            st.sampled_from(OPS),
            st.integers(min_value=0, max_value=50),
        ),
        st.tuples(
            st.just("str"),
            st.sampled_from(sorted(STR_COLS)),
            st.just("="),
            st.integers(min_value=0, max_value=2),
        ),
    ),
    min_size=0,
    max_size=3,
)

group_keys = st.sampled_from(
    [[], ["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]]
)
agg_col = st.sampled_from(NUM_COLS)


def _render(preds, keys, vcol):
    """One AST → (spark_builder, duckdb_sql)."""
    sql_conds, spark_cond = [], F.lit(True)
    for kind, col, op, k in preds:
        if kind == "num":
            # grid constant keeps comparisons away from representation noise
            c = k / 10.0 if col in ("l_discount", "l_tax") else float(k * 100)
            sql_conds.append(f"{col} {op} {c!r}")
            spark_c = F.col(col)
            cmp = {
                "<": spark_c < c,
                "<=": spark_c <= c,
                ">": spark_c > c,
                ">=": spark_c >= c,
            }[op]
            spark_cond = spark_cond & cmp
        else:
            vals = STR_COLS[col]
            v = vals[k % len(vals)]
            sql_conds.append(f"{col} = '{v}'")
            spark_cond = spark_cond & (F.col(col) == v)
    where = (" WHERE " + " AND ".join(sql_conds)) if sql_conds else ""
    gb = ", ".join(keys)
    sel_keys = (gb + ", ") if keys else ""
    sql = (
        f"SELECT {sel_keys}count(*) AS n, "
        f"(CAST(sum(CAST(round({vcol}*100,0) AS BIGINT)) AS BIGINT)/100.0) AS s, "
        f"min({vcol}) AS mn, max({vcol}) AS mx "
        f"FROM lineitem{where}"
        + (f" GROUP BY {gb}" if keys else "")
    )

    def build(spark):
        df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(spark_cond)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col(vcol) * 100, 0).cast("long")) / 100.0).alias("s"),
            F.min(vcol).alias("mn"),
            F.max(vcol).alias("mx"),
        ]
        return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)

    return build, sql


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=predicates, keys=group_keys, vcol=agg_col)
def test_random_filter_agg_matches_duckdb(spark, ddb, preds, keys, vcol):
    build, sql = _render(preds, keys, vcol)
    assert_matches_oracle(build(spark), ddb, sql, name=sql[:120])
