"""Skew mitigation operators — the 100 TB survival kit for hot keys.

The reference distributes by consistent-hash vnodes
(`src/common/src/hash/`, `docs/dev/src/design/consistent-hash.md`) and
relies on even vnode spread; Spark shuffles by key hash, so one hot key =
one hot partition. Remedies, in preference order:
1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
   default in our session) — handles moderate skew automatically.
2. Explicit salting (below) — deterministic, works for extreme skew and
   for aggregations where AQE can't split a single group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    spread_col: str | None = None,
) -> DataFrame:
    """Equi-join with the large side's hot keys spread over `n_salts`
    sub-partitions and the small side replicated n_salts× (explode).

    `spread_col`: any column of `large` whose hash varies within a key
    (a row id, a timestamp); defaults to all columns. Result is identical
    to `large.join(small, key)` — only the shuffle layout changes.
    """
    spread: Column = F.hash(*([spread_col] if spread_col else large.columns))
    lg = large.withColumn("__salt", F.pmod(spread, F.lit(n_salts)))
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lg.join(sm, [key, "__salt"]).drop("__salt")


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 8,
    scale: int = 100,
) -> DataFrame:
    """Two-phase exact-cents sum with a salt in the first phase: the hot
    group's rows spread over n_salts partial groups, then a tiny second
    shuffle combines partials. Same result as a direct groupBy-sum.

    This is the reference's StatelessSimpleAgg→HashAgg two-phase plan
    (`stateless_simple_agg.rs:25`) made explicit for single-group skew.
    """
    salted = df.withColumn("__salt", F.pmod(F.hash(value_col), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(F.round(F.col(value_col) * scale, 0).cast("long")).alias("__ps"),
        F.count(F.lit(1)).alias("__pc"),
    )
    return partial.groupBy(*keys).agg(
        (F.sum("__ps") / float(scale)).alias(f"sum_{value_col}"),
        F.sum("__pc").alias("n"),
    )
