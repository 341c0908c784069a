"""Retractable approx_count_distinct — the reference's updatable
register-bank sketch (`src/expr/impl/src/aggregate/approx_count_distinct/
mod.rs:36-44`, `updatable.rs`): an HLL variant where every register keeps
a COUNTER PER RANK instead of just the max rank, so deletes decrement
and the register value recovers as max(rank with count > 0). State per
group is O(registers × ranks) — bounded, independent of the number of
distinct values — which is the whole point vs. exact distinct-set state.

Spark-first shape: the register bank is a DataFrame
(group_keys, __reg, __rank, __cnt) stored in a _BucketedMvTable keyed by
the group columns; a changelog batch becomes per-(group, reg, rank)
count deltas (one groupBy), merged additively into the touched groups'
registers (the splice pattern — O(touched buckets) write). The estimate
is a two-level aggregation with the standard HLL bias correction and
linear-counting small-range regime, all in built-in expressions.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from risingwave_spark.streaming.mv import (
    OP_COL,
    _BucketedMvTable,
    nullsafe_cond,
)


class ApproxDistinctRetractable:
    """Per-group approx_count_distinct over a changelog (inserts AND
    deletes). `m` registers (power of two); standard error ≈ 1.04/√m,
    with linear counting well below that while registers stay sparse."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        value_col: str,
        m: int = 4096,
    ):
        if m & (m - 1):
            raise ValueError("m must be a power of two")
        self.spark = spark
        self.keys = keys
        self.value_col = value_col
        self.m = m
        self.idx_bits = int(math.log2(m))
        self.count_bits = 64 - self.idx_bits
        self.regs = _BucketedMvTable(spark, os.path.join(state_dir, "regs"), keys)

    def _deltas(self, batch: DataFrame) -> DataFrame:
        """Changelog chunk → additive (group, reg, rank) count deltas."""
        h = F.xxhash64(F.col(self.value_col))
        rest = F.shiftrightunsigned(h, self.idx_bits)
        rank = F.when(rest == 0, F.lit(self.count_bits + 1)).otherwise(
            # leading zeros within the count-bits window + 1
            F.lit(self.count_bits) - (F.length(F.bin(rest)) - 1)
        )
        return (
            batch.filter(F.col(self.value_col).isNotNull())
            .select(
                *self.keys,
                h.bitwiseAND(F.lit(self.m - 1)).alias("__reg"),
                rank.alias("__rank"),
                F.col(OP_COL).cast("long").alias("__d"),
            )
            .groupBy(*self.keys, "__reg", "__rank")
            .agg(F.sum("__d").alias("__cnt"))
            .filter(F.col("__cnt") != 0)
        )

    def apply_batch(self, batch: DataFrame) -> None:
        deltas = self._deltas(batch)
        affected = deltas.select(*self.keys).distinct()
        if not self.regs.exists():
            self.regs.write(deltas)
            return
        touched = self.regs.touched_buckets(affected)
        prev_t = self.regs.read_buckets(touched)
        untouched_t = prev_t.join(
            affected, nullsafe_cond(prev_t, affected, self.keys), "left_anti"
        )
        prev_aff = prev_t.join(
            affected, nullsafe_cond(prev_t, affected, self.keys), "left_semi"
        )
        merged = (
            prev_aff.unionByName(deltas)
            .groupBy(*self.keys, "__reg", "__rank")
            .agg(F.sum("__cnt").alias("__cnt"))
            .filter(F.col("__cnt") != 0)
        )
        self.regs.overwrite_buckets(untouched_t.unionByName(merged), touched)

    def result(self) -> DataFrame:
        """(group_keys..., approx_cnt bigint) — HLL estimate with bias
        correction and linear-counting small-range regime (Flajolet et
        al.; same regimes as the reference's estimate())."""
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        per_reg = (
            self.regs.read()
            .filter(F.col("__cnt") > 0)
            .groupBy(*self.keys, "__reg")
            .agg(F.max("__rank").alias("__r"))
        )
        per_group = per_reg.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("__used"),
            F.sum(F.pow(F.lit(2.0), -F.col("__r"))).alias("__inv_used"),
        )
        est_raw = (F.lit(alpha * m * m)) / (
            F.col("__inv_used") + (F.lit(m) - F.col("__used"))
        )
        zeros = F.lit(m) - F.col("__used")
        est = F.when(
            (est_raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(m) * F.log(F.lit(m) / zeros),  # linear counting
        ).otherwise(est_raw)
        return per_group.select(
            *self.keys, F.round(est).cast("long").alias("approx_cnt")
        )

    def state_rows(self) -> int:
        """Register rows currently stored (the O(registers) bound check)."""
        return self.regs.read().count()
