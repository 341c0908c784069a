"""As-of join — an operator Spark lacks natively.

Reference: batch as-of inner/left join (`src/batch/executors/src/executor/
join/hash_join.rs` asof variants, join types `join/mod.rs:38-54`) and
streaming AsOfJoin (`src/stream/src/executor/asof_join.rs:110`).

Two strategies, both scale-out safe:

- "union": tag left/right rows, union them, and take, per key, the running
  `last(right_payload, ignorenulls=True)` over an event-time-ordered window.
  ONE shuffle on the key, no row explosion, no skew amplification: this is
  the plan you want at 100 TB (the window is computed within each key
  partition; Spark's SortMergeWindow handles spilling).
- "merge_asof": `applyInPandas` per key using pandas' merge_asof. Arrow
  batched; preferable when per-key data fits memory and you want
  forward/nearest directions that the union trick doesn't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "inner",
    right_order: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    right_ts <= left_ts and matching key. `how` ∈ {inner, left}.

    `right_order`: payload columns that break ties between right rows
    sharing a timestamp — the row with the GREATEST tuple wins. This
    folds the "dedup equal-ts right rows, keep max" pre-aggregation into
    the window's sort order, removing the pre-aggregation's own shuffle
    (the as-of key shuffle then is the join's ONLY exchange)."""
    lcols = left.columns
    # typed payload struct from the right side
    r = right.select(
        F.col(right_key).alias(key),
        F.col(right_ts).alias(left_ts),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__rpayload"),
    ).withColumn("__is_right", F.lit(1))
    l = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r.schema["__rpayload"].dataType).alias("__rpayload"),
        F.lit(0).alias("__is_right"),
    )
    r_aligned = r.select(
        *[
            F.col(c) if c in (key, left_ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        "__rpayload",
        "__is_right",
    )
    unioned = l.unionByName(r_aligned)
    # right rows at the same ts sort BEFORE left rows (<= semantics);
    # among equal-ts right rows, the greatest right_order tuple sorts
    # last so F.last() picks it. nulls FIRST so a NULL tie-break value
    # never outranks a non-null one — matching what a groupBy max()
    # pre-aggregation (which ignores NULLs) would have selected. The
    # is_right key already separates left from right rows, so the
    # tie-break only ever reorders within the right group.
    order = [F.col(left_ts).asc(), F.col("__is_right").desc()]
    for c in right_order or []:
        order.append(F.col(f"__rpayload.{c}").asc_nulls_first())
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        unioned.withColumn("__match", F.last("__rpayload", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
        .drop("__rpayload", "__is_right")
    )
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())
    out = matched.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )
    return out


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """merge_asof strategy via cogrouped applyInPandas (Arrow-batched).

    Scale note: keys are hash-partitioned; each task sorts only its keys'
    rows. Skewed keys should be pre-salted by the caller if one key's rows
    exceed executor memory.
    """
    import pandas as pd

    lcols = left.columns
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{f.name} {f.dataType.simpleString()}" for f in right.select(*payload_cols).schema.fields]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(left_ts)
        r_pdf = r_pdf.sort_values(right_ts)[[right_ts, *payload_cols]]
        if r_pdf.empty:
            merged = l_pdf.copy()
            for c in payload_cols:
                merged[c] = None
        else:
            merged = pd.merge_asof(
                l_pdf, r_pdf, left_on=left_ts, right_on=right_ts, direction="backward"
            )
        if how == "inner":
            merged = merged.dropna(subset=[payload_cols[0]])
        return merged[lcols + payload_cols]

    return left.groupBy(key).cogroup(right.groupBy(F.col(right_key).alias(key))).applyInPandas(
        merge, out_schema
    )
