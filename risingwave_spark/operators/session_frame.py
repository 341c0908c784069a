"""SESSION over-window frames (reference
`src/expr/core/src/window_function/session.rs` — `SessionFrameBounds`:
the frame of each row is its SESSION, the maximal run of same-partition
rows whose consecutive order-column gaps are <= the declared gap;
SQL spelling `agg(x) OVER (PARTITION BY k ORDER BY ts SESSION WITH GAP
<gap>)`, parser.rs parse_window_frame_units).

Spark has no SESSION frame unit, but the semantics decompose into two
native window passes that stay entirely in whole-stage codegen:

1. mark rows starting a new session (`order - lag(order) > gap`), then a
   running sum of the marks assigns a per-partition session id — one
   sort-based window pass;
2. any aggregate over `Window.partitionBy(*keys, session_id)` IS the
   session frame aggregate — Catalyst reuses the pass-1 sort where the
   ordering allows.

Scale posture: both passes shuffle once on the partition keys (the same
shuffle), no Python, no materialization; at 100 TB this is exactly the
sessionization plan a hand-tuned pipeline would write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SESSION_ID = "__session_id"


def with_session_id(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    gap_seconds: float,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Annotate rows with their session id (0-based per partition).

    `order_col` may be numeric (gap compared directly) or a timestamp
    (gap in seconds). `tiebreak` columns make the intra-partition order
    total so ids are deterministic under ties."""
    order = [order_col, *(tiebreak or [])]
    w = W.partitionBy(*keys).orderBy(*order)
    dtype = dict(df.dtypes).get(order_col, "")
    cur, prev = F.col(order_col), F.lag(order_col).over(w)
    if "timestamp" in dtype or "date" in dtype:
        delta = cur.cast("double") - prev.cast("double")
    else:
        delta = cur - prev
    new_mark = F.when(delta <= F.lit(gap_seconds), F.lit(0)).otherwise(F.lit(1))
    return df.withColumn(
        SESSION_ID,
        F.sum(new_mark).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def session_frame_window(keys: list[str]):
    """The Window spec whose aggregates ARE the SESSION frame: call
    `F.sum(x).over(session_frame_window(keys))` on a `with_session_id`
    output (reference session.rs: frame == whole session)."""
    return W.partitionBy(*keys, SESSION_ID)
