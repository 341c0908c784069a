"""Shared helpers for the query inventory.

Cross-engine determinism notes (Spark vs DuckDB oracle):

- Per-row IEEE double arithmetic (a*b, a+b with fixed operand order) is
  bit-identical across engines. Only *aggregation order* varies.
- Therefore big double sums use the "exact cents" pattern: round each row's
  value to a fixed scale, cast to BIGINT, sum exactly, divide once:
      sum(cast(round(x*100, 0) as bigint)) / 100.0
  This is bit-identical in both engines regardless of partitioning /
  summation order — crucial because hash-compare has zero float tolerance.
- Averages = exact-cents sum / count (single deterministic division).
- `events.ts` is stored as ns; Spark truncates to µs on read, DuckDB keeps
  ns — oracle SQL must CAST(ts AS TIMESTAMP) (µs) before use.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from risingwave_spark.catalog import load_tables

_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        _CACHE[key] = load_tables(spark, sf_dir)
    else:
        # re-register temp views in case another sf_dir overwrote them
        for name, df in _CACHE[key].items():
            df.createOrReplaceTempView(name)
    return _CACHE[key]


def footer_bounds(
    spark: SparkSession, sf_dir: str, table: str = "events", col: str = "ts"
):
    """(min, max) of a column read from the table's parquet FOOTER
    statistics — a driver-side metadata read, zero Spark jobs, and
    value-identical to ``df.agg(F.min(col), F.max(col)).first()``
    (guide §1.2: don't schedule a scan for what the file metadata
    already states; the EOWC watermark path trusts the same stats).

    Timestamp columns: µs footers are exact; ns footers floor to µs,
    the same truncation the loader applies (`ts div 1000` /
    DuckDB CAST(ts AS TIMESTAMP)); min/max commute with flooring, so
    equality with the agg holds for every shipped variant. Any missing
    or non-decodable statistic falls back to the aggregation job."""
    import datetime

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        pf = pq.ParquetFile(path)
        idx = pf.schema_arrow.names.index(col)
        md = pf.metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError("footer lacks min/max statistics")
            los.append(st.min)
            his.append(st.max)
        if not los:
            raise ValueError("no row groups")
        lo, hi = min(los), max(his)
        import pyarrow as pa

        if pa.types.is_timestamp(pf.schema_arrow.field(col).type):
            if isinstance(lo, int):  # raw ns counters: floor to µs
                epoch = datetime.datetime(1970, 1, 1)
                lo = epoch + datetime.timedelta(microseconds=lo // 1000)
                hi = epoch + datetime.timedelta(microseconds=hi // 1000)
            if not isinstance(lo, datetime.datetime):
                raise ValueError(f"undecodable timestamp statistic {lo!r}")
            # stats of tz-aware columns come back aware; the session tz
            # is UTC, so the agg's naive values are the same wall clock
            if lo.tzinfo is not None:
                lo = lo.astimezone(datetime.timezone.utc).replace(tzinfo=None)
                hi = hi.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return lo, hi
    except Exception:
        df = tables(spark, sf_dir)[table]
        return df.agg(F.min(col), F.max(col)).first()


def msum(col: Column | str, scale: int = 100) -> Column:
    """Order-independent exact sum of a double column at fixed decimal scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale, 0).cast("long")) / float(scale)


def mavg(col: Column | str, scale: int = 10000) -> Column:
    """Order-independent average: exact scaled sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return msum(c, scale) / F.count(c)


def o_msum(expr: str, scale: int = 100) -> str:
    """DuckDB SQL equivalent of msum (sum(BIGINT) is HUGEINT there → cast)."""
    return f"(CAST(sum(CAST(round(({expr})*{scale},0) AS BIGINT)) AS BIGINT)/{scale}.0)"


def o_mavg(expr: str, scale: int = 10000) -> str:
    return f"({o_msum(expr, scale)}/count({expr}))"


# DuckDB view over events with Spark-equivalent µs timestamps.
EVENTS_US = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"
