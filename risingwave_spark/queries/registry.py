"""Decorator-based registry for the declared query inventory.

Each query is a callable (spark, sf_dir) -> DataFrame plus an optional
DuckDB-oracle SQL string. The driver compares both at sf0.01 by
row-count + schema + order-insensitive value-hash, so:
  - every computed column is aliased identically on both sides
  - double aggregates are rounded on both sides (summation order differs
    between engines; exact float equality is not meaningful)
  - timestamps from the ns-precision `events` table are CAST to
    microsecond TIMESTAMP in the oracle (Spark truncates ns → µs on read)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
