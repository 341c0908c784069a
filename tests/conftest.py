"""Shared pytest fixtures: one SparkSession per test run + the DuckDB
differential-oracle harness mirroring the driver's compare (row count,
schema arity, order-insensitive values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from risingwave_spark.catalog import TABLES
from risingwave_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("risingwave_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact: queries are written to be bit-deterministic cross-engine
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def assert_matches_oracle(spark_df, ddb_con, oracle_sql: str, name: str = "?"):
    actual = spark_df.toPandas()
    expected = ddb_con.execute(oracle_sql).fetchdf()
    assert actual.shape[0] == expected.shape[0], (
        f"{name}: row count {actual.shape[0]} != oracle {expected.shape[0]}"
    )
    assert sorted(c.lower() for c in actual.columns) == sorted(
        c.lower() for c in expected.columns
    ), f"{name}: columns {sorted(actual.columns)} != {sorted(expected.columns)}"

    cols = sorted(actual.columns, key=str.lower)
    ecols = sorted(expected.columns, key=str.lower)
    a_rows = sorted(
        tuple(_canon(v) for v in row) for row in actual[cols].itertuples(index=False, name=None)
    )
    e_rows = sorted(
        tuple(_canon(v) for v in row) for row in expected[ecols].itertuples(index=False, name=None)
    )
    if a_rows != e_rows:
        diff_a = [r for r in a_rows if r not in set(e_rows)][:5]
        diff_e = [r for r in e_rows if r not in set(a_rows)][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only rows (≤5): {diff_a}\n oracle-only rows (≤5): {diff_e}"
        )
