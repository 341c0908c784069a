"""Differential test: every registered query with an oracle must match
DuckDB on the sf0.01 tables — the same gate the driver runs."""

from __future__ import annotations

import pytest

from risingwave_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
