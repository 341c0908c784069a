"""Query registry: every implemented operator from SURVEY.md §2 is declared
here as a named query (Spark impl) with, where SQL-expressible, a DuckDB
oracle SQL string the driver diff-tests against at sf0.01.
"""

from risingwave_spark.queries.registry import ORACLES, QUERIES, register

# Importing these modules populates the registry.
from risingwave_spark.queries import tpch  # noqa: E402,F401
from risingwave_spark.queries import relational  # noqa: E402,F401
from risingwave_spark.queries import window_funcs  # noqa: E402,F401
from risingwave_spark.queries import aggregates  # noqa: E402,F401
from risingwave_spark.queries import scalar_funcs  # noqa: E402,F401
from risingwave_spark.queries import scalar_funcs2  # noqa: E402,F401
from risingwave_spark.queries import events_stream  # noqa: E402,F401
from risingwave_spark.queries import llm_pipeline  # noqa: E402,F401
from risingwave_spark.queries import streaming_queries  # noqa: E402,F401
from risingwave_spark.queries import sources  # noqa: E402,F401
from risingwave_spark.queries import nexmark  # noqa: E402,F401
from risingwave_spark.queries import nexmark2  # noqa: E402,F401
from risingwave_spark.queries import nexmark_mv  # noqa: E402,F401
from risingwave_spark.queries import nexmark_mv2  # noqa: E402,F401
from risingwave_spark.queries import udfs  # noqa: E402,F401
from risingwave_spark.queries import ch_benchmark  # noqa: E402,F401
from risingwave_spark.queries import ch_benchmark2  # noqa: E402,F401
from risingwave_spark.queries import tpch_mv  # noqa: E402,F401
from risingwave_spark.queries import ch_benchmark_mv  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
