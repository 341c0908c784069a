"""risingwave_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RisingwaveLabs/risingwave (reference surveyed in
SURVEY.md), re-expressed Spark-first.

Layout:
    session     SparkSession bootstrap tuned for the local[32] harness
    catalog     parquet table registry over /root/testdata/sf*/
    functions   PG-compatible function shims (string_agg, to_char, ...)
    operators   operators Spark lacks natively (as-of join, top-n, dedup,
                similarity search, text analysis, multimodal plumbing)
    queries     the declared query inventory (Spark impl + DuckDB oracle SQL)
    streaming   materialized-view runtime on Structured Streaming
"""

from risingwave_spark.session import get_spark
from risingwave_spark.catalog import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
