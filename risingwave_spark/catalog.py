"""Catalog shim: register the driver's parquet tables as temp views.

The reference stores tables in its own catalog (frontend catalog +
Hummock storage, `src/frontend/src/catalog/`); here a "table" is a parquet
path registered in the Spark catalog so both the DataFrame API and
`spark.sql` can reach it. Filters/projections push down to the parquet
scan via Catalyst (verify with .explain → PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from risingwave_spark.session import tune_session

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables: always broadcast-join these at any scale factor.
# At 100 TB, region/nation stay tiny (fixed cardinality) and supplier/part
# grow with SF but stay << fact tables; broadcast decisions for those are
# left to AQE, only the fixed-cardinality dims are hinted.
BROADCAST_DIMS = {"region", "nation"}


def load_tables(spark: SparkSession, sf_dir: str, register: bool = True) -> dict[str, DataFrame]:
    """Load every parquet table under `sf_dir`; register temp views.

    `events.ts` has shipped as either TIMESTAMP(MICROS) (read natively)
    or TIMESTAMP(NANOS) parquet, which Spark's reader rejects; for the
    latter we read it as raw ns-since-epoch longs (nanosAsLong) and
    truncate to µs timestamps (same truncation DuckDB applies on
    CAST(ts AS TIMESTAMP), keeping the oracle comparison exact).
    """
    tune_session(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events":
                ts_t = dict(df.dtypes).get("ts")
                if ts_t == "bigint":
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                elif ts_t == "timestamp_ntz":
                    # session tz is UTC → identical instants, but watermarks
                    # and unix_micros() demand the LTZ TIMESTAMP type
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            dfs[name] = df
            if register:
                df.createOrReplaceTempView(name)
    return dfs
