"""UDF-runtime coverage queries (SURVEY.md §2.7 UDF row): vectorized
pandas UDFs (the arrow-udf analog), SQL-registered UDFs, and an
applyInPandas user-defined aggregate — all deterministic and
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.functions.udf import (
    grouped_weighted_avg,
    register_sql_udfs,
    scaled_shift,
    text_vowels,
)
from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import EVENTS_US, tables


@register(
    "udf_pandas_scalar",
    oracle=f"""
SELECT event_id,
       value * 2 + 1 AS shifted,
       CAST(length(event_type) - length(regexp_replace(event_type, '[aeiou]', '', 'g')) AS BIGINT) AS vowels
FROM {EVENTS_US} e WHERE event_id < 300 ORDER BY event_id
""",
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized (Arrow-batched) scalar pandas UDFs — the reference's
    arrow-udf runtime analog (`udf/external.rs`): numeric shift + string
    vowel count, computed per Arrow batch, no per-row Python overhead."""
    t = tables(spark, sf_dir)
    register_sql_udfs(spark)
    return (
        t["events"]
        .filter(F.col("event_id") < 300)
        .select(
            "event_id",
            scaled_shift()(F.col("value")).alias("shifted"),
            text_vowels()(F.col("event_type")).alias("vowels"),
        )
        .orderBy("event_id")
    )


@register(
    "udf_grouped_agg",
    oracle=f"""
SELECT event_type,
       round(CAST(sum(CAST(round(value*10000,0) AS BIGINT) * k) AS BIGINT) / 10000.0
             / CAST(sum(k) AS BIGINT), 6) AS wavg
FROM (SELECT event_type, value, CAST(props->>'k' AS BIGINT) AS k FROM {EVENTS_US} e) s
GROUP BY event_type ORDER BY event_type
""",
)
def udf_grouped_agg(spark, sf_dir):
    """User-defined aggregate via applyInPandas (reference CREATE
    AGGREGATE): weighted average of value by props.k per event_type,
    computed exactly on scaled int64 so the oracle matches bit-for-bit."""
    t = tables(spark, sf_dir)
    d = t["events"].select(
        "event_type", "value", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return grouped_weighted_avg(d, ["event_type"], "value", "k", "event_type string").orderBy(
        "event_type"
    )
