"""UDF runtimes — SURVEY.md §2.7 last row (reference
`src/expr/impl/src/udf/{python.rs, quickjs.rs, wasm.rs, external.rs}` and
`CREATE FUNCTION` / `CREATE AGGREGATE`,
`src/frontend/src/handler/create_sql_function.rs`).

The reference embeds Python/JS/WASM interpreters per-row or talks to an
arrow-udf server; Spark's native answers are:
- scalar Python UDF            → `F.udf` (row-at-a-time; slow path)
- vectorized (arrow) UDF       → `@pandas_udf` (the arrow-udf analog)
- user-defined aggregate       → `applyInPandas` grouped map
- user-defined table function  → Python UDTF (Spark 3.5+) / explode
- SQL UDF                      → `spark.sql` expression registration

Everything here is deterministic arithmetic so results are oracle-able.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


# pandas_udf needs an active SparkSession at decoration time (return-type
# parsing), so UDF objects are built lazily and cached.
_UDF_CACHE: dict[str, object] = {}


def scaled_shift():
    """Vectorized scalar UDF (Arrow-batched): v * 2 + 1."""
    if "scaled_shift" not in _UDF_CACHE:

        def _f(v: pd.Series) -> pd.Series:
            return v * 2.0 + 1.0

        _UDF_CACHE["scaled_shift"] = pandas_udf(_f, "double")
    return _UDF_CACHE["scaled_shift"]


def text_vowels():
    """Vectorized string UDF: vowel count."""
    if "text_vowels" not in _UDF_CACHE:

        def _f(s: pd.Series) -> pd.Series:
            return s.str.count("[aeiou]").astype("int64")

        _UDF_CACHE["text_vowels"] = pandas_udf(_f, "long")
    return _UDF_CACHE["text_vowels"]


def register_sql_udfs(spark) -> None:
    """SQL-surface registration (CREATE FUNCTION analog)."""
    spark.udf.register("rw_scaled_shift", scaled_shift())
    spark.udf.register("rw_text_vowels", text_vowels())


def grouped_weighted_avg(df, keys: list[str], value_col: str, weight_col: str, key_schema: str):
    """User-defined aggregate via applyInPandas (reference CREATE
    AGGREGATE, `create_aggregate.rs:1`): exact weighted average computed
    per group on Arrow batches.

    `key_schema` is the DDL for the key columns (e.g. "event_type string").
    Determinism: sums are computed on int64 cents (scaled), so partition
    order can't perturb the result.
    """
    out_schema = key_schema + ", wavg double"

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        num = (pdf[value_col] * 10000).round().astype("int64") * pdf[weight_col].astype(
            "int64"
        )
        den = pdf[weight_col].astype("int64")
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["wavg"] = [round(num.sum() / 10000.0 / den.sum(), 6)]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(agg, out_schema)
