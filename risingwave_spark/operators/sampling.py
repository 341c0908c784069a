"""Deterministic stratified sampling — the data-mix step of an LLM
training pipeline (down/up-weighting sources or languages to hit a
target mixture).

`sampleBy`'s RNG draws are seed- and partitioning-dependent; a training
pipeline wants REPRODUCIBLE membership (the same doc is in or out of
the mix on every run, on any cluster layout, for auditability and
incremental rebuilds). The standard trick: gate each row on a hash of
its stable id — `md5(id) mod 100 < rate` — so membership is a pure
function of the row. md5 is chosen over xxhash64 deliberately: every
engine computes identical md5, so the sample is cross-engine
reproducible (and DuckDB-oracle-checkable), while xxhash64 differs by
implementation seed.

Map-side only: a projection + filter, no shuffle, no RNG state — the
shape that holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_gate(id_col: str, salt: str = "") -> "F.Column":
    """Uniform [0, 100) bucket from a stable row id: the first 8 hex
    chars of md5(salt || id) as an integer mod 100."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep ~rates[group]% of each group, deterministically by row id.

    `rates` maps group values to percentages (0-100); groups absent from
    the map keep `default_rate`%. Re-running with the same salt yields
    the SAME rows; changing the salt redraws the whole sample."""
    rate = F.lit(float(default_rate))
    for g, r in rates.items():
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_gate(id_col, salt) < rate)
