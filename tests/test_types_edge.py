"""Type edge-case micro-fixtures (FIXTURES.md §4, mirroring the
reference's type tests `e2e_test/batch/types/`, `types/mod.rs:119-180`):
NaN/±Inf ordering, null-safe equality, nested struct/array/map, interval
arithmetic edge cases, decimal-ish rounding. Inline DataFrames, exact
assertions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_nan_inf_ordering_and_aggregates(spark):
    """Spark (like the reference's ordered floats) sorts NaN LAST and
    treats it as largest in max(); ±Inf behave as extremes."""
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, float("-inf")), (4, 0.0), (5, None)],
        "id int, v double",
    )
    ordered = [r.id for r in df.orderBy(F.col("v").asc_nulls_first()).collect()]
    assert ordered == [5, 3, 4, 2, 1]  # null, -inf, 0, +inf, nan
    agg = df.agg(F.max("v").alias("mx"), F.min("v").alias("mn")).first()
    assert math.isnan(agg.mx)
    assert agg.mn == float("-inf")
    # nan equals itself in DISTINCT/GROUP BY (normalized), like the reference
    assert df.select("v").distinct().count() == 5


def test_null_safe_equality(spark):
    """IS NOT DISTINCT FROM (reference null_safe joins) = eqNullSafe."""
    a = spark.createDataFrame([(1, None), (2, "x"), (3, "y")], "id int, k string")
    b = spark.createDataFrame([(10, None), (20, "x")], "id2 int, k2 string")
    j = a.join(b, a["k"].eqNullSafe(b["k2"]))
    got = sorted((r.id, r.id2) for r in j.collect())
    assert got == [(1, 10), (2, 20)]  # NULL matches NULL
    plain = a.join(b, a["k"] == b["k2"])
    assert sorted((r.id, r.id2) for r in plain.collect()) == [(2, 20)]


def test_nested_struct_array_map_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, {"a": [1, 2, 3]}, ({"x": 1.5}, "s"))],
        "id int, m map<string,array<int>>, st struct<inner:map<string,double>,tag:string>",
    )
    r = df.select(
        F.element_at(F.element_at("m", "a"), 2).alias("elem"),
        F.element_at(F.col("st.inner"), "x").alias("inner_x"),
        F.col("st.tag").alias("tag"),
        F.size(F.element_at("m", "a")).alias("n"),
    ).first()
    assert (r.elem, r.inner_x, r.tag, r.n) == (2, 1.5, "s", 3)


def test_interval_month_end_clamp(spark):
    """Month addition clamps to month end (PG + Spark agree)."""
    df = spark.createDataFrame([("2024-01-31 12:00:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    r = df.select(
        (F.col("ts") + F.expr("INTERVAL 1 MONTH")).alias("plus1"),
        F.add_months(F.col("ts").cast("date"), 1).alias("plus1_date"),
    ).first()
    assert str(r.plus1).startswith("2024-02-29")  # leap-year clamp
    assert str(r.plus1_date) == "2024-02-29"


def test_exact_cents_sum_is_partition_invariant(spark):
    """The engine's exact-cents pattern gives identical sums under any
    partitioning (the determinism the oracle gate relies on)."""
    import random

    rnd = random.Random(7)
    vals = [(i, rnd.uniform(-1000, 1000)) for i in range(5000)]
    df = spark.createDataFrame(vals, "id long, v double")
    s1 = df.repartition(1).agg(
        F.sum(F.round(F.col("v") * 100, 0).cast("long")).alias("c")
    ).first().c
    s32 = df.repartition(32).agg(
        F.sum(F.round(F.col("v") * 100, 0).cast("long")).alias("c")
    ).first().c
    assert s1 == s32


def test_decimal_cast_and_rounding(spark):
    df = spark.createDataFrame([(1.005,), (2.675,), (-1.005,)], "v double")
    got = [
        (r.d38, r.rnd)
        for r in df.select(
            F.col("v").cast("decimal(38,2)").alias("d38"),
            F.round("v", 2).alias("rnd"),
        ).collect()
    ]
    # doubles can't represent 1.005 exactly; cast/round act on the actual
    # binary value — assert the EXACT observed behavior stays stable
    for (d38, rnd), v in zip(got, [1.005, 2.675, -1.005]):
        assert abs(float(d38) - v) < 0.0051
        assert abs(rnd - v) < 0.0051


def test_time_type_engine_table(spark, tmp_path):
    """TIME columns on engine tables (reference datatype TIME support,
    previously a documented divergence): CREATE TABLE ... (t time),
    TIME literals in INSERT VALUES, ordering, casts, and restart
    re-attach all carry the typed value."""
    import datetime

    from risingwave_spark.api import Engine

    wh = str(tmp_path / "wh_time")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE shifts (id int PRIMARY KEY, start_at time)")
    eng.sql(
        "INSERT INTO shifts VALUES (1, TIME'09:30:00'), (2, TIME'17:45:30'), "
        "(3, cast('23:59:59' as time))"
    )
    got = [(r.id, r.start_at) for r in
           eng.sql("SELECT id, start_at FROM shifts ORDER BY start_at DESC").collect()]
    assert got == [
        (3, datetime.time(23, 59, 59)),
        (2, datetime.time(17, 45, 30)),
        (1, datetime.time(9, 30)),
    ]
    assert [r.h for r in eng.sql(
        "SELECT extract(hour FROM start_at) AS h FROM shifts ORDER BY id"
    ).collect()] == [9, 17, 23]
    eng2 = Engine.open(spark, wh)
    assert eng2.sql("SELECT start_at FROM shifts WHERE id = 2").first().start_at == \
        datetime.time(17, 45, 30)
