"""End-to-end DDL/DML surface test: the reference-user workflow —
CREATE TABLE → CREATE MATERIALIZED VIEW → INSERT/DELETE → the MV stays
consistent with a from-scratch batch aggregate after every statement
(the reference's snapshot-equivalence invariant)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from risingwave_spark.api import Engine


def _expected(df):
    return (
        df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v") * 100, 0).cast("long")).alias("cents"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_engine_table_mv_dml_roundtrip(spark):
    data = [(i, i % 5, float(i) / 7) for i in range(200)]
    df = spark.createDataFrame(data, "id long, k long, v double")

    with tempfile.TemporaryDirectory() as wh:
        eng = Engine(spark, wh)
        eng.create_table("metrics", df, pk="id")

        def recompute(rows):
            return _expected(rows)

        eng.create_materialized_view("metrics_by_k", "metrics", ["k"], recompute)

        # MV == batch after backfill
        assert _rows(eng.sql("SELECT * FROM metrics_by_k")) == _rows(_expected(df))

        # INSERT propagates
        more = spark.createDataFrame(
            [(i, i % 5, float(i) / 7) for i in range(200, 260)], "id long, k long, v double"
        )
        eng.insert("metrics", more)
        both = df.unionByName(more)
        assert _rows(eng.sql("SELECT * FROM metrics_by_k")) == _rows(_expected(both))
        assert eng.sql("SELECT count(*) AS n FROM metrics").first().n == 260

        # DELETE retracts (including whole-group disappearance)
        eng.delete("metrics", F.col("k") == 3)
        left = both.filter(F.col("k") != 3)
        assert _rows(eng.sql("SELECT * FROM metrics_by_k")) == _rows(_expected(left))
        assert eng.sql("SELECT count(*) AS n FROM metrics_by_k WHERE k = 3").first().n == 0

        # ad-hoc SQL joins table and MV through the catalog
        j = eng.sql(
            """SELECT m.k, count(*) AS rows_in_table, max(a.n) AS mv_n
               FROM metrics m JOIN metrics_by_k a ON m.k = a.k
               GROUP BY m.k"""
        )
        for r in j.collect():
            assert r.rows_in_table == r.mv_n
