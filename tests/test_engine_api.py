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


def test_engine_mv_on_mv(spark):
    """MV over MV (reference mv-on-mv.md): the upstream MV's per-batch
    diff (update pairs) maintains the downstream; both must equal
    from-scratch recomputation after inserts AND deletes."""
    data = [(i, i % 10, float(i % 13)) for i in range(300)]
    df = spark.createDataFrame(data, "id long, k long, v double")

    def mv1_q(rows):
        return rows.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v") * 100, 0).cast("long")).alias("cents"),
        )

    def mv2_key(rows):
        return rows.withColumn("parity", F.col("k") % 2)

    def mv2_q(rows):
        # rows arrive key-annotated (parity) by mv2_key
        return rows.groupBy("parity").agg(
            F.sum("n").alias("total_rows"),
            F.sum("cents").alias("total_cents"),
        )

    def expected2(base):
        return mv2_q(mv2_key(mv1_q(base)))

    with tempfile.TemporaryDirectory() as wh:
        eng = Engine(spark, wh)
        eng.create_table("m", df, pk="id")
        eng.create_materialized_view("m1", "m", ["k"], mv1_q)
        eng.create_materialized_view("m2", "m1", ["parity"], mv2_q, key_of=mv2_key)

        assert _rows(eng.sql("SELECT * FROM m2")) == _rows(expected2(df))

        more = spark.createDataFrame(
            [(i, i % 10, float(i % 13)) for i in range(300, 380)], "id long, k long, v double"
        )
        eng.insert("m", more)
        both = df.unionByName(more)
        assert _rows(eng.sql("SELECT * FROM m1")) == _rows(mv1_q(both))
        assert _rows(eng.sql("SELECT * FROM m2")) == _rows(expected2(both))

        eng.delete("m", F.col("k") == 4)
        left = both.filter(F.col("k") != 4)
        assert _rows(eng.sql("SELECT * FROM m1")) == _rows(mv1_q(left))
        assert _rows(eng.sql("SELECT * FROM m2")) == _rows(expected2(left))


def test_engine_update(spark):
    """UPDATE = UpdateDelete/UpdateInsert pair in one chunk: rows move
    between groups and the MV follows."""
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(100)], "id long, k long, v double"
    )

    def q(rows):
        return rows.groupBy("k").agg(F.count(F.lit(1)).alias("n"))

    with tempfile.TemporaryDirectory() as wh:
        eng = Engine(spark, wh)
        eng.create_table("u", df, pk="id")
        eng.create_materialized_view("u_by_k", "u", ["k"], q)
        # move every k=1 row to k=9
        eng.update("u", F.col("k") == 1, {"k": F.lit(9).cast("long")})
        moved = df.withColumn(
            "k", F.when(F.col("k") == 1, F.lit(9).cast("long")).otherwise(F.col("k"))
        )
        assert _rows(eng.sql("SELECT * FROM u_by_k")) == _rows(q(moved))
        assert eng.sql("SELECT count(*) AS n FROM u WHERE k = 1").first().n == 0
        assert eng.sql("SELECT count(*) AS n FROM u WHERE k = 9").first().n == 25
