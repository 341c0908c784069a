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


def test_subscription_cursor_exactly_once_across_restart(spark, tmp_path):
    """Subscription cursor (reference create_subscription.rs): two DML
    rounds' diffs arrive once each; an unacked fetch REDELIVERS after a
    simulated restart; an acked fetch never redelivers."""
    import tempfile

    from pyspark.sql import functions as F

    from risingwave_spark.api import Engine
    from risingwave_spark.streaming.subscription import Subscription

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE st (k int4 PRIMARY KEY, grp text, v int4)")
    eng.sql(
        "CREATE MATERIALIZED VIEW smv AS "
        "SELECT grp, count(*) AS n, sum(v) AS total FROM st GROUP BY grp"
    )
    sub = eng.create_subscription("c1", "smv")

    eng.sql("INSERT INTO st VALUES (1,'a',10),(2,'a',20),(3,'b',5)")   # round 1
    eng.sql("DELETE FROM st WHERE k = 2")                               # round 2

    got = sub.fetch()
    assert got is not None
    df, token = got
    rows = {(r.grp, r["__op"], r.n, r.total) for r in df.collect()}
    # round 1: +1 (a,2,30) and +1 (b,1,5); round 2: -1 (a,2,30), +1 (a,1,10)
    assert ("a", 1, 2, 30) in rows and ("b", 1, 1, 5) in rows
    assert ("a", -1, 2, 30) in rows and ("a", 1, 1, 10) in rows
    n_chunks = df.select("__chunk").distinct().count()
    assert n_chunks == 2

    # crash before ack → a NEW cursor object (restart) redelivers the same
    sub2 = Subscription(spark, eng.mv_handles["smv"].view.changelog_dir, "c1")
    df2, token2 = sub2.fetch()
    assert token2 == token and df2.count() == df.count()
    sub2.ack(token2)

    # caught up: nothing pending, even after another restart
    assert sub2.fetch() is None
    sub3 = Subscription(spark, eng.mv_handles["smv"].view.changelog_dir, "c1")
    assert sub3.fetch() is None

    # round 3 arrives exactly once
    eng.sql("INSERT INTO st VALUES (4,'b',7)")
    df3, token3 = sub3.fetch()
    rows3 = {(r.grp, r["__op"], r.n, r.total) for r in df3.collect()}
    assert rows3 == {("b", -1, 1, 5), ("b", 1, 2, 12)}
    sub3.ack(token3)
    assert sub3.fetch() is None


def test_subscription_via_sql(spark, tmp_path):
    """CREATE SUBSCRIPTION as SQL text."""
    from risingwave_spark.api import Engine

    eng = Engine(spark, str(tmp_path / "wh2"))
    eng.sql(
        """
        CREATE TABLE t2 (k int4 PRIMARY KEY, v int4);
        CREATE MATERIALIZED VIEW m2 AS SELECT k, v FROM t2;
        CREATE SUBSCRIPTION s2 FROM m2
        """
    )
    eng.sql("INSERT INTO t2 VALUES (1, 5)")
    df, token = eng.subscriptions["s2"].fetch()
    assert [(r.k, r.v, r["__op"]) for r in df.collect()] == [(1, 5, 1)]
