"""SQL-text DDL/DML surface tests: the reference's front-door workflow
(`src/frontend/src/handler/mod.rs:248-260`) — CREATE TABLE, INSERT,
UPDATE, DELETE, CREATE MATERIALIZED VIEW ... AS SELECT, DROP — runs as
plain SQL text through `Engine.sql` (frontend.py)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from risingwave_spark.api import Engine


@pytest.fixture()
def eng(spark):
    return Engine(spark, tempfile.mkdtemp(prefix="rw_sqlfront_"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_insert_select(eng):
    eng.sql("CREATE TABLE items (id int8 PRIMARY KEY, name text, price float8)")
    out = eng.sql("INSERT INTO items VALUES (1, 'apple', 2.5), (2, 'pear', 3.0)")
    assert out.first().status == "INSERT 0 2"
    assert _rows(eng.sql("SELECT id, name, price FROM items")) == [
        (1, "apple", 2.5),
        (2, "pear", 3.0),
    ]


def test_insert_column_list_and_default(eng):
    eng.sql(
        "CREATE TABLE d (id int4 PRIMARY KEY, qty int4 DEFAULT 7, note text)"
    )
    eng.sql("INSERT INTO d (id) VALUES (1)")
    eng.sql("INSERT INTO d (note, id) VALUES ('hi', 2)")
    assert _rows(eng.sql("SELECT id, qty, note FROM d")) == [
        (1, 7, None),
        (2, 7, "hi"),
    ]


def test_update_and_delete(eng):
    eng.sql("CREATE TABLE t (k int4 PRIMARY KEY, v int4)")
    eng.sql("INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)")
    eng.sql("UPDATE t SET v = v + 1 WHERE k >= 2")
    eng.sql("DELETE FROM t WHERE k = 1")
    assert _rows(eng.sql("SELECT k, v FROM t")) == [(2, 21), (3, 31)]


def test_create_mv_group_by(eng):
    eng.sql("CREATE TABLE sales (id int8 PRIMARY KEY, region text, amt int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW by_region AS "
        "SELECT region, count(*) AS n, sum(amt) AS total "
        "FROM sales GROUP BY region"
    )
    eng.sql("INSERT INTO sales VALUES (1,'eu',10),(2,'eu',20),(3,'us',5)")
    eng.sql("INSERT INTO sales VALUES (4,'us',40)")
    eng.sql("DELETE FROM sales WHERE id = 2")
    assert _rows(eng.sql("SELECT region, n, total FROM by_region")) == [
        ("eu", 1, 10),
        ("us", 2, 45),
    ]
    # group disappears when its last row is deleted (reference emits Delete)
    eng.sql("DELETE FROM sales WHERE region = 'eu'")
    assert _rows(eng.sql("SELECT region FROM by_region")) == [("us",)]


def test_create_mv_derived_key_and_having(eng):
    eng.sql("CREATE TABLE ev (id int8 PRIMARY KEY, v int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW par AS "
        "SELECT v % 2 AS parity, count(*) AS n FROM ev "
        "GROUP BY v % 2 HAVING count(*) > 1"
    )
    eng.sql("INSERT INTO ev VALUES (1,1),(2,2),(3,3),(4,4),(5,6)")
    assert _rows(eng.sql("SELECT parity, n FROM par")) == [(0, 3), (1, 2)]
    eng.sql("DELETE FROM ev WHERE v = 3")
    # odd parity drops below the HAVING threshold → group vanishes
    assert _rows(eng.sql("SELECT parity, n FROM par")) == [(0, 3)]


def test_create_mv_row_grain_where(eng):
    eng.sql("CREATE TABLE logs (id int8 PRIMARY KEY, lvl text, msg text)")
    eng.sql(
        "CREATE MATERIALIZED VIEW errs AS "
        "SELECT id, msg FROM logs WHERE lvl = 'error'"
    )
    eng.sql("INSERT INTO logs VALUES (1,'info','a'),(2,'error','b'),(3,'error','c')")
    eng.sql("UPDATE logs SET lvl = 'info' WHERE id = 3")
    assert _rows(eng.sql("SELECT id, msg FROM errs")) == [(2, "b")]


def test_ctas_and_rowid_table(eng, spark):
    spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string").createOrReplaceTempView(
        "src_view"
    )
    eng.sql("CREATE TABLE copied AS SELECT a, b FROM src_view")
    assert _rows(eng.sql("SELECT a, b FROM copied")) == [(1, "x"), (2, "y")]
    # pk-less table gets a hidden _row_id; repeated inserts stay unique
    eng.sql("CREATE TABLE nopk (x int4)")
    eng.sql("INSERT INTO nopk VALUES (10), (10)")
    eng.sql("INSERT INTO nopk VALUES (10)")
    assert eng.sql("SELECT x FROM nopk").count() == 3
    ids = [r._row_id for r in eng.tables["nopk"].snapshot().collect()]
    assert len(set(ids)) == 3


def test_composite_pk_delete(eng):
    eng.sql(
        "CREATE TABLE wide (a int4, b int4, v text, PRIMARY KEY (a, b))"
    )
    eng.sql("INSERT INTO wide VALUES (1,1,'x'),(1,2,'y'),(2,1,'z')")
    eng.sql("DELETE FROM wide WHERE a = 1 AND b = 2")
    assert _rows(eng.sql("SELECT a, b, v FROM wide")) == [(1, 1, "x"), (2, 1, "z")]


def test_insert_select_self_reads_pre_insert_snapshot(eng):
    eng.sql("CREATE TABLE s (k int4 PRIMARY KEY, v int4)")
    eng.sql("INSERT INTO s VALUES (1, 100)")
    eng.sql("INSERT INTO s SELECT k + 1, v + 1 FROM s")
    assert _rows(eng.sql("SELECT k, v FROM s")) == [(1, 100), (2, 101)]


def test_drop_and_show(eng):
    eng.sql("CREATE TABLE a (k int4 PRIMARY KEY)")
    eng.sql("CREATE TABLE b (k int4 PRIMARY KEY)")
    eng.sql("CREATE MATERIALIZED VIEW amv AS SELECT k, count(*) AS n FROM a GROUP BY k")
    assert [r.name for r in eng.sql("SHOW TABLES").collect()] == ["a", "b"]
    assert [r.name for r in eng.sql("SHOW MATERIALIZED VIEWS").collect()] == ["amv"]
    with pytest.raises(ValueError, match="CASCADE"):
        eng.sql("DROP TABLE a")
    eng.sql("DROP TABLE a CASCADE")
    assert "a" not in eng.tables and "amv" not in eng.mv_handles
    eng.sql("DROP TABLE b")
    assert [r.name for r in eng.sql("SHOW TABLES").collect()] == []


def test_multi_statement_script(eng):
    out = eng.sql(
        """
        CREATE TABLE m (k int4 PRIMARY KEY, v text);
        INSERT INTO m VALUES (1, 'a; b'), (2, 'c');
        SELECT k, v FROM m
        """
    )
    assert _rows(out) == [(1, "a; b"), (2, "c")]


def test_pg_spellings_in_dml(eng):
    eng.sql("CREATE TABLE pgd (k int4 PRIMARY KEY, s text)")
    eng.sql("INSERT INTO pgd VALUES (1, 'alpha'), (2, 'beta')")
    eng.sql("DELETE FROM pgd WHERE s ~ '^b'")
    eng.sql("UPDATE pgd SET s = s || '1'::text WHERE k = 1")
    assert _rows(eng.sql("SELECT k, s FROM pgd")) == [(1, "alpha1")]


def test_unsupported_mv_shapes_raise(eng):
    eng.sql("CREATE TABLE j1 (k int4 PRIMARY KEY)")
    eng.sql("CREATE TABLE j2 (k int4 PRIMARY KEY)")
    with pytest.raises(ValueError, match="set-ops"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k FROM j1 UNION SELECT k FROM j2"
        )
    with pytest.raises(ValueError, match="spliced?|selected"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad2 AS "
            "SELECT count(*) AS n FROM j1 GROUP BY k % 2"
        )


def test_declare_fetch_batch_cursor(eng):
    eng.sql("CREATE TABLE ct (k int4 PRIMARY KEY, v text)")
    eng.sql("INSERT INTO ct VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d'),(5,'e')")
    eng.sql("DECLARE cur1 CURSOR FOR SELECT k, v FROM ct ORDER BY k")
    assert _rows(eng.sql("FETCH 2 FROM cur1")) == [(1, "a"), (2, "b")]
    assert _rows(eng.sql("FETCH NEXT FROM cur1")) == [(3, "c")]
    assert _rows(eng.sql("FETCH 10 FROM cur1")) == [(4, "d"), (5, "e")]
    assert _rows(eng.sql("FETCH 10 FROM cur1")) == []
    eng.sql("CLOSE cur1")
    import pytest

    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("FETCH 1 FROM cur1")


def test_declare_fetch_subscription_cursor(eng):
    eng.sql(
        """
        CREATE TABLE cs (k int4 PRIMARY KEY, v int4);
        CREATE MATERIALIZED VIEW csm AS SELECT k, v FROM cs;
        DECLARE sc SUBSCRIPTION CURSOR FOR csm
        """
    )
    eng.sql("INSERT INTO cs VALUES (1, 5), (2, 6)")
    got = sorted(
        (r.k, r.v, r["__op"]) for r in eng.sql("FETCH 10 FROM sc").collect()
    )
    assert got == [(1, 5, 1), (2, 6, 1)]
    eng.sql("DELETE FROM cs WHERE k = 1")
    got2 = sorted(
        (r.k, r.v, r["__op"]) for r in eng.sql("FETCH 10 FROM sc").collect()
    )
    assert got2 == [(1, 5, -1)]
    # drained: empty fetch
    assert eng.sql("FETCH 10 FROM sc").count() == 0


def test_engine_reopen_after_restart(spark, tmp_path):
    """Durability (reference: definitions live in the catalog, data in
    state tables): a new Engine over the same warehouse replays the
    recorded DDL, re-attaches table/MV/subscription state WITHOUT
    re-running backfills, and DML keeps working — including hidden
    row-id continuation."""
    wh = str(tmp_path / "wh")
    e1 = Engine(spark, wh)
    e1.sql(
        """
        CREATE TABLE rt (k int4 PRIMARY KEY, grp text, v int4);
        CREATE MATERIALIZED VIEW rmv AS
          SELECT grp, count(*) AS n, sum(v) AS total FROM rt GROUP BY grp;
        CREATE SUBSCRIPTION rsub FROM rmv;
        CREATE TABLE nk (x int4)
        """
    )
    e1.sql("INSERT INTO rt VALUES (1,'a',10),(2,'b',20)")
    e1.sql("INSERT INTO nk VALUES (7), (8)")
    df, tok = e1.subscriptions["rsub"].fetch()
    e1.subscriptions["rsub"].ack(tok)

    # simulate restart: drop session temp views, new Engine from disk
    for v in ("rt", "rmv", "nk"):
        spark.catalog.dropTempView(v)
    e2 = Engine.open(spark, wh)
    assert _rows(e2.sql("SELECT grp, n, total FROM rmv")) == [("a", 1, 10), ("b", 1, 20)]
    # DML continues to maintain the re-attached MV
    e2.sql("INSERT INTO rt VALUES (3,'a',5)")
    e2.sql("DELETE FROM rt WHERE k = 2")
    assert _rows(e2.sql("SELECT grp, n, total FROM rmv")) == [("a", 2, 15)]
    # subscription cursor resumed (acked chunks are NOT redelivered)
    got = e2.subscriptions["rsub"].fetch()
    assert got is not None
    chunks = {r["__chunk"] for r in got[0].collect()}
    assert len(chunks) == 2  # exactly the two post-restart DML rounds
    # hidden row ids continue past the persisted maximum
    e2.sql("INSERT INTO nk VALUES (9)")
    ids = [r._row_id for r in e2.tables["nk"].snapshot().collect()]
    assert len(ids) == 3 and len(set(ids)) == 3


def test_create_mv_over_dimension_join(eng, spark):
    """MV over base ⋈ dimension (temporal-join semantics: dims read fresh
    per recompute; maintenance driven by the base changelog)."""
    eng.sql("CREATE TABLE fact (id int8 PRIMARY KEY, rid int4, amt int8)")
    eng.sql("CREATE TABLE dims (rid int4 PRIMARY KEY, rname text)")
    eng.sql("INSERT INTO dims VALUES (1,'north'),(2,'south')")
    eng.sql(
        "CREATE MATERIALIZED VIEW fm AS "
        "SELECT f.rid, count(*) AS n, sum(amt) AS total, max(rname) AS rname "
        "FROM fact f JOIN dims ON f.rid = dims.rid "
        "GROUP BY f.rid"
    )
    eng.sql("INSERT INTO fact VALUES (1,1,10),(2,1,20),(3,2,5)")
    eng.sql("DELETE FROM fact WHERE id = 2")
    assert _rows(eng.sql("SELECT rid, n, total, rname FROM fm ORDER BY rid")) == [
        (1, 1, 10, "north"),
        (2, 1, 5, "south"),
    ]
    # dimension-side group keys are rejected loudly
    with pytest.raises(ValueError, match="maintained"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad3 AS "
            "SELECT rname, count(*) AS n FROM fact f JOIN dims ON f.rid = dims.rid "
            "GROUP BY rname"
        )


def test_explain_and_describe(eng):
    eng.sql("CREATE TABLE ed (k int4 PRIMARY KEY, v text)")
    desc = {(r.name, r.type) for r in eng.sql("DESCRIBE ed").collect()}
    assert ("k", "int") in desc and ("v", "string") in desc
    plan = "\n".join(r.plan for r in eng.sql("EXPLAIN SELECT k FROM ed WHERE k > 1").collect())
    assert "Physical Plan" in plan or "Scan" in plan


def test_set_and_show_variable(eng, spark):
    eng.sql("SET spark.sql.shuffle.partitions = 12")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "12"
    row = eng.sql("SHOW spark.sql.shuffle.partitions").first()
    assert (row.name, row.setting) == ("spark.sql.shuffle.partitions", "12")
    eng.sql("SET spark.sql.shuffle.partitions TO 8")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
