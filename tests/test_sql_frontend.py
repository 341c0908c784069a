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
    # UNION/INTERSECT/EXCEPT are supported since round 5 — the ALL
    # variants of intersect/except remain parse-time rejections
    with pytest.raises(Exception, match="INTERSECT ALL"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k FROM j1 INTERSECT ALL SELECT k FROM j2"
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
    # reference handler/explain.rs:294 — EXPLAIN ANALYZE bails the same
    # way (it must not silently explain-without-executing)
    with pytest.raises(Exception, match="analyze is not implemented"):
        eng.sql("EXPLAIN ANALYZE SELECT k FROM ed")


def test_set_and_show_variable(eng, spark):
    eng.sql("SET spark.sql.shuffle.partitions = 12")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "12"
    row = eng.sql("SHOW spark.sql.shuffle.partitions").first()
    assert (row.name, row.setting) == ("spark.sql.shuffle.partitions", "12")
    eng.sql("SET spark.sql.shuffle.partitions TO 8")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"


def test_create_mv_stream_stream_join(eng):
    """Both join inputs are engine tables → TRUE stream-stream join MV
    (reference create_mv.rs planning stream_hash_join.rs): deletes on
    EITHER side retract; group keys may come from either side."""
    eng.sql("CREATE TABLE sj_o (oid int8 PRIMARY KEY, cid int8, amt int8)")
    eng.sql("CREATE TABLE sj_c (cid2 int8 PRIMARY KEY, cname text)")
    eng.sql(
        "CREATE MATERIALIZED VIEW sj_mv AS "
        "SELECT c.cname, count(*) AS n, sum(o.amt) AS total "
        "FROM sj_o o JOIN sj_c c ON o.cid = c.cid2 "
        "GROUP BY c.cname"
    )
    eng.sql("INSERT INTO sj_o VALUES (1,1,10),(2,1,20),(3,2,5),(4,3,7)")
    eng.sql("INSERT INTO sj_c VALUES (1,'a'),(2,'b')")
    assert _rows(eng.sql("SELECT cname, n, total FROM sj_mv")) == [
        ("a", 2, 30),
        ("b", 1, 5),
    ]
    # late right row matches existing left rows; right DELETE retracts
    eng.sql("INSERT INTO sj_c VALUES (3,'c')")
    eng.sql("DELETE FROM sj_c WHERE cid2 = 1")
    eng.sql("DELETE FROM sj_o WHERE oid = 3")
    assert _rows(eng.sql("SELECT cname, n, total FROM sj_mv")) == [("c", 1, 7)]


def test_create_mv_stream_join_outer_and_residual(eng):
    eng.sql("CREATE TABLE sr_l (lk int8 PRIMARY KEY, lv int8)")
    eng.sql("CREATE TABLE sr_r (rk int8 PRIMARY KEY, rv int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW sr_mv AS "
        "SELECT l.lk, l.lv, r.rv FROM sr_l l "
        "LEFT JOIN sr_r r ON l.lk = r.rk AND r.rv > 100"
    )
    eng.sql("INSERT INTO sr_l VALUES (1,10),(2,20)")
    eng.sql("INSERT INTO sr_r VALUES (1,500),(2,50)")
    # rk=2 fails the residual → left row 2 stays null-padded
    assert _rows(eng.sql("SELECT lk, lv, rv FROM sr_mv")) == [
        (1, 10, 500),
        (2, 20, None),
    ]
    # deleting the matching right row flips row 1 back to null-padded
    eng.sql("DELETE FROM sr_r WHERE rk = 1")
    assert _rows(eng.sql("SELECT lk, lv, rv FROM sr_mv")) == [
        (1, 10, None),
        (2, 20, None),
    ]


def test_stream_join_mv_restart_and_drop(spark, tmp_path):
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE rj_a (ak int8 PRIMARY KEY, av int8)")
    eng.sql("CREATE TABLE rj_b (bk int8 PRIMARY KEY, bv int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW rj_mv AS SELECT a.ak, a.av, b.bv "
        "FROM rj_a a JOIN rj_b b ON a.ak = b.bk"
    )
    eng.sql("INSERT INTO rj_a VALUES (1,1),(2,2)")
    eng.sql("INSERT INTO rj_b VALUES (1,100),(3,300)")
    before = _rows(eng.sql("SELECT ak, av, bv FROM rj_mv"))
    assert before == [(1, 1, 100)]
    # restart: DDL replays, state re-attaches, DML keeps flowing
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("SELECT ak, av, bv FROM rj_mv")) == before
    eng2.sql("INSERT INTO rj_b VALUES (2,200)")
    assert _rows(eng2.sql("SELECT ak, av, bv FROM rj_mv")) == [
        (1, 1, 100),
        (2, 2, 200),
    ]
    # drop unhooks BOTH side subscriptions
    eng2.sql("DROP MATERIALIZED VIEW rj_mv")
    assert "rj_mv" not in eng2.mv_handles
    assert all(not t.mvs for t in eng2.tables.values())
    eng2.sql("INSERT INTO rj_a VALUES (9,9)")  # must not feed a dropped MV


def test_row_id_assignment_is_distributed(spark):
    """_assign_row_ids must not funnel the batch through a global no-key
    window (one task): the rank window partitions by input partition id,
    and ids still come out contiguous and unique."""
    from risingwave_spark.frontend import ROW_ID, _assign_row_ids

    rows = spark.range(0, 10000, 1, 8).select(F.col("id").alias("v"))
    out = _assign_row_ids(rows, 100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    ids = [r[0] for r in out.select(ROW_ID).collect()]
    assert sorted(ids) == list(range(101, 10101))


def test_subscription_cursor_fetch_streams_without_full_collect(eng, spark, monkeypatch):
    """FETCH from a subscription cursor must not collect() the whole
    changelog chunk driver-side (VERDICT r3 #3): rows arrive through
    toLocalIterator. Proven by making DataFrame.collect raise during the
    fetch — the fetch must still succeed."""
    from pyspark.sql import DataFrame as _DF

    eng.sql("CREATE TABLE big (k int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW bigmv AS SELECT k, v FROM big")
    eng.sql("CREATE SUBSCRIPTION bigsub FROM bigmv")
    spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).createOrReplaceTempView("src20k")
    eng.sql("INSERT INTO big SELECT k, v FROM src20k")
    eng.sql("DECLARE bc SUBSCRIPTION CURSOR FOR bigsub")

    real_collect = _DF.collect

    def no_collect(self):
        raise AssertionError("full-chunk collect() during cursor FETCH")

    monkeypatch.setattr(_DF, "collect", no_collect)
    try:
        out = eng.sql("FETCH 7 FROM bc")
    finally:
        monkeypatch.setattr(_DF, "collect", real_collect)
    rows = out.collect()
    assert len(rows) == 7
    # successive fetches keep streaming distinct rows
    more = eng.sql("FETCH 5 FROM bc").collect()
    seen = {r.k for r in rows} | {r.k for r in more}
    assert len(seen) == 12


def test_create_view_is_late_bound(eng):
    """CREATE VIEW (reference create_view.rs): the view re-resolves
    against table snapshots after every DML — not frozen at creation."""
    eng.sql("CREATE TABLE vt (k int4 PRIMARY KEY, v int4)")
    eng.sql("INSERT INTO vt VALUES (1, 10)")
    eng.sql("CREATE VIEW vv AS SELECT k, v * 2 AS v2 FROM vt")
    assert _rows(eng.sql("SELECT k, v2 FROM vv")) == [(1, 20)]
    eng.sql("INSERT INTO vt VALUES (2, 15)")
    eng.sql("DELETE FROM vt WHERE k = 1")
    assert _rows(eng.sql("SELECT k, v2 FROM vv")) == [(2, 30)]
    assert _rows(eng.sql("SHOW VIEWS")) == [("vv",)]
    eng.sql("DROP VIEW vv")
    assert _rows(eng.sql("SHOW VIEWS")) == []


def test_create_source_filesystem_and_gated(eng, tmp_path, spark):
    spark.range(5).select(F.col("id").alias("x")).write.parquet(str(tmp_path / "src"))
    eng.sql(
        f"CREATE SOURCE fsrc (x int8) WITH (connector='posix_fs', "
        f"posix.fs.root='{tmp_path}/src', format='parquet')"
    )
    assert _rows(eng.sql("SELECT count(*) AS n FROM fsrc")) == [(5,)]
    assert _rows(eng.sql("SHOW SOURCES")) == [("fsrc",)]
    # broker-backed source: statement accepted, descriptor recorded
    eng.sql(
        "CREATE SOURCE ksrc (a int4) WITH (connector='kafka', "
        "topic='t1', properties.bootstrap.server='b:9092')"
    )
    assert eng.sources["ksrc"]["readable"] is False
    with pytest.raises(ValueError, match="connector"):
        eng.sql("CREATE SOURCE bad (a int4) WITH (connector='carrierpigeon')")


def test_create_sink_filesystem_streams_changelog(eng, tmp_path, spark):
    eng.sql("CREATE TABLE st (k int4 PRIMARY KEY, v int4)")
    eng.sql("CREATE MATERIALIZED VIEW smv AS SELECT k, v FROM st")
    eng.sql("INSERT INTO st VALUES (1, 10), (2, 20)")
    out = str(tmp_path / "sinkout")
    eng.sql(
        f"CREATE SINK snk FROM smv WITH (connector='posix_fs', path='{out}')"
    )
    # snapshot chunk exported at creation
    snap = spark.read.option("recursiveFileLookup", "true").parquet(out)
    assert sorted((r.k, r.v, r["__op"]) for r in snap.collect()) == [(1, 10, 1), (2, 20, 1)]
    # subsequent DML appends diff chunks
    eng.sql("INSERT INTO st VALUES (3, 30)")
    eng.sql("DELETE FROM st WHERE k = 1")
    all_ops = spark.read.option("recursiveFileLookup", "true").parquet(out)
    net = {}
    for r in all_ops.collect():
        net[(r.k, r.v)] = net.get((r.k, r.v), 0) + r["__op"]
    assert {kv for kv, n in net.items() if n > 0} == {(2, 20), (3, 30)}
    # broker/remote sinks are un-gated (real wire clients) but still
    # fail loudly at creation without their required options
    with pytest.raises(ValueError, match="bootstrap"):
        eng.sql("CREATE SINK ksnk FROM smv WITH (connector='kafka', topic='t')")
    with pytest.raises(ValueError, match="table.name"):
        eng.sql("CREATE SINK jsnk FROM smv WITH (connector='jdbc', jdbc.url='x')")
    with pytest.raises(NotImplementedError, match="postgresql dialect"):
        eng.sql(
            "CREATE SINK jsnk2 FROM smv WITH (connector='jdbc', "
            "jdbc.url='jdbc:oracle:thin:@h', table.name='t')"
        )
    assert _rows(eng.sql("SHOW SINKS")) == [("snk",)]


def test_create_mv_three_way_stream_join(eng):
    """N-way stream-stream join MV: left-deep RetractableStreamJoin
    cascade; deletes on the MIDDLE table propagate through the chain."""
    eng.sql("CREATE TABLE w3_a (ak int8 PRIMARY KEY, av int8)")
    eng.sql("CREATE TABLE w3_b (bk int8 PRIMARY KEY, ak2 int8, bv int8)")
    eng.sql("CREATE TABLE w3_c (ck int8 PRIMARY KEY, bk2 int8, cv int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW w3_mv AS "
        "SELECT a.ak, sum(c.cv) AS total "
        "FROM w3_a a JOIN w3_b b ON a.ak = b.ak2 "
        "JOIN w3_c c ON b.bk = c.bk2 "
        "GROUP BY a.ak"
    )
    eng.sql("INSERT INTO w3_a VALUES (1,10),(2,20)")
    eng.sql("INSERT INTO w3_b VALUES (100,1,0),(101,1,0),(102,2,0)")
    eng.sql("INSERT INTO w3_c VALUES (1000,100,5),(1001,100,6),(1002,101,7),(1003,102,9)")
    assert _rows(eng.sql("SELECT ak, total FROM w3_mv")) == [(1, 18), (2, 9)]
    # delete in the MIDDLE table: its join rows vanish on both levels
    eng.sql("DELETE FROM w3_b WHERE bk = 100")
    assert _rows(eng.sql("SELECT ak, total FROM w3_mv")) == [(1, 7), (2, 9)]
    # late insert on the first table has no matches yet -> no group
    eng.sql("INSERT INTO w3_a VALUES (3,30)")
    assert _rows(eng.sql("SELECT ak, total FROM w3_mv")) == [(1, 7), (2, 9)]
    eng.sql("INSERT INTO w3_b VALUES (103,3,0)")
    eng.sql("INSERT INTO w3_c VALUES (1004,103,42)")
    assert _rows(eng.sql("SELECT ak, total FROM w3_mv")) == [(1, 7), (2, 9), (3, 42)]
    eng.sql("DROP MATERIALIZED VIEW w3_mv")
    assert all(not t.mvs for t in eng.tables.values())


def test_sink_from_stream_join_mv(eng, tmp_path, spark):
    """CREATE SINK / SUBSCRIPTION on a stream-join MV attaches to its agg
    level's changelog (and refuses loudly on row-grain join MVs)."""
    eng.sql("CREATE TABLE sk_a (ak int8 PRIMARY KEY, av int8)")
    eng.sql("CREATE TABLE sk_b (bk int8 PRIMARY KEY, bv int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW sk_agg AS SELECT a.ak, sum(b.bv) AS total "
        "FROM sk_a a JOIN sk_b b ON a.ak = b.bk GROUP BY a.ak"
    )
    eng.sql("INSERT INTO sk_a VALUES (1,1)")
    eng.sql("INSERT INTO sk_b VALUES (1,10)")
    out = str(tmp_path / "jsink")
    eng.sql(f"CREATE SINK jsnk FROM sk_agg WITH (connector='posix_fs', path='{out}')")
    eng.sql("INSERT INTO sk_a VALUES (2,2)")
    eng.sql("INSERT INTO sk_b VALUES (2,7)")
    net = {}
    for r in spark.read.option("recursiveFileLookup", "true").parquet(out).collect():
        net[(r.ak, r.total)] = net.get((r.ak, r.total), 0) + r["__op"]
    assert {kv for kv, n in net.items() if n > 0} == {(1, 10), (2, 7)}
    # row-grain join MV: loud refusal
    eng.sql(
        "CREATE MATERIALIZED VIEW sk_raw AS SELECT a.ak, b.bv "
        "FROM sk_a a JOIN sk_b b ON a.ak = b.bk"
    )
    with pytest.raises(ValueError, match="row-grain"):
        eng.sql(f"CREATE SINK bad FROM sk_raw WITH (connector='posix_fs', path='{tmp_path}/x')")


def test_reopen_replays_view_source_sink(spark, tmp_path):
    """Engine.open replays the whole SQL-surface catalog: views re-bind,
    file sources re-register, sinks re-attach (no snapshot rewrite) and
    keep draining post-restart DML."""
    src_dir = str(tmp_path / "srcdata")
    spark.range(4).select(F.col("id").alias("x")).write.parquet(src_dir)
    sink_dir = str(tmp_path / "sinkout")
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE rt (k int4 PRIMARY KEY, v int4)")
    eng.sql("CREATE MATERIALIZED VIEW rmv AS SELECT k, v FROM rt")
    eng.sql("CREATE VIEW rv AS SELECT k, v + 1 AS v1 FROM rt")
    eng.sql(
        f"CREATE SOURCE rsrc (x int8) WITH (connector='posix_fs', posix.fs.root='{src_dir}')"
    )
    eng.sql("INSERT INTO rt VALUES (1, 10)")
    eng.sql(f"CREATE SINK rsnk FROM rmv WITH (connector='posix_fs', path='{sink_dir}')")
    chunks_before = len(
        [d for d in __import__("os").listdir(sink_dir) if d.startswith("c")]
    )
    eng2 = Engine.open(spark, wh)
    assert sorted(eng2.views) == ["rv"]
    assert sorted(eng2.sources) == ["rsrc"]
    assert sorted(eng2.sinks) == ["rsnk"]
    # no duplicate snapshot chunk on re-attach
    import os as _os

    assert (
        len([d for d in _os.listdir(sink_dir) if d.startswith("c")]) == chunks_before
    )
    # everything still works post-restart
    assert _rows(eng2.sql("SELECT k, v1 FROM rv")) == [(1, 11)]
    assert _rows(eng2.sql("SELECT count(*) AS n FROM rsrc")) == [(4,)]
    eng2.sql("INSERT INTO rt VALUES (2, 20)")
    net = {}
    for r in spark.read.option("recursiveFileLookup", "true").parquet(sink_dir).collect():
        net[(r.k, r.v)] = net.get((r.k, r.v), 0) + r["__op"]
    assert {kv for kv, n in net.items() if n > 0} == {(1, 10), (2, 20)}


def test_view_over_dropped_table_does_not_poison_dml(eng):
    eng.sql("CREATE TABLE vp_a (k int4 PRIMARY KEY, v int4)")
    eng.sql("CREATE TABLE vp_b (k2 int4 PRIMARY KEY, w int4)")
    eng.sql("CREATE VIEW vp_v AS SELECT k, v FROM vp_a")
    eng.sql("INSERT INTO vp_a VALUES (1, 1)")
    eng.sql("DROP TABLE vp_a")
    # DML on the OTHER table must still work (the broken view is skipped)
    eng.sql("INSERT INTO vp_b VALUES (5, 50)")
    assert _rows(eng.sql("SELECT k2, w FROM vp_b")) == [(5, 50)]
    # the broken view reads as not-found, not as a stale snapshot
    with pytest.raises(Exception, match="(?i)cannot be found|not found"):
        eng.sql("SELECT * FROM vp_v").collect()


def test_sink_after_existing_subscription_does_not_double_count(eng, tmp_path, spark):
    """ADVICE r4 #1: when the MV's changelog already retains chunks (an
    earlier subscription turned emit_changelog on), a NEW sink's
    snapshot bootstrap must subscribe at the changelog HEAD — replaying
    retained diffs on top of the snapshot would double-count."""
    eng.sql("CREATE TABLE dd (k int4 PRIMARY KEY, v int4)")
    eng.sql("CREATE MATERIALIZED VIEW ddmv AS SELECT k, v FROM dd")
    # a subscription enables changelog retention BEFORE the sink exists
    eng.sql("CREATE SUBSCRIPTION ddsub FROM ddmv")
    eng.sql("INSERT INTO dd VALUES (1, 10), (2, 20)")
    eng.sql("DELETE FROM dd WHERE k = 2")
    out = str(tmp_path / "ddsink")
    eng.sql(f"CREATE SINK ddsnk FROM ddmv WITH (connector='posix_fs', path='{out}')")
    eng.sql("INSERT INTO dd VALUES (3, 30)")
    net = {}
    for r in spark.read.option("recursiveFileLookup", "true").parquet(out).collect():
        net[(r.k, r.v)] = net.get((r.k, r.v), 0) + r["__op"]
    # net content == MV content, each row exactly once (no doubled (1,10))
    assert {kv: n for kv, n in net.items() if n != 0} == {(1, 10): 1, (3, 30): 1}


def test_stream_join_mv_literal_with_alias_dot_survives(eng):
    """ADVICE r4 #2: a string literal containing '<alias>.' inside a
    stream-join-MV WHERE clause must not be corrupted by the qualifier
    stripping (unqualify runs on MASKED text, then literals restore)."""
    eng.sql("CREATE TABLE lq_a (ak int8 PRIMARY KEY, tag text)")
    eng.sql("CREATE TABLE lq_b (bk int8 PRIMARY KEY, ak2 int8, bv int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW lq_mv AS "
        "SELECT a.ak, sum(b.bv) AS total "
        "FROM lq_a a JOIN lq_b b ON a.ak = b.ak2 "
        "WHERE a.tag LIKE '%a.k%' "
        "GROUP BY a.ak"
    )
    eng.sql("INSERT INTO lq_a VALUES (1, 'xa.ky'), (2, 'plain')")
    eng.sql("INSERT INTO lq_b VALUES (10, 1, 5), (11, 2, 7)")
    # only ak=1 matches the literal '%a.k%'; a corrupted literal ('%k%')
    # would also admit ak=2 ('plain' contains no k — use tag with k)
    assert _rows(eng.sql("SELECT ak, total FROM lq_mv")) == [(1, 5)]
    # control: a tag that matches the CORRUPTED pattern but not the real
    # one must stay excluded
    eng.sql("INSERT INTO lq_a VALUES (3, 'kkk')")
    eng.sql("INSERT INTO lq_b VALUES (12, 3, 9)")
    assert _rows(eng.sql("SELECT ak, total FROM lq_mv")) == [(1, 5)]


def test_parser_rejects_unsupported_shapes_loudly(eng):
    """VERDICT r4 'What's wrong' #1: the front door is now a tokenizer +
    recursive-descent grammar (sqlparse.py) — engine-owned statements the
    grammar does not fully accept raise SqlParseError instead of falling
    through to plain spark.sql (silent loss of MV semantics)."""
    from risingwave_spark.sqlparse import SqlParseError

    eng.sql("CREATE TABLE pt (k int4 PRIMARY KEY, v int4)")
    eng.sql("CREATE TABLE pt2 (k2 int4 PRIMARY KEY, v2 int4)")
    # subquery in FROM of a CREATE MV
    with pytest.raises(SqlParseError, match="subquery in FROM"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k, n FROM (SELECT k, count(*) AS n FROM pt GROUP BY k) s"
        )
    # JOIN ... USING with a mismatched column still fails loudly (the
    # supported USING/NATURAL spellings compile via the dimension path —
    # see test_create_mv_using_and_natural_join)
    with pytest.raises(SqlParseError, match="USING column"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k FROM pt JOIN pt2 USING ()"
        )
    # subquery in the SELECT list (WHERE/HAVING subqueries now desugar
    # onto join steps — see test_create_mv_subquery_desugar)
    with pytest.raises(SqlParseError, match="subquer"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k, (SELECT max(v) FROM pt) AS mx FROM pt"
        )
    # whole-table window (no PARTITION BY): not incrementally
    # maintainable — loud handler error (partitioned OVER now compiles,
    # see test_over_window_mv_sql)
    with pytest.raises(ValueError, match="PARTITION BY"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k, row_number() OVER (ORDER BY v) AS rn FROM pt"
        )
    # LIMIT without ORDER BY has no deterministic top-k to maintain
    # (ORDER BY ... LIMIT compiles to the TopN read path)
    with pytest.raises(SqlParseError, match="LIMIT"):
        eng.sql("CREATE MATERIALIZED VIEW bad AS SELECT k, v FROM pt LIMIT 5")
    # comma FROM list with NO connecting equi predicate = a true cross
    # join — rejected at desugar (comma joins WITH equi predicates in
    # WHERE compile onto the join chain, see test_create_mv_comma_join)
    with pytest.raises(ValueError, match="cross join"):
        eng.sql("CREATE MATERIALIZED VIEW bad AS SELECT k FROM pt, pt2")
    # engine-owned statement kinds never silently reach Catalyst
    with pytest.raises(SqlParseError, match="CREATE INDEX"):
        eng.sql("CREATE INDEX idx ON pt (k)")
    with pytest.raises(SqlParseError):
        eng.sql("DELETE FROM pt USING pt2 WHERE pt.k = pt2.k2")
    with pytest.raises(SqlParseError):
        eng.sql("INSERT INTO pt DEFAULT VALUES")
    # nothing above leaked a half-created MV
    assert "bad" not in eng.mv_handles
    # ad-hoc queries still flow to Catalyst by design
    assert eng.sql("SELECT 1 AS one").first().one == 1


def test_watermark_eowc_mv_sql(eng, spark):
    """WATERMARK FOR + EMIT ON WINDOW CLOSE DDL (reference
    binder/relation/watermark.rs, optimizer/mod.rs:474-630): ordered
    batches emit closed windows exactly once; late rows are dropped."""
    eng.sql(
        """
        CREATE TABLE wt (
            id int8 PRIMARY KEY, v float8, ts timestamp,
            WATERMARK FOR ts AS ts - INTERVAL '10 minutes'
        ) APPEND ONLY;
        CREATE MATERIALIZED VIEW wmv AS
        SELECT window_start AS ws, count(*) AS n
        FROM TUMBLE(wt, ts, INTERVAL '1 hour')
        GROUP BY window_start
        EMIT ON WINDOW CLOSE
        """
    )
    eng.sql(
        "INSERT INTO wt VALUES "
        "(1, 1.0, TIMESTAMP '2024-01-01 00:05:00'),"
        "(2, 1.0, TIMESTAMP '2024-01-01 00:55:00'),"
        "(3, 1.0, TIMESTAMP '2024-01-01 01:30:00')"
    )
    # watermark = 01:20 → window [00:00,01:00) closed with 2 rows
    assert _rows(eng.sql("SELECT n FROM wmv")) == [(2,)]
    # late row for the closed window (ts 00:10 <= wm) → dropped
    eng.sql(
        "INSERT INTO wt VALUES (4, 1.0, TIMESTAMP '2024-01-01 00:10:00'),"
        "(5, 1.0, TIMESTAMP '2024-01-01 02:15:00')"
    )
    # wm = 02:05 → [01:00,02:00) closes with ONLY row 3
    assert _rows(eng.sql("SELECT n FROM wmv ORDER BY ws")) == [(1,), (2,)]


def test_eowc_mv_rejects_deletes_and_requires_watermark(eng):
    # watermark without APPEND ONLY is rejected at CREATE TABLE
    # (reference create_table.rs:828)
    with pytest.raises(Exception, match="APPEND ONLY"):
        eng.sql(
            "CREATE TABLE wtx (id int8 PRIMARY KEY, ts timestamp, "
            "WATERMARK FOR ts AS ts - INTERVAL '1 minutes')"
        )
    eng.sql(
        """
        CREATE TABLE wt2 (
            id int8 PRIMARY KEY, ts timestamp,
            WATERMARK FOR ts AS ts - INTERVAL '1 minutes'
        ) APPEND ONLY
        """
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW wmv2 AS SELECT window_start AS ws, "
        "count(*) AS n FROM TUMBLE(wt2, ts, INTERVAL '1 hour') "
        "GROUP BY window_start EMIT ON WINDOW CLOSE"
    )
    eng.sql("INSERT INTO wt2 VALUES (1, TIMESTAMP '2024-01-01 03:00:00')")
    # rejected BEFORE any state mutation — the table keeps its row
    with pytest.raises(Exception, match="APPEND ONLY"):
        eng.sql("DELETE FROM wt2 WHERE id = 1")
    with pytest.raises(Exception, match="APPEND ONLY"):
        eng.sql("UPDATE wt2 SET id = 2 WHERE id = 1")
    assert _rows(eng.sql("SELECT id FROM wt2")) == [(1,)]
    # no watermark on the tumble column → loud error
    eng.sql("CREATE TABLE nowm (id int8 PRIMARY KEY, ts timestamp)")
    with pytest.raises(Exception, match="WATERMARK"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT window_start AS ws, "
            "count(*) AS n FROM TUMBLE(nowm, ts, INTERVAL '1 hour') "
            "GROUP BY window_start EMIT ON WINDOW CLOSE"
        )
    # TUMBLE without EOWC = eagerly-maintained windowed MV (no watermark
    # needed; every open window stays current)
    eng.sql(
        "CREATE MATERIALIZED VIEW wt2_eager AS SELECT window_start AS ws, "
        "count(*) AS n FROM TUMBLE(wt2, ts, INTERVAL '1 hour') "
        "GROUP BY window_start"
    )
    assert _rows(eng.sql("SELECT n FROM wt2_eager")) == [(1,)]


def test_eowc_mv_restart_replay(spark, tmp_path):
    wh = str(tmp_path / "wh_eowc")
    eng = Engine(spark, wh)
    eng.sql(
        """
        CREATE TABLE rt (
            id int8 PRIMARY KEY, ts timestamp,
            WATERMARK FOR ts AS ts - INTERVAL '5 minutes'
        ) APPEND ONLY;
        CREATE MATERIALIZED VIEW rmv AS
        SELECT window_start AS ws, count(*) AS n
        FROM TUMBLE(rt, ts, INTERVAL '1 hour')
        GROUP BY window_start EMIT ON WINDOW CLOSE
        """
    )
    eng.sql(
        "INSERT INTO rt VALUES (1, TIMESTAMP '2024-01-01 00:30:00'),"
        "(2, TIMESTAMP '2024-01-01 01:10:00')"
    )
    before = _rows(eng.sql("SELECT ws, n FROM rmv"))
    assert before == [(__import__("datetime").datetime(2024, 1, 1, 0, 0), 1)]
    eng2 = Engine.open(spark, wh)
    # no re-emission on replay; watermark is durable (late row dropped)
    assert _rows(eng2.sql("SELECT ws, n FROM rmv")) == before
    eng2.sql("INSERT INTO rt VALUES (3, TIMESTAMP '2024-01-01 00:40:00')")
    assert _rows(eng2.sql("SELECT ws, n FROM rmv")) == before
    eng2.sql("INSERT INTO rt VALUES (4, TIMESTAMP '2024-01-01 02:30:00')")
    assert _rows(eng2.sql("SELECT n FROM rmv ORDER BY ws")) == [(1,), (1,)]


def test_temporal_join_sql(eng):
    eng.sql(
        """
        CREATE TABLE tjf (fid int8 PRIMARY KEY, k int8, qty float8);
        CREATE TABLE tjd (k int8 PRIMARY KEY, rate float8);
        INSERT INTO tjd VALUES (1, 10.0), (2, 20.0);
        CREATE MATERIALIZED VIEW tjm AS
        SELECT fid, qty, rate, qty * rate AS amount
        FROM tjf f
        JOIN tjd FOR SYSTEM_TIME AS OF PROCTIME() d ON f.k = d.k
        """
    )
    eng.sql("INSERT INTO tjf VALUES (100, 1, 2.0), (101, 2, 3.0)")
    eng.sql("UPDATE tjd SET rate = 99.0 WHERE k = 1")
    eng.sql("INSERT INTO tjf VALUES (102, 1, 4.0)")
    assert _rows(eng.sql("SELECT fid, rate, amount FROM tjm")) == [
        (100, 10.0, 20.0),  # joined dim version at its arrival
        (101, 20.0, 60.0),
        (102, 99.0, 396.0),  # sees the updated version
    ]


def test_cdc_table_ingests_and_polls(spark, tmp_path):
    import json

    cdc = tmp_path / "cdc"
    cdc.mkdir()

    def seg(name, events):
        (cdc / name).write_text("\n".join(json.dumps(e) for e in events))

    seg(
        "s0.json",
        [
            {"after": {"id": 1, "v": 10.0}, "op": "c"},
            {"after": {"id": 2, "v": 20.0}, "op": "c"},
        ],
    )
    seg(
        "s1.json",
        [
            {"before": {"id": 2, "v": 20.0}, "after": {"id": 2, "v": 25.0}, "op": "u"},
            {"before": {"id": 1, "v": 10.0}, "op": "d"},
        ],
    )
    wh = str(tmp_path / "wh_cdc")
    eng = Engine(spark, wh)
    eng.sql(
        f"""
        CREATE TABLE ct (id int8 PRIMARY KEY, v float8)
        WITH (connector = 'posix_fs', path = '{cdc}') FORMAT DEBEZIUM;
        CREATE MATERIALIZED VIEW cmv AS
        SELECT v, count(*) AS n FROM ct GROUP BY v
        """
    )
    assert _rows(eng.sql("SELECT id, v FROM ct")) == [(2, 25.0)]
    seg("s2.json", [{"after": {"id": 3, "v": 30.0}, "op": "c"}])
    eng.poll_sources()
    assert _rows(eng.sql("SELECT id, v FROM ct")) == [(2, 25.0), (3, 30.0)]
    # restart: CDC_FILES is durable — no double ingestion, new files fold
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("SELECT id, v FROM ct")) == [(2, 25.0), (3, 30.0)]
    seg("s3.json", [{"before": {"id": 3, "v": 30.0}, "op": "d"}])
    eng2.poll_sources()
    assert _rows(eng2.sql("SELECT id, v FROM ct")) == [(2, 25.0)]


def test_grammar_accepts_new_clauses_and_rejects_bad(eng):
    from risingwave_spark.sqlparse import SqlParseError, classify

    assert classify(
        "CREATE TABLE t (id int8 PRIMARY KEY, ts timestamp, "
        "WATERMARK FOR ts AS ts - INTERVAL '5 minutes') APPEND ONLY"
    ) == "create_table"
    assert classify(
        "CREATE TABLE t (id int8 PRIMARY KEY) "
        "WITH (connector = 'posix_fs', path = '/x') FORMAT DEBEZIUM ENCODE JSON"
    ) == "create_table"
    assert classify(
        "CREATE MATERIALIZED VIEW m AS SELECT window_start AS ws, count(*) AS n "
        "FROM TUMBLE(t, ts, INTERVAL '1 hour') GROUP BY window_start "
        "EMIT ON WINDOW CLOSE"
    ) == "create_mv"
    assert classify(
        "CREATE MATERIALIZED VIEW m AS SELECT a FROM f "
        "JOIN d FOR SYSTEM_TIME AS OF PROCTIME() x ON f.k = x.k"
    ) == "create_mv"
    with pytest.raises(SqlParseError):  # bad version selector
        classify(
            "CREATE MATERIALIZED VIEW m AS SELECT a FROM f "
            "JOIN d FOR SYSTEM_TIME AS OF NOW() ON f.k = d.k"
        )
    assert classify(
        "CREATE MATERIALIZED VIEW m AS SELECT window_start AS ws, count(*) AS n "
        "FROM HOP(t, ts, INTERVAL '10 minutes', INTERVAL '1 hour') "
        "GROUP BY window_start"
    ) == "create_mv"
    with pytest.raises(SqlParseError):  # SESSION TVF unsupported
        classify(
            "CREATE MATERIALIZED VIEW m AS SELECT count(*) AS n "
            "FROM SESSION(t, ts, INTERVAL '10 minutes') GROUP BY 1"
        )


def test_alter_table_add_drop_column(spark, tmp_path):
    """ALTER TABLE ADD/DROP COLUMN (reference
    `handler/alter_table_column.rs`): one compaction pass rewrites the
    state; existing rows take the DEFAULT (else NULL); replay after
    restart is idempotent; pk and MV-dependent restrictions are loud."""
    wh = str(tmp_path / "wh_alter")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE at (id int8 PRIMARY KEY, v int4)")
    eng.sql("INSERT INTO at VALUES (1, 10), (2, 20)")
    eng.sql("ALTER TABLE at ADD COLUMN w int4 DEFAULT 5")
    eng.sql("INSERT INTO at VALUES (3, 30, 7)")
    assert _rows(eng.sql("SELECT id, v, w FROM at")) == [
        (1, 10, 5), (2, 20, 5), (3, 30, 7),
    ]
    # INSERT without the new column takes its DEFAULT
    eng.sql("INSERT INTO at (id, v) VALUES (4, 40)")
    assert _rows(eng.sql("SELECT w FROM at WHERE id = 4")) == [(5,)]
    eng.sql("ALTER TABLE at DROP COLUMN v")
    assert _rows(eng.sql("SELECT id, w FROM at")) == [
        (1, 5), (2, 5), (3, 7), (4, 5),
    ]
    with pytest.raises(Exception, match="primary-key"):
        eng.sql("ALTER TABLE at DROP COLUMN id")
    # restart: CREATE (old coldefs) + replayed ALTERs reproduce the shape
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("SELECT id, w FROM at")) == [
        (1, 5), (2, 5), (3, 7), (4, 5),
    ]
    eng2.sql("CREATE MATERIALIZED VIEW atv AS SELECT w, count(*) AS n FROM at GROUP BY w")
    with pytest.raises(Exception, match="dependent materialized"):
        eng2.sql("ALTER TABLE at ADD COLUMN z int4")


def test_show_create_and_alter_grammar(eng):
    from risingwave_spark.sqlparse import SqlParseError, classify

    eng.sql("CREATE TABLE sc (id int8 PRIMARY KEY, v text)")
    out = _rows(eng.sql("SHOW CREATE TABLE sc"))
    assert out[0][0] == "sc" and "CREATE TABLE sc" in out[0][1]
    eng.sql("CREATE MATERIALIZED VIEW scv AS SELECT v, count(*) AS n FROM sc GROUP BY v")
    out = _rows(eng.sql("SHOW CREATE MATERIALIZED VIEW scv"))
    assert "MATERIALIZED VIEW scv" in out[0][1]
    assert classify("ALTER TABLE t ADD COLUMN x int8 DEFAULT 3") == "alter_table"
    assert classify("ALTER TABLE t DROP COLUMN x") == "alter_table"
    # ALTER ... RENAME TO is supported since round 5
    assert classify("ALTER TABLE t RENAME TO u") == "alter_rename"
    # ALTER SYSTEM SET is supported since round-5 session 3
    assert classify("ALTER SYSTEM SET x = 1") == "alter_system"
    with pytest.raises(SqlParseError):
        classify("ALTER SYSTEM RESET everything")


def test_tumble_hop_eager_mv_sql(eng):
    """Eager TUMBLE/HOP windowed MVs (reference hop_window.rs row
    expansion): every covering window maintained under inserts AND
    deletes, no watermark."""
    eng.sql(
        """
        CREATE TABLE wev (id int8 PRIMARY KEY, v int8, ts timestamp);
        CREATE MATERIALIZED VIEW tmv AS
        SELECT window_start AS ws, count(*) AS n, sum(v) AS total
        FROM TUMBLE(wev, ts, INTERVAL '1 hour')
        GROUP BY window_start;
        CREATE MATERIALIZED VIEW hmv AS
        SELECT window_start AS ws, count(*) AS n
        FROM HOP(wev, ts, INTERVAL '30 minutes', INTERVAL '1 hour')
        GROUP BY window_start
        """
    )
    eng.sql(
        "INSERT INTO wev VALUES "
        "(1, 10, TIMESTAMP '2024-01-01 00:10:00'),"
        "(2, 20, TIMESTAMP '2024-01-01 00:40:00'),"
        "(3, 30, TIMESTAMP '2024-01-01 01:10:00')"
    )
    assert _rows(eng.sql("SELECT ws, n, total FROM tmv ORDER BY ws")) == [
        (__import__("datetime").datetime(2024, 1, 1, 0, 0), 2, 30),
        (__import__("datetime").datetime(2024, 1, 1, 1, 0), 1, 30),
    ]
    # hop: each row covers 2 windows (size/slide = 2)
    import datetime as _dt

    assert _rows(eng.sql("SELECT ws, n FROM hmv ORDER BY ws")) == [
        (_dt.datetime(2023, 12, 31, 23, 30), 1),
        (_dt.datetime(2024, 1, 1, 0, 0), 2),
        (_dt.datetime(2024, 1, 1, 0, 30), 2),
        (_dt.datetime(2024, 1, 1, 1, 0), 1),
    ]
    # retraction: deleting row 2 updates every window it covered
    eng.sql("DELETE FROM wev WHERE id = 2")
    assert _rows(eng.sql("SELECT ws, n FROM hmv ORDER BY ws")) == [
        (_dt.datetime(2023, 12, 31, 23, 30), 1),
        (_dt.datetime(2024, 1, 1, 0, 0), 1),
        (_dt.datetime(2024, 1, 1, 0, 30), 1),
        (_dt.datetime(2024, 1, 1, 1, 0), 1),
    ]
    assert _rows(eng.sql("SELECT ws, total FROM tmv ORDER BY ws")) == [
        (_dt.datetime(2024, 1, 1, 0, 0), 10),
        (_dt.datetime(2024, 1, 1, 1, 0), 30),
    ]
    with pytest.raises(Exception, match="window_start in GROUP BY"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT v, count(*) AS n "
            "FROM TUMBLE(wev, ts, INTERVAL '1 hour') GROUP BY v"
        )
    with pytest.raises(Exception, match="multiple"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad2 AS SELECT window_start AS ws, "
            "count(*) AS n FROM HOP(wev, ts, INTERVAL '7 minutes', "
            "INTERVAL '10 minutes') GROUP BY window_start"
        )


def test_flush_wait_recover(eng):
    """FLUSH/WAIT (reference handler/flush.rs, wait.rs — barrier-commit
    waits; synchronous engine → already committed) and RECOVER
    (handler/recover.rs — re-pin catalog registrations)."""
    eng.sql("CREATE TABLE fw (k int4 PRIMARY KEY, v int4)")
    eng.sql("INSERT INTO fw VALUES (1, 10)")
    assert eng.sql("FLUSH").first().status == "FLUSH"
    assert eng.sql("WAIT").first().status == "WAIT"
    assert eng.sql("RECOVER").first().status == "RECOVER"
    assert _rows(eng.sql("SELECT k, v FROM fw")) == [(1, 10)]


def test_sink_from_eowc_mv(eng, tmp_path, spark):
    """CREATE SINK FROM an EMIT ON WINDOW CLOSE MV (the reference's
    force_append_only sink path): emissions are insert-only changelog
    chunks; the sink bootstraps from the already-emitted snapshot and
    streams later window closes."""
    sink_dir = str(tmp_path / "eowc_sink")
    eng.sql(
        """
        CREATE TABLE se (id int8 PRIMARY KEY, ts timestamp,
            WATERMARK FOR ts AS ts - INTERVAL '5 minutes') APPEND ONLY;
        CREATE MATERIALIZED VIEW semv AS
        SELECT window_start AS ws, count(*) AS n
        FROM TUMBLE(se, ts, INTERVAL '1 hour')
        GROUP BY window_start EMIT ON WINDOW CLOSE
        """
    )
    eng.sql(
        "INSERT INTO se VALUES (1, TIMESTAMP '2024-01-01 00:30:00'),"
        "(2, TIMESTAMP '2024-01-01 01:10:00')"
    )  # closes [00:00, 01:00) with 1 row
    eng.sql(f"CREATE SINK esink FROM semv WITH (connector = 'posix_fs', path = '{sink_dir}')")
    eng.sql(
        "INSERT INTO se VALUES (3, TIMESTAMP '2024-01-01 01:20:00'),"
        "(4, TIMESTAMP '2024-01-01 02:30:00')"
    )  # closes [01:00, 02:00) with 2 rows
    import os as _os

    chunks = sorted(d for d in _os.listdir(sink_dir) if d.startswith("c"))
    assert chunks == ["c0", "c1"]
    got = sorted(
        (r["ws"].hour, r["n"], r["__op"])
        for r in spark.read.parquet(*[f"{sink_dir}/{c}" for c in chunks])
        .selectExpr("ws", "n", "__op").collect()
    )
    assert got == [(0, 1, 1), (1, 2, 1)]


def test_windowed_mv_restart_replay(spark, tmp_path):
    """TUMBLE/HOP eager MVs re-attach their bucketed state on replay (no
    re-backfill) and keep maintaining after the restart."""
    wh = str(tmp_path / "wh_wmv")
    eng = Engine(spark, wh)
    eng.sql(
        """
        CREATE TABLE rw (id int8 PRIMARY KEY, ts timestamp);
        CREATE MATERIALIZED VIEW rwmv AS
        SELECT window_start AS ws, count(*) AS n
        FROM HOP(rw, ts, INTERVAL '30 minutes', INTERVAL '1 hour')
        GROUP BY window_start
        """
    )
    eng.sql("INSERT INTO rw VALUES (1, TIMESTAMP '2024-01-01 00:10:00')")
    before = _rows(eng.sql("SELECT ws, n FROM rwmv"))
    assert len(before) == 2  # one row covers size/slide = 2 windows
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("SELECT ws, n FROM rwmv")) == before
    eng2.sql("INSERT INTO rw VALUES (2, TIMESTAMP '2024-01-01 00:20:00')")
    assert _rows(eng2.sql("SELECT n FROM rwmv")) == [(2,), (2,)]
    eng2.sql("DELETE FROM rw WHERE id = 1")
    assert _rows(eng2.sql("SELECT n FROM rwmv")) == [(1,), (1,)]


def test_datagen_source_deterministic_and_bounded(eng):
    """Datagen connector (reference src/connector/src/source/datagen/):
    sequence extent fixes row count; random fields are deterministic
    per (row, seed) and bounded; timestamp kind offsets from a base."""
    eng.sql(
        """
        CREATE SOURCE dgt (id int8, score float8, label text, ts timestamp)
        WITH (
            connector = 'datagen',
            fields.id.kind = 'sequence',
            fields.id.start = '1', fields.id.end = '50',
            fields.score.kind = 'random',
            fields.score.min = '5', fields.score.max = '9',
            fields.score.seed = '7',
            fields.label.kind = 'random',
            fields.ts.kind = 'random',
            fields.ts.min = '0', fields.ts.max = '3600',
            fields.ts.base = '2024-06-01 00:00:00'
        )
        """
    )
    rows = eng.sql("SELECT * FROM dgt ORDER BY id").collect()
    assert len(rows) == 50 and rows[0]["id"] == 1 and rows[-1]["id"] == 50
    assert all(5 <= r["score"] <= 9 for r in rows)
    assert all(r["label"].startswith("label_") for r in rows)
    import datetime

    base = datetime.datetime(2024, 6, 1)
    assert all(
        base <= r["ts"] <= base + datetime.timedelta(hours=1) for r in rows
    )
    # deterministic: a second read regenerates identical rows
    again = eng.sql("SELECT * FROM dgt ORDER BY id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_over_window_mv_sql(eng):
    """Over-window MV in SQL (reference stream_over_window.rs planning):
    fn(...) OVER (PARTITION BY ... ORDER BY ...) compiles onto
    MaterializedOverWindowDelta — suffix recompute + retraction."""
    eng.sql(
        """
        CREATE TABLE owt (id int8 PRIMARY KEY, grp int8, v int8);
        CREATE MATERIALIZED VIEW owmv AS
        SELECT grp, id, v,
               row_number() OVER (PARTITION BY grp ORDER BY id) AS rn,
               sum(v) OVER (PARTITION BY grp ORDER BY id) AS rsum,
               lag(v) OVER (PARTITION BY grp ORDER BY id) AS prev,
               max(v) OVER (PARTITION BY grp ORDER BY id
                            ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS m2
        FROM owt
        """
    )
    eng.sql(
        "INSERT INTO owt VALUES (1,1,10),(2,1,5),(4,2,7)"
    )
    eng.sql("INSERT INTO owt VALUES (3,1,20),(5,2,1)")
    assert _rows(eng.sql("SELECT grp, id, rn, rsum, prev, m2 FROM owmv")) == [
        (1, 1, 1, 10, None, 10),
        (1, 2, 2, 15, 10, 10),
        (1, 3, 3, 35, 5, 20),
        (2, 4, 1, 7, None, 7),
        (2, 5, 2, 8, 7, 7),
    ]
    # retraction: delete a mid-partition row — suffix renumbers
    eng.sql("DELETE FROM owt WHERE id = 2")
    assert _rows(eng.sql("SELECT grp, id, rn, rsum, prev FROM owmv")) == [
        (1, 1, 1, 10, None),
        (1, 3, 2, 30, 10),
        (2, 4, 1, 7, None),
        (2, 5, 2, 8, 7),
    ]
    # unsupported shapes stay loud
    with pytest.raises(Exception, match="share the same"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT grp, id, "
            "row_number() OVER (PARTITION BY grp ORDER BY id) AS a, "
            "row_number() OVER (PARTITION BY v ORDER BY id) AS b FROM owt"
        )
    with pytest.raises(Exception, match="DESC"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad2 AS SELECT grp, id, "
            "row_number() OVER (PARTITION BY grp ORDER BY id DESC) AS a FROM owt"
        )
    # subscriptions deliver the over-window MV's Update pairs
    eng.sql("CREATE SUBSCRIPTION s1 FROM owmv")
    eng.sql("INSERT INTO owt VALUES (6, 2, 9)")
    got = eng.subscriptions["s1"].fetch()
    assert got is not None
    chunk, token = got
    ops = sorted(
        (r["grp"], r["id"], r["rn"], r["__op"]) for r in chunk.collect()
    )
    # partition 2's suffix replaced: old rows retracted, new emitted
    assert (2, 6, 3, 1) in ops and all(g == 2 for g, *_ in ops)
    eng.subscriptions["s1"].ack(token)


def test_over_window_mv_sql_restart(spark, tmp_path):
    wh = str(tmp_path / "wh_ow")
    eng = Engine(spark, wh)
    eng.sql(
        """
        CREATE TABLE owr (id int8 PRIMARY KEY, g int8, v int8);
        CREATE MATERIALIZED VIEW owrmv AS
        SELECT g, id, row_number() OVER (PARTITION BY g ORDER BY id) AS rn
        FROM owr
        """
    )
    eng.sql("INSERT INTO owr VALUES (1,1,5),(2,1,6)")
    before = _rows(eng.sql("SELECT g, id, rn FROM owrmv"))
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("SELECT g, id, rn FROM owrmv")) == before
    eng2.sql("INSERT INTO owr VALUES (3,1,7)")
    assert _rows(eng2.sql("SELECT rn FROM owrmv")) == [(1,), (2,), (3,)]


def test_dml_returning(eng):
    """INSERT/UPDATE/DELETE ... RETURNING (reference binder
    returning_list, binder/delete.rs:44): affected rows projected
    through the item list; literals containing 'RETURNING' never split;
    the hidden row id never leaks through *."""
    eng.sql("CREATE TABLE rt (k int8 PRIMARY KEY, v int8, s text)")
    out = _rows(eng.sql("INSERT INTO rt VALUES (1, 10, 'a'), (2, 20, 'b') RETURNING k, v * 2 AS dbl"))
    assert out == [(1, 20), (2, 40)]
    out = _rows(eng.sql("UPDATE rt SET v = v + 1 WHERE k = 2 RETURNING *"))
    assert out == [(2, 21, "b")]
    out = _rows(eng.sql("UPDATE rt SET v = 0 RETURNING k"))
    assert out == [(1,), (2,)]
    out = _rows(eng.sql("DELETE FROM rt WHERE s = 'a RETURNING b' RETURNING k"))
    assert out == []
    out = _rows(eng.sql("DELETE FROM rt WHERE k = 1 RETURNING k, s"))
    assert out == [(1, "a")]
    out = _rows(eng.sql("DELETE FROM rt RETURNING *"))
    assert out == [(2, 0, "b")]
    assert _rows(eng.sql("SELECT * FROM rt")) == []
    # rowid table: * excludes the hidden id
    eng.sql("CREATE TABLE rt2 (x int4)")
    out = eng.sql("INSERT INTO rt2 VALUES (5) RETURNING *")
    assert out.columns == ["x"] and _rows(out) == [(5,)]


def test_explain_never_executes_ddl(eng):
    """EXPLAIN CREATE MV explains the body's batch-twin plan WITHOUT
    creating the MV; EXPLAIN of other DDL/DML refuses loudly instead of
    executing it (reference handler/explain.rs prints, never runs)."""
    eng.sql("CREATE TABLE ex (k int8 PRIMARY KEY, v int8)")
    plan = eng.sql(
        "EXPLAIN CREATE MATERIALIZED VIEW exmv AS "
        "SELECT k, count(*) AS n FROM ex GROUP BY k"
    )
    assert any("HashAggregate" in r.plan for r in plan.collect())
    assert "exmv" not in eng.mv_handles  # NOT created
    with pytest.raises(ValueError, match="would have to execute"):
        eng.sql("EXPLAIN INSERT INTO ex VALUES (1, 2)")
    assert _rows(eng.sql("SELECT * FROM ex")) == []  # NOT executed


def test_explain_names_udf_runtime(eng):
    """EXPLAIN surfaces the runtime of every UDF a statement calls
    (reference explain.rs names the UDF language per call site): a JS
    UDF in an MV body must be VISIBLE as the interpreter the user is
    opting into."""
    eng.sql("CREATE TABLE exu (k int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE FUNCTION exu_js(x int) RETURNS int"
            " LANGUAGE javascript AS $$ return x * 2; $$")
    eng.sql("CREATE FUNCTION exu_py(x int) RETURNS int"
            " LANGUAGE python AS $$\ndef exu_py(x):\n    return x * 2\n$$")
    plan = "\n".join(r.plan for r in eng.sql(
        "EXPLAIN CREATE MATERIALIZED VIEW exumv AS"
        " SELECT k, exu_js(v) AS j, exu_py(v) AS p FROM exu"
    ).collect())
    assert "== UDF Runtimes ==" in plan
    assert "exu_js: LANGUAGE javascript" in plan
    assert "interpreter" in plan  # the cost is named, not hidden
    assert "exu_py: LANGUAGE python" in plan
    # statements with no UDFs get no block
    plan2 = "\n".join(r.plan for r in eng.sql(
        "EXPLAIN SELECT k FROM exu").collect())
    assert "UDF Runtimes" not in plan2


def test_distinct_mv_and_set_timezone(eng, spark):
    """SELECT DISTINCT MVs compile onto the group-agg path (DISTINCT ≡
    GROUP BY all columns); SET TIME ZONE maps to the Spark session tz."""
    eng.sql("CREATE TABLE dt (id int8 PRIMARY KEY, a text, b int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW dmv AS SELECT DISTINCT a, b FROM dt"
    )
    eng.sql("INSERT INTO dt VALUES (1,'x',1),(2,'x',1),(3,'y',2)")
    assert _rows(eng.sql("SELECT a, b FROM dmv")) == [("x", 1), ("y", 2)]
    eng.sql("DELETE FROM dt WHERE id IN (1, 2)")
    assert _rows(eng.sql("SELECT a, b FROM dmv")) == [("y", 2)]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        eng.sql("SET TIME ZONE 'America/New_York'")
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    with pytest.raises(ValueError, match="DISTINCT"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT DISTINCT a || 'x' FROM dt"
        )


# ---------------------------------------------------------------- UNION MVs
def test_union_all_mv_sql(eng):
    """CREATE MV over UNION ALL of two tables (reference stream Union
    executor `src/stream/src/executor/union.rs`,
    `e2e_test/streaming/union.slt`): inserts/deletes/updates on EITHER
    arm's table keep the merged view exact; identical-valued rows from
    different arms retract independently."""
    eng.sql("CREATE TABLE ua (id int8 PRIMARY KEY, v int8, tag text)")
    eng.sql("CREATE TABLE ub (id int8 PRIMARY KEY, w int8, tag text)")
    eng.sql(
        "CREATE MATERIALIZED VIEW umv AS "
        "SELECT id AS k, v AS val, tag AS tag FROM ua WHERE v > 10 "
        "UNION ALL "
        "SELECT id AS k, w AS val, tag AS tag FROM ub"
    )
    eng.sql("INSERT INTO ua VALUES (1, 5, 'a'), (2, 20, 'b'), (3, 30, 'c')")
    eng.sql("INSERT INTO ub VALUES (1, 7, 'a'), (4, 40, 'd')")
    # (1,5,'a') filtered by WHERE v > 10; ub arm is unfiltered
    assert _rows(eng.sql("SELECT k, val, tag FROM umv")) == [
        (1, 7, "a"), (2, 20, "b"), (3, 30, "c"), (4, 40, "d"),
    ]
    eng.sql("DELETE FROM ua WHERE id = 2")
    eng.sql("UPDATE ub SET w = 99 WHERE id = 4")
    eng.sql("DELETE FROM ub WHERE id = 1")
    assert _rows(eng.sql("SELECT k, val, tag FROM umv")) == [
        (3, 30, "c"), (4, 99, "d"),
    ]
    # both arms can emit the SAME row value: deleting one arm's source
    # row must retract only that arm's copy
    eng.sql("INSERT INTO ua VALUES (7, 70, 'z')")
    eng.sql("INSERT INTO ub VALUES (7, 70, 'z')")
    assert _rows(eng.sql("SELECT k, val, tag FROM umv WHERE k = 7")) == [
        (7, 70, "z"), (7, 70, "z"),
    ]
    eng.sql("DELETE FROM ua WHERE id = 7")
    assert _rows(eng.sql("SELECT k, val, tag FROM umv WHERE k = 7")) == [
        (7, 70, "z"),
    ]


def test_union_distinct_mv_sql(eng):
    """UNION (distinct): a value-tuple survives while ANY arm still
    holds it and disappears when its multiplicity across all arms drops
    to zero (reference plans union-distinct as union-all + distinct
    agg, `binder/set_expr.rs`)."""
    eng.sql("CREATE TABLE da (id int8 PRIMARY KEY, tag text)")
    eng.sql("CREATE TABLE db (id int8 PRIMARY KEY, tag text)")
    eng.sql(
        "CREATE MATERIALIZED VIEW dumv AS "
        "SELECT tag AS tag FROM da UNION SELECT tag AS tag FROM db"
    )
    eng.sql("INSERT INTO da VALUES (1, 'x'), (2, 'x'), (3, 'y')")
    eng.sql("INSERT INTO db VALUES (1, 'x'), (4, 'z')")
    assert _rows(eng.sql("SELECT tag FROM dumv")) == [("x",), ("y",), ("z",)]
    eng.sql("DELETE FROM da WHERE id IN (1, 2)")
    # 'x' still present via db id 1
    assert _rows(eng.sql("SELECT tag FROM dumv")) == [("x",), ("y",), ("z",)]
    eng.sql("DELETE FROM db WHERE id = 1")
    assert _rows(eng.sql("SELECT tag FROM dumv")) == [("y",), ("z",)]


def test_union_mv_restart_and_drop(spark, tmp_path):
    """Union MVs replay from the recorded DDL on Engine.open (state
    re-attached, no re-backfill) and DROP detaches every arm handle."""
    wh = str(tmp_path / "wh_union")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE ra (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE TABLE rb (id int8 PRIMARY KEY, v int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW rmv AS "
        "SELECT id AS k, v AS val FROM ra UNION ALL "
        "SELECT id AS k, v AS val FROM rb"
    )
    eng.sql("INSERT INTO ra VALUES (1, 10)")
    eng.sql("INSERT INTO rb VALUES (2, 20)")
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("SELECT k, val FROM rmv")) == [(1, 10), (2, 20)]
    eng2.sql("DELETE FROM ra WHERE id = 1")
    eng2.sql("INSERT INTO rb VALUES (3, 30)")
    assert _rows(eng2.sql("SELECT k, val FROM rmv")) == [(2, 20), (3, 30)]
    eng2.sql("DROP MATERIALIZED VIEW rmv")
    assert all(not t.mvs for t in eng2.tables.values())
    eng2.sql("INSERT INTO ra VALUES (9, 90)")  # no dangling arm handle


def test_union_mv_rejects_unsupported_shapes(eng):
    eng.sql("CREATE TABLE sa (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE TABLE sb (id int8 PRIMARY KEY, v int8)")
    with pytest.raises(Exception, match="EXCEPT ALL"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad1 AS "
            "SELECT v FROM sa EXCEPT ALL SELECT v FROM sb"
        )
    with pytest.raises(ValueError, match="mixing set-op kinds"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad2 AS "
            "SELECT v AS v FROM sa UNION ALL SELECT v AS v FROM sb "
            "UNION SELECT v AS v FROM sa"
        )
    with pytest.raises(ValueError, match="aggregate functions"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad3 AS "
            "SELECT v AS v FROM sa UNION ALL SELECT sum(v) AS v FROM sb"
        )
    with pytest.raises(ValueError, match="not an engine table"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad4 AS "
            "SELECT v AS v FROM sa UNION ALL SELECT v AS v FROM nowhere"
        )
    with pytest.raises(ValueError, match="needs an alias"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad5 AS "
            "SELECT v + 1 FROM sa UNION ALL SELECT v AS v FROM sb"
        )
    with pytest.raises(ValueError, match="columns, expected"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad6 AS "
            "SELECT v AS v FROM sa UNION ALL SELECT v AS v, id AS k FROM sb"
        )


# ------------------------------------------------------------- ON CONFLICT
def test_on_conflict_do_nothing_and_update_full(eng):
    """Reference e2e_test/streaming/on_conflict.slt scenarios: DO
    NOTHING keeps the first row per pk (within batch AND vs stored);
    DO UPDATE FULL (= OVERWRITE) keeps the last."""
    eng.sql(
        "CREATE TABLE oc1 (v1 int PRIMARY KEY, v2 int, v3 int) "
        "APPEND ONLY ON CONFLICT DO NOTHING"
    )
    eng.sql("INSERT INTO oc1 VALUES (1,4,2), (2,3,3)")
    eng.sql("INSERT INTO oc1 VALUES (3,4,5), (3,6,7)")
    eng.sql("INSERT INTO oc1 VALUES (1,5,3)")
    assert _rows(eng.sql("SELECT v1, v2, v3 FROM oc1")) == [
        (1, 4, 2), (2, 3, 3), (3, 4, 5),
    ]
    eng.sql(
        "CREATE TABLE oc2 (v1 int PRIMARY KEY, v2 int, v3 int) "
        "ON CONFLICT DO UPDATE FULL"
    )
    eng.sql("INSERT INTO oc2 VALUES (1,4,2), (2,3,3)")
    eng.sql("INSERT INTO oc2 VALUES (3,4,5), (3,6,7)")
    eng.sql("INSERT INTO oc2 VALUES (1,5,3)")
    assert _rows(eng.sql("SELECT v1, v2, v3 FROM oc2")) == [
        (1, 5, 3), (2, 3, 3), (3, 6, 7),
    ]


def test_on_conflict_update_if_not_null_with_mv(eng):
    """DO UPDATE IF NOT NULL merges non-null fields over the stored row
    (on_conflict.slt t3), the conflict changelog keeps downstream MVs
    exact, and a plain UPDATE still applies assignments verbatim."""
    eng.sql(
        "CREATE TABLE oc3 (v1 int PRIMARY KEY, v2 int, v3 int) "
        "ON CONFLICT DO UPDATE IF NOT NULL"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW oc3_mv AS SELECT v1, v2, v3 FROM oc3 WHERE v1 > 0"
    )
    eng.sql("INSERT INTO oc3 VALUES (1,NULL,2), (2,3,NULL)")
    eng.sql("INSERT INTO oc3 VALUES (3,NULL,5), (3,6,NULL)")
    eng.sql("INSERT INTO oc3 VALUES (1,5,NULL), (2,NULL,NULL)")
    assert _rows(eng.sql("SELECT v1, v2, v3 FROM oc3_mv")) == [
        (1, 5, 2), (2, 3, None), (3, 6, 5),
    ]
    eng.sql("UPDATE oc3 SET v2 = 2 WHERE v1 > 1")
    assert _rows(eng.sql("SELECT v1, v2, v3 FROM oc3_mv")) == [
        (1, 5, 2), (2, 2, None), (3, 2, 5),
    ]


def test_on_conflict_version_column(eng):
    """WITH VERSION COLUMN (with_version_column.slt +
    materialize.rs should_handle_conflict): a new row is applied only
    while its version is >= the running maximum; null new versions lose
    to any stored non-null one."""
    eng.sql(
        "CREATE TABLE ocv (v1 int PRIMARY KEY, v2 int, v3 int, v4 int) "
        "ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v4)"
    )
    eng.sql("INSERT INTO ocv VALUES (1,NULL,2,4), (2,3,NULL,1)")
    eng.sql("INSERT INTO ocv VALUES (3,NULL,5,2), (3,6,NULL,1)")
    eng.sql("INSERT INTO ocv VALUES (1,5,NULL,5), (2,NULL,6,1)")
    assert _rows(eng.sql("SELECT v1, v2, v3, v4 FROM ocv")) == [
        (1, 5, 2, 5), (2, 3, 6, 1), (3, None, 5, 2),
    ]
    eng.sql(
        "CREATE TABLE ocw (k int PRIMARY KEY, v text, ver int8) "
        "ON CONFLICT OVERWRITE WITH VERSION COLUMN(ver)"
    )
    eng.sql("INSERT INTO ocw VALUES (1,'a',10)")
    eng.sql("INSERT INTO ocw VALUES (1,'stale',5)")
    eng.sql("INSERT INTO ocw VALUES (1,'new',10)")  # tie applies
    eng.sql("INSERT INTO ocw VALUES (1,NULL,NULL)")  # null version loses
    assert _rows(eng.sql("SELECT k, v, ver FROM ocw")) == [(1, "new", 10)]


def test_on_conflict_rejects_bad_shapes(eng):
    with pytest.raises(ValueError, match="APPEND ONLY"):
        eng.sql(
            "CREATE TABLE boc1 (v1 int PRIMARY KEY, v2 int) "
            "APPEND ONLY ON CONFLICT OVERWRITE"
        )
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        eng.sql("CREATE TABLE boc2 (v1 int, v2 int) ON CONFLICT OVERWRITE")
    with pytest.raises(ValueError, match="comparable type"):
        eng.sql(
            "CREATE TABLE boc3 (v1 int PRIMARY KEY, v2 bool) "
            "ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v2)"
        )
    with pytest.raises(ValueError, match="VERSION COLUMN requires"):
        eng.sql(
            "CREATE TABLE boc4 (v1 int PRIMARY KEY, v2 int) "
            "ON CONFLICT DO NOTHING WITH VERSION COLUMN(v2)"
        )
    with pytest.raises(ValueError, match="not a table column"):
        eng.sql(
            "CREATE TABLE boc5 (v1 int PRIMARY KEY, v2 int) "
            "ON CONFLICT OVERWRITE WITH VERSION COLUMN(v9)"
        )


def test_on_conflict_restart_replay(spark, tmp_path):
    wh = str(tmp_path / "wh_oc")
    eng = Engine(spark, wh)
    eng.sql(
        "CREATE TABLE rc (k int PRIMARY KEY, v int) ON CONFLICT OVERWRITE"
    )
    eng.sql("INSERT INTO rc VALUES (1, 10)")
    eng2 = Engine.open(spark, wh)
    eng2.sql("INSERT INTO rc VALUES (1, 20)")  # conflict survives restart
    assert _rows(eng2.sql("SELECT k, v FROM rc")) == [(1, 20)]


# -------------------------------------------------------------- DISTINCT ON
def test_distinct_on_mv(eng):
    """Reference e2e_test/streaming/distinct_on.slt (retractable t2
    scenario): first row per ON-key under the ORDER BY; deleting the
    winner re-elects the next-best row; the ON key is NOT in the
    output (hidden carrier stripped at read)."""
    eng.sql("CREATE TABLE dot (id int PRIMARY KEY, k int, v int)")
    eng.sql(
        "CREATE MATERIALIZED VIEW dot_mv AS "
        "SELECT DISTINCT ON (k) k + v AS sum FROM dot ORDER BY k, v"
    )
    eng.sql("INSERT INTO dot VALUES (1,1,11), (2,2,22), (3,3,33), (4,1,111)")
    assert eng.sql("SELECT * FROM dot_mv").columns == ["sum"]
    assert _rows(eng.sql("SELECT sum FROM dot_mv")) == [(12,), (24,), (36,)]
    eng.sql("DELETE FROM dot WHERE v = 11")
    assert _rows(eng.sql("SELECT sum FROM dot_mv")) == [(24,), (36,), (112,)]
    with pytest.raises(ValueError, match="must match"):
        eng.sql(
            "CREATE MATERIALIZED VIEW dot_bad AS "
            "SELECT DISTINCT ON (k) v AS v FROM dot ORDER BY v"
        )
    with pytest.raises(ValueError, match="DISTINCT ON MV"):
        eng.sql(
            "CREATE MATERIALIZED VIEW dot_bad2 AS "
            "SELECT DISTINCT ON (k) v AS v FROM dot GROUP BY k"
        )


def test_distinct_on_adhoc(eng):
    """Ad-hoc SELECT DISTINCT ON through the PG shim: rewritten to a
    row_number window; DESC order and LIMIT ride along."""
    eng.sql("CREATE TABLE doa (id int PRIMARY KEY, k int, v int)")
    eng.sql("INSERT INTO doa VALUES (1,1,11), (2,2,22), (3,3,33), (4,1,111)")
    assert _rows(
        eng.sql("SELECT DISTINCT ON (k) k AS k, v AS v FROM doa ORDER BY k, v DESC")
    ) == [(1, 111), (2, 22), (3, 33)]
    assert (
        len(eng.sql(
            "SELECT DISTINCT ON (k) k AS k, v FROM doa ORDER BY k, v LIMIT 2"
        ).collect())
        == 2
    )


# ---------------------------------------------------------- temporal filter
def test_temporal_filter_mv(eng):
    """now() in an MV WHERE (reference Now executor `now.rs`,
    e2e_test/streaming/temporal_filter.slt): rows outside
    [now(), now()+2h] are invisible; deletes work on visible AND
    filtered rows; tick()/FLUSH advances time — rows expire past the
    lower bound and ACTIVATE when the upper bound reaches them."""
    import datetime

    t0 = datetime.datetime(2026, 8, 14, 12, 0, 0)
    eng.now_override = t0
    eng.sql("CREATE TABLE tft (id int PRIMARY KEY, v1 timestamp)")
    eng.sql(
        "CREATE MATERIALIZED VIEW tf_mv AS SELECT id AS id, v1 AS v1 FROM tft "
        "WHERE v1 BETWEEN now() AND now() + INTERVAL '2' HOUR"
    )
    eng.sql(
        "INSERT INTO tft VALUES "
        "(1, timestamp'2026-08-14 12:30:00'),"
        "(2, timestamp'2026-08-14 13:30:00'),"
        "(3, timestamp'2026-08-14 15:00:00'),"
        "(4, timestamp'2026-08-14 11:00:00')"
    )
    assert [r[0] for r in _rows(eng.sql("SELECT id FROM tf_mv"))] == [1, 2]
    eng.sql("DELETE FROM tft WHERE id = 1")
    assert [r[0] for r in _rows(eng.sql("SELECT id FROM tf_mv"))] == [2]
    # window moves to [13:45, 15:45]: 2 expires, 3 activates
    eng.now_override = t0 + datetime.timedelta(hours=1, minutes=45)
    eng.tick()
    assert [r[0] for r in _rows(eng.sql("SELECT id FROM tf_mv"))] == [3]
    eng.now_override = t0 + datetime.timedelta(hours=5)
    eng.sql("FLUSH")  # FLUSH carries the time barrier
    assert _rows(eng.sql("SELECT id FROM tf_mv")) == []
    with pytest.raises(ValueError, match="WHERE"):
        eng.sql("CREATE MATERIALIZED VIEW tf_bad AS SELECT now() AS t, id FROM tft")


def test_temporal_filter_agg_mv_and_restart(spark, tmp_path):
    """Temporal filter under a GROUP BY MV: expiry retracts from the
    aggregate; the tick pointer survives restart replay."""
    import datetime

    wh = str(tmp_path / "wh_tf")
    eng = Engine(spark, wh)
    t0 = datetime.datetime(2026, 8, 14, 12, 0, 0)
    eng.now_override = t0
    eng.sql("CREATE TABLE tfa (id int PRIMARY KEY, tag text, ts timestamp)")
    eng.sql(
        "CREATE MATERIALIZED VIEW tfa_mv AS SELECT tag, count(*) AS n FROM tfa "
        "WHERE ts > now() - INTERVAL '1' HOUR GROUP BY tag"
    )
    eng.sql(
        "INSERT INTO tfa VALUES "
        "(1, 'a', timestamp'2026-08-14 11:30:00'),"
        "(2, 'a', timestamp'2026-08-14 11:50:00'),"
        "(3, 'b', timestamp'2026-08-14 11:10:00')"
    )
    assert _rows(eng.sql("SELECT tag, n FROM tfa_mv")) == [("a", 2), ("b", 1)]
    eng2 = Engine.open(spark, wh)
    eng2.now_override = t0 + datetime.timedelta(minutes=25)  # 12:25
    eng2.tick()
    # cutoff 11:25: id 3 (11:10) expired, group b disappears
    assert _rows(eng2.sql("SELECT tag, n FROM tfa_mv")) == [("a", 2)]


def test_approx_percentile_within_group_mv(eng):
    """approx_percentile(q, e) WITHIN GROUP (ORDER BY v) — the
    reference agg spelling — in MV bodies and ad-hoc queries (mapped to
    percentile_approx; the retractable streaming sketch is
    streaming/approx_percentile.py)."""
    eng.sql("CREATE TABLE apg (id int PRIMARY KEY, g text, v float8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW apg_mv AS SELECT g, "
        "approx_percentile(0.9, 0.01) WITHIN GROUP (ORDER BY v) AS p90 "
        "FROM apg GROUP BY g"
    )
    rows = ", ".join(f"({i}, '{'ab'[i % 2]}', {float(i)})" for i in range(1, 101))
    eng.sql(f"INSERT INTO apg VALUES {rows}")
    r = {g: p for g, p in _rows(eng.sql("SELECT g, p90 FROM apg_mv"))}
    assert abs(r["a"] - 90) <= 2 and abs(r["b"] - 90) <= 2, r
    eng.sql("DELETE FROM apg WHERE id > 50")
    r = {g: p for g, p in _rows(eng.sql("SELECT g, p90 FROM apg_mv"))}
    assert abs(r["a"] - 45) <= 2 and abs(r["b"] - 45) <= 2, r


# -------------------------------------------------------- generated columns
def test_generated_columns(eng):
    """Reference e2e_test/ddl/table/generated_columns.slt.part: `name
    type AS expr` columns compute on INSERT (positional inserts cover
    stored columns only), refresh on UPDATE of referenced columns,
    reject direct UPDATE/INSERT, and guard ALTER DROP of referenced
    columns."""
    eng.sql(
        "CREATE TABLE gct (v1 int AS v2-1, v2 int, v3 int AS v2+1.02, "
        "v4 float8 AS v2 + 1.02)"
    )
    eng.sql("INSERT INTO gct (v2) VALUES (1), (2)")
    assert _rows(eng.sql("SELECT v1, v2, v3, v4 FROM gct")) == [
        (0, 1, 2, 2.02), (1, 2, 3, 3.02),
    ]
    with pytest.raises(ValueError, match="generated"):
        eng.sql("UPDATE gct SET v1 = 1")
    eng.sql("UPDATE gct SET v2 = 1")
    assert _rows(eng.sql("SELECT v1, v2, v3, v4 FROM gct")) == [
        (0, 1, 2, 2.02), (0, 1, 2, 2.02),
    ]
    eng.sql("CREATE TABLE gc2 (v1 int, v2 int AS v1+1)")
    eng.sql("INSERT INTO gc2 VALUES (1), (2)")  # positional = stored only
    assert _rows(eng.sql("SELECT v1, v2 FROM gc2")) == [(1, 2), (2, 3)]
    with pytest.raises(ValueError, match="referenced by a generated column"):
        eng.sql("ALTER TABLE gc2 DROP COLUMN v1")
    eng.sql("ALTER TABLE gc2 DROP COLUMN v2")
    eng.sql("ALTER TABLE gc2 DROP COLUMN v1")
    with pytest.raises(ValueError, match="another"):
        eng.sql("CREATE TABLE gc3 (a int, b int AS a+1, c int AS b+1)")
    with pytest.raises(ValueError, match="generated"):
        eng.sql("INSERT INTO gct (v1) VALUES (5)")


def test_generated_columns_mv_and_restart(spark, tmp_path):
    """MVs over generated columns stay exact under DML, and the
    generated spec survives restart replay."""
    wh = str(tmp_path / "wh_gen")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE gcr (id int PRIMARY KEY, v int, dbl int AS v*2)")
    eng.sql("CREATE MATERIALIZED VIEW gcr_mv AS SELECT dbl, count(*) AS n FROM gcr GROUP BY dbl")
    eng.sql("INSERT INTO gcr VALUES (1, 5), (2, 5), (3, 7)")
    assert _rows(eng.sql("SELECT dbl, n FROM gcr_mv")) == [(10, 2), (14, 1)]
    eng2 = Engine.open(spark, wh)
    eng2.sql("INSERT INTO gcr VALUES (4, 7)")
    eng2.sql("DELETE FROM gcr WHERE id = 1")
    assert _rows(eng2.sql("SELECT dbl, n FROM gcr_mv")) == [(10, 1), (14, 2)]
    with pytest.raises(ValueError, match="generated"):
        eng2.sql("UPDATE gcr SET dbl = 3")


def test_create_sink_as_query(spark, tmp_path):
    """CREATE SINK ... AS <select> (reference `create_sink.rs`
    sink-from-query): the query becomes an internal MV owned by the
    sink, the changelog streams to the filesystem sink, restart resumes
    without duplicating the snapshot, and DROP SINK removes the
    internal MV and its table subscriptions."""
    import glob

    wh = str(tmp_path / "wh_sq")
    sinkdir = str(tmp_path / "out")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE sqt (id int PRIMARY KEY, g text, v int)")
    eng.sql(
        f"CREATE SINK sq AS SELECT g, count(*) AS n, sum(v) AS total "
        f"FROM sqt GROUP BY g WITH (connector='filesystem', path='{sinkdir}')"
    )
    eng.sql("INSERT INTO sqt VALUES (1,'a',10),(2,'a',20),(3,'b',5)")
    eng.sql("DELETE FROM sqt WHERE id = 2")

    def net_rows():
        df = spark.read.option("recursiveFileLookup", "true").parquet(sinkdir)
        return sorted(
            tuple(r)
            for r in (
                df.groupBy("g", "n", "total")
                .agg(F.sum("__op").alias("m"))
                .filter("m > 0")
                .select("g", "n", "total")
            ).collect()
        )

    assert len(glob.glob(sinkdir + "/c*")) >= 2
    assert net_rows() == [("a", 1, 10), ("b", 1, 5)]
    eng2 = Engine.open(spark, wh)
    eng2.sql("INSERT INTO sqt VALUES (4,'b',7)")
    assert net_rows() == [("a", 1, 10), ("b", 2, 12)]
    eng2.sql("DROP SINK sq")
    assert "__sinkq_sq" not in eng2.mv_handles
    assert all(
        all(h.name != "__sinkq_sq" for h in t.mvs) for t in eng2.tables.values()
    )


# ------------------------------------------------------------ ALTER RENAME
def test_alter_rename_family(spark, tmp_path):
    """ALTER TABLE/MATERIALIZED VIEW/VIEW ... RENAME TO (reference
    `handler/alter_rename.rs`, e2e_test/ddl/alter_rename.slt): the
    recorded DDL is head-renamed and replayed against the moved state
    dir — data, conflict behavior, and incremental maintenance survive;
    renames with dependents and SINK renames are rejected."""
    wh = str(tmp_path / "wh_ren")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE ren (k int PRIMARY KEY, v int) ON CONFLICT OVERWRITE")
    eng.sql("INSERT INTO ren VALUES (1, 10), (2, 20)")
    eng.sql("ALTER TABLE ren ADD COLUMN w int DEFAULT 7")
    eng.sql("ALTER TABLE ren RENAME TO ren2")
    assert _rows(eng.sql("SELECT k, v, w FROM ren2")) == [(1, 10, 7), (2, 20, 7)]
    eng.sql("INSERT INTO ren2 VALUES (1, 99, 1)")  # conflict behavior survives
    assert _rows(eng.sql("SELECT k, v, w FROM ren2")) == [(1, 99, 1), (2, 20, 7)]
    eng.sql(
        "CREATE MATERIALIZED VIEW renmv AS SELECT v, count(*) AS n FROM ren2 GROUP BY v"
    )
    eng.sql("ALTER MATERIALIZED VIEW renmv RENAME TO renmv2")
    eng.sql("INSERT INTO ren2 VALUES (3, 20, 0)")
    assert _rows(eng.sql("SELECT v, n FROM renmv2")) == [(20, 2), (99, 1)]
    # rename WITH a dependent MV: the reference rewrites the dependent
    # definition (alter_rename.rs) — the MV follows the table's new name
    # and stays incrementally maintained
    eng.sql("ALTER TABLE ren2 RENAME TO ren3")
    eng.sql("INSERT INTO ren3 VALUES (4, 20, 0)")
    assert _rows(eng.sql("SELECT v, n FROM renmv2")) == [(20, 3), (99, 1)]
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM ren2").collect()
    eng2 = Engine.open(spark, wh)
    eng2.sql("DELETE FROM ren3 WHERE k = 3")
    eng2.sql("DELETE FROM ren3 WHERE k = 4")
    assert _rows(eng2.sql("SELECT v, n FROM renmv2")) == [(20, 1), (99, 1)]
    eng2.sql("ALTER TABLE ren3 RENAME TO ren2")
    eng2.sql("CREATE VIEW renv AS SELECT k FROM ren2 WHERE v > 50")
    eng2.sql("ALTER VIEW renv RENAME TO renv2")
    assert _rows(eng2.sql("SELECT * FROM renv2")) == [(1,)]
    # ALTER SINK RENAME is supported since round 12 (cursor moves with
    # the rename, test_schema_admin.py); a nonexistent target still errors
    with pytest.raises(ValueError, match="is not a sink"):
        eng2.sql("ALTER SINK nosink RENAME TO x")


# ----------------------------------------------------------- GROUPING SETS
def test_grouping_sets_mv(eng, spark):
    """CREATE MV ... GROUP BY GROUPING SETS/CUBE/ROLLUP (reference
    stream Expand executor `src/stream/src/executor/expand.rs`): every
    changelog row explodes per grouping set through the key_of hook, so
    inserts AND deletes maintain all sets; the hidden set id keys the
    state and never leaks into the result."""

    def norm(df):
        return sorted(
            tuple("N" if x is None else str(x) for x in r) for r in df.collect()
        )

    eng.sql("CREATE TABLE gst (id int PRIMARY KEY, a text, b text, v int)")
    eng.sql(
        "CREATE MATERIALIZED VIEW gst_mv AS SELECT a, b, count(*) AS n, "
        "sum(v) AS total FROM gst GROUP BY GROUPING SETS ((a, b), (a), ())"
    )
    eng.sql("CREATE MATERIALIZED VIEW gst_cube AS SELECT a, b, count(*) AS n FROM gst GROUP BY CUBE (a, b)")
    eng.sql("INSERT INTO gst VALUES (1,'x','p',10),(2,'x','q',20),(3,'y','p',5)")
    eng.sql("DELETE FROM gst WHERE id = 2")
    exp = spark.sql(
        "SELECT a, b, count(*) n, sum(v) total FROM (VALUES ('x','p',10),"
        "('y','p',5)) AS t(a,b,v) GROUP BY GROUPING SETS ((a,b),(a),())"
    )
    assert norm(eng.sql("SELECT a, b, n, total FROM gst_mv")) == norm(exp)
    expc = spark.sql(
        "SELECT a, b, count(*) n FROM (VALUES ('x','p',10),('y','p',5)) "
        "AS t(a,b,v) GROUP BY CUBE(a,b)"
    )
    assert norm(eng.sql("SELECT a, b, n FROM gst_cube")) == norm(expc)
    assert "__gid" not in eng.sql("SELECT * FROM gst_mv").columns
    with pytest.raises(ValueError, match="select list"):
        eng.sql(
            "CREATE MATERIALIZED VIEW gst_bad AS SELECT a, count(*) AS n "
            "FROM gst GROUP BY GROUPING SETS ((a, b), (a))"
        )


def test_intersect_except_mv_sql(eng):
    """Streaming INTERSECT/EXCEPT MVs (reference
    e2e_test/streaming/{intersect,except}.slt.part): SET semantics over
    per-arm presence — a tuple is visible iff arm 0 holds it AND arm 1
    does (intersect) / does not (except), independent of
    multiplicities; deletes on either arm re-evaluate the tuple."""
    eng.sql("CREATE TABLE ie1 (id int PRIMARY KEY, v1 int, v2 int)")
    eng.sql("CREATE TABLE ie2 (id int PRIMARY KEY, v1 int, v3 int)")
    eng.sql(
        "CREATE MATERIALIZED VIEW ie_i AS SELECT v1 AS v1, v2 AS v2 FROM ie1 "
        "INTERSECT SELECT v1 AS v1, v3 AS v2 FROM ie2"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW ie_e AS SELECT v1 AS v1, v2 AS v2 FROM ie1 "
        "EXCEPT SELECT v1 AS v1, v3 AS v2 FROM ie2"
    )
    eng.sql("INSERT INTO ie1 VALUES (1,1,2),(2,1,2)")
    assert _rows(eng.sql("SELECT * FROM ie_i")) == []
    assert _rows(eng.sql("SELECT * FROM ie_e")) == [(1, 2)]
    eng.sql("INSERT INTO ie2 VALUES (1,1,2),(2,1,2)")
    assert _rows(eng.sql("SELECT * FROM ie_i")) == [(1, 2)]
    assert _rows(eng.sql("SELECT * FROM ie_e")) == []
    eng.sql("DELETE FROM ie1 WHERE v1 = 1")
    assert _rows(eng.sql("SELECT * FROM ie_i")) == []
    assert _rows(eng.sql("SELECT * FROM ie_e")) == []
    eng.sql("INSERT INTO ie1 VALUES (9,1,2)")
    eng.sql("DELETE FROM ie2 WHERE v1 = 1")
    assert _rows(eng.sql("SELECT * FROM ie_i")) == []
    assert _rows(eng.sql("SELECT * FROM ie_e")) == [(1, 2)]
    with pytest.raises(ValueError, match="two arms"):
        eng.sql(
            "CREATE MATERIALIZED VIEW ie_bad AS SELECT v1 AS v1 FROM ie1 "
            "INTERSECT SELECT v1 AS v1 FROM ie2 INTERSECT SELECT v1 AS v1 FROM ie1"
        )


# ------------------------------------------------------- struct/array types
def test_struct_and_array_table_columns(eng):
    """struct<...> and t[] column types (reference
    e2e_test/streaming/struct_table.slt + array types): nested struct
    tables with ROW(...) literals, (col).field access, MVs over struct
    fields with retraction; text[]/int8[] columns with ARRAY[...]
    literals. Divergence: element subscripts keep Spark's 0-based
    strict semantics (PG is 1-based null-tolerant) — documented."""
    eng.sql(
        "CREATE TABLE stt (id int PRIMARY KEY, v1 int, "
        "v2 struct<v1 int, v2 struct<v1 int, v2 int>>)"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW stt_mv AS "
        "SELECT id AS id, (v2).v2 AS inner2 FROM stt WHERE v1 > 0"
    )
    eng.sql("INSERT INTO stt VALUES (1, 1, ROW(1, ROW(1, 2)))")
    eng.sql("INSERT INTO stt VALUES (2, 1, ROW(1, ROW(1, 3)))")
    got = sorted(
        (r.id, tuple(r.inner2))
        for r in eng.sql("SELECT id, inner2 FROM stt_mv").collect()
    )
    assert got == [(1, (1, 2)), (2, (1, 3))], got
    eng.sql("DELETE FROM stt WHERE id = 1")
    got = sorted(
        (r.id, tuple(r.inner2))
        for r in eng.sql("SELECT id, inner2 FROM stt_mv").collect()
    )
    assert got == [(2, (1, 3))], got
    assert eng.sql("SELECT (v2).v1 AS f FROM stt").first().f == 1

    eng.sql("CREATE TABLE att (id int PRIMARY KEY, tags text[], nums int8[])")
    eng.sql(
        "INSERT INTO att VALUES (1, ARRAY['a','b'], ARRAY[1,2,3]), "
        "(2, ARRAY['c'], ARRAY[9])"
    )
    got = sorted(
        (r.id, list(r.tags), list(r.nums))
        for r in eng.sql("SELECT id, tags, nums FROM att").collect()
    )
    assert got == [(1, ["a", "b"], [1, 2, 3]), (2, ["c"], [9])], got
    assert eng.sql("SELECT sum(cardinality(nums)) AS n FROM att").first().n == 4


# ------------------------------------------------------------------ TopN MV
def test_topn_mv_sql(spark, tmp_path):
    """The reference's TopN MV spelling (`logical_top_n.rs` →
    StreamGroupTopN): `SELECT ... FROM (SELECT ..., row_number() OVER
    (PARTITION BY g ORDER BY v DESC) AS rn FROM t) WHERE rn <= k`.
    Deleting a current top row surfaces the next-best from state;
    rank() gives WITH TIES; non-TopN subqueries stay parse-rejected;
    restart replays the MV."""
    wh = str(tmp_path / "wh_topn")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE tnb (id int PRIMARY KEY, g text, v int)")
    eng.sql(
        "CREATE MATERIALIZED VIEW tn_top2 AS SELECT g, v, rn FROM ("
        "SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn "
        "FROM tnb) WHERE rn <= 2"
    )
    eng.sql("INSERT INTO tnb VALUES (1,'a',10),(2,'a',30),(3,'a',20),(4,'b',5)")
    assert _rows(eng.sql("SELECT g, v, rn FROM tn_top2")) == [
        ("a", 20, 2), ("a", 30, 1), ("b", 5, 1),
    ]
    eng.sql("DELETE FROM tnb WHERE id = 2")
    assert _rows(eng.sql("SELECT g, v, rn FROM tn_top2")) == [
        ("a", 10, 2), ("a", 20, 1), ("b", 5, 1),
    ]
    eng.sql(
        "CREATE MATERIALIZED VIEW tn_ties AS SELECT * FROM ("
        "SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v DESC) AS rk "
        "FROM tnb) WHERE rk <= 1"
    )
    eng.sql("INSERT INTO tnb VALUES (9,'a',20)")
    assert _rows(eng.sql("SELECT g, v, rk FROM tn_ties")) == [
        ("a", 20, 1), ("a", 20, 1), ("b", 5, 1),
    ]
    with pytest.raises(Exception, match="TopN shape"):
        eng.sql("CREATE MATERIALIZED VIEW tn_bad AS SELECT k FROM (SELECT k FROM tnb) s")
    eng2 = Engine.open(spark, wh)
    eng2.sql("DELETE FROM tnb WHERE id = 9")
    assert _rows(eng2.sql("SELECT g, v, rk FROM tn_ties")) == [
        ("a", 20, 1), ("b", 5, 1),
    ]


def test_topn_mv_changelog_consumers(spark, tmp_path):
    """TopN MVs are legal changelog producers (reference
    `src/stream/src/executor/top_n/top_n_plain.rs:79` — the executor
    emits top-k MEMBERSHIP deltas: Insert when a row enters the top-k,
    Delete when one leaves): MV-on-MV over an ORDER BY ... LIMIT MV,
    subscription cursors over it, TopN as a stream-join input, and
    restart replay all consume exactly those deltas."""
    wh = str(tmp_path / "wh_tnc")
    eng = Engine(spark, wh)
    eng.sql(
        """
        CREATE TABLE tcl (id int8 PRIMARY KEY, grp text, v int8);
        CREATE MATERIALIZED VIEW tcl_top3 AS
        SELECT id, grp, v FROM tcl ORDER BY v DESC, id LIMIT 3;
        CREATE MATERIALIZED VIEW tcl_agg AS
        SELECT grp, count(*) AS n, sum(v) AS sv FROM tcl_top3 GROUP BY grp
        """
    )
    eng.sql("INSERT INTO tcl VALUES (1,'a',10),(2,'b',20),(3,'a',30),(4,'b',40)")
    # top3 = (4,b,40),(3,a,30),(2,b,20)
    assert _rows(eng.sql("SELECT grp, n, sv FROM tcl_agg")) == [("a", 1, 30), ("b", 2, 60)]
    sub = eng.create_subscription("tclsub", "tcl_top3")
    eng.sql("INSERT INTO tcl VALUES (5,'a',50)")  # 5 enters, 2 leaves
    f = sub.fetch()
    assert f is not None, "no membership delta emitted"
    ch = [(r["__op"], r["id"], r["v"]) for r in f[0].collect()]
    assert sorted(ch) == [(-1, 2, 20), (1, 5, 50)], ch
    sub.ack(f[1])
    assert _rows(eng.sql("SELECT grp, n, sv FROM tcl_agg")) == [("a", 2, 80), ("b", 1, 40)]
    # a batch that does NOT move the top-k emits no chunk
    eng.sql("INSERT INTO tcl VALUES (6,'b',1)")
    assert sub.fetch() is None
    # deletes retract membership and surface the next-best from state
    eng.sql("DELETE FROM tcl WHERE id = 5")
    assert _rows(eng.sql("SELECT grp, n, sv FROM tcl_agg")) == [("a", 1, 30), ("b", 2, 60)]
    f = sub.fetch()
    ch = [(r["__op"], r["id"], r["v"]) for r in f[0].collect()]
    assert sorted(ch) == [(-1, 5, 50), (1, 2, 20)], ch
    sub.ack(f[1])
    # TopN MV as a stream-join input (membership deltas re-key the join)
    eng.sql(
        """
        CREATE TABLE tdim (g text PRIMARY KEY, label text);
        CREATE MATERIALIZED VIEW tcl_j AS
        SELECT x.id AS id, x.v AS v, d.label AS label
        FROM tcl_top3 x JOIN tdim d ON x.grp = d.g
        """
    )
    eng.sql("INSERT INTO tdim VALUES ('a','AA'),('b','BB')")
    assert _rows(eng.sql("SELECT id, label FROM tcl_j")) == [
        (2, "BB"), (3, "AA"), (4, "BB"),
    ]
    eng.sql("INSERT INTO tcl VALUES (7,'a',70)")  # 7 enters, 2 leaves
    assert _rows(eng.sql("SELECT id, label FROM tcl_j")) == [
        (3, "AA"), (4, "BB"), (7, "AA"),
    ]
    # restart: catalog replay re-attaches the whole chain
    eng2 = Engine.open(spark, wh)
    eng2.sql("DELETE FROM tcl WHERE id = 7")
    assert _rows(eng2.sql("SELECT grp, n, sv FROM tcl_agg")) == [("a", 1, 30), ("b", 2, 60)]
    assert _rows(eng2.sql("SELECT id, label FROM tcl_j")) == [
        (2, "BB"), (3, "AA"), (4, "BB"),
    ]


def test_topn_threshold_cache_skips_state_scan(spark, tmp_path):
    """VERDICT r8 #3 / reference `top_n/top_n_cache.rs` (cached head):
    the TopN wrapper persists the k-th row's order keys beside the
    snapshot; a batch whose OUTPUT delta orders strictly after it skips
    the full TakeOrderedAndProject state scan entirely (spy: the skip
    counter moves, the full-diff counter doesn't). Threshold-crossing
    inserts AND deletes take the full path and stay exact."""
    wh = str(tmp_path / "wh_tth")
    eng = Engine(spark, wh)
    eng.sql(
        """
        CREATE TABLE tth (id int8 PRIMARY KEY, v int8);
        CREATE MATERIALIZED VIEW tth_top AS
        SELECT id, v FROM tth ORDER BY v, id LIMIT 3;
        CREATE MATERIALIZED VIEW tth_n AS
        SELECT count(*) AS n, sum(v) AS sv FROM tth_top
        """
    )
    eng.sql("INSERT INTO tth VALUES (1,10),(2,20),(3,30),(4,40),(5,50)")
    assert _rows(eng.sql("SELECT n, sv FROM tth_n")) == [(3, 60)]  # 10+20+30
    view = eng.mv_handles["tth_top"].view
    base_skips, base_full = view._skips, view._full_diffs
    # every row orders strictly after the k-th (v=30): ZERO state scans
    eng.sql("INSERT INTO tth VALUES (6,60),(7,70)")
    assert view._skips == base_skips + 1 and view._full_diffs == base_full
    assert _rows(eng.sql("SELECT n, sv FROM tth_n")) == [(3, 60)]
    # a crossing insert takes the full path and the delta is exact
    eng.sql("INSERT INTO tth VALUES (8,5)")
    assert view._full_diffs == base_full + 1
    assert _rows(eng.sql("SELECT n, sv FROM tth_n")) == [(3, 35)]  # 5+10+20
    # a delete of a top-k member crosses: next-best surfaces from state
    eng.sql("DELETE FROM tth WHERE id = 8")
    assert view._full_diffs == base_full + 2
    assert _rows(eng.sql("SELECT n, sv FROM tth_n")) == [(3, 60)]
    # a delete strictly after the threshold skips again
    skips_now = view._skips
    eng.sql("DELETE FROM tth WHERE id = 7")
    assert view._skips == skips_now + 1 and view._full_diffs == base_full + 2
    assert _rows(eng.sql("SELECT n, sv FROM tth_n")) == [(3, 60)]
    # a tie on v resolved by the id tiebreak (9 > 3) is still strictly
    # after the k-th row lexicographically — provably outside, skip
    eng.sql("INSERT INTO tth VALUES (9,30)")
    assert view._skips == skips_now + 2 and view._full_diffs == base_full + 2
    assert _rows(eng.sql("SELECT n, sv FROM tth_n")) == [(3, 60)]
    # a FULL tie (order lacks a unique tiebreak) is conservative: the
    # tying row could displace the k-th member, so the full path runs
    eng.sql(
        """
        CREATE MATERIALIZED VIEW tth_top2 AS
        SELECT id, v FROM tth ORDER BY v LIMIT 3;
        CREATE MATERIALIZED VIEW tth_n2 AS SELECT count(*) AS n FROM tth_top2
        """
    )
    view2 = eng.mv_handles["tth_top2"].view
    f2, s2 = view2._full_diffs, view2._skips
    eng.sql("INSERT INTO tth VALUES (10,30)")  # ties the k-th row's only key
    assert view2._full_diffs == f2 + 1 and view2._skips == s2
    assert _rows(eng.sql("SELECT n FROM tth_n2")) == [(3,)]


def test_project_set_mv(eng):
    """ProjectSet on a changelog (reference `project_set.rs` streaming,
    e2e_test/streaming/project_set.slt): unnest in an MV body — one
    source row fans out to N MV rows under the same pk group, and
    UPDATE/DELETE retract the whole fan-out."""
    eng.sql("CREATE TABLE pst (id int PRIMARY KEY, tags text[])")
    eng.sql("CREATE MATERIALIZED VIEW pst_mv AS SELECT id, unnest(tags) AS tag FROM pst")
    eng.sql("INSERT INTO pst VALUES (1, ARRAY['a','b']), (2, ARRAY['c'])")
    assert _rows(eng.sql("SELECT id, tag FROM pst_mv")) == [
        (1, "a"), (1, "b"), (2, "c"),
    ]
    eng.sql("UPDATE pst SET tags = ARRAY['z'] WHERE id = 1")
    assert _rows(eng.sql("SELECT id, tag FROM pst_mv")) == [(1, "z"), (2, "c")]
    eng.sql("DELETE FROM pst WHERE id = 2")
    assert _rows(eng.sql("SELECT id, tag FROM pst_mv")) == [(1, "z")]


def test_create_function_sql_language(eng):
    """CREATE FUNCTION ... LANGUAGE sql (reference
    `handler/create_sql_function.rs`, e2e_test/udf/sql_udf.slt): unnamed
    $1/$2 params, named params, nesting — compiled onto Spark's native
    SQL UDFs, which Catalyst inlines into codegen (zero call overhead)."""
    eng.sql("create function add(INT, INT) returns int language sql as $$select $1 + $2$$")
    eng.sql("create function sub(INT, INT) returns int language sql as 'select $1 - $2'")
    eng.sql(
        "create function add_sub_binding() returns int language sql "
        "as 'select add(1, 1) + sub(2, 2)'"
    )
    eng.sql("create function add_named(a INT, b INT) returns int language sql as 'select a + b'")
    assert _rows(eng.sql(
        "select add(1, -1) a, sub(1, 1) b, add_sub_binding() c, add_named(1, -1) d"
    )) == [(0, 0, 2, 0)]
    # usable over table rows (inlined into the scan-side projection)
    eng.sql("CREATE TABLE fnt (k int PRIMARY KEY, v int)")
    eng.sql("INSERT INTO fnt VALUES (1, 10), (2, 20)")
    assert _rows(eng.sql("SELECT k, add(k, v) s FROM fnt")) == [(1, 11), (2, 22)]


def test_create_function_python_and_aggregate(eng):
    """LANGUAGE python scalar (python_udf.slt gcd) + CREATE AGGREGATE
    (python_udf.slt weighted_avg): Arrow-batched pandas UDF / grouped-agg
    pandas UDF, NULLs delivered as None per the reference's convention."""
    eng.sql(
        "create function gcd(a int, b int) returns int language python as $$\n"
        "def gcd(a, b):\n"
        "    while b != 0:\n"
        "        a, b = b, a % b\n"
        "    return a\n"
        "$$"
    )
    assert _rows(eng.sql("select gcd(25, 15) r")) == [(5,)]
    eng.sql(
        "create aggregate weighted_avg(value int, weight int) returns float "
        "language python as $$\n"
        "def create_state():\n"
        "    return (0, 0)\n"
        "def accumulate(state, value, weight):\n"
        "    if value is None or weight is None:\n"
        "        return state\n"
        "    (s, w) = state\n"
        "    return (s + value * weight, w + weight)\n"
        "def retract(state, value, weight):\n"
        "    (s, w) = state\n"
        "    return (s - value * weight, w - weight)\n"
        "def finish(state):\n"
        "    (s, w) = state\n"
        "    return None if w == 0 else s / w\n"
        "$$"
    )
    eng.sql("CREATE TABLE wat (k int PRIMARY KEY, v int, w int)")
    eng.sql("INSERT INTO wat VALUES (1, 1, 1), (2, 3, 3), (3, 5, 1), (4, NULL, 9)")
    out = eng.sql(
        "SELECT k % 2 AS g, weighted_avg(v, w) a FROM wat GROUP BY k % 2 ORDER BY g"
    ).collect()
    # g=0: (3*3 + NULL-skip)/3 = 3.0 ; g=1: (1*1 + 5*1)/2 = 3.0
    assert [(r.g, r.a) for r in out] == [(0, 3.0), (1, 3.0)]


def test_udf_inside_maintained_mv(eng):
    """A UDF called inside a CREATE MATERIALIZED VIEW body: the MV's
    per-batch recompute replans the SQL text, so session-registered
    functions (both languages) resolve — and results stay correct across
    INSERT/DELETE (the reference supports UDFs in MVs the same way)."""
    eng.sql("create function triple(x int) returns int language sql as 'select x * 3'")
    eng.sql("CREATE TABLE src9 (id int PRIMARY KEY, v int)")
    eng.sql(
        "CREATE MATERIALIZED VIEW mv9 AS "
        "SELECT id % 2 AS g, sum(triple(v)) AS s FROM src9 GROUP BY id % 2"
    )
    eng.sql("INSERT INTO src9 VALUES (1, 1), (2, 2), (3, 3), (4, 4)")
    assert _rows(eng.sql("SELECT g, s FROM mv9")) == [(0, 18), (1, 12)]
    eng.sql("DELETE FROM src9 WHERE id = 3")
    assert _rows(eng.sql("SELECT g, s FROM mv9")) == [(0, 18), (1, 3)]


def test_function_tvf_drop_show_replay(spark, tmp_path):
    """RETURNS TABLE bodies (SQL table function), SHOW FUNCTIONS, DROP
    FUNCTION (with and without signature), and restart replay of the
    recorded DDL (reference create_and_drop.slt + durable catalog)."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql(
        "create function series2(n int) returns table (x int) language sql "
        "as 'select explode(sequence(1, n))'"
    )
    assert _rows(eng.sql("select * from series2(3)")) == [(1,), (2,), (3,)]
    eng.sql("create function nine() returns int language sql as 'select 9'")
    names = [r.name for r in eng.sql("SHOW FUNCTIONS").collect()]
    assert names == ["nine", "series2"]
    eng.sql("drop function nine")
    with pytest.raises(Exception):
        eng.sql("select nine()").collect()
    eng.sql("drop function if exists nine")  # idempotent
    with pytest.raises(ValueError, match="unknown function"):
        eng.sql("drop function nine")
    eng.sql("drop aggregate if exists missing_agg(int, int)")  # signature form
    eng2 = Engine.open(spark, wh)
    assert sorted(eng2.functions) == ["series2"]
    assert _rows(eng2.sql("select * from series2(2)")) == [(1,), (2,)]


def test_create_function_gated_and_rejected(eng):
    """LANGUAGE rust raises loudly (no rustc in container — wasm or
    USING LINK are the sanctioned hosts; javascript and wasm both run
    in-process since rounds 9/11); grammar rejects bodies that aren't
    strings; python aggregates must define the
    create_state/accumulate/finish contract."""
    with pytest.raises(NotImplementedError, match="USING LINK"):
        eng.sql(
            "create function rst(x int) returns int language rust "
            "as $$ fn rst(x: i32) -> i32 { x } $$"
        )
    # javascript is REAL now (functions/js_runtime.py) — legacy body
    assert eng.sql(
        "create function j(x int) returns int language javascript "
        "as $$ return x + 1 $$"
    ) is not None
    assert eng.sql("SELECT j(41) AS v").first().v == 42
    with pytest.raises(Exception, match="function body string"):
        eng.sql("create function b(x int) returns int language sql as select x")
    with pytest.raises(ValueError, match="create_state"):
        eng.sql(
            "create aggregate a2(x int) returns int language python as "
            "$$\ndef accumulate(s, x):\n    return s\n$$"
        )
    with pytest.raises(ValueError, match="RETURNS"):
        eng.sql("create function r2(x int) language sql as 'select x'")


def test_ttl_retention_seconds(eng):
    """TTL (reference e2e_test/ttl/ttl.slt, retention_seconds WITH
    option): requires APPEND ONLY; rows expire by ingest-chunk commit
    time as the clock advances, with NO DML needed — expired chunks are
    skipped at file level. now_override drives the clock."""
    import datetime as dt

    with pytest.raises(ValueError, match="APPEND ONLY"):
        eng.sql("CREATE TABLE tt0 (v int) WITH (retention_seconds = 5)")
    eng.now_override = dt.datetime(2024, 1, 1, 0, 0, 0)
    eng.sql("CREATE TABLE ttl_t (v int) APPEND ONLY WITH (retention_seconds = 5)")
    eng.sql("INSERT INTO ttl_t VALUES (1)")
    eng.now_override = dt.datetime(2024, 1, 1, 0, 0, 3)
    eng.sql("INSERT INTO ttl_t VALUES (2)")
    assert _rows(eng.sql("SELECT v FROM ttl_t")) == [(1,), (2,)]
    eng.now_override = dt.datetime(2024, 1, 1, 0, 0, 7)  # row 1 is 7s old
    assert _rows(eng.sql("SELECT v FROM ttl_t")) == [(2,)]
    eng.now_override = dt.datetime(2024, 1, 1, 0, 1, 0)
    assert _rows(eng.sql("SELECT v FROM ttl_t")) == []


def test_for_system_time_as_of(eng):
    """Batch time travel (reference e2e_test/time_travel/basic.slt,
    syntax.slt): epoch-number, timestamp-string, and NOW()-INTERVAL
    spellings; history before the floor raises 'version not found' as
    the reference does."""
    import calendar
    import datetime as dt

    eng.sql("CREATE TABLE tvl (k int PRIMARY KEY, v int)")
    eng.now_override = dt.datetime(2024, 1, 1, 0, 0, 0)
    eng.sql("INSERT INTO tvl VALUES (1, 10), (2, 20)")
    eng.now_override = dt.datetime(2024, 1, 1, 0, 1, 0)
    eng.sql("DELETE FROM tvl WHERE k = 1")
    eng.sql("INSERT INTO tvl VALUES (3, 30)")
    assert _rows(eng.sql("SELECT k, v FROM tvl")) == [(2, 20), (3, 30)]
    e_mid = calendar.timegm((2024, 1, 1, 0, 0, 30, 0, 0, 0))
    assert _rows(
        eng.sql(f"SELECT k, v FROM tvl FOR SYSTEM_TIME AS OF {e_mid}")
    ) == [(1, 10), (2, 20)]
    assert _rows(
        eng.sql(
            "SELECT k, v FROM tvl FOR SYSTEM_TIME AS OF "
            "'2024-01-01T00:00:30+00:00'"
        )
    ) == [(1, 10), (2, 20)]
    # NOW() pinned to the engine clock (00:01:00) minus 30s → 00:00:30
    assert _rows(
        eng.sql(
            "SELECT k, v FROM tvl FOR SYSTEM_TIME AS OF "
            "NOW() - INTERVAL '30' SECOND"
        )
    ) == [(1, 10), (2, 20)]
    # aggregates compose over the historical relation
    assert _rows(
        eng.sql(
            f"SELECT count(*) n, sum(v) s FROM tvl FOR SYSTEM_TIME AS OF {e_mid}"
        )
    ) == [(2, 30)]
    with pytest.raises(ValueError, match="version not found"):
        eng.sql("SELECT k FROM tvl FOR SYSTEM_TIME AS OF 100").collect()
    with pytest.raises(ValueError, match="not an engine table"):
        eng.sql("SELECT k FROM nosuch FOR SYSTEM_TIME AS OF 100").collect()


def test_read_only_transaction(eng):
    """START TRANSACTION READ ONLY (reference `handler/transaction.rs`,
    e2e_test/batch/transaction/read_only.slt): snapshot pinned at BEGIN,
    writes rejected with 'read-only transaction', COMMIT releases; READ
    WRITE / bare BEGIN are the statement-atomic no-op wrappers."""
    eng.sql("CREATE TABLE txt (v int PRIMARY KEY)")
    eng.sql("INSERT INTO txt VALUES (1), (2)")
    eng.sql("START TRANSACTION READ ONLY")
    assert _rows(eng.sql("SELECT v FROM txt")) == [(1,), (2,)]
    with pytest.raises(ValueError, match="read-only transaction"):
        eng.sql("INSERT INTO txt VALUES (3)")
    with pytest.raises(ValueError, match="read-only transaction"):
        eng.sql("CREATE TABLE t2 (v int)")
    with pytest.raises(ValueError, match="read-only transaction"):
        eng.sql("DROP TABLE txt")
    with pytest.raises(ValueError, match="already inside"):
        eng.sql("BEGIN")
    eng.sql("COMMIT")
    eng.sql("INSERT INTO txt VALUES (3)")
    assert _rows(eng.sql("SELECT v FROM txt")) == [(1,), (2,), (3,)]
    # isolation-level suffix accepted; read-write txns pass DML through
    eng.sql("START TRANSACTION READ WRITE, ISOLATION LEVEL REPEATABLE READ")
    eng.sql("INSERT INTO txt VALUES (4)")
    eng.sql("COMMIT")
    assert _rows(eng.sql("SELECT count(*) n FROM txt")) == [(4,)]
    with pytest.raises(ValueError, match="no transaction"):
        eng.sql("ROLLBACK")


def test_read_only_transaction_pins_other_writer(spark, tmp_path):
    """The multi-connection contract
    (e2e_test/batch/transaction/read_only_multi_conn.slt): a second
    engine process folding into the SAME warehouse stays invisible to a
    read-only transaction opened before the write, and visible after
    COMMIT — the pinned chunk-seq horizon does the isolation."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE mt (v int PRIMARY KEY)")
    eng.sql("INSERT INTO mt VALUES (1), (2)")
    eng.sql("START TRANSACTION READ ONLY")
    assert _rows(eng.sql("SELECT v FROM mt")) == [(1,), (2,)]
    other = Engine.open(spark, wh)  # the "other connection"
    other.sql("INSERT INTO mt VALUES (3)")
    assert _rows(other.sql("SELECT v FROM mt")) == [(1,), (2,), (3,)]
    # ...but not in the read-only transaction
    assert _rows(eng.sql("SELECT v FROM mt")) == [(1,), (2,)]
    eng.sql("COMMIT")
    assert _rows(eng.sql("SELECT v FROM mt")) == [(1,), (2,), (3,)]


def test_prepare_execute_deallocate(eng):
    """PREPARE/EXECUTE/DEALLOCATE (reference extended_handle.rs as plain
    statements): $n substitution outside string literals, any statement
    kind preparable (SELECT and INSERT here), DEALLOCATE drops."""
    eng.sql("CREATE TABLE pt (k int PRIMARY KEY, v text)")
    eng.sql("PREPARE ins AS INSERT INTO pt VALUES ($1, $2)")
    eng.sql("EXECUTE ins(1, 'a $1 b')")  # $1 inside a literal survives
    eng.sql("EXECUTE ins(2, 'y')")
    assert _rows(eng.sql("SELECT k, v FROM pt")) == [(1, "a $1 b"), (2, "y")]
    eng.sql("PREPARE q AS SELECT k, v FROM pt WHERE k = $1")
    assert _rows(eng.sql("EXECUTE q(2)")) == [(2, "y")]
    with pytest.raises(ValueError, match="no argument"):
        eng.sql("EXECUTE q()")
    eng.sql("DEALLOCATE q")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("EXECUTE q(1)")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("DEALLOCATE q")
    eng.sql("PREPARE q2 AS SELECT 1 AS one")
    eng.sql("DEALLOCATE ALL")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("EXECUTE q2")


def test_comment_on(spark, tmp_path):
    """COMMENT ON TABLE/COLUMN (reference `handler/comment.rs` →
    rw_description): stored durably, surfaced by DESCRIBE, IS NULL
    clears, dies with the object, replays on reopen."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE ct (k int PRIMARY KEY, v text)")
    eng.sql("COMMENT ON TABLE ct IS 'fact table'")
    eng.sql("COMMENT ON COLUMN ct.v IS 'the payload'")
    desc = {r.name: r.comment for r in eng.sql("DESCRIBE ct").collect()}
    assert desc["v"] == "the payload"
    assert desc["table description"] == "fact table"
    eng.sql("COMMENT ON COLUMN ct.v IS NULL")
    desc = {r.name: r.comment for r in eng.sql("DESCRIBE ct").collect()}
    assert desc["v"] is None
    with pytest.raises(ValueError, match="unknown relation"):
        eng.sql("COMMENT ON TABLE nope IS 'x'")
    eng2 = Engine.open(spark, wh)
    desc = {r.name: r.comment for r in eng2.sql("DESCRIBE ct").collect()}
    assert desc["table description"] == "fact table"
    eng2.sql("DROP TABLE ct")
    assert not [
        e for e in eng2._read_catalog() if e["name"].startswith("__comment_ct")
    ]


def test_over_window_mv_session_frame(eng):
    """`agg(x) OVER (PARTITION BY k ORDER BY o SESSION WITH GAP n)` in a
    CREATE MV (reference parser.rs WindowFrameUnits::Session +
    session.rs): maintained across inserts and deletes that split and
    merge sessions."""
    eng.sql("CREATE TABLE sfr (id int PRIMARY KEY, k int, o int, v int)")
    eng.sql(
        "CREATE MATERIALIZED VIEW sfr_mv AS SELECT k, o, v, "
        "sum(v) OVER (PARTITION BY k ORDER BY o SESSION WITH GAP 10) AS ss, "
        "count(v) OVER (PARTITION BY k ORDER BY o SESSION WITH GAP 10) AS sn "
        "FROM sfr"
    )
    # k=1: o=1,5 (one session), o=30 (second session)
    eng.sql("INSERT INTO sfr VALUES (1,1,1,100), (2,1,5,10), (3,1,30,1), (4,2,7,7)")
    assert _rows(eng.sql("SELECT k, o, ss, sn FROM sfr_mv")) == [
        (1, 1, 110, 2), (1, 5, 110, 2), (1, 30, 1, 1), (2, 7, 7, 1),
    ]
    # o=18 bridges the gap chains: 5→18 (13>10 still separate)... no:
    # 5→18 gap 13 > 10, 18→30 gap 12 > 10 → three sessions
    eng.sql("INSERT INTO sfr VALUES (5,1,18,1000)")
    assert _rows(eng.sql("SELECT k, o, ss, sn FROM sfr_mv WHERE k = 1")) == [
        (1, 1, 110, 2), (1, 5, 110, 2), (1, 18, 1000, 1), (1, 30, 1, 1),
    ]
    # o=12 chains 5→12→18 and 18→30 stays split; session = {1,5,12,18}
    eng.sql("INSERT INTO sfr VALUES (6,1,12,10000)")
    assert _rows(eng.sql("SELECT k, o, ss, sn FROM sfr_mv WHERE k = 1")) == [
        (1, 1, 11110, 4), (1, 5, 11110, 4), (1, 12, 11110, 4),
        (1, 18, 11110, 4), (1, 30, 1, 1),
    ]
    # deleting the bridge splits the session again
    eng.sql("DELETE FROM sfr WHERE id = 6")
    assert _rows(eng.sql("SELECT k, o, ss, sn FROM sfr_mv WHERE k = 1")) == [
        (1, 1, 110, 2), (1, 5, 110, 2), (1, 18, 1000, 1), (1, 30, 1, 1),
    ]
    with pytest.raises(ValueError, match="SESSION frame"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad_sfr AS SELECT k, o, "
            "row_number() OVER (PARTITION BY k ORDER BY o SESSION WITH GAP 5) AS rn "
            "FROM sfr"
        )


def test_queryable_internal_state(eng):
    """Internal-state reads (reference
    e2e_test/queryable_internal_state/group_agg.slt + rw_internal
    tables): __internal_<obj>_state exposes raw insert chunks with their
    __seq commit sequence, __internal_<obj>_tombstones the delete
    tombstones; SHOW INTERNAL TABLES lists them. Read-only, zero-copy."""
    eng.sql("CREATE TABLE qit (k int PRIMARY KEY, v int)")
    eng.sql("CREATE MATERIALIZED VIEW qit_mv AS SELECT k % 2 AS g, sum(v) AS s FROM qit GROUP BY k % 2")
    eng.sql("INSERT INTO qit VALUES (1, 10), (2, 20)")
    eng.sql("INSERT INTO qit VALUES (3, 30)")
    eng.sql("DELETE FROM qit WHERE k = 2")
    rows = _rows(eng.sql("SELECT k, v, __seq FROM __internal_qit_state"))
    # raw chunks keep the deleted row (the tombstone masks it at read)
    assert (2, 20, 1) in rows and len(rows) == 3
    tombs = _rows(eng.sql("SELECT k, __del_seq FROM __internal_qit_tombstones"))
    assert tombs == [(2, 3)]
    # live read still excludes it
    assert _rows(eng.sql("SELECT k FROM qit")) == [(1,), (3,)]
    listing = [r.name for r in eng.sql("SHOW INTERNAL TABLES").collect()]
    assert "__internal_qit_state" in listing
    assert "__internal_qit_mv_state" in listing
    # the MV's group-agg state rows are its source-row state
    n = eng.sql("SELECT count(*) AS n FROM __internal_qit_mv_state").first().n
    assert n == 3
    with pytest.raises(ValueError, match="unknown relation"):
        eng.sql("SELECT * FROM __internal_nope_state")


def test_chunked_backfill_resumes_after_crash(spark, tmp_path, monkeypatch):
    """Resumable snapshot backfill (reference backfill executor family,
    `src/stream/src/executor/backfill/` per-vnode progress): with
    `SET rw.backfill_chunks = 4` the snapshot folds as 4 pk-hash slices
    with durable progress; a crash mid-backfill resumes at the failed
    slice on the next CREATE, never re-folding completed slices."""
    from risingwave_spark.streaming import mv as mvmod

    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE bft (k int PRIMARY KEY, v int)")
    eng.sql("INSERT INTO bft SELECT id, id * 10 FROM range(0, 200)")
    eng.sql("SET rw.backfill_chunks = 4")
    calls = {"n": 0, "crash_at": 3}
    orig = mvmod.MaterializedView.apply_batch

    def counting(self, batch, batch_id=None, batch_ns=None):
        if batch_ns == "__backfill":
            calls["n"] += 1
            if calls["n"] == calls["crash_at"]:
                raise RuntimeError("simulated backfill crash")
        return orig(self, batch, batch_id=batch_id, batch_ns=batch_ns)

    monkeypatch.setattr(mvmod.MaterializedView, "apply_batch", counting)
    ddl = (
        "CREATE MATERIALIZED VIEW bf_mv AS "
        "SELECT k % 7 AS g, sum(v) AS s FROM bft GROUP BY k % 7"
    )
    with pytest.raises(RuntimeError, match="simulated"):
        eng.sql(ddl)
    import os as _os

    assert _os.path.exists(eng._backfill_progress_path("bf_mv"))
    calls["crash_at"] = -1  # no more crashes
    calls["n"] = 0
    eng.sql(ddl)  # re-issue: resumes slices 2 and 3 only
    assert calls["n"] == 2
    assert not _os.path.exists(eng._backfill_progress_path("bf_mv"))
    assert _rows(eng.sql("SELECT g, s FROM bf_mv")) == _rows(
        eng.sql("SELECT k % 7 AS g, sum(v) AS s FROM bft GROUP BY k % 7")
    )
    # and the finished MV keeps maintaining
    eng.sql("INSERT INTO bft VALUES (1000, 7)")
    assert _rows(eng.sql("SELECT s FROM bf_mv WHERE g = 1000 % 7")) == _rows(
        eng.sql("SELECT sum(v) AS s FROM bft WHERE k % 7 = 1000 % 7")
    )
    eng.sql("SET rw.backfill_chunks = 1")


def test_background_ddl(eng):
    """SET BACKGROUND_DDL=true (reference e2e_test/background_ddl):
    CREATE MV returns immediately, duplicate names are rejected while
    creating, WAIT joins the jobs (surfacing failures), SHOW JOBS lists
    them, and the finished MV is correct and maintained."""
    eng.sql("CREATE TABLE bgt (k int PRIMARY KEY, v int)")
    eng.sql("INSERT INTO bgt SELECT id, id FROM range(0, 50)")
    try:
        eng.sql("SET BACKGROUND_DDL = true")
        eng.sql("SET rw.backfill_chunks = 4")
        eng.sql(
            "CREATE MATERIALIZED VIEW bgm AS "
            "SELECT k % 3 AS g, sum(v) AS s FROM bgt GROUP BY k % 3"
        )
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("CREATE MATERIALIZED VIEW bgm AS SELECT k FROM bgt")
        eng.sql("WAIT")
        assert _rows(eng.sql("SELECT g, s FROM bgm")) == _rows(
            eng.sql("SELECT k % 3 AS g, sum(v) AS s FROM bgt GROUP BY k % 3")
        )
        assert eng._bg_jobs == {}
        # a failing background job surfaces at WAIT, not silently
        eng.sql("CREATE MATERIALIZED VIEW bg_bad AS SELECT nocol FROM bgt")
        with pytest.raises(RuntimeError, match="bg_bad"):
            eng.sql("WAIT")
        # maintained after completion
        eng.sql("INSERT INTO bgt VALUES (100, 100)")
        assert _rows(eng.sql("SELECT s FROM bgm WHERE g = 1")) == _rows(
            eng.sql("SELECT sum(v) AS s FROM bgt WHERE k % 3 = 1")
        )
    finally:
        eng.sql("SET BACKGROUND_DDL = false")
        eng.sql("SET rw.backfill_chunks = 1")


def test_explain_mv_stream_pipeline(eng):
    """EXPLAIN CREATE MV prints the STREAM pipeline (reference
    handler/explain.rs shows the StreamMaterialize tree) above the
    batch-twin Catalyst plan, routed per MV shape, without executing."""
    eng.sql("CREATE TABLE ept (k int PRIMARY KEY, v int, ts timestamp)")
    eng.sql("CREATE TABLE ep2 (k2 int PRIMARY KEY, w int)")

    def plan(sql):
        return "\n".join(r.plan for r in eng.sql("EXPLAIN " + sql).collect())

    p = plan("CREATE MATERIALIZED VIEW e1 AS SELECT k % 2 AS g, sum(v) AS s FROM ept GROUP BY k % 2")
    assert "MaterializedGroupAgg" in p and "StreamTableScan" in p and "Physical Plan" in p
    p = plan("CREATE MATERIALIZED VIEW e2 AS SELECT k, v FROM ept WHERE v > 0")
    assert "RetractableRowView" in p
    p = plan(
        "CREATE MATERIALIZED VIEW e3 AS SELECT k, k2 FROM ept JOIN ep2 ON k = k2"
    )
    assert "RetractableStreamJoin" in p
    p = plan(
        "CREATE MATERIALIZED VIEW e4 AS SELECT k, v, "
        "sum(v) OVER (PARTITION BY k ORDER BY v SESSION WITH GAP 5) AS ss FROM ept"
    )
    assert "MaterializedOverWindowDelta" in p and "whole-partition" in p
    # EXPLAIN executed nothing
    assert "e1" not in eng.mv_handles and _rows(eng.sql("SHOW MATERIALIZED VIEWS")) == []


def test_secret_ddl(spark, tmp_path):
    """CREATE/ALTER/DROP SECRET + SHOW SECRETS (reference
    `handler/create_secret.rs`, e2e_test/ddl/secret.slt): meta backend
    only, values stored outside the replayed catalog (SHOW never echoes
    them), `secret <name>` WITH-option references resolve."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    with pytest.raises(ValueError, match='backend "fake-backend" is not supported'):
        eng.sql("create secret s1 with (backend = 'fake-backend') as 'x'")
    eng.sql("create secret s1 with (backend = 'meta') as 'demo_secret'")
    eng.sql("alter secret s1 as 'demo_altered'")
    assert [r.name for r in eng.sql("SHOW SECRETS").collect()] == ["s1"]
    with pytest.raises(ValueError, match="unknown secret"):
        eng.sql("alter secret nope as 'x'")
    from risingwave_spark.frontend import _load_secrets, _resolve_secret_refs

    assert _load_secrets(eng) == {"s1": "demo_altered"}
    assert _resolve_secret_refs(eng, {"password": "secret s1"}) == {
        "password": "demo_altered"
    }
    with pytest.raises(ValueError, match="unknown secret"):
        _resolve_secret_refs(eng, {"password": "secret missing"})
    eng.sql("drop secret s1")
    assert eng.sql("SHOW SECRETS").count() == 0
    with pytest.raises(ValueError, match="unknown secret"):
        eng.sql("drop secret s1")
    eng.sql("drop secret if exists s1")


def test_time_travel_in_joins(eng):
    """FOR SYSTEM_TIME AS OF inside joins (reference
    e2e_test/time_travel/join.slt, lookup_join.slt): historical and
    current versions of tables join freely in one query; each AS-OF
    relation resolves independently."""
    import calendar
    import datetime as dt

    eng.now_override = dt.datetime(2024, 1, 1, 0, 0, 0)
    eng.sql("CREATE TABLE ttj_a (k int PRIMARY KEY, va int)")
    eng.sql("CREATE TABLE ttj_b (k int PRIMARY KEY, vb int)")
    eng.sql("INSERT INTO ttj_a VALUES (1, 10), (2, 20)")
    eng.sql("INSERT INTO ttj_b VALUES (1, 100), (2, 200)")
    eng.now_override = dt.datetime(2024, 1, 1, 0, 1, 0)
    eng.sql("UPDATE ttj_a SET va = 11 WHERE k = 1")
    eng.sql("DELETE FROM ttj_b WHERE k = 2")
    mid = calendar.timegm((2024, 1, 1, 0, 0, 30, 0, 0, 0))
    # historical ⋈ historical
    assert _rows(eng.sql(
        f"SELECT a.k, va, vb FROM ttj_a FOR SYSTEM_TIME AS OF {mid} a "
        f"JOIN ttj_b FOR SYSTEM_TIME AS OF {mid} b ON a.k = b.k"
    )) == [(1, 10, 100), (2, 20, 200)]
    # historical ⋈ current
    assert _rows(eng.sql(
        f"SELECT a.k, va, vb FROM ttj_a FOR SYSTEM_TIME AS OF {mid} a "
        f"JOIN ttj_b b ON a.k = b.k"
    )) == [(1, 10, 100)]
    # current ⋈ current (control)
    assert _rows(eng.sql(
        "SELECT a.k, va, vb FROM ttj_a a JOIN ttj_b b ON a.k = b.k"
    )) == [(1, 11, 100)]


def test_python_table_function_and_rw_catalog(eng):
    """RETURNS TABLE LANGUAGE python → native Python UDTF (reference
    python_udf.slt series/split: generator body, scalar / tuple / object
    yields), plus rw_catalog system relations resolving on demand."""
    eng.sql(
        "create function series(n int) returns table (x int) language python as $$\n"
        "def series(n):\n"
        "    for i in range(n):\n"
        "        yield i\n"
        "$$"
    )
    assert _rows(eng.sql("select * from series(5)")) == [(i,) for i in range(5)]
    eng.sql(
        "create function split2(s varchar) returns table (word varchar, length int) "
        "language python as $$\n"
        "class Ret:\n"
        "    def __init__(self, word, length):\n"
        "        self.word = word\n"
        "        self.length = length\n"
        "def split2(s):\n"
        "    for word in s.split():\n"
        "        yield Ret(word, len(word))\n"
        "$$"
    )
    assert _rows(eng.sql("select * from split2('rising wave')")) == [
        ("rising", 6), ("wave", 4),
    ]
    # rw_catalog relations (schema qualifier stripped, single schema)
    eng.sql("CREATE TABLE rc_t (k int PRIMARY KEY)")
    assert _rows(eng.sql("SELECT name FROM rw_catalog.rw_tables")) == [("rc_t",)]
    assert _rows(eng.sql(
        "SELECT name, kind FROM rw_functions ORDER BY name"
    )) == [("series", "function"), ("split2", "function")]
    assert eng.sql("SELECT count(*) AS n FROM rw_ddl_progress").first().n == 0
    eng.sql("drop function series")
    with pytest.raises(Exception):
        eng.sql("select * from series(3)").collect()


def test_eowc_over_window_mv_sql(eng):
    """EMIT ON WINDOW CLOSE with an OVER-window body (reference eowc.rs
    via the optimizer's EOWC planning): rows emit exactly once, in
    event-time order, with window functions attached — including a
    bounded ROWS frame whose backward reach crosses the emission
    boundary (served by the retained tail); late rows are dropped."""
    eng.sql(
        """
        CREATE TABLE ewt (
            id int8 PRIMARY KEY, k int4, v int8, ts timestamp,
            WATERMARK FOR ts AS ts - INTERVAL '10 minutes'
        ) APPEND ONLY
        """
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW ewmv AS SELECT k, ts, v, "
        "row_number() OVER (PARTITION BY k ORDER BY ts) AS rn, "
        "sum(v) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) AS s2 FROM ewt EMIT ON WINDOW CLOSE"
    )
    eng.sql(
        "INSERT INTO ewt VALUES "
        "(1, 1, 10, TIMESTAMP '2024-01-01 00:00:00'),"
        "(2, 1, 20, TIMESTAMP '2024-01-01 00:20:00'),"
        "(3, 1, 40, TIMESTAMP '2024-01-01 00:40:00')"
    )
    # wm = 00:30 → rows 1,2 emitted
    assert _rows(eng.sql("SELECT k, rn, s2 FROM ewmv")) == [(1, 1, 10), (1, 2, 30)]
    eng.sql(
        "INSERT INTO ewt VALUES (4, 1, 80, TIMESTAMP '2024-01-01 01:10:00'),"
        "(5, 1, 5, TIMESTAMP '2024-01-01 00:25:00')"
    )
    # wm = 01:00 → row 3 emits (s2 = 20+40 needs emitted row 2: the tail);
    # the late row 5 (00:25 <= old wm 00:30) is dropped
    assert _rows(eng.sql("SELECT k, rn, s2 FROM ewmv")) == [
        (1, 1, 10), (1, 2, 30), (1, 3, 60),
    ]
    # deletes are rejected loudly (append-only contract)
    with pytest.raises(Exception, match="[Aa]ppend[- ]only|APPEND ONLY"):
        eng.sql("DELETE FROM ewt WHERE id = 1")
    # non-watermarked order column is rejected
    eng.sql("CREATE TABLE ewt2 (id int8 PRIMARY KEY, k int4, v int8, ts timestamp) APPEND ONLY")
    with pytest.raises(ValueError, match="needs a watermark"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad_ew AS SELECT k, ts, v, "
            "row_number() OVER (PARTITION BY k ORDER BY ts) AS rn "
            "FROM ewt2 EMIT ON WINDOW CLOSE"
        )


def test_create_schema_namespacing(spark, tmp_path):
    """Schemas (reference e2e_test/ddl/schema.slt): qualified names are
    distinct namespaces; duplicate schema errors (IF NOT EXISTS no-op);
    DROP of a non-empty schema errors; `public.` resolves to the default
    namespace; replay restores schemas."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("create table ddl_table (v int PRIMARY KEY)")
    eng.sql("create schema ddl_schema")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("create schema ddl_schema")
    eng.sql("create schema if not exists ddl_schema")
    eng.sql("create table ddl_schema.ddl_table (v int PRIMARY KEY)")
    eng.sql("insert into ddl_table values (1)")
    eng.sql("insert into ddl_schema.ddl_table values (2), (3)")
    assert _rows(eng.sql("select v from public.ddl_table")) == [(1,)]
    assert _rows(eng.sql("select v from ddl_schema.ddl_table")) == [(2,), (3,)]
    with pytest.raises(ValueError, match="not empty"):
        eng.sql("drop schema ddl_schema")
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("select v from ddl_schema.ddl_table")) == [(2,), (3,)]
    eng2.sql("drop table ddl_schema.ddl_table")
    eng2.sql("drop schema ddl_schema")
    with pytest.raises(ValueError, match="unknown schema"):
        eng2.sql("drop schema ddl_schema")
    eng2.sql("drop schema if exists ddl_schema")


def test_create_mv_join_with_mv_input(eng):
    """MV-as-join-input (reference mv-on-mv.md composed with the
    multi-way join plan — the desugared form of subqueries in MV
    bodies, e2e_test/streaming/tpch/views/q18.slt.part): a CREATE MV
    may JOIN an agg-keyed MV; changelog updates of the upstream MV —
    including group disappearance — retract through the join."""
    eng.sql("CREATE TABLE mj_ord (o_id int8 PRIMARY KEY, o_pri text)")
    eng.sql("CREATE TABLE mj_item (i_id int8 PRIMARY KEY, i_ord int8, qty float8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW mj_sums AS "
        "SELECT i_ord, sum(qty) AS sum_qty FROM mj_item GROUP BY i_ord"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW mj_mv AS "
        "SELECT o_pri, count(*) AS order_count "
        "FROM mj_ord o JOIN mj_sums m ON o.o_id = m.i_ord "
        "WHERE m.sum_qty > 5 GROUP BY o_pri"
    )
    eng.sql("INSERT INTO mj_ord VALUES (1,'HI'),(2,'LO'),(3,'HI'),(4,'LO')")
    eng.sql(
        "INSERT INTO mj_item VALUES (100,1,3.0),(101,1,4.0),(102,2,9.0),"
        "(103,3,2.0),(104,4,6.0)"
    )
    assert _rows(eng.sql("SELECT o_pri, order_count FROM mj_mv")) == [
        ("HI", 1), ("LO", 2),
    ]
    # group 1 drops under the threshold; order 4 deletes outright
    eng.sql("DELETE FROM mj_item WHERE i_id = 101")
    eng.sql("DELETE FROM mj_ord WHERE o_id = 4")
    assert _rows(eng.sql("SELECT o_pri, order_count FROM mj_mv")) == [("LO", 1)]
    # group 3 re-crosses the threshold
    eng.sql("INSERT INTO mj_item VALUES (105,3,8.0)")
    assert _rows(eng.sql("SELECT o_pri, order_count FROM mj_mv")) == [
        ("HI", 1), ("LO", 1),
    ]


def test_create_mv_join_mv_as_first_input(eng):
    """The chain's DRIVING side may itself be an MV: the upstream agg
    MV's Update-pair changelog feeds the first join's left input."""
    eng.sql("CREATE TABLE mf_ev (e_id int8 PRIMARY KEY, grp int8, v int8)")
    eng.sql("CREATE TABLE mf_dim (d_id int8 PRIMARY KEY, label text)")
    eng.sql(
        "CREATE MATERIALIZED VIEW mf_agg AS "
        "SELECT grp, sum(v) AS total FROM mf_ev GROUP BY grp"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW mf_mv AS "
        "SELECT a.grp, a.total, d.label "
        "FROM mf_agg a JOIN mf_dim d ON a.grp = d.d_id"
    )
    eng.sql("INSERT INTO mf_dim VALUES (1,'one'),(2,'two')")
    eng.sql("INSERT INTO mf_ev VALUES (10,1,5),(11,1,7),(12,2,3)")
    assert _rows(eng.sql("SELECT grp, total, label FROM mf_mv")) == [
        (1, 12, "one"), (2, 3, "two"),
    ]
    eng.sql("DELETE FROM mf_ev WHERE e_id = 11")
    assert _rows(eng.sql("SELECT grp, total, label FROM mf_mv")) == [
        (1, 5, "one"), (2, 3, "two"),
    ]
    eng.sql("DELETE FROM mf_ev WHERE grp = 2")
    assert _rows(eng.sql("SELECT grp, total, label FROM mf_mv")) == [(1, 5, "one")]


def test_create_mv_comma_join(eng):
    """Comma FROM lists (reference e2e_test/streaming/tpch/views — every
    multi-table view is spelled ``FROM a, b, c WHERE equi...``):
    desugared onto the retractable join chain; filters stay residual;
    deletes on any table retract."""
    eng.sql("CREATE TABLE cj_c (c_ck int8 PRIMARY KEY, c_seg text)")
    eng.sql("CREATE TABLE cj_o (o_ok int8 PRIMARY KEY, o_ck int8)")
    eng.sql("CREATE TABLE cj_l (l_id int8 PRIMARY KEY, l_ok int8, l_price float8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW cj_mv AS "
        "SELECT o_ok, sum(l_price) AS revenue FROM cj_c, cj_o, cj_l "
        "WHERE c_seg = 'A' AND c_ck = o_ck AND l_ok = o_ok GROUP BY o_ok"
    )
    eng.sql("INSERT INTO cj_c VALUES (1,'A'),(2,'B'),(3,'A')")
    eng.sql("INSERT INTO cj_o VALUES (10,1),(11,2),(12,3)")
    eng.sql("INSERT INTO cj_l VALUES (100,10,5.0),(101,10,6.0),(102,11,7.0),(103,12,8.0)")
    assert _rows(eng.sql("SELECT o_ok, revenue FROM cj_mv")) == [(10, 11.0), (12, 8.0)]
    eng.sql("DELETE FROM cj_l WHERE l_id = 101")
    eng.sql("DELETE FROM cj_c WHERE c_ck = 3")
    assert _rows(eng.sql("SELECT o_ok, revenue FROM cj_mv")) == [(10, 5.0)]


def test_create_mv_order_by_limit_topn_read(eng):
    """``ORDER BY ... LIMIT k`` MV tail (reference TopN executor,
    tpch views q3/q10): unbounded maintenance + ordered bound at read;
    deletes re-elect the next rows into the top-k."""
    eng.sql("CREATE TABLE tl_t (k int8 PRIMARY KEY, grp text, v float8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW tl_mv AS "
        "SELECT grp, sum(v) AS total FROM tl_t GROUP BY grp "
        "ORDER BY total DESC, grp LIMIT 2"
    )
    eng.sql(
        "INSERT INTO tl_t VALUES (1,'a',5.0),(2,'a',6.0),(3,'b',9.0),"
        "(4,'c',4.0),(5,'d',1.0)"
    )
    out = [tuple(r) for r in eng.sql("SELECT grp, total FROM tl_mv").collect()]
    assert out == [("a", 11.0), ("b", 9.0)]
    eng.sql("DELETE FROM tl_t WHERE k = 2")
    out = [tuple(r) for r in eng.sql("SELECT grp, total FROM tl_mv").collect()]
    assert out == [("b", 9.0), ("a", 5.0)]
    # the unbounded state keeps maintaining below the k horizon
    eng.sql("DELETE FROM tl_t WHERE k = 3")
    out = [tuple(r) for r in eng.sql("SELECT grp, total FROM tl_mv").collect()]
    assert out == [("a", 5.0), ("c", 4.0)]


def test_create_mv_subquery_desugar(eng):
    """WHERE-subquery desugar (reference apply_to_join_rule.rs subquery
    unnesting): EXISTS → semi step with correlated non-equi residual;
    IN over grouped HAVING → helper agg MV semi step; NOT IN → anti;
    correlated scalar → helper agg + inner join + residual compare;
    uncorrelated scalar → DynamicFilter re-splice when the value moves.
    All five stay exact under deletes."""
    eng.sql("CREATE TABLE sq_o (o_id int8 PRIMARY KEY, o_pri text, o_day int8)")
    eng.sql("CREATE TABLE sq_l (l_id int8 PRIMARY KEY, l_oid int8, l_qty float8, l_day int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW sq_ex AS SELECT o_pri, count(*) AS n FROM sq_o "
        "WHERE EXISTS (SELECT 1 FROM sq_l WHERE l_oid = o_id AND l_day > o_day) "
        "GROUP BY o_pri"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW sq_in AS SELECT o_id, o_pri FROM sq_o "
        "WHERE o_id IN (SELECT l_oid FROM sq_l GROUP BY l_oid HAVING sum(l_qty) > 5)"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW sq_anti AS SELECT o_pri, count(*) AS n FROM sq_o "
        "WHERE o_id NOT IN (SELECT l_oid FROM sq_l WHERE l_qty > 100) GROUP BY o_pri"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW sq_csc AS SELECT o_id, o_day FROM sq_o "
        "WHERE o_day < (SELECT 0.5 * sum(l_qty) FROM sq_l WHERE l_oid = o_id)"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW sq_usc AS SELECT o_pri, count(*) AS n FROM sq_o "
        "WHERE o_day > (SELECT 0.5*sum(l_qty)/count(*) FROM sq_l) GROUP BY o_pri"
    )
    eng.sql("INSERT INTO sq_o VALUES (1,'A',10),(2,'B',3),(3,'A',8),(4,'B',1)")
    eng.sql(
        "INSERT INTO sq_l VALUES (10,1,3.0,11),(11,1,4.0,2),(12,2,9.0,5),"
        "(13,3,2.0,9),(14,4,6.0,0)"
    )
    assert _rows(eng.sql("SELECT * FROM sq_ex")) == [("A", 2), ("B", 1)]
    assert _rows(eng.sql("SELECT * FROM sq_in")) == [(1, "A"), (2, "B"), (4, "B")]
    assert _rows(eng.sql("SELECT * FROM sq_anti")) == [("A", 2), ("B", 2)]
    assert _rows(eng.sql("SELECT * FROM sq_csc")) == [(2, 3), (4, 1)]
    assert _rows(eng.sql("SELECT * FROM sq_usc")) == [("A", 2), ("B", 1)]
    eng.sql("DELETE FROM sq_l WHERE l_id = 10")
    eng.sql("DELETE FROM sq_l WHERE l_id = 12")
    assert _rows(eng.sql("SELECT * FROM sq_ex")) == [("A", 1)]
    assert _rows(eng.sql("SELECT * FROM sq_in")) == [(4, "B")]
    assert _rows(eng.sql("SELECT * FROM sq_anti")) == [("A", 2), ("B", 2)]
    assert _rows(eng.sql("SELECT * FROM sq_csc")) == [(4, 1)]
    # the uncorrelated scalar moved (avg now 4.0): DynamicFilter
    # re-splice keeps untouched groups consistent with the new value
    assert _rows(eng.sql("SELECT * FROM sq_usc")) == [("A", 2), ("B", 1)]


def test_subscription_survives_state_compaction(eng):
    """State compaction RESETS ChunkedState._seq; changelog chunk ids
    must stay monotonic across it (CHUNK_BASE) or post-compaction
    chunks reuse already-acked ids and subscribers silently lose
    deltas (round-8 regression found by the multi-partition kafka
    sink test). Folds 2x compact_every batches through a live cursor
    and reconstructs the MV exactly from the delivered chunks."""
    eng.sql("CREATE TABLE cmp (k int8 PRIMARY KEY, g int8, v int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW cmp_mv AS SELECT g, sum(v) AS sv "
        "FROM cmp GROUP BY g"
    )
    sub = eng.create_subscription("cmpsub", "cmp_mv")
    state: dict = {}
    n_delivered = 0
    for i in range(36):  # compact_every = 16: crosses two compactions
        eng.sql(f"INSERT INTO cmp VALUES ({i}, {i % 3}, {i})")
        got = sub.fetch()
        assert got is not None, f"lost delta at fold {i} (chunk id reused)"
        df, tok = got
        for r in sorted(df.collect(), key=lambda r: (r["__chunk"], r["__op"])):
            if r["__op"] < 0:
                state.pop(r["g"], None)
            else:
                state[r["g"]] = r["sv"]
        n_delivered += 1
        sub.ack(tok)
    want = {r.g: r.sv for r in eng.sql("SELECT g, sv FROM cmp_mv").collect()}
    assert state == want, (state, want)
    assert n_delivered == 36


def test_dynamic_filter_band_pruned_resplice(eng):
    """Range-pruned DynamicFilter re-splice (reference
    `dynamic_filter.rs:39`: a scalar MOVE re-evaluates only rows
    BETWEEN the old and new value): when the uncorrelated WHERE scalar
    moves, only groups owning rows whose lhs lies in the moved band
    recompute — touched-key count proportional to the band, not the
    state (r7 VERDICT 'What's wrong' #3)."""
    eng.sql("CREATE TABLE dfb (id int8 PRIMARY KEY, g int8, x int8)")
    eng.sql("CREATE TABLE dfs (s int8 PRIMARY KEY)")
    # 50 groups, one row each, x = group id; scalar = max(s)
    eng.sql(
        "CREATE MATERIALIZED VIEW dfm AS SELECT g, count(*) AS n FROM dfb "
        "WHERE x > (SELECT max(s) FROM dfs) GROUP BY g"
    )
    eng.sql("INSERT INTO dfb SELECT id, id, id FROM (SELECT explode(sequence(1, 50)) AS id)")
    eng.sql("INSERT INTO dfs VALUES (10)")
    assert eng.sql("SELECT count(*) AS n FROM dfm").first().n == 40  # x in 11..50
    v = eng.mv_handles["dfm"].view
    touched: list[int] = []
    orig = v.retouch

    def spy(aff):
        touched.append(aff.count())
        return orig(aff)

    v.retouch = spy
    try:
        # scalar moves 10 → 13: only groups with x in [10, 13] can flip
        eng.sql("INSERT INTO dfs VALUES (13)")
    finally:
        v.retouch = orig
    assert eng.sql("SELECT count(*) AS n FROM dfm").first().n == 37  # x in 14..50
    assert touched and max(touched) <= 4, (
        f"re-splice touched {touched} groups; the [10,13] band holds 4"
    )
    # moving back down re-admits exactly the band too
    eng.sql("DELETE FROM dfs WHERE s = 13")
    assert eng.sql("SELECT count(*) AS n FROM dfm").first().n == 40


def test_create_mv_using_and_natural_join(eng, spark):
    """JOIN ... USING and NATURAL JOIN in MV bodies (reference
    `e2e_test/streaming/natural_and_cross_join.slt`): compiled via the
    dimension path — Catalyst binds USING/NATURAL natively in the
    per-batch recompute; the MV maintains w.r.t. the first table."""
    spark.createDataFrame(
        [(1, "ones"), (2, "twos")], "k int, label string"
    ).createOrReplaceTempView("un_dim")
    eng.sql("CREATE TABLE un_t (id int8 PRIMARY KEY, k int4, v int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW un_mv AS "
        "SELECT k, sum(v) AS total FROM un_t JOIN un_dim USING (k) GROUP BY k"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW un_mv2 AS "
        "SELECT k, max(label) AS label, sum(v) AS total "
        "FROM un_t NATURAL JOIN un_dim GROUP BY k"
    )
    eng.sql("INSERT INTO un_t VALUES (10,1,5),(11,1,7),(12,2,3),(13,3,9)")
    assert _rows(eng.sql("SELECT k, total FROM un_mv")) == [(1, 12), (2, 3)]
    assert _rows(eng.sql("SELECT label, total FROM un_mv2")) == [
        ("ones", 12), ("twos", 3),
    ]
    eng.sql("DELETE FROM un_t WHERE id = 11")
    assert _rows(eng.sql("SELECT k, total FROM un_mv")) == [(1, 5), (2, 3)]
    assert _rows(eng.sql("SELECT label, total FROM un_mv2")) == [
        ("ones", 5), ("twos", 3),
    ]
    # dimension-side group keys stay a loud error (documented surface)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="maintained"):
        eng.sql(
            "CREATE MATERIALIZED VIEW un_bad AS "
            "SELECT label, sum(v) AS t FROM un_t NATURAL JOIN un_dim GROUP BY label"
        )


def test_create_mv_self_join_roles(eng):
    """Self-join MV in the reference's own spelling (`views/q7.slt.part`
    `nation n1, nation n2`): each aliased occurrence of the duplicated
    table gets a per-role column rename inside the chain, alias-
    qualified references rewrite to the renamed columns, and DML on the
    shared base table flows into BOTH roles (retraction included)."""
    eng.sql("CREATE TABLE sj_n (n_nationkey int8 PRIMARY KEY, n_name text)")
    eng.sql("CREATE TABLE sj_s (s_suppkey int8 PRIMARY KEY, s_nationkey int8)")
    eng.sql("CREATE TABLE sj_c (c_custkey int8 PRIMARY KEY, c_nationkey int8)")
    eng.sql(
        "CREATE TABLE sj_t (t_id int8 PRIMARY KEY, t_suppkey int8, "
        "t_custkey int8, t_qty int8)"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW sj_mv AS "
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "sum(t_qty) AS qty "
        "FROM sj_t, sj_s, sj_c, sj_n n1, sj_n n2 "
        "WHERE t_suppkey = s_suppkey AND t_custkey = c_custkey "
        "AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey "
        "AND ((n1.n_name = 'FR' AND n2.n_name = 'DE') "
        "  OR (n1.n_name = 'DE' AND n2.n_name = 'FR')) "
        "GROUP BY supp_nation, cust_nation"
    )
    eng.sql("INSERT INTO sj_n VALUES (1,'FR'),(2,'DE'),(3,'RU')")
    eng.sql("INSERT INTO sj_s VALUES (10,1),(11,2),(12,3)")
    eng.sql("INSERT INTO sj_c VALUES (20,2),(21,1),(22,3)")
    eng.sql(
        "INSERT INTO sj_t VALUES (100,10,20,5),(101,11,21,7),"
        "(102,10,22,1),(103,11,20,2)"
    )
    assert _rows(eng.sql("SELECT supp_nation, cust_nation, qty FROM sj_mv")) == [
        ("DE", "FR", 7),
        ("FR", "DE", 5),
    ]
    # fact DML folds through both roles
    eng.sql("INSERT INTO sj_t VALUES (104,10,20,10)")
    eng.sql("DELETE FROM sj_t WHERE t_id = 101")
    assert _rows(eng.sql("SELECT supp_nation, cust_nation, qty FROM sj_mv")) == [
        ("FR", "DE", 15),
    ]
    # DML on the SELF-JOINED table retracts through both roles at once
    eng.sql("UPDATE sj_n SET n_name = 'FRX' WHERE n_nationkey = 1")
    assert _rows(eng.sql("SELECT supp_nation, cust_nation, qty FROM sj_mv")) == []
    eng.sql("UPDATE sj_n SET n_name = 'FR' WHERE n_nationkey = 1")
    assert _rows(eng.sql("SELECT supp_nation, cust_nation, qty FROM sj_mv")) == [
        ("FR", "DE", 15),
    ]
    # unqualified reference to a duplicated table's column is ambiguous
    with pytest.raises(ValueError, match="ambiguous"):
        eng.sql(
            "CREATE MATERIALIZED VIEW sj_bad AS "
            "SELECT n_name AS x, count(*) AS n "
            "FROM sj_s, sj_n n1, sj_n n2 "
            "WHERE s_nationkey = n1.n_nationkey "
            "AND s_nationkey = n2.n_nationkey GROUP BY x"
        )
    # a duplicated occurrence without an alias is rejected loudly
    with pytest.raises(ValueError, match="alias"):
        eng.sql(
            "CREATE MATERIALIZED VIEW sj_bad2 AS "
            "SELECT count(*) AS n "
            "FROM sj_s JOIN sj_n ON s_nationkey = n_nationkey "
            "JOIN sj_n n2 ON s_nationkey = n2.n_nationkey"
        )


def test_drop_subscription_and_literal_if_not_exists(eng):
    """Two latent front-door bugs fixed by the shared-AST migration:
    (1) DROP SUBSCRIPTION classified as 'drop' but the old extraction
    regex had no SUBSCRIPTION arm — internal error instead of a drop;
    (2) duplicate-MV IF NOT EXISTS detection searched the statement
    TEXT, so the phrase inside a string literal suppressed the
    duplicate-name error."""
    eng.sql("CREATE TABLE dsu_t (k int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW dsu_mv AS SELECT k, v FROM dsu_t")
    eng.sql("CREATE SUBSCRIPTION dsu_sub FROM dsu_mv")
    assert "dsu_sub" in eng.subscriptions
    out = eng.sql("DROP SUBSCRIPTION dsu_sub")
    assert out.first().status == "DROP_SUBSCRIPTION"
    assert "dsu_sub" not in eng.subscriptions
    # duplicate MV whose body contains the literal 'IF NOT EXISTS':
    # must still raise (grammar captures the flag at token level)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        eng.sql(
            "CREATE MATERIALIZED VIEW dsu_mv AS "
            "SELECT k, v FROM dsu_t WHERE 'IF NOT EXISTS' <> ''"
        )
    # and the REAL IF NOT EXISTS is a silent no-op
    out = eng.sql(
        "CREATE MATERIALIZED VIEW IF NOT EXISTS dsu_mv AS SELECT k, v FROM dsu_t"
    )
    assert out.first().status == "CREATE_MATERIALIZED_VIEW"


def test_subscription_cursor_since_full_and_table_source(eng):
    """Reference subscription-cursor surface
    (e2e_test/subscription/check_sql_statement.slt + main.py):
    subscriptions FROM a table (internal passthrough MV), cursor FULL
    (snapshot then changes), SINCE now()/proctime()/begin(), loud
    rejection of raw-timestamp SINCE, and duplicate-cursor errors."""
    eng.sql("create table sct (v1 int, v2 int)")
    eng.sql("insert into sct values (1,2)")
    eng.sql("create subscription scs from sct with(retention = '1D')")
    # rows inserted AFTER subscription creation, BEFORE declare
    eng.sql("insert into sct values (4,4)")
    eng.sql("declare c_begin subscription cursor for scs since begin()")
    eng.sql("declare c_now subscription cursor for scs since now()")
    eng.sql("declare c_full subscription cursor for scs full")
    # begin(): the retained log from subscription creation — (4,4) only
    got = [(r.v1, r.v2) for r in eng.sql("fetch 10 from c_begin").collect()]
    assert got == [(4, 4)]
    # now(): nothing until new changes arrive
    assert eng.sql("fetch 10 from c_now").count() == 0
    # full: current snapshot first (both rows), then changes
    got = sorted((r.v1, r.v2) for r in eng.sql("fetch 10 from c_full").collect())
    assert got == [(1, 2), (4, 4)]
    eng.sql("insert into sct values (6,6)")
    assert [(r.v1, r.v2) for r in eng.sql("fetch 10 from c_now").collect()] == [(6, 6)]
    assert [(r.v1, r.v2) for r in eng.sql("fetch 10 from c_full").collect()] == [(6, 6)]
    with pytest.raises(ValueError, match="SINCE"):
        eng.sql("declare c_bad subscription cursor for scs since 1")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("declare c_now subscription cursor for scs")
    for c in ("c_begin", "c_now", "c_full"):
        eng.sql(f"close {c}")
    eng.sql("drop subscription scs")
    assert "__subq_scs" not in eng.mv_handles


def test_sink_into_table(spark, tmp_path):
    """CREATE SINK ... INTO <table> (reference sink-into-table,
    e2e_test/subscription/create_table_and_subscription.slt): source
    changes — inserts, deletes, update pairs — fold into the target
    table as DML; pre-sink data bootstraps once; restart replay resumes
    the durable cursor instead of re-applying the bootstrap."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("create table si_src (v1 int, v2 int)")
    eng.sql("create table si_dst (v1 int primary key, v2 int)")
    eng.sql("insert into si_src values (1,10)")
    eng.sql("create sink si_s into si_dst from si_src")
    assert _rows(eng.sql("select v1, v2 from si_dst")) == [(1, 10)]
    eng.sql("insert into si_src values (2,20),(3,30)")
    eng.sql("delete from si_src where v1 = 2")
    eng.sql("update si_src set v2 = 99 where v1 = 1")
    assert _rows(eng.sql("select v1, v2 from si_dst")) == [(1, 99), (3, 30)]
    # restart: no double bootstrap, changes keep flowing
    eng2 = Engine.open(spark, wh)
    assert _rows(eng2.sql("select v1, v2 from si_dst")) == [(1, 99), (3, 30)]
    eng2.sql("insert into si_src values (4,40)")
    assert _rows(eng2.sql("select v1, v2 from si_dst")) == [
        (1, 99), (3, 30), (4, 40),
    ]
    # append-only contract, enforced at CREATE: a retractable source
    # cannot feed a hidden-row-id target (deletes have no identity there)
    eng2.sql("create table si_dst2 (v1 int, v2 int)")
    with pytest.raises(ValueError, match="APPEND ONLY"):
        eng2.sql("create sink si_s2 into si_dst2 from si_src")
    eng2.sql("create table si_src3 (v1 int, v2 int) APPEND ONLY")
    eng2.sql("insert into si_src3 values (7,70)")
    eng2.sql("create sink si_s3 into si_dst2 from si_src3")
    assert _rows(eng2.sql("select v1, v2 from si_dst2")) == [(7, 70)]


def test_create_database_and_show_namespaces(spark, tmp_path):
    """CREATE/DROP DATABASE + SHOW SCHEMAS/DATABASES (reference
    e2e_test/database/: `create database test`, `show schemas` listing
    the builtin four plus user schemas). Databases are durable catalog
    entries in this single-namespace engine (documented divergence: no
    per-database isolation)."""
    wh = str(tmp_path / "wh")
    eng = Engine(spark, wh)
    eng.sql("create database test")
    got = [r.name for r in eng.sql("show databases").collect()]
    assert got == ["dev", "test"]
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("create database test")
    eng.sql("create database if not exists test")  # no-op
    eng.sql("create schema s1")
    got = [r.name for r in eng.sql("show schemas").collect()]
    assert got == ["information_schema", "pg_catalog", "public", "rw_catalog", "s1"]
    # durable across restart
    eng2 = Engine.open(spark, wh)
    assert [r.name for r in eng2.sql("show databases").collect()] == ["dev", "test"]
    eng2.sql("drop database test")
    assert [r.name for r in eng2.sql("show databases").collect()] == ["dev"]
    with pytest.raises(ValueError, match="unknown database"):
        eng2.sql("drop database test")
    eng2.sql("drop database if exists test")  # no-op


def test_alter_rename_reprefixes_subquery_helpers(spark, tmp_path):
    """ALTER ... RENAME of an MV whose WHERE-subquery desugared into
    helper MVs must re-prefix the helpers (__old_sqN → __new_sqN) —
    name, recorded DDL and state dirs — so DROP of the renamed MV
    sweeps them and nothing leaks (ADVICE r7). Maintenance keeps
    working across the rename and a restart."""
    import os as _os

    wh = str(tmp_path / "wh_rsq")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE rq_o (o_id int8 PRIMARY KEY, o_pri text)")
    eng.sql("CREATE TABLE rq_l (l_id int8 PRIMARY KEY, l_oid int8, l_qty float8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW rq_mv AS SELECT o_id, o_pri FROM rq_o "
        "WHERE o_id IN (SELECT l_oid FROM rq_l GROUP BY l_oid HAVING sum(l_qty) > 5)"
    )
    eng.sql("INSERT INTO rq_o VALUES (1,'A'),(2,'B')")
    eng.sql("INSERT INTO rq_l VALUES (10,1,9.0),(11,2,1.0)")
    assert _rows(eng.sql("SELECT * FROM rq_mv")) == [(1, "A")]
    assert any(n.startswith("__rq_mv_sq") for n in eng.mv_handles)
    eng.sql("ALTER MATERIALIZED VIEW rq_mv RENAME TO rq_ren")
    # no old-prefixed helpers anywhere: handles, recorded DDL, state dirs
    assert not any(n.startswith("__rq_mv_sq") for n in eng.mv_handles)
    assert any(n.startswith("__rq_ren_sq") for n in eng.mv_handles)
    assert not any("__rq_mv_sq" in e["name"] for e in eng._read_catalog())
    assert not any("__rq_mv_sq" in d for d in _os.listdir(wh))
    # maintenance continues through the re-bound helpers
    eng.sql("INSERT INTO rq_l VALUES (12,2,8.0)")
    assert _rows(eng.sql("SELECT * FROM rq_ren")) == [(1, "A"), (2, "B")]
    eng2 = Engine.open(spark, wh)
    eng2.sql("DELETE FROM rq_l WHERE l_id = 10")
    assert _rows(eng2.sql("SELECT * FROM rq_ren")) == [(2, "B")]
    # DROP sweeps the renamed MV's helpers — catalog fully clean
    eng2.sql("DROP MATERIALIZED VIEW rq_ren")
    assert not any("_sq" in n for n in eng2.mv_handles)
    assert not any("_sq" in e["name"] for e in eng2._read_catalog())


def test_alter_rename_dependent_rewrite_shapes(spark, tmp_path):
    """Dependent-definition rewrite on rename (reference
    `handler/alter_rename.rs` alter_relation_rename_refs): qualified
    column refs follow the new name, MV→MV chains re-bind, an alias
    that shadows the old name blocks the rename loudly, and the whole
    rewritten catalog survives a restart."""
    wh = str(tmp_path / "wh_rend")
    eng = Engine(spark, wh)
    eng.sql("CREATE TABLE rt (k int PRIMARY KEY, g int, v int)")
    eng.sql("INSERT INTO rt VALUES (1, 1, 10), (2, 1, 20), (3, 2, 5)")
    eng.sql(
        "CREATE MATERIALIZED VIEW rmv1 AS "
        "SELECT g, sum(v) AS total FROM rt GROUP BY g"
    )
    # MV over MV: renaming the MID of the chain must rewrite rmv2
    eng.sql(
        "CREATE MATERIALIZED VIEW rmv2 AS "
        "SELECT g, total FROM rmv1 WHERE total > 10"
    )
    eng.sql("ALTER TABLE rt RENAME TO rt9")
    eng.sql("INSERT INTO rt9 VALUES (4, 2, 7)")
    assert _rows(eng.sql("SELECT g, total FROM rmv1 ORDER BY g")) == [(1, 30), (2, 12)]
    assert _rows(eng.sql("SELECT g, total FROM rmv2 ORDER BY g")) == [(1, 30), (2, 12)]
    eng.sql("ALTER MATERIALIZED VIEW rmv1 RENAME TO rbase")
    eng.sql("DELETE FROM rt9 WHERE k = 4")
    assert _rows(eng.sql("SELECT g, total FROM rbase ORDER BY g")) == [(1, 30), (2, 5)]
    assert _rows(eng.sql("SELECT g, total FROM rmv2 ORDER BY g")) == [(1, 30)]
    # restart: the rewritten catalog replays end to end
    eng2 = Engine.open(spark, wh)
    eng2.sql("INSERT INTO rt9 VALUES (5, 3, 11)")
    assert _rows(eng2.sql("SELECT g, total FROM rbase ORDER BY g")) == [
        (1, 30), (2, 5), (3, 11),
    ]
    assert _rows(eng2.sql("SELECT g, total FROM rmv2 ORDER BY g")) == [(1, 30), (3, 11)]
    # an alias shadowing the old name in a dependent blocks the rename
    eng2.sql("CREATE TABLE other (k int PRIMARY KEY, v int)")
    eng2.sql("INSERT INTO other VALUES (1, 1)")
    eng2.sql("CREATE VIEW shadow_v AS SELECT rt9.v AS a FROM other AS rt9")
    eng2.sql("CREATE MATERIALIZED VIEW rt9_dep AS SELECT g, count(*) AS n FROM rt9 GROUP BY g")
    with pytest.raises(ValueError, match="alias"):
        eng2.sql("ALTER TABLE rt9 RENAME TO rt10")


def test_subscription_cursor_since_timestamp(eng):
    """SINCE <unix_ms> (reference declare_cursor.rs
    Since::TimestampMsNum): the cursor parks before the first chunk
    whose commit ts >= the asked timestamp; timestamps outside the
    retained log (older than retention, or in the future) are rejected
    — previously a documented divergence (only symbolic forms)."""
    import os

    eng.sql("create table stt (v1 int, v2 int)")
    eng.sql("create subscription sts from stt with(retention = '1D')")
    eng.sql("insert into stt values (1, 1)")
    eng.sql("insert into stt values (2, 2)")
    log_dir = eng.subscriptions["sts"].dir
    chunks = sorted(
        int(d[1:]) for d in os.listdir(log_dir) if d.startswith("c") and d[1:].isdigit()
    )
    assert len(chunks) == 2
    # pin the commit markers (the engine's time record) to known values
    for c, ts in zip(chunks, (1000, 2000)):
        with open(os.path.join(log_dir, f"c{c}", "_COMMIT_TS_MS"), "w") as f:
            f.write(str(ts))
    eng.sql("declare c_ts subscription cursor for sts since 1500")
    got = [(r.v1, r.v2) for r in eng.sql("fetch 10 from c_ts").collect()]
    assert got == [(2, 2)]  # only the chunk with commit ts >= 1500
    eng.sql("declare c_ts0 subscription cursor for sts since 1000")
    got = sorted((r.v1, r.v2) for r in eng.sql("fetch 10 from c_ts0").collect())
    assert got == [(1, 1), (2, 2)]  # inclusive lower bound
    with pytest.raises(ValueError, match="before the retained"):
        eng.sql("declare c_old subscription cursor for sts since 500")
    with pytest.raises(ValueError, match="future"):
        eng.sql("declare c_fut subscription cursor for sts since 99999999999999")
    for c in ("c_ts", "c_ts0"):
        eng.sql(f"close {c}")
    eng.sql("drop subscription sts")


def test_simple_agg_mv_no_group_by(eng):
    """Global-aggregate MV with the reference's own no-GROUP-BY spelling
    (SimpleAgg, `stream/src/executor/simple_agg.rs`; views/q6.slt.part):
    exactly one row from CREATE time, through inserts, deletes, and
    delete-to-empty (accumulators reset to count=0 / sum=NULL)."""
    eng.sql("CREATE TABLE sa (k int4 PRIMARY KEY, v int4)")
    eng.sql(
        "CREATE MATERIALIZED VIEW samv AS "
        "SELECT count(*) AS n, sum(v) AS s, max(v) AS mx FROM sa"
    )
    assert _rows(eng.sql("SELECT n, s, mx FROM samv")) == [(0, None, None)]
    eng.sql("INSERT INTO sa VALUES (1, 10), (2, 20), (3, 5)")
    assert _rows(eng.sql("SELECT n, s, mx FROM samv")) == [(3, 35, 20)]
    eng.sql("DELETE FROM sa WHERE k = 2")  # retract the max
    assert _rows(eng.sql("SELECT n, s, mx FROM samv")) == [(2, 15, 10)]
    eng.sql("DELETE FROM sa")
    assert _rows(eng.sql("SELECT n, s, mx FROM samv")) == [(0, None, None)]
    eng.sql("INSERT INTO sa VALUES (9, 9)")
    assert _rows(eng.sql("SELECT n, s, mx FROM samv")) == [(1, 9, 9)]


def test_simple_agg_mv_where_and_restart(spark):
    """SimpleAgg MV with a WHERE filter survives Engine.open replay; the
    hidden constant key never shows in the result schema."""
    import tempfile

    wh = tempfile.mkdtemp(prefix="rw_sagg_")
    e1 = Engine(spark, wh)
    e1.sql("CREATE TABLE sb (k int4 PRIMARY KEY, v int4)")
    e1.sql(
        "CREATE MATERIALIZED VIEW sbmv AS "
        "SELECT sum(v) AS s FROM sb WHERE v >= 10"
    )
    e1.sql("INSERT INTO sb VALUES (1, 5), (2, 10), (3, 30)")
    assert _rows(e1.sql("SELECT * FROM sbmv")) == [(40,)]
    assert e1.sql("SELECT * FROM sbmv").columns == ["s"]
    e2 = Engine.open(spark, wh)
    assert _rows(e2.sql("SELECT * FROM sbmv")) == [(40,)]
    e2.sql("DELETE FROM sb WHERE k = 3")
    assert _rows(e2.sql("SELECT * FROM sbmv")) == [(10,)]
    e2.sql("DELETE FROM sb WHERE k = 2")  # all qualifying rows gone
    assert _rows(e2.sql("SELECT * FROM sbmv")) == [(None,)]


def test_backfill_rate_limit_zero_parks_until_alter(eng):
    """Reference rate_limit/alter_rate_limit.slt: CREATE MV WITH
    (backfill_rate_limit = 0) under BACKGROUND_DDL parks the backfill
    (job alive, MV absent); ALTER ... SET BACKFILL_RATE_LIMIT = 10
    resumes it and WAIT completes with correct contents."""
    import time

    eng.sql("CREATE TABLE rlt (v1 int PRIMARY KEY, v2 int)")
    eng.sql("INSERT INTO rlt SELECT id, id FROM range(1, 31)")
    try:
        eng.sql("SET BACKGROUND_DDL = true")
        eng.sql(
            "CREATE MATERIALIZED VIEW rl0 with ( backfill_rate_limit = 0 ) "
            "AS SELECT v1, v2 FROM rlt"
        )
        time.sleep(0.5)
        job = eng._bg_jobs["rl0"]
        assert job["thread"].is_alive() and job["error"] is None  # parked
        assert "rl0" not in eng.mv_handles
        eng.sql("ALTER MATERIALIZED VIEW rl0 SET BACKFILL_RATE_LIMIT = 10")
        eng.sql("WAIT")
        assert _rows(eng.sql("SELECT count(*) AS n FROM rl0")) == [(30,)]
        # the recorded DDL now carries the raised limit — replay must not
        # re-park (alter persists through the catalog rewrite)
        ddl = [e for e in eng._read_catalog() if e["name"] == "rl0"][0]["stmt"]
        assert "backfill_rate_limit = 10" in ddl.lower().replace("=", "= ").replace("  ", " ") or "10" in ddl
    finally:
        eng.sql("SET BACKGROUND_DDL = false")


def test_backfill_rate_limit_sizes_slices(eng):
    """WITH (backfill_rate_limit = N) caps each backfill slice at ~N rows
    (per-slice row cap, the documented divergence from rows/sec) without
    touching the session variable."""
    eng.sql("CREATE TABLE rls (k int PRIMARY KEY, v int)")
    eng.sql("INSERT INTO rls SELECT id, id * 2 FROM range(0, 20)")
    eng.sql(
        "CREATE MATERIALIZED VIEW rlm WITH (backfill_rate_limit = 5) AS "
        "SELECT k, v FROM rls"
    )
    assert eng._mv_rate_limits["rlm"] == 5
    assert _rows(eng.sql("SELECT count(*) AS n FROM rlm")) == [(20,)]
    eng.sql("INSERT INTO rls VALUES (100, 1)")  # still maintained
    assert _rows(eng.sql("SELECT count(*) AS n FROM rlm")) == [(21,)]
    with pytest.raises(ValueError, match="unsupported"):
        eng.sql("CREATE MATERIALIZED VIEW bad WITH (nope = 1) AS SELECT k FROM rls")
    with pytest.raises(ValueError, match="not a materialized view"):
        eng.sql("ALTER MATERIALIZED VIEW missing SET BACKFILL_RATE_LIMIT = 1")


def test_distinct_agg_mvs(eng):
    """Distinct-aggregate MVs (reference
    e2e_test/streaming/aggregate/distinct_agg.slt mv1/mv4 shapes): the
    per-group recompute evaluates count(distinct)/min(distinct) exactly
    under retraction; the global form rides the SimpleAgg path."""
    eng.sql("CREATE TABLE da (id int PRIMARY KEY, v1 int, v2 int, v3 int)")
    eng.sql(
        "CREATE MATERIALIZED VIEW da1 AS SELECT count(distinct v1) AS c_d_v1 FROM da"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW da4 AS SELECT v1, count(distinct v2) AS c_d_v2, "
        "count(distinct v3) AS c_d_v3, max(v2) AS max_v2 FROM da GROUP BY v1"
    )
    eng.sql(
        "INSERT INTO da VALUES (1,1,10,100),(2,1,10,200),(3,1,20,100),(4,2,30,300)"
    )
    assert _rows(eng.sql("SELECT c_d_v1 FROM da1")) == [(2,)]
    assert _rows(eng.sql("SELECT v1, c_d_v2, c_d_v3, max_v2 FROM da4 ORDER BY v1")) == [
        (1, 2, 2, 20),
        (2, 1, 1, 30),
    ]
    eng.sql("DELETE FROM da WHERE id IN (1, 2)")  # drops one distinct v2 of group 1
    assert _rows(eng.sql("SELECT v1, c_d_v2, c_d_v3, max_v2 FROM da4 ORDER BY v1")) == [
        (1, 1, 1, 20),
        (2, 1, 1, 30),
    ]
    eng.sql("DELETE FROM da WHERE v1 = 1")
    assert _rows(eng.sql("SELECT c_d_v1 FROM da1")) == [(1,)]
    assert _rows(eng.sql("SELECT v1 FROM da4")) == [(2,)]


def test_append_only_global_minmax_across_types(eng):
    """Reference e2e_test/streaming/aggregate/append_only_agg.slt: global
    min/max MV over an APPEND ONLY table across the type set (int2/4/8,
    float4/8, varchar, time, date, timestamp) — the SimpleAgg path with
    append-only inputs."""
    eng.sql(
        "create table aat (i2 int2, i4 int4, i8 int8, f4 float4, f8 float8, "
        "v varchar, t time, d date, ts timestamp) append only"
    )
    eng.sql(
        "create materialized view aamm as select min(i2) as mn2, max(i2) as mx2, "
        "min(f8) as mnf, max(v) as mxv, min(t) as mnt, max(d) as mxd, "
        "min(ts) as mnts from aat"
    )
    eng.sql(
        "INSERT INTO aat VALUES "
        "(2, 4, 8, 4.5, 8.5, 'xyz', TIME '12:30:00', DATE '2021-01-02', TIMESTAMP '2021-01-02 10:00:00'), "
        "(1, 3, 7, 3.5, 7.5, 'abc', TIME '11:30:00', DATE '2021-01-01', TIMESTAMP '2021-01-01 10:00:00')"
    )
    import datetime

    r = eng.sql("SELECT * FROM aamm").first()
    assert (r.mn2, r.mx2, r.mnf, r.mxv) == (1, 2, 7.5, "xyz")
    assert r.mnt == datetime.time(11, 30)
    assert r.mxd == datetime.date(2021, 1, 2)
    assert r.mnts == datetime.datetime(2021, 1, 1, 10, 0)


def test_row_grain_tumble_mv(eng):
    """Reference time_window.slt mv_tumble: `select * from tumble(...)`
    without GROUP BY is a row-grain MV — every row carries its
    epoch-aligned window; maintained under insert + delete; row-grain
    HOP stays a loud error."""
    eng.sql("CREATE TABLE twt (row_id int PRIMARY KEY, v int, created_at timestamp)")
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_tumble AS "
        "SELECT * FROM tumble(twt, created_at, interval '30' minute)"
    )
    eng.sql(
        "INSERT INTO twt VALUES (1, 4, TIMESTAMP '2022-01-01 10:00:00'), "
        "(2, 3, TIMESTAMP '2022-01-01 10:05:00'), (3, 1, TIMESTAMP '2022-01-01 10:42:00')"
    )
    import datetime

    rows = {r.row_id: r for r in eng.sql("SELECT * FROM mv_tumble").collect()}
    assert len(rows) == 3
    assert rows[1].window_start == datetime.datetime(2022, 1, 1, 10, 0)
    assert rows[1].window_end == datetime.datetime(2022, 1, 1, 10, 30)
    assert rows[3].window_start == datetime.datetime(2022, 1, 1, 10, 30)
    eng.sql("DELETE FROM twt WHERE row_id = 2")
    assert sorted(r.row_id for r in eng.sql("SELECT row_id FROM mv_tumble").collect()) == [1, 3]
    # explicit-item spelling with window refs
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_tumble2 AS "
        "SELECT row_id, window_start AS ws FROM tumble(twt, created_at, interval '30' minute)"
    )
    got = {(r.row_id, r.ws) for r in eng.sql("SELECT row_id, ws FROM mv_tumble2").collect()}
    assert got == {
        (1, datetime.datetime(2022, 1, 1, 10, 0)),
        (3, datetime.datetime(2022, 1, 1, 10, 30)),
    }
    # row-grain HOP MVs fan rows out per covering window (keyed by
    # (pk, window_start) — see test_row_grain_hop_mv_update_retracts_old_windows)
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_hop AS SELECT * FROM "
        "hop(twt, created_at, interval '15' minute, interval '30' minute)"
    )
    assert eng.sql("SELECT count(*) AS n FROM mv_hop").first().n == 4  # 2 rows × 2 windows


def test_window_join_of_two_tumbled_streams(eng):
    """Reference time_window_join.slt (the Flink window-join shape):
    FULL JOIN of two TUMBLE'd streams on (key, window) — composed as two
    row-grain TUMBLE MVs with per-side renames feeding a retractable
    stream-stream join; deletes on either side retract their matches."""
    import datetime

    eng.sql("CREATE TABLE wjl (rid int PRIMARY KEY, num int, ts timestamp)")
    eng.sql("CREATE TABLE wjr (rid int PRIMARY KEY, num int, ts timestamp)")
    eng.sql(
        "CREATE MATERIALIZED VIEW wjlw AS SELECT rid AS l_rid, num AS l_num, "
        "window_start AS l_ws FROM tumble(wjl, ts, interval '5' minute)"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW wjrw AS SELECT rid AS r_rid, num AS r_num, "
        "window_start AS r_ws FROM tumble(wjr, ts, interval '5' minute)"
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW wj AS SELECT l_num, r_num, l_ws FROM wjlw "
        "FULL JOIN wjrw ON l_num = r_num AND l_ws = r_ws"
    )
    eng.sql(
        "INSERT INTO wjl VALUES (1, 1, TIMESTAMP '2020-04-15 12:02:00'), "
        "(2, 2, TIMESTAMP '2020-04-15 12:06:00'), (3, 3, TIMESTAMP '2020-04-15 12:03:00')"
    )
    eng.sql(
        "INSERT INTO wjr VALUES (1, 2, TIMESTAMP '2020-04-15 12:01:00'), "
        "(2, 3, TIMESTAMP '2020-04-15 12:04:00'), (3, 4, TIMESTAMP '2020-04-15 12:05:00')"
    )
    w0 = datetime.datetime(2020, 4, 15, 12, 0)
    w1 = datetime.datetime(2020, 4, 15, 12, 5)
    got = {tuple(r) for r in eng.sql("SELECT l_num, r_num, l_ws FROM wj").collect()}
    assert got == {
        (1, None, w0), (2, None, w1), (3, 3, w0), (None, 2, None), (None, 4, None)
    }
    # retract the only match
    eng.sql("DELETE FROM wjr WHERE rid = 2")
    got2 = {tuple(r) for r in eng.sql("SELECT l_num, r_num, l_ws FROM wj").collect()}
    assert got2 == {
        (1, None, w0), (2, None, w1), (3, None, w0), (None, 2, None), (None, 4, None)
    }


def test_non_strict_mv_eval_pads_null(eng, spark):
    """Reference non_strict_mode.slt (issue 4625 / PR 12461): streaming
    compute errors pad NULL instead of failing the MV — division by
    zero here; batch stays strict (ANSI error)."""
    eng.sql("CREATE TABLE nst (x int PRIMARY KEY)")
    eng.sql("CREATE MATERIALIZED VIEW nsm AS SELECT x, 10/x AS v FROM nst")
    eng.sql("INSERT INTO nst VALUES (0),(1),(2)")
    got = {(r.x, r.v) for r in eng.sql("SELECT x, v FROM nsm").collect()}
    assert got == {(0, None), (1, 10.0), (2, 5.0)}
    # the poisoned row retracts cleanly too
    eng.sql("DELETE FROM nst WHERE x = 0")
    assert {r.x for r in eng.sql("SELECT x FROM nsm").collect()} == {1, 2}
    # batch stays strict while MV maintenance stayed non-strict
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises(Exception):
        eng.sql("SELECT 10/0 AS boom").collect()


def test_non_strict_eval_in_join_chain_folds(eng, spark):
    """Reference non_strict_mode.slt covers ALL streaming operators:
    a div/0 expression in a 2-way stream-join MV body pads NULL per
    row instead of failing the per-key re-join fold (r7 VERDICT #4 —
    join-chain re-joins were the one strict path left)."""
    # disjoint column names → the TRUE retractable stream-join path
    # (overlapping names would fall to the dimension route)
    eng.sql("CREATE TABLE nja (ka int8 PRIMARY KEY, d int8)")
    eng.sql("CREATE TABLE njb (kb int8 PRIMARY KEY, v int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW njm AS "
        "SELECT a.ka AS ka, sum(b.v / a.d) AS s "
        "FROM nja a JOIN njb b ON a.ka = b.kb GROUP BY a.ka"
    )
    from risingwave_spark.api import StreamJoinMv

    assert isinstance(eng.mv_handles["njm"].view, StreamJoinMv)
    # d = 0 poisons the division for k=1; the fold must not fail and
    # sum over an all-NULL group is NULL (PG/reference aggregation)
    eng.sql("INSERT INTO nja VALUES (1, 0), (2, 4)")
    eng.sql("INSERT INTO njb VALUES (1, 10), (2, 20)")
    got = {(r.ka, r.s) for r in eng.sql("SELECT ka, s FROM njm").collect()}
    assert got == {(1, None), (2, 5.0)}
    # the poisoned key keeps maintaining: fixing d re-splices to a value
    eng.sql("UPDATE nja SET d = 5 WHERE ka = 1")
    got = {(r.ka, r.s) for r in eng.sql("SELECT ka, s FROM njm").collect()}
    assert got == {(1, 2.0), (2, 5.0)}
    # batch session stays strict afterwards
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises(Exception):
        eng.sql("SELECT 10/0 AS boom").collect()


def test_row_grain_hop_mv_update_retracts_old_windows(eng):
    """Reference bug_fixes/hop_window_update_10495.slt: `select * from
    hop(...)` is a row-grain MV keyed by (pk, window_start); an UPDATE
    moving the timestamp retracts the OLD window set and emits the new
    one."""
    import datetime

    eng.sql("create table hrt (k int primary key, ts timestamp)")
    eng.sql(
        "create materialized view hrm as select * from "
        "hop(hrt, ts, interval '10' minute, interval '30' minute)"
    )
    eng.sql("insert into hrt values (1, TIMESTAMP '2021-01-01 10:15:00')")

    def wins():
        return sorted(r.window_start for r in eng.sql("SELECT * FROM hrm").collect())

    d = lambda h, m: datetime.datetime(2021, 1, 1, h, m)
    assert wins() == [d(9, 50), d(10, 0), d(10, 10)]
    eng.sql("update hrt set ts = TIMESTAMP '2021-01-01 10:25:00' where k = 1")
    assert wins() == [d(10, 0), d(10, 10), d(10, 20)]
    eng.sql("delete from hrt where k = 1")
    assert wins() == []


def test_array_subscripts_one_based_null_oob(eng):
    """PG subscript contract through the front door (reference
    issue_12474.slt): a[1] is the FIRST element, out-of-bounds is NULL
    (not an ANSI error), and a ProjectSet MV combining 1/x[1] with
    unnest(x) pads the div-by-zero NULL per output row."""
    eng.sql("create table pst (id int primary key, x array<int>)")
    eng.sql(
        "create materialized view psm as "
        "select id, 1/x[1] as bomb, unnest(x) as unnest from pst"
    )
    eng.sql("insert into pst values (1, array[0, 1]), (2, array[1])")
    got = sorted(
        ((r.bomb, r.unnest) for r in eng.sql("SELECT bomb, unnest FROM psm").collect()),
        key=str,
    )
    assert got == [(1.0, 1), (None, 0), (None, 1)]
    sub = eng.sql("SELECT x[1] AS first, x[5] AS oob FROM pst WHERE id = 1").first()
    assert (sub.first, sub.oob) == (0, None)
    # PG: a[0] and negative subscripts are NULL — never "wrap to last"
    # (Spark try_element_at(-1) would return the last element)
    z = eng.sql("SELECT x[0] AS z, x[-1] AS neg FROM pst WHERE id = 1").first()
    assert (z.z, z.neg) == (None, None)
    # parenthesized and chained bases convert too (ADVICE r7)
    assert eng.sql("SELECT (ARRAY[7,8,9])[2] AS v").first().v == 8
    eng.sql("create table pst2 (id int primary key, m array<array<int>>)")
    eng.sql("insert into pst2 values (1, array[array[1,2], array[3,4]])")
    ch = eng.sql("SELECT m[2][1] AS a, m[2][9] AS b, m[0][1] AS c FROM pst2").first()
    assert (ch.a, ch.b, ch.c) == (3, None, None)


def test_python_udf_type_bridge(eng):
    """python_udf.slt py_typeof / decimal_add / return_all: the python
    runtime's type bridge — jsonb arrives as dict, bytea as bytes,
    decimal as Decimal (and stays exact), struct args as dicts, struct
    returns mapped by field."""
    eng.sql(
        "create function py_typeof(g decimal, h varchar, i bytea, j jsonb) "
        "returns jsonb language python as $$\n"
        "def py_typeof(g, h, i, j):\n"
        "    return {'decimal': type(g).__name__,\n"
        "            'varchar': type(h).__name__,\n"
        "            'bytea': type(i).__name__,\n"
        "            'jsonb': type(j).__name__}\n"
        "$$"
    )
    import json

    v = eng.sql(
        "SELECT py_typeof(8.9::decimal, 'abc', '\\x010203'::bytea, "
        "'{\"key\": 1}'::jsonb) AS t"
    ).first().t
    assert json.loads(v) == {
        "decimal": "Decimal", "varchar": "str",
        "bytea": "bytes", "jsonb": "dict",
    }
    eng.sql(
        "create function pydec_add(a decimal, b decimal) returns decimal "
        "language python as $$\n"
        "def pydec_add(a, b):\n"
        "    return a + b\n"
        "$$"
    )
    v = eng.sql(
        "SELECT pydec_add(1.11::decimal, 2.22::decimal) AS s").first().s
    assert str(v).rstrip("0").rstrip(".") == "3.33"
    eng.sql(
        "create function pypack(a int8, s struct<f1 int8, f2 int8>) "
        "returns struct<a int8, hi int8> language python as $$\n"
        "def pypack(a, s):\n"
        "    return {'a': a, 'hi': max(s['f1'], s['f2'])}\n"
        "$$"
    )
    r = eng.sql(
        "SELECT pypack(3, named_struct('f1', 9, 'f2', 4)) AS p"
    ).first().p
    assert (r.a, r.hi) == (3, 9)


def test_udaf_empty_value_containing_own_name_no_hang(eng):
    """ADVICE r11: a varchar UDAF whose empty-input value contains its
    own name followed by '(' must not make the SimpleAgg seed splice
    loop forever — the splice scan resumes past the spliced literal."""
    eng.sql(
        "create aggregate tagcat(v varchar) returns varchar "
        "language python as $$\n"
        "def create_state():\n"
        "    return 'tagcat(seed)'\n"
        "def accumulate(state, v):\n"
        "    return state if v is None else state + '|' + v\n"
        "def retract(state, v):\n"
        "    return state\n"
        "def finish(state):\n"
        "    return state\n"
        "$$"
    )
    eng.sql("CREATE TABLE tcat (k int PRIMARY KEY, v varchar)")
    # global (no GROUP BY) MV -> SimpleAgg seed path with the splice
    eng.sql("CREATE MATERIALIZED VIEW tcmv AS "
            "SELECT tagcat(v) AS t FROM tcat")
    assert eng.sql("SELECT t FROM tcmv").first().t == "tagcat(seed)"
    eng.sql("INSERT INTO tcat VALUES (1, 'a')")
    assert eng.sql("SELECT t FROM tcmv").first().t == "tagcat(seed)|a"
