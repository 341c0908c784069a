"""Delta Lake transaction-log protocol (reference
`sink/deltalake.rs` — append-only only, deltalake.rs:342) — log
reader/writer + sink end-to-end (sources/deltalake.py)."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.deltalake import (
    append_files,
    create_table,
    read_table,
    read_table_files,
)


def _mk_parquet(spark, path, rows, schema="id bigint, v bigint"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(path)
    return [f for f in os.listdir(path) if f.endswith(".parquet")][0]


def test_log_replay_add_and_remove(spark):
    loc = os.path.join(tempfile.mkdtemp(prefix="rw_dl_log_"), "t")
    create_table(loc)
    p1 = _mk_parquet(spark, os.path.join(loc, "d1"), [(1, 10), (2, 20)])
    p2 = _mk_parquet(spark, os.path.join(loc, "d2"), [(3, 30)])
    append_files(loc, [os.path.join("d1", p1)])
    append_files(loc, [os.path.join("d2", p2)])
    assert read_table(spark, loc).count() == 3
    # a remove action drops the file from the live set (protocol replay)
    log = os.path.join(loc, "_delta_log")
    with open(os.path.join(log, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {
            "path": os.path.join("d1", p1), "dataChange": True}}) + "\n")
    got = sorted(tuple(r) for r in read_table(spark, loc).collect())
    assert got == [(3, 30)]


def test_commit_is_exclusive_create(spark):
    loc = os.path.join(tempfile.mkdtemp(prefix="rw_dl_excl_"), "t")
    create_table(loc)
    p1 = _mk_parquet(spark, os.path.join(loc, "d1"), [(1, 10)])
    # occupy version 1 out-of-band: the writer must NOT clobber it and
    # must land at version 2 instead (lost-race retry)
    log = os.path.join(loc, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write("\n")
    v = append_files(loc, [os.path.join("d1", p1)])
    assert v == 2
    assert len(read_table_files(loc)) == 1


def test_deltalake_sink_append_roundtrip(spark):
    loc = os.path.join(tempfile.mkdtemp(prefix="rw_dl_sink_"), "t")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_dl_e_"))
    eng.sql("CREATE TABLE dlt (id int8 PRIMARY KEY, v int8)")
    eng.sql(
        "CREATE MATERIALIZED VIEW dl_mv AS SELECT id, v * 2 AS v2 FROM dlt")
    eng.sql("INSERT INTO dlt VALUES (1, 5)")
    with pytest.raises(ValueError, match="append-only"):
        eng.sql(
            f"CREATE SINK dbad FROM dl_mv WITH (connector='deltalake', "
            f"location='{loc}') FORMAT UPSERT ENCODE JSON")
    eng.sql(
        f"CREATE SINK dls FROM dl_mv WITH (connector='deltalake', "
        f"location='{loc}', force_append_only='true') "
        f"FORMAT PLAIN ENCODE JSON")
    eng.sql("INSERT INTO dlt VALUES (2, 7), (3, 9)")
    got = sorted(tuple(r) for r in read_table(spark, loc).collect())
    assert got == [(1, 10), (2, 14), (3, 18)]
    # version 0 carries protocol + metaData per the spec
    with open(os.path.join(loc, "_delta_log", f"{0:020d}.json")) as f:
        actions = [json.loads(x) for x in f if x.strip()]
    assert actions[0]["protocol"]["minReaderVersion"] == 1
    assert actions[1]["metaData"]["format"]["provider"] == "parquet"
