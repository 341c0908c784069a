"""Iceberg storage-catalog scan without jars: pure-Python walk of the
public table spec (version-hint → vN.metadata.json → manifest-list
Avro OCF → manifest OCFs → parquet file list) feeding Spark's native
parquet reader — reference `src/connector/src/source/iceberg/` +
`iceberg_scan.rs`. The OCF codec (sources/avro_ocf.py) is generic and
schema-driven, so the walk reads spec-shaped files regardless of the
writer."""

from __future__ import annotations

import os
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.sources.avro_ocf import read_ocf, write_ocf
from risingwave_spark.sources.iceberg_scan import IcebergTable, write_iceberg_table


def test_ocf_roundtrip_nested_types():
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"], "default": None},
            {"name": "xs", "type": {"type": "array", "items": "double"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "b", "type": "bytes"},
            {"name": "sub", "type": {
                "type": "record", "name": "sub",
                "fields": [{"name": "f", "type": "boolean"}]}},
        ],
    }
    recs = [
        {"s": "a", "n": 7, "xs": [1.5, -2.25], "m": {"k": "v"},
         "b": b"\x00\x01", "sub": {"f": True}},
        {"s": "", "n": None, "xs": [], "m": {}, "b": b"", "sub": {"f": False}},
    ]
    p = os.path.join(tempfile.mkdtemp(prefix="rw_ocf_"), "t.avro")
    write_ocf(p, schema, recs)
    _s, got = read_ocf(p)
    assert got == recs


def _mk_parquet(spark, path, rows, schema="id bigint, v bigint"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)
    part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    return os.path.join(path, part)


def test_iceberg_scan_current_and_time_travel(spark):
    """Two copy-on-write snapshots: the current scan sees snapshot 2's
    file set; time travel by snapshot id sees snapshot 1's."""
    base = tempfile.mkdtemp(prefix="rw_ice_")
    f1 = _mk_parquet(spark, os.path.join(base, "d1"), [(i, i * 10) for i in range(5)])
    f2 = _mk_parquet(spark, os.path.join(base, "d2"), [(i, i * 10) for i in range(5, 9)])
    wh = os.path.join(base, "wh")
    ids = write_iceberg_table(
        wh, "db", "t",
        snapshots=[[(f1, 5)], [(f1, 5), (f2, 4)]],
    )
    it = IcebergTable(wh, "db", "t")
    assert it.snapshot_ids() == ids
    cur = it.read(spark)
    assert cur.count() == 9
    old = it.read(spark, snapshot_id=ids[0])
    assert old.count() == 5
    with pytest.raises(ValueError, match="not in table"):
        it.read(spark, snapshot_id=424242)


def test_iceberg_deleted_entries_and_mor_guard(spark):
    """status=2 manifest entries are skipped (spec: deleted files);
    content != 0 (merge-on-read delete files) rejects loud."""
    from risingwave_spark.sources.iceberg_scan import (
        MANIFEST_LIST_SCHEMA,
        MANIFEST_SCHEMA,
    )

    base = tempfile.mkdtemp(prefix="rw_iced_")
    f1 = _mk_parquet(spark, os.path.join(base, "d1"), [(1, 1), (2, 2)])
    f2 = _mk_parquet(spark, os.path.join(base, "d2"), [(3, 3)])
    wh = os.path.join(base, "wh")
    write_iceberg_table(wh, "db", "t", snapshots=[[(f1, 2), (f2, 1)]])
    # hand-edit the manifest: mark f2's entry deleted
    meta = os.path.join(wh, "db", "t", "metadata")
    mpath = os.path.join(meta, "manifest-1000.avro")
    _s, entries = read_ocf(mpath)
    entries[1]["status"] = 2
    write_ocf(mpath, MANIFEST_SCHEMA, entries)
    it = IcebergTable(wh, "db", "t")
    assert sorted(r.id for r in it.read(spark).collect()) == [1, 2]
    # a position-delete file (content=1) must reject, not silently wrong
    entries[1]["status"] = 1
    entries[1]["data_file"]["content"] = 1
    write_ocf(mpath, MANIFEST_SCHEMA, entries)
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        IcebergTable(wh, "db", "t").data_files()
    # remote storage guard
    entries[1]["data_file"]["content"] = 0
    entries[1]["data_file"]["file_path"] = "s3://bucket/x.parquet"
    write_ocf(mpath, MANIFEST_SCHEMA, entries)
    with pytest.raises(NotImplementedError, match="remote storage"):
        IcebergTable(wh, "db", "t").data_files()


def test_iceberg_create_source_sql(spark):
    """CREATE SOURCE ... connector='iceberg' registers a readable
    batch view over the current snapshot; snapshot_id option time
    travels; non-storage catalogs and missing options reject loud."""
    base = tempfile.mkdtemp(prefix="rw_ices_")
    f1 = _mk_parquet(spark, os.path.join(base, "d1"), [(i, i) for i in range(4)])
    f2 = _mk_parquet(spark, os.path.join(base, "d2"), [(9, 9)])
    wh = os.path.join(base, "wh")
    ids = write_iceberg_table(wh, "db", "ev", snapshots=[[(f1, 4)], [(f1, 4), (f2, 1)]])
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_icee_"))
    eng.sql(
        f"""CREATE SOURCE ice WITH (
            connector = 'iceberg', catalog.type = 'storage',
            warehouse.path = '{wh}', database.name = 'db', table.name = 'ev'
        )"""
    )
    assert eng.sql("SELECT count(*) AS n FROM ice").first().n == 5
    eng.sql(
        f"""CREATE SOURCE ice_old WITH (
            connector = 'iceberg', catalog.type = 'storage',
            warehouse.path = '{wh}', database.name = 'db', table.name = 'ev',
            snapshot_id = '{ids[0]}'
        )"""
    )
    assert eng.sql("SELECT count(*) AS n FROM ice_old").first().n == 4
    # rest is IMPLEMENTED now (tests/test_iceberg_rest.py) — it needs a
    # catalog.uri; glue/jdbc/hive stay gated loud
    with pytest.raises(ValueError, match="catalog.uri"):
        eng.sql(
            f"CREATE SOURCE bad1 WITH (connector='iceberg', catalog.type='rest', "
            f"warehouse.path='{wh}', database.name='db', table.name='ev')"
        )
    # EVERY catalog type is implemented now (rest/glue: test_iceberg_rest
    # / test_glue_catalog; hive/jdbc: test_hms_jdbc_catalog) — each needs
    # its catalog.uri; a truly unknown type is a plain error
    with pytest.raises(NotImplementedError, match="catalog.uri"):
        eng.sql(
            f"CREATE SOURCE bad1g WITH (connector='iceberg', catalog.type='glue', "
            f"warehouse.path='{wh}', database.name='db', table.name='ev')"
        )
    with pytest.raises(ValueError, match="thrift://"):
        eng.sql(
            f"CREATE SOURCE bad1h WITH (connector='iceberg', catalog.type='hive', "
            f"warehouse.path='{wh}', database.name='db', table.name='ev')"
        )
    with pytest.raises(ValueError, match="unknown iceberg catalog.type"):
        eng.sql(
            f"CREATE SOURCE bad1x WITH (connector='iceberg', catalog.type='nope', "
            f"warehouse.path='{wh}', database.name='db', table.name='ev')"
        )
    with pytest.raises(ValueError, match="warehouse.path"):
        eng.sql("CREATE SOURCE bad2 WITH (connector='iceberg')")
    with pytest.raises(ValueError, match="metadata directory"):
        eng.sql(
            f"CREATE SOURCE bad3 WITH (connector='iceberg', "
            f"warehouse.path='{wh}', database.name='db', table.name='ghost')"
        )


def test_iceberg_sink_append_only_roundtrip(spark):
    """CREATE SINK connector='iceberg' (append-only): each chunk
    commits a fast-append snapshot; the committed table reads back
    through CREATE SOURCE connector='iceberg' — bootstrap snapshot,
    two later chunks, three snapshots, time travel to the first."""
    import pytest as _pytest

    base = tempfile.mkdtemp(prefix="rw_icesink_")
    wh = os.path.join(base, "wh")
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_icee3_"))
    eng.sql("CREATE TABLE it (id int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW it_mv AS SELECT id, v * 2 AS v2 FROM it")
    eng.sql("INSERT INTO it VALUES (1, 5)")  # pre-sink content → bootstrap
    with _pytest.raises(Exception, match="PLAIN only"):
        eng.sql(
            f"CREATE SINK bad FROM it_mv WITH (connector='iceberg', "
            f"warehouse.path='{wh}', database.name='db', table.name='out') "
            "FORMAT UPSERT ENCODE JSON"
        )
    eng.sql(
        f"CREATE SINK ok FROM it_mv WITH (connector='iceberg', "
        f"warehouse.path='{wh}', database.name='db', table.name='out', "
        "force_append_only='true') FORMAT PLAIN ENCODE JSON"
    )
    eng.sql("INSERT INTO it VALUES (2, 7)")
    eng.sql("INSERT INTO it VALUES (3, 9)")
    it = IcebergTable(wh, "db", "out")
    snaps = it.snapshot_ids()
    assert len(snaps) == 3, snaps  # bootstrap + 2 chunks
    got = sorted(tuple(r) for r in it.read(spark).collect())
    assert got == [(1, 10), (2, 14), (3, 18)]
    first = sorted(tuple(r) for r in it.read(spark, snapshot_id=snaps[0]).collect())
    assert first == [(1, 10)]
    # the SQL surface reads the same committed table
    eng.sql(
        f"""CREATE SOURCE back WITH (
            connector = 'iceberg', warehouse.path = '{wh}',
            database.name = 'db', table.name = 'out'
        )"""
    )
    assert eng.sql("SELECT count(*) AS n FROM back").first().n == 3
