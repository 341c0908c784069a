"""Apache Iceberg table scan without jars — a pure-Python walk of the
PUBLIC Iceberg table spec (iceberg.apache.org/spec) handing the data
file list to Spark's native parquet reader.

Reference parity: `src/connector/src/source/iceberg/` + batch executor
`src/batch/executors/src/executor/iceberg_scan.rs` (iceberg-rust scan
of a storage catalog, column-pruned parquet reads). The reference
splits planning (metadata walk) from execution (file reads); this
module does the same — the metadata walk is driver-side Python over
JSON + Avro OCF (sources/avro_ocf.py), the data scan is
`spark.read.parquet(*files)`, fully JVM-side with pushdown/pruning
intact.

Layout walked (storage catalog, `catalog.type = 'storage'`):

    {warehouse}/{database}/{table}/metadata/version-hint.text
    {warehouse}/{database}/{table}/metadata/v{N}.metadata.json
        -> current-snapshot-id, snapshots[{snapshot-id, manifest-list}]
    manifest-list (Avro OCF) -> manifest_file records (manifest_path)
    manifest (Avro OCF)      -> manifest_entry records
        (status 0=existing 1=added 2=deleted, data_file.file_path,
         data_file.content 0=data 1=position-deletes 2=equality-deletes)

Supported: v1/v2 metadata, multiple snapshots with TIME TRAVEL by
snapshot id, deleted-entry filtering. NOT supported (loud):
merge-on-read delete files (content != 0) — the reference reads those
through iceberg-rust's merge machinery; a copy-on-write table (the
default for batch writers) never has them.
"""

from __future__ import annotations

import json
import os
import re

from risingwave_spark.sources.avro_ocf import read_ocf


def _local(path: str) -> str:
    """Iceberg metadata stores absolute URIs (file://..., s3://...);
    strip the file scheme, reject remote ones (jar/cred territory)."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if re.match(r"^[a-z0-9]+://", path):
        raise NotImplementedError(
            f"iceberg data file on remote storage {path.split('://')[0]!r} "
            "needs object-store credentials/jars; only local-fs tables "
            "are readable in this container"
        )
    return path


class IcebergTable:
    @classmethod
    def from_metadata(cls, metadata: dict) -> "IcebergTable":
        """Build a scanner from an already-loaded metadata document —
        the REST-catalog path (LoadTableResult.metadata), where the
        catalog serves the metadata instead of a version-hint walk."""
        self = cls.__new__(cls)
        self.dir = metadata.get("location", "")
        self.metadata = metadata
        return self

    def __init__(self, warehouse: str, database: str, table: str):
        self.dir = os.path.join(_local(warehouse), database, table)
        meta_dir = os.path.join(self.dir, "metadata")
        if not os.path.isdir(meta_dir):
            raise ValueError(f"no iceberg metadata directory at {meta_dir}")
        hint = os.path.join(meta_dir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as f:
                version = int(f.read().strip())
            meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
        else:  # no hint file: newest vN.metadata.json wins
            versions = [
                int(m.group(1))
                for m in (
                    re.match(r"v(\d+)\.metadata\.json$", n)
                    for n in os.listdir(meta_dir)
                )
                if m
            ]
            if not versions:
                raise ValueError(f"no vN.metadata.json under {meta_dir}")
            meta_path = os.path.join(meta_dir, f"v{max(versions)}.metadata.json")
        with open(meta_path) as f:
            self.metadata = json.load(f)

    def snapshot_ids(self) -> list[int]:
        return [s["snapshot-id"] for s in self.metadata.get("snapshots", [])]

    def data_files(self, snapshot_id: int | None = None) -> list[str]:
        """Parquet paths of the chosen snapshot (default: current) —
        the spec's scan planning: manifest list -> manifests ->
        non-deleted data entries."""
        snaps = self.metadata.get("snapshots", [])
        if snapshot_id is None and not snaps:
            return []  # freshly created table: no snapshots yet
        if snapshot_id is None:
            snapshot_id = self.metadata.get("current-snapshot-id")
        snap = next((s for s in snaps if s["snapshot-id"] == snapshot_id), None)
        if snap is None:
            raise ValueError(
                f"snapshot {snapshot_id!r} not in table (have {self.snapshot_ids()})"
            )
        _schema, manifests = read_ocf(_local(snap["manifest-list"]))
        files: list[str] = []
        for mf in manifests:
            _es, entries = read_ocf(_local(mf["manifest_path"]))
            for e in entries:
                if e.get("status") == 2:  # deleted entry
                    continue
                df = e["data_file"]
                if df.get("content", 0) != 0:
                    raise NotImplementedError(
                        "iceberg merge-on-read delete files are not "
                        "supported (copy-on-write tables only)"
                    )
                files.append(_local(df["file_path"]))
        return files

    def read(self, spark, snapshot_id: int | None = None):
        files = self.data_files(snapshot_id)
        if not files:
            raise ValueError("iceberg snapshot has no data files")
        return spark.read.parquet(*files)


# ----------------------------------------------------------------- fixture
# Spec-shaped schemas (field subset this reader consumes; field names
# per the Iceberg spec's manifest-list / manifest-file tables).
MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
    ],
}

MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ],
        }},
    ],
}


def create_empty_table(warehouse: str, database: str, table: str) -> None:
    """v1 metadata with zero snapshots — the sink's bootstrap target
    (idempotent: an existing table is left untouched)."""
    tdir = os.path.join(_local(warehouse), database, table)
    meta_dir = os.path.join(tdir, "metadata")
    if os.path.exists(os.path.join(meta_dir, "version-hint.text")):
        return
    os.makedirs(meta_dir, exist_ok=True)
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": tdir,
        "current-snapshot-id": None,
        "snapshots": [],
        "schemas": [], "partition-specs": [{"spec-id": 0, "fields": []}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(metadata, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")


def write_append_objects(
    meta_dir: str, metadata: dict, files: list[tuple[str, int]],
) -> tuple[int, dict]:
    """Materialize the append's STORAGE objects — ONE new manifest for
    the added files and a new manifest LIST carrying every previous
    manifest plus the new one — and return (snapshot_id, snapshot
    record) WITHOUT committing. The caller owns the commit point:
    version-hint flip (storage catalog, append_snapshot) or a REST
    CommitTableRequest (iceberg_rest.py)."""
    from risingwave_spark.sources.avro_ocf import read_ocf, write_ocf

    snaps = metadata.get("snapshots", [])
    sid = (max((s["snapshot-id"] for s in snaps), default=999)) + 1
    prior_manifests: list[dict] = []
    if metadata.get("current-snapshot-id") is not None:
        cur = next(
            s for s in snaps
            if s["snapshot-id"] == metadata["current-snapshot-id"]
        )
        _s, prior_manifests = read_ocf(_local(cur["manifest-list"]))
    manifest_path = os.path.join(meta_dir, f"manifest-{sid}.avro")
    write_ocf(manifest_path, MANIFEST_SCHEMA, [
        {
            "status": 1, "snapshot_id": sid,
            "data_file": {
                "content": 0, "file_path": os.path.abspath(p),
                "file_format": "PARQUET", "record_count": n,
                "file_size_in_bytes": os.path.getsize(p),
            },
        }
        for p, n in files
    ])
    mlist_path = os.path.join(meta_dir, f"snap-{sid}-manifest-list.avro")
    write_ocf(mlist_path, MANIFEST_LIST_SCHEMA, prior_manifests + [{
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "added_snapshot_id": sid,
    }])
    return sid, {
        "snapshot-id": sid,
        "timestamp-ms": 0,
        "manifest-list": mlist_path,
        "summary": {"operation": "append"},
    }


def append_snapshot(
    warehouse: str, database: str, table: str,
    files: list[tuple[str, int]],
) -> int:
    """Fast-append commit (the spec's append operation): the storage
    objects from write_append_objects, a new snapshot in
    v{N+1}.metadata.json, and an atomic version-hint flip (tmp +
    os.replace — the storage catalog's commit point). Returns the new
    snapshot id."""
    tdir = os.path.join(_local(warehouse), database, table)
    meta_dir = os.path.join(tdir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        version = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
        metadata = json.load(f)
    sid, snap_rec = write_append_objects(meta_dir, metadata, files)
    metadata["snapshots"] = metadata.get("snapshots", []) + [snap_rec]
    metadata["current-snapshot-id"] = sid
    with open(os.path.join(meta_dir, f"v{version + 1}.metadata.json"), "w") as f:
        json.dump(metadata, f)
    tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(tmp, "w") as f:
        f.write(str(version + 1))
    os.replace(tmp, os.path.join(meta_dir, "version-hint.text"))
    return sid


def write_iceberg_table(
    warehouse: str, database: str, table: str,
    snapshots: list[list[tuple[str, int]]],
) -> list[int]:
    """Write a spec-shaped local Iceberg table for tests/fixtures:
    `snapshots` is a list of snapshot states, each a list of
    (parquet_path, record_count) making up THAT snapshot's full file
    set (copy-on-write). Returns the snapshot ids. The layout walks
    with this module's reader AND matches the public spec's shape
    (metadata json + OCF manifest list + OCF manifests +
    version-hint)."""
    from risingwave_spark.sources.avro_ocf import write_ocf

    tdir = os.path.join(_local(warehouse), database, table)
    meta_dir = os.path.join(tdir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    snap_records = []
    ids = []
    for i, files in enumerate(snapshots):
        sid = 1000 + i
        ids.append(sid)
        manifest_path = os.path.join(meta_dir, f"manifest-{sid}.avro")
        write_ocf(manifest_path, MANIFEST_SCHEMA, [
            {
                "status": 1, "snapshot_id": sid,
                "data_file": {
                    "content": 0, "file_path": os.path.abspath(p),
                    "file_format": "PARQUET", "record_count": n,
                    "file_size_in_bytes": os.path.getsize(p),
                },
            }
            for p, n in files
        ])
        mlist_path = os.path.join(meta_dir, f"snap-{sid}-manifest-list.avro")
        write_ocf(mlist_path, MANIFEST_LIST_SCHEMA, [{
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "added_snapshot_id": sid,
        }])
        snap_records.append({
            "snapshot-id": sid,
            "timestamp-ms": 1700000000000 + i,
            "manifest-list": mlist_path,
            "summary": {"operation": "append"},
        })
    version = len(snapshots)
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": tdir,
        "current-snapshot-id": ids[-1],
        "snapshots": snap_records,
        "schemas": [], "partition-specs": [{"spec-id": 0, "fields": []}],
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(metadata, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))
    return ids
