"""Delta Lake table log — pure-Python reader/writer of the PUBLIC
Delta transaction-log protocol (delta.io PROTOCOL.md: ordered JSON
commit files under `_delta_log/`, one action per line — protocol /
metaData / add / remove), handing the live data-file list to Spark's
native parquet reader.

Reference parity: `src/connector/src/sink/deltalake.rs` (append-only
sink through the deltalake crate, option `location`; deltalake.rs:342
"only append-only delta lake sink is supported" — same contract
here). The sink commits each chunk as one versioned log entry with an
`add` action per data file; the reader replays the log (adds minus
removes) exactly as the protocol prescribes, so tables written by any
Delta writer with local paths read back, and tables written here are
spec-shaped.

Commit atomicity rides the log protocol itself: version N commits by
creating `_delta_log/{N:020d}.json` with O_EXCL — the create-if-absent
the spec requires of storage backends; a concurrent writer loses the
race and retries against the new head (tested)."""

from __future__ import annotations

import json
import os
import time


def _log_dir(location: str) -> str:
    if location.startswith("file://"):
        location = location[len("file://"):]
    if "://" in location:
        raise NotImplementedError(
            f"delta table on remote storage {location.split('://')[0]!r} "
            "needs object-store credentials; only local-fs tables are "
            "readable in this container"
        )
    return os.path.join(location, "_delta_log")


def read_table_files(location: str) -> list[str]:
    """Replay the log → live parquet paths (add minus remove)."""
    log = _log_dir(location)
    if not os.path.isdir(log):
        raise ValueError(f"no _delta_log at {log}")
    versions = sorted(
        int(n[:-5]) for n in os.listdir(log)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    if not versions:
        raise ValueError(f"empty delta log at {log}")
    live: dict[str, bool] = {}
    base = os.path.dirname(log)
    for v in versions:
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = True
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    return [os.path.join(base, p) for p in live]


def read_table(spark, location: str):
    files = read_table_files(location)
    if not files:
        raise ValueError(f"delta table at {location} has no live files")
    return spark.read.parquet(*files)


def _next_version(log: str) -> int:
    versions = [
        int(n[:-5]) for n in os.listdir(log)
        if n.endswith(".json") and n[:-5].isdigit()
    ]
    return (max(versions) + 1) if versions else 0


def _commit(log: str, version: int, actions: list[dict]) -> None:
    """The protocol's atomic commit: exclusive-create of the version
    file; an existing version raises FileExistsError (caller retries
    at the new head)."""
    path = os.path.join(log, f"{version:020d}.json")
    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def create_table(location: str, schema_string: str = "{}") -> None:
    """Version 0: protocol + metaData actions (idempotent)."""
    log = _log_dir(location)
    os.makedirs(log, exist_ok=True)
    if os.path.exists(os.path.join(log, f"{0:020d}.json")):
        return
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }},
    ])


def append_files(location: str, rel_paths: list[str],
                 retries: int = 16) -> int:
    """Fast-append commit: one `add` action per data file (paths
    relative to the table root). Returns the committed version."""
    log = _log_dir(location)
    now = int(time.time() * 1000)
    base = os.path.dirname(log)
    actions = [
        {"add": {
            "path": p,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(base, p)),
            "modificationTime": now,
            "dataChange": True,
        }}
        for p in rel_paths
    ]
    for _ in range(retries):
        v = _next_version(log)
        try:
            _commit(log, v, actions)
            return v
        except FileExistsError:
            continue  # lost the race — retry at the new head
    raise OSError(f"delta commit contention at {log}: {retries} retries")
