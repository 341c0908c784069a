"""File-backed Confluent-style schema registry.

The reference resolves a Confluent-framed payload's 4-byte schema id
against a registry service over HTTP
(`/root/reference/src/connector/src/parser/schema_registry.rs` — GET
/schemas/ids/{id}, subject/version registration). This sandbox has no
network, so the same CONTRACT is served from a directory: one JSON file
per schema id plus per-subject version lists — the shape a shared
filesystem / object-store deployment would use. The client API mirrors
the reference's resolver: register under a subject (new version), fetch
by id (what decode needs), fetch a subject's latest.

Schemas here are the wire-decoder field lists of
`sources/decoders.py` (``[(name, type), ...]``, "?"-prefixed =
nullable) — the registry stores and hands back exactly what the
Avro/Protobuf readers consume.

Scale posture: `get()` memoizes per id (the reference client caches the
same way), so a mapInPandas decode pass hits the filesystem once per
schema id per executor, not per row.
"""

from __future__ import annotations

import json
import os


class FileSchemaRegistry:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "ids"), exist_ok=True)
        os.makedirs(os.path.join(root, "subjects"), exist_ok=True)
        self._cache: dict[int, list[tuple[str, str]]] = {}

    # ---- write side -------------------------------------------------
    def register(self, subject: str, schema: list[tuple[str, str]]) -> int:
        """Register a schema as the subject's next version; returns its
        global id (idempotent for an identical schema, like the
        reference registry)."""
        subj_path = os.path.join(self.root, "subjects", f"{subject}.json")
        versions = self._read_json(subj_path, [])
        for sid in versions:
            if self.get(sid) == [tuple(f) for f in schema]:
                return sid
        next_path = os.path.join(self.root, "NEXT_ID")
        try:
            with open(next_path) as f:
                sid = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            sid = 1
        with open(os.path.join(self.root, "ids", f"{sid}.json"), "w") as f:
            json.dump({"subject": subject, "schema": [list(t) for t in schema]}, f)
        tmp = next_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(sid + 1))
        os.replace(tmp, next_path)
        versions.append(sid)
        tmp = subj_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(versions, f)
        os.replace(tmp, subj_path)
        return sid

    # ---- read side --------------------------------------------------
    def get(self, schema_id: int) -> list[tuple[str, str]]:
        if schema_id in self._cache:
            return self._cache[schema_id]
        path = os.path.join(self.root, "ids", f"{schema_id}.json")
        try:
            with open(path) as f:
                entry = json.load(f)
        except FileNotFoundError:
            raise KeyError(
                f"schema id {schema_id} not found in registry {self.root!r} "
                "(the producer registered against a different registry?)"
            ) from None
        schema = [tuple(t) for t in entry["schema"]]
        self._cache[schema_id] = schema
        return schema

    def latest(self, subject: str) -> tuple[int, list[tuple[str, str]]]:
        versions = self._read_json(
            os.path.join(self.root, "subjects", f"{subject}.json"), []
        )
        if not versions:
            raise KeyError(f"subject {subject!r} has no registered schemas")
        sid = versions[-1]
        return sid, self.get(sid)

    @staticmethod
    def _read_json(path: str, default):
        try:
            with open(path) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return default


def avro_registry_decode_df(df, bin_col: str, registry_root: str, out_schema: str):
    """Confluent-framed binary column → typed columns, resolving EACH
    row's schema id against the registry (so one topic can interleave
    schema versions, the evolution case the reference handles): fields
    absent from an old writer schema decode as NULL. Arrow-batched
    mapInPandas. The registry SNAPSHOT (id → schema dict) is taken
    driver-side and captured by the closure — the Spark-broadcast
    analog of the reference client's per-id cache; workers never touch
    the registry filesystem (or need this module importable)."""
    import glob as _glob

    import pandas as pd

    from risingwave_spark.sources.decoders import (
        avro_decode_record,
        confluent_unwrap,
    )

    reg = FileSchemaRegistry(registry_root)
    schemas = {}
    for p in _glob.glob(os.path.join(registry_root, "ids", "*.json")):
        sid = int(os.path.basename(p)[:-5])
        schemas[sid] = reg.get(sid)

    keep = [c for c in df.columns if c != bin_col]
    out_fields = [s.strip().split()[0] for s in out_schema.split(",")]

    def run(it):
        for pdf in it:
            rows = []
            for b in pdf[bin_col]:
                sid, payload = confluent_unwrap(bytes(b))
                schema = schemas.get(sid)
                if schema is None:
                    raise KeyError(
                        f"schema id {sid} not in the registry snapshot "
                        f"(ids known: {sorted(schemas)})"
                    )
                rec = avro_decode_record(schema, payload)
                rows.append({c: rec.get(c) for c in out_fields})
            decoded = pd.DataFrame(rows, columns=out_fields)
            yield pd.concat(
                [pdf[keep].reset_index(drop=True), decoded.reset_index(drop=True)],
                axis=1,
            )

    from risingwave_spark.sources.decoders import _spark_types

    full = (
        ", ".join(f"{c} {t}" for c, t in _spark_types(df, keep)) + ", " if keep else ""
    ) + out_schema
    return df.mapInPandas(run, schema=full)
