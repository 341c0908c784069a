"""Materialized-view runtime: incrementally-maintained query results over
changelog streams — the reference's core product, re-expressed on Spark.

Reference semantics being reproduced (SURVEY.md §1.2, §2.2):
- StreamChunk ops: every row carries Op ∈ {Insert, Delete, ...}
  (`src/common/src/array/stream_chunk.rs:45-50`). Here: an `__op` column
  (+1 insert / -1 delete). UpdateDelete/UpdateInsert = a -1/+1 pair.
- Materialize executor (`src/stream/src/executor/mview/materialize.rs:45`):
  the MV table is upserted per epoch. Here: per micro-batch, a new parquet
  snapshot version with an atomic pointer swap (Delta MERGE stand-in; the
  container has no Delta jars).
- HashAgg with retraction (`src/stream/src/executor/hash_agg.rs:64`):
  value-state aggs (count/sum) fold deltas directly; MaterializedInput
  aggs (min/max) need the input rows of affected groups
  (`aggregation/minput.rs`) — we keep a values-state table and re-aggregate
  ONLY the groups touched by the batch.

Scale posture: all per-batch work is bounded by the touched groups
(semi-join on affected keys), state tables are key-partitioned parquet,
and every operation is a DataFrame plan — no driver-side row loops.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OP_COL = "__op"


def _statically_empty(df: DataFrame) -> bool:
    """True when Catalyst folds the plan to an empty LocalRelation —
    e.g. `with_ops(df, 1).filter(op < 0)` on an insert-only chunk. A
    driver-side optimizer pass (milliseconds), NOT a Spark job; lets
    fold() skip the tombstone write entirely for insert-only batches."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return "LocalRelation <empty>" in plan.toString().splitlines()[0] or (
            plan.getClass().getSimpleName() == "LocalRelation" and plan.data().isEmpty()
        )
    except Exception:
        return False


def _parquet_rows(path: str) -> int:
    """Row count of a just-written local parquet dir from file footers —
    a driver-side metadata read, NOT a Spark job (state dirs are local;
    on a cluster this would be the sink's commit-message row count)."""
    import glob as _glob

    import pyarrow.parquet as pq

    total = 0
    # bucketed chunks nest files under __bucket=N/ — glob both levels
    for f in _glob.glob(os.path.join(path, "*.parquet")) + _glob.glob(
        os.path.join(path, "*", "*.parquet")
    ):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def _parquet_spark_schema(path: str):
    """Spark schema of a just-written local parquet dir, from one file's
    footer — driver-side metadata, no Spark job (same contract as
    `_parquet_rows`; skips the schema-inference job a bare
    spark.read.parquet would run). None if the dir has no files."""
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    for f in _glob.glob(os.path.join(path, "*.parquet")) + _glob.glob(
        os.path.join(path, "*", "*.parquet")
    ):
        return from_arrow_schema(pq.ParquetFile(f).schema_arrow)
    return None


def _parquet_tree_schema(root: str):
    """Spark schema of the first parquet file anywhere under `root`
    (arbitrary chunk/bucket nesting) — the recursive variant of
    `_parquet_spark_schema`. Chunk schemas are constant within a state
    generation (compaction rewrites into a NEW directory), so one footer
    stands for the tree; partition-style `__bucket=N` dirs contribute no
    column because the reads use recursiveFileLookup (which disables
    partition discovery) — exactly what schema inference returned."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    for dirpath, dirs, files in os.walk(root):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                return from_arrow_schema(
                    pq.ParquetFile(os.path.join(dirpath, fn)).schema_arrow
                )
    return None


def chunk_key_frame(spark: SparkSession, lf: dict | None, cols: list[str]) -> DataFrame | None:
    """`cols` of a just-folded batch's rows, read from the batch's chunk
    files (`ChunkedState.last_fold`) instead of re-evaluating the
    upstream batch plan — tiny local parquet with an explicit
    footer-derived schema (no schema-inference job). None when there was
    no fresh fold (replay) or a chunk lacks one of the columns."""
    if lf is None:
        return None
    parts = []
    for path, rows in ((lf["values"], lf["v_rows"]), (lf["tombs"], lf["t_rows"])):
        if path and rows:
            schema = _parquet_spark_schema(path)
            if schema is None or not set(cols) <= set(schema.names):
                return None
            parts.append(spark.read.schema(schema).parquet(path).select(*cols))
    if not parts:
        return None  # empty batch: schema must come from the plan
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _keyset_cap(env: str, default: int) -> int:
    """Literal key-set caps, env-overridable (SPARK_GRAFT_KEYSET_MAX_ROWS
    / SPARK_GRAFT_KEYSET_MAX_DISTINCT): the caps decide when a fold takes
    the driver-side literal path vs the broadcast-join path, so a cluster
    deployment can tune them to its driver budget — and setting either to
    0 forces the join path everywhere, which is how the scale path is
    exercised at bench scale (plans/r13 fallback capture + test)."""
    try:
        return int(os.environ[env])
    except (KeyError, ValueError):
        return default


def chunk_key_values(
    state: "ChunkedState",
    key: str,
    max_rows: int | None = None,
    max_distinct: int | None = None,
) -> tuple[list, bool] | None:
    """Distinct values of a single key column of the batch `state` last
    folded, read driver-side from the just-written local chunk files
    (pyarrow column read — no Spark job). Returns (sorted non-null
    values, has_null) or None when the fold was a replay, the chunk is
    too large for driver-side work (max_rows bounds the read,
    max_distinct bounds the literal list pushed into the plan), or the
    dtype isn't int/string (float/timestamp literal round-trips may
    diverge). Callers turn the values into an `isin` filter, replacing
    the affected-keys semi/anti joins — and their broadcast-build Spark
    jobs — with a literal InSet predicate (guide §2.4: the key set is
    already materialized driver-side; don't re-derive it with a job)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if max_rows is None:
        max_rows = _keyset_cap("SPARK_GRAFT_KEYSET_MAX_ROWS", 200_000)
    if max_distinct is None:
        max_distinct = _keyset_cap("SPARK_GRAFT_KEYSET_MAX_DISTINCT", 8192)
    lf = state.last_fold
    if lf is None or lf["v_rows"] + lf["t_rows"] > max_rows:
        return None
    vals: set = set()
    has_null = False
    for path, rows in ((lf["values"], lf["v_rows"]), (lf["tombs"], lf["t_rows"])):
        if not path or not rows:
            continue
        for f in _glob.glob(os.path.join(path, "*.parquet")) + _glob.glob(
            os.path.join(path, "*", "*.parquet")
        ):
            pf = pq.ParquetFile(f)
            if pf.metadata.num_rows == 0:
                continue
            if key not in pf.schema_arrow.names:
                return None
            typ = pf.schema_arrow.field(key).type
            if not (
                pa.types.is_integer(typ)
                or pa.types.is_string(typ)
                or pa.types.is_large_string(typ)
            ):
                return None
            col = pf.read(columns=[key]).column(0)
            if col.null_count:
                has_null = True
            vals.update(pc.unique(col.combine_chunks().drop_null()).to_pylist())
            if len(vals) > max_distinct:
                return None
    return sorted(vals), has_null


def key_values_filter(col_name: str, vals: list, has_null: bool):
    """Never-NULL boolean `col ∈ vals` (null-safe: a NULL key matches iff
    the batch carried one). Must be 2-valued — the untouched-rows branch
    negates it, and a NULL there would silently drop MV rows.

    Built as ONE parsed SQL expression, NOT Column.isin(): PySpark's
    isin() makes a py4j round trip PER literal — measured 15.9 s to
    CONSTRUCT a 1500-element isin vs 3 ms for the equivalent SQL IN
    list (and the py4j object flood drags the whole driver afterwards).
    The expr resolves by column name, so it must be applied to frames
    where `col_name` is unambiguous (single-frame filters only)."""
    qn = "`" + col_name.replace("`", "``") + "`"
    if vals:
        if isinstance(vals[0], str):
            # Spark SQL default string literals process backslash
            # escapes — escape backslash first, then the quote
            lits = ",".join(
                "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
                for v in vals
            )
        else:
            lits = ",".join(str(int(v)) for v in vals)
        in_expr = f"{qn} IN ({lits})"
    else:
        in_expr = "false"
    return F.expr(
        f"(CASE WHEN {qn} IS NULL THEN {str(has_null).lower()} ELSE {in_expr} END)"
    )


def buckets_of_values(vals: list, has_null: bool, n_buckets: int) -> list[int]:
    """Touched buckets of a single-key value list — the driver-side crc32
    identical to `key_bucket_expr` (str-cast int / utf-8 string; concat_ws
    skips NULL, so a null key hashes the empty string)."""
    import zlib

    buckets = {
        zlib.crc32((str(int(v)) if not isinstance(v, str) else v).encode())
        % n_buckets
        for v in vals
    }
    if has_null:
        buckets.add(zlib.crc32(b"") % n_buckets)
    return sorted(buckets)


def non_strict_analysis(spark: SparkSession):
    """Context manager: plans CONSTRUCTED inside the block analyze under
    ansi=false, so compute errors (div/0, bad casts) pad NULL per
    expression instead of failing the fold — the reference's non-strict
    streaming evaluation (`e2e_test/streaming/non_strict_mode.slt`,
    issue 4625; every streaming executor wraps its expressions in
    NonStrictExpression). Spark bakes the eval mode into expressions at
    ANALYSIS, so the toggle pins legacy semantics into the streaming
    plan without touching ad-hoc batch behavior; the session's strict
    ANSI mode is restored on exit."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        old = spark.conf.get("spark.sql.ansi.enabled", "true")
        spark.conf.set("spark.sql.ansi.enabled", "false")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.ansi.enabled", old)

    return _cm()


def chunk_base(changelog_dir: str) -> int:
    """Durable changelog-id offset: compaction RESETS the state's chunk
    seq to 1 (ChunkedState.compact), but subscription cursors are plain
    high-water marks over chunk ids — a post-compaction chunk reusing an
    already-acked id would be silently never delivered. The base absorbs
    every reset so chunk ids stay monotonic across compactions while the
    replay-idempotence contract (same seq → same id) is preserved."""
    try:
        with open(os.path.join(changelog_dir, "CHUNK_BASE")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return 0


def bump_chunk_base(changelog_dir: str, delta: int) -> None:
    if delta <= 0:
        return
    os.makedirs(changelog_dir, exist_ok=True)
    path = os.path.join(changelog_dir, "CHUNK_BASE")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(chunk_base(changelog_dir) + delta))
    os.replace(tmp, path)


def with_ops(df: DataFrame, op: int = 1) -> DataFrame:
    """Tag a DataFrame as a changelog chunk (op=+1 insert, -1 delete)."""
    return df.withColumn(OP_COL, F.lit(op))


def key_bucket_expr(keys: list[str], n_buckets: int):
    """Bucket = crc32(concat_ws(keys)) % n. crc32 (not Murmur3) so the
    SAME bucket is computable driver-side in Python (zlib.crc32) from a
    batch's already-written chunk files — see
    `_BucketedMvTable.bucket_expr` / `buckets_from_chunks`, which must
    agree row-for-row with this expression."""
    joined = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return F.pmod(F.crc32(joined.cast("binary")), F.lit(n_buckets))


def key_bucket_sql(keys: list[str], n_buckets: int) -> str:
    """SQL text of `key_bucket_expr` (value-identical, pinned by
    `test_key_bucket_sql_equals_expr`): lets hot paths render bucket
    predicates as ONE parsed expression instead of a py4j call chain —
    the same plan-construction economics as `key_values_filter` (r12
    change #14: isin()/Column chains pay a py4j round trip per node;
    F.expr parses JVM-side in one call)."""
    cols = ",".join(f"CAST(`{k.replace('`', '``')}` AS STRING)" for k in keys)
    return f"pmod(crc32(CAST(concat_ws('\x1f',{cols}) AS BINARY)), {n_buckets})"


def nullsafe_cond(a: DataFrame, b: DataFrame, cols_a: list[str], cols_b: list[str] | None = None):
    """Conjunction of null-safe equalities (SQL `<=>`): group/join keys can
    legitimately be NULL (GROUP BY groups nulls together), and a plain `=`
    in the splice joins would silently strand null-key rows."""
    cols_b = cols_b or cols_a
    cond = None
    for ca, cb in zip(cols_a, cols_b):
        c = a[ca].eqNullSafe(b[cb])
        cond = c if cond is None else (cond & c)
    return cond


def buckets_from_chunks(state: "ChunkedState", keys: list[str], n_buckets: int) -> list[int] | None:
    """Touched buckets of the batch `state` last folded, computed
    driver-side from the just-written local chunk files (pyarrow column
    read + zlib.crc32 — no Spark job). Must agree row-for-row with
    `_BucketedMvTable.bucket_expr` (crc32 over \\x1f-joined keys,
    concat_ws null-skipping), so it only handles int/string keys;
    anything else returns None → caller falls back to a Spark collect."""
    import glob as _glob
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq

    seq = state._seq - 1
    chunk_dirs = [
        os.path.join(state.values_dir, f"b{seq}"),
        os.path.join(state.tombs_dir, f"b{seq}"),
    ]
    # bucketed chunk layout: the __bucket=N dir names ARE the touched
    # buckets — no column reads, no hashing (requires the state to be
    # bucketed by the same keys/modulus this caller asks about)
    if state.bucket_cols == keys and state.n_buckets == n_buckets:
        found: set[int] = set()
        flat = False
        for d in chunk_dirs:
            if not os.path.isdir(d):
                continue
            subs = [s for s in os.listdir(d) if s.startswith("__bucket=")]
            if subs:
                found.update(int(s.split("=", 1)[1]) for s in subs)
            elif any(
                pq.ParquetFile(f).metadata.num_rows > 0
                for f in _glob.glob(os.path.join(d, "*.parquet"))
            ):
                flat = True  # non-empty unbucketed chunk → hash its keys
        if not flat:
            return sorted(found)
    paths = []
    for d in chunk_dirs:
        paths += _glob.glob(os.path.join(d, "*.parquet"))
        paths += _glob.glob(os.path.join(d, "*", "*.parquet"))
    frames = []
    for f in paths:
        pf = pq.ParquetFile(f)
        if pf.metadata.num_rows == 0:
            continue
        names = set(pf.schema_arrow.names)
        if any(k not in names for k in keys):
            return None
        frames.append(pf.read(columns=keys).to_pandas())
    if not frames:
        return []
    # dedup BEFORE hashing: the python crc32 loop runs per distinct key,
    # not per batch row (150k rows / 1.5k keys → 100× less work)
    df = pd.concat(frames, ignore_index=True).drop_duplicates()
    encoded = []
    for k in keys:
        s = df[k]
        if s.dtype.kind in "iu":
            col = s.map(lambda v: str(int(v)).encode())
        elif s.dtype == object:
            if not all(isinstance(v, str) or v is None for v in s[:100]):
                return None
            col = s.map(lambda v: None if v is None else v.encode())
        else:
            return None  # float/timestamp/bool formatting may diverge
        encoded.append(col)
    buckets = set()
    for parts in zip(*encoded):
        joined = b"\x1f".join(p for p in parts if p is not None)
        buckets.add(zlib.crc32(joined) % n_buckets)
    return sorted(buckets)


class _VersionedTable:
    """Parquet-backed state table with atomic version swap.

    Stand-in for a Delta table: writes go to `<dir>/v{n}`, the `CURRENT`
    pointer file flips only after a successful write (crash → previous
    version stays live, matching the reference's epoch-commit semantics,
    `docs/dev/src/design/checkpoint.md`).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._version = self._read_pointer()

    def _pointer(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _read_pointer(self) -> int:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def exists(self) -> bool:
        return self._version >= 0

    def read(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, f"v{self._version}"))

    def write(self, df: DataFrame, partition_by: list[str] | None = None, n_files: int = 8):
        """Write the next version. `n_files` caps output files — state
        tables are re-read every batch, so many tiny files cost more in
        listing/open overhead than they buy in parallelism (at cluster
        scale you'd size this to state-bytes / 128 MB instead)."""
        nxt = self._version + 1
        out = os.path.join(self.path, f"v{nxt}")
        w = df.coalesce(n_files).write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(out)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._pointer())
        self._version = nxt
        # retain ONE prior version: un-evaluated DataFrames handed to
        # downstream MVs (the MV-on-MV changelog) may still read it
        stale = nxt - 2
        if stale >= 0:
            shutil.rmtree(os.path.join(self.path, f"v{stale}"), ignore_errors=True)


class _BucketedMvTable:
    """MV storage hash-partitioned into key buckets so a batch's write
    cost is O(touched buckets), not O(MV) — the keyed-MERGE / dynamic
    partition-overwrite pattern (reference Materialize executor upserts
    by key, `mview/materialize.rs:45`; Delta MERGE is the cluster-scale
    analog, not available in this sandbox).

    Layout: `<dir>/e{n}/__bucket={b}/*.parquet` epoch directories plus a
    MANIFEST json mapping bucket → the epoch holding its current rows.
    A write materializes ONLY the touched buckets into a new epoch and
    flips the manifest last (os.replace — crash-safe: a partial epoch
    dir is simply overwritten on retry). Untouched buckets' files are
    never rewritten or rewritten-as-copies; at 100 TB an MV batch that
    touches 1% of keys rewrites ~1% of files.
    """

    # class-level defaults so partially-constructed instances (tests
    # build via __new__) still take the cold path of the §B caches
    _bucket_col = None
    _schema_struct_src: str | None = None
    _schema_struct = None

    def __init__(self, spark: SparkSession, path: str, keys: list[str], n_buckets: int = 16):
        import json

        self.spark = spark
        self.path = path
        self.keys = keys
        self.n_buckets = n_buckets
        os.makedirs(path, exist_ok=True)
        self._json = json
        self._manifest = self._read_manifest()
        # Plan-construction caches (r13 §B, guide §1.2 driver work):
        # Column objects are immutable name-resolved expression trees —
        # reusable across DataFrames — and the MV schema is fixed per
        # manifest, so neither needs rebuilding through py4j on every
        # read/write of the fold loop (measured: bucket_expr 68 ms and
        # StructType.fromJson+conversion per call in the mv fold profile).
        self._bucket_col = None
        self._schema_struct_src: str | None = None
        self._schema_struct = None

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST")

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return self._json.load(f)
        except (FileNotFoundError, ValueError):
            return {
                "epoch": -1,
                "buckets": {},
                "schema": None,
                "retired": [],
                "flat": [],
            }

    def _flip_manifest(self) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            self._json.dump(self._manifest, f)
        os.replace(tmp, self._manifest_path())

    def exists(self) -> bool:
        return self._manifest["epoch"] >= 0

    def bucket_expr(self):
        """See `key_bucket_expr`: crc32 so the same bucket is computable
        driver-side with zero extra Spark jobs (_touched_buckets_fast).
        Collisions are harmless (buckets only co-locate); what matters is
        that the two computations agree per key. Cached — the Column is
        an immutable unresolved-attribute tree, valid on any frame that
        carries the key columns."""
        if self._bucket_col is None:
            self._bucket_col = key_bucket_expr(self.keys, self.n_buckets)
        return self._bucket_col

    def touched_buckets(self, affected_keys: DataFrame) -> list[int]:
        """Distinct buckets of an affected-keys frame — ≤ n_buckets values,
        the one small driver-side collect of the write path."""
        rows = (
            affected_keys.select(self.bucket_expr().alias("__bucket"))
            .distinct()
            .collect()
        )
        return sorted(r[0] for r in rows)

    def _leaf(self, bucket: int, epoch: int) -> str:
        return os.path.join(self.path, f"e{epoch}", f"__bucket={bucket}")

    def _read_paths(self, paths: list[str]) -> DataFrame:
        from pyspark.sql.types import StructType

        src = self._manifest["schema"]
        if self._schema_struct is None or self._schema_struct_src != src:
            self._schema_struct = StructType.fromJson(self._json.loads(src))
            self._schema_struct_src = src
        schema = self._schema_struct
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def read(self) -> DataFrame:
        return self.read_buckets(
            [int(b) for b in self._manifest["buckets"]]
        )

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        """Rows of exactly these buckets. Partitioned epochs contribute
        leaf dirs (file-level pruning); flat epochs are scanned with a
        bucket-expr filter — they may physically retain rows of buckets
        whose current version has since moved to a newer epoch."""
        want = set(buckets)
        flat_eps = set(self._manifest.get("flat", []))
        leaf_paths: list[str] = []
        per_flat: dict[int, list[int]] = {}
        for b, ep in self._manifest["buckets"].items():
            b = int(b)
            if b not in want:
                continue
            if ep in flat_eps:
                per_flat.setdefault(ep, []).append(b)
            else:
                leaf_paths.append(self._leaf(b, ep))
        out = self._read_paths(leaf_paths) if leaf_paths or not per_flat else None
        for ep, bs in per_flat.items():
            # ONE parsed IN predicate, not Column.isin(): isin makes a
            # py4j round trip per literal (r12 #14; measured 120 ms per
            # flat-epoch read in the mv fold profile vs ~2 ms parsed)
            in_sql = (
                f"({key_bucket_sql(self.keys, self.n_buckets)}) IN "
                f"({','.join(str(int(b)) for b in bs)})"
            )
            flat = self._read_paths([os.path.join(self.path, f"e{ep}")]).filter(
                F.expr(in_sql)
            )
            out = flat if out is None else out.unionByName(flat)
        return out

    def overwrite_buckets(self, df: DataFrame, touched: list[int] | None) -> None:
        """Write `df` (the complete new content of `touched` buckets; pass
        None on first materialization to mean "all") as a new epoch, then
        flip the manifest — ONE Spark job either way.

        Adaptive layout (measured): a batch touching most of the MV writes
        a FLAT epoch (plain coalesced parquet — no per-bucket small files,
        no shuffle; readers filter by bucket expr), while a narrow batch
        writes a PARTITIONED epoch (__bucket=N dirs, so later reads prune
        at file level and the write volume is O(touched)). At 100 TB the
        narrow path is the steady state; flat epochs come from backfills
        and full-table churn, where a full rewrite is optimal anyway."""
        epoch = self._manifest["epoch"] + 1
        out = os.path.join(self.path, f"e{epoch}")
        buckets = {int(b): ep for b, ep in self._manifest["buckets"].items()}
        prev_referenced = set(buckets.values())
        covered = max(len(set(buckets) | set(touched or [])), 1)
        flat = touched is None or len(touched) >= 0.5 * covered
        if flat:
            df.coalesce(8).write.mode("overwrite").parquet(out)
            self._manifest.setdefault("flat", []).append(epoch)
            for b in range(self.n_buckets) if touched is None else touched:
                buckets[b] = epoch  # empty buckets are harmless: the
                # bucket-expr filter just finds no rows for them
        else:
            (
                df.withColumn("__bucket", self.bucket_expr())
                .repartition(max(1, min(len(touched), 8)), F.col("__bucket"))
                .write.mode("overwrite")
                .partitionBy("__bucket")
                .parquet(out)
            )
            written = {
                int(d.split("=", 1)[1])
                for d in os.listdir(out)
                if d.startswith("__bucket=")
            }
            for b in touched:
                if b in written:
                    buckets[b] = epoch
                else:
                    buckets.pop(b, None)  # bucket emptied (all groups gone)
        if self._manifest["schema"] is None:
            self._manifest["schema"] = self._json.dumps(df.schema.jsonValue())
        now_referenced = set(buckets.values()) | {epoch}
        # GC: epochs retired by the PREVIOUS write (grace period for lazy
        # DataFrames handed downstream) that are still unreferenced now
        for ep in self._manifest.get("retired", []):
            if ep not in now_referenced:
                shutil.rmtree(os.path.join(self.path, f"e{ep}"), ignore_errors=True)
        self._manifest["retired"] = sorted(prev_referenced - now_referenced)
        self._manifest["flat"] = sorted(
            ep for ep in self._manifest.get("flat", []) if ep in now_referenced
        )
        self._manifest["buckets"] = {str(b): ep for b, ep in buckets.items()}
        self._manifest["epoch"] = epoch
        self._flip_manifest()

    def write(self, df: DataFrame) -> None:
        """Full materialization (first backfill)."""
        self.overwrite_buckets(df, None)


class ChunkedState:
    """Row-level operator state as append-only insert chunks + sequenced
    delete tombstones (the Delta data-files/deletion-vectors pattern):
    per-batch write cost is O(batch), NOT O(state) — the property that
    survives 100 TB. Reads anti-join the tombstones; a real deployment
    compacts chunks+tombstones periodically (Delta OPTIMIZE).

    Chunks and tombstones carry batch sequence numbers: a delete in batch
    n masks inserts from batches < n only, so an UpdateDelete/UpdateInsert
    pair (delete old version + re-insert same row id) within one batch
    works. Insert-then-delete of a NEW row inside a single chunk is not
    supported (split the chunk).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        row_id: str | list[str],
        bucket_cols: list[str] | None = None,
        n_buckets: int = 16,
    ):
        self.spark = spark
        # single- or composite-key row identity (reference tables support
        # multi-column PRIMARY KEY; tombstones then match on all pk cols)
        self.row_ids = [row_id] if isinstance(row_id, str) else list(row_id)
        self.row_id = self.row_ids[0]
        # Optional read-path bucketing (the state analog of
        # _BucketedMvTable): chunks whose rows carry all `bucket_cols`
        # are written under `b{seq}/__bucket=N/` using the SAME crc32
        # key-bucket as the MV, so a recompute that knows its touched
        # buckets can prune the state SCAN to those leaf dirs —
        # per-batch read cost O(state of touched buckets), not O(state).
        # Chunks missing a bucket col (derived keys) write flat and are
        # always read; pruning is a file-level superset filter either way.
        self.bucket_cols = list(bucket_cols) if bucket_cols else None
        self.n_buckets = n_buckets
        #: leaf dirs of the last pruned read (None = full scan) — scale
        #: tests assert bytes-read proportionality from this
        self.last_read_paths: list[str] | None = None
        self.base = path
        os.makedirs(path, exist_ok=True)
        #: footer-derived Spark schema per chunk-tree root (schemas are
        #: constant within a generation; compaction uses new dir keys)
        self._schema_cache: dict = {}
        # generation pointer: compaction writes a NEW generation directory
        # and flips this pointer last (same epoch-commit discipline as
        # _VersionedTable) — a crash mid-compaction leaves the old
        # generation live and the half-written new one ignored.
        self._gen = self._read_gen()
        # legacy layout (pre-generation dirs): adopt as generation 0
        if self._gen == 0:
            for old, new in (("values", "values_g0"), ("tombstones", "tombs_g0")):
                op, np_ = os.path.join(path, old), os.path.join(path, new)
                if os.path.isdir(op) and not os.path.exists(np_):
                    os.rename(op, np_)
        # GC generations orphaned by a crash between the GEN flip and the
        # old-generation rmtree in compact() (they are never read again)
        import re as _re

        for d in os.listdir(path):
            m = _re.fullmatch(r"(?:values|tombs)_g(\d+)", d)
            if m and int(m.group(1)) != self._gen:
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
        self.values_dir = os.path.join(path, f"values_g{self._gen}")
        self.tombs_dir = os.path.join(path, f"tombs_g{self._gen}")
        self._has_values = bool(os.path.isdir(self.values_dir) and os.listdir(self.values_dir))
        self._has_tombs = bool(os.path.isdir(self.tombs_dir) and os.listdir(self.tombs_dir))
        # recovery: resume numbering past BOTH chunk and tombstone seqs —
        # a delete-only batch leaves no insert rows, only tombstones
        self._seq = 0
        if self._has_values:
            vmax = self._read_dir(self.values_dir).agg(F.max("__seq")).first()[0]
            self._seq = (vmax if vmax is not None else -1) + 1
        if self._has_tombs:
            tmax = self._read_dir(self.tombs_dir).agg(F.max("__del_seq")).first()[0]
            self._seq = max(self._seq, (tmax if tmax is not None else -1) + 1)
        # batch-id pointers override data-derived seq: files written by a
        # batch that CRASHED before its pointer flip must be overwritten
        # on redelivery, not sequenced past. Pointers are per upstream
        # namespace (LAST_BATCH / LAST_BATCH_<ns>); the committed horizon
        # is the max seq any of them recorded.
        ptr_seqs = [
            ptr[1]
            for ns in self._batch_namespaces()
            if (ptr := self._read_last_batch(ns)) is not None
        ]
        if ptr_seqs:
            self._seq = max(ptr_seqs) + 1
        #: metadata of the LAST fold's chunk files (paths + footer row
        #: counts), recorded by fold(): callers derive the batch's
        #: affected keys / emptiness from the already-written local files
        #: instead of re-evaluating the upstream batch plan (one fewer
        #: Spark job + no duplicate source scan per fold). None until a
        #: fold happens in this process (or after a replay skip).
        self.last_fold: dict | None = None

    def _gen_pointer(self) -> str:
        return os.path.join(self.base, "GEN")

    def _read_gen(self) -> int:
        try:
            with open(self._gen_pointer()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _read_dir(self, path: str, schema_root: str | None = None) -> DataFrame:
        # chunks live in per-batch subdirs (idempotent overwrite target).
        # Explicit footer-derived schema: a bare spark.read.parquet runs a
        # schema-INFERENCE Spark job per read — one job per fold that the
        # footer (driver-side, cached per generation dir) already answers.
        r = self.spark.read.option("recursiveFileLookup", "true")
        sch = self._tree_schema(schema_root or path)
        if sch is not None:
            r = r.schema(sch)
        return r.parquet(path)

    def _tree_schema(self, root: str):
        sch = self._schema_cache.get(root)
        if sch is None:
            sch = _parquet_tree_schema(root)
            if sch is not None:
                self._schema_cache[root] = sch
        return sch

    def _read_paths(self, paths: list[str], schema_root: str) -> DataFrame:
        """Multi-path chunk read with the same explicit-schema contract
        as `_read_dir` (the schema of any file under `schema_root` stands
        for all pruned leaves beneath it)."""
        r = self.spark.read.option("recursiveFileLookup", "true")
        sch = self._tree_schema(schema_root)
        if sch is not None:
            r = r.schema(sch)
        return r.parquet(*paths)

    def _batch_pointer(self, ns: str | None = None) -> str:
        fn = "LAST_BATCH" if ns is None else f"LAST_BATCH_{ns}"
        return os.path.join(os.path.dirname(self.values_dir), fn)

    def _batch_namespaces(self) -> list[str | None]:
        """Every namespace with a committed pointer (None = default)."""
        out: list[str | None] = []
        for fn in os.listdir(self.base):
            if fn == "LAST_BATCH":
                out.append(None)
            elif fn.startswith("LAST_BATCH_") and not fn.endswith(".tmp"):
                out.append(fn[len("LAST_BATCH_"):])
        return out

    def _read_last_batch(self, ns: str | None = None):
        """(last committed batch_id, seq it used) or None."""
        try:
            with open(self._batch_pointer(ns)) as f:
                bid, seq = f.read().strip().split(":")
                return int(bid), int(seq)
        except (FileNotFoundError, ValueError):
            return None

    def _seq_times_path(self) -> str:
        return os.path.join(self.base, "SEQ_TIMES")

    def seq_times(self) -> dict[int, float]:
        """Per-chunk commit timestamps (epoch seconds) recorded at fold
        time — the basis for TTL reads and FOR SYSTEM_TIME AS OF (the
        reference's per-epoch Hummock version timestamps). Monotone in
        seq. Compaction collapses history into the new base chunk, so
        entries older than the last compaction are gone — time travel
        beyond it raises, the reference's bounded-retention contract.
        The record is one small JSON entry per fold, rewritten on
        append (driver-side, ~µs at test scale); a deployment that
        never compacts a table pays O(folds) per rewrite — compaction
        cadence (the production norm) bounds it, same as Hummock's
        version-log truncation."""
        import json as _json

        try:
            with open(self._seq_times_path()) as f:
                return {int(k): float(v) for k, v in _json.load(f).items()}
        except (FileNotFoundError, ValueError):
            return {}

    def _record_seq_time(self, seq: int, ts: float) -> None:
        import json as _json

        times = self.seq_times()
        times[seq] = ts
        tmp = self._seq_times_path() + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({str(k): v for k, v in times.items()}, f)
        os.replace(tmp, self._seq_times_path())

    def max_seq_asof(self, ts: float) -> int:
        """Largest chunk seq committed at or before `ts`; raises if the
        history floor (oldest retained chunk) is already past `ts` —
        mirroring the reference's `time travel: version not found for
        epoch` error when Hummock's retained versions don't reach back."""
        times = self.seq_times()
        ok = [s for s, t in times.items() if t <= ts]
        if not ok:
            raise ValueError(
                f"time travel: version not found for epoch {ts} (history "
                "starts at "
                + (repr(min(times.values())) if times else "<empty>")
                + "; older versions were compacted away)"
            )
        return max(ok)

    def fold(
        self,
        inserts: DataFrame,
        deletes: DataFrame,
        batch_id: int | None = None,
        tomb_extra_cols: list[str] | None = None,
        batch_ns: str | None = None,
        commit_ts: float | None = None,
    ) -> bool:
        """Append one batch's inserts and delete tombstones (row ids).

        Exactly-once under redelivery (§2.9, the reference's epoch-commit
        contract; Spark foreachBatch re-runs a batch after failure):
        pass the sink's `batch_id` — an id ≤ the committed LAST_BATCH
        pointer is skipped; a batch that crashed before its pointer flip
        is re-run under the SAME seq (recovery resumes from the pointer)
        into seq-named subdirs with overwrite, replacing its own partial
        files instead of duplicating them. The pointer (batch_id:seq)
        flips last. Returns False if skipped as already applied.

        `batch_ns` scopes the pointer to one upstream id sequence
        (LAST_BATCH_<ns>): state fed by several independent streams keeps
        one monotonic pointer per stream instead of comparing unrelated
        sequences against a single pointer (ADVICE r4 #5).
        """
        if batch_id is not None:
            last = self._read_last_batch(batch_ns)
            if last is not None and batch_id <= last[0]:
                self.last_fold = None  # replayed batch: no fresh chunks
                return False
        # Per-batch chunks write FLAT (one cheap parallel write, no
        # partitionBy fan-out): the LSM shape — compaction periodically
        # rewrites the accumulated state into __bucket=N leaf dirs, so a
        # pruned read costs O(touched buckets of the compacted base) +
        # O(recent flat chunks), and the per-batch write cost stays the
        # round-3 cost exactly.
        vw = inserts.withColumn("__seq", F.lit(self._seq)).coalesce(4)
        vchunk = os.path.join(self.values_dir, f"b{self._seq}")
        vw.write.mode("overwrite").parquet(vchunk)
        self._has_values = True
        self.last_fold = {
            "values": vchunk,
            "v_rows": _parquet_rows(vchunk),
            "tombs": None,
            "t_rows": 0,
        }
        schema_file = os.path.join(self.base, "SCHEMA")
        if not os.path.exists(schema_file):
            import json as _json

            tmp = schema_file + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(inserts.schema.jsonValue(), f)
            os.replace(tmp, schema_file)
        # tomb_extra_cols (e.g. the MV's group keys) ride along in the
        # tombstone files so the driver can derive a delete batch's
        # affected groups from local footers without a Spark job.
        # Insert-only batches fold the delete branch to an empty
        # LocalRelation — skip the write with NO job at all; otherwise
        # write and decide emptiness from the written footers (also
        # job-free) — an isEmpty() probe either way would cost an extra
        # Spark job per batch for the same information.
        if not _statically_empty(deletes):
            keep = list(
                dict.fromkeys(
                    self.row_ids
                    + [c for c in (tomb_extra_cols or []) if c in deletes.columns]
                )
            )
            dl = deletes.select(*keep, F.lit(self._seq).alias("__del_seq"))
            tomb_chunk = os.path.join(self.tombs_dir, f"b{self._seq}")
            dl.coalesce(1).write.mode("overwrite").parquet(tomb_chunk)
            t_rows = _parquet_rows(tomb_chunk)
            if t_rows > 0:
                self._has_tombs = True
                self.last_fold.update(tombs=tomb_chunk, t_rows=t_rows)
            else:
                shutil.rmtree(tomb_chunk, ignore_errors=True)
        import time as _time

        self._record_seq_time(
            self._seq, commit_ts if commit_ts is not None else _time.time()
        )
        self._seq += 1
        if batch_id is not None:
            tmp = self._batch_pointer(batch_ns) + ".tmp"
            with open(tmp, "w") as f:
                f.write(f"{batch_id}:{self._seq - 1}")
            os.replace(tmp, self._batch_pointer(batch_ns))
        return True

    def _pruned_paths(self, root: str, buckets: list[int]) -> list[str]:
        """Leaf dirs of `root` covering exactly `buckets`: bucketed chunk
        dirs contribute only the wanted `__bucket=N` leaves; flat chunks
        (pre-bucketing or missing-key batches) contribute whole dirs.
        Driver-side local listing — on an object store this would be the
        commit manifest, same as _BucketedMvTable."""
        want = {f"__bucket={b}" for b in buckets}
        out: list[str] = []
        for chunk in sorted(os.listdir(root)):
            cdir = os.path.join(root, chunk)
            if not os.path.isdir(cdir):
                continue
            subs = [d for d in os.listdir(cdir) if d.startswith("__bucket=")]
            if subs:
                out.extend(os.path.join(cdir, s) for s in subs if s in want)
            else:
                out.append(cdir)
        return out

    def _empty(self) -> DataFrame:
        import json as _json

        from pyspark.sql.types import StructType

        try:
            with open(os.path.join(self.base, "SCHEMA")) as f:
                schema = StructType.fromJson(_json.load(f))
        except FileNotFoundError:
            raise ValueError(
                f"state at {self.base} has never been folded and has no "
                "recorded schema"
            ) from None
        return self.spark.createDataFrame([], schema)

    def _bounded_chunk_dirs(
        self, root: str, min_seq: int | None, max_seq: int | None
    ) -> list[str]:
        """Chunk dirs `b{seq}` of `root` with min_seq <= seq <= max_seq —
        TTL and time-travel prune EXPIRED/FUTURE chunks at FILE level
        (whole directories skipped, the scan shrinks with the data)."""
        out = []
        for chunk in sorted(os.listdir(root)):
            m = re.fullmatch(r"b(\d+)", chunk)
            if not m:
                continue
            s = int(m.group(1))
            if (min_seq is None or s >= min_seq) and (max_seq is None or s <= max_seq):
                out.append(os.path.join(root, chunk))
        return out

    def read_bounded(
        self, min_seq: int | None = None, max_seq: int | None = None
    ) -> DataFrame:
        """State restricted to chunk seqs in [min_seq, max_seq]:
        `max_seq` = the FOR SYSTEM_TIME AS OF read (tombstones newer than
        the horizon don't apply); `min_seq` = the TTL read on append-only
        tables (chunks older than the retention window are skipped
        entirely — no tombstones exist on append-only state)."""
        if not self._has_values:
            return self._empty()
        vpaths = self._bounded_chunk_dirs(self.values_dir, min_seq, max_seq)
        if not vpaths:
            return self._empty()
        v = self._read_paths(vpaths, self.values_dir)
        if self._has_tombs:
            tpaths = self._bounded_chunk_dirs(self.tombs_dir, min_seq, max_seq)
            if tpaths:
                t = self._read_paths(tpaths, self.tombs_dir)
                cond = v["__seq"] < t["__del_seq"]
                for c in self.row_ids:
                    cond = cond & (v[c].eqNullSafe(t[c]))
                v = v.join(t, on=cond, how="left_anti")
        return v.drop("__seq")

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current state (chunks minus tombstones). With `buckets`, the
        scan is pruned at FILE level to those key-buckets' leaf dirs — a
        superset of the wanted keys' rows (callers still apply their
        exact key filter); per-batch read cost becomes O(state of
        touched buckets) instead of O(state)."""
        if not self._has_values:
            # never folded (e.g. one side of a join before its first
            # chunk): empty frame with the recorded schema if any
            return self._empty()
        self.last_read_paths = None
        # pruning a full bucket set is a no-op — take the plain recursive
        # scan (one listing) instead of assembling every leaf path
        if buckets is not None and len(set(buckets)) >= self.n_buckets:
            buckets = None
        if buckets is not None and self.bucket_cols:
            vpaths = self._pruned_paths(self.values_dir, buckets)
            self.last_read_paths = vpaths
            if not vpaths:
                return self._empty()
            v = self._read_paths(vpaths, self.values_dir)
            if self._has_tombs:
                tpaths = self._pruned_paths(self.tombs_dir, buckets)
                self.last_read_paths = vpaths + tpaths
                if tpaths:
                    t = self._read_paths(tpaths, self.tombs_dir)
                    cond = v["__seq"] < t["__del_seq"]
                    for c in self.row_ids:
                        cond = cond & (v[c].eqNullSafe(t[c]))
                    v = v.join(t, on=cond, how="left_anti")
            return v.drop("__seq")
        v = self._read_dir(self.values_dir)
        if self._has_tombs:
            t = self._read_dir(self.tombs_dir)
            cond = v["__seq"] < t["__del_seq"]
            for c in self.row_ids:
                # null-safe: composite row ids may carry NULL components
                # (e.g. the null-padded side of an outer-join changelog
                # feeding a downstream MV) and must still be deletable
                cond = cond & (v[c].eqNullSafe(t[c]))
            v = v.join(t, on=cond, how="left_anti")
        return v.drop("__seq")

    def compact(self, transform=None) -> None:
        """Rewrite chunks minus tombstones into one generation and drop
        the tombstone set (the Delta OPTIMIZE / LSM-compaction analog —
        the reference's Hummock compactor role). Read cost returns to a
        plain scan; sequence numbering restarts above the survivors.

        `transform(survivors) -> DataFrame` rewrites the rows during the
        compaction pass — the schema-evolution hook (ALTER TABLE
        ADD/DROP COLUMN rewrites the table exactly once, reference
        `handler/alter_table_column.rs` versioned-schema rewrite); the
        recorded SCHEMA file is refreshed to the transformed schema.

        Crash-atomic: survivors are written into generation g+1, the GEN
        pointer flips last (os.replace), and only then is generation g
        garbage-collected. A crash before the flip leaves g intact (the
        orphan g+1 dir is overwritten by the next compaction); a crash
        after the flip merely delays GC — the old tombstones can never
        apply to the new generation's rows.
        """
        survivors = self.read()
        if transform is not None:
            survivors = transform(survivors)
            import json as _json

            tmp = os.path.join(self.base, "SCHEMA") + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(survivors.schema.jsonValue(), f)
            os.replace(tmp, os.path.join(self.base, "SCHEMA"))
        nxt = self._gen + 1
        new_values = os.path.join(self.base, f"values_g{nxt}")
        sw = survivors.withColumn("__seq", F.lit(0)).coalesce(4)
        base_chunk = os.path.join(new_values, "b0")
        if self.bucket_cols and set(self.bucket_cols) <= set(survivors.columns):
            # the compacted base is the BUCKETED layer (LSM L1): pruned
            # reads skip untouched buckets at file level; per-batch flat
            # chunks on top stay cheap to write and small to scan
            sw.withColumn(
                "__bucket", key_bucket_expr(self.bucket_cols, self.n_buckets)
            ).write.mode("overwrite").partitionBy("__bucket").parquet(base_chunk)
            if not any(s.startswith("__bucket=") for s in os.listdir(base_chunk)):
                # zero survivors: partitionBy wrote no data files — keep a
                # flat empty chunk so schema inference stays alive
                sw.coalesce(1).write.mode("overwrite").parquet(base_chunk)
        else:
            sw.write.mode("overwrite").parquet(base_chunk)
        tmp = self._gen_pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._gen_pointer())
        old_values, old_tombs = self.values_dir, self.tombs_dir
        self._gen = nxt
        self.values_dir = new_values
        self.tombs_dir = os.path.join(self.base, f"tombs_g{nxt}")
        shutil.rmtree(old_values, ignore_errors=True)
        shutil.rmtree(old_tombs, ignore_errors=True)
        self._has_tombs = False
        self._seq = 1
        # history collapsed into the new base chunk: reset the commit-time
        # record — time travel reaches back only to the compaction point
        # (the reference's Hummock time-travel retention bound)
        import json as _json
        import time as _time

        tmp = self._seq_times_path() + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"0": _time.time()}, f)
        os.replace(tmp, self._seq_times_path())


class _RetractableView:
    """Shared per-batch maintenance loop (the reference's HashAgg +
    MaterializedInput pattern): fold the chunk into ChunkedState, then
    recompute ONLY the partitions/groups the batch touched and splice
    them into the MV (untouched ∪ recomputed)."""

    #: compact the chunked state every N folded batches (None = never).
    #: Amortizes the O(state) rewrite over N O(batch) folds — the same
    #: schedule trade-off as the reference's Hummock compaction / Delta
    #: OPTIMIZE cadence. 16 keeps read amplification (chunk count +
    #: tombstone anti-join size) bounded without noticeable write cost.
    compact_every: int | None = 16

    def __init__(self, spark: SparkSession, state_dir: str, keys: list[str], row_id: str):
        self.spark = spark
        self.keys = keys
        self.row_id = row_id
        self.mv = _BucketedMvTable(spark, os.path.join(state_dir, "mv"), keys)
        # state bucketed by the same crc32 key-buckets as the MV: the
        # per-batch recompute then prunes its state READ to the touched
        # buckets, the read-side analog of the O(touched-buckets) write
        self.state = ChunkedState(
            spark,
            os.path.join(state_dir, "state"),
            row_id,
            bucket_cols=keys,
            n_buckets=self.mv.n_buckets,
        )
        # MV-on-MV (reference `docs/dev/src/design/mv-on-mv.md`): this
        # view's per-batch diff (−1 old affected rows, +1 recomputed
        # rows — the Update pair) is itself a changelog, forwarded to
        # subscribed downstream views.
        self.downstream: list["_RetractableView"] = []
        # subscription changelog log (reference CREATE SUBSCRIPTION,
        # `create_subscription.rs`): when enabled, every batch's diff
        # (−1 old affected rows / +1 recomputed — the Update pair) is
        # persisted as a chunk that durable named cursors consume
        # (streaming/subscription.py). Off by default: one extra write
        # per batch is only paid when someone subscribes.
        self.changelog_dir = os.path.join(state_dir, "changelog")
        self.emit_changelog = False
        # group keys DERIVED from input columns (e.g. GROUP BY k % 2):
        # key_of(rows) ANNOTATES rows with this view's key columns (the
        # reference's dispatch-key derivation). Default: identity — the
        # keys are already input columns.
        self.key_of = None

    def _recompute(self, rows: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def _touched_buckets_fast(self) -> list[int] | None:
        """Touched buckets from the just-folded chunk files — zero Spark
        jobs; identity keys only (derived keys need the annotate expr)."""
        if self.key_of is not None:
            return None
        return buckets_from_chunks(self.state, self.keys, self.mv.n_buckets)

    def _chunk_affected_values(self, lf: dict | None) -> tuple[list, bool] | None:
        """The batch's affected KEY VALUES (single identity key only),
        read driver-side from the just-written chunk files — the literal
        form of `_chunk_affected`. When available, the splice replaces
        its affected-keys semi/anti joins with an `isin` predicate: two
        fewer join subtrees and no broadcast-build Spark jobs per fold.
        None → fall back to the DataFrame/join path (replay, composite
        or derived keys, huge batch, non-int/string dtype)."""
        if self.key_of is not None or len(self.keys) != 1 or lf is None:
            return None
        return chunk_key_values(self.state, self.keys[0])

    def _buckets_of_values(self, vals: list, has_null: bool) -> list[int]:
        """See `buckets_of_values` (module level, shared with the joins)."""
        return buckets_of_values(vals, has_null, self.mv.n_buckets)

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        batch_ns: str | None = None,
    ) -> None:
        """Per-MV parallelism wrapper (reference
        `handler/alter_parallelism.rs` — each streaming job carries its
        own parallelism; Spark's analog is the shuffle-partition count
        of this MV's maintenance fold). Statements serialize under the
        engine lock, so the scoped conf swap cannot leak across jobs."""
        par = getattr(self, "parallelism", None)
        if not par:
            return self._apply_batch_inner(batch, batch_id, batch_ns)
        prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(par))
        try:
            return self._apply_batch_inner(batch, batch_id, batch_ns)
        finally:
            self.spark.conf.set("spark.sql.shuffle.partitions", prev)

    def _apply_batch_inner(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        batch_ns: str | None = None,
    ) -> None:
        """Fold one changelog chunk (needs an __op column) into the MV.

        With `batch_id` (foreachBatch redelivery protection): a replayed
        batch skips the state fold, but the affected-group recompute +
        MV write still run — they are idempotent (full recompute from
        state, not a delta), which closes the crash window between the
        state commit and the MV version flip. `batch_ns` scopes the
        redelivery pointer per upstream stream (see ChunkedState.fold).
        """
        # parsed-SQL one-call forms (r13 §B: Column chains pay a py4j
        # round trip per node; where(str)+drop(str) is 2 per side)
        inserts = batch.where(f"`{OP_COL}` > 0").drop(OP_COL)
        deletes = batch.where(f"`{OP_COL}` < 0").drop(OP_COL)
        did_fold = self.state.fold(
            inserts,
            deletes,
            batch_id=batch_id,
            tomb_extra_cols=self.keys if self.key_of is None else None,
            batch_ns=batch_ns,
        )
        # O(touched buckets) on BOTH sides of the recompute: the bucket
        # set comes from the batch's just-written local chunk files when
        # possible (zero extra jobs), else a tiny collect; the state
        # scan AND the MV splice then prune to exactly those buckets.
        # Computed BEFORE compaction — the compacted generation's single
        # chunk spans every bucket, the batch itself does not. Only an
        # actually-folded batch compacts (a skipped replay must not
        # re-run the O(state) rewrite).
        lf = self.state.last_fold if did_fold else None
        affected_vals = self._chunk_affected_values(lf)
        if affected_vals is not None:
            # one driver-side chunk read serves both: the literal key set
            # AND the touched buckets derived from it (no second read)
            touched = self._buckets_of_values(*affected_vals)
        else:
            touched = self._touched_buckets_fast()
        will_compact = bool(
            did_fold and self.compact_every and self.state._seq % self.compact_every == 0
        )

        def compact_now():
            pre = self.state._seq
            self.state.compact()
            # keep changelog chunk ids monotonic across the seq reset
            bump_chunk_base(self.changelog_dir, pre - self.state._seq)

        if lf is not None and self.mv.exists() and lf["v_rows"] + lf["t_rows"] == 0:
            # empty batch (e.g. an upstream pushed-down filter dropped
            # everything): the state fold is committed, and recompute /
            # splice / downstream forward are no-ops. Emptiness comes
            # from the just-written chunk footers — zero Spark jobs
            # (previously a take(1) job re-evaluating the batch plan).
            # The compaction cadence still runs — an empty batch landing
            # on a cadence seq must not defer the O(state) rewrite.
            # (The FIRST apply must still run the splice to materialize
            # the empty MV + schema.)
            if will_compact:
                compact_now()
            return
        # Affected keys from the batch's just-written chunk files (tiny
        # local parquet) instead of re-evaluating the upstream batch plan:
        # the splice references `affected` in up to three join branches,
        # each of which would otherwise re-run the whole upstream subtree
        # (guide §2.4 — don't recompute what is already materialized).
        # When the key VALUES fit driver-side (affected_vals), even the
        # chunk-file read is skipped: the splice filters by a literal
        # InSet instead of joining (no broadcast-build jobs at all).
        affected = None if affected_vals is not None else self._chunk_affected(lf)
        if affected is not None and will_compact:
            # compaction GCs the old generation's chunk files the lazy
            # plan points at — pin the (tiny) key set first
            affected = affected.localCheckpoint(eager=True)
        if will_compact:
            compact_now()

        if affected is None and affected_vals is None:
            annotate = self.key_of or (lambda d: d)
            affected = annotate(batch).select(*self.keys).distinct()
            if self.mv.exists() and not affected.take(1):
                return
        self._splice(
            affected,
            touched,
            batch_id=batch_id,
            batch_ns=batch_ns,
            affected_vals=affected_vals,
        )

    def _chunk_affected(self, lf: dict | None) -> DataFrame | None:
        """The batch's affected key tuples, read from the just-written
        state chunk files (values chunk carries every input column; the
        tombstone chunk carries the keys via tomb_extra_cols). None when
        the fold was skipped (replay), keys are derived (key_of), or a
        chunk lacks a key column — callers fall back to the batch plan.
        No distinct(): every consumer is a semi/anti join or a distinct
        aggregation, so duplicate key rows are harmless."""
        if self.key_of is not None:
            return None
        return chunk_key_frame(self.spark, lf, self.keys)

    def retouch(self, affected: DataFrame) -> None:
        """Recompute + splice the given key tuples from CURRENT state
        without any new input rows — the Now-executor tick path
        (reference `src/stream/src/executor/now.rs`: time moving is an
        input too). State gets an empty fold first so changelog chunk
        numbering stays unique for subscriptions."""
        self.state.fold(
            self.state.read().limit(0), self.state.read().limit(0)
        )
        self._splice(affected, None)

    def _splice(
        self,
        affected: DataFrame | None,
        touched: list[int] | None,
        batch_id: int | None = None,
        batch_ns: str | None = None,
        affected_vals: tuple[list, bool] | None = None,
    ) -> None:
        annotate = self.key_of or (lambda d: d)
        st = annotate(self.state.read(buckets=touched))
        if affected_vals is not None:
            # literal key-set pushdown: the semi/anti joins (and their
            # broadcast-build jobs) become InSet filters — the key set
            # was already read driver-side from the batch's chunk files
            vals, has_null = affected_vals
            cond = key_values_filter(self.keys[0], vals, has_null)
            neg = ~cond  # negated once per fold, not per frame (§B)
            semi = lambda d: d.filter(cond)  # noqa: E731
            anti = lambda d: d.filter(neg)  # noqa: E731
        else:
            semi = lambda d: d.join(  # noqa: E731
                affected, nullsafe_cond(d, affected, self.keys), "left_semi"
            )
            anti = lambda d: d.join(  # noqa: E731
                affected, nullsafe_cond(d, affected, self.keys), "left_anti"
            )
        recomputed = self._recompute(semi(st))
        out_changelog = None
        want_changelog = bool(self.downstream) or self.emit_changelog
        if self.mv.exists():
            if touched is None:
                touched = self.mv.touched_buckets(affected)
            prev_t = self.mv.read_buckets(touched)
            if want_changelog:
                old_affected = semi(prev_t)
                out_changelog = with_ops(old_affected, -1).unionByName(
                    with_ops(recomputed, 1)
                )
            if self.emit_changelog:
                # persist BEFORE the MV flip: on a crash in between, the
                # redelivered batch overwrites the same chunk (idempotent)
                self._log_changelog(out_changelog)
            untouched_t = anti(prev_t)
            self.mv.overwrite_buckets(untouched_t.unionByName(recomputed), touched)
        else:
            if want_changelog:
                out_changelog = with_ops(recomputed, 1)
            if self.emit_changelog:
                self._log_changelog(out_changelog)
            self.mv.write(recomputed)
        if out_changelog is not None:
            # materialize before forwarding (lineage truncation — see
            # RetractableStreamJoin.apply: deep MV chains would compound
            # plans level-by-level otherwise)
            out_changelog = out_changelog.localCheckpoint(eager=True)
            # batch_id rides along so the whole MV chain shares one
            # redelivery horizon: a replayed parent batch re-forwards the
            # (identical, state-derived) changelog and each child skips
            # its own already-committed fold. The namespace passes
            # through unchanged — this view has one upstream, so its
            # children see the same id sequence it did.
            for d in self.downstream:
                d.apply_batch(out_changelog, batch_id=batch_id, batch_ns=batch_ns)

    def _log_changelog(self, chunk: DataFrame) -> None:
        cid = chunk_base(self.changelog_dir) + self.state._seq - 1
        d = os.path.join(self.changelog_dir, f"c{cid}")
        chunk.coalesce(4).write.mode("overwrite").parquet(d)
        # commit timestamp marker (reference epoch commit_ts): cursors
        # positioned with SINCE <unix_ms> bound against it. Underscore
        # prefix → invisible to Spark's parquet reader.
        import time as _time

        with open(os.path.join(d, "_COMMIT_TS_MS"), "w") as f:
            f.write(str(int(_time.time() * 1000)))

    def result(self) -> DataFrame:
        return self.mv.read()


class MaterializedView(_RetractableView):
    """Generic retractable MV: `recompute(rows)` is any DataFrame
    transform of the affected groups' state rows (its output must include
    the group keys). The CREATE MATERIALIZED VIEW surface: arbitrary
    per-group query shapes get incremental maintenance + retraction from
    the shared fold/splice loop."""

    def __init__(self, spark, state_dir, keys, row_id, recompute):
        super().__init__(spark, state_dir, keys, row_id)
        self._fn = recompute

    def _recompute(self, rows: DataFrame) -> DataFrame:
        return self._fn(rows)


class MaterializedGroupAgg(_RetractableView):
    """Incrementally-maintained `GROUP BY keys` aggregate MV with full
    retraction support (insert AND delete inputs): count / exact-cents sum
    / min / max / avg per group. Groups whose count drops to 0 disappear
    (the reference emits a Delete for those)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        row_id: str,
        value_col: str,
    ):
        super().__init__(spark, state_dir, keys, row_id)
        self.value_col = value_col
        # agg Columns built once (r13 §B): they are constant expression
        # trees over fixed column names — rebuilding them per fold cost
        # 180 ms/fold of py4j construction in the profile
        v = F.col(value_col)
        self._agg_cols = [
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.round(v * 10000, 0).cast("long")) / 10000.0).alias("total"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
        ]

    def _recompute(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(*self.keys).agg(*self._agg_cols)


class MaterializedOverWindow(_RetractableView):
    """Incrementally-maintained window-function MV with retraction
    (reference OverWindow general executor, `over_window/general.rs:48` +
    `over_partition.rs`): on every batch, the window functions are
    recomputed for exactly the PARTITIONS the batch touched (the
    reference's delta-based affected-range recompute, here at partition
    granularity) and spliced into the MV.

    `project(rows, w)` receives the affected partitions' rows and the
    partition-ordered WindowSpec and returns the output rows (must
    include the partition keys).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        order_cols: list[str],
        row_id: str,
        project,
    ):
        super().__init__(spark, state_dir, keys, row_id)
        self.order_cols = order_cols
        self.project = project
        self._wspec = None

    def _recompute(self, rows: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        # WindowSpec cached (r13 §B): constant over fixed key/order
        # names, and callers may key their own Column caches on its
        # identity (see stream_over_window's project)
        if self._wspec is None:
            self._wspec = W.partitionBy(*self.keys).orderBy(
                *[F.asc(c) for c in self.order_cols]
            )
        return self.project(rows, self._wspec)


def run_changelog(
    spark: SparkSession,
    state_dir: str,
    batches: list[DataFrame],
    keys: list[str],
    row_id: str,
    value_col: str,
) -> DataFrame:
    """Drive a MaterializedGroupAgg over a sequence of changelog chunks
    (the test/driver entry for snapshot-equivalence checks)."""
    mv = MaterializedGroupAgg(spark, state_dir, keys, row_id, value_col)
    for b in batches:
        mv.apply_batch(b)
    return mv.result()


class AppendOnlyGroupTopN:
    """Incrementally-maintained per-group top-k over an append-only stream
    (reference AppendOnlyGroupTopN, `top_n/group_top_n.rs:64` +
    `top_n_appendonly.rs`): state is BOUNDED at k rows per group — each
    batch ranks (previous top-k ∪ new rows) and keeps k.

    At scale this is the exact pattern that survives 100 TB: per-batch
    work is |batch| + k·|touched groups|, state never grows past
    k·|groups|, and the rank is a keyed window over that bounded set.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        order_col: str,
        tiebreak: str,
        k: int,
    ):
        self.keys = keys
        self.order_col = order_col
        self.tiebreak = tiebreak
        self.k = k
        self.state = _VersionedTable(spark, os.path.join(state_dir, "topn"))

    def apply_batch(self, batch: DataFrame) -> None:
        from pyspark.sql import Window as W

        cand = batch.select(*self.keys, self.order_col, self.tiebreak)
        if self.state.exists():
            cand = self.state.read().unionByName(cand)
        w = W.partitionBy(*self.keys).orderBy(
            F.desc(self.order_col), F.asc(self.tiebreak)
        )
        topk = (
            cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.k)
            .drop("__rn")
        )
        self.state.write(topk)

    def result(self) -> DataFrame:
        from pyspark.sql import Window as W

        w = W.partitionBy(*self.keys).orderBy(
            F.desc(self.order_col), F.asc(self.tiebreak)
        )
        return self.state.read().withColumn("rk", F.row_number().over(w))


def _next_seq_index(path: str, prefix: str) -> int:
    """max existing `<prefix><N>` entry + 1 (NOT the entry count: gaps
    from GC'd zero-row emissions would otherwise make a restart reuse —
    and overwrite — a live index)."""
    nxt = 0
    if os.path.isdir(path):
        for d in os.listdir(path):
            m = re.fullmatch(rf"{prefix}(\d+)", d)
            if m:
                nxt = max(nxt, int(m.group(1)) + 1)
    return nxt


def _parse_duration_seconds(text: str) -> float:
    """Seconds of a Spark interval string like '1 hour' / '10 minutes'
    (fractional values allowed — '0.5 seconds' is a legal tumble)."""
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*(second|minute|hour|day)s?\s*", text, re.I)
    if not m:
        raise ValueError(f"unsupported window duration {text!r}")
    n = float(m.group(1))
    return n * {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        m.group(2).lower()
    ]


def _parquet_ts_minmax(path: str, col: str):
    """(min, max) of a timestamp column across a just-written local
    parquet dir — driver-side metadata/column read, no Spark job (the
    same contract as `_parquet_rows`; this is the sink-commit statistic a
    cluster sink would report). Falls back from footer stats to a
    vectorized column read when stats are absent."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import datetime as _dt

    mn = mx = None

    def norm(v):
        # keep tz-AWARE stats aware (normalized to UTC): F.lit() of an
        # aware datetime binds the exact instant regardless of the
        # session time zone (SET TIME ZONE must not shift watermarks);
        # naive values come from NTZ columns, where wall-clock semantics
        # are already session-independent
        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            return v.astimezone(_dt.timezone.utc)
        return v

    def fold(lo, hi):
        nonlocal mn, mx
        lo, hi = norm(lo), norm(hi)
        if lo is not None and (mn is None or lo < mn):
            mn = lo
        if hi is not None and (mx is None or hi > mx):
            mx = hi

    for f in _glob.glob(os.path.join(path, "*.parquet")):
        pf = pq.ParquetFile(f)
        md = pf.metadata
        if md.num_rows == 0:
            continue
        idx = pf.schema_arrow.names.index(col)
        stats_ok = True
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                stats_ok = False
                break
            los.append(st.min)
            his.append(st.max)
        if stats_ok and los:
            fold(min(los), max(his))
        else:
            mm = pc.min_max(pf.read(columns=[col]).column(0))
            fold(mm["min"].as_py(), mm["max"].as_py())
    return mn, mx


class EowcTumbleAgg:
    """Emit-on-window-close tumbling-window aggregate (reference EOWC:
    `sort.rs:20` buffer + `over_window/eowc.rs:88`, EMIT ON WINDOW CLOSE
    MVs): rows buffer until the watermark (max event time − delay) passes
    the window end, then the window's aggregate is emitted exactly once
    (append-only output). Rows arriving for an already-closed window are
    LATE and dropped — the reference's WatermarkFilter policy
    (`watermark_filter.rs:34-36`).

    Buffer layout (round-12 optimization, guide §1.2/§2.4 — fewer jobs
    and no O(buffer) rewrite per batch): batches append as immutable
    chunk files; the watermark and the did-any-window-close decision come
    from the chunks' FOOTER min/max timestamp statistics (driver-side,
    zero Spark jobs — previously one agg job over buffer∪batch per
    batch). Emission scans only the chunks whose ts range overlaps the
    newly-closed window span (E, wm] — file-level pruning — and fully
    emitted chunks are garbage-collected instead of rewriting the
    surviving buffer every batch (previously one O(buffer) write per
    batch). Per-batch cost: ONE O(batch) chunk write, plus one pruned
    aggregation job only when windows actually close. State stays
    bounded by delay × arrival rate, same as before, via chunk GC.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        ts_col: str,
        window_duration: str,
        delay_seconds: int,
    ):
        self.spark = spark
        self.ts_col = ts_col
        self.window_duration = window_duration
        self._win_sec = _parse_duration_seconds(window_duration)
        self.delay_seconds = delay_seconds
        self.chunks_dir = os.path.join(state_dir, "buffer")
        # EOWC output is append-only by construction (each window emitted
        # exactly once) → one new emission dir per close, never rewritten
        self.out_path = os.path.join(state_dir, "out")
        self._emitted_any = os.path.isdir(self.out_path) and any(
            os.scandir(self.out_path)
        )
        self._watermark = None  # monotonic
        #: highest window end already emitted (windows ending at/before
        #: this are closed-and-emitted; late rows for them are dropped)
        self._emit_horizon = None
        # restart over an existing state dir: adopt surviving chunks
        # (ts ranges from footers — no Spark job) and resume numbering
        self._chunk_stats: dict[str, tuple] = {}  # path -> (min_ts, max_ts)
        self._n = 0
        if os.path.isdir(self.chunks_dir):
            for d in sorted(os.listdir(self.chunks_dir)):
                m = re.fullmatch(r"b(\d+)", d)
                if not m:
                    continue
                p = os.path.join(self.chunks_dir, d)
                mn, mx = _parquet_ts_minmax(p, ts_col)
                self._n = max(self._n, int(m.group(1)) + 1)
                if mx is None:
                    shutil.rmtree(p, ignore_errors=True)
                    continue
                self._chunk_stats[p] = (mn, mx)
        self._emit_n = _next_seq_index(self.out_path, "e")
        # explicit schemas for the chunk/output re-reads: parquet schema
        # inference is a (small) Spark job per read — the schemas are
        # already known driver-side, so skip those jobs entirely
        self._in_schema = None
        self._out_schema = None

    def _window_end(self, ts):
        """End of the tumble window containing `ts` (Spark window()
        alignment: origin 1970-01-01 UTC)."""
        import datetime

        epoch = datetime.datetime(1970, 1, 1, tzinfo=ts.tzinfo)
        off = (ts - epoch).total_seconds()
        return epoch + datetime.timedelta(
            seconds=((off // self._win_sec) + 1) * self._win_sec
        )

    def apply_batch(self, batch: DataFrame) -> None:
        import datetime

        chunk = os.path.join(self.chunks_dir, f"b{self._n}")
        self._n += 1
        if self._in_schema is None:
            self._in_schema = batch.schema  # driver-side analysis only
        batch.coalesce(4).write.mode("overwrite").parquet(chunk)
        mn, mx = _parquet_ts_minmax(chunk, self.ts_col)
        if mx is None:  # empty batch: drop the empty chunk, nothing to do
            shutil.rmtree(chunk, ignore_errors=True)
            return
        self._chunk_stats[chunk] = (mn, mx)
        wm = mx - datetime.timedelta(seconds=self.delay_seconds)
        if self._watermark is not None and wm < self._watermark:
            wm = self._watermark
        self._watermark = wm
        prev_horizon = self._emit_horizon

        # chunks that can hold rows of a newly-closed window (window end
        # in (prev_horizon, wm]): footer-range pruning — a chunk whose
        # LAST row's window already emitted, or whose FIRST row's window
        # is still open, contributes nothing; a stalled watermark
        # (wm <= horizon) closes nothing, so skip the emission job
        cand = (
            []
            if prev_horizon is not None and wm <= prev_horizon
            else [
                c
                for c, (cmn, cmx) in self._chunk_stats.items()
                if self._window_end(cmn) <= wm
                and (prev_horizon is None or self._window_end(cmx) > prev_horizon)
            ]
        )
        if cand:
            win = F.window(self.ts_col, self.window_duration)
            rows = self.spark.read.schema(self._in_schema).parquet(*cand)
            closing = F.col("__we") <= F.lit(wm)
            if prev_horizon is not None:
                closing = closing & (F.col("__we") > F.lit(prev_horizon))
            emitted = (
                rows.withColumn("__we", win.getField("end"))
                .filter(closing)
                .groupBy(win.getField("start").alias("ws"))
                .agg(F.count(F.lit(1)).alias("n"))
            )
            out_dir = os.path.join(self.out_path, f"e{self._emit_n}")
            self._emit_n += 1
            if self._out_schema is None:
                self._out_schema = emitted.schema
            emitted.coalesce(1).write.mode("overwrite").parquet(out_dir)
            if _parquet_rows(out_dir) > 0:
                self._emitted_any = True
            else:
                shutil.rmtree(out_dir, ignore_errors=True)
        # every window ending at/before wm is now emitted (or had no rows)
        self._emit_horizon = wm
        # GC chunks whose every row's window has emitted — the buffer
        # bound (delay × arrival rate), kept by file-level retention
        # instead of a per-batch rewrite
        for c, (_, cmx) in list(self._chunk_stats.items()):
            if self._window_end(cmx) <= wm:
                shutil.rmtree(c, ignore_errors=True)
                del self._chunk_stats[c]

    def feed(self, batch: DataFrame) -> None:
        """Drop late rows (event time behind the watermark), then fold."""
        if self._watermark is not None:
            batch = batch.filter(F.col(self.ts_col) >= F.lit(self._watermark))
        self.apply_batch(batch)

    def result(self) -> DataFrame:
        if not self._emitted_any:
            # nothing emitted yet (or only empty batches so far): return an
            # empty, correctly-typed frame instead of a path-not-found error
            return self.spark.createDataFrame([], "ws timestamp, n bigint")
        r = self.spark.read.option("recursiveFileLookup", "true")
        if self._out_schema is not None:
            r = r.schema(self._out_schema)
        return r.parquet(self.out_path)


class EowcAggMv:
    """EMIT ON WINDOW CLOSE aggregate MV — the SQL-surface runtime behind
    `CREATE MATERIALIZED VIEW ... FROM TUMBLE(t, ts, INTERVAL ...) GROUP
    BY window_start ... EMIT ON WINDOW CLOSE` over a table declaring
    `WATERMARK FOR ts AS ts - INTERVAL ...` (reference: watermark binding
    `src/frontend/src/binder/relation/watermark.rs`, EOWC plan
    enforcement `src/frontend/src/optimizer/mod.rs:474-630`, runtime
    sort buffer `src/stream/src/executor/sort.rs:20`).

    Semantics: rows buffer until the event-time watermark (max ts seen −
    delay, monotonic, DURABLE) passes their tumble window's end; each
    closed window's rows then run through `recompute` (the MV body over
    the closed rows, with window_start/window_end attached) and the
    result is APPENDED exactly once — closed rows leave the buffer, and
    late rows at/behind the watermark are dropped at the door
    (WatermarkFilter, `watermark_filter.rs:34-36`). Output is
    append-only by construction; deletes on the base table are rejected
    loudly (the reference requires an append-only input for EOWC).

    State = open-window rows only (bounded by delay × arrival rate) plus
    one durable watermark timestamp — the reference's sort-buffer state
    shape. Per-batch work is O(batch + closed rows), never O(history).

    Buffer layout (round-12, same design as EowcTumbleAgg): batches
    append as immutable chunk files; watermark advancement and the
    did-any-window-close decision come from the chunks' parquet footer
    min/max ts statistics (driver-side, no Spark job — previously one
    agg job over buffer∪batch per feed); emission reads only the chunks
    whose ts range overlaps the newly-closed span (prev-wm, wm], and
    fully-emitted chunks are GC'd instead of rewriting the surviving
    buffer every feed. Restart recovery needs no extra metadata: the
    durable WM file IS the emit horizon (everything at/before it was
    emitted) and chunk stats rebuild from the footers.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        ts_col: str,
        window_duration: str,
        delay_seconds: float,
        recompute,
        empty_input,
    ):
        self.spark = spark
        self.ts_col = ts_col
        self.window_duration = window_duration
        self._win_sec = _parse_duration_seconds(window_duration)
        self.delay_seconds = delay_seconds
        self.recompute = recompute
        self.empty_input = empty_input  # () -> empty typed input frame
        self.chunks_dir = os.path.join(state_dir, "buffer")
        self.out_path = os.path.join(state_dir, "out")
        self._emitted_any = os.path.isdir(self.out_path) and any(
            os.scandir(self.out_path)
        )
        self._wm_path = os.path.join(state_dir, "WM")
        self._watermark = self._read_wm()
        # restart recovery: open-window chunks are whatever chunk files
        # exist; their ts ranges come from the footers (no Spark job)
        self._chunk_stats: dict[str, tuple] = {}
        self._n = 0
        if os.path.isdir(self.chunks_dir):
            for d in sorted(os.listdir(self.chunks_dir)):
                m = re.fullmatch(r"b(\d+)", d)
                if not m:
                    continue
                p = os.path.join(self.chunks_dir, d)
                mn, mx = _parquet_ts_minmax(p, ts_col)
                if mx is None:
                    shutil.rmtree(p, ignore_errors=True)
                    continue
                self._chunk_stats[p] = (mn, mx)
                self._n = max(self._n, int(m.group(1)) + 1)
        self._in_schema = None
        self._out_schema = None
        self._emit_n = _next_seq_index(self.out_path, "e")
        self.downstream: list = []  # EOWC MVs have no retraction changelog
        # EOWC output is append-only by construction, so its changelog is
        # insert-only chunks — one per emission (the reference's
        # force_append_only sink path needs exactly this). Enabled by
        # CREATE SUBSCRIPTION / CREATE SINK like every other MV.
        self.changelog_dir = os.path.join(state_dir, "changelog")
        self.emit_changelog = False

    def exists(self) -> bool:
        return bool(
            self._emitted_any or self._chunk_stats or self._watermark is not None
        )

    def _read_wm(self):
        import datetime

        try:
            with open(self._wm_path) as f:
                return datetime.datetime.fromisoformat(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _write_wm(self) -> None:
        tmp = self._wm_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self._watermark.isoformat())
        os.replace(tmp, self._wm_path)

    def _annotate(self, df: DataFrame) -> DataFrame:
        win = F.window(self.ts_col, self.window_duration)
        return df.withColumn("window_start", win.getField("start")).withColumn(
            "window_end", win.getField("end")
        )

    def apply_batch(self, batch: DataFrame, batch_id: int | None = None, batch_ns: str | None = None) -> None:
        deletes = batch.where(f"`{OP_COL}` < 0")
        if not _statically_empty(deletes) and deletes.limit(1).count() > 0:
            raise ValueError(
                "EMIT ON WINDOW CLOSE requires an append-only input: "
                "DELETE/UPDATE on the base table cannot retract an "
                "already-emitted window (reference EOWC constraint)"
            )
        self.feed(batch.where(f"`{OP_COL}` > 0").drop(OP_COL))

    def _window_end(self, ts):
        """End of the tumble window containing `ts` (Spark window()
        alignment: origin 1970-01-01 UTC)."""
        import datetime

        epoch = datetime.datetime(1970, 1, 1, tzinfo=ts.tzinfo)
        off = (ts - epoch).total_seconds()
        return epoch + datetime.timedelta(
            seconds=((off // self._win_sec) + 1) * self._win_sec
        )

    def feed(self, batch: DataFrame) -> None:
        import datetime

        if self._watermark is not None:
            # WatermarkFilter: late rows at/behind the watermark dropped
            batch = batch.filter(F.col(self.ts_col) > F.lit(self._watermark))
        chunk = os.path.join(self.chunks_dir, f"b{self._n}")
        self._n += 1
        if self._in_schema is None:
            self._in_schema = batch.schema  # driver-side analysis only
        batch.coalesce(4).write.mode("overwrite").parquet(chunk)
        mn, mx = _parquet_ts_minmax(chunk, self.ts_col)
        if mx is None:  # empty batch: drop the empty chunk, nothing to do
            shutil.rmtree(chunk, ignore_errors=True)
            return
        self._chunk_stats[chunk] = (mn, mx)
        prev_wm = self._watermark
        wm = mx - datetime.timedelta(seconds=self.delay_seconds)
        if prev_wm is not None and wm < prev_wm:
            wm = prev_wm
        self._watermark = wm

        # chunks that can hold rows of a newly-closed window (end in
        # (prev_wm, wm]): footer-range pruning, no Spark job; a stalled
        # watermark (wm <= prev_wm) closes nothing — skip the emission
        cand = (
            []
            if prev_wm is not None and wm <= prev_wm
            else [
                c
                for c, (cmn, cmx) in self._chunk_stats.items()
                if self._window_end(cmn) <= wm
                and (prev_wm is None or self._window_end(cmx) > prev_wm)
            ]
        )
        if cand:
            rows = self.spark.read.schema(self._in_schema).parquet(*cand)
            annotated = self._annotate(rows)
            closing = F.col("window_end") <= F.lit(wm)
            if prev_wm is not None:
                closing = closing & (F.col("window_end") > F.lit(prev_wm))
            out = self.recompute(annotated.filter(closing))
            if self.emit_changelog:
                # one insert-only chunk per emission; chunk index = count
                # of existing chunks (idempotent overwrite on redelivery)
                out = out.localCheckpoint(eager=True)
                k = 0
                while os.path.isdir(os.path.join(self.changelog_dir, f"c{k}")):
                    k += 1
                with_ops(out, 1).coalesce(2).write.mode("overwrite").parquet(
                    os.path.join(self.changelog_dir, f"c{k}")
                )
            out_dir = os.path.join(self.out_path, f"e{self._emit_n}")
            self._emit_n += 1
            if self._out_schema is None:
                self._out_schema = out.schema
            out.coalesce(2).write.mode("overwrite").parquet(out_dir)
            if _parquet_rows(out_dir) > 0:
                self._emitted_any = True
            else:
                shutil.rmtree(out_dir, ignore_errors=True)
        # WM durability AFTER the emission write: the stored WM doubles
        # as the emit horizon on restart, so a crash between the two must
        # leave the OLD horizon in place — the un-emitted span's chunks
        # survive (GC below also gates on it) and the next feed re-runs
        # the emission, exactly the old buffer's at-least-once recovery.
        self._write_wm()
        # GC chunks whose every row's window has emitted (file-level
        # retention instead of the previous per-feed buffer rewrite)
        for c, (_, cmx) in list(self._chunk_stats.items()):
            if self._window_end(cmx) <= wm:
                shutil.rmtree(c, ignore_errors=True)
                del self._chunk_stats[c]

    def result(self) -> DataFrame:
        if not self._emitted_any:
            # typed empty frame: the MV body over zero input rows
            return self.recompute(self._annotate(self.empty_input())).limit(0)
        r = self.spark.read.option("recursiveFileLookup", "true")
        if self._out_schema is not None:
            r = r.schema(self._out_schema)
        return r.parquet(self.out_path)


def stream_to_mv(
    source: DataFrame,
    mv: MaterializedGroupAgg,
    checkpoint_dir: str,
    query_name: str = "mv_stream",
):
    """Attach the MV to a streaming source: each micro-batch becomes an
    insert-only changelog chunk (retractions arrive via CDC-style sources
    that carry their own op column — pass them through unchanged)."""

    def sink(batch_df: DataFrame, batch_id: int):
        if OP_COL not in batch_df.columns:
            batch_df = with_ops(batch_df, 1)
        mv.apply_batch(batch_df, batch_id=batch_id)

    return (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
