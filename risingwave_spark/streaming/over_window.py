"""Frame-delta over-window MV — the reference's OverWindow general
executor with delta-based affected-range recompute
(`src/stream/src/executor/over_window/general.rs:48` +
`over_window/frame_finder.rs`): a change at order-position p in a
partition only dirties the rows whose frames can SEE p. For
backward-looking functions (row_number, lag, running aggregates —
frames ending at CURRENT ROW), that is exactly the rows at positions
>= p, and their new values are computable from the suffix alone plus a
per-partition SEED carried out of the untouched prefix (the MV already
stores the prefix's outputs — no state scan needed).

Per-batch cost: O(suffix rows of touched partitions), not O(partition).
A batch appending recent-timestamp rows — the realistic streaming shape
— recomputes only the new tail of each partition, even when every
partition is touched.

Functions are declared, not arbitrary (the reference's frame_finder is
equally per-function-kind):

    funcs={"rn": ("row_number",),
           "prev": ("lag", "value"),
           "cum": ("sum", "value")}

Forward-looking functions (lead, following frames) would need the
affected range extended BACKWARD by the frame reach; not supported here
— constructing one raises.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from risingwave_spark.streaming.mv import (
    ChunkedState,
    OP_COL,
    _BucketedMvTable,
    buckets_from_chunks,
    nullsafe_cond,
)

_KINDS = {"row_number", "lag", "sum"}


def _lex_lt(left: DataFrame, right: DataFrame, cols: list[str], rcols: list[str]):
    """left.(cols) < right.(rcols), lexicographically."""
    cond = None
    for i in range(len(cols)):
        eq_prefix = None
        for j in range(i):
            e = left[cols[j]] == right[rcols[j]]
            eq_prefix = e if eq_prefix is None else (eq_prefix & e)
        lt = left[cols[i]] < right[rcols[i]]
        term = lt if eq_prefix is None else (eq_prefix & lt)
        cond = term if cond is None else (cond | term)
    return cond


class MaterializedOverWindowDelta:
    """Incrementally-maintained window-function MV with retraction and
    FRAME-DELTA recompute. Output = payload columns + one column per
    declared function."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        order_cols: list[str],
        row_id: str,
        funcs: dict[str, tuple],
        payload_cols: list[str],
    ):
        for name, spec in funcs.items():
            if spec[0] not in _KINDS:
                raise ValueError(
                    f"unsupported window function {spec[0]!r} for frame-delta "
                    "maintenance (backward-looking only: row_number/lag/sum)"
                )
        self.spark = spark
        self.keys = keys
        self.order_cols = order_cols
        self.funcs = funcs
        self.payload_cols = payload_cols
        self.state = ChunkedState(spark, os.path.join(state_dir, "state"), row_id)
        self.mv = _BucketedMvTable(spark, os.path.join(state_dir, "mv"), keys)
        #: set track_recompute=True to record how many rows entered each
        #: window recompute (the frame-delta efficiency claim, asserted in
        #: tests; costs one count job per batch, so off by default)
        self.track_recompute = False
        self.last_recompute_rows: int | None = None

    # ------------------------------------------------------------ internals
    def _window_outputs(self, rows: DataFrame, seeds: DataFrame | None) -> DataFrame:
        """Window functions over `rows` (a per-partition ORDER SUFFIX),
        seeded with the prefix's carried-out state when present."""
        w = W.partitionBy(*self.keys).orderBy(*[F.asc(c) for c in self.order_cols])
        if seeds is not None:
            rows = rows.join(seeds, on=self.keys, how="left")
        local_rn = F.row_number().over(w)
        out_cols = [*self.keys, *self.order_cols]
        out_cols = list(dict.fromkeys(out_cols + self.payload_cols))
        proj = [F.col(c) for c in out_cols]
        for name, spec in self.funcs.items():
            kind = spec[0]
            if kind == "row_number":
                seed = F.coalesce(F.col(f"__seed_{name}"), F.lit(0)) if seeds is not None else F.lit(0)
                proj.append((local_rn + seed).alias(name))
            elif kind == "lag":
                src = F.col(spec[1])
                lag_local = F.lag(src).over(w)
                if seeds is not None:
                    # only the FIRST suffix row takes the seed — a null
                    # from lag() further in may be a genuine null value
                    proj.append(
                        F.when(local_rn == 1, F.col(f"__seed_{name}"))
                        .otherwise(lag_local)
                        .alias(name)
                    )
                else:
                    proj.append(lag_local.alias(name))
            elif kind == "sum":
                src = F.col(spec[1])
                run = F.sum(src).over(
                    w.rowsBetween(W.unboundedPreceding, W.currentRow)
                )
                seed = F.coalesce(F.col(f"__seed_{name}"), F.lit(0)) if seeds is not None else F.lit(0)
                proj.append((run + seed).alias(name))
        return rows.select(*proj)

    def _seeds(self, prefix: DataFrame) -> DataFrame:
        """Per-partition carried-out state = the prefix's LAST row's
        outputs (rn → offset, lag source → next row's lag, sum → base)."""
        wlast = W.partitionBy(*self.keys).orderBy(
            *[F.desc(c) for c in self.order_cols]
        )
        last = (
            prefix.withColumn("__last_rn", F.row_number().over(wlast))
            .filter(F.col("__last_rn") == 1)
        )
        sel = [F.col(k) for k in self.keys]
        for name, spec in self.funcs.items():
            kind = spec[0]
            if kind == "row_number":
                sel.append(F.col(name).alias(f"__seed_{name}"))
            elif kind == "lag":
                sel.append(F.col(spec[1]).alias(f"__seed_{name}"))
            elif kind == "sum":
                sel.append(F.col(name).alias(f"__seed_{name}"))
        return last.select(*sel)

    # ------------------------------------------------------------ main loop
    def apply_batch(self, batch: DataFrame) -> None:
        cols = [c for c in batch.columns if c != OP_COL]
        inserts = batch.filter(F.col(OP_COL) > 0).select(*cols)
        deletes = batch.filter(F.col(OP_COL) < 0).select(*cols)
        self.state.fold(inserts, deletes, tomb_extra_cols=self.keys)

        # per-partition frame boundary: the EARLIEST order position the
        # batch touches (insert or delete) — frames at positions before it
        # cannot see the change (frame_finder's affected-range start).
        # Checkpointed eagerly: it is tiny (one row per touched partition),
        # is reused by three plan branches, and a materialized copy breaks
        # the self-join lineage that trips ambiguous-column detection.
        bcols = [f"__b{i}" for i in range(len(self.order_cols))]
        kcols = [f"__bk{i}" for i in range(len(self.keys))]
        boundaries = (
            batch.groupBy(*self.keys)
            .agg(F.min(F.struct(*self.order_cols)).alias("__b"))
            .select(
                # fresh names (and expr-ids) so joining boundaries against
                # frames that also descend from `batch` stays unambiguous
                *[F.col(k).alias(bk) for k, bk in zip(self.keys, kcols)],
                *[F.col(f"__b.{c}").alias(b) for c, b in zip(self.order_cols, bcols)],
            )
            .withColumn("__aff", F.lit(1))
            .localCheckpoint(eager=True)
        )
        affected = boundaries.select(
            *[F.col(bk).alias(k) for bk, k in zip(kcols, self.keys)]
        )

        def fresh(df: DataFrame) -> DataFrame:
            # per-join-site copy with new expression ids — the prefix and
            # suffix branches each join `boundaries` and later meet in one
            # plan (suffix ⋈ seeds); shared ids would be flagged ambiguous
            return df.select(*[F.col(c).alias(c) for c in df.columns])

        st = self.state.read()
        st_aff = st.join(affected, nullsafe_cond(st, affected, self.keys), "left_semi")

        if not self.mv.exists():
            out = self._window_outputs(st_aff, None)
            if self.track_recompute:
                self.last_recompute_rows = st_aff.count()
            self.mv.write(out)
            return

        touched = buckets_from_chunks(self.state, self.keys, self.mv.n_buckets)
        if touched is None:
            touched = self.mv.touched_buckets(affected)
        prev_t = self.mv.read_buckets(touched)
        # ONE left-join splits the previous rows three ways: untouched
        # partition (no boundary), prefix (before boundary), suffix
        # (dropped — replaced by the recompute). Untouched ∪ prefix keep
        # their stored values and share one scan/filter branch.
        b_prev = fresh(boundaries)
        jprev = prev_t.join(
            b_prev, nullsafe_cond(prev_t, b_prev, self.keys, kcols), "left"
        )
        keep_cols = list(prev_t.columns)
        is_prefix = _lex_lt(prev_t, b_prev, self.order_cols, bcols)
        kept_rows = jprev.filter(
            b_prev["__aff"].isNull() | is_prefix
        ).select(*[prev_t[c] for c in keep_cols])
        prefix_rows = jprev.filter(
            (b_prev["__aff"] == 1) & is_prefix
        ).select(*[prev_t[c] for c in keep_cols])
        seeds = self._seeds(prefix_rows)

        # suffix of the CURRENT state: rows at/after the boundary
        b_suf = fresh(boundaries)
        jsuf = st_aff.join(
            b_suf, nullsafe_cond(st_aff, b_suf, self.keys, kcols), "inner"
        )
        suffix_rows = jsuf.filter(
            ~_lex_lt(st_aff, b_suf, self.order_cols, bcols)
        ).select(*[st_aff[c] for c in st_aff.columns])
        if self.track_recompute:
            self.last_recompute_rows = suffix_rows.count()
        suffix_out = self._window_outputs(suffix_rows, seeds)

        self.mv.overwrite_buckets(kept_rows.unionByName(suffix_out), touched)

    def result(self) -> DataFrame:
        return self.mv.read()


class EowcOverWindow:
    """Emit-on-window-close over-window (reference EowcOverWindowExecutor,
    `src/stream/src/executor/over_window/eowc.rs:88`): rows buffer until
    the event-time watermark passes them, then leave the buffer exactly
    once with their window-function outputs attached (append-only
    downstream). Because emission happens in event-time order, each
    partition's functions continue from a carried SEED (the last emitted
    row's outputs) — per-partition O(1) state plus the bounded buffer,
    the same state shape as the reference's sort buffer + partition
    states.

    Same declared-function set as MaterializedOverWindowDelta
    (backward-looking: row_number / lag / running sum)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        ts_col: str,
        order_cols: list[str],
        row_id: str,
        funcs: dict[str, tuple],
        payload_cols: list[str],
        delay_seconds: int,
    ):
        from risingwave_spark.streaming.mv import _VersionedTable

        for name, spec in funcs.items():
            if spec[0] not in _KINDS:
                raise ValueError(f"unsupported EOWC window function {spec[0]!r}")
        self.spark = spark
        self.keys = keys
        self.ts_col = ts_col
        self.order_cols = order_cols
        self.funcs = funcs
        self.payload_cols = payload_cols
        self.delay_seconds = delay_seconds
        self.buffer = _VersionedTable(spark, os.path.join(state_dir, "buffer"))
        self.seeds = _VersionedTable(spark, os.path.join(state_dir, "seeds"))
        self.out_path = os.path.join(state_dir, "out")
        self._emitted_any = os.path.isdir(self.out_path)
        self._watermark = None
        self._out_schema = None

    def _delta(self):  # shares the seeded window-output machinery
        d = MaterializedOverWindowDelta.__new__(MaterializedOverWindowDelta)
        d.keys, d.order_cols = self.keys, self.order_cols
        d.funcs, d.payload_cols = self.funcs, self.payload_cols
        return d

    def feed(self, batch: DataFrame) -> None:
        import datetime

        if self._watermark is not None:
            # late rows at/behind the watermark are dropped (WatermarkFilter;
            # strictly `>` — everything <= wm has already been emitted, and
            # re-emitting a ts==wm row would break the seed continuation)
            batch = batch.filter(F.col(self.ts_col) > F.lit(self._watermark))
        buf = batch
        if self.buffer.exists():
            buf = self.buffer.read().unionByName(batch)
        mx = buf.agg(F.max(self.ts_col)).first()[0]
        if mx is None:
            return
        wm = mx - datetime.timedelta(seconds=self.delay_seconds)
        if self._watermark is not None and wm < self._watermark:
            wm = self._watermark
        self._watermark = wm

        closed = buf.filter(F.col(self.ts_col) <= F.lit(wm))
        still_open = buf.filter(F.col(self.ts_col) > F.lit(wm))
        seeds = self.seeds.read() if self.seeds.exists() else None
        delta = self._delta()
        out = delta._window_outputs(closed, seeds)
        # the write below evaluates `out`; persist so the seed update
        # doesn't recompute the closed-window functions a second time
        out = out.localCheckpoint(eager=True)
        if self._out_schema is None:
            self._out_schema = out.schema
        out.coalesce(2).write.mode("append").parquet(self.out_path)
        self._emitted_any = True
        # carry-out: last emitted row's outputs per partition become the
        # next emission's seeds (merged over previous seeds)
        new_seeds = delta._seeds(out)
        if seeds is not None:
            stale = seeds.join(
                new_seeds.select(*self.keys), on=self.keys, how="left_anti"
            )
            new_seeds = stale.unionByName(new_seeds)
        self.seeds.write(new_seeds)
        self.buffer.write(still_open)

    def result(self) -> DataFrame:
        if not self._emitted_any:
            raise ValueError("nothing emitted yet")
        return self.spark.read.parquet(self.out_path)
