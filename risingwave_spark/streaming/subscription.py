"""Subscription cursors — the reference's CREATE SUBSCRIPTION / DECLARE
... CURSOR FOR / FETCH surface (`src/frontend/src/handler/
create_subscription.rs`, `declare_cursor.rs`; changelog op column
`changelog.rs:26`): a consumer reads an MV's changelog incrementally,
exactly-once, resuming after restarts from a durable named cursor.

The MV side persists one changelog chunk per batch (mv.py
`_log_changelog`, −1/+1 Update pairs). A Subscription is just a named
ack pointer file over that chunk sequence: `fetch()` returns everything
past the pointer plus an ack token; `ack(token)` flips the pointer
(os.replace, atomic). Crash between fetch and ack → the same chunks are
redelivered — at-least-once delivery with exactly-once EFFECT once acks
are transactional with the consumer's own sink, exactly the reference's
cursor contract.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def oldest_chunk_ts_ms(changelog_dir: str) -> int | None:
    """Commit ts of the oldest retained chunk (None when log is empty) —
    the retention lower bound a raw SINCE timestamp checks against."""
    try:
        ids = sorted(
            int(m.group(1))
            for d in os.listdir(changelog_dir)
            if (m := re.fullmatch(r"c(\d+)", d))
        )
    except FileNotFoundError:
        return None
    if not ids:
        return None
    d = os.path.join(changelog_dir, f"c{ids[0]}")
    try:
        with open(os.path.join(d, "_COMMIT_TS_MS")) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return int(os.path.getmtime(d) * 1000)


class Subscription:
    """Durable named cursor over an MV changelog directory."""

    def __init__(
        self,
        spark: SparkSession,
        changelog_dir: str,
        name: str,
        from_beginning: bool = False,
        since_ts_ms: int | None = None,
    ):
        self.spark = spark
        self.dir = changelog_dir
        self.name = name
        os.makedirs(changelog_dir, exist_ok=True)
        self._cursor_file = os.path.join(changelog_dir, f"CURSOR_{name}")
        if not os.path.exists(self._cursor_file):
            if since_ts_ms is not None:
                # reference Since::TimestampMsNum: deliver every chunk
                # whose commit ts >= the asked timestamp → the pointer
                # parks on the last OLDER chunk
                init = max(
                    (c for c in self._chunk_ids() if self.chunk_ts_ms(c) < since_ts_ms),
                    default=-1,
                )
            else:
                # new subscription: start at creation time (reference
                # subscriptions see changes AFTER creation), or from the
                # retained log start when asked
                init = -1 if from_beginning else max(self._chunk_ids(), default=-1)
            self._write_cursor(init)

    def _chunk_ids(self) -> list[int]:
        return sorted(
            int(m.group(1))
            for d in os.listdir(self.dir)
            if (m := re.fullmatch(r"c(\d+)", d))
        )

    def chunk_ts_ms(self, c: int) -> int:
        """Commit timestamp of chunk c: the _COMMIT_TS_MS marker the MV
        writes at log time, falling back to directory mtime for chunks
        logged before the marker existed."""
        d = os.path.join(self.dir, f"c{c}")
        try:
            with open(os.path.join(d, "_COMMIT_TS_MS")) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return int(os.path.getmtime(d) * 1000)

    def _read_cursor(self) -> int:
        with open(self._cursor_file) as f:
            return int(f.read().strip())

    def _write_cursor(self, v: int) -> None:
        tmp = self._cursor_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._cursor_file)

    def fetch(self) -> tuple[DataFrame, int] | None:
        """Pending changelog chunks past the cursor, oldest first, as one
        frame with an `__chunk` sequence column; plus the ack token.
        None when fully caught up."""
        acked = self._read_cursor()
        pending = [c for c in self._chunk_ids() if c > acked]
        if not pending:
            return None
        from pyspark.sql import functions as F

        out = None
        for c in pending:
            d = self.spark.read.parquet(os.path.join(self.dir, f"c{c}")).withColumn(
                "__chunk", F.lit(c)
            )
            out = d if out is None else out.unionByName(d)
        return out, pending[-1]

    def ack(self, token: int) -> None:
        """Commit consumption up to and including `token`."""
        if token > self._read_cursor():
            self._write_cursor(token)
