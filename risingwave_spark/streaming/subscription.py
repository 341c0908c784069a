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


class Subscription:
    """Durable named cursor over an MV changelog directory."""

    def __init__(
        self,
        spark: SparkSession,
        changelog_dir: str,
        name: str,
        from_beginning: bool = False,
    ):
        self.spark = spark
        self.dir = changelog_dir
        self.name = name
        os.makedirs(changelog_dir, exist_ok=True)
        self._cursor_file = os.path.join(changelog_dir, f"CURSOR_{name}")
        if not os.path.exists(self._cursor_file):
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
