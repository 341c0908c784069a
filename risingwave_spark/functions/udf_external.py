"""External UDF runtime — Arrow-IPC round-trip to a user-owned server
process.

The reference supports UDFs hosted OUTSIDE the engine: an Arrow Flight
server the engine calls per batch
(`/root/reference/src/expr/impl/src/udf/external.rs` — the
`arrow-udf-runtime` flight client; JS/WASM live next to it in
`udf/{quickjs,wasm}.rs`). This sandbox has no Flight endpoint or
JS/WASM runtimes, but the CONTRACT — engine ships an Arrow record
batch to a foreign process, gets an Arrow batch back — is fully
implementable over OS pipes: the client below spawns (once per
executor, cached) the user's server command and exchanges
length-prefixed Arrow IPC stream frames on stdin/stdout. A real
deployment swaps the pipe transport for Flight without touching the
Spark side.

Scale posture: the exchange is per ARROW BATCH (pandas_udf batching),
never per row; one server process per executor core, living for the
executor's lifetime — the same amortization as the reference's
connection-pooled flight client.

JS / WASM runtimes remain honestly gated: no quickjs/wasmtime in the
container. An external server MAY of course be a Node/WASM host — that
is exactly the deployment story this runtime enables.
"""

from __future__ import annotations

SERVER_TEMPLATE = '''\
import struct, sys
import pyarrow as pa
import pyarrow.ipc as ipc

def serve(handle):
    """Loop: length-prefixed Arrow IPC frames in on stdin, out on stdout."""
    stdin, stdout = sys.stdin.buffer, sys.stdout.buffer
    while True:
        hdr = stdin.read(4)
        if len(hdr) < 4:
            return
        (n,) = struct.unpack("<I", hdr)
        tbl = ipc.open_stream(pa.BufferReader(stdin.read(n))).read_all()
        out = handle(tbl)
        sink = pa.BufferOutputStream()
        w = ipc.new_stream(sink, out.schema)
        w.write_table(out)
        w.close()
        b = sink.getvalue().to_pybytes()
        stdout.write(struct.pack("<I", len(b)))
        stdout.write(b)
        stdout.flush()
'''


def external_pandas_udf(cmd: str, ret_type: str):
    """A Spark pandas UDF whose evaluation is delegated to the external
    server started by `cmd` (a standalone process — the reference's
    CREATE FUNCTION ... AS ... USING LINK 'flight://...' analog).

    The server receives each Arrow batch as an IPC frame with columns
    c0..cN and must reply with a one-column Arrow table of `ret_type`
    values, row-aligned. Server processes are cached per executor and
    restarted on death; a dead/broken server surfaces as a loud task
    error, not silent nulls.
    """
    from pyspark.sql.functions import pandas_udf

    def _eval(*cols):
        # self-contained (stdlib + pyarrow only): serialized by value so
        # workers never need this package importable
        import builtins
        import struct
        import subprocess

        import pyarrow as pa
        import pyarrow.ipc as ipc

        procs = getattr(builtins, "__rw_ext_udf_procs", None)
        if procs is None:
            procs = {}
            setattr(builtins, "__rw_ext_udf_procs", procs)
        p = procs.get(cmd)
        if p is None or p.poll() is not None:
            p = subprocess.Popen(
                cmd,
                shell=True,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
            )
            procs[cmd] = p
        tbl = pa.table(
            {f"c{i}": pa.Array.from_pandas(s) for i, s in enumerate(cols)}
        )
        sink = pa.BufferOutputStream()
        w = ipc.new_stream(sink, tbl.schema)
        w.write_table(tbl)
        w.close()
        buf = sink.getvalue().to_pybytes()
        p.stdin.write(struct.pack("<I", len(buf)))
        p.stdin.write(buf)
        p.stdin.flush()
        hdr = p.stdout.read(4)
        if len(hdr) < 4:
            raise RuntimeError(f"external UDF server exited: {cmd!r}")
        (n,) = struct.unpack("<I", hdr)
        out = ipc.open_stream(pa.BufferReader(p.stdout.read(n))).read_all()
        if out.num_rows != tbl.num_rows:
            raise RuntimeError(
                f"external UDF returned {out.num_rows} rows for {tbl.num_rows}"
            )
        return out.column(0).to_pandas()

    return pandas_udf(ret_type)(_eval)


def write_server_script(path: str, handle_body: str) -> None:
    """Write a STANDALONE server script: the serve loop + the user's
    `handle(tbl) -> pa.Table` body (no engine imports — an external
    server owns its own environment, exactly like the reference's)."""
    with open(path, "w") as f:
        f.write(SERVER_TEMPLATE)
        f.write("\n")
        f.write(handle_body)
        f.write("\n\nserve(handle)\n")
