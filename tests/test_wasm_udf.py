"""LANGUAGE wasm UDFs: a pure-Python interpreter executing genuine
WebAssembly bytecode (reference `src/expr/impl/src/udf/wasm.rs` runs
the same modules under wasmtime; the ABI divergence is documented in
functions/wasm_runtime.py)."""

from __future__ import annotations

import base64
import tempfile

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.functions.wasm_runtime import (
    WasmModule,
    WasmTrap,
    build_module,
)

ADD = b"\x20\x00\x20\x01\x7c"  # i64.add
FACT = (
    b"\x42\x01\x21\x01"
    b"\x02\x40\x03\x40"
    b"\x20\x00\x50\x0d\x01"
    b"\x20\x01\x20\x00\x7e\x21\x01"
    b"\x20\x00\x42\x01\x7d\x21\x00"
    b"\x0c\x00\x0b\x0b"
    b"\x20\x01"
)
FIB = (
    b"\x20\x00\x42\x02\x53"
    b"\x04\x40\x20\x00\x0f\x0b"
    b"\x20\x00\x42\x01\x7d\x10\x02"
    b"\x20\x00\x42\x02\x7d\x10\x02"
    b"\x7c"
)
HYP = b"\x20\x00\x20\x00\xa2\x20\x01\x20\x01\xa2\xa0\x9f"
DIV = b"\x20\x00\x20\x01\x7f"  # i64.div_s


def _module():
    return build_module([
        {"name": "wadd", "params": ["i64", "i64"], "results": ["i64"],
         "body": ADD},
        {"name": "fact", "params": ["i64"], "results": ["i64"],
         "locals": ["i64"], "body": FACT},
        {"name": "fib", "params": ["i64"], "results": ["i64"],
         "body": FIB},
        {"name": "hyp", "params": ["f64", "f64"], "results": ["f64"],
         "body": HYP},
        {"name": "idiv", "params": ["i64", "i64"], "results": ["i64"],
         "body": DIV},
    ])


def test_interpreter_core():
    m = WasmModule(_module())
    assert m.invoke("wadd", 3, 4) == 7
    assert m.invoke("wadd", -5, 2) == -3  # two's complement round-trip
    assert m.invoke("fact", 10) == 3628800  # loop + br_if + br
    assert m.invoke("fib", 15) == 610  # recursion (call) + if/return
    assert m.invoke("hyp", 3.0, 4.0) == 5.0  # f64 mul/add/sqrt
    assert m.invoke("idiv", -7, 2) == -3  # div_s truncates toward zero
    with pytest.raises(WasmTrap, match="divide by zero"):
        m.invoke("idiv", 1, 0)
    with pytest.raises(ValueError, match="exports"):
        m.invoke("ghost")


def test_interpreter_wraps_like_hardware():
    # i64.add must wrap at 2^64 (python ints don't — the mask does)
    m = WasmModule(_module())
    assert m.invoke("wadd", (1 << 63) - 1, 1) == -(1 << 63)


def test_fuel_traps_infinite_loop():
    # `loop br 0` spins forever — the instruction budget must trap it
    # instead of hanging the executor (wasmtime's fuel analogue)
    spin = build_module([
        {"name": "spin", "params": ["i64"], "results": ["i64"],
         "body": b"\x03\x40\x0c\x00\x0b\x20\x00"}  # loop br 0 end
    ])
    m = WasmModule(spin)
    with pytest.raises(WasmTrap, match="fuel"):
        m.invoke("spin", 1)
    # fuel resets per invoke: a legit call after the trap still works
    m2 = WasmModule(_module())
    with pytest.raises(WasmTrap, match="fuel"):
        WasmModule(spin).invoke("spin", 1)
    assert m2.invoke("fact", 10) == 3628800


def test_call_depth_bound():
    # f(x) = f(x) — unbounded recursion traps, not RecursionError
    rec = build_module([
        {"name": "rec", "params": ["i64"], "results": ["i64"],
         "body": b"\x20\x00\x10\x00"}  # local.get 0; call 0
    ])
    with pytest.raises(WasmTrap, match="call stack"):
        WasmModule(rec).invoke("rec", 1)


def test_trunc_traps_per_spec():
    # i64.trunc_f64_s (0xb0) on NaN / inf / out-of-range must TRAP
    # (spec 4.3.2.2), not raise a bare python error
    t = build_module([
        {"name": "t", "params": ["f64"], "results": ["i64"],
         "body": b"\x20\x00\xb0"},
        {"name": "t32", "params": ["f64"], "results": ["i32"],
         "body": b"\x20\x00\xaa"},
    ])
    m = WasmModule(t)
    assert m.invoke("t", 3.9) == 3
    assert m.invoke("t", -3.9) == -3
    with pytest.raises(WasmTrap, match="invalid conversion"):
        m.invoke("t", float("nan"))
    with pytest.raises(WasmTrap, match="overflow"):
        m.invoke("t", float("inf"))
    with pytest.raises(WasmTrap, match="overflow"):
        m.invoke("t", 1e300)
    assert m.invoke("t32", 2147483647.0 - 0.5) == 2147483646
    with pytest.raises(WasmTrap, match="overflow"):
        m.invoke("t32", 2147483648.0)


def test_f32_rounds_through_binary32():
    # f32.add (0x92) must produce the binary32 result, not the f64 one:
    # 0.1f + 0.2f in binary32 is 0.30000001192092896, not 0.30000000000000004
    import struct as _struct

    add32 = build_module([
        {"name": "a32", "params": ["f32", "f32"], "results": ["f32"],
         "body": b"\x20\x00\x20\x01\x92"},
    ])
    m = WasmModule(add32)
    f32 = lambda v: _struct.unpack("<f", _struct.pack("<f", v))[0]
    got = m.invoke("a32", f32(0.1), f32(0.2))
    assert got == f32(f32(0.1) + f32(0.2))
    assert got != f32(0.1) + f32(0.2)  # the raw f64 sum differs


def test_rejects_imports_and_unknown_opcodes():
    mod = bytearray(_module())
    # splice an import section in front of the type section
    imports = b"\x02\x05\x01\x01a\x01b"  # malformed-but-counted vector
    full = mod[:8] + imports + mod[8:]
    with pytest.raises(NotImplementedError, match="imports"):
        WasmModule(bytes(full))
    bad = build_module([
        {"name": "m", "params": ["i64"], "results": ["i64"],
         "body": b"\x23\x00\x20\x00"}  # global.get (no globals support)
    ])
    with pytest.raises(NotImplementedError, match="0x23"):
        WasmModule(bad)


def test_sql_surface_and_mv(spark):
    b64 = base64.b64encode(_module()).decode()
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_wasm_t_"))
    eng.sql(
        f"CREATE FUNCTION wadd(a int8, b int8) RETURNS int8 "
        f"LANGUAGE wasm USING BASE64 '{b64}'"
    )
    row = eng.sql("SELECT wadd(20, 22) AS x, wadd(NULL, 1) AS y").first()
    assert row.x == 42 and row.y is None  # strict NULL semantics
    eng.sql("CREATE TABLE wt (id int8 PRIMARY KEY, v int8)")
    eng.sql("INSERT INTO wt VALUES (1, 10), (2, 20)")
    eng.sql(
        "CREATE MATERIALIZED VIEW wmv AS "
        "SELECT id, wadd(v, 100) AS w FROM wt")
    eng.sql("INSERT INTO wt VALUES (3, 30)")
    got = [(r.id, r.w) for r in
           eng.sql("SELECT * FROM wmv ORDER BY id").collect()]
    assert got == [(1, 110), (2, 120), (3, 130)]
    # arity mismatch fails at CREATE, not first call (fact is unary)
    with pytest.raises(ValueError, match="declares 2"):
        eng.sql(
            f"CREATE FUNCTION fact(a int8, b int8) RETURNS int8 "
            f"LANGUAGE wasm AS '{b64}'"
        )
    # unknown export also fails at CREATE
    with pytest.raises(ValueError, match="exports"):
        eng.sql(
            f"CREATE FUNCTION wghost(a int8) RETURNS int8 "
            f"LANGUAGE wasm AS '{b64}'"
        )
    # the function appears in the catalog with its language
    rows = eng.sql(
        "SELECT name, language FROM rw_functions WHERE name = 'wadd'"
    ).collect()
    assert rows[0].language == "wasm"


def test_linear_memory_opcodes():
    # load/store round-trip + memory.size/grow + bounds trap, over a
    # module with a real memory section and an active data segment
    body_load = b"\x20\x00\x28\x00\x00"  # i32.load(ptr)
    # st(ptr, v): i32.store(ptr, v) with offset=4, then load it back
    body_store = (b"\x20\x00\x20\x01\x36\x00\x04"
                  b"\x20\x00\x28\x00\x04")
    mod = build_module([
        {"name": "ld", "params": ["i32"], "results": ["i32"],
         "body": body_load},
        {"name": "st", "params": ["i32", "i32"], "results": ["i32"],
         "body": body_store},
    ], memory=1, data=[(8, (1234567).to_bytes(4, "little") + b"AB")])
    m = WasmModule(mod)
    assert m.invoke("ld", 8) == 1234567
    assert m.data_end == 14
    assert m.invoke("st", 100, -5) == -5  # sign round-trips through i32
    assert m.invoke("ld", 104) == -5  # offset immediate landed at ptr+4
    with pytest.raises(WasmTrap, match="out of bounds"):
        m.invoke("ld", 65534)
    # memory.grow extends the trap boundary
    assert m.grow(1) == 1
    assert m.invoke("ld", 65534) == 0
    assert m.grow(10**6) == -1  # past max → -1, not an exception


def test_negative_data_segment_offset_traps():
    # i32.const offsets decode signed (sleb): a negative offset must
    # be rejected as out-of-bounds at instantiation, not write through
    # a negative bytearray slice into the END of linear memory
    mod = build_module([
        {"name": "ld", "params": ["i32"], "results": ["i32"],
         "body": b"\x20\x00\x28\x00\x00"},
    ], memory=1, data=[(-8, b"CORRUPTME")])
    with pytest.raises(ValueError, match="out of memory bounds"):
        WasmModule(mod)
    # and the end of memory is reachable + zero via a good module
    m = WasmModule(build_module([
        {"name": "ld", "params": ["i32"], "results": ["i32"],
         "body": b"\x20\x00\x28\x00\x00"},
    ], memory=1, data=[(0, b"ok")]))
    assert m.invoke("ld", 65532) == 0


def test_string_abi_upper_and_growth():
    from risingwave_spark.functions.wasm_runtime import build_ascii_upper

    m = WasmModule(build_ascii_upper())
    up = lambda s: m.invoke_with_strings("wupper", (s,), ["string"], True)
    assert up("Hello, World!") == "HELLO, WORLD!"
    assert up("") == ""
    assert up("[a{z}`") == "[A{Z}`"  # boundary bytes around a-z
    big = "xyz" * 50000  # forces memory.grow past the 1-page minimum
    assert up(big) == "XYZ" * 50000


def test_sql_string_wasm_udf(spark):
    from risingwave_spark.functions.wasm_runtime import build_ascii_upper

    b64 = base64.b64encode(build_ascii_upper()).decode()
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_wasm_s_"))
    eng.sql(
        f"CREATE FUNCTION wupper(s varchar) RETURNS varchar "
        f"LANGUAGE wasm USING BASE64 '{b64}'"
    )
    row = eng.sql(
        "SELECT wupper('mIxEd') AS a, wupper(NULL) AS b").first()
    assert row.a == "MIXED" and row.b is None
    # arity check counts the EXPANDED (ptr, len) pair
    with pytest.raises(ValueError, match="declares 1"):
        eng.sql(
            f"CREATE FUNCTION bad(a int8) RETURNS varchar "
            f"LANGUAGE wasm USING BASE64 '{b64}'"
        )


def test_bad_base64_and_not_wasm(spark):
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_wasm_b_"))
    with pytest.raises(ValueError, match="base64"):
        eng.sql(
            "CREATE FUNCTION wbad(a int8) RETURNS int8 "
            "LANGUAGE wasm USING BASE64 '!!notbase64!!'"
        )
    nb = base64.b64encode(b"not a wasm binary").decode()
    with pytest.raises(ValueError, match="wasm"):
        eng.sql(
            f"CREATE FUNCTION wbad2(a int8) RETURNS int8 "
            f"LANGUAGE wasm USING BASE64 '{nb}'"
        )
