"""Pure-Python WebAssembly runtime for `LANGUAGE wasm` scalar UDFs.

Reference: `src/expr/impl/src/udf/wasm.rs` runs wasm UDF modules under
wasmtime through the arrow-udf-wasm ABI (Arrow-IPC batches in linear
memory). This container has no wasmtime and no toolchain to BUILD
arrow-udf modules, so the engine takes the honest middle path: a real
interpreter for the PUBLIC WebAssembly core binary format
(webassembly.github.io/spec/core/binary) executing genuine wasm
bytecode — the module's exported function is called per value, with
Arrow-batched transfer on the Spark side (create_function wraps it
exactly like LANGUAGE python). LINEAR MEMORY is implemented (memory
section, data segments, the full load/store family, memory.size/grow
with bounds traps), and string params/results travel through it via
the classic (ptr, len) pair convention (invoke_with_strings).
Divergence from the reference, documented: arrow-udf-wasm frames
batches as Arrow IPC inside linear memory — producing such modules
needs the arrow-udf toolchain this sandbox lacks; the per-value
(ptr, len) ABI here carries the same information for scalar calls.
Modules needing imports, tables or globals reject loud.

Implemented instruction set: structured control flow (block/loop/
if/else, br/br_if/br_table, return, call), locals, select/drop, the
full i32/i64 comparison+arithmetic+bitwise groups, f32/f64
arithmetic/comparison/rounding, the int<->float conversions, and the
complete memory-access family. Integer semantics are exact two's-complement
(wrap-around, signed/unsigned division with the spec's trap cases);
float→int truncation traps on NaN/out-of-range per spec 4.3.2.2; f32
results round through binary32 so f64 precision never leaks. Every
invoke runs under an instruction budget (FUEL) and a call-depth bound
— a hostile `loop br 0` or infinite recursion traps instead of
hanging the executor (wasmtime's fuel/max_wasm_stack analogues).

`build_module` is a minimal assembler emitting spec-shaped binaries —
how the tests (and users without a toolchain) produce real modules;
anything wasm-ld/wat2wasm emits within the supported feature set runs
unmodified.
"""

from __future__ import annotations

import math
import struct

_I32, _I64, _F32, _F64 = 0x7F, 0x7E, 0x7D, 0x7C
_MASK32, _MASK64 = (1 << 32) - 1, (1 << 64) - 1

#: load/store byte widths per opcode (spec 5.4.6)
_LOAD_N = {0x28: 4, 0x29: 8, 0x2A: 4, 0x2B: 8, 0x2C: 1, 0x2D: 1,
           0x2E: 2, 0x2F: 2, 0x30: 1, 0x31: 1, 0x32: 2, 0x33: 2,
           0x34: 4, 0x35: 4}
_STORE_N = {0x36: 4, 0x37: 8, 0x38: 4, 0x39: 8, 0x3A: 1, 0x3B: 2,
            0x3C: 1, 0x3D: 2, 0x3E: 4}


# ------------------------------------------------------------------ leb128
def _uleb(b: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        v = b[i]
        i += 1
        out |= (v & 0x7F) << shift
        if not v & 0x80:
            return out, i
        shift += 7


def _sleb(b: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        v = b[i]
        i += 1
        out |= (v & 0x7F) << shift
        shift += 7
        if not v & 0x80:
            if v & 0x40:
                out -= 1 << shift
            return out, i


def enc_uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        v = n & 0x7F
        n >>= 7
        if n:
            out.append(v | 0x80)
        else:
            out.append(v)
            return bytes(out)


def enc_sleb(n: int) -> bytes:
    out = bytearray()
    while True:
        v = n & 0x7F
        n >>= 7
        done = (n == 0 and not v & 0x40) or (n == -1 and v & 0x40)
        out.append(v | (0 if done else 0x80))
        if done:
            return bytes(out)


# ----------------------------------------------------------- module parsing
class WasmTrap(RuntimeError):
    pass


class _Branch(Exception):
    def __init__(self, depth: int):
        self.depth = depth


class _Return(Exception):
    def __init__(self, values: list):
        self.values = values


def _parse_expr(b: bytes, i: int) -> tuple[list, int]:
    """Decode an instruction sequence up to (and consuming) `end`,
    resolving structured blocks into nested lists."""
    out = []
    while True:
        op = b[i]
        i += 1
        if op == 0x0B:  # end
            return out, i
        if op == 0x05:  # else — handled by the `if` decoder
            return out, i - 1
        if op in (0x02, 0x03):  # block / loop
            bt = b[i]
            i += 1  # blocktype (0x40 empty or a valtype)
            body, i = _parse_expr(b, i)
            out.append(("block" if op == 0x02 else "loop", bt, body))
        elif op == 0x04:  # if
            bt = b[i]
            i += 1
            then, i = _parse_expr(b, i)
            els: list = []
            if b[i] == 0x05:
                els, i = _parse_expr(b, i + 1)
            out.append(("if", bt, then, els))
        elif op in (0x0C, 0x0D):  # br / br_if
            d, i = _uleb(b, i)
            out.append(("br" if op == 0x0C else "br_if", d))
        elif op == 0x0E:  # br_table
            n, i = _uleb(b, i)
            table = []
            for _ in range(n):
                d, i = _uleb(b, i)
                table.append(d)
            dflt, i = _uleb(b, i)
            out.append(("br_table", table, dflt))
        elif op == 0x0F:
            out.append(("return",))
        elif op == 0x10:  # call
            f, i = _uleb(b, i)
            out.append(("call", f))
        elif op in (0x20, 0x21, 0x22):  # local.get/set/tee
            n, i = _uleb(b, i)
            out.append(({0x20: "l.get", 0x21: "l.set", 0x22: "l.tee"}[op], n))
        elif op == 0x41:
            v, i = _sleb(b, i)
            out.append(("const", v & _MASK32))
        elif op == 0x42:
            v, i = _sleb(b, i)
            out.append(("const", v & _MASK64))
        elif op == 0x43:
            (v,) = struct.unpack_from("<f", b, i)
            i += 4
            out.append(("const", v))
        elif op == 0x44:
            (v,) = struct.unpack_from("<d", b, i)
            i += 8
            out.append(("const", v))
        elif 0x28 <= op <= 0x3E:  # loads/stores: memarg (align, offset)
            _align, i = _uleb(b, i)
            off, i = _uleb(b, i)
            out.append(("mem", op, off))
        elif op in (0x3F, 0x40):  # memory.size / memory.grow (memidx 0)
            i += 1
            out.append(("op", op))
        elif op in (0x00, 0x01, 0x1A, 0x1B) or 0x45 <= op <= 0xBF:
            out.append(("op", op))
        else:
            raise NotImplementedError(
                f"wasm opcode 0x{op:02x} is outside the supported subset "
                "(no tables / globals / simd / reference types)"
            )


def _f32(v: float) -> float:
    """Round a python float through IEEE binary32 — f32 ops must not
    carry f64 precision (spec 4.3.3); overflow rounds to ±inf."""
    try:
        return struct.unpack("<f", struct.pack("<f", v))[0]
    except OverflowError:
        return math.copysign(float("inf"), v)


def _trunc(v: float, lo: int, hi: int, mask: int) -> int:
    """Spec-trapping float→int truncation (spec 4.3.2.2): NaN and
    out-of-range values TRAP, they don't raise python ValueError."""
    if math.isnan(v):
        raise WasmTrap("invalid conversion to integer")
    if math.isinf(v):
        raise WasmTrap("integer overflow")
    t = math.trunc(v)
    if t < lo or t > hi:
        raise WasmTrap("integer overflow")
    return t & mask


class WasmModule:
    #: per-invoke instruction budget — an adversarial `loop br 0`
    #: traps instead of hanging the executor (wasmtime's fuel concept)
    FUEL = 10_000_000
    #: recursion bound (wasmtime's max_wasm_stack analogue); each wasm
    #: frame costs several python frames, so stay well under python's
    #: own default recursionlimit of 1000
    MAX_CALL_DEPTH = 192

    def __init__(self, binary: bytes):
        if binary[:8] != b"\x00asm\x01\x00\x00\x00":
            raise ValueError("not a wasm (version 1) binary")
        self._fuel = self.FUEL
        self._depth = 0
        self.types: list[tuple[list, list]] = []
        self.func_types: list[int] = []
        self.exports: dict[str, int] = {}
        self.codes: list[tuple[list, list]] = []  # (local valtypes, body)
        self.mem_min = 0  # pages declared by the memory section
        self.mem_max = 1024  # 64 MiB cap unless the module says less
        data_segs: list[tuple[int, bytes]] = []
        i = 8
        while i < len(binary):
            sec = binary[i]
            size, j = _uleb(binary, i + 1)
            body = binary[j:j + size]
            i = j + size
            if sec == 1:
                self._parse_types(body)
            elif sec == 2:
                n, _ = _uleb(body, 0)
                if n:
                    raise NotImplementedError(
                        "wasm imports are not supported (self-contained "
                        "modules only)")
            elif sec == 3:
                k = 0
                n, k = _uleb(body, k)
                for _ in range(n):
                    t, k = _uleb(body, k)
                    self.func_types.append(t)
            elif sec == 5:  # memory: limits per spec 5.3.7
                n, k = _uleb(body, 0)
                if n:
                    flag = body[k]
                    self.mem_min, k = _uleb(body, k + 1)
                    if flag & 0x01:
                        mx, k = _uleb(body, k)
                        self.mem_max = min(mx, self.mem_max)
            elif sec == 7:
                self._parse_exports(body)
            elif sec == 10:
                self._parse_codes(body)
            elif sec == 11:  # data: active segments at i32.const offsets
                n, k = _uleb(body, 0)
                for _ in range(n):
                    flag, k = _uleb(body, k)
                    if flag != 0:
                        raise NotImplementedError(
                            "only active memory-0 data segments are "
                            "supported")
                    if body[k] != 0x41:  # i32.const offset expr
                        raise NotImplementedError(
                            "data segment offsets must be i32.const")
                    off, k = _sleb(body, k + 1)
                    if body[k] != 0x0B:
                        raise ValueError("malformed data segment offset")
                    k += 1
                    ln, k = _uleb(body, k)
                    data_segs.append((off, body[k:k + ln]))
                    k += ln
            # other sections (global/table/custom…): skipped; code
            # touching them hits the loud opcode gate
        self.memory = bytearray(self.mem_min * 65536)
        self.data_end = 0
        for off, data in data_segs:
            # offsets decode via sleb (i32.const is signed): a negative
            # offset must trap as out-of-bounds, not slice from the end
            if off < 0 or off + len(data) > len(self.memory):
                raise ValueError("data segment out of memory bounds")
            self.memory[off:off + len(data)] = data
            self.data_end = max(self.data_end, off + len(data))

    def _parse_types(self, b: bytes) -> None:
        n, i = _uleb(b, 0)
        for _ in range(n):
            if b[i] != 0x60:
                raise ValueError("malformed functype")
            i += 1
            np_, i = _uleb(b, i)
            params = list(b[i:i + np_])
            i += np_
            nr, i = _uleb(b, i)
            results = list(b[i:i + nr])
            i += nr
            self.types.append((params, results))

    def _parse_exports(self, b: bytes) -> None:
        n, i = _uleb(b, 0)
        for _ in range(n):
            ln, i = _uleb(b, i)
            name = b[i:i + ln].decode()
            i += ln
            kind = b[i]
            idx, i = _uleb(b, i + 1)
            if kind == 0:
                self.exports[name] = idx

    def _parse_codes(self, b: bytes) -> None:
        n, i = _uleb(b, 0)
        for _ in range(n):
            size, i = _uleb(b, i)
            end = i + size
            nl, j = _uleb(b, i)
            locals_: list[int] = []
            for _ in range(nl):
                cnt, j = _uleb(b, j)
                vt = b[j]
                j += 1
                locals_.extend([vt] * cnt)
            body, _ = _parse_expr(b, j)
            self.codes.append((locals_, body))
            i = end

    # -------------------------------------------------------- execution
    def invoke_check(self, name: str, n_args: int) -> None:
        """CREATE-time validation: the export exists (by the declared
        function name, or as the module's single export — the
        reference resolves by name too) and its arity matches."""
        fidx = self._resolve(name)
        params, results = self.types[self.func_types[fidx]]
        if len(params) != n_args:
            raise ValueError(
                f"wasm export takes {len(params)} args, the CREATE "
                f"FUNCTION declares {n_args}")
        if len(results) != 1:
            raise ValueError(
                "scalar wasm UDFs must return exactly one value "
                f"(module returns {len(results)})")

    def _resolve(self, name: str) -> int:
        if name in self.exports:
            return self.exports[name]
        if len(self.exports) == 1:
            return next(iter(self.exports.values()))
        raise ValueError(
            f"wasm module exports {sorted(self.exports)}, not {name!r}")

    def invoke_with_strings(self, name: str, args: tuple,
                            param_types: list[str], ret_is_str: bool):
        """String calling convention over linear memory (documented
        divergence from the reference's arrow-udf-wasm Arrow-IPC ABI,
        `udf/wasm.rs` — building those modules needs the arrow-udf
        toolchain this sandbox lacks; this is the classic (ptr, len)
        pair convention): the host writes each string argument's UTF-8
        bytes into linear memory and passes (ptr, len) i32 pairs,
        reserving 2×len adjacent scratch the function may write output
        into; a string RESULT returns packed i64 (ptr << 32) | len and
        the host reads the bytes back. The bump heap resets per call
        (scalar UDF rows are independent)."""
        heap = max(self.data_end, 16)
        call = []
        for a, t in zip(args, param_types):
            if t.lower() == "string":
                b = str(a).encode()
                need = heap + 2 * len(b) + 16
                if need > len(self.memory):
                    pages = (need - len(self.memory) + 65535) // 65536
                    if self.grow(pages) < 0:
                        raise WasmTrap("string arguments exceed memory max")
                self.memory[heap:heap + len(b)] = b
                call += [heap, len(b)]
                heap += 2 * len(b) + 16
            else:
                call.append(a)
        res = self.invoke(name, *call)
        if not ret_is_str:
            return res
        ptr = (int(res) >> 32) & _MASK32
        ln = int(res) & _MASK32
        if ptr + ln > len(self.memory):
            raise WasmTrap("string result out of memory bounds")
        return bytes(self.memory[ptr:ptr + ln]).decode("utf-8", "replace")

    def invoke(self, name: str, *args):
        import sys

        fidx = self._resolve(name)
        self._fuel = self.FUEL
        self._depth = 0
        # each wasm frame costs several python frames (+ nested-block
        # _exec recursion); headroom makes MAX_CALL_DEPTH the binding
        # limit so exhaustion traps deterministically as WasmTrap
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 20000))
        try:
            res = self._call(fidx, list(args))
        finally:
            sys.setrecursionlimit(old)
        return res[0] if len(res) == 1 else tuple(res)

    def _call(self, fidx: int, args: list) -> list:
        self._depth += 1
        if self._depth > self.MAX_CALL_DEPTH:
            raise WasmTrap("call stack exhausted")
        try:
            return self._call_inner(fidx, args)
        finally:
            self._depth -= 1

    def _call_inner(self, fidx: int, args: list) -> list:
        params, results = self.types[self.func_types[fidx]]
        if len(args) != len(params):
            raise ValueError(
                f"wasm function takes {len(params)} args, got {len(args)}")
        local_types, body = self.codes[fidx]
        locals_ = []
        for vt, a in zip(params, args):
            if vt in (_I32, _I64):
                locals_.append(int(a) & (_MASK32 if vt == _I32 else _MASK64))
            else:
                locals_.append(float(a))
        for vt in local_types:
            locals_.append(0 if vt in (_I32, _I64) else 0.0)
        stack: list = []
        try:
            self._exec(body, stack, locals_)
        except _Return as r:
            return r.values[-len(results):] if results else []
        except _Branch:
            pass  # br past the function body = return
        if len(results) > len(stack):
            raise WasmTrap("value stack underflow at function end")
        out = stack[len(stack) - len(results):]
        return self._coerce_results(out, results)

    def _coerce_results(self, vals: list, results: list) -> list:
        out = []
        for v, vt in zip(vals, results):
            if vt == _I32:
                v = int(v) & _MASK32
                out.append(v - (1 << 32) if v >= 1 << 31 else v)
            elif vt == _I64:
                v = int(v) & _MASK64
                out.append(v - (1 << 64) if v >= 1 << 63 else v)
            else:
                out.append(float(v))
        return out

    def _exec(self, instrs: list, stack: list, locals_: list) -> None:
        fuel = self._fuel - len(instrs)
        if fuel <= 0:
            raise WasmTrap("fuel exhausted (instruction budget)")
        self._fuel = fuel
        for ins in instrs:
            tag = ins[0]
            if tag == "const":
                stack.append(ins[1])
            elif tag == "l.get":
                stack.append(locals_[ins[1]])
            elif tag == "l.set":
                locals_[ins[1]] = stack.pop()
            elif tag == "l.tee":
                locals_[ins[1]] = stack[-1]
            elif tag == "op":
                self._op(ins[1], stack)
            elif tag == "mem":
                self._mem_op(ins[1], ins[2], stack)
            elif tag == "block":
                try:
                    self._exec(ins[2], stack, locals_)
                except _Branch as brx:
                    if brx.depth:
                        brx.depth -= 1
                        raise
            elif tag == "loop":
                while True:
                    try:
                        self._exec(ins[2], stack, locals_)
                        break
                    except _Branch as brx:
                        if brx.depth:
                            brx.depth -= 1
                            raise
                        continue  # br 0 inside loop = continue
            elif tag == "if":
                cond = stack.pop()
                try:
                    self._exec(ins[2] if cond else ins[3], stack, locals_)
                except _Branch as brx:
                    if brx.depth:
                        brx.depth -= 1
                        raise
            elif tag == "br":
                raise _Branch(ins[1])
            elif tag == "br_if":
                if stack.pop():
                    raise _Branch(ins[1])
            elif tag == "br_table":
                k = stack.pop()
                table, dflt = ins[1], ins[2]
                raise _Branch(table[k] if k < len(table) else dflt)
            elif tag == "return":
                raise _Return(list(stack))
            elif tag == "call":
                fidx = ins[1]
                nparams = len(self.types[self.func_types[fidx]][0])
                args = stack[len(stack) - nparams:]
                del stack[len(stack) - nparams:]
                stack.extend(self._call(fidx, args))
            else:  # pragma: no cover
                raise NotImplementedError(tag)

    # ------------------------------------------------- linear memory
    def grow(self, pages: int) -> int:
        """memory.grow semantics: → previous size in pages, or -1 when
        the max is exceeded."""
        cur = len(self.memory) // 65536
        if cur + pages > self.mem_max:
            return -1
        self.memory.extend(b"\x00" * (pages * 65536))
        return cur

    def _mem_slice(self, addr: int, off: int, n: int) -> int:
        a = (addr & _MASK32) + off
        if a + n > len(self.memory):
            raise WasmTrap("out of bounds memory access")
        return a

    def _mem_op(self, op: int, off: int, st: list) -> None:
        m = self.memory
        if op <= 0x35:  # loads
            a = self._mem_slice(st.pop(), off, _LOAD_N[op])
            if op == 0x28:  # i32.load
                st.append(int.from_bytes(m[a:a + 4], "little"))
            elif op == 0x29:  # i64.load
                st.append(int.from_bytes(m[a:a + 8], "little"))
            elif op == 0x2A:  # f32.load
                st.append(struct.unpack_from("<f", m, a)[0])
            elif op == 0x2B:  # f64.load
                st.append(struct.unpack_from("<d", m, a)[0])
            else:
                n = _LOAD_N[op]
                v = int.from_bytes(m[a:a + n], "little")
                if op in (0x2C, 0x2E, 0x30, 0x32, 0x34):  # signed loads
                    if v >= 1 << (n * 8 - 1):
                        v -= 1 << (n * 8)
                mask = _MASK32 if op <= 0x2F else _MASK64
                st.append(v & mask)
            return
        if op <= 0x3E:  # stores
            v = st.pop()
            n = _STORE_N[op]
            a = self._mem_slice(st.pop(), off, n)
            if op == 0x38:  # f32.store
                struct.pack_into("<f", m, a, _f32(v))
            elif op == 0x39:  # f64.store
                struct.pack_into("<d", m, a, float(v))
            else:
                m[a:a + n] = (int(v) & ((1 << (n * 8)) - 1)).to_bytes(
                    n, "little")
            return
        raise NotImplementedError(f"memory opcode 0x{op:02x}")

    # one scalar op; ints live UNSIGNED on the stack, sign-views on use
    def _op(self, op: int, st: list) -> None:
        def s32(v):
            v &= _MASK32
            return v - (1 << 32) if v >= 1 << 31 else v

        def s64(v):
            v &= _MASK64
            return v - (1 << 64) if v >= 1 << 63 else v

        if op == 0x00:
            raise WasmTrap("unreachable")
        if op == 0x01:
            return
        if op == 0x3F:  # memory.size
            st.append(len(self.memory) // 65536)
            return
        if op == 0x40:  # memory.grow
            st.append(self.grow(st.pop() & _MASK32) & _MASK32)
            return
        if op == 0x1A:
            st.pop()
            return
        if op == 0x1B:  # select
            c = st.pop()
            b = st.pop()
            a = st.pop()
            st.append(a if c else b)
            return
        # ---- i32 compare 0x45-0x4F
        if 0x45 <= op <= 0x4F:
            if op == 0x45:
                st.append(1 if (st.pop() & _MASK32) == 0 else 0)
                return
            b = st.pop()
            a = st.pop()
            ua, ub = a & _MASK32, b & _MASK32
            sa, sb = s32(a), s32(b)
            st.append(1 if {
                0x46: ua == ub, 0x47: ua != ub, 0x48: sa < sb,
                0x49: ua < ub, 0x4A: sa > sb, 0x4B: ua > ub,
                0x4C: sa <= sb, 0x4D: ua <= ub, 0x4E: sa >= sb,
                0x4F: ua >= ub,
            }[op] else 0)
            return
        # ---- i64 compare 0x50-0x5A
        if 0x50 <= op <= 0x5A:
            if op == 0x50:
                st.append(1 if (st.pop() & _MASK64) == 0 else 0)
                return
            b = st.pop()
            a = st.pop()
            ua, ub = a & _MASK64, b & _MASK64
            sa, sb = s64(a), s64(b)
            st.append(1 if {
                0x51: ua == ub, 0x52: ua != ub, 0x53: sa < sb,
                0x54: ua < ub, 0x55: sa > sb, 0x56: ua > ub,
                0x57: sa <= sb, 0x58: ua <= ub, 0x59: sa >= sb,
                0x5A: ua >= ub,
            }[op] else 0)
            return
        # ---- f32/f64 compare 0x5B-0x66 (same python semantics)
        if 0x5B <= op <= 0x66:
            b = st.pop()
            a = st.pop()
            k = (op - 0x5B) % 6
            st.append(1 if [
                a == b, a != b, a < b, a > b, a <= b, a >= b,
            ][k] else 0)
            return
        # ---- i32 arithmetic 0x67-0x78
        if 0x67 <= op <= 0x78:
            self._int_arith(op - 0x67, st, 32, s32)
            return
        # ---- i64 arithmetic 0x79-0x8A
        if 0x79 <= op <= 0x8A:
            self._int_arith(op - 0x79, st, 64, s64)
            return
        # ---- f32 0x8B-0x98 / f64 0x99-0xA6 math
        if 0x8B <= op <= 0xA6:
            k = (op - 0x8B) % 14
            if k < 7:  # unary
                a = st.pop()
                r = [
                    abs(a), -a, math.ceil(a), math.floor(a),
                    math.trunc(a) * 1.0,
                    float(round(a)),  # nearest (ties-to-even, like round)
                    math.sqrt(a) if a >= 0 else float("nan"),
                ][k]
            else:
                b = st.pop()
                a = st.pop()
                if k == 10 and b == 0:
                    r = (float("nan") if a == 0 else
                         math.copysign(float("inf"), a) *
                         math.copysign(1.0, b))
                else:
                    r = [
                        a + b, a - b, a * b, a / b if b != 0 else (
                            float("nan")), min(a, b), max(a, b),
                        math.copysign(a, b),
                    ][k - 7]
            # f32 ops round the f64-computed result to binary32
            # (spec 4.3.3 — f64 precision must not leak through)
            st.append(_f32(r) if op <= 0x98 else r)
            return
        # ---- conversions
        if op == 0xA7:  # i32.wrap_i64
            st.append(st.pop() & _MASK32)
            return
        if op in (0xA8, 0xAA):  # i32.trunc_f32_s / i32.trunc_f64_s
            st.append(_trunc(st.pop(), -(1 << 31), (1 << 31) - 1, _MASK32))
            return
        if op in (0xA9, 0xAB):  # i32.trunc_f32_u / i32.trunc_f64_u
            st.append(_trunc(st.pop(), 0, _MASK32, _MASK32))
            return
        if op == 0xAC:  # i64.extend_i32_s
            st.append(s32(st.pop()) & _MASK64)
            return
        if op == 0xAD:  # i64.extend_i32_u
            st.append(st.pop() & _MASK32)
            return
        if op in (0xAE, 0xB0):  # i64.trunc_f32_s / i64.trunc_f64_s
            st.append(_trunc(st.pop(), -(1 << 63), (1 << 63) - 1, _MASK64))
            return
        if op in (0xAF, 0xB1):  # i64.trunc_f32_u / i64.trunc_f64_u
            st.append(_trunc(st.pop(), 0, _MASK64, _MASK64))
            return
        if op == 0xB2:  # f32.convert_i32_s
            st.append(_f32(float(s32(st.pop()))))
            return
        if op == 0xB3:  # f32.convert_i32_u
            st.append(_f32(float(st.pop() & _MASK32)))
            return
        if op == 0xB4:  # f32.convert_i64_s
            st.append(_f32(float(s64(st.pop()))))
            return
        if op == 0xB5:  # f32.convert_i64_u
            st.append(_f32(float(st.pop() & _MASK64)))
            return
        if op == 0xB6:  # f32.demote_f64
            st.append(_f32(st.pop()))
            return
        if op == 0xB7:  # f64.convert_i32_s
            st.append(float(s32(st.pop())))
            return
        if op == 0xB8:  # f64.convert_i32_u
            st.append(float(st.pop() & _MASK32))
            return
        if op == 0xB9:  # f64.convert_i64_s
            st.append(float(s64(st.pop())))
            return
        if op == 0xBA:  # f64.convert_i64_u
            st.append(float(st.pop() & _MASK64))
            return
        if op == 0xBB:  # f64.promote_f32
            st.append(float(st.pop()))
            return
        raise NotImplementedError(
            f"wasm opcode 0x{op:02x} is outside the supported numeric "
            "MVP subset")

    def _int_arith(self, k: int, st: list, bits: int, sview) -> None:
        mask = _MASK32 if bits == 32 else _MASK64
        if k == 0:  # clz
            a = st.pop() & mask
            st.append(bits if a == 0 else bits - a.bit_length())
            return
        if k == 1:  # ctz
            a = st.pop() & mask
            st.append(bits if a == 0 else (a & -a).bit_length() - 1)
            return
        if k == 2:  # popcnt
            st.append(bin(st.pop() & mask).count("1"))
            return
        b = st.pop()
        a = st.pop()
        ua, ub = a & mask, b & mask
        sa, sb = sview(a), sview(b)
        if k == 3:
            st.append((ua + ub) & mask)
        elif k == 4:
            st.append((ua - ub) & mask)
        elif k == 5:
            st.append((ua * ub) & mask)
        elif k == 6:  # div_s — the spec truncates toward zero
            if sb == 0:
                raise WasmTrap("integer divide by zero")
            st.append(int(sa / sb) & mask)
        elif k == 7:  # div_u
            if ub == 0:
                raise WasmTrap("integer divide by zero")
            st.append((ua // ub) & mask)
        elif k == 8:  # rem_s — sign follows the dividend
            if sb == 0:
                raise WasmTrap("integer divide by zero")
            st.append((sa - int(sa / sb) * sb) & mask)
        elif k == 9:  # rem_u
            if ub == 0:
                raise WasmTrap("integer divide by zero")
            st.append((ua % ub) & mask)
        elif k == 10:
            st.append(ua & ub)
        elif k == 11:
            st.append(ua | ub)
        elif k == 12:
            st.append(ua ^ ub)
        elif k == 13:
            st.append((ua << (ub % bits)) & mask)
        elif k == 14:  # shr_s
            st.append((sa >> (ub % bits)) & mask)
        elif k == 15:  # shr_u
            st.append(ua >> (ub % bits))
        elif k == 16:  # rotl
            n = ub % bits
            st.append(((ua << n) | (ua >> (bits - n))) & mask)
        elif k == 17:  # rotr
            n = ub % bits
            st.append(((ua >> n) | (ua << (bits - n))) & mask)
        else:  # pragma: no cover
            raise NotImplementedError(k)


# ---------------------------------------------------------------- assembler
def build_module(funcs: list[dict], memory: int = 0,
                 data: list[tuple[int, bytes]] | None = None) -> bytes:
    """Emit a spec-shaped wasm binary. Each func:
    {"name": export name, "params": [valtype...], "results": [...],
     "locals": [...], "body": bytes (raw instruction bytes, WITHOUT the
     trailing end)}. Valtypes: 'i32' | 'i64' | 'f32' | 'f64'.
    `memory` declares a linear memory of that many 64 KiB pages;
    `data` = [(offset, bytes)] active segments."""
    vt = {"i32": _I32, "i64": _I64, "f32": _F32, "f64": _F64}

    def vec(items: list[bytes]) -> bytes:
        return enc_uleb(len(items)) + b"".join(items)

    def section(sid: int, body: bytes) -> bytes:
        return bytes([sid]) + enc_uleb(len(body)) + body

    types, codes, fsec, exps = [], [], [], []
    for idx, f in enumerate(funcs):
        types.append(
            b"\x60" + vec([bytes([vt[p]]) for p in f["params"]])
            + vec([bytes([vt[r]]) for r in f["results"]]))
        fsec.append(enc_uleb(idx))
        nm = f["name"].encode()
        exps.append(enc_uleb(len(nm)) + nm + b"\x00" + enc_uleb(idx))
        locs = vec([
            enc_uleb(1) + bytes([vt[loc]]) for loc in f.get("locals", [])
        ])
        body = locs + f["body"] + b"\x0b"
        codes.append(enc_uleb(len(body)) + body)
    out = (
        b"\x00asm\x01\x00\x00\x00"
        + section(1, vec(types))
        + section(3, vec(fsec))
    )
    if memory:
        out += section(5, vec([b"\x00" + enc_uleb(memory)]))
    out += section(7, vec(exps)) + section(10, vec(codes))
    if data:
        segs = [
            b"\x00\x41" + enc_sleb(off) + b"\x0b"
            + enc_uleb(len(d)) + d
            for off, d in data
        ]
        out += section(11, vec(segs))
    return out


def build_ascii_upper() -> bytes:
    """A bundled sample module (what the reference ships as example
    arrow-udf-wasm UDFs): `wupper(ptr: i32, len: i32) -> i64` —
    uppercase ASCII over linear memory, writing the result into the
    2×len scratch region after the input (the invoke_with_strings
    convention) and returning packed (out_ptr << 32) | len. Real
    hand-assembled wasm bytecode: a load8/store8 loop with branch
    logic — exercises memory, blocks, loops and i64 bit algebra."""
    body = (
        # block { loop {
        b"\x02\x40" b"\x03\x40"
        # if (i >= len) br 1
        b"\x20\x02\x20\x01\x4f\x0d\x01"
        # b = load8_u(ptr + i)
        b"\x20\x00\x20\x02\x6a\x2d\x00\x00\x21\x03"
        # if (b >= 97) { if (b <= 122) { b -= 32 } }
        b"\x20\x03\x41\xe1\x00\x4e"
        b"\x04\x40"
        b"\x20\x03\x41\xfa\x00\x4c"
        b"\x04\x40"
        b"\x20\x03\x41\x20\x6b\x21\x03"
        b"\x0b\x0b"
        # store8(ptr + len + i, b)
        b"\x20\x00\x20\x01\x6a\x20\x02\x6a\x20\x03\x3a\x00\x00"
        # i += 1; continue
        b"\x20\x02\x41\x01\x6a\x21\x02"
        b"\x0c\x00"
        b"\x0b\x0b"
        # return ((ptr + len) as i64) << 32 | len
        b"\x20\x00\x20\x01\x6a\xad\x42\x20\x86"
        b"\x20\x01\xad\x84"
    )
    return build_module(
        [{"name": "wupper", "params": ["i32", "i32"], "results": ["i64"],
          "locals": ["i32", "i32"], "body": body}],
        memory=1,
    )


def wasm_abi_arity(param_types: list[str]) -> int:
    """Declared SQL params → wasm-level argument count (a string
    expands to a (ptr, len) i32 pair in the linear-memory ABI)."""
    return sum(2 if t.lower() == "string" else 1 for t in param_types)


def wasm_scalar_udf(name: str, binary: bytes, ret_spark_type: str,
                    param_types: list[str]):
    """Arrow-batched pandas UDF around the interpreter (the same batch
    shape LANGUAGE python uses, create_function.python_scalar_udf):
    NULL in → NULL out (strict, the PG scalar contract). String params
    and results travel through linear memory (invoke_with_strings).
    The module BYTES travel in the closure and the package root rides
    sys.path so executor workers can import the interpreter regardless
    of where the driver launched from (the round-5 worker-import
    pattern)."""
    import os as _os

    from pyspark.sql.functions import pandas_udf

    import risingwave_spark as _pkg

    pkg_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(
        _pkg.__file__)))
    param_types = [t.lower() for t in param_types]
    ret_is_str = ret_spark_type.lower() == "string"
    stringy = ret_is_str or "string" in param_types

    def _eval(*cols):
        import sys as _sys

        import pandas as _pd

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from risingwave_spark.functions.wasm_runtime import WasmModule

        mod = WasmModule(binary)
        rows = zip(
            *[[None if _pd.isna(v) else v for v in c.tolist()] for c in cols]
        )
        out = []
        for r in rows:
            if any(v is None for v in r):
                out.append(None)
            elif stringy:
                out.append(mod.invoke_with_strings(
                    name, r, param_types, ret_is_str))
            else:
                out.append(mod.invoke(name, *r))
        return _pd.Series(out, dtype="object")

    if not param_types:
        mod = WasmModule(binary)
        return lambda: mod.invoke(name)
    return pandas_udf(_eval, ret_spark_type)
