"""LANGUAGE javascript UDFs through the pure-Python JS interpreter
(functions/js_runtime.py; reference `src/expr/impl/src/udf/quickjs.rs`
runs the same bodies under QuickJS — e2e_test/udf/js_udf.slt is the
parity surface this file mirrors)."""

from __future__ import annotations

import math
import tempfile
from decimal import Decimal

import pytest

from risingwave_spark.api import Engine
from risingwave_spark.functions.js_runtime import (
    UNDEF,
    JSRuntimeError,
    JSSyntaxError,
    call_js,
    compile_js,
    get_function,
    js_str,
    wrap_legacy,
)


def run(body: str, name: str, *args):
    interp = compile_js(body)
    return call_js(interp, get_function(interp, name), list(args))


def expr(e: str):
    return run(f"export function f() {{ return {e}; }}", "f")


# ------------------------------------------------------- interpreter core

def test_js_arithmetic_semantics():
    assert expr("1 + 2 * 3") == 7
    assert expr("7 / 2") == 3.5
    assert expr("-7 % 3") == -1          # JS remainder, not Python mod
    assert expr("7 % -3") == 1
    assert expr("2 ** 10") == 1024
    assert expr("1 / 0") == math.inf
    assert math.isnan(expr("0 / 0"))
    assert expr("'a' + 1") == "a1"       # string concat coercion
    assert expr("'5' - 2") == 3          # numeric coercion on -
    assert expr("5 & 3") == 1 and expr("5 | 3") == 7
    assert expr("-1 >>> 28") == 15       # uint32 shift
    assert expr("~5") == -6


def test_js_equality_and_truthiness():
    assert expr("null == undefined") is True
    assert expr("null === undefined") is False
    assert expr("1 == '1'") is True and expr("1 === '1'") is False
    assert expr("0 == false") is True
    assert expr("'' ? 1 : 2") == 2
    assert expr("[] ? 1 : 2") == 1       # empty array is truthy
    assert expr("NaN == NaN") is False
    assert expr("2 < 10") is True and expr("'2' < '10'") is False


def test_js_control_flow_and_functions():
    body = """
    export function fib(n) {
        if (n < 2) return n;
        return fib(n - 1) + fib(n - 2);
    }
    """
    assert run(body, "fib", 10) == 55
    body = """
    export function count() {
        let total = 0;
        for (let i = 0; i < 10; i++) {
            if (i % 2 == 0) continue;
            if (i > 7) break;
            total += i;
        }
        return total;
    }
    """
    assert run(body, "count") == 1 + 3 + 5 + 7
    body = """
    export function sw(x) {
        switch (x) {
            case 1: return 'one';
            case 2: return 'two';
            default: return 'many';
        }
    }
    """
    assert run(body, "sw", 2) == "two"
    assert run(body, "sw", 9) == "many"


def test_js_closures_arrows_and_array_methods():
    body = """
    export function pipeline(xs) {
        const double = x => x * 2;
        return xs.map(double).filter(x => x > 4).reduce((a, b) => a + b, 0);
    }
    """
    assert run(body, "pipeline", [1, 2, 3, 4]) == 6 + 8
    body = """
    export function counter() {
        let n = 0;
        const inc = () => { n++; return n; };
        inc(); inc();
        return inc();
    }
    """
    assert run(body, "counter") == 3


def test_js_objects_strings_templates():
    body = """
    export function fmt(name, n) {
        const o = { name, n, tag: `${name}:${n * 2}` };
        return o.tag + '|' + Object.keys(o).join(',');
    }
    """
    assert run(body, "fmt", "a", 3) == "a:6|name,n,tag"
    assert expr("'Hello World'.toLowerCase().split(' ')[1]") == "world"
    assert expr("'abc'.charCodeAt(1)") == 98
    assert expr("'7'.padStart(3, '0')") == "007"
    assert expr("JSON.stringify({key: 1})") == '{"key":1}'
    assert expr("JSON.parse('{\"a\": [1, 2]}').a[1]") == 2


def test_js_try_throw_typeof():
    body = """
    export function safe(x) {
        try {
            if (x < 0) throw Error('neg');
            return 'ok';
        } catch (e) {
            return 'caught:' + e.message;
        } finally {
            // finally runs either way
        }
    }
    """
    assert run(body, "safe", 1) == "ok"
    assert run(body, "safe", -1) == "caught:neg"
    assert expr("typeof 1") == "number"
    assert expr("typeof 'x'") == "string"
    assert expr("typeof null") == "object"
    assert expr("typeof undefined") == "undefined"
    assert expr("typeof missing_name") == "undefined"


def test_js_fuel_and_syntax_gates():
    interp_src = "export function spin() { while (true) {} }"
    with pytest.raises(JSRuntimeError, match="fuel"):
        run(interp_src, "spin")
    with pytest.raises(JSSyntaxError, match="class"):
        compile_js("class A {}")
    with pytest.raises(JSSyntaxError, match="await"):
        compile_js("export function f() { return await g(); }")


def test_js_generator_collects_yields():
    body = """
    export function* series(n) {
        for (let i = 0; i < n; i++) yield i;
    }
    """
    assert run(body, "series", 4) == [0, 1, 2, 3]
    body = """
    export function* tree() {
        yield 1;
        yield* [2, 3];
        yield 4;
    }
    """
    assert run(body, "tree") == [1, 2, 3, 4]


def test_js_decimal_is_exact_bigdecimal():
    body = "export function add(a, b) { return a + b; }"
    out = run(body, "add", Decimal("1.11"), Decimal("2.22"))
    assert out == Decimal("3.33") and js_str(out) == "3.33"
    assert expr("typeof BigDecimal('1.5')") == "bigdecimal"


def test_js_number_printing():
    assert js_str(42) == "42"
    assert js_str(4.5) == "4.5"
    assert js_str(2.0) == "2"          # integral float prints bare
    assert js_str(math.nan) == "NaN"
    assert js_str(-math.inf) == "-Infinity"
    assert js_str(UNDEF) == "undefined"
    assert js_str(b"\x01\x02\x03") == "1,2,3"  # Uint8Array.toString


# --------------------------------------------------------- SQL front door

def test_sql_js_scalar_udfs(spark):
    """js_udf.slt int_42 / gcd / decimal_add / to_string."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_js_"))
    eng.sql("""CREATE FUNCTION int_42() RETURNS int LANGUAGE javascript
               AS $$ export function int_42() { return 42; } $$""")
    assert eng.sql("SELECT int_42() AS v").first().v == 42
    eng.sql("""CREATE FUNCTION gcd(a int, b int) RETURNS int
               LANGUAGE javascript AS $$
        export function gcd(a, b) {
            if (a == null || b == null) return null;
            while (b != 0) { let t = b; b = a % b; a = t; }
            return a;
        } $$""")
    assert eng.sql("SELECT gcd(25, 15) AS g").first().g == 5
    assert eng.sql("SELECT gcd(25, NULL) AS g").first().g is None
    # over a table column (batch path)
    eng.sql("CREATE TABLE nums (a int8 PRIMARY KEY, b int8)")
    eng.sql("INSERT INTO nums VALUES (12, 18), (7, 21), (100, 75)")
    rows = eng.sql(
        "SELECT a, gcd(a, b) AS g FROM nums ORDER BY a").collect()
    assert [(r.a, r.g) for r in rows] == [(7, 7), (12, 6), (100, 25)]
    # decimal stays exact through JS (BigDecimal parity)
    eng.sql("""CREATE FUNCTION decimal_add(a decimal, b decimal)
               RETURNS decimal LANGUAGE javascript AS $$
        export function decimal_add(a, b) { return a + b; } $$""")
    v = eng.sql(
        "SELECT decimal_add(1.11::decimal, 2.22::decimal) AS s"
    ).first().s
    assert str(v).rstrip("0").rstrip(".") == "3.33"
    # the rw_functions catalog knows the language
    rows = eng.sql("SELECT name, language FROM rw_functions "
                   "WHERE name = 'gcd'").collect()
    assert rows[0].language == "javascript"


def test_sql_js_type_bridge(spark):
    """js_udf.slt to_string / js_typeof: the quickjs arrow bridge."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jsty_"))
    eng.sql("""CREATE FUNCTION jsty(a boolean, c int, f float,
               g decimal, h varchar, i bytea, j jsonb)
               RETURNS jsonb LANGUAGE javascript AS $$
        export function jsty(a, c, f, g, h, i, j) {
            return {
                boolean: typeof a, int: typeof c, float: typeof f,
                decimal: typeof g, varchar: typeof h,
                bytea: typeof i, jsonb: typeof j,
            };
        } $$""")
    import json
    v = eng.sql(
        "SELECT jsty(false, 2, 6.7::float8, 8.9::decimal, 'abc', "
        "'\\x010203'::bytea, '{\"key\": 1}'::jsonb) AS t"
    ).first().t
    assert json.loads(v) == {
        "boolean": "boolean", "int": "number", "float": "number",
        "decimal": "bigdecimal", "varchar": "string",
        "bytea": "object", "jsonb": "object",
    }
    eng.sql("""CREATE FUNCTION to_s(b boolean, i bytea, j jsonb)
               RETURNS varchar LANGUAGE javascript AS $$
        export function to_s(b, i, j) {
            return b.toString() + i.toString() + JSON.stringify(j);
        } $$""")
    v = eng.sql(
        "SELECT to_s(false, '\\x010203'::bytea, '{\"key\": 1}'::jsonb)"
        " AS s").first().s
    assert v == 'false1,2,3{"key":1}'


def test_sql_js_table_functions(spark):
    """js_udf.slt series / split: generator UDTFs."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jst_"))
    eng.sql("""CREATE FUNCTION series(n int) RETURNS TABLE (x int)
               LANGUAGE javascript AS $$
        export function* series(n) {
            for (let i = 0; i < n; i++) yield i;
        } $$""")
    rows = eng.sql("SELECT * FROM series(5)").collect()
    assert [r.x for r in rows] == [0, 1, 2, 3, 4]
    eng.sql("""CREATE FUNCTION split(s varchar)
               RETURNS TABLE (word varchar, length int)
               LANGUAGE javascript AS $$
        export function* split(s) {
            for (let word of s.split(' ')) {
                yield { word: word, length: word.length };
            }
        } $$""")
    rows = eng.sql("SELECT * FROM split('rising wave')").collect()
    assert [(r.word, r.length) for r in rows] == [
        ("rising", 6), ("wave", 4)]


def test_sql_js_aggregate(spark):
    """js_udf.slt weighted_avg: CREATE AGGREGATE ... LANGUAGE
    javascript, batch + streaming MV with a retracting delete."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jsa_"))
    eng.sql("""CREATE AGGREGATE weighted_avg(value int, weight int)
               RETURNS float LANGUAGE javascript AS $$
        export function create_state() { return {sum: 0, weight: 0}; }
        export function accumulate(state, value, weight) {
            if (value == null || weight == null) return state;
            state.sum += value * weight;
            state.weight += weight;
            return state;
        }
        export function retract(state, value, weight) {
            if (value == null || weight == null) return state;
            state.sum -= value * weight;
            state.weight -= weight;
            return state;
        }
        export function finish(state) {
            if (state.weight == 0) return null;
            return state.sum / state.weight;
        } $$""")
    eng.sql("CREATE TABLE wt (value int8, weight int8)")
    eng.sql("CREATE MATERIALIZED VIEW wmv AS "
            "SELECT weighted_avg(value, weight) AS wa FROM wt")
    assert eng.sql("SELECT wa FROM wmv").first().wa is None
    eng.sql("INSERT INTO wt VALUES (1, 1), (NULL, 2), (3, 3)")
    assert eng.sql("SELECT wa FROM wmv").first().wa == 2.5
    eng.sql("DELETE FROM wt WHERE value = 3")
    assert eng.sql("SELECT wa FROM wmv").first().wa == 1.0
    # batch call too
    v = eng.sql("SELECT weighted_avg(value, weight) AS wa FROM wt"
                ).first().wa
    assert v == 1.0


def test_sql_js_legacy_bare_bodies(spark):
    """js_udf.slt int_42_legacy / series_legacy: the body IS the
    function body when there's no export/function wrapper."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jsl_"))
    eng.sql("""CREATE FUNCTION int_42_legacy() RETURNS int
               LANGUAGE javascript AS $$ return 42; $$""")
    assert eng.sql("SELECT int_42_legacy() AS v").first().v == 42
    eng.sql("""CREATE FUNCTION series_legacy(n int)
               RETURNS TABLE (x int) LANGUAGE javascript AS $$
        for (let i = 0; i < n; i++) { yield i; } $$""")
    rows = eng.sql("SELECT * FROM series_legacy(3)").collect()
    assert [r.x for r in rows] == [0, 1, 2]
    assert wrap_legacy("return 1;", "one", [], False).startswith(
        "export function one()")


def test_sql_js_create_errors(spark):
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jse_"))
    # missing export of the declared name fails at CREATE
    with pytest.raises(ValueError, match="export a function"):
        eng.sql("""CREATE FUNCTION missing(a int) RETURNS int
                   LANGUAGE javascript AS
                   $$ export function other(a) { return a; } $$""")
    # syntax errors fail at CREATE, loudly
    with pytest.raises(ValueError, match="unexpected|expected"):
        eng.sql("""CREATE FUNCTION bad(a int) RETURNS int
                   LANGUAGE javascript AS
                   $$ export function bad(a) { return a + ; } $$""")


def test_drop_function_vs_drop_aggregate(spark):
    """js_udf.slt: `drop function weighted_avg` on an aggregate errors
    ('is an aggregate function'); `drop aggregate` succeeds — and the
    mirror case for scalar functions."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jsd_"))
    eng.sql("""CREATE AGGREGATE wavg2(v int) RETURNS float
               LANGUAGE javascript AS $$
        export function create_state() { return 0; }
        export function accumulate(s, v) { return s + (v || 0); }
        export function finish(s) { return s; } $$""")
    with pytest.raises(ValueError, match="is an aggregate function"):
        eng.sql("DROP FUNCTION wavg2")
    eng.sql("DROP AGGREGATE wavg2")
    assert "wavg2" not in eng.functions
    eng.sql("""CREATE FUNCTION sc1() RETURNS int LANGUAGE javascript
               AS $$ return 7; $$""")
    with pytest.raises(ValueError, match="is not an aggregate"):
        eng.sql("DROP AGGREGATE sc1")
    eng.sql("DROP FUNCTION sc1")
    assert "sc1" not in eng.functions


# ------------------------------------------------------------- fuzz arms

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _int_expr(draw, depth=0):
    """Random arithmetic over ints where JS and Python agree exactly:
    + - * ** (small exponents), parentheses, unary minus."""
    if depth > 3 or draw(st.booleans()):
        return str(draw(st.integers(min_value=-50, max_value=50)))
    op = draw(st.sampled_from(["+", "-", "*", "**", "neg", "paren"]))
    if op == "neg":
        # space after the minus: "--1" is a real JS SyntaxError
        # (decrement of a literal), which the interpreter matches
        return f"(- {draw(_int_expr(depth + 1))})"
    if op == "paren":
        return f"({draw(_int_expr(depth + 1))})"
    a, b = draw(_int_expr(depth + 1)), draw(_int_expr(depth + 1))
    if op == "**":
        # keep exponents small; parenthesize the base — JS rejects an
        # unparenthesized unary minus before ** and Python binds it
        # looser, so bare `-1 ** 0` means different things
        return f"(({a}) ** {draw(st.integers(min_value=0, max_value=3))})"
    return f"{a} {op} {b}"


@settings(max_examples=120, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(e=_int_expr())
def test_js_fuzz_arithmetic_matches_python(e):
    """Tokenizer/parser/evaluator precedence and integer arithmetic
    agree with Python's eval on the shared exact-int subset."""
    expected = eval(e)  # noqa: S307 — generated arithmetic only
    assert expr(e) == expected


@settings(max_examples=80, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(s=st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs",)),
    max_size=40))
def test_js_fuzz_string_roundtrip(s):
    """Arbitrary text survives the JS string path: JSON-quoted into a
    literal, concatenated, split and re-joined — byte-identical."""
    import json
    lit = json.dumps(s)  # valid JS string literal
    body = f"export function f() {{ return {lit} + ''; }}"
    assert run(body, "f") == s
    body2 = ("export function g(x) { "
             "return x.split('|').join('|'); }")
    assert run(body2, "g", s) == s


@settings(max_examples=60, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(xs=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                   max_size=20))
def test_js_fuzz_array_pipeline_matches_python(xs):
    """map/filter/reduce over random int arrays match the Python
    equivalents (closure + builtin callback interop)."""
    body = """
    export function p(xs) {
        return xs.map(x => x * 3).filter(x => x % 2 == 0)
                 .reduce((a, b) => a + b, 0);
    }
    """
    py = sum(v for v in (x * 3 for x in xs)
             if (abs(v) % 2 == 0))  # JS % keeps dividend sign; ==0 same
    assert run(body, "p", list(xs)) == py


def test_sql_js_struct_args_and_returns(spark):
    """js_udf.slt `return_all`-shaped subset: struct arguments arrive
    as JS objects; RETURNS struct<...> maps the returned object's
    fields (pandas-UDF struct output rides a DataFrame, not a Series
    of dicts)."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jsst_"))
    eng.sql("""CREATE FUNCTION pack(a int8, b varchar,
                                    s struct<f1 int8, f2 int8>)
               RETURNS struct<a int8, b varchar, hi int8, lo int8>
               LANGUAGE javascript AS $$
        export function pack(a, b, s) {
            return {a: a, b: b,
                    hi: Math.max(s.f1, s.f2),
                    lo: Math.min(s.f1, s.f2)};
        } $$""")
    r = eng.sql(
        "SELECT pack(7, 'x', named_struct('f1', 9, 'f2', 3)) AS p"
    ).first().p
    assert (r.a, r.b, r.hi, r.lo) == (7, "x", 9, 3)
    # NULL struct argument → null inside JS; null return field maps
    eng.sql("""CREATE FUNCTION maybe(s struct<f1 int8, f2 int8>)
               RETURNS struct<ok boolean, total int8>
               LANGUAGE javascript AS $$
        export function maybe(s) {
            if (s == null) return {ok: false, total: null};
            return {ok: true, total: s.f1 + s.f2};
        } $$""")
    r = eng.sql(
        "SELECT maybe(named_struct('f1', 2, 'f2', 5)) AS m").first().m
    assert (r.ok, r.total) == (True, 7)
    r = eng.sql(
        "SELECT maybe(CAST(NULL AS struct<f1 int8, f2 int8>)) AS m"
    ).first().m
    assert (r.ok, r.total) == (False, None)


def test_js_recursion_limits_are_clean_errors():
    """Pathological nesting and unbounded recursion raise clean JS
    errors, never a raw Python RecursionError through the UDF path."""
    deep = "(" * 5000 + "1" + ")" * 5000
    with pytest.raises(JSSyntaxError, match="nesting too deep"):
        compile_js(f"export function f() {{ return {deep}; }}")
    body = "export function boom(n) { return boom(n + 1); }"
    with pytest.raises(JSRuntimeError, match="call stack"):
        run(body, "boom", 0)


def test_js_let_binds_per_iteration_in_for():
    """ES6 semantics: closures created in a `for (let i...)` loop
    capture that iteration's binding; `var` shares one binding."""
    body = """
    export function caps() {
        const fs = [];
        for (let i = 0; i < 3; i++) fs.push(() => i);
        return fs.map(f => f());
    }
    """
    assert run(body, "caps") == [0, 1, 2]
    body_var = """
    export function caps() {
        const fs = [];
        for (var i = 0; i < 3; i++) fs.push(() => i);
        return fs.map(f => f());
    }
    """
    assert run(body_var, "caps") == [3, 3, 3]


def test_create_function_duplicate_and_if_not_exists(spark):
    """create_and_drop.slt: duplicate CREATE FUNCTION errors with the
    'function with name ... exists' shape; IF NOT EXISTS skips."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jsdup_"))
    eng.sql("""CREATE FUNCTION addx(a int, b int) RETURNS int
               LANGUAGE javascript AS $$ return a + b; $$""")
    with pytest.raises(ValueError, match=r"function with name addx"):
        eng.sql("CREATE FUNCTION addx(int, int) RETURNS int "
                "LANGUAGE sql AS 'select $1 + $2'")
    eng.sql("CREATE FUNCTION IF NOT EXISTS addx(int, int) RETURNS int "
            "LANGUAGE sql AS 'select $1 + $2'")
    # the original implementation survived the skipped re-create
    assert eng.sql("SELECT addx(2, 3) AS v").first().v == 5
    assert eng.functions["addx"]["language"] == "javascript"


def test_js_scalar_udf_inside_maintained_mv(spark):
    """A session-registered JS function works inside an incrementally
    maintained MV body (the recompute replans per batch and must
    resolve the UDF): inserts and deletes fold correctly."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jsmv_"))
    eng.sql("""CREATE FUNCTION jshalf(x int8) RETURNS int8
               LANGUAGE javascript AS
               $$ export function jshalf(x) {
                      return x == null ? null : Math.floor(x / 2);
                  } $$""")
    eng.sql("CREATE TABLE jt (k int8 PRIMARY KEY, v int8)")
    eng.sql("CREATE MATERIALIZED VIEW jmv AS "
            "SELECT k, jshalf(v) AS h FROM jt")
    eng.sql("INSERT INTO jt VALUES (1, 10), (2, 7), (3, NULL)")
    assert sorted(tuple(r) for r in
                  eng.sql("SELECT k, h FROM jmv").collect()) == [
        (1, 5), (2, 3), (3, None)]
    eng.sql("DELETE FROM jt WHERE k = 2")
    eng.sql("UPDATE jt SET v = 21 WHERE k = 1")
    assert sorted(tuple(r) for r in
                  eng.sql("SELECT k, h FROM jmv").collect()) == [
        (1, 10), (3, None)]


def test_js_destructuring_declarations():
    """One-level destructuring in let/const and for-of bindings —
    the `for (const [k, v] of Object.entries(o))` idiom."""
    body = """
    export function stats(o) {
        let total = 0;
        const parts = [];
        for (const [k, v] of Object.entries(o)) {
            total += v;
            parts.push(k);
        }
        const [first, ...rest] = parts.sort();
        const {a, b: bee, missing} = o;
        return first + '|' + rest.join(',') + '|' + total +
               '|' + a + '|' + bee + '|' + (missing === undefined);
    }
    """
    out = run(body, "stats", {"a": 1, "b": 2, "c": 3})
    assert out == "a|b,c|6|1|2|true"
    # array pattern with a hole
    assert expr("(() => { const [, y] = [1, 2]; return y; })()") == 2


def test_sql_js_legacy_body_mentioning_function_in_string(spark):
    """ADVICE r11 (quickjs.rs parity): legacy-vs-module detection is
    try-compile, not textual — a bare body whose STRING or comment
    contains the word 'function' still classifies as legacy."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_jslf_"))
    eng.sql("""CREATE FUNCTION kindof(x int) RETURNS varchar
               LANGUAGE javascript AS $$
        // returns what kind of function input this is
        let label = "function arg: ";
        return label + (x > 0 ? "pos" : "nonpos"); $$""")
    assert eng.sql("SELECT kindof(3) AS v").first().v == (
        "function arg: pos")
    # module form with the right export still resolves as module
    eng.sql("""CREATE FUNCTION modf(x int) RETURNS int
               LANGUAGE javascript AS
               $$ export function modf(x) { return x * 2; } $$""")
    assert eng.sql("SELECT modf(21) AS v").first().v == 42
