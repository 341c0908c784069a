"""UDF-runtime coverage queries (SURVEY.md §2.7 UDF row): vectorized
pandas UDFs (the arrow-udf analog), SQL-registered UDFs, and an
applyInPandas user-defined aggregate — all deterministic and
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.functions.udf import (
    grouped_weighted_avg,
    register_sql_udfs,
    scaled_shift,
    text_vowels,
)
from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import EVENTS_US, tables


@register(
    "udf_pandas_scalar",
    oracle=f"""
SELECT event_id,
       value * 2 + 1 AS shifted,
       CAST(length(event_type) - length(regexp_replace(event_type, '[aeiou]', '', 'g')) AS BIGINT) AS vowels
FROM {EVENTS_US} e WHERE event_id < 300 ORDER BY event_id
""",
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized (Arrow-batched) scalar pandas UDFs — the reference's
    arrow-udf runtime analog (`udf/external.rs`): numeric shift + string
    vowel count, computed per Arrow batch, no per-row Python overhead."""
    t = tables(spark, sf_dir)
    register_sql_udfs(spark)
    return (
        t["events"]
        .filter(F.col("event_id") < 300)
        .select(
            "event_id",
            scaled_shift()(F.col("value")).alias("shifted"),
            text_vowels()(F.col("event_type")).alias("vowels"),
        )
        .orderBy("event_id")
    )


@register(
    "udf_grouped_agg",
    oracle=f"""
SELECT event_type,
       round(CAST(sum(CAST(round(value*10000,0) AS BIGINT) * k) AS BIGINT) / 10000.0
             / CAST(sum(k) AS BIGINT), 6) AS wavg
FROM (SELECT event_type, value, CAST(props->>'k' AS BIGINT) AS k FROM {EVENTS_US} e) s
GROUP BY event_type ORDER BY event_type
""",
)
def udf_grouped_agg(spark, sf_dir):
    """User-defined aggregate via applyInPandas (reference CREATE
    AGGREGATE): weighted average of value by props.k per event_type,
    computed exactly on scaled int64 so the oracle matches bit-for-bit."""
    t = tables(spark, sf_dir)
    d = t["events"].select(
        "event_type", "value", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return grouped_weighted_avg(d, ["event_type"], "value", "k", "event_type string").orderBy(
        "event_type"
    )


@register(
    "udf_external_server",
    oracle="""
SELECT o_orderkey,
       upper(o_orderstatus) || ':' || CAST(length(o_orderstatus) AS VARCHAR) AS tagged
FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
""",
)
def udf_external_server(spark, sf_dir):
    """EXTERNAL UDF runtime (reference `expr/impl/src/udf/external.rs` —
    Arrow Flight to a user-owned UDF server; here the same per-Arrow-batch
    contract over a subprocess pipe, Flight being a transport swap): the
    server is a STANDALONE process with no engine imports, evaluation
    round-trips each pandas_udf batch as Arrow IPC frames. Must equal
    the equivalent built-in expression."""
    import os
    import sys
    import tempfile

    from risingwave_spark.functions.udf_external import (
        external_pandas_udf,
        write_server_script,
    )

    script = os.path.join(tempfile.mkdtemp(prefix="rw_extudf_"), "server.py")
    write_server_script(
        script,
        """
def handle(tbl):
    import pyarrow as pa
    s = tbl.column(0).to_pandas()
    return pa.table({"r": pa.Array.from_pandas(s.str.upper() + ":" + s.str.len().astype(str))})
""",
    )
    tag = external_pandas_udf(f"{sys.executable} {script}", "string")
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey", tag(F.col("o_orderstatus")).alias("tagged")
    ).orderBy("o_orderkey")


@register(
    "udf_wasm_scalar",
    oracle="""
SELECT l_orderkey AS k,
       CAST(sum(CAST(l_quantity AS BIGINT) * 3 + l_linenumber) AS BIGINT)
         AS s
FROM lineitem WHERE l_orderkey < 400
GROUP BY l_orderkey ORDER BY k
""",
)
def udf_wasm_scalar(spark, sf_dir):
    """LANGUAGE wasm scalar UDF (reference `src/expr/impl/src/udf/
    wasm.rs` — wasmtime + arrow-udf modules; here a pure-Python
    interpreter executing GENUINE WebAssembly bytecode, ABI divergence
    documented in functions/wasm_runtime.py): the module computes
    q*3+n in wasm (i64 mul/add), registered through the SQL front door
    with USING BASE64 and aggregated JVM-side around the Arrow-batched
    calls."""
    import base64 as _b64
    import tempfile as _tf

    from risingwave_spark.api import Engine
    from risingwave_spark.functions.wasm_runtime import build_module

    tables(spark, sf_dir)
    # (q, n) -> q*3 + n : local.get 0; i64.const 3; i64.mul;
    #                     local.get 1; i64.add
    mod = build_module([{
        "name": "wtri", "params": ["i64", "i64"], "results": ["i64"],
        "body": b"\x20\x00\x42\x03\x7e\x20\x01\x7c",
    }])
    b64 = _b64.b64encode(mod).decode()
    eng = Engine(spark, _tf.mkdtemp(prefix="rw_wasmq_"))
    eng.sql(
        f"CREATE FUNCTION wtri(q int8, n int8) RETURNS int8 "
        f"LANGUAGE wasm USING BASE64 '{b64}'"
    )
    return eng.sql(
        "SELECT l_orderkey AS k, sum(wtri(CAST(l_quantity AS int8), "
        "l_linenumber)) AS s FROM lineitem WHERE l_orderkey < 400 "
        "GROUP BY l_orderkey ORDER BY k"
    )


@register(
    "udf_wasm_string",
    oracle="""
SELECT p_partkey AS k, upper(p_name) AS un
FROM part WHERE p_partkey < 300 ORDER BY k
""",
)
def udf_wasm_string(spark, sf_dir):
    """String-typed LANGUAGE wasm UDF over LINEAR MEMORY (reference
    `udf/wasm.rs` passes strings through the arrow-udf-wasm linear
    -memory ABI; divergence documented in wasm_runtime.py — the (ptr,
    len) pair convention instead of Arrow-IPC framing, which needs a
    toolchain this sandbox lacks): the bundled hand-assembled module
    uppercases ASCII with a load8/store8 loop and returns a packed
    (ptr << 32) | len i64 the host reads back; hash-matched against
    DuckDB's upper() over the part names."""
    import base64 as _b64
    import tempfile as _tf

    from risingwave_spark.api import Engine
    from risingwave_spark.functions.wasm_runtime import build_ascii_upper

    tables(spark, sf_dir)
    b64 = _b64.b64encode(build_ascii_upper()).decode()
    eng = Engine(spark, _tf.mkdtemp(prefix="rw_wasms_"))
    eng.sql(
        f"CREATE FUNCTION wupper(s varchar) RETURNS varchar "
        f"LANGUAGE wasm USING BASE64 '{b64}'"
    )
    return eng.sql(
        "SELECT p_partkey AS k, wupper(p_name) AS un "
        "FROM part WHERE p_partkey < 300 ORDER BY k"
    )


@register(
    "udf_js_scalar",
    oracle="""
SELECT l_orderkey AS k,
       CAST(sum(gcd(CAST(l_quantity AS BIGINT), CAST(l_partkey AS BIGINT))) AS BIGINT) AS s
FROM lineitem WHERE l_orderkey < 400
GROUP BY l_orderkey ORDER BY k
""",
)
def udf_js_scalar(spark, sf_dir):
    """LANGUAGE javascript scalar UDF (reference `src/expr/impl/src/
    udf/quickjs.rs` + e2e_test/udf/js_udf.slt `gcd`; here a pure-
    Python JS interpreter, functions/js_runtime.py — no quickjs in
    this sandbox, divergences documented there): Euclid's gcd in real
    JavaScript, registered through the SQL front door and aggregated
    JVM-side around the Arrow-batched calls. DuckDB's gcd() is the
    oracle."""
    import tempfile as _tf

    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, _tf.mkdtemp(prefix="rw_jsq_"))
    eng.sql(
        """CREATE FUNCTION jsgcd(a int8, b int8) RETURNS int8
           LANGUAGE javascript AS $$
        export function jsgcd(a, b) {
            if (a == null || b == null) return null;
            a = Math.abs(a); b = Math.abs(b);
            while (b != 0) { let t = b; b = a % b; a = t; }
            return a;
        } $$"""
    )
    return eng.sql(
        "SELECT l_orderkey AS k, sum(jsgcd(CAST(l_quantity AS int8), "
        "l_partkey)) AS s FROM lineitem WHERE l_orderkey < 400 "
        "GROUP BY l_orderkey ORDER BY k"
    )


@register(
    "udf_js_table",
    oracle="""
SELECT w.word, CAST(length(w.word) AS INT) AS len
FROM (SELECT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 20) w
WHERE w.word <> '' ORDER BY w.word, len
""",
)
def udf_js_table(spark, sf_dir):
    """LANGUAGE javascript table function (js_udf.slt `split`:
    generator UDTF yielding objects keyed by the declared columns) —
    tokenizes document titles; DuckDB string_split+unnest oracle."""
    import tempfile as _tf

    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, _tf.mkdtemp(prefix="rw_jstq_"))
    eng.sql(
        """CREATE FUNCTION jsplit(s varchar)
           RETURNS TABLE (word varchar, len int)
           LANGUAGE javascript AS $$
        export function* jsplit(s) {
            for (let w of s.split(' ')) {
                if (w != '') yield { word: w, len: w.length };
            }
        } $$"""
    )
    return eng.sql(
        "SELECT w.word, w.len FROM documents d, "
        "LATERAL jsplit(d.text) w WHERE d.doc_id < 20 "
        "ORDER BY w.word, w.len"
    )


@register(
    "udf_js_agg",
    oracle="""
SELECT event_type,
       round((CAST(sum(CAST(round(value*10000,0) AS BIGINT) * k) AS BIGINT) * 1.0
              / CAST(sum(k) AS BIGINT)) / 10000.0, 6) AS wavg
FROM (SELECT event_type, value, CAST(props->>'k' AS BIGINT) AS k FROM {EV} e) s
GROUP BY event_type ORDER BY event_type
""".replace("{EV}", EVENTS_US),
)
def udf_js_agg(spark, sf_dir):
    """CREATE AGGREGATE ... LANGUAGE javascript (js_udf.slt
    `weighted_avg`: create_state/accumulate/retract/finish exports) —
    the same exact-cents weighted average as udf_grouped_agg, computed
    by the JS interpreter folding accumulate over each group."""
    import tempfile as _tf

    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, _tf.mkdtemp(prefix="rw_jsaq_"))
    eng.sql(
        """CREATE AGGREGATE jswavg(value int8, weight int8)
           RETURNS float8 LANGUAGE javascript AS $$
        export function create_state() { return {s: 0, w: 0}; }
        export function accumulate(st, v, w) {
            if (v == null || w == null) return st;
            st.s += v * w; st.w += w;
            return st;
        }
        export function retract(st, v, w) {
            if (v == null || w == null) return st;
            st.s -= v * w; st.w -= w;
            return st;
        }
        export function finish(st) {
            if (st.w == 0) return null;
            return st.s / st.w;
        } $$"""
    )
    # exact-cents: value scaled to int64 driver-side so the JS fold is
    # integer-exact; the JS aggregate is SESSION-registered, so it runs
    # directly over the parquet-backed view (no engine table needed)
    tables(spark, sf_dir)["events"].selectExpr(
        "event_type",
        "CAST(round(value * 10000, 0) AS BIGINT) AS scaled",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k",
    ).createOrReplaceTempView("__jsev_src")
    return spark.sql(
        "SELECT event_type, round(jswavg(scaled, k) / 10000.0, 6) AS wavg "
        "FROM __jsev_src GROUP BY event_type ORDER BY event_type"
    )
