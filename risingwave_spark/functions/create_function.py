"""`CREATE FUNCTION` / `CREATE AGGREGATE` DDL → Spark-native runtimes.

Reference surface (`src/frontend/src/handler/create_sql_function.rs`,
`create_function.rs`, `create_aggregate.rs`; e2e_test/udf/sql_udf.slt,
python_udf.slt):

- ``LANGUAGE sql``: the body is ``select <expr>`` over ``$1..$n`` or
  named parameters. The reference inlines these at bind time
  (`bind_sql_udf`); the Spark-native equivalent is a **Spark SQL UDF**
  (``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN expr``, Spark 4) —
  Catalyst inlines the expression into whole-stage codegen, so a SQL UDF
  call costs the same as writing the expression by hand (verified: the
  physical plan shows the substituted expression, no UDF node). Nested
  SQL-UDF calls and ``RETURNS TABLE`` bodies are native too.
- ``LANGUAGE python``: the body defines ``def <name>(...)``; evaluation
  is an **Arrow-batched pandas UDF** applying the function per element
  (the reference embeds a CPython interpreter per compute node,
  `udf/python.rs` — same contract: scalar Python semantics, NULL in as
  None, batch transport in Arrow).
- ``CREATE AGGREGATE ... LANGUAGE python``: the body defines
  ``create_state / accumulate [/ retract] / finish``; evaluation is a
  **grouped-agg pandas UDF** folding ``accumulate`` over the group and
  registered for SQL GROUP BY use. MV maintenance recomputes affected
  groups from their full row set (this engine's group-agg contract), so
  ``retract`` is accepted but not required.
- external ``USING LINK``: delegated to `udf_external.external_pandas_udf`
  (Arrow-IPC subprocess — the arrow-udf Flight contract over pipes).
"""

from __future__ import annotations

import re

import pandas as pd


def parse_fn_params(text: str) -> list[tuple[str | None, str]]:
    """``a INT, b varchar`` or ``INT, INT`` → [(name|None, pg_type)].

    The reference allows mixing named and unnamed parameters
    (sql_udf.slt "Mixed with named / unnamed parameters")."""
    out: list[tuple[str | None, str]] = []
    depth = 0
    start = 0
    parts: list[str] = []
    for i, ch in enumerate(text):
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    for part in parts:
        part = part.strip()
        if not part:
            continue
        bits = part.split(None, 1)
        # one word = unnamed type; two+ = name + type, unless the first
        # word is itself a (possibly two-word) type name like DOUBLE
        # PRECISION / TIMESTAMP WITH TIME ZONE
        if len(bits) == 1:
            out.append((None, bits[0]))
        elif bits[0].lower() in (
            "double", "timestamp", "time", "character", "timestamptz",
        ) and bits[1].lower() in (
            "precision", "with time zone", "without time zone", "varying",
        ):
            out.append((None, part))
        else:
            out.append((bits[0], bits[1]))
    return out


def arg_names(params: list[tuple[str | None, str]]) -> list[str]:
    """Stable SQL-visible parameter names: declared name, else __a<k>."""
    return [pn if pn else f"__a{i + 1}" for i, (pn, _t) in enumerate(params)]


def sql_udf_spark_ddl(
    name: str,
    params: list[tuple[str | None, str]],
    returns: str,
    body_sql: str,
    map_type,
    pg_to_spark_sql,
) -> str:
    """Compile a ``LANGUAGE sql`` body to Spark's native SQL-UDF DDL.

    ``$k`` positional references become the k-th parameter name; the
    ``select`` head is stripped for scalar bodies (Spark's RETURN takes
    an expression); ``RETURNS TABLE (...)`` bodies keep their full query.
    """
    names = arg_names(params)

    def _sub_positional(text: str) -> str:
        def repl(m: re.Match) -> str:
            k = int(m.group(1))
            if not (1 <= k <= len(names)):
                raise ValueError(
                    f"SQL UDF {name}: ${k} out of range (function has "
                    f"{len(names)} parameters)"
                )
            return names[k - 1]

        return re.sub(r"\$(\d+)", repl, text)

    body = _sub_positional(body_sql.strip().rstrip(";"))
    arg_ddl = ", ".join(
        f"{n} {map_type(t)}" for n, (_pn, t) in zip(names, params)
    )
    tm = re.match(r"^TABLE\s*\((?P<cols>.*)\)\s*$", returns.strip(), re.I | re.S)
    if tm:
        cols = ", ".join(
            f"{pn} {map_type(pt)}"
            for pn, pt in parse_fn_params(tm.group("cols"))
        )
        return (
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arg_ddl}) "
            f"RETURNS TABLE({cols}) RETURN {pg_to_spark_sql(body)}"
        )
    expr = re.sub(r"^\s*SELECT\s+", "", body, flags=re.I)
    return (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arg_ddl}) "
        f"RETURNS {map_type(returns)} RETURN {pg_to_spark_sql(expr)}"
    )


def _exec_body(name: str, body: str) -> dict:
    """Run the user's function body; returns its namespace."""
    ns: dict = {}
    exec(body, ns)  # noqa: S102 — user-authored UDF body, the product surface
    return ns


def python_scalar_udf(name: str, body: str, ret_spark_type: str, n_args: int,
                      pg_param_types: list[str] | None = None,
                      pg_returns: str = ""):
    """``LANGUAGE python`` scalar function → Arrow-batched pandas UDF.

    The body must define ``def <name>(...)`` (the reference resolves the
    entry point by the function's own name, python_udf.slt). Type
    bridge per the reference's python runtime (python_udf.slt
    py_typeof/return_all): jsonb ↔ dict, bytea ↔ bytes, decimal ↔
    Decimal, struct args as dicts and struct returns mapped by field."""
    from pyspark.sql.functions import pandas_udf

    ns = _exec_body(name, body)
    fn = ns.get(name)
    if not callable(fn):
        cands = [v for k, v in ns.items() if callable(v) and not k.startswith("_")]
        if len(cands) == 1:
            fn = cands[0]
        else:
            raise ValueError(
                f"LANGUAGE python body must define a function named {name!r}"
            )
    if n_args == 0:
        # pandas UDFs need >=1 column to size the batch; a zero-arg
        # function is a plain scalar — register row-wise (constant cost)
        return fn, None
    ptypes = [t.lower().split("(")[0].strip()
              for t in (pg_param_types or [""] * n_args)]
    rtype = pg_returns.lower().split("(")[0].strip()
    struct_fields = (
        [pn for pn, _t in parse_fn_params(
            pg_returns.strip()[len("struct<"):-1])]
        if rtype.startswith("struct") else None
    )

    def _eval(*cols):
        # self-contained closure: no module-level references, so workers
        # never need this package importable (cloudpickle by value)
        import json as _json

        import pandas as _pd

        def clean(v):
            if isinstance(v, (dict, list, tuple)):
                return v
            return None if _pd.isna(v) else v

        def col_values(c):
            if isinstance(c, _pd.DataFrame):  # struct column
                return [None if all(_pd.isna(x) for x in rec.values())
                        else {k: clean(x) for k, x in rec.items()}
                        for rec in c.to_dict("records")]
            return [clean(v) for v in c.tolist()]

        def arg_in(v, t):
            if v is None:
                return None
            if t in ("jsonb", "json"):
                return _json.loads(v) if isinstance(v, str) else v
            if t == "bytea":
                return bytes(v)
            return v

        def ret_out(v):
            if v is None:
                return None
            if rtype in ("jsonb", "json"):
                return _json.dumps(v, separators=(",", ":"))
            if rtype == "bytea" and not isinstance(v, (bytes, bytearray)):
                return bytes(v)
            return v

        rows = zip(*[col_values(c) for c in cols])
        out = [ret_out(fn(*[arg_in(v, t) for v, t in zip(r, ptypes)]))
               for r in rows]
        if struct_fields is not None:
            # struct returns ride a DataFrame (a Series of dicts does
            # not map to StructType through Arrow); objects with
            # attributes work too (python_udf.slt's class-style rows)
            def fld(r, f):
                if r is None:
                    return None
                if isinstance(r, dict):
                    return r.get(f)
                return getattr(r, f, None)

            return _pd.DataFrame(
                [{f: fld(r, f) for f in struct_fields} for r in out])
        return _pd.Series(out, dtype="object")

    return fn, pandas_udf(_eval, ret_spark_type)


def python_table_udf(name: str, body: str, cols: list[tuple[str, str]], ret_ddl: str):
    """``RETURNS TABLE (...) LANGUAGE python`` → a native Spark Python
    UDTF (reference python_udf.slt `series`/`split`: the body defines a
    GENERATOR; each yielded item is a scalar for one-column tables, a
    tuple, or an object whose attributes match the declared columns).
    Used in table position: ``SELECT * FROM series(5)`` (select-position
    table functions are a documented divergence — Spark places UDTFs in
    FROM)."""
    from pyspark.sql.functions import udtf

    ns = _exec_body(name, body)
    fn = ns.get(name)
    if not callable(fn):
        cands = [v for k, v in ns.items() if callable(v) and not k.startswith("_")]
        fn = cands[0] if len(cands) == 1 else None
    if fn is None:
        raise ValueError(
            f"LANGUAGE python body must define a function named {name!r}"
        )
    colnames = [c for c, _t in cols]

    class _TableFn:
        def eval(self, *args):
            for item in fn(*args):
                if isinstance(item, tuple):
                    yield item
                elif hasattr(item, "__dict__"):
                    yield tuple(getattr(item, c) for c in colnames)
                else:
                    yield (item,)

    return udtf(_TableFn, returnType=ret_ddl)


def python_aggregate_udf(name: str, body: str, ret_spark_type: str):
    """``CREATE AGGREGATE ... LANGUAGE python`` → grouped-agg pandas UDF.

    Contract (reference python_udf.slt `create aggregate weighted_avg`):
    the body defines ``create_state() -> S``, ``accumulate(S, *args) -> S``,
    optionally ``retract``, and ``finish(S) -> value``. Spark evaluates
    per group over Arrow batches; MV maintenance recomputes affected
    groups from their full row set, so only the accumulate path runs.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    ns = _exec_body(name, body)
    missing = [k for k in ("create_state", "accumulate", "finish") if k not in ns]
    if missing:
        raise ValueError(
            f"CREATE AGGREGATE {name}: python body must define "
            f"create_state/accumulate/finish (missing {missing})"
        )
    create_state, accumulate, finish = ns["create_state"], ns["accumulate"], ns["finish"]

    def _agg(*cols):
        # self-contained (see _eval): workers don't import this package
        import pandas as _pd

        st = create_state()
        for row in zip(
            *[[None if _pd.isna(v) else v for v in c.tolist()] for c in cols]
        ):
            st = accumulate(st, *row)
        return finish(st)

    return pandas_udf(_agg, ret_spark_type, PandasUDFType.GROUPED_AGG)


def _pkg_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _js_prepare(name: str, body: str, is_table: bool,
                param_names: list[str]) -> str:
    """Validate a LANGUAGE javascript body at CREATE time and return
    the canonical (wrapped-if-legacy) module text. The reference's
    legacy form has no ``export``/``function`` wrapper — the body IS
    the function body (js_udf.slt int_42_legacy/series_legacy).
    Mirrors quickjs.rs: try the raw body as a module first; only when
    that fails to compile or to expose ``name`` retry with the legacy
    wrap — so a bare body that merely MENTIONS the word 'function' in
    a string or comment still classifies as legacy."""
    from risingwave_spark.functions.js_runtime import (
        compile_js,
        get_function,
        wrap_legacy,
    )

    try:
        fn = get_function(compile_js(body), name)
    except Exception as module_err:
        try:
            wrapped = wrap_legacy(body, name, param_names, is_table)
            fn = get_function(compile_js(wrapped), name)
        except Exception:
            # neither form works: the module-attempt error is the
            # honest diagnostic (it names the missing export / the
            # original syntax error, not the wrapper's artifacts)
            raise module_err from None
        body = wrapped
    if is_table and not fn.is_gen:
        raise ValueError(
            f"RETURNS TABLE LANGUAGE javascript function {name!r} "
            "must be a generator (function* ... yield)")
    return body


def js_scalar_udf(name: str, body: str, ret_spark_type: str,
                  pg_param_types: list[str], pg_returns: str,
                  param_names: list[str] | None = None):
    """``LANGUAGE javascript`` scalar function → Arrow-batched pandas
    UDF running the pure-Python JS interpreter per element (reference
    `udf/quickjs.rs` embeds QuickJS per compute node; same contract:
    NULL in as null, decimal as exact big-decimal, bytea as byte
    array, jsonb parsed)."""
    from pyspark.sql.functions import pandas_udf

    body = _js_prepare(
        name, body, False,
        param_names or [f"a{i}" for i in range(len(pg_param_types))])
    pkg_root = _pkg_root()
    # struct field names resolve DRIVER-side (workers must not import
    # this module — only js_runtime via the pkg_root sys.path insert)
    struct_fields = (
        [pn for pn, _t in parse_fn_params(
            pg_returns.strip()[len("struct<"):-1])]
        if pg_returns.lower().lstrip().startswith("struct") else None
    )

    def _eval(*cols):
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import pandas as _pd

        from risingwave_spark.functions.js_runtime import (
            call_js,
            compile_js,
            get_function,
            js_to_sql,
            sql_to_js,
        )

        interp = compile_js(body)
        fn = get_function(interp, name)

        def clean(v):
            # containers (struct→dict, array→list) are never NA-scalar
            if isinstance(v, (dict, list, tuple)):
                return v
            return None if _pd.isna(v) else v

        def col_values(c):
            if isinstance(c, _pd.DataFrame):
                # struct columns ride as a DataFrame: one dict per row,
                # an all-NaN row = SQL NULL struct
                return [None if all(_pd.isna(x) for x in rec.values())
                        else {k: clean(x) for k, x in rec.items()}
                        for rec in c.to_dict("records")]
            return [clean(v) for v in c.tolist()]

        rows = zip(*[col_values(c) for c in cols])
        out = [
            js_to_sql(
                call_js(interp, fn, [
                    sql_to_js(v, t)
                    for v, t in zip(r, pg_param_types)
                ]),
                pg_returns,
            )
            for r in rows
        ]
        if struct_fields is not None:
            # struct returns need a pandas DataFrame (a Series of
            # dicts does not map to StructType through Arrow)
            return _pd.DataFrame(
                [{f: (None if r is None else r.get(f))
                  for f in struct_fields} for r in out])
        return _pd.Series(out, dtype="object")

    if not pg_param_types:
        # zero-arg: no batch to size a pandas UDF with — plain scalar
        from risingwave_spark.functions.js_runtime import (
            call_js,
            compile_js,
            get_function,
            js_to_sql,
        )

        interp = compile_js(body)
        fn = get_function(interp, name)
        return lambda: js_to_sql(call_js(interp, fn, []), pg_returns)
    return pandas_udf(_eval, ret_spark_type)


def js_table_udf(name: str, body: str, cols: list[tuple[str, str]],
                 ret_ddl: str, pg_param_types: list[str],
                 param_names: list[str] | None = None):
    """``RETURNS TABLE (...) LANGUAGE javascript`` → Spark Python UDTF
    whose eval drains the JS generator's collected yields (reference
    js_udf.slt series/split: scalars for one-column tables, objects
    keyed by the declared column names otherwise)."""
    from pyspark.sql.functions import udtf

    body = _js_prepare(
        name, body, True,
        param_names or [f"a{i}" for i in range(len(pg_param_types))])
    pkg_root = _pkg_root()
    colnames = [c for c, _t in cols]
    coltypes = [t for _c, t in cols]

    class _JsTableFn:
        def eval(self, *args):
            import sys

            if pkg_root not in sys.path:
                sys.path.insert(0, pkg_root)
            from risingwave_spark.functions.js_runtime import (
                UNDEF,
                call_js,
                compile_js,
                get_function,
                js_to_sql,
                sql_to_js,
            )

            interp = compile_js(body)
            fn = get_function(interp, name)
            jsargs = [sql_to_js(v, t)
                      for v, t in zip(args, pg_param_types)]
            for item in call_js(interp, fn, jsargs):
                if isinstance(item, dict):
                    yield tuple(
                        js_to_sql(item.get(c, UNDEF), t)
                        for c, t in zip(colnames, coltypes))
                elif isinstance(item, (list, tuple)):
                    yield tuple(
                        js_to_sql(v, t)
                        for v, t in zip(item, coltypes))
                else:
                    yield (js_to_sql(item, coltypes[0]),)

    return udtf(_JsTableFn, returnType=ret_ddl)


def js_aggregate_udf(name: str, body: str, ret_spark_type: str,
                     pg_param_types: list[str], pg_returns: str):
    """``CREATE AGGREGATE ... LANGUAGE javascript`` → grouped-agg
    pandas UDF folding the JS ``accumulate`` over the group (reference
    js_udf.slt weighted_avg: create_state/accumulate/retract/finish;
    retract is accepted but MV maintenance recomputes affected groups
    from their full row set, same as the python-aggregate path)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from risingwave_spark.functions.js_runtime import compile_js

    interp0 = compile_js(body)  # loud at CREATE
    missing = [k for k in ("create_state", "accumulate", "finish")
               if k not in interp0.exports]
    if missing:
        raise ValueError(
            f"CREATE AGGREGATE {name}: javascript body must export "
            f"create_state/accumulate/finish (missing {missing})")
    pkg_root = _pkg_root()

    def _agg(*cols):
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import pandas as _pd

        from risingwave_spark.functions.js_runtime import (
            call_js,
            compile_js,
            js_to_sql,
            sql_to_js,
        )

        interp = compile_js(body)
        st = call_js(interp, interp.exports["create_state"], [])
        acc = interp.exports["accumulate"]
        for row in zip(
            *[[None if _pd.isna(v) else v for v in c.tolist()]
              for c in cols]
        ):
            st = call_js(interp, acc, [st] + [
                sql_to_js(v, t) for v, t in zip(row, pg_param_types)])
        return js_to_sql(
            call_js(interp, interp.exports["finish"], [st]), pg_returns)

    return pandas_udf(_agg, ret_spark_type, PandasUDFType.GROUPED_AGG)


def aggregate_empty_value(lang: str, name: str, body: str,
                          pg_returns: str):
    """The UDAF's value over an EMPTY input: finish(create_state()).

    Spark's grouped-agg pandas UDFs produce ZERO rows for a global
    aggregate over empty input (builtins produce one); the SimpleAgg
    MV seed needs the one-row value, so it's computed once at CREATE
    and spliced into the seed query as a literal."""
    if lang == "python":
        ns = _exec_body(name, body)
        return ns["finish"](ns["create_state"]())
    from risingwave_spark.functions.js_runtime import (
        call_js,
        compile_js,
        js_to_sql,
    )

    interp = compile_js(body)
    st = call_js(interp, interp.exports["create_state"], [])
    return js_to_sql(
        call_js(interp, interp.exports["finish"], [st]), pg_returns)


def unquote_body(raw: str) -> str:
    """Strip ``$tag$ ... $tag$`` dollar-quoting or ``'...'`` quoting."""
    raw = raw.strip()
    m = re.match(r"^\$([A-Za-z_0-9]*)\$(?P<b>.*)\$\1\$$", raw, re.S)
    if m:
        return m.group("b")
    if raw.startswith("'") and raw.endswith("'"):
        return raw[1:-1].replace("''", "'")
    return raw
