"""Scalar-function coverage, part 2 — SURVEY.md §2.7 rows not exercised by
scalar_funcs.py: map functions (reference `scalar/` map files), struct/row
construct + field access (`field.rs`), interval arithmetic
(`arithmetic_op.rs` interval impls), encode/decode (`encdec.rs`,
`string.rs` to_hex), format/pad/translate (`format.rs`, `trim.rs`,
`translate.rs`), JSON construction (`jsonb_build_array/object`), and the
`regexp_matches` table function (`table_function/regexp_matches`).

Where DuckDB lacks the constructor (maps, structs are Spark-side
plumbing), the oracle computes the expected scalar results directly from
the base columns — the check is still exact value equality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import EVENTS_US, tables


@register(
    "fn_map_ops",
    oracle="""
SELECT doc_id,
       lang AS v_lang,
       CAST(n_chars AS VARCHAR) AS v_chars,
       3 AS m_len,
       true AS has_source,
       'chars,lang,source' AS keys_sorted,
       source AS v_filtered
FROM documents WHERE doc_id < 50 ORDER BY doc_id
""",
)
def fn_map_ops(spark, sf_dir):
    """Map functions: construct, concat, access, contains, length, keys,
    filter (reference map_access/map_cat/map_contains/map_length)."""
    t = tables(spark, sf_dir)
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    m2 = F.map_concat(m, F.create_map(F.lit("chars"), F.col("n_chars").cast("string")))
    return (
        t["documents"]
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.element_at(m2, "lang").alias("v_lang"),
            F.element_at(m2, "chars").alias("v_chars"),
            F.size(m2).alias("m_len"),
            F.map_contains_key(m2, "source").alias("has_source"),
            F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("keys_sorted"),
            F.element_at(
                F.map_filter(m2, lambda k, _v: k == "source"), "source"
            ).alias("v_filtered"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_struct_ops",
    oracle="""
SELECT o_orderkey,
       o_totalprice AS price_field,
       o_orderstatus AS nested_field,
       o_orderkey AS arr_elem_key,
       o_orderpriority AS renamed
FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey
""",
)
def fn_struct_ops(spark, sf_dir):
    """Row/struct construct + field access (reference `row` constructor +
    `field.rs`), incl. nested structs and array-of-struct element access."""
    t = tables(spark, sf_dir)
    s = F.struct(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.struct(F.col("o_orderstatus").alias("st")).alias("nest"),
    )
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 60)
        .withColumn("s", s)
        .select(
            "o_orderkey",
            F.col("s.price").alias("price_field"),
            F.col("s.nest.st").alias("nested_field"),
            F.element_at(F.array(F.col("s")), 1).getField("k").alias("arr_elem_key"),
            F.col("o_orderpriority").alias("renamed"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_interval",
    oracle=f"""
SELECT event_id,
       ts + INTERVAL 1 DAY AS plus_day,
       ts - INTERVAL 2 HOUR AS minus_2h,
       ts + INTERVAL 3 MONTH AS plus_3mo,
       ts + INTERVAL 90 MINUTE AS plus_90m,
       CAST(datediff('day', TIMESTAMP '2024-01-01', ts) AS INT) AS days_since
FROM {EVENTS_US} e WHERE event_id < 100 ORDER BY event_id
""",
)
def fn_interval(spark, sf_dir):
    """Interval arithmetic on timestamps (reference interval type,
    `types/interval.rs` + arithmetic): day/hour/month/minute offsets and
    day difference. Month addition clamps to month end in both engines."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_id") < 100)
        .select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("plus_day"),
            (F.col("ts") - F.expr("INTERVAL 2 HOUR")).alias("minus_2h"),
            (F.col("ts") + F.expr("INTERVAL 3 MONTH")).alias("plus_3mo"),
            (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
                "days_since"
            ),
        )
        .orderBy("event_id")
    )


@register(
    "fn_encode",
    oracle="""
SELECT doc_id,
       base64(encode(substr(text, 1, 16))) AS b64,
       substr(text, 1, 24) AS roundtrip,
       hex(doc_id + 1) AS hx,
       upper(printf('%x', n_chars)) AS conv16,
       octet_length(encode(text)) AS n_bytes
FROM documents WHERE doc_id < 50 ORDER BY doc_id
""",
)
def fn_encode(spark, sf_dir):
    """encode/decode family (reference encdec.rs, to_hex): base64 encode,
    base64 round-trip, integer→hex, decimal→hex conversion, byte length."""
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.base64(F.substring("text", 1, 16).cast("binary")).alias("b64"),
            F.decode(
                F.unbase64(F.base64(F.substring("text", 1, 24).cast("binary"))), "UTF-8"
            ).alias("roundtrip"),
            F.hex(F.col("doc_id") + 1).alias("hx"),
            F.conv(F.col("n_chars").cast("string"), 10, 16).alias("conv16"),
            F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_format_pad",
    oracle="""
SELECT c_custkey,
       printf('%s#%04d', c_mktsegment, c_custkey % 1000) AS fmt,
       lpad(c_name, 22, '*') AS lp,
       rpad(c_name, 22, '.') AS rp,
       translate(c_name, 'Cu', 'XY') AS tr,
       repeat('ab', 3) AS rep,
       reverse(c_name) AS rev,
       left(c_name, 5) AS l5,
       right(c_name, 4) AS r4,
       ascii(substr(c_name, 1, 1)) AS asc_first,
       chr(65 + CAST(c_custkey % 26 AS INT)) AS chr_k,
       substr(c_name, 1, 2) || 'ZZ' || substr(c_name, 5) AS ovl,
       upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS icap
FROM customer WHERE c_custkey < 40 ORDER BY c_custkey
""",
)
def fn_format_pad(spark, sf_dir):
    """format/lpad/rpad/translate/repeat/reverse/left/right/ascii/chr/
    overlay/initcap (reference format.rs, trim.rs, translate.rs,
    string.rs). DuckDB lacks overlay/initcap → oracle emulates via
    substr concat, which is their definition."""
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 40)
        .select(
            "c_custkey",
            F.format_string("%s#%04d", F.col("c_mktsegment"), F.col("c_custkey") % 1000).alias(
                "fmt"
            ),
            F.lpad("c_name", 22, "*").alias("lp"),
            F.rpad("c_name", 22, ".").alias("rp"),
            F.translate("c_name", "Cu", "XY").alias("tr"),
            F.repeat(F.lit("ab"), 3).alias("rep"),
            F.reverse("c_name").alias("rev"),
            F.substring("c_name", 1, 5).alias("l5"),
            F.substring(F.col("c_name"), -4, 4).alias("r4"),
            F.ascii(F.substring("c_name", 1, 1)).alias("asc_first"),
            F.chr(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("chr_k"),
            F.overlay("c_name", F.lit("ZZ"), F.lit(3)).alias("ovl"),
            F.initcap(F.lower("c_mktsegment")).alias("icap"),
        )
        .orderBy("c_custkey")
    )


@register(
    "fn_json_build",
    oracle=f"""
SELECT event_id,
       to_json(struct_pack(id := event_id, k := k)) AS j,
       CAST(k AS VARCHAR) AS k_back,
       to_json([k, k * 2, k * 3]) AS jarr,
       3 AS arr_len,
       CAST(k * 2 AS VARCHAR) AS second_elem
FROM (
  SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM {EVENTS_US} e
  WHERE event_id < 100
) s ORDER BY event_id
""",
)
def fn_json_build(spark, sf_dir):
    """JSON construction + re-access (reference jsonb_build_array/object,
    to_jsonb): build object and array JSON, extract back, array length."""
    t = tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    d = t["events"].filter(F.col("event_id") < 100).withColumn("k", k)
    jarr = F.to_json(F.array(F.col("k"), F.col("k") * 2, F.col("k") * 3))
    return d.select(
        "event_id",
        F.to_json(F.struct(F.col("event_id").alias("id"), F.col("k").alias("k"))).alias("j"),
        F.get_json_object(
            F.to_json(F.struct(F.col("event_id").alias("id"), F.col("k").alias("k"))), "$.k"
        ).alias("k_back"),
        jarr.alias("jarr"),
        F.json_array_length(jarr).alias("arr_len"),
        F.get_json_object(jarr, "$[1]").alias("second_elem"),
    ).orderBy("event_id")


@register(
    "tf_regexp_matches",
    oracle="""
SELECT w AS word, count(*) AS n
FROM documents, unnest(regexp_extract_all(text, '[a-z]{4,}')) AS t(w)
GROUP BY w
ORDER BY n DESC, word
LIMIT 25
""",
)
def tf_regexp_matches(spark, sf_dir):
    """regexp_matches as a set-returning table function (reference
    `table_function/regexp_matches`, ProjectSet executor): explode all
    matches per row, then aggregate — Spark's explode(regexp_extract_all)
    is the same row-expansion plan shape."""
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .select(F.explode(F.regexp_extract_all("text", F.lit("[a-z]{4,}"), 0)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(25)
    )


@register(
    "tf_generate_subscripts",
    oracle="""
SELECT doc_id, i AS idx, toks[i] AS tok
FROM (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                     x -> x != '') AS toks
  FROM documents WHERE doc_id < 30
), unnest(range(1, len(toks) + 1)) AS t(i)
ORDER BY doc_id, idx
""",
)
def tf_generate_subscripts(spark, sf_dir):
    """generate_subscripts / unnest WITH ORDINALITY (reference
    `table_function/`, ProjectSet's projected row index): posexplode
    yields (1-based index, element) per array element."""
    t = tables(spark, sf_dir)
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "),
        lambda x: x != "",
    )
    return (
        t["documents"]
        .filter(F.col("doc_id") < 30)
        .select("doc_id", F.posexplode(toks).alias("idx0", "tok"))
        .select("doc_id", (F.col("idx0") + 1).cast("long").alias("idx"), "tok")
        .orderBy("doc_id", "idx")
    )


@register(
    "tf_jsonb_each",
    oracle=f"""
SELECT event_id, k AS key, CAST(props->>'k' AS VARCHAR) AS val
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM {EVENTS_US} e
      WHERE event_id < 200)
ORDER BY event_id, key
""",
)
def tf_jsonb_each(spark, sf_dir):
    """jsonb_each (reference `table_function/jsonb.rs`): explode a JSON
    object into (key, value) rows — from_json to a map, then explode."""
    t = tables(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    return (
        t["events"]
        .filter(F.col("event_id") < 200)
        .select("event_id", F.explode(m).alias("key", "val"))
        .orderBy("event_id", "key")
    )


@register(
    "fn_trig_degrees",
    oracle="""
SELECT n_chars,
       (round(sin(radians(n_chars % 360)), 6) + 0.0) AS sind,
       (round(cos(radians(n_chars % 360)), 6) + 0.0) AS cosd,
       (round(tan(radians(n_chars % 89)), 6) + 0.0) AS tand,
       (round(degrees(atan(n_chars / 100.0)), 6) + 0.0) AS atand,
       (round(cot(radians(n_chars % 89 + 1)), 6) + 0.0) AS cotd
FROM (SELECT DISTINCT n_chars FROM documents) d
ORDER BY n_chars
""",
)
def fn_trig_degrees(spark, sf_dir):
    """Degree-variant trig (reference sind/cosd/tand/cotd/atand,
    `trigonometric.rs`): composed as radians()/degrees() wrappers over
    the radian functions — rounded to 6 digits (JVM vs libm ulp) and +0.0-normalized (negative zero)."""
    t = tables(spark, sf_dir)
    n = F.col("n_chars")
    return (
        t["documents"]
        .select("n_chars")
        .distinct()
        .select(
            "n_chars",
            (F.round(F.sin(F.radians(n % 360)), 6) + 0.0).alias("sind"),
            (F.round(F.cos(F.radians(n % 360)), 6) + 0.0).alias("cosd"),
            (F.round(F.tan(F.radians(n % 89)), 6) + 0.0).alias("tand"),
            (F.round(F.degrees(F.atan(n / 100.0)), 6) + 0.0).alias("atand"),
            (F.round(F.cot(F.radians(n % 89 + 1)), 6) + 0.0).alias("cotd"),
        )
        .orderBy("n_chars")
    )


@register(
    "fn_similar_to",
    oracle="""
SELECT lang, count(*) AS n
FROM documents
WHERE regexp_full_match(text, '^.*(fast|slow) table.*$')
GROUP BY lang ORDER BY lang
""",
)
def fn_similar_to(spark, sf_dir):
    """SQL SIMILAR TO (reference `similar_to_escape.rs`): translated to
    an anchored rlike via functions/pgsql.similar_to_regex. NB: DuckDB's
    SIMILAR TO is plain RE2 full-match (no % wildcard — documented
    deviation), so the oracle applies the SAME translated regex via
    regexp_full_match."""
    from risingwave_spark.functions.pgsql import similar_to_regex

    t = tables(spark, sf_dir)
    rx = similar_to_regex("%(fast|slow) table%")
    return (
        t["documents"]
        .filter(F.col("text").rlike(rx))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )


@register(
    "fn_array_more",
    oracle="""
SELECT doc_id,
       list_position(toks, 'table') AS pos_table,
       len(list_filter(toks, x -> x = 'value')) AS n_value,
       CAST(len(toks) - len(list_filter(toks, x -> x != 'a')) AS INT) AS n_removed,
       array_to_string(toks[2:4], '|') AS mid,
       'r,r,r' AS repeated,
       toks[1] || '+' || toks[len(toks)] AS ends
FROM (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                     x -> x != '') AS toks
  FROM documents WHERE doc_id < 40
) d ORDER BY doc_id
""",
)
def fn_array_more(spark, sf_dir):
    """Array functions part 2 (reference array_position/array_remove/
    trim_array/array_repeat/slice/access): positions, removal counts,
    slices, repeats, first/last element access."""
    from risingwave_spark.operators.dedup import normalize_text

    t = tables(spark, sf_dir)
    toks = F.filter(F.split(normalize_text(F.col("text")), " "), lambda x: x != "")
    d = t["documents"].filter(F.col("doc_id") < 40).withColumn("toks", toks)
    return d.select(
        "doc_id",
        F.array_position("toks", "table").alias("pos_table"),
        F.size(F.filter("toks", lambda x: x == "value")).alias("n_value"),
        (F.size("toks") - F.size(F.array_remove("toks", "a"))).alias("n_removed"),
        F.array_join(F.slice("toks", 2, 3), "|").alias("mid"),
        F.array_join(F.array_repeat(F.lit("r"), 3), ",").alias("repeated"),
        F.concat(
            F.element_at("toks", 1), F.lit("+"), F.element_at("toks", -1)
        ).alias("ends"),
    ).orderBy("doc_id")


@register(
    "fn_json_mutate",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(
         json_merge_patch(props, '{"v2": ' || (CAST(json_extract_string(props, '$.k') AS BIGINT) * 2) || '}'),
         '$.v2') AS BIGINT) AS v2,
       json_extract_string(json_merge_patch(props, '{"k": null}'), '$.k') AS k_deleted,
       CAST(json_array_length('[' || json_extract_string(props, '$.k') || ','
                                  || json_extract_string(props, '$.k') || ']') AS BIGINT) AS arr_len,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events ORDER BY event_id
""",
)
def fn_json_mutate(spark, sf_dir):
    """JSONB mutators (reference `jsonb_set`/`||` concat/`-` delete/
    `jsonb_array_length`, `src/expr/impl/src/scalar/jsonb_*.rs`): Spark has
    no in-place JSON mutators, so the idiomatic mapping is
    from_json → map ops (map_concat to set, map_filter to delete) → to_json;
    results are compared via value extraction, which is serialization-stable
    across engines. All JVM-side higher-order functions — no UDFs."""
    e = tables(spark, sf_dir)["events"]
    m = F.from_json("props", "map<string,bigint>")
    merged = F.to_json(
        F.map_concat(m, F.create_map(F.lit("v2"), F.element_at(m, "k") * 2))
    )
    deleted = F.to_json(F.map_filter(m, lambda k, v: k != F.lit("k")))
    arr = F.to_json(F.array(F.element_at(m, "k"), F.element_at(m, "k")))
    return e.select(
        "event_id",
        F.get_json_object(merged, "$.v2").cast("bigint").alias("v2"),
        F.get_json_object(deleted, "$.k").alias("k_deleted"),
        F.json_array_length(arr).cast("bigint").alias("arr_len"),
        F.element_at(m, "k").alias("k"),
    ).orderBy("event_id")


@register(
    "fn_inet",
    oracle="""
SELECT user_id,
       ip,
       CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
         + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
         + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
         + CAST(split_part(ip, '.', 4) AS BIGINT) AS aton,
       CAST((CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
         + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
         + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
         + CAST(split_part(ip, '.', 4) AS BIGINT)) >> 24 AS VARCHAR) || '.'
         || CAST(((CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
         + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
         + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
         + CAST(split_part(ip, '.', 4) AS BIGINT)) >> 16) & 255 AS VARCHAR) AS ntoa_hi
FROM (
  SELECT DISTINCT user_id,
         CAST(user_id % 256 AS VARCHAR) || '.' || CAST((user_id * 7) % 256 AS VARCHAR)
           || '.' || CAST((user_id * 13) % 256 AS VARCHAR) || '.'
           || CAST((user_id * 29) % 256 AS VARCHAR) AS ip
  FROM events)
ORDER BY user_id
""",
)
def fn_inet(spark, sf_dir):
    """inet_aton / inet_ntoa (reference `scalar/inet.rs`): dotted-quad →
    uint32 and back, expressed as split_part + bitwise shifts — all
    whole-stage-codegen expressions (`shiftright`/`&`), no UDF."""
    e = tables(spark, sf_dir)["events"]
    ip = F.concat_ws(
        ".",
        (F.col("user_id") % 256),
        (F.col("user_id") * 7) % 256,
        (F.col("user_id") * 13) % 256,
        (F.col("user_id") * 29) % 256,
    )
    d = e.select("user_id", ip.alias("ip")).distinct()
    part = lambda i: F.expr(f"CAST(split_part(ip, '.', {i}) AS BIGINT)")  # noqa: E731
    aton = part(1) * 16777216 + part(2) * 65536 + part(3) * 256 + part(4)
    return d.select(
        "user_id",
        "ip",
        aton.alias("aton"),
        F.concat_ws(
            ".",
            F.shiftrightunsigned(aton, 24).cast("string"),
            (F.shiftrightunsigned(aton, 16).bitwiseAND(255)).cast("string"),
        ).alias("ntoa_hi"),
    ).orderBy("user_id")


@register(
    "tf_jsonb_array_elements",
    oracle=f"""
SELECT event_id, CAST(elem AS BIGINT) AS elem
FROM (SELECT event_id,
             unnest(CAST(json_extract('[' || (props->>'k') || ','
                                          || CAST(event_id % 7 AS VARCHAR) || ']',
                         '$[*]') AS BIGINT[])) AS elem
      FROM {EVENTS_US} WHERE event_id < 500)
ORDER BY event_id, elem
""",
)
def tf_jsonb_array_elements(spark, sf_dir):
    """jsonb_array_elements (reference `table_function/jsonb.rs`): explode a
    JSON array into one row per element — from_json to array<bigint>, then
    explode. The array here is built from the row's own values so every
    engine sees identical input."""
    t = tables(spark, sf_dir)
    arr = F.from_json(
        F.concat(
            F.lit("["),
            F.get_json_object("props", "$.k"),
            F.lit(","),
            (F.col("event_id") % 7).cast("string"),
            F.lit("]"),
        ),
        "array<bigint>",
    )
    return (
        t["events"]
        .filter(F.col("event_id") < 500)
        .select("event_id", F.explode(arr).alias("elem"))
        .orderBy("event_id", "elem")
    )


@register(
    "tf_pg_expandarray",
    oracle="""
SELECT doc_id, tok AS x, CAST(idx0 + 1 AS BIGINT) AS n
FROM (SELECT doc_id,
             unnest(string_split(text, ' ')[1:5]) AS tok,
             generate_subscripts(string_split(text, ' ')[1:5], 1) - 1 AS idx0
      FROM documents WHERE doc_id < 100)
WHERE tok IS NOT NULL
ORDER BY doc_id, n
""",
)
def tf_pg_expandarray(spark, sf_dir):
    """_pg_expandarray (reference `table_function/` pg compat): unnest an
    array WITH its 1-based subscript as a (x, n) record — posexplode with the
    index shifted to 1-based."""
    t = tables(spark, sf_dir)
    toks = F.slice(F.split("text", " "), 1, 5)
    return (
        t["documents"]
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.posexplode(toks).alias("idx0", "x"))
        .filter(F.col("x").isNotNull())
        .select("doc_id", "x", (F.col("idx0") + 1).cast("long").alias("n"))
        .orderBy("doc_id", "n")
    )


@register(
    "sys_catalog_scan",
    oracle="""
SELECT table_name FROM information_schema.tables
WHERE table_name IN ('region','nation','customer','supplier','part',
                     'orders','lineitem','events','documents','embeddings')
ORDER BY table_name
""",
)
def sys_catalog_scan(spark, sf_dir):
    """SysRowSeqScan (reference `sys_row_seq_scan.rs:26`, the pg_catalog /
    rw_catalog scan): the engine's registered relations read back from the
    session catalog — Spark's catalog API is the information_schema
    equivalent. The catalog listing itself is driver-side metadata (exactly
    as in the reference, where catalog tables live on the frontend)."""
    tables(spark, sf_dir)  # ensure the ten driver tables are registered
    names = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    listed = [v.name for v in spark.catalog.listTables() if v.name in names]
    return (
        spark.createDataFrame([(n,) for n in sorted(listed)], "table_name string")
        .orderBy("table_name")
    )


@register(
    "sys_pg_catalog",
    oracle="""
SELECT * FROM (VALUES
  ('pgcat_mv', 'm', 'name', 1, 'character varying'),
  ('pgcat_mv', 'm', 'n',    2, 'bigint'),
  ('pgcat_t',  'r', 'id',   1, 'bigint'),
  ('pgcat_t',  'r', 'name', 2, 'character varying'),
  ('pgcat_t',  'r', 'val',  3, 'double precision'),
  ('pgcat_v',  'v', 'id',   1, 'bigint'),
  ('pgcat_v',  'v', 'name', 2, 'character varying')
) AS t(relname, relkind, attname, attnum, typ)
ORDER BY relname, attnum
""",
)
def sys_pg_catalog(spark, sf_dir):
    """pg_catalog compat (reference
    `src/frontend/src/catalog/system_catalog/pg_catalog/` — pg_class.rs:22,
    pg_namespace.rs:22, pg_attribute.rs:26 — and format_type,
    `src/expr/impl/src/scalar/format_type.rs:21`): the canonical psql/BI
    introspection join — pg_class x pg_namespace x pg_attribute with
    format_type — over an engine catalog created through the SQL front
    door. All driver-side metadata (the reference keeps these tables on
    the frontend node); the compat functions are rewritten to plain Spark
    SQL CASE expressions, zero UDFs. The expected rows are fully
    determined by the DDL below, so the oracle is the literal table."""
    import tempfile

    from risingwave_spark.api import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_pgcat_q_"))
    eng.sql(
        """
        CREATE TABLE pgcat_t (id int8 PRIMARY KEY, name text, val float8);
        CREATE MATERIALIZED VIEW pgcat_mv AS
        SELECT name, count(*) AS n FROM pgcat_t GROUP BY name;
        CREATE VIEW pgcat_v AS SELECT id, name FROM pgcat_t;
        """
    )
    return eng.sql(
        """
        SELECT c.relname, c.relkind, a.attname, a.attnum::int4 AS attnum,
               format_type(a.atttypid, a.atttypmod) AS typ
        FROM pg_catalog.pg_class c
        JOIN pg_catalog.pg_namespace n ON c.relnamespace = n.oid
        JOIN pg_catalog.pg_attribute a ON a.attrelid = c.oid
        WHERE n.nspname = 'public' AND pg_table_is_visible(c.oid)
        ORDER BY c.relname, a.attnum
        """
    )


@register(
    "fn_json_path",
    oracle=f"""
WITH j AS (
  SELECT event_id,
         '{{"u":' || user_id || ',"p":' || props ||
         ',"arr":[' || (user_id % 5) || ',' || (user_id % 3) || ']}}' AS doc
  FROM events WHERE event_id < 2000
)
SELECT event_id,
       CAST(json_extract(doc, '$.p.k') AS VARCHAR) AS pk,
       json_extract(doc, '$.arr[1]') IS NOT NULL AS has_second,
       CAST(json_extract(doc, '$.arr') AS VARCHAR) AS arr_all,
       CAST(json_extract(doc, '$.u') AS BIGINT) > 500 AS big_user,
       CAST(json_extract(doc, '$.missing') AS VARCHAR) AS missing
FROM j ORDER BY event_id
""",
)
def fn_json_path(spark, sf_dir):
    """SQL/JSON path functions (reference jsonb_path_exists /
    query_first / query_array / match, `scalar/jsonb_path.rs`): a nested
    document is built from table columns identically in both engines,
    then member / subscript / wildcard paths and a match predicate are
    evaluated (functions/jsonpath.py over get_json_object)."""
    from risingwave_spark.functions.jsonpath import (
        jsonb_path_exists,
        jsonb_path_match,
        jsonb_path_query_array,
        jsonb_path_query_first,
    )

    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") < 2000)
    doc = F.concat(
        F.lit('{"u":'), F.col("user_id"),
        F.lit(',"p":'), F.col("props"),
        F.lit(',"arr":['), F.col("user_id") % 5, F.lit(","), F.col("user_id") % 3,
        F.lit("]}"),
    )
    d = ev.select("event_id", doc.alias("doc"))
    return d.select(
        "event_id",
        jsonb_path_query_first("doc", "$.p.k").alias("pk"),
        jsonb_path_exists("doc", "$.arr[1]").alias("has_second"),
        jsonb_path_query_array("doc", "$.arr[*]").alias("arr_all"),
        jsonb_path_match("doc", "$.u > 500").alias("big_user"),
        jsonb_path_query_first("doc", "$.missing").alias("missing"),
    ).orderBy("event_id")


@register(
    "fn_int256_agg",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(user_id AS HUGEINT) * CAST('10000000000000000000000000000' AS HUGEINT)
                + event_id) AS VARCHAR) AS big_sum,
       CAST(min(CAST(user_id AS HUGEINT) * CAST('10000000000000000000000000000' AS HUGEINT)
                + event_id) AS VARCHAR) AS big_min,
       CAST(max(CAST(user_id AS HUGEINT) * CAST('10000000000000000000000000000' AS HUGEINT)
                + event_id) AS VARCHAR) AS big_max
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def fn_int256_agg(spark, sf_dir):
    """int256 arithmetic + aggregation (reference `src/common/src/types/
    int256.rs`, rw_int256 sum/min/max): values beyond BIGINT range are
    carried as decimal STRINGS and aggregated with Python arbitrary-
    precision ints inside one applyInPandas pass per group — Spark has no
    256-bit type, so the column representation is the documented
    divergence while sums/compares stay exact (DuckDB's 128-bit HUGEINT
    suffices for the oracle because the test values fit well inside it)."""
    import pandas as pd

    ev = tables(spark, sf_dir)["events"].select("event_type", "user_id", "event_id")
    scale = 10**28

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = [int(u) * scale + int(e) for u, e in zip(pdf.user_id, pdf.event_id)]
        return pd.DataFrame(
            {
                "event_type": [pdf.event_type.iloc[0]],
                "big_sum": [str(sum(vals))],
                "big_min": [str(min(vals))],
                "big_max": [str(max(vals))],
            }
        )

    return (
        ev.groupBy("event_type")
        .applyInPandas(
            agg,
            schema="event_type string, big_sum string, big_min string, big_max string",
        )
        .orderBy("event_type")
    )


@register(
    "fn_secure_compare",
    oracle=f"""
SELECT event_id,
       (md5(CAST(user_id AS VARCHAR)) = md5(CAST(event_id % 1000 AS VARCHAR)))
         AS tokens_equal
FROM {EVENTS_US} e WHERE event_id < 2000 ORDER BY event_id
""",
)
def fn_secure_compare(spark, sf_dir):
    """secure_compare (reference `src/expr/impl/src/scalar/` pgcrypto
    surface): constant-time digest equality via hmac.compare_digest in a
    vectorized pandas UDF — the security property (no early-exit timing
    leak) lives in the comparison, the RESULT equals plain equality,
    which is what the oracle checks. The UDF is defined inside the query
    (self-contained closure → pickles by value, no worker import).
    Symmetric encrypt/decrypt: see fn_encrypt_decrypt
    (functions/aescrypt.py — FIPS-197 AES, vector-validated)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: no inline type hints — this module uses `from __future__ import
    # annotations`, which stringifies them and breaks pandas_udf inference
    def _secure_eq(a, b):
        import hmac

        return pd.Series(
            [
                None if x is None or y is None else hmac.compare_digest(x, y)
                for x, y in zip(a, b)
            ]
        )

    _secure_eq.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    secure_eq = pandas_udf(_secure_eq, "boolean")

    ev = tables(spark, sf_dir)["events"].filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        secure_eq(
            F.md5(F.col("user_id").cast("string")),
            F.md5((F.col("event_id") % 1000).cast("string")),
        ).alias("tokens_equal"),
    ).orderBy("event_id")


@register(
    "fn_encrypt_decrypt",
    oracle="""
SELECT doc_id, substr(text, 1, 40) AS plain,
       CAST(((length(substr(text, 1, 40)) // 16) + 1) * 16 AS BIGINT) AS ct_len
FROM documents WHERE doc_id % 100 = 0 ORDER BY doc_id
""",
)
def fn_encrypt_decrypt(spark, sf_dir):
    """pgcrypto encrypt/decrypt (reference
    `src/expr/impl/src/scalar/encrypt.rs`: AES-128/192/256 ECB/CBC,
    PKCS/none padding, `aes[-mode][/pad:...]` config strings) — the
    cipher is implemented from FIPS-197 in `functions/aescrypt.py`
    (S-box derived in GF(2⁸), validated against the FIPS-197 appendix-C
    and SP 800-38A vectors in tests) and runs as an Arrow-batched pandas
    UDF. The query encrypts a text slice under AES-128-CBC/PKCS, checks
    the ciphertext length is the padded block count (DuckDB-computable),
    decrypts, and returns the roundtripped plaintext."""
    import os as _os

    from pyspark.sql.functions import pandas_udf

    import risingwave_spark

    key = bytes(range(16))
    # executor python workers inherit PYTHONPATH, not the driver's
    # sys.path — carry the package root in the closure so the worker can
    # import the cipher wherever the driver was launched from (a cluster
    # deployment ships the package as a wheel instead)
    pkg_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(risingwave_spark.__file__)))

    def _enc(s):
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from risingwave_spark.functions.aescrypt import encrypt as _e

        return s.map(lambda v: None if v is None else _e(v.encode(), key, "aes-cbc"))

    def _dec(s):
        import sys as _sys

        if pkg_root not in _sys.path:
            _sys.path.insert(0, pkg_root)
        from risingwave_spark.functions.aescrypt import decrypt as _d

        return s.map(lambda v: None if v is None else _d(bytes(v), key, "aes-cbc").decode())

    enc_udf = pandas_udf(_enc, "binary")
    dec_udf = pandas_udf(_dec, "string")
    t = tables(spark, sf_dir)
    d = (
        t["documents"]
        .filter(F.col("doc_id") % 100 == 0)
        .select("doc_id", F.substring("text", 1, 40).alias("plain"))
        .withColumn("ct", enc_udf(F.col("plain")))
    )
    return (
        d.select(
            "doc_id",
            dec_udf(F.col("ct")).alias("plain"),
            F.length("ct").cast("long").alias("ct_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_jsonb_record",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_field,
       CAST(json_extract('[{"a":1},{"a":2}]', '$[0].a') AS BIGINT) AS first_a,
       2 AS n_set
FROM events WHERE event_id < 200 ORDER BY event_id
""",
)
def fn_jsonb_record(spark, sf_dir):
    """jsonb_to_record / jsonb_populate_record / jsonb_populate_recordset
    (reference `scalar/jsonb_record.rs:53-158`): JSON text → typed struct
    via Spark's native from_json (schema-directed, the populate_record
    contract), and a recordset fan-out counted via from_json to an array
    of structs — all JVM-side, no UDFs."""
    from pyspark.sql import functions as F

    from risingwave_spark.queries.util import tables

    t = tables(spark, sf_dir)
    rec = "[{\"a\":1},{\"a\":2}]"
    return (
        t["events"]
        .filter(F.col("event_id") < 200)
        .select(
            "event_id",
            F.from_json("props", "k bigint").getField("k").alias("k_field"),
            F.from_json(F.lit(rec), "array<struct<a: bigint>>")[0]
            .getField("a")
            .alias("first_a"),
            F.size(F.from_json(F.lit(rec), "array<struct<a: bigint>>")).alias(
                "n_set"
            ),
        )
        .orderBy("event_id")
    )


@register(
    "fn_time_type",
    oracle="""
SELECT event_id,
       CAST(ts AS TIME) AS t,
       extract(hour FROM CAST(ts AS TIME)) AS h,
       extract(minute FROM CAST(ts AS TIME)) AS m
FROM events WHERE event_id < 20 ORDER BY event_id
""",
)
def fn_time_type(spark, sf_dir):
    """TIME-of-day type (reference `datatype.slt` TIME, `expr/impl` time
    casts): Spark 4.1's TIME type behind spark.sql.timeType.enabled —
    timestamps project to time-of-day (via date_format→to_time; Spark
    has no direct timestamp→time cast), extract works on TIME values,
    and the typed column survives collection. Engine tables accept
    `t time` columns the same way (test_time_type_engine_table)."""
    spark.conf.set("spark.sql.timeType.enabled", "true")
    t = tables(spark, sf_dir)
    tod = F.expr("to_time(date_format(ts, 'HH:mm:ss.SSSSSS'))")
    return (
        t["events"]
        .filter(F.col("event_id") < 20)
        .select(
            "event_id",
            tod.alias("t"),
            F.expr("extract(hour FROM to_time(date_format(ts, 'HH:mm:ss.SSSSSS')))").alias("h"),
            F.expr("extract(minute FROM to_time(date_format(ts, 'HH:mm:ss.SSSSSS')))").alias("m"),
        )
        .orderBy("event_id")
    )
