"""Scalar-function coverage.

Parity targets (SURVEY.md §2.7, reference `src/expr/impl/src/scalar/`):
string ops (substr.rs, trim.rs, position.rs, replace.rs, translate.rs,
repeat.rs, split_part.rs, string.rs), hashing (md5.rs, sha.rs), regexp
(regexp.rs), math (arithmetic_op.rs, round.rs, exp.rs), trig
(trigonometric.rs), bitwise (bitwise_op.rs), date/time (extract.rs,
date_trunc.rs, to_char.rs), conditional (case.rs, coalesce.rs), casts
(cast.rs), JSONB accessors (jsonb_*.rs), array ops (array*.rs).

Cross-engine notes: initcap doesn't exist in DuckDB 1.0 (skipped);
PG `to_char` format strings are translated to Java patterns Spark-side and
strftime DuckDB-side; libm results (trig/exp) are rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import tables


@register(
    "fn_string_basic",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS uname, lower(p_brand) AS lbrand,
       length(p_name) AS len, substr(p_name, 1, 5) AS pre,
       p_name || '/' || p_brand AS joined,
       trim('  pad  ') AS trimmed,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
       reverse(p_brand) AS rev,
       repeat('-', p_size % 4) AS dashes,
       left(p_name, 3) AS l3, right(p_name, 3) AS r3,
       replace(p_name, ' ', '_') AS snake
FROM part WHERE p_partkey < 50 ORDER BY p_partkey
""",
)
def fn_string_basic(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 50)
        .select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.lower("p_brand").alias("lbrand"),
            F.length("p_name").alias("len"),
            F.substring("p_name", 1, 5).alias("pre"),
            F.concat_ws("/", "p_name", "p_brand").alias("joined"),
            F.trim(F.lit("  pad  ")).alias("trimmed"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
            F.reverse("p_brand").alias("rev"),
            F.repeat(F.lit("-"), (F.col("p_size") % 4).cast("int")).alias("dashes"),
            F.substring("p_name", 1, 3).alias("l3"),
            F.expr("right(p_name, 3)").alias("r3"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        )
    )


@register(
    "fn_string_split",
    oracle="""
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS color,
       split_part(p_name, ' ', 2) AS shape,
       strpos(p_name, ' ') AS sp,
       translate(p_brand, 'Brand#', 'brAND_') AS tr,
       ascii(p_name) AS a0,
       chr(65 + p_size % 26) AS ch
FROM part WHERE p_partkey < 50 ORDER BY p_partkey
""",
)
def fn_string_split(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 50)
        .select(
            "p_partkey",
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("color"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("shape"),
            F.instr(F.col("p_name"), " ").alias("sp"),
            F.translate("p_brand", "Brand#", "brAND_").alias("tr"),
            F.ascii("p_name").alias("a0"),
            F.chr(F.lit(65) + F.col("p_size") % 26).alias("ch"),
        )
    )


@register(
    "fn_hashes",
    oracle="""
SELECT d.doc_id, md5(d.text) AS h_md5, sha256(d.text) AS h_sha256
FROM documents d WHERE d.doc_id < 20 ORDER BY d.doc_id
""",
)
def fn_hashes(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("doc_id") < 20)
        .select("doc_id", F.md5("text").alias("h_md5"), F.sha2(F.col("text"), 256).alias("h_sha256"))
    )


@register(
    "fn_regexp",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
       regexp_replace(text, '\\s+', '_', 'g') AS underscored,
       regexp_matches(text, 'window') AS has_window,
       len(regexp_split_to_array(text, '\\s+')) AS n_tokens
FROM documents WHERE doc_id < 20 ORDER BY doc_id
""",
)
def fn_regexp(spark, sf_dir):
    """regexp_match/replace/split (reference regexp.rs). Patterns restricted
    to the RE2∩Java-regex common subset so engines agree."""
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
            F.regexp_replace("text", r"\s+", "_").alias("underscored"),
            F.col("text").rlike("window").alias("has_window"),
            F.size(F.split("text", r"\s+")).alias("n_tokens"),
        )
    )


@register(
    "fn_math",
    oracle="""
SELECT o_orderkey,
       abs(o_totalprice - 250000.0) AS dist,
       CAST(ceil(o_totalprice / 1000.0) AS BIGINT)  AS kceil,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS kfloor,
       round(o_totalprice, 1) AS r1,
       round(sqrt(o_totalprice), 6) AS sq,
       round(ln(o_totalprice), 6) AS lg,
       round(log10(o_totalprice), 6) AS l10,
       round(exp(o_totalprice / 1000000.0), 6) AS ex,
       round(pow(o_totalprice, 0.5), 6) AS pw,
       CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS sg,
       o_orderkey % 7 AS m7
FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
""",
)
def fn_math(spark, sf_dir):
    t = tables(spark, sf_dir)
    p = F.col("o_totalprice")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.abs(p - 250000.0).alias("dist"),
            F.ceil(p / 1000.0).alias("kceil"),
            F.floor(p / 1000.0).alias("kfloor"),
            F.round(p, 1).alias("r1"),
            F.round(F.sqrt(p), 6).alias("sq"),
            F.round(F.log(p), 6).alias("lg"),
            F.round(F.log10(p), 6).alias("l10"),
            F.round(F.exp(p / 1000000.0), 6).alias("ex"),
            F.round(F.pow(p, 0.5), 6).alias("pw"),
            F.signum(p - 250000.0).alias("sg"),
            (F.col("o_orderkey") % 7).alias("m7"),
        )
    )


@register(
    "fn_trig",
    oracle="""
SELECT n_nationkey,
       round(sin(n_nationkey), 6) AS s,
       round(cos(n_nationkey), 6) AS c,
       round(atan2(n_nationkey, 7.0), 6) AS a2,
       round(degrees(atan(n_nationkey)), 6) AS deg,
       round(radians(n_nationkey * 10.0), 6) AS rad
FROM nation ORDER BY n_nationkey
""",
)
def fn_trig(spark, sf_dir):
    t = tables(spark, sf_dir)
    k = F.col("n_nationkey")
    return t["nation"].select(
        "n_nationkey",
        F.round(F.sin(k), 6).alias("s"),
        F.round(F.cos(k), 6).alias("c"),
        F.round(F.atan2(k.cast("double"), F.lit(7.0)), 6).alias("a2"),
        F.round(F.degrees(F.atan(k)), 6).alias("deg"),
        F.round(F.radians(k * 10.0), 6).alias("rad"),
    )


@register(
    "fn_bitwise",
    oracle="""
SELECT l_linenumber,
       l_linenumber & 5 AS ba, l_linenumber | 9 AS bo,
       xor(l_linenumber, 3) AS bx,
       l_linenumber << 2 AS shl, l_linenumber >> 1 AS shr
FROM lineitem WHERE l_orderkey < 30 ORDER BY l_orderkey, l_linenumber
""",
)
def fn_bitwise(spark, sf_dir):
    t = tables(spark, sf_dir)
    n = F.col("l_linenumber")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 30)
        .orderBy("l_orderkey", "l_linenumber")
        .select(
            "l_linenumber",
            n.bitwiseAND(F.lit(5)).alias("ba"),
            n.bitwiseOR(F.lit(9)).alias("bo"),
            n.bitwiseXOR(F.lit(3)).alias("bx"),
            F.shiftleft(n, 2).alias("shl"),
            F.shiftright(n, 1).alias("shr"),
        )
    )


@register(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)  AS y,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT)   AS d,
       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       date_trunc('day', o_orderdate) + INTERVAL 90 DAY AS plus90,
       strftime(o_orderdate, '%Y-%m') AS ym,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
""",
)
def fn_datetime(spark, sf_dir):
    """extract/date_trunc/to_char/interval arithmetic (reference extract.rs,
    date_trunc.rs, to_char.rs). PG to_char 'YYYY-MM' ≡ Java 'yyyy-MM' ≡
    strftime '%Y-%m'. DuckDB dayofweek = Sunday 0; Spark dayofweek =
    Sunday 1 → minus 1."""
    t = tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.year(d).cast("long").alias("y"),
            F.month(d).cast("long").alias("mo"),
            F.dayofmonth(d).cast("long").alias("d"),
            (F.dayofweek(d) - 1).cast("long").alias("dow"),
            F.date_trunc("month", d).alias("month_start"),
            (F.date_trunc("day", d) + F.expr("INTERVAL 90 DAYS")).alias("plus90"),
            F.date_format(d, "yyyy-MM").alias("ym"),
            F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        )
    )


@register(
    "fn_case_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000.0 THEN 'big'
            WHEN o_totalprice > 100000.0 THEN 'mid'
            ELSE 'small' END AS bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
       least(o_totalprice, 200000.0) AS capped,
       greatest(CAST(o_custkey AS BIGINT), 100) AS floor_key
FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
""",
)
def fn_case_cond(spark, sf_dir):
    t = tables(spark, sf_dir)
    p = F.col("o_totalprice")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.when(p > 300000.0, "big").when(p > 100000.0, "mid").otherwise("small").alias("bucket"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status2"),
            F.least(p, F.lit(200000.0)).alias("capped"),
            F.greatest(F.col("o_custkey"), F.lit(100).cast("long")).alias("floor_key"),
        )
    )


@register(
    "fn_casts",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS k_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS k_roundtrip,
       CAST(floor(o_totalprice) AS BIGINT) AS p_int,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
       CAST('42' AS INT) AS forty2,
       CAST('3.5' AS DOUBLE) AS three5,
       CAST(o_orderkey % 2 AS BOOLEAN) AS odd
FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
""",
)
def fn_casts(spark, sf_dir):
    """Cast matrix (reference cast.rs). double→int uses explicit floor:
    DuckDB CAST rounds while Spark truncates — divergence documented."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").alias("k_str"),
            F.col("o_orderkey").cast("string").cast("long").alias("k_roundtrip"),
            F.floor("o_totalprice").cast("long").alias("p_int"),
            F.col("o_orderdate").cast("date").cast("string").alias("d"),
            F.lit("42").cast("int").alias("forty2"),
            F.lit("3.5").cast("double").alias("three5"),
            (F.col("o_orderkey") % 2).cast("boolean").alias("odd"),
        )
    )


@register(
    "fn_json_access",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       json_extract_string(props, '$.missing') AS absent
FROM events WHERE event_id < 50 ORDER BY event_id
""",
)
def fn_json_access(spark, sf_dir):
    """JSONB accessors ->/->>/jsonb_extract_path (reference jsonb_access.rs)
    → get_json_object paths."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_id") < 50)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("long").alias("k_num"),
            F.get_json_object("props", "$.missing").alias("absent"),
        )
    )


@register(
    "fn_array_ops",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_v,
       CAST(embedding[64] AS DOUBLE) AS last_v,
       round(list_aggregate(embedding, 'sum'), 4) AS vsum,
       CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax,
       CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vmin,
       list_contains(embedding, 0.0) AS has_zero
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
""",
)
def fn_array_ops(spark, sf_dir):
    """Array functions (reference array*.rs): cardinality, access, min/max,
    sum (via higher-order aggregate), contains. float32 values are exact in
    both engines; the running float64 sum is sequential left-to-right in
    Spark's aggregate() and DuckDB's list_aggregate → rounded anyway."""
    t = tables(spark, sf_dir)
    e = F.col("embedding")
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 20)
        .select(
            "vec_id",
            F.size(e).alias("dim"),
            F.element_at(e, 1).cast("double").alias("first_v"),
            F.element_at(e, 64).cast("double").alias("last_v"),
            F.round(
                F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
            ).alias("vsum"),
            F.array_max(e).cast("double").alias("vmax"),
            F.array_min(e).cast("double").alias("vmin"),
            F.array_contains(e, F.lit(0.0).cast("float")).alias("has_zero"),
        )
    )


@register(
    "fn_array_transform",
    oracle="""
SELECT vec_id,
       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_pos
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
""",
)
def fn_array_transform(spark, sf_dir):
    """Higher-order array lambdas: transform/filter/aggregate
    (reference array_transform.rs; Spark HOFs run JVM-side, no UDF)."""
    t = tables(spark, sf_dir)
    e = F.col("embedding")
    sq = F.transform(e, lambda x: x.cast("double") * x.cast("double"))
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 20)
        .select(
            "vec_id",
            F.round(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x), 4).alias("sq_norm"),
            F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        )
    )
