"""LLM-data-pipeline operators over `documents` and `embeddings`
(the north-star extensions: dedup, similarity search, text analysis,
multimodal plumbing).

Everything is oracle-checked: the hashes are md5 (engine-portable), the
cosine is the exact scaled-integer variant (order-independent), the LSH
banding is replicated in DuckDB SQL via list comprehensions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.operators import textual
from risingwave_spark.operators.dedup import (
    exact_dedup,
    fingerprint,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_a,
    minhash_b,
    simhash,
    MINHASH_P,
)
from risingwave_spark.operators.similarity import cosine_exact, cosine_topk_lsh
from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import tables

# DuckDB renderings of the operator library's canonical expressions
_O_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_O_TOKS = f"list_filter(string_split({_O_NORM}, ' '), x -> x != '')"


def _o_shingles(k: int) -> str:
    return (
        f"[substr({_O_NORM}, i, {k}) "
        f"for i in range(1, greatest(length({_O_NORM}) - {k - 1}, 1) + 1)]"
    )


def _o_minhash(i: int, k: int = 5) -> str:
    # mirrors operators/dedup.py minhash_signature: one md5 base per
    # shingle, i-th hash derived affinely mod 2^31-1
    base = f"(('0x' || substr(md5(s), 1, 15))::BIGINT % {MINHASH_P})"
    return (
        f"list_min(list_transform({_o_shingles(k)}, "
        f"s -> ({minhash_a(i)} * {base} + {minhash_b(i)}) % {MINHASH_P}))"
    )


@register(
    "llm_token_stats",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len({_O_TOKS})) AS BIGINT) AS total_tokens,
       round(CAST(sum(len({_O_TOKS})) AS BIGINT) / count(*), 4) AS avg_tokens,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
""",
)
def llm_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer) per language."""
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("n_tokens", textual.token_count(F.col("text")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("n_tokens") / F.count(F.lit(1)), 4).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@register(
    "llm_quality_score",
    oracle=f"""
SELECT source,
       count(*) FILTER (WHERE q >= 0.6) AS n_good,
       count(*) AS n_docs,
       round(CAST(sum(CAST(round(q*1000000,0) AS BIGINT)) AS BIGINT)/1000000.0 / count(*), 4) AS avg_q
FROM (
  SELECT source,
         round((
           (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text))
           + (len(list_distinct({_O_TOKS})) / len({_O_TOKS}))
           + least(
               (list_aggregate(list_transform({_O_TOKS}, x -> CAST(length(x) AS DOUBLE)), 'sum')
                / len({_O_TOKS})) / 8.0, 1.0)
         ) / 3.0, 6) AS q
  FROM documents
) s
GROUP BY source ORDER BY source
""",
)
def llm_quality_score(spark, sf_dir):
    """Heuristic quality scoring (alpha ratio + repetition + token length),
    the web-corpus-cleaning filter family."""
    t = tables(spark, sf_dir)
    scored = t["documents"].withColumn("q", textual.quality_score(F.col("text")))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.when(F.col("q") >= 0.6, 1)).alias("n_good"),
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (F.sum(F.round(F.col("q") * 1000000, 0).cast("long")) / 1000000.0)
                / F.count(F.lit(1)),
                4,
            ).alias("avg_q"),
        )
        .orderBy("source")
    )


@register(
    "llm_langid",
    oracle=f"""
SELECT lang, pred, count(*) AS n FROM (
  SELECT lang,
         CASE
           WHEN s_en = best AND best > 0 THEN 'en'
           WHEN s_de = best AND best > 0 THEN 'de'
           WHEN s_es = best AND best > 0 THEN 'es'
           WHEN s_fr = best AND best > 0 THEN 'fr'
           ELSE 'und' END AS pred
  FROM (
    SELECT lang,
           len(list_filter({_O_TOKS}, x -> list_contains(['the','and','of','to','in'], x))) AS s_en,
           len(list_filter({_O_TOKS}, x -> list_contains(['der','die','und','nicht','das'], x))) AS s_de,
           len(list_filter({_O_TOKS}, x -> list_contains(['el','la','de','que','y'], x))) AS s_es,
           len(list_filter({_O_TOKS}, x -> list_contains(['le','la','et','les','des'], x))) AS s_fr,
           greatest(
             len(list_filter({_O_TOKS}, x -> list_contains(['the','and','of','to','in'], x))),
             len(list_filter({_O_TOKS}, x -> list_contains(['der','die','und','nicht','das'], x))),
             len(list_filter({_O_TOKS}, x -> list_contains(['el','la','de','que','y'], x))),
             len(list_filter({_O_TOKS}, x -> list_contains(['le','la','et','les','des'], x)))
           ) AS best
    FROM documents
  ) sc
) p
GROUP BY lang, pred ORDER BY lang, pred
""",
)
def llm_langid(spark, sf_dir):
    """Language-ID heuristic (stopword-marker argmax) confusion counts."""
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("pred", textual.lang_id(F.col("text")))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )


@register(
    "llm_exact_dedup",
    oracle=f"""
SELECT count(*) AS n_groups,
       CAST(sum(dup_count) AS BIGINT) AS n_docs,
       count(*) FILTER (WHERE dup_count > 1) AS n_dup_groups
FROM (
  SELECT md5({_O_NORM}) AS fp, min(doc_id) AS doc_id, count(*) AS dup_count
  FROM documents GROUP BY 1
) g
""",
)
def llm_exact_dedup(spark, sf_dir):
    """Exact dedup via normalized-text fingerprint (hash-groupBy)."""
    t = tables(spark, sf_dir)
    groups = exact_dedup(t["documents"], "text", "doc_id")
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("dup_count").alias("n_docs"),
        F.count(F.when(F.col("dup_count") > 1, 1)).alias("n_dup_groups"),
    )


def _o_band(b: int, rows_per_band: int) -> str:
    parts = " || '|' || ".join(
        f"CAST({_o_minhash(b * rows_per_band + r)} AS VARCHAR)" for r in range(rows_per_band)
    )
    return f"md5({parts})"


@register(
    "llm_minhash_lsh",
    oracle=f"""
WITH sig AS (
  SELECT doc_id AS doc,
         {_o_band(0, 4)} AS band0, {_o_band(1, 4)} AS band1,
         {_o_band(2, 4)} AS band2, {_o_band(3, 4)} AS band3
  FROM documents
),
stacked AS (
  SELECT doc, 0 AS band_idx, band0 AS band_hash FROM sig
  UNION ALL SELECT doc, 1, band1 FROM sig
  UNION ALL SELECT doc, 2, band2 FROM sig
  UNION ALL SELECT doc, 3, band3 FROM sig
)
SELECT DISTINCT x.doc AS a, y.doc AS b
FROM stacked x JOIN stacked y
  ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc < y.doc
ORDER BY a, b
""",
)
def llm_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (16 hashes, 4 bands × 4 rows,
    similarity threshold ≈ (1/4)^(1/4) ≈ 0.71): shingle → affine minhash →
    band → bucket-combination pairs (operators/dedup.py — single shuffle,
    no self-join, skew-cappable via max_bucket)."""
    t = tables(spark, sf_dir)
    return lsh_candidate_pairs(
        t["documents"], "doc_id", "text", num_hashes=16, bands=4, k=5,
        num_partitions=spark.sparkContext.defaultParallelism,
    ).orderBy("a", "b")


@register(
    "llm_jaccard_neardup",
    oracle=f"""
WITH sig AS (
  SELECT doc_id AS doc,
         {_o_band(0, 4)} AS band0, {_o_band(1, 4)} AS band1,
         {_o_band(2, 4)} AS band2, {_o_band(3, 4)} AS band3
  FROM documents
),
stacked AS (
  SELECT doc, 0 AS band_idx, band0 AS band_hash FROM sig
  UNION ALL SELECT doc, 1, band1 FROM sig
  UNION ALL SELECT doc, 2, band2 FROM sig
  UNION ALL SELECT doc, 3, band3 FROM sig
),
cand AS (
  SELECT DISTINCT x.doc AS a, y.doc AS b
  FROM stacked x JOIN stacked y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc < y.doc
),
grams AS (SELECT doc_id, list_distinct({_o_shingles(3)}) AS g FROM documents)
SELECT a, b,
       CAST(len(list_intersect(ga.g, gb.g)) AS BIGINT) AS inter,
       round(len(list_intersect(ga.g, gb.g)) /
             (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))), 6) AS jaccard
FROM cand JOIN grams ga ON cand.a = ga.doc_id JOIN grams gb ON cand.b = gb.doc_id
WHERE len(list_intersect(ga.g, gb.g)) /
      (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) >= 0.3
ORDER BY a, b
""",
)
def llm_jaccard_neardup(spark, sf_dir):
    """n-gram Jaccard verification of LSH candidates (≥ 0.3)."""
    t = tables(spark, sf_dir)
    cand = lsh_candidate_pairs(
        t["documents"], "doc_id", "text", num_hashes=16, bands=4, k=5,
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    scored = jaccard_pairs(
        cand, t["documents"], "doc_id", "text", n=3,
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    return (
        scored.filter(F.col("jaccard") >= 0.3)
        .select("a", "b", F.col("inter").cast("long").alias("inter"), F.round("jaccard", 6).alias("jaccard"))
        .orderBy("a", "b")
    )


def _o_simhash(bits: int = 16) -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(bits)
    )
    recon = " + ".join(f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h
  FROM documents, unnest({_O_TOKS}) t(tok)
),
votes AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id)
SELECT doc_id, CAST({recon} AS BIGINT) AS simhash FROM votes ORDER BY doc_id
"""


@register("llm_simhash", oracle=_o_simhash(16))
def llm_simhash(spark, sf_dir):
    """SimHash document fingerprints (16-bit, md5-derived token bits)."""
    t = tables(spark, sf_dir)
    return simhash(t["documents"], "doc_id", "text", bits=16).orderBy("doc_id")


def _o_cos(a: str, b: str) -> str:
    scale = 1 << 20
    si = lambda v: f"list_transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}, 0) AS BIGINT))"  # noqa: E731
    return (
        f"(CAST(list_aggregate(list_transform(range(1, 65), i -> {si(a)}[i] * {si(b)}[i]), 'sum') AS DOUBLE)"
        f" / sqrt(CAST(list_aggregate(list_transform({si(a)}, x -> x*x), 'sum') AS DOUBLE)"
        f" * CAST(list_aggregate(list_transform({si(b)}, x -> x*x), 'sum') AS DOUBLE)))"
    )


@register(
    "llm_cosine_topk",
    oracle=f"""
SELECT query_id, neighbor_id, cos FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_o_cos('q.embedding', 'c.embedding')}, 6) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round({_o_cos('q.embedding', 'c.embedding')}, 6) DESC, c.vec_id
         ) AS rk
  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
  JOIN embeddings c ON q.vec_id <> c.vec_id
) t WHERE rk <= 3 ORDER BY query_id, neighbor_id
""",
)
def llm_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k similarity search (exact baseline).

    Cosine uses 2^20-scaled integer sums → bit-identical cross-engine.
    Scaling + squared norms are computed once per VECTOR map-side
    (scaled_with_sqnorm); the broadcast non-equi join leaves only the dot
    product as per-pair work. The LSH-bucketed ANN scale path is tested in
    tests/test_operators.py.
    """
    t = tables(spark, sf_dir)
    from pyspark.sql import Window as W

    from risingwave_spark.operators.similarity import cosine_prescaled, scaled_with_sqnorm

    # Spread the candidate side: the sf parquet is one row group → one
    # scan task, so the per-row scaling and every per-pair dot after the
    # broadcast join would run on a single core (same fix as
    # lsh_candidate_pairs' num_partitions). Only the c side repartitions —
    # the 5-row broadcast side would pay the shuffle without needing the
    # parallelism (interleaved min-of-5: 0.348 orig / 0.227 both sides /
    # 0.203 c-only).
    e = t["embeddings"]
    q = scaled_with_sqnorm(e.filter(F.col("vec_id") < 5), "vec_id", "embedding", "query")
    c = scaled_with_sqnorm(
        e.repartition(spark.sparkContext.defaultParallelism, "vec_id"),
        "vec_id", "embedding", "neighbor",
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cos",
        F.round(
            cosine_prescaled(
                F.col("query_vec"), F.col("neighbor_vec"), F.col("query_sq"), F.col("neighbor_sq")
            ),
            6,
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "cos")
        .orderBy("query_id", "neighbor_id")
    )


@register(
    "llm_embedding_stats",
    oracle=f"""
SELECT label, count(*) AS n,
       round(CAST(sum(CAST(round(sqrt(CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum') AS DOUBLE))*1000000,0) AS BIGINT)) AS BIGINT)/1000000.0 / count(*), 4) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
""",
)
def llm_embedding_stats(spark, sf_dir):
    """Per-label embedding norms (array HOFs; float32→float64 exact)."""
    t = tables(spark, sf_dir)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    norm_micro = F.round(F.sqrt(sq) * 1000000, 0).cast("long")
    return (
        t["embeddings"]
        .withColumn("nm", norm_micro)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round((F.sum("nm") / 1000000.0) / F.count(F.lit(1)), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )


@register(
    "mm_binary_meta",
    oracle="""
SELECT source,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS n_distinct
FROM documents GROUP BY source ORDER BY source
""",
)
def mm_binary_meta(spark, sf_dir):
    """Multimodal plumbing: treat payloads as opaque binary columns with
    typed metadata (here text→bytes stands in for image/audio blobs; the
    decode UDFs are stubbed in operators/multimodal.py)."""
    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("payload", F.col("text").cast("binary"))
        .groupBy("source")
        .agg(
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.countDistinct(F.md5("text")).alias("n_distinct"),
        )
        .orderBy("source")
    )


@register(
    "mm_decode_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       'fake/raw' AS format,
       ('0x' || substr(md5(text), 1, 4))::INT % 4096 AS width,
       ('0x' || substr(md5(text), 5, 4))::INT % 4096 AS height,
       md5(text) AS checksum
FROM documents WHERE doc_id < 300 ORDER BY doc_id
""",
)
def mm_decode_meta(spark, sf_dir):
    """Multimodal decode via mapInPandas (operators/multimodal.py): binary
    payloads → typed metadata struct on Arrow batches. The decode kernel
    is the documented md5-fake stub, so the whole pipeline — binary
    column, Arrow transfer, struct schema — is oracle-checked end to end.
    """
    from risingwave_spark.operators.multimodal import decode_meta

    t = tables(spark, sf_dir)
    d = (
        t["documents"]
        .filter(F.col("doc_id") < 300)
        .withColumn("payload", F.col("text").cast("binary"))
    )
    out = decode_meta(d, "doc_id", "payload")
    return out.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.checksum").alias("checksum"),
    ).orderBy("doc_id")


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(greatest(1, least(4, octet_length(encode(text)) // 64)) AS BIGINT) AS n_frames,
       CAST(greatest(1, least(4, octet_length(encode(text)) // 64)) - 1 AS INT) AS max_idx
FROM documents WHERE doc_id < 300 ORDER BY doc_id
""",
)
def mm_frame_sample(spark, sf_dir):
    """Video frame sampling plumbing (bounded explode via mapInPandas,
    operators/multimodal.py frame_sample_stub): ≤4 deterministic frames
    per payload; the oracle checks the emitted row shape per asset."""
    from risingwave_spark.operators.multimodal import frame_sample_stub

    t = tables(spark, sf_dir)
    d = (
        t["documents"]
        .filter(F.col("doc_id") < 300)
        .withColumn("payload", F.col("text").cast("binary"))
    )
    frames = frame_sample_stub(d, "doc_id", "payload", max_frames=4)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_idx").alias("max_idx"),
        )
        .orderBy("doc_id")
    )


def _o_ann_bucket() -> str:
    """DuckDB rendering of int_hyperplane_bucket over `embedding`."""
    from risingwave_spark.operators.similarity import ann_planes

    scale = 1 << 20
    terms = []
    for i, p in enumerate(ann_planes(8, 64)):
        lit = "[" + ",".join(str(x) for x in p) + "]"
        dot = (
            f"list_aggregate(list_transform(range(1, 65), d -> "
            f"CAST(round(CAST(embedding[d] AS DOUBLE) * {scale}, 0) AS BIGINT)"
            f" * ({lit})[d]), 'sum')"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "llm_ann_lsh",
    oracle=f"""
WITH b AS (SELECT vec_id, embedding, {_o_ann_bucket()} AS bucket FROM embeddings)
SELECT query_id, neighbor_id, cos FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_o_cos('q.embedding', 'c.embedding')}, 6) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round({_o_cos('q.embedding', 'c.embedding')}, 6) DESC, c.vec_id
         ) AS rk
  FROM (SELECT * FROM b WHERE vec_id < 20) q
  JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
) t WHERE rk <= 3 ORDER BY query_id, neighbor_id
""",
)
def llm_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbors — the similarity-search
    SCALE path (operators/similarity.py): random-hyperplane signatures
    bucket the vectors map-side; cosine is brute-forced only WITHIN the
    query's bucket (1/2^8 of candidates in expectation). Integer-exact
    signatures + scaled-int cosine make the whole ANN pipeline
    oracle-checkable; recall < 1 by construction vs llm_cosine_topk."""
    from pyspark.sql import Window as W

    from risingwave_spark.operators.similarity import (
        ann_planes,
        cosine_prescaled,
        int_hyperplane_bucket,
        scaled_with_sqnorm,
    )

    t = tables(spark, sf_dir)
    planes = ann_planes(8, 64)
    # One-row-group input → single scan task: repartition so the scaling
    # + 8 interpreted plane dots per row parallelize (A/B 0.50 → 0.38 s).
    emb = t["embeddings"].repartition(spark.sparkContext.defaultParallelism, "vec_id")
    base = scaled_with_sqnorm(emb, "vec_id", "embedding", "v")
    base = base.withColumn("bucket", int_hyperplane_bucket(F.col("v_vec"), planes))
    q = base.filter(F.col("v_id") < 20).select(
        F.col("v_id").alias("query_id"),
        F.col("v_vec").alias("q_vec"),
        F.col("v_sq").alias("q_sq"),
        "bucket",
    )
    c = base.select(
        F.col("v_id").alias("neighbor_id"),
        F.col("v_vec").alias("c_vec"),
        F.col("v_sq").alias("c_sq"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                cosine_prescaled(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_sq"), F.col("c_sq")
                ),
                6,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "cos")
        .orderBy("query_id", "neighbor_id")
    )


@register(
    "llm_ann_ivf",
    oracle=f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
), asg AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT v.vec_id, v.embedding, c.cid AS cluster,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY round({_o_cos('v.embedding', 'c.cvec')}, 6) DESC, c.cid) AS rk
    FROM embeddings v CROSS JOIN cent c) t WHERE rk = 1
), probes AS (
  SELECT vec_id AS query_id, embedding AS qvec, cluster FROM (
    SELECT v.vec_id, v.embedding, c.cid AS cluster,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY round({_o_cos('v.embedding', 'c.cvec')}, 6) DESC, c.cid) AS rk
    FROM embeddings v CROSS JOIN cent c WHERE v.vec_id < 10) t WHERE rk <= 2
)
SELECT query_id, neighbor_id, cos FROM (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round({_o_cos('p.qvec', 'a.embedding')}, 6) AS cos,
         row_number() OVER (PARTITION BY p.query_id
           ORDER BY round({_o_cos('p.qvec', 'a.embedding')}, 6) DESC, a.vec_id) AS rk
  FROM probes p JOIN asg a ON a.cluster = p.cluster AND a.vec_id <> p.query_id
) t WHERE rk <= 3 ORDER BY query_id, neighbor_id
""",
)
def llm_ann_ivf(spark, sf_dir):
    """IVF (inverted-file / coarse-quantizer) ANN — the similarity-search
    scale path next to LSH (operators/similarity.py cosine_topk_ivf):
    every vector is assigned to its nearest of 8 coarse centroids by a
    pure MAP-SIDE expression (centroids are plan literals — no join, no
    shuffle); each query probes its 2 nearest cells and brute-forces
    exact cosine only within them (nprobe/n_centroids of the data). At
    100 TB the cluster id is the table's partition column, so a probe is
    partition pruning. Deterministic seed centroids (lowest-id vectors)
    + scaled-int cosine make the full pipeline oracle-checkable;
    kmeans_refine (unit-tested vs numpy) supplies production cells."""
    from risingwave_spark.operators.similarity import cosine_topk_ivf

    t = tables(spark, sf_dir)
    return cosine_topk_ivf(
        t["embeddings"],
        query_pred=lambda vid: vid < 10,
        n_centroids=8,
        nprobe=2,
        k=3,
    ).orderBy("query_id", "neighbor_id")


@register(
    "llm_embed_neardup",
    oracle=f"""
WITH b AS (SELECT vec_id, embedding, {_o_ann_bucket()} AS bucket FROM embeddings)
SELECT x.vec_id AS a, y.vec_id AS b, round({_o_cos('x.embedding', 'y.embedding')}, 6) AS cos
FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round({_o_cos('x.embedding', 'y.embedding')}, 6) >= 0.30
ORDER BY a, b
""",
)
def llm_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the dedup family's semantic
    variant): LSH buckets prune the candidate space map-side, then exact
    scaled-int cosine keeps pairs ≥ 0.30 (threshold fits the synthetic data's similarity range) — the standard semantic-dedup
    pipeline for training corpora at 100 TB (bucket → within-bucket
    verify; never the full O(n²) cross join)."""
    from risingwave_spark.operators.similarity import (
        ann_planes,
        cosine_prescaled,
        int_hyperplane_bucket,
        scaled_with_sqnorm,
    )

    t = tables(spark, sf_dir)
    base = scaled_with_sqnorm(t["embeddings"], "vec_id", "embedding", "v")
    base = base.withColumn("bucket", int_hyperplane_bucket(F.col("v_vec"), ann_planes(8, 64)))
    x = base.select(
        F.col("v_id").alias("a"), F.col("v_vec").alias("a_vec"),
        F.col("v_sq").alias("a_sq"), "bucket",
    )
    y = base.select(
        F.col("v_id").alias("b"), F.col("v_vec").alias("b_vec"),
        F.col("v_sq").alias("b_sq"), "bucket",
    )
    return (
        x.join(y, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cos",
            F.round(
                cosine_prescaled(F.col("a_vec"), F.col("b_vec"), F.col("a_sq"), F.col("b_sq")), 6
            ),
        )
        .filter(F.col("cos") >= 0.30)
        .select("a", "b", "cos")
        .orderBy("a", "b")
    )


@register(
    "llm_gopher_filters",
    oracle=f"""
WITH t AS (SELECT doc_id, {_O_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg,
         list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tg
  FROM t
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
           / len(toks) AS awl,
         CASE WHEN len(bg) > 0 THEN
           CAST(list_max(list_transform(list_distinct(bg),
                d -> len(list_filter(bg, x -> x = d)))) AS DOUBLE) / len(bg)
         ELSE 0.0 END AS top2,
         CASE WHEN len(tg) > 0 THEN
           1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
         ELSE 0.0 END AS dup3
  FROM g
)
SELECT doc_id, n_tokens,
       round(top2, 6) AS top_bigram_frac,
       round(dup3, 6) AS dup_trigram_frac,
       (n_tokens BETWEEN 30 AND 100000 AND awl >= 2.0 AND awl <= 12.0
        AND top2 <= 0.20 AND dup3 <= 0.60) AS keep
FROM m ORDER BY doc_id
""",
)
def llm_gopher_filters(spark, sf_dir):
    """Gopher-style repetition/quality filters (operators/textual.py):
    per-document top-bigram mass, duplicate-trigram mass, and the
    composite keep/drop flag used to gate pre-training corpora. All
    array HOFs inside whole-stage codegen — per-document O(tokens²)
    worst case on a bounded token window, zero shuffle, zero Python;
    at 100 TB this is a pure map stage ahead of the dedup cascade."""
    from risingwave_spark.operators.textual import (
        dup_ngram_frac,
        gopher_keep,
        token_count,
        top_ngram_frac,
    )

    t = tables(spark, sf_dir)
    c = F.col("text")
    return (
        t["documents"]
        .select(
            "doc_id",
            token_count(c).cast("long").alias("n_tokens"),
            F.round(top_ngram_frac(c, 2), 6).alias("top_bigram_frac"),
            F.round(dup_ngram_frac(c, 3), 6).alias("dup_trigram_frac"),
            gopher_keep(c).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "llm_fingerprint",
    oracle="""
SELECT substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 2) AS fp_prefix,
       count(*) AS n,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM documents
GROUP BY fp_prefix HAVING count(*) > 1 ORDER BY fp_prefix
""",
)
def llm_fingerprint(spark, sf_dir):
    """Document fingerprinting (operators/textual.py doc_fingerprint):
    content-hash prefix buckets surfacing collision groups — the cheap
    first pass of a dedup cascade."""
    from risingwave_spark.operators.textual import doc_fingerprint

    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("fp_prefix", F.substring(doc_fingerprint(F.col("text")), 1, 2))
        .groupBy("fp_prefix")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n") > 1)
        .orderBy("fp_prefix")
    )


@register("llm_ann_gemm")  # rows-only: GEMM float sums are order-dependent
def llm_ann_gemm(spark, sf_dir):
    """Arrow/numpy batch ANN (operators/similarity.py cosine_topk_numpy):
    queries collected to a small matrix, candidates scored per partition
    with one GEMM per Arrow batch — the shape that wins at high dims ×
    billions of candidates. No SQL oracle (float reduction order), so the
    driver records the weaker rows-only check; exactness of the HOF paths
    is covered by llm_cosine_topk/llm_ann_lsh."""
    from risingwave_spark.operators.similarity import cosine_topk_numpy

    t = tables(spark, sf_dir)
    e = t["embeddings"]
    qrows = [(r.vec_id, list(r.embedding)) for r in e.filter(F.col("vec_id") < 5).collect()]
    return cosine_topk_numpy(e, qrows, "vec_id", "embedding", k=3).orderBy(
        "query_id", "neighbor_id"
    )


@register(
    "llm_chunk_documents",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), starts AS (
  SELECT doc_id, t, unnest(range(0, len(t), 96)) AS s FROM toks
)
SELECT doc_id,
       CAST(s / 96 AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(t, s + 1, s + 128), ' ') AS chunk_text,
       CAST(least(len(t) - s, 128) AS BIGINT) AS n_tokens
FROM starts ORDER BY doc_id, chunk_idx
""",
)
def llm_chunk_documents(spark, sf_dir):
    """Token-bounded overlapping document chunking (max 128 tokens,
    overlap 32 → stride 96): the context-window packing step of a
    training pipeline, map-side only (split → start sequence →
    posexplode → slice), zero Python and zero shuffle."""
    from risingwave_spark.operators.textual import chunk_documents

    t = tables(spark, sf_dir)
    return chunk_documents(
        t["documents"], "doc_id", "text", max_tokens=128, overlap=32
    ).orderBy("doc_id", "chunk_idx")


@register(
    "llm_stratified_sample",
    oracle="""
WITH gated AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS g
  FROM documents
)
SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS idsum
FROM gated
WHERE g < (CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 80
           WHEN 'de' THEN 100 ELSE 0 END)
GROUP BY lang ORDER BY lang
""",
)
def llm_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (the training-mix step:
    down-weight English to 25%, up-weight zh to 80%, keep all German,
    drop the rest): membership is md5(salt||doc_id) mod 100 — a pure
    function of the row, identical on every run, cluster layout, and
    engine (hence DuckDB-oracle-exact). Map-side projection+filter,
    zero shuffle before the verification aggregate."""
    from risingwave_spark.operators.sampling import stratified_sample

    t = tables(spark, sf_dir)
    sampled = stratified_sample(
        t["documents"], "doc_id", "lang",
        rates={"en": 25, "zh": 80, "de": 100},
        default_rate=0.0,
        salt="mix1",
    )
    return (
        sampled.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("idsum"))
        .orderBy("lang")
    )


@register(
    "llm_dedup_clusters",
    oracle=f"""
WITH RECURSIVE sig AS (
  SELECT doc_id AS doc,
         {{b0}} AS band0, {{b1}} AS band1, {{b2}} AS band2, {{b3}} AS band3
  FROM documents
),
stacked AS (
  SELECT doc, 0 AS band_idx, band0 AS band_hash FROM sig
  UNION ALL SELECT doc, 1, band1 FROM sig
  UNION ALL SELECT doc, 2, band2 FROM sig
  UNION ALL SELECT doc, 3, band3 FROM sig
),
cand AS (
  SELECT DISTINCT x.doc AS a, y.doc AS b
  FROM stacked x JOIN stacked y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc < y.doc
),
grams AS (SELECT doc_id, list_distinct({{sh}}) AS g FROM documents),
pairs AS (
  SELECT a, b FROM cand
  JOIN grams ga ON cand.a = ga.doc_id JOIN grams gb ON cand.b = gb.doc_id
  WHERE len(list_intersect(ga.g, gb.g)) /
        (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) >= 0.3
),
edges AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
)
SELECT src AS doc_id,
       CAST(min(node) AS BIGINT) AS cluster_id,
       (src = min(node)) AS is_canonical
FROM reach GROUP BY src ORDER BY doc_id
""".format(
        b0=_o_band(0, 4), b1=_o_band(1, 4), b2=_o_band(2, 4), b3=_o_band(3, 4),
        sh=_o_shingles(3),
    ),
)
def llm_dedup_clusters(spark, sf_dir):
    """Duplicate-CLUSTER resolution — the step after pairwise near-dup
    detection in a training-data pipeline: connected components over
    the Jaccard-verified LSH pairs (operators/dedup.py
    connected_components, min-label propagation with per-iteration
    localCheckpoint), labeling every involved doc with its cluster's
    min doc_id and flagging the canonical keeper. At 100 TB the edge
    list is orders of magnitude smaller than the corpus (only near-dup
    pairs), so the iterated join is bounded by dup mass, not data
    size."""
    from risingwave_spark.operators.dedup import connected_components

    t = tables(spark, sf_dir)
    cand = lsh_candidate_pairs(
        t["documents"], "doc_id", "text", num_hashes=16, bands=4, k=5,
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    pairs = jaccard_pairs(
        cand, t["documents"], "doc_id", "text", n=3,
        num_partitions=spark.sparkContext.defaultParallelism,
    ).filter(
        F.col("jaccard") >= 0.3
    )
    comp = connected_components(pairs, "a", "b")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    ).orderBy("doc_id")


def _o_ngrams_n(n: int) -> str:
    """DuckDB rendering of operators/textual.py token_ngrams_n (normalized
    word n-grams; empty list when the doc has fewer than n tokens)."""
    return (
        f"[array_to_string(list_slice({_O_TOKS}, i, i + {n - 1}), ' ') "
        f"for i in range(1, greatest(len({_O_TOKS}) - {n - 1}, 0) + 1)]"
    )


@register(
    "llm_decontaminate",
    oracle=f"""
WITH grams AS (
  SELECT doc_id, list_distinct({_o_ngrams_n(4)}) AS g FROM documents
),
bench AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 29 = 0),
corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % 29 <> 0),
hits AS (
  SELECT c.doc_id, count(*) AS n_hit
  FROM (SELECT doc_id, unnest(g) AS gram FROM corpus) c
  JOIN bench USING (gram) GROUP BY c.doc_id
)
SELECT corpus.doc_id,
       CAST(len(g) AS BIGINT) AS n_grams,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit_grams,
       coalesce(n_hit, 0) > 0 AS contaminated
FROM corpus LEFT JOIN hits USING (doc_id) ORDER BY corpus.doc_id
""",
)
def llm_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C n-gram overlap): a
    held-out eval set (doc_id % 29 = 0 here) is reduced to its distinct
    token 4-grams and BROADCAST against the training corpus; any shared
    gram flags the doc. The corpus side never shuffles for the probe —
    the only exchange is the per-doc hit count — so the shape holds
    when the corpus is 100 TB and the benchmark is thousands of docs."""
    from risingwave_spark.operators.textual import decontaminate

    t = tables(spark, sf_dir)
    docs = t["documents"]
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    corpus = docs.filter(F.col("doc_id") % 29 != 0)
    return decontaminate(corpus, bench, "doc_id", "text", n=4).orderBy("doc_id")


@register(
    "llm_pack_sequences",
    oracle="""
WITH t AS (
  SELECT lang, doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM documents
), c AS (
  SELECT lang, doc_id, n,
         CAST(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n AS s
  FROM t
), span AS (
  SELECT lang, doc_id, n, s,
         unnest(range(s // 64, (s + n - 1) // 64 + 1)) AS seq_id
  FROM c
)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(least((seq_id + 1) * 64, s + n) - greatest(seq_id * 64, s)) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM span GROUP BY lang, seq_id ORDER BY lang, seq_id
""",
)
def llm_pack_sequences(spark, sf_dir):
    """Concat-and-split sequence packing (the GPT-style pre-training
    batcher): docs laid end-to-end per language in doc_id order, cut
    into 64-token training sequences; boundary docs contribute their
    overlap to both sides. One window cumsum per language partition +
    narrow fan-out to spanned sequences + one groupBy."""
    from risingwave_spark.operators.textual import pack_sequences

    t = tables(spark, sf_dir)
    return (
        pack_sequences(t["documents"], "doc_id", "text", "lang", block=64)
        .select(
            F.col("part").alias("lang"), "seq_id", "n_docs", "n_tokens",
            "first_doc", "last_doc",
        )
        .orderBy("lang", "seq_id")
    )


# the synthetic corpus carries no natural PII, so the scrub query derives a
# deterministic PII-bearing column from doc_id (with a non-PII lookalike as a
# negative control), scrubs it, and hash-compares the scrubbed text.
_O_PII_TEXT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com"
    " backup ' || CAST(doc_id AS VARCHAR) || '.example.org ip 10.' ||"
    " CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' call +1-555-' ||"
    " lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0')"
)


def _o_pii_scrub() -> str:
    """DuckDB twin of the pii_scrub pass — the regex patterns come from
    operators/textual.py PII_PATTERNS verbatim (single source of truth;
    no f-string so the regex quantifier braces survive)."""
    from risingwave_spark.operators.textual import PII_PATTERNS

    return """
WITH raw AS (SELECT doc_id, {pii} AS s FROM documents),
scrub AS (
  SELECT doc_id,
         len(regexp_extract_all(s, '{email}')) AS n_email,
         regexp_replace(s, '{email}', '<EMAIL>', 'g') AS s1
  FROM raw
), scrub2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(s1, '{ipv4}')) AS n_ipv4,
         regexp_replace(s1, '{ipv4}', '<IPV4>', 'g') AS s2
  FROM scrub
), scrub3 AS (
  SELECT doc_id, n_email, n_ipv4,
         len(regexp_extract_all(s2, '{phone}')) AS n_phone,
         regexp_replace(s2, '{phone}', '<PHONE>', 'g') AS s3
  FROM scrub2
)
SELECT doc_id, CAST(n_email AS BIGINT) AS n_email, CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_phone AS BIGINT) AS n_phone, md5(s3) AS scrubbed_md5
FROM scrub3 ORDER BY doc_id
""".format(pii=_O_PII_TEXT, **PII_PATTERNS)


@register("llm_pii_scrub", oracle=_o_pii_scrub())
def llm_pii_scrub(spark, sf_dir):
    """PII scrubbing (emails -> <EMAIL>, IPv4 -> <IPV4>, phones ->
    <PHONE>) with per-kind redaction counts — the privacy-filter pass of
    a web-corpus pipeline, pure regexp built-ins in whole-stage codegen
    (operators/textual.py pii_scrub). The corpus text is word-salad, so
    the PII spans are derived deterministically from doc_id; the
    '<doc_id>.example.org' domain is the negative control (no @, must
    survive). The scrubbed text is md5-compared against the oracle."""
    from risingwave_spark.operators.textual import pii_scrub

    t = tables(spark, sf_dir)
    d = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"), F.lit(" contact user"), d.cast("string"),
        F.lit("@mail.example.com backup "), d.cast("string"),
        F.lit(".example.org ip 10."), (d % 256).cast("string"), F.lit("."),
        ((d * 3) % 256).cast("string"), F.lit("."),
        ((d * 7) % 256).cast("string"), F.lit(" call +1-555-"),
        F.lpad(((d * 37) % 10000).cast("string"), 4, "0"),
    )
    res = pii_scrub(pii_text)
    return (
        t["documents"]
        .select("doc_id", res.alias("r"))
        .select(
            "doc_id",
            F.col("r.n_email").cast("long").alias("n_email"),
            F.col("r.n_ipv4").cast("long").alias("n_ipv4"),
            F.col("r.n_phone").cast("long").alias("n_phone"),
            F.md5(F.col("r.scrubbed")).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "llm_tfidf_topk",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({{toks}}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
ranked AS (
  SELECT doc_id, token, tf, df,
         row_number() OVER (PARTITION BY doc_id
             ORDER BY CAST(tf AS DOUBLE) / df DESC, token) AS rn
  FROM tf JOIN dfreq USING (token)
)
SELECT doc_id, token AS top_token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM ranked WHERE rn = 1 ORDER BY doc_id
""".format(toks=_O_TOKS),
)
def llm_tfidf_topk(spark, sf_dir):
    """Top distinguishing term per document by rarity-weighted term
    frequency (tf / df — the linear-idf variant; ranking keys stay in
    exact IEEE division so both engines order identically). Single-pass
    lineage: the document frequency is an unordered window COUNT over
    the token partition of the tf frame (one row per (doc, token), so
    the partition row count IS df) — no self-join, so the heavy
    (doc, token) shuffle happens exactly once; then one exchange by
    token and one by doc for the rank-1 window (which Catalyst folds to
    WindowGroupLimit — top-1 is computed partially before the doc
    exchange)."""
    from pyspark.sql import Window as W
    from risingwave_spark.operators.textual import tokens

    t = tables(spark, sf_dir)
    tok = t["documents"].select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    w = W.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.col("token").asc()
    )
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("token")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", F.col("token").alias("top_token"),
            F.col("tf").cast("long").alias("tf"), F.col("df").cast("long").alias("df"),
        )
        .orderBy("doc_id")
    )


_O_QI = (
    "CAST(round(round(("
    "(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text))"
    f" + (len(list_distinct({_O_TOKS})) / len({_O_TOKS}))"
    f" + least((list_aggregate(list_transform({_O_TOKS}, x -> CAST(length(x) AS DOUBLE)), 'sum')"
    f" / len({_O_TOKS})) / 8.0, 1.0)"
    ") / 3.0, 6) * 1000000, 0) AS BIGINT)"
)


@register(
    "llm_dedup_survivors",
    oracle=f"""
WITH RECURSIVE sig AS (
  SELECT doc_id AS doc,
         {{b0}} AS band0, {{b1}} AS band1, {{b2}} AS band2, {{b3}} AS band3
  FROM documents
),
stacked AS (
  SELECT doc, 0 AS band_idx, band0 AS band_hash FROM sig
  UNION ALL SELECT doc, 1, band1 FROM sig
  UNION ALL SELECT doc, 2, band2 FROM sig
  UNION ALL SELECT doc, 3, band3 FROM sig
),
cand AS (
  SELECT DISTINCT x.doc AS a, y.doc AS b
  FROM stacked x JOIN stacked y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc < y.doc
),
grams AS (SELECT doc_id, list_distinct({{sh}}) AS g FROM documents),
pairs AS (
  SELECT a, b FROM cand
  JOIN grams ga ON cand.a = ga.doc_id JOIN grams gb ON cand.b = gb.doc_id
  WHERE len(list_intersect(ga.g, gb.g)) /
        (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) >= 0.3
),
edges AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(src, node) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
),
comp AS (SELECT src AS doc_id, min(node) AS cluster FROM reach GROUP BY src),
qd AS (SELECT doc_id, lang, {{qi}} AS qi FROM documents),
labeled AS (
  SELECT qd.doc_id, qd.lang, qd.qi, coalesce(comp.cluster, qd.doc_id) AS cluster
  FROM qd LEFT JOIN comp ON qd.doc_id = comp.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY qi DESC, doc_id) AS rn
  FROM labeled
)
SELECT lang, count(*) AS n_survivors, CAST(sum(doc_id) AS BIGINT) AS idsum
FROM ranked WHERE rn = 1 GROUP BY lang ORDER BY lang
""".format(
        b0=_o_band(0, 4), b1=_o_band(1, 4), b2=_o_band(2, 4), b3=_o_band(3, 4),
        sh=_o_shingles(3), qi=_O_QI,
    ),
)
def llm_dedup_survivors(spark, sf_dir):
    """The dedup-cascade FINISHER: LSH candidates → Jaccard-verified
    pairs → connected components → keep the BEST-QUALITY doc per
    near-dup cluster (quality tiebreak: lowest doc_id; docs in no
    cluster survive as their own singleton). Quality ranks by the
    scaled-integer score (round(q,6)*1e6 — exact in both engines), so
    the survivor choice is engine-portable. The component labels are
    bounded by dup mass and BROADCAST back onto the corpus; the only
    full-corpus exchanges are the rank-1 window on cluster and the
    final per-language rollup."""
    from pyspark.sql import Window as W
    from risingwave_spark.operators.dedup import connected_components
    from risingwave_spark.operators.textual import quality_score

    t = tables(spark, sf_dir)
    docs = t["documents"]
    cand = lsh_candidate_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, k=5,
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    pairs = jaccard_pairs(
        cand, docs, "doc_id", "text", n=3,
        num_partitions=spark.sparkContext.defaultParallelism,
    ).filter(
        F.col("jaccard") >= 0.3
    )
    comp = connected_components(pairs, "a", "b").withColumnRenamed("node", "doc_id")
    qd = docs.select(
        "doc_id", "lang",
        F.round(quality_score(F.col("text")) * 1000000, 0).cast("long").alias("qi"),
    )
    labeled = qd.join(F.broadcast(comp), "doc_id", "left").withColumn(
        "cluster", F.coalesce("component", "doc_id")
    )
    w = W.partitionBy("cluster").orderBy(F.col("qi").desc(), F.col("doc_id").asc())
    surv = labeled.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        surv.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_survivors"), F.sum("doc_id").alias("idsum"))
        .orderBy("lang")
    )
