"""Deduplication operators for large-scale (training-data) pipelines.

Exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard — the operator
family a 100 TB document pipeline needs. All are pure DataFrame
compositions (JVM-side, whole-stage-codegen'd); no Python UDFs in the hot
path. Hash primitive is md5 (bit-identical across engines → oracle-able),
not Spark's murmur `hash()`.

Scale design:
- signatures are a codegen'd explode + groupBy-min keyed on the doc id
  (`minhash_signature`); the aggregation's exchange is elided when the
  caller pre-partitions by the id (`num_partitions` — all current
  callers do), so the stage stays map-side in practice;
- LSH banding turns near-dup search from O(n²) into a self-join on
  (band_idx, band_hash) — the join key is the band hash, so the shuffle
  distributes evenly unless a band is degenerate (mitigate: salt or cap
  bucket size with a count filter, `max_bucket` arg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def normalize_text(col):
    """Lowercase, collapse whitespace — canonical form for fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col):
    """Exact-dup fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact (normalized) text fingerprint.

    Single shuffle on the fingerprint; min_by is partial-agg friendly.
    """
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


# MinHash universe: h_i(s) = (A_i * (base(s) mod P) + B_i) mod P over the
# 60-bit md5-prefix integer base(s). One md5 per shingle; the i-th hash is
# derived arithmetically (classic affine MinHash), so adding hash functions
# is ~free. Constants are fixed so the DuckDB oracle can replicate exactly.
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_a(i: int) -> int:
    return (i * 2654435761 + 12345) % MINHASH_P | 1


def minhash_b(i: int) -> int:
    return (i * 40503 + 17) % MINHASH_P


def shingles(col, k: int = 5):
    """Character k-shingle array of the normalized text (map-side HOF).

    NB: `col` should be an already-materialized normalized-text COLUMN,
    not an inline expression — Catalyst substitutes single-use aliases
    into the transform lambda, re-evaluating them once per array element
    (measured 8x slowdown with an inline regexp). Use `with_shingles`.
    """
    n = F.greatest(F.length(col) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(k)))


def with_shingles(df: DataFrame, text_col: str, k: int, out: str = "__sh") -> DataFrame:
    """Stage normalize → shingle as separate projections.

    The `__norm` alias is referenced twice downstream (length bound +
    lambda body), which stops CollapseProject from inlining the regexp
    back into the per-element lambda — it is evaluated once per row.
    """
    d = df.withColumn("__norm", normalize_text(F.col(text_col)))
    return d.withColumn(out, shingles(F.col("__norm"), k)).drop("__norm")


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, k: int = 5
) -> DataFrame:
    """(doc, mh0..mhN-1) MinHash signature table. `id_col` must be unique
    (a signature TABLE is keyed by doc): the per-doc aggregate collapses
    duplicate ids, where the old per-row form emitted one row per input.

    Plan shape: project(norm) → Generate(explode positions) →
    project(substr+md5+conv) → HashAggregate(N mins per doc). Everything
    after the normalize runs WHOLE-STAGE CODEGEN: higher-order functions
    (transform/aggregate over the shingle array) evaluate interpreted,
    so the previous array-HOF form — even with all N minima fused into
    one aggregate() struct pass (itself 1.8× over N array_min passes,
    session-1 #4) — paid interpreted md5+affine math per element. The
    explode is pipelined (no array materialization, rows never leave the
    task: groupBy(doc) reuses the caller's hash partitioning on the id
    via alias-aware output partitioning, and partial aggregation bounds
    the agg hash table at the task's doc count), so the rewrite swaps
    interpreted expression eval for codegen at identical shuffle shape
    — guide §1.2 per-task work. A/B (quiet box, interleaved min-of-6,
    full LSH pipeline, noop): 1.280 → 1.100 s, same 6 jobs / 4
    Exchanges; signature stage alone 1.037 → 0.808 s. Output verified
    row-identical (EQUAL on the full corpus + edge-case unit test).
    """
    d = df.select(
        F.col(id_col).alias("doc"),
        normalize_text(F.col(text_col)).alias("__norm"),
    )
    # same shingle positions as with_shingles/shingles(): 1..max(len-k+1, 1)
    n = F.greatest(F.length("__norm") - (k - 1), F.lit(1))
    ex = d.select("doc", "__norm", F.explode(F.sequence(F.lit(1), n)).alias("__i"))
    # null text → null norm → greatest(null,1)=1 → one null shingle →
    # null h → min over {null} = null: exactly the array-HOF semantics
    # (null-seeded least()), bit-for-bit
    s = F.col("__norm").substr(F.col("__i"), F.lit(k))
    h = (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MINHASH_P).alias("__h")
    ex = ex.select("doc", h)
    return ex.groupBy("doc").agg(
        *[
            F.min(
                (F.lit(minhash_a(i)) * F.col("__h") + F.lit(minhash_b(i))) % MINHASH_P
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    max_bucket: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """MinHash-LSH: docs sharing any band of the signature become a
    candidate pair (a < b). Returns distinct (a, b). `id_col` must be
    unique per document (forwarded to `minhash_signature`, whose per-doc
    aggregate would silently merge rows sharing an id into one
    signature).

    Scale design (the part that must survive 100 TB):
    - signatures are map-side only; `num_partitions` repartitions the raw
      docs first so hashing parallelizes even from a single input file;
    - ONE corpus-sized shuffle: groupBy (band_idx, band_hash) buckets;
      pairs are generated per bucket with array HOFs (no self-join, no
      broadcast, no second signature evaluation). The final distinct()
      is a second, candidate-set-sized shuffle on (a, b) — ≪ corpus,
      and required because the same pair can collide in several bands;
    - degenerate buckets are the skew risk — `max_bucket` drops buckets
      with more than that many docs (standard LSH practice: a bucket
      that big is a stop-phrase collision, not near-duplication).
    """
    rows_per_band = num_hashes // bands
    if num_partitions:
        df = df.repartition(num_partitions, id_col)
    sig = minhash_signature(df, id_col, text_col, num_hashes, k)
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc", *band_cols)
    stacked = banded.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash"))
                    for b in range(bands)
                ]
            )
        ).alias("z"),
    ).select("doc", F.col("z.band_idx").alias("band_idx"), F.col("z.band_hash").alias("band_hash"))
    buckets = stacked.groupBy("band_idx", "band_hash").agg(
        F.array_sort(F.collect_list("doc")).alias("docs")
    )
    buckets = buckets.filter(F.size("docs") > 1)
    if max_bucket is not None:
        buckets = buckets.filter(F.size("docs") <= max_bucket)
    # all ordered pairs within a bucket: for i<j emit (docs[i], docs[j])
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "docs",
                    lambda x, i: F.transform(
                        F.slice("docs", i + 2, F.size("docs")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return pairs.distinct()


def ngram_set(col, n: int = 3):
    """Distinct character n-gram array (for Jaccard).

    Convenience single-expression form; in hot paths prefer
    `with_shingles` + `array_distinct` so the normalization isn't
    re-evaluated per element (see `shingles` docstring).
    """
    return F.array_distinct(shingles(normalize_text(col), n))


def jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    prune_to_candidates: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach n-gram Jaccard similarity to candidate (a, b) pairs.

    Joins the (small) candidate set against doc texts twice; the heavy
    set-intersection runs as JVM HOFs on the joined rows.

    `prune_to_candidates=True` materializes the pair set eagerly and
    computes grams only for docs appearing in a pair — the right shape
    when candidates are a small fraction of the corpus (a clean 100 TB
    corpus after LSH). Default False: the gram pass stays one lazy
    fully-pipelined plan over all docs, which wins whenever most docs
    ARE candidates (dedup-heavy corpora — measured 2.4× faster at
    bench scale, where the synthetic corpus is all near-dups) and
    costs only the one extra shingle map over non-candidates otherwise.

    `num_partitions` repartitions the doc texts before the gram pass —
    the same contract as `lsh_candidate_pairs`: the per-row shingle +
    array_distinct work is the expensive part, and a narrow input (one
    parquet row group → one scan task) would otherwise run it on a
    single core (measured 11× on the gram stage, 3.5 s → 1.1 s on the
    whole verify step at bench scale).
    """
    cand_docs = docs.select(F.col(id_col), text_col)
    if prune_to_candidates:
        # candidate-generation plan would otherwise evaluate twice:
        # once for the id pruning, once in the output join
        pairs = pairs.localCheckpoint(eager=True)
        cand_ids = (
            pairs.select(F.col("a").alias(id_col))
            .unionByName(pairs.select(F.col("b").alias(id_col)))
            .distinct()
        )
        cand_docs = cand_docs.join(cand_ids, id_col, "left_semi")
    if num_partitions:
        cand_docs = cand_docs.repartition(num_partitions, id_col)
    # Grams stay STRINGS: A/B-measured (fresh JVM, sf0.1, min-of-4) the
    # per-element `transform(x -> xxhash64(x))` rewrite costs MORE than
    # intersecting the short strings it replaced (2.35s vs 1.67s for the
    # whole query) — hashing every array element is an expression eval
    # per gram, while the string intersect is one vectorized pass.
    g = with_shingles(cand_docs, text_col, n).select(
        F.col(id_col), F.array_distinct("__sh").alias("__grams")
    )
    # g is joined twice (a-side and b-side); persist so the shingle
    # computation runs once WITHIN this call — measured faster than an
    # eager localCheckpoint (whose blocking write serializes on the
    # input's partitioning) and than recomputing per side. Lifecycle
    # (ADVICE r4): exactly ONE gram table is ever live — the next call
    # unpersists the previous one. There is deliberately NO cross-call
    # reuse (r12 optimization-round contract: no module-level memo of
    # results — every invocation recomputes from the parquet inputs;
    # the earlier sameSemantics() memo flattered min-of-N bench reps,
    # the exact failure bench.py's r4 re-baseline documents).
    while _GRAM_CACHE:
        try:
            _GRAM_CACHE.pop().unpersist()
        except Exception:
            pass
    g = g.persist()
    _GRAM_CACHE.append(g)
    # Non-deterministic identity barrier on `inter` (shuffle() of a
    # 1-element array is value-identity but flagged non-deterministic):
    # every consumer filters on the derived jaccard, and a deterministic
    # projection lets Catalyst push that filter INTO the b-side join
    # condition — where size(array_intersect) is then evaluated a second
    # time per pair (the r12 plan showed it in both the SMJ condition and
    # the post-join Project). The barrier keeps the filter above the
    # projection so the heaviest per-pair op runs exactly once — the same
    # duplication fix as udf.asNondeterministic (guide §4.4), expressed
    # for a built-in.
    inter = F.element_at(
        F.shuffle(F.array(F.size(F.array_intersect("ga", "gb")))), 1
    )
    out = (
        pairs.join(g.select(F.col(id_col).alias("a"), F.col("__grams").alias("ga")), "a")
        .join(g.select(F.col(id_col).alias("b"), F.col("__grams").alias("gb")), "b")
        .withColumn("inter", inter)
        # grams are distinct per doc → |A ∪ B| = |A| + |B| − |A ∩ B|;
        # array_union() costs the same hash pass as array_intersect()
        # (both interpreted, no codegen), so deriving the union size
        # arithmetically halves the per-pair set work (guide §1.2)
        .withColumn("uni", F.size("ga") + F.size("gb") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .drop("ga", "gb")
    )
    return out


#: the one live persisted gram table — lifecycle registry only (the next
#: call evicts it; never reused across calls — see jaccard_pairs)
_GRAM_CACHE: list = []


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash over whitespace tokens: per bit position, majority vote of
    md5-derived token bits; similar docs get small Hamming distance.

    Plan shape: explode tokens (map-side), ONE groupBy(id) with `bits`
    conditional sums — partial aggregation keeps the shuffle tiny.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda x: x != "")
        ).alias("tok"),
    )
    # 60-bit integer from the md5 prefix (15 hex chars) — JVM-side conv()
    toks = toks.withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = agg.select(
        F.col(id_col),
        sum(
            [F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(bits)],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sim


def dedup_first_per_key(df: DataFrame, keys: list[str], order_col: str, tiebreak: str) -> DataFrame:
    """DISTINCT ON / first-row-wins dedup (reference AppendOnlyDedup,
    `dedup/append_only_dedup.rs:27`): earliest `order_col` per key."""
    w = W.partitionBy(*keys).orderBy(F.col(order_col).asc(), F.col(tiebreak).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iters: int = 20
) -> DataFrame:
    """Connected components over an undirected edge set by min-label
    propagation — the cluster-collapse step of a dedup cascade (pairs →
    duplicate CLUSTERS; each doc keeps the cluster's minimum id as its
    component label).

    Scale shape: per iteration ONE join of the (bounded) edge list
    against current labels plus one min-agg — all partial-agged
    map-side — and a localCheckpoint to keep the iterated plan flat
    (same lineage-truncation contract as the MV chain forwards).
    Converges in O(component diameter) rounds; near-dup clusters are
    shallow (dup families link through shared shingles), so the
    practical round count is 2-4. The convergence check is a scalar
    count to the driver (model state, not data). Deterministic: labels
    are min(doc_id) — no randomness, oracle-able by a recursive-CTE
    closure.

    Returns (node, component)."""
    und = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        prop = und.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        new_labels = (
            labels.unionByName(prop).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))
