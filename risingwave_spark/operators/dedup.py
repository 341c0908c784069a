"""Deduplication operators for large-scale (training-data) pipelines.

Exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard — the operator
family a 100 TB document pipeline needs. All are pure DataFrame
compositions (JVM-side, whole-stage-codegen'd); no Python UDFs in the hot
path. Hash primitive is md5 (bit-identical across engines → oracle-able),
not Spark's murmur `hash()`.

Scale design:
- signatures are computed map-side (per-row HOFs, no shuffle);
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


def shingles(col, k: int = 5):
    """Character k-shingle array of the normalized text (map-side HOF)."""
    norm = normalize_text(col)
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))


def minhash_cols(col, num_hashes: int = 8, k: int = 5):
    """MinHash signature as `num_hashes` columns.

    h_i(doc) = min over shingles s of md5(i || s) — the min is taken
    lexicographically over hex strings, which is deterministic and
    engine-portable (no integer conversion needed).
    """
    sh = shingles(col, k)

    def hasher(seed: int):
        # NB: keep the lambda single-arg — F.transform treats a 2-arg
        # lambda as (element, index) and would clobber a default arg.
        prefix = f"{seed}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return [
        F.array_min(F.transform(sh, hasher(i))).alias(f"mh{i}") for i in range(num_hashes)
    ]


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """MinHash-LSH: docs sharing any band of the signature become a
    candidate pair (a < b). Returns distinct (a, b).

    Reference analog: the dedup family the training-data north star asks
    for; in RisingWave terms this is a groupBy-join pipeline, no special
    executor. rows-per-band = num_hashes/bands.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(F.col(id_col).alias("doc"), *minhash_cols(F.col(text_col), num_hashes, k))
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("doc", *band_cols)
    # long-form: (band_idx, band_hash, doc)
    stacked = banded.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("z"),
    ).select("doc", F.col("z.band_idx").alias("band_idx"), F.col("z.band_hash").alias("band_hash"))
    a = stacked.select(F.col("band_idx"), F.col("band_hash"), F.col("doc").alias("a"))
    b = stacked.select(F.col("band_idx"), F.col("band_hash"), F.col("doc").alias("b"))
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_set(col, n: int = 3):
    """Distinct character n-gram array (for Jaccard)."""
    return F.array_distinct(shingles(col, n))


def jaccard_pairs(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Attach n-gram Jaccard similarity to candidate (a, b) pairs.

    Joins the (small) candidate set against doc texts twice; the heavy
    set-intersection runs as JVM HOFs on the joined rows.
    """
    g = docs.select(F.col(id_col), ngram_set(F.col(text_col), n).alias("__grams"))
    out = (
        pairs.join(g.select(F.col(id_col).alias("a"), F.col("__grams").alias("ga")), "a")
        .join(g.select(F.col(id_col).alias("b"), F.col("__grams").alias("gb")), "b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn("uni", F.size(F.array_union("ga", "gb")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .drop("ga", "gb")
    )
    return out


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
