"""Text-analysis operators for document pipelines: token counting, quality
scoring, language-ID heuristic, rolling-hash fingerprints.

All pure `pyspark.sql.functions` compositions — vectorized JVM-side,
whole-stage codegen, no UDFs. Each has a direct SQL rendering so the
driver's DuckDB oracle can check it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from risingwave_spark.operators.dedup import normalize_text

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(col):
    """Non-empty whitespace tokens of the normalized text."""
    return F.filter(F.split(normalize_text(col), " "), lambda x: x != "")


def token_count(col):
    return F.size(tokens(col))


def alpha_ratio(col):
    """Fraction of characters that are ASCII letters."""
    return F.length(F.regexp_replace(col, r"[^A-Za-z]", "")) / F.length(col)


def avg_token_len(col):
    t = tokens(col)
    return F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("double")), F.lit(0.0), lambda a, x: a + x
    ) / F.size(t)


def quality_score(col):
    """Composite quality score in [0,1]: alpha ratio, token-length sanity,
    repetition penalty (distinct/total tokens). Same shape as the
    heuristic filters used in large-scale web-corpus cleaning."""
    t = tokens(col)
    distinct_ratio = F.size(F.array_distinct(t)) / F.size(t)
    len_score = F.least(avg_token_len(col) / F.lit(8.0), F.lit(1.0))
    return F.round((alpha_ratio(col) + distinct_ratio + len_score) / 3.0, 6)


def lang_score(col, markers: list[str]):
    """Count of marker-word hits among tokens (exact token match)."""
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(marker_arr, x)))


def lang_id(col):
    """Argmax over per-language marker scores; 'und' when all zero."""
    scores = [(lang, lang_score(col, m)) for lang, m in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reverse order → earlier languages win ties (deterministic)
    for lang, s in reversed(scores):
        out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def doc_fingerprint(col):
    """Content fingerprint of normalized text (md5 — engine-portable)."""
    return F.md5(normalize_text(col))


def token_ngrams(col, n: int):
    """Token n-grams of the normalized text as space-joined strings —
    zip_with over shifted slices, pure HOFs (no explode, no shuffle)."""
    t = tokens(col)
    if n == 2:
        return F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    if n == 3:
        return F.zip_with(
            F.zip_with(
                F.slice(t, 1, F.size(t) - 2),
                F.slice(t, 2, F.size(t) - 2),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.slice(t, 3, F.size(t) - 2),
            lambda ab, c: F.concat_ws(" ", ab, c),
        )
    raise ValueError("token_ngrams supports n in (2, 3)")


def top_ngram_frac(col, n: int = 2):
    """Fraction of all token n-grams taken by the single most frequent
    one — the repeated-phrase signal of web-corpus repetition filters
    (Gopher's rep. removal). distinct × filter is O(d·g) per DOCUMENT
    (both small), stays entirely in codegen — no per-doc shuffle."""
    g = token_ngrams(col, n)
    top = F.array_max(
        F.transform(
            F.array_distinct(g), lambda d: F.size(F.filter(g, lambda x: x == d))
        )
    )
    return F.when(F.size(g) > 0, top / F.size(g)).otherwise(F.lit(0.0))


def dup_ngram_frac(col, n: int = 3):
    """Fraction of token n-grams that are duplicates of an earlier one
    (1 - distinct/total) — the duplicate-n-gram mass signal."""
    g = token_ngrams(col, n)
    return F.when(
        F.size(g) > 0,
        F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g),
    ).otherwise(F.lit(0.0))


def gopher_keep(col, min_tokens: int = 30, max_tokens: int = 100000):
    """Composite keep/drop flag in the style of the Gopher quality
    rules (length bounds, mean-word-length sanity, repetition caps) —
    the pre-training corpus filter, as one codegen'd boolean."""
    n = token_count(col)
    awl = avg_token_len(col)
    return (
        (n >= min_tokens)
        & (n <= max_tokens)
        & (awl >= 2.0)
        & (awl <= 12.0)
        & (top_ngram_frac(col, 2) <= 0.20)
        & (dup_ngram_frac(col, 3) <= 0.60)
    )


def token_ngrams_n(col, n: int):
    """Token n-grams for arbitrary n as space-joined strings — a
    sequence of start positions sliced out of the token array, pure
    HOFs (no explode at this layer, no shuffle). Empty array when the
    document has fewer than n tokens."""
    t = tokens(col)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(corpus, benchmark, id_col: str, text_col: str, n: int = 4):
    """Benchmark decontamination — the eval-leak filter of a training
    pipeline: flag corpus documents sharing any token n-gram with a
    held-out benchmark set (the 13-gram-overlap method of GPT-3
    appendix C, scaled to this corpus's gram length).

    Scale shape: the benchmark gram set is tiny relative to a 100 TB
    corpus (evals are thousands of docs), so it is BROADCAST — the
    corpus side never shuffles for the probe; the only exchange is the
    per-doc hit-count groupBy on id_col. Returns (id_col, n_grams,
    n_hit_grams, contaminated)."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(token_ngrams_n(F.col(text_col), n))).alias(
                "gram"
            )
        )
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col),
        F.array_distinct(token_ngrams_n(F.col(text_col), n)).alias("__grams"),
    )
    hits = (
        doc_grams.select(id_col, F.explode("__grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return (
        doc_grams.select(id_col, F.size("__grams").alias("n_grams"))
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def pack_sequences(df, id_col: str, text_col: str, part_col: str, block: int = 64):
    """Concat-and-split sequence packing — the GPT-style pre-training
    batcher: documents are laid end-to-end in deterministic (part_col,
    id_col) order and cut into fixed BLOCK-token training sequences; a
    document spanning a cut contributes its token overlap to both
    sequences.

    One window cumsum per part_col partition assigns each doc its
    global token offset; the doc then fans out (narrow) to the
    sequences it spans and a groupBy on (part, seq) folds
    contributions. At 100 TB the partition column is (corpus shard,
    lang) so each window sort is bounded; the pack order stays
    reproducible because it is data-derived, not scheduler-derived.
    Returns (part, seq_id, n_docs, n_tokens, first_doc, last_doc)."""
    from pyspark.sql import Window as W

    n = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = W.partitionBy("part").orderBy("__id")
    base = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("__id"),
        n.alias("__n"),
    ).withColumn("__start", F.sum("__n").over(w) - F.col("__n"))
    spanned = base.select(
        "part",
        "__id",
        "__n",
        "__start",
        F.explode(
            F.sequence(
                F.floor(F.col("__start") / block),
                F.floor((F.col("__start") + F.col("__n") - 1) / block),
            )
        ).alias("seq_id"),
    )
    contrib = F.least(
        (F.col("seq_id") + 1) * block, F.col("__start") + F.col("__n")
    ) - F.greatest(F.col("seq_id") * block, F.col("__start"))
    return (
        spanned.withColumn("__contrib", contrib)
        .groupBy("part", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__contrib").alias("n_tokens"),
            F.min("__id").alias("first_doc"),
            F.max("__id").alias("last_doc"),
        )
    )


# PII patterns shared by the Spark expressions and the DuckDB oracle —
# spelled in the common Java-regex/RE2 subset so both engines compile
# them identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,2}-\d{3}-\d{4}",
}
PII_ORDER = ["email", "ipv4", "phone"]  # emails first: they embed dots/digits


def pii_scrub(col):
    """Scrub PII spans (emails, IPv4 addresses, phone numbers) into
    typed placeholder tags and count each redaction — the
    privacy-filter pass of a web-corpus pipeline. Pure regexp built-ins
    (codegen, no Python); returns a struct of the scrubbed text plus
    per-kind counts."""
    scrubbed = col
    counts = {}
    for kind in PII_ORDER:
        pat = PII_PATTERNS[kind]
        counts[kind] = F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return F.struct(
        scrubbed.alias("scrubbed"),
        *[counts[k].alias(f"n_{k}") for k in PII_ORDER],
    )


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    max_tokens: int = 128,
    overlap: int = 32,
):
    """Split documents into token-bounded overlapping chunks — the
    standard pre-tokenization step of an LLM training-data pipeline
    (context-window packing): chunk i covers whitespace-tokens
    [i*stride, i*stride + max_tokens), stride = max_tokens - overlap.

    Entirely built-in (split → sequence of starts → posexplode → slice →
    array_join): no Python in the row path, one narrow fan-out, no
    shuffle — the map-side shape that holds at 100 TB. Emits
    (id, chunk_idx, chunk_text, n_tokens)."""
    from pyspark.sql import functions as F

    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            F.posexplode(
                F.sequence(
                    F.lit(0), F.size("__toks") - 1, F.lit(stride)
                )
            ).alias("chunk_idx", "__start"),
            F.col("__toks"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice("__toks", F.col("__start") + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.size("__toks") - F.col("__start"), F.lit(max_tokens)
            ).alias("n_tokens"),
        )
    )
