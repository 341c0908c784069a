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
