"""Text-analysis functions (SURVEY.md X4 + north-star text ops).

All pure pyspark.sql.functions column expressions — whole-stage codegen'd,
no Python in the hot path. Designed for a documents table of billions of
rows: every op is a per-row projection or a shuffle-light aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small function-word marker lists per language for the n-gram/stopword
# heuristic language ID. Deterministic and vocabulary-driven; real corpora
# would use char n-gram profiles (same plumbing, bigger tables).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "a", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "shi", "le", "he", "zai"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish tokenizer: word pieces OR single non-space symbols
TOKEN_REGEX = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: alnum runs + individual symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def stopword_ratio(text: Column) -> Column:
    ws = words(text)
    stop = F.filter(ws, lambda w: F.lower(w).isin(STOPWORDS))
    return F.size(stop).cast("double") / F.size(ws)


def punct_ratio(text: Column) -> Column:
    punct = F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)
    return F.size(punct).cast("double") / F.length(text)


def uniq_ratio(text: Column) -> Column:
    ws = words(text)
    return F.size(F.array_distinct(ws)).cast("double") / F.size(ws)


def avg_word_len(text: Column) -> Column:
    ws = words(text)
    total = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(ws)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: long-enough, low punctuation,
    diverse vocabulary, sane word length. Deterministic rational arithmetic."""
    len_ok = F.least(F.length(text).cast("double") / 400.0, F.lit(1.0))
    return F.round(
        0.4 * len_ok + 0.3 * uniq_ratio(text) + 0.3 * (1 - stopword_ratio(text)), 6
    )


def lang_scores(text: Column) -> Column:
    """Array of (lang, marker-hit count) structs, deterministic order."""
    ws = words(text)

    def marker_filter(markers: list[str]):
        # keep the lambda 1-ary: PySpark treats 2-ary filter lambdas as
        # (element, index)
        return lambda w: F.lower(w).isin(markers)

    scores = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.filter(ws, marker_filter(markers))).cast("long").alias("hits"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    return F.array(*scores)


def lang_id(text: Column) -> Column:
    """Argmax language by marker hits; ties break alphabetically (array_max
    on (hits, reversed-lang) struct ordering would invert ties, so sort by
    hits desc then lang asc explicitly)."""
    arr = F.sort_array(
        F.transform(
            lang_scores(text),
            lambda s: F.struct((-s["hits"]).alias("neg"), s["lang"].alias("lang")),
        )
    )
    return F.element_at(arr, 1)["lang"]


ROLL_BASE = 31
ROLL_MOD = 2_147_483_647  # 2^31-1 Mersenne prime: h*31 + v stays << int64, ANSI-safe


def token_value(w: Column) -> Column:
    """Deterministic per-token value for the rolling hash, chosen to be
    expressible identically in any SQL engine (ascii of first char + len)."""
    return (F.ascii(F.substring(w, 1, 1)) * 131 + F.length(w)).cast("bigint")


def rolling_fingerprint(text: Column) -> Column:
    """Order-SENSITIVE document fingerprint: Rabin-Karp-style polynomial
    rolling hash over the token stream, h = fold(h*B + v(tok)) mod M.
    Complements ``fingerprint`` (order-insensitive set hash): reordered
    words change this one. Pure JVM fold — whole-stage codegen, no UDF.
    """
    return F.aggregate(
        F.transform(words(text), token_value),
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc * ROLL_BASE + v) % ROLL_MOD,
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set. Portable to any SQL engine for the oracle check."""
    return F.md5(F.array_join(F.sort_array(F.array_distinct(words(text))), " "))


def ngrams_from_words(ws: Column, n: int) -> Column:
    """Array of n-word shingles from an already-bound words array column.

    ``ws`` MUST be a bound attribute (``.select(words(...).alias("ws"))``
    first), not an inline ``split`` expression: lambda inlining would
    re-evaluate the split once per shingle position — O(W²) per document
    instead of O(W).
    """
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    return F.when(F.size(ws) >= n, F.transform(
        idx, lambda i: F.array_join(F.slice(ws, i + 1, n), " ")
    )).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int) -> Column:
    """Array of n-word shingles ('a b c' style). Convenience form — prefer
    ``ngrams_from_words`` over a pre-split column in hot paths (see there)."""
    return ngrams_from_words(words(text), n)
