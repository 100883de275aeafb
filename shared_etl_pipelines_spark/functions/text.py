"""Text-analysis column builders (JVM-side, no Python UDFs).

Everything here is built from pyspark.sql.functions higher-order and
string expressions so it stays inside whole-stage codegen — at 100 TB
the tokenizer must not cross into Python per row. The same formulas are
mirrored in the DuckDB oracle SQL (see queries_llm.py), so every helper
sticks to engine-portable primitives: regex split, md5, ascii arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword list shared by the quality metrics and the oracle SQL
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")

# language marker tokens for the n-gram/stopword lang-id heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "les", "et", "des", "une"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties dropped (split keeps trailing empty
    strings in both Spark and DuckDB; filtering makes them identical)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, strip non-alnum,
    collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9\\s]", "")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles (space-joined) from a token array."""
    out = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(out) if distinct else out


def minhash(sh: Column, k: int = 8) -> list[Column]:
    """k MinHash values over a shingle set.

    Hash family = md5(shingle || ':' || i) — engine-portable (identical in
    DuckDB), uniformly distributed, and the lexicographic MIN over hex
    digests is a valid min-hash. Returns k string columns ``mh_i``.
    """
    def one(i: int) -> Column:
        suffix = f":{i}"
        # closure, NOT a default-arg lambda: a second lambda parameter would
        # switch pyspark's transform() to its (element, index) form
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(suffix))))
        ).alias(f"mh_{i}")

    return [one(i) for i in range(k)]


def _hexval(h: Column, pos: int) -> Column:
    """Value 0..15 of the pos-th (1-indexed) hex digit of a digest —
    ascii arithmetic only, portable to the oracle SQL."""
    c = F.ascii(F.substring(h, pos, 1))
    return c - 48 - F.when(c >= 97, F.lit(39)).otherwise(F.lit(0))


def token_hash16(tok: Column) -> Column:
    """Deterministic 16-bit hash of a token: first 4 hex digits of md5."""
    h = F.md5(tok)
    return (
        _hexval(h, 1) * 4096 + _hexval(h, 2) * 256 + _hexval(h, 3) * 16 + _hexval(h, 4)
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_distinct(F.concat(a, b))).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _in_set(markers: tuple[str, ...]):
    # single-arg lambda: a default-arg second parameter would make pyspark
    # treat it as the (element, index) higher-order-function form
    return lambda t: t.isin(*markers)


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-token hit count per language (the lang-id heuristic)."""
    return {
        lang: F.size(F.filter(toks, _in_set(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(toks: Column) -> Column:
    """Argmax over lang_scores with deterministic tie order (en,es,de,fr);
    all-zero -> 'und'. Mirrored exactly in the oracle SQL."""
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            out
        )
    return out
