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


# Universal affine MinHash family over a 28-bit md5-derived shingle hash:
#   h(s)  = int(md5(s)[:7], 16)            (one md5 per shingle, 0 <= h < 2^28)
#   mh_i  = min_s (A_i * h(s) + B_i) % P   (P prime > universe => universal)
# A_i < 2^17 keeps A_i*h < 2^45 — no 64-bit overflow in either engine.
MINHASH_P = 2147483647  # 2^31 - 1


def minhash_params(i: int) -> tuple[int, int]:
    return 7919 * (i + 1) + 769, (104729 * (i + 1)) % MINHASH_P


def shingle_hashes(sh: Column) -> Column:
    """Array of 28-bit integer hashes, one md5 per shingle (the expensive
    part of MinHash, computed exactly once; the k affine rehashes below are
    integer-only)."""
    return F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
    )


def minhash_from_hashes(hv: Column, k: int = 8) -> list[Column]:
    """k MinHash values from a precomputed shingle-hash array. Returns k
    long columns ``mh_i`` — bit-identical to the DuckDB oracle mirror."""

    def one(i: int) -> Column:
        a, b = minhash_params(i)
        # closure, NOT a default-arg lambda: a second lambda parameter would
        # switch pyspark's transform() to its (element, index) form
        return F.array_min(
            F.transform(hv, lambda x: (x * a + b) % MINHASH_P)
        ).alias(f"mh_{i}")

    return [one(i) for i in range(k)]


def minhash(sh: Column, k: int = 8) -> list[Column]:
    """k MinHash values over a shingle set (see minhash_from_hashes).

    Callers that reuse the signature (LSH) should materialize
    ``shingle_hashes`` in its own projection first so the md5 pass is not
    inlined k times."""
    return minhash_from_hashes(shingle_hashes(sh), k)


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


def redact(text: Column | str, pattern: str, replacement: str = "<X>") -> Column:
    """Regex redaction (the PII-scrub primitive of a training-data
    pipeline): replace every match of ``pattern``. Stays JVM-side; the
    pattern subset used must be RE2-compatible so the oracle can mirror it."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, pattern, replacement)


def make_chunk_udtf(chunk_size: int = 20):
    """Python UDTF (Spark 4 user-defined table function) splitting a
    document into fixed word-count chunks — the LLM-training-data
    chunking step (context-window-sized pieces). One input row yields
    ceil(n_words/chunk_size) output rows (chunk_idx, chunk, n_words).

    The UDTF surface is the table-valued member of the UDF family
    (scalar UDF / pandas UDAF / UDTF); it executes row-at-a-time in
    Python, which is fine for this fan-out shape at moderate width —
    for 100 TB hot paths the same chunking runs as a mapInPandas batch
    (see sources/multimodal.py for that pattern).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx INT, chunk STRING, n_words INT")
    class ChunkWords:
        def eval(self, text: str):
            words = [w for w in (text or "").split(" ") if w]
            for i in range(0, len(words), chunk_size):
                piece = words[i : i + chunk_size]
                yield i // chunk_size, " ".join(piece), len(piece)

    return ChunkWords


# ---------------------------------------------------------------------------
# PII scanning — the detect side of the redact() primitive above.
# Pattern subset is deliberately RE2-compatible (no lookarounds, no
# backrefs) so a DuckDB/RE2 oracle and Spark's Java regex agree match
# for match. Order matters when redacting sequentially: EMAIL before
# IPV4 before PHONE, so a longer match is never split by an earlier
# shorter rewrite.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type PII match counts for one text column. Stays JVM-side
    (regexp_extract_all + size): codegen'd, no Python on the data path."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def pii_redact_all(text: Column | str) -> Column:
    """Redact every PII pattern, each with its own typed placeholder —
    what a training-data pipeline writes back out after the scan."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


CODE_KEYWORDS = (
    "def ", "return", "import ", "class ", "#include", "function ", "=>",
    "void ",
)
_CODE_SYMBOLS_RE = r"[{}();=<>\[\]]"


def code_features(text: Column | str) -> dict[str, Column]:
    """Code-vs-prose detection features — the training-mix routing
    signal (code corpora get different dedup/tokenizer treatment than
    prose). Pure column arithmetic with exact ANSI-SQL mirrors:

    - ``n_lines``: newline-split count;
    - ``indent_ratio``: fraction of lines starting with two spaces or a
      tab (layout-indented source);
    - ``symbol_ratio``: density of ``{}();=<>[]`` characters;
    - ``kw_hits``: literal occurrence count of CODE_KEYWORDS
      (occurrences via length-delta under ``replace``, no regex);
    - ``code_score``: indent + 4*symbol + kw/(tokens+1), a monotone
      blend whose exact weighting is pinned by the oracle, not tuned;
    - ``is_code``: score >= 0.3.
    """
    t = F.col(text) if isinstance(text, str) else text
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    indented = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("  ") | ln.startswith("\t"),
        )
    )
    indent_ratio = indented / n_lines.cast("double")
    symbol_ratio = (
        F.length(t) - F.length(F.regexp_replace(t, _CODE_SYMBOLS_RE, ""))
    ) / F.greatest(F.length(t), F.lit(1)).cast("double")
    kw = None
    for k in CODE_KEYWORDS:
        hits = (F.length(t) - F.length(F.replace(t, F.lit(k), F.lit("")))) / F.lit(
            len(k)
        )
        kw = hits if kw is None else kw + hits
    kw_hits = kw.cast("long")
    n_toks = F.size(tokens(t))
    score = indent_ratio + 4.0 * symbol_ratio + kw_hits / (n_toks + F.lit(1.0))
    return {
        "n_lines": n_lines.cast("long"),
        "indent_ratio": indent_ratio,
        "symbol_ratio": symbol_ratio,
        "kw_hits": kw_hits,
        "code_score": score,
        "is_code": (score >= 0.3).cast("int"),
    }
