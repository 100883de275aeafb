"""Distributed byte-pair-encoding (BPE) tokenizer training.

The tokenizer-fitting step of an LLM training-data pipeline (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"), re-expressed for Spark. No reference counterpart — this is
part of the beyond-reference LLM-pipeline mandate.

Shape of the computation, and why it scales:

- Training never touches the corpus after ONE pass: BPE statistics are
  a function of the *word frequency table* (word, count), which is the
  classic first step — at 100 TB the corpus collapses to a vocabulary
  of maybe 10^7 rows after the initial tokenize+groupBy, and every
  merge iteration runs over that small-but-distributed table.
- Each iteration: explode symbol arrays into adjacent pairs (weighted
  by word count), one map-side-combinable groupBy, take the argmax
  pair. Driver traffic is O(1) per round (a single collected row —
  same discipline as connected_components / kmeans_fit).
- The merge application rewrites each word's symbol array with an
  Arrow-batched pandas UDF (a per-word sequential scan is inherently
  order-dependent, exactly the shape built-in HOFs can't express).
- Lineage is cut with a non-eager localCheckpoint every round so the
  plan doesn't grow with the merge count.

Determinism: ties on pair weight break on (left ASC, right ASC), so
the learned merge sequence is a pure function of the input corpus —
pinned by an exact pure-python replay test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from shared_etl_pipelines_spark.functions.text import tokens

__all__ = [
    "word_freq_table",
    "adjacent_pair_counts",
    "bpe_train",
    "bpe_segment",
    "bpe_apply",
]


def word_freq_table(docs: DataFrame, text_col: str) -> DataFrame:
    """One corpus pass: whitespace words with their total counts.
    ``(w, cnt)`` — the only corpus-sized job in BPE training."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_syms(words: DataFrame) -> DataFrame:
    """(cnt, syms) with syms = the word split into single characters."""
    return words.select("cnt", F.split("w", "").alias("syms"))


def adjacent_pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over a (cnt, syms) table.

    transform() over sequence() is interpreted per element, but it runs
    on the word *vocabulary*, not the corpus — the right side of the
    codegen-vs-HOF tradeoff (contrast shingle_hash_rows, which must stay
    codegen because it scans every document).
    """
    # single-symbol words carry no pairs; filter BEFORE the transform —
    # sequence(1, 0) is a DESCENDING [1, 0] in Spark, not empty.
    pairs = syms.filter(F.size("syms") >= 2).select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i-1] AS left, syms[i] AS right))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("cnt").alias("weight")
    )


def _merge_udf(a: str, b: str):
    merged = a + b

    @pandas_udf(T.ArrayType(T.StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        def one(syms):
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return col.map(one)

    return apply_merge


def bpe_train(
    docs: DataFrame, text_col: str, num_merges: int = 10
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges from a document corpus.

    Returns (merges, final_symbol_table): merges as a list of
    ``(left, right, weight)`` in learned order; the symbol table as
    ``(cnt, syms)`` after all merges (useful for vocab extraction).
    """
    words = _char_syms(word_freq_table(docs, text_col)).persist()
    merges: list[tuple[str, str, int]] = []
    cur = words
    for _ in range(num_merges):
        top = (
            adjacent_pair_counts(cur)
            .orderBy(F.desc("weight"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["weight"] < 2:
            break  # nothing merges twice — vocabulary is saturated
        a, b, w = top[0]["left"], top[0]["right"], int(top[0]["weight"])
        merges.append((a, b, w))
        nxt = cur.select(
            "cnt", _merge_udf(a, b)(F.col("syms")).alias("syms")
        ).localCheckpoint(eager=False)
        if cur is not words:
            cur.unpersist()
        cur = nxt
    words.unpersist()
    return merges, cur


def bpe_segment(
    docs: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Apply a learned merge sequence to a corpus: one Arrow-batched pass,
    returns ``(id, token)`` rows of BPE subword tokens. The read-side
    twin of bpe_train (train once, segment everywhere)."""
    seq = [(a, b) for a, b, _ in merges]

    @pandas_udf(T.ArrayType(T.StringType()))
    def segment(col: pd.Series) -> pd.Series:
        def one(text):
            out = []
            for word in (text or "").split():
                syms = list(word)
                for a, b in seq:
                    i, merged, n = 0, [], len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                            merged.append(a + b)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    syms = merged
                out.extend(syms)
            return out

        return col.map(one)

    return docs.select(
        F.col(id_col), F.posexplode(segment(F.col(text_col))).alias("token_idx", "token")
    )


def bpe_apply(words: DataFrame, word_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a PRETRAINED merge sequence to a word table: the inference
    side of BPE (encode with a frozen tokenizer, the everyday path of a
    training-data pipeline — training happens once, encoding happens on
    every corpus refresh).

    Input is the distinct-word *vocabulary*, not the corpus: at 100 TB
    the corpus tokenize step is ``word_freq_table`` (one pass) followed
    by this per-word segmentation over ~10^7 vocabulary rows, then a
    broadcast join of ``(word, pieces)`` back onto the corpus — the
    pandas UDF never sees corpus-sized data.

    Each merge ``(a, b)`` rewrites the symbol array with a greedy
    leftmost non-overlapping scan (the standard BPE apply loop). The
    scan equals one plain string replace per merge on the DOUBLE-space-
    delimited symbol string — for ANY pair, including ``a == b``: each
    occurrence owns a private boundary space, so two occurrences sharing
    a SYMBOL always overlap as strings (the shared symbol plus its full
    inner gap lie inside the first occurrence) and a left-to-right
    non-overlapping replace merges exactly the pairs the greedy scan
    merges. That replace chain is what the SQL oracles replay
    (queries_llm._bpe_replace_chain_sql / _bpe_learn_sql); the
    equivalence is regression-pinned in tests/test_llm_operators.py.

    Returns the input columns plus ``pieces array<string>``.
    """
    seq = list(merges)

    @pandas_udf(T.ArrayType(T.StringType()))
    def seg(col: pd.Series) -> pd.Series:
        def one(word):
            syms = list(word or "")
            for a, b in seq:
                i, out, n = 0, [], len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.map(one)

    return words.withColumn("pieces", seg(F.col(word_col)))
