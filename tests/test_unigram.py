"""Unigram-LM trainer: Viterbi argmax semantics (probabilistic, not
fixture-shaped), tie-breaks, refusals, and the EM fixed point."""

from fractions import Fraction

import pytest

from shared_etl_pipelines_spark.operators.unigram import (
    unigram_train,
    viterbi_segment,
)


def test_viterbi_prefers_probable_parse():
    # lattice with a real ambiguity: "abc" = [ab,c] or [a,bc] or chars
    probs = {
        "ab": Fraction(4, 10), "bc": Fraction(1, 10),
        "a": Fraction(2, 10), "b": Fraction(1, 10), "c": Fraction(2, 10),
    }
    assert viterbi_segment("abc", probs, 2) == ["ab", "c"]  # 0.08 beats 0.02
    # flip the weights and the OTHER parse must win
    probs2 = dict(probs, **{"ab": Fraction(1, 10), "bc": Fraction(4, 10)})
    assert viterbi_segment("abc", probs2, 2) == ["a", "bc"]


def test_viterbi_tiebreak_fewer_pieces_then_lex():
    # equal-probability parses: 2-piece beats 3-piece
    probs = {p: Fraction(1, 4) for p in ("ab", "cd", "a", "b")}
    assert viterbi_segment("abab", probs, 2) == ["ab", "ab"]
    # exact tie in prob AND count: lexicographically smaller parse
    probs = {"ax": Fraction(1, 4), "a": Fraction(1, 4),
             "xb": Fraction(1, 4), "b": Fraction(1, 4)}
    assert viterbi_segment("axb", probs, 2) == ["a", "xb"]


def test_viterbi_unparseable_refuses():
    with pytest.raises(ValueError, match="not parseable"):
        viterbi_segment("abz", {"ab": Fraction(1, 2)}, 2)


def test_em_counts_and_laplace_probs(spark):
    words = spark.createDataFrame(
        [("abab", 2), ("cd", 3)], "w string, cnt long"
    )
    vocab = ["ab", "cd", "a", "b", "c", "d"]
    out, probs = unigram_train(words, vocab, iters=2)
    got = {r["piece"]: r["n_count"] for r in out.collect()}
    # "abab" -> 2x ab (weighted by cnt 2) = 4; "cd" -> 1x cd * 3 = 3
    assert got == {"ab": 4, "cd": 3, "a": 0, "b": 0, "c": 0, "d": 0}
    total = 7
    assert probs["ab"] == Fraction(5, total + 6)
    assert probs["a"] == Fraction(1, total + 6)


def test_em_rejects_duplicate_vocab(spark):
    words = spark.createDataFrame([("ab", 1)], "w string, cnt long")
    with pytest.raises(ValueError, match="duplicate vocab"):
        unigram_train(words, ["ab", "ab"])
