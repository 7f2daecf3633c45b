"""Unigram-LM (SentencePiece-style) trainer: hand-verifiable EM on a
tiny corpus, truncation bound, and the apply pass. The full pipeline is
additionally value-hash-gated against the DuckDB oracle
(``unigram_lm_vocab`` / ``unigram_lm_tokenize``)."""

from __future__ import annotations

from osm_pg_etl_spark.operators.unigram import (
    unigram_tokenize_counts,
    unigram_train,
    unigram_word_frequencies,
)


def test_unigram_train_tiny(spark):
    """Corpus 'ab ab ab c': the multi-char piece 'ab' must win every
    segmentation of 'ab' (cost(ab) < cost(a)+cost(b)), so the final
    vocabulary is {a, b, c, ab} with Viterbi counts {0, 0, 1, 3}."""
    df = spark.createDataFrame([(1, "ab ab ab c")],
                               "doc_id long, text string")
    out = {r["piece"]: r["n_count"] for r in unigram_train(df).collect()}
    assert out == {"a": 0, "b": 0, "c": 1, "ab": 3}


def test_unigram_tokenize_counts(spark):
    """'ab' tokenizes to one piece, so 4 words -> 4 pieces; an empty
    doc reports (0, 0)."""
    df = spark.createDataFrame([(1, "ab ab ab c"), (2, "")],
                               "doc_id long, text string")
    out = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in unigram_tokenize_counts(df).collect()}
    assert out[1] == (4, 4)
    assert out[2] == (0, 0)


def test_unigram_word_truncation(spark):
    """Words are truncated to max_word_chars BEFORE any statistics —
    the documented bound that makes the oracle's static unroll exact."""
    df = spark.createDataFrame([(1, "abcdefgh abcdefgh xyz")],
                               "doc_id long, text string")
    rows = {r["w"]: r["freq"] for r in
            unigram_word_frequencies(df, max_word_chars=5).collect()}
    assert rows == {"abcde": 2, "xyz": 1}


def test_unigram_prefers_fewer_pieces_on_cost_tie(spark):
    """Two words occurring equally often: their substrings tie on
    count, so 1-piece segmentations must win via cost (a whole-word
    piece is always cheaper than any split of equal-count pieces), and
    each word's full text ends up in the vocabulary."""
    df = spark.createDataFrame([(1, "wxyz wxyz qrst qrst")],
                               "doc_id long, text string")
    out = {r["piece"]: r["n_count"] for r in unigram_train(df).collect()}
    assert out["wxyz"] == 2 and out["qrst"] == 2
    t = unigram_tokenize_counts(df).collect()[0]
    assert (t["n_words"], t["n_pieces"]) == (4, 4)
