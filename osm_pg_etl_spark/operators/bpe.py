"""Distributed BPE tokenizer training — learn byte-pair-encoding merges
from a document corpus (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm; the
reference pipeline has no tokenizer training, this is training-data
extension surface like :mod:`.text`).

Scale shape — the part that matters at 100 TB: real BPE trainers never
iterate over the corpus. The ONE full-corpus pass aggregates the
word-frequency table (a groupBy with map-side combine; vocabulary-
sized output, millions of rows at worst for natural language), and all
merge iterations run over that compact table: per round, one pair-count
aggregation (vocabulary-sized), one bounded ``LIMIT 1`` argmax to the
driver (a single row — the chosen merge), and one narrow column rewrite.
``localCheckpoint`` truncates the per-round lineage the same way the
iterative graph algorithms do.

Determinism: the argmax tie-breaks on (count DESC, pair ASC); the merge
application is literal substring replacement over a space-wrapped
symbol encoding (every symbol stored as ``" sym "``, so the pattern
``" a  b "`` can neither touch a symbol's interior nor steal the
delimiter of an adjacent match), which both Spark's ``replace`` and
DuckDB's ``replace`` apply left-to-right non-overlapping — exactly
BPE's greedy merge order. Pair counts use the classic overlapping
count. The DuckDB oracle replays the identical algorithm with the same
encoding, unrolled per merge step (see plans/datapipe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bpe_word_frequencies", "bpe_train", "bpe_subword_counts"]


def _chars(col):
    # '(?!^)' splits between every pair of chars; Spark keeps a trailing
    # empty string — drop it
    return F.filter(F.split(col, "(?!^)"), lambda c: c != "")


def bpe_word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The single full-corpus pass: lowercased whitespace words →
    (symbols, freq), where ``symbols`` is the space-wrapped initial
    character sequence (each char as ``" c "``)."""
    from .text import tokens  # noqa: PLC0415

    words = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
    return (words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
            .select(
                F.concat_ws("", F.transform(
                    _chars(F.col("w")),
                    lambda c: F.concat(F.lit(" "), c, F.lit(" "))))
                .alias("symbols"),
                "freq"))


def bpe_train(df: DataFrame, n_merges: int = 6,
              text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame (step, left, right, merged, pair_count) — one row per
    learned merge, in learning order. ``pair_count`` is the overlapping
    pair frequency that won the argmax at that step.

    Stops early if the vocabulary runs out of pairs (fewer rows than
    ``n_merges``)."""
    spark: SparkSession = df.sparkSession
    state = bpe_word_frequencies(df, text_col).localCheckpoint()

    merges: list[tuple] = []
    for step in range(n_merges):
        arr = F.split(F.trim(F.col("symbols")), "  ")
        # single-symbol words carry no pairs — and Spark's sequence(1, 0)
        # would DESCEND rather than come back empty, so filter them out
        pairs = state.where(F.size(arr) >= 2).select(
            "freq",
            F.explode(F.transform(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: F.concat(F.element_at(arr, i), F.lit(" "),
                                   F.element_at(arr, i + 1))))
            .alias("pair"))
        best = (pairs.groupBy("pair")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1).collect())           # bounded: exactly one row
        if not best:
            break
        left, right = best[0]["pair"].split(" ")
        merges.append((step, left, right, left + right,
                       int(best[0]["cnt"])))
        state = state.withColumn(
            "symbols",
            F.replace(F.col("symbols"),
                      F.lit(f" {left}  {right} "),
                      F.lit(f" {left}{right} "))).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, merged string, "
        "pair_count bigint")


def bpe_subword_counts(df: DataFrame, merges: list[tuple[str, str]],
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Apply learned BPE merges and count subwords per document:
    (id_col, n_words, n_subwords). ``merges`` is the ordered (left,
    right) list from :func:`bpe_train` (driver-side, bounded — it IS
    the tokenizer).

    Scale shape: the K chained replaces — pure Column expressions, no
    UDF — run over the DISTINCT vocabulary, not the corpus; per-word
    subword counts broadcast back onto the exploded words. The corpus
    is scanned once and shuffled only by the id for the final count."""
    from .text import tokens  # noqa: PLC0415

    words = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
    sym = F.concat_ws("", F.transform(
        _chars(F.col("w")),
        lambda c: F.concat(F.lit(" "), c, F.lit(" "))))
    for left, right in merges:
        sym = F.replace(sym, F.lit(f" {left}  {right} "),
                        F.lit(f" {left}{right} "))
    vocab = (words.select("w").distinct()
             .select("w", F.size(F.split(F.trim(sym), "  "))
                     .alias("n_sub")))
    return (words.join(F.broadcast(vocab), "w")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").alias("n_subwords")))
