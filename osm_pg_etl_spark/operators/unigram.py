"""Distributed unigram-LM (SentencePiece-style) tokenizer training —
the BPE sibling used by Llama-family pipelines (Kudo 2018, "Subword
Regularization", arXiv:1804.10959 — public algorithm; the reference
pipeline has no tokenizer training, this is training-data extension
surface like :mod:`.bpe`).

Algorithm (Viterbi hard-EM — the deterministic, engine-exact variant
of Kudo's EM; soft EM's lattice marginals are float sums whose
cross-engine reproducibility can't be pinned, while Viterbi reduces
to exact-decimal comparisons):

1. **Seed**: every substring of length 1..``max_piece_len`` of the
   distinct-word table, counted with word frequencies; ALL single
   characters are kept (coverage guarantee: every position stays
   reachable in the lattice) plus the top ``seed_multi`` multi-char
   substrings by (count desc, piece asc).
2. **EM iterations**: E-step Viterbi-segments every DISTINCT word
   under the current piece costs (``-log p``, add-1 smoothed) and
   counts the pieces of the best segmentation weighted by word
   frequency; M-step rebuilds the vocabulary as {all single chars}
   ∪ {multi-char pieces actually used}, re-estimating costs.
3. **Prune**: keep all single chars + the top ``keep_multi``
   multi-char pieces by (count desc, piece asc); final log-probs are
   re-normalized over the pruned vocabulary.

Scale shape — the part that matters at 100 TB: like real tokenizer
trainers (and like :mod:`.bpe`), the corpus is scanned ONCE to build
the word-frequency table (one map-side-combinable groupBy; the output
is vocabulary-sized). Every EM iteration then runs over that compact
table: the Viterbi DP is a ROW-LOCAL ``F.aggregate`` over the word's
positions (no shuffle, no UDF — pure Column expressions), the piece
vocabulary rides along as a single-row broadcast map (bounded by the
seed size), and the M-step is one vocabulary-sized combinable
aggregate. ``localCheckpoint`` truncates per-iteration lineage
exactly as :func:`..operators.bpe.bpe_train` does.

Determinism / engine-exactness: piece costs are
``-round(ln((cnt+1)/(total+|V|)), 9)`` as DECIMAL(12,9) (the proven
round-the-transcendental-once discipline of tfidf/DSIR); path costs
accumulate in DECIMAL(20,9) (exact), and the DP argmin compares
``(cost, n_pieces, back_pointer)`` structs lexicographically — ties
prefer fewer pieces, then the longest final piece. The DuckDB oracle
replays the identical lattice, unrolled position-by-position with
lateral column aliases (plans/datapipe.py), the same way the BPE
oracle unrolls merge steps.

Bound: words are TRUNCATED to ``max_word_chars`` characters before
any statistics (both engines, documented loudly) — the analog of
SentencePiece's bounded piece/sentence lengths, and what makes the
oracle's static position unroll exact. Tokenization of a corpus is
defined for words whose characters were all seen at training time
(single-char coverage); apply to a foreign corpus requires an <unk>
extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_word_frequencies", "unigram_seed_vocab",
           "unigram_train", "unigram_tokenize_counts"]

_COST = "decimal(20,9)"
_NLP = "decimal(12,9)"


def unigram_word_frequencies(df: DataFrame, text_col: str = "text",
                             max_word_chars: int = 12) -> DataFrame:
    """The single full-corpus pass: lowercased whitespace words,
    truncated to ``max_word_chars``, with frequencies — ``(w, freq)``."""
    from .text import tokens  # noqa: PLC0415

    return (df.select(F.explode(tokens(F.lower(F.col(text_col))))
                      .alias("_w0"))
            .select(F.substring("_w0", 1, max_word_chars).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))


def _all_substrings(w: Column, max_piece_len: int) -> Column:
    """Every substring of length 1..max_piece_len, with multiplicity."""
    return F.flatten(F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.transform(
            F.sequence(F.lit(1),
                       F.least(F.lit(max_piece_len),
                               F.length(w) - i + 1)),
            lambda l: w.substr(i, l))))


def unigram_seed_vocab(words: DataFrame, max_piece_len: int = 4,
                       seed_multi: int = 96) -> DataFrame:
    """Seed pieces ``(piece, cnt)``: all single chars plus the top
    ``seed_multi`` multi-char substrings by (cnt desc, piece asc).
    ``words`` is the (w, freq) table."""
    seed_all = (words.select(
        "freq",
        F.explode(_all_substrings(F.col("w"), max_piece_len))
        .alias("piece"))
        .groupBy("piece").agg(F.sum("freq").alias("cnt")))
    singles = seed_all.filter(F.length("piece") == 1)
    multis = (seed_all.filter(F.length("piece") >= 2)
              .orderBy(F.desc("cnt"), F.asc("piece"))
              .limit(seed_multi))
    return singles.unionByName(multis)


def _with_nlp(vocab_counts: DataFrame) -> DataFrame:
    """Attach add-1-smoothed piece costs: ``nlp = -round(ln((cnt+1) /
    (total+|V|)), 9)`` as DECIMAL(12,9). The scalar (total, |V|) row
    broadcasts — never a single-partition window."""
    tot = vocab_counts.agg(
        F.sum("cnt").alias("_tot"), F.count(F.lit(1)).alias("_nv"))
    return (vocab_counts.crossJoin(F.broadcast(tot))
            .select("piece", "cnt",
                    (-F.round(F.log(
                        (F.col("cnt") + 1).cast("double")
                        / (F.col("_tot") + F.col("_nv")).cast("double")),
                        9).cast(_NLP)).alias("nlp")))


def _vocab_map(vocab: DataFrame) -> DataFrame:
    """Single-row ``piece -> nlp`` map (bounded by the vocabulary size,
    broadcast to every task)."""
    return vocab.agg(F.map_from_entries(
        F.collect_list(F.struct("piece", "nlp"))).alias("_vm"))


def _viterbi(words: DataFrame, vocab: DataFrame, max_piece_len: int,
             with_pieces: bool) -> DataFrame:
    """Row-local Viterbi over each word's position lattice: adds
    ``np`` (piece count of the best segmentation) and, when
    ``with_pieces``, the pieces themselves. One narrow map over the
    distinct-word table — the DP state is an in-row array of
    ``(cost, np, bp)`` structs, the vocabulary a broadcast map."""
    K = max_piece_len
    lat = words.crossJoin(F.broadcast(_vocab_map(vocab)))
    w = F.col("w")
    base = F.struct(F.lit(0).cast(_COST).alias("cost"),
                    F.lit(0).alias("np"), F.lit(0).alias("bp"))

    def step(acc, i):
        # candidate pieces ending at i start at jj in [i-K+1, i]
        # (1-based); prev state is acc[jj] (= st_{jj-1})
        def cand(jj):
            lp = F.element_at(F.col("_vm"), w.substr(jj, i - jj + 1))
            prev = F.element_at(acc, jj)
            return F.when(
                lp.isNotNull(),
                F.struct((prev["cost"] + lp).cast(_COST).alias("cost"),
                         (prev["np"] + 1).alias("np"),
                         (jj - 1).alias("bp")))
        cands = F.transform(
            F.sequence(F.greatest(F.lit(1), i - K + 1), i), cand)
        best = F.array_min(F.filter(cands, lambda x: x.isNotNull()))
        return F.concat(acc, F.array(best))

    sts = F.aggregate(F.sequence(F.lit(1), F.length(w)),
                      F.array(base), step)
    out = lat.withColumn("_sts", sts).withColumn(
        "np", F.element_at("_sts", F.length(w) + 1)["np"])
    if not with_pieces:
        return out.drop("_vm", "_sts")

    # backtrack: walk bp pointers from the last position, collecting
    # pieces; at most len(w) hops, so one more bounded row-local fold
    racc0 = F.struct(F.length(w).cast("int").alias("pos"),
                     F.expr("CAST(array() AS array<string>)")
                     .alias("pcs"))

    def back(acc, _):
        bp = F.element_at("_sts", acc["pos"] + 1)["bp"]
        return F.when(
            acc["pos"] > 0,
            F.struct(bp.cast("int").alias("pos"),
                     F.concat(acc["pcs"],
                              F.array(w.substr(bp + 1, acc["pos"] - bp)))
                     .alias("pcs"))).otherwise(acc)

    recon = F.aggregate(F.sequence(F.lit(1), F.length(w)), racc0, back)
    return (out.withColumn("pieces", recon["pcs"])
            .drop("_vm", "_sts"))


def _train_vocab(df: DataFrame, text_col: str, max_piece_len: int,
                 seed_multi: int, em_iters: int, keep_multi: int,
                 max_word_chars: int) -> tuple[DataFrame, DataFrame]:
    """Shared trainer core: returns (words, final_vocab) where
    final_vocab carries ``(piece, cnt, nlp)`` with the exact decimal
    cost — so downstream Viterbi passes reuse it without a
    double round-trip."""
    words = unigram_word_frequencies(
        df, text_col, max_word_chars).localCheckpoint()
    singles = (unigram_seed_vocab(words, max_piece_len, seed_multi)
               .localCheckpoint())
    vocab = _with_nlp(singles)
    chars = singles.filter(F.length("piece") == 1).select("piece")

    for _ in range(em_iters):
        seg = _viterbi(words, vocab, max_piece_len, with_pieces=True)
        counts = (seg.select("freq", F.explode("pieces").alias("piece"))
                  .groupBy("piece").agg(F.sum("freq").alias("cnt")))
        keys = chars.unionByName(counts.select("piece")).distinct()
        vocab = _with_nlp(
            keys.join(counts, "piece", "left")
            .select("piece", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        ).localCheckpoint()

    fs = vocab.filter(F.length("piece") == 1).select("piece", "cnt")
    fm = (vocab.filter(F.length("piece") >= 2)
          .orderBy(F.desc("cnt"), F.asc("piece")).limit(keep_multi)
          .select("piece", "cnt"))
    return words, _with_nlp(fs.unionByName(fm)).localCheckpoint()


def unigram_train(df: DataFrame, text_col: str = "text",
                  max_piece_len: int = 4, seed_multi: int = 96,
                  em_iters: int = 2, keep_multi: int = 48,
                  max_word_chars: int = 12) -> DataFrame:
    """Learn a unigram-LM piece vocabulary. Returns ``(piece, n_count,
    logp)`` — the pruned vocabulary with each piece's final Viterbi
    count and re-normalized add-1 log-probability."""
    _, final = _train_vocab(df, text_col, max_piece_len, seed_multi,
                            em_iters, keep_multi, max_word_chars)
    return final.select(
        "piece", F.col("cnt").cast("bigint").alias("n_count"),
        (-F.col("nlp")).cast("double").alias("logp"))


def unigram_tokenize_counts(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_piece_len: int = 4,
                            seed_multi: int = 96, em_iters: int = 2,
                            keep_multi: int = 48,
                            max_word_chars: int = 12) -> DataFrame:
    """Train on the corpus, then Viterbi-tokenize it: ``(id_col,
    n_words, n_pieces)`` per document. The per-word piece counts are
    computed once on the DISTINCT word table and broadcast back onto
    the exploded words (same shape as
    :func:`..operators.bpe.bpe_subword_counts`)."""
    from .text import tokens  # noqa: PLC0415

    words, vocab = _train_vocab(df, text_col, max_piece_len, seed_multi,
                                em_iters, keep_multi, max_word_chars)
    wn = (_viterbi(words, vocab, max_piece_len, with_pieces=False)
          .select("w", "np"))
    docw = (df.select(F.col(id_col),
                      F.explode(tokens(F.lower(F.col(text_col))))
                      .alias("_w0"))
            .select(id_col,
                    F.substring("_w0", 1, max_word_chars).alias("w")))
    per_doc = (docw.join(F.broadcast(wn), "w")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_words"),
                    F.sum("np").alias("n_pieces")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_words", F.lit(0)).cast("bigint")
                    .alias("n_words"),
                    F.coalesce("n_pieces", F.lit(0)).cast("bigint")
                    .alias("n_pieces")))
