"""operators/bpe: distributed BPE trainer semantics pinned by hand —
the classic Sennrich low/lower/newest/widest corpus, greedy left-to-
right merge application, overlapping pair counts, (count DESC, pair
ASC) tie-breaks."""

from pyspark.sql import functions as F

from osm_pg_etl_spark.operators.bpe import bpe_train, bpe_word_frequencies


def _corpus(spark):
    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_word_frequencies_space_wrapped(spark):
    rows = {r["symbols"]: r["freq"]
            for r in bpe_word_frequencies(_corpus(spark)).collect()}
    assert rows[" l  o  w "] == 5
    assert rows[" n  e  w  e  s  t "] == 6
    assert len(rows) == 4


def test_sennrich_corpus_merge_order(spark):
    """Hand-computed: es(9) -> est(9, tie with 's t' broken by pair
    ASC) -> lo(7, tie with 'o w') -> low(7) -> ew(6, tie among three)
    -> ewest(6)."""
    out = [tuple(r) for r in bpe_train(_corpus(spark), n_merges=6)
           .orderBy("step").collect()]
    assert out == [
        (0, "e", "s", "es", 9),
        (1, "es", "t", "est", 9),
        (2, "l", "o", "lo", 7),
        (3, "lo", "w", "low", 7),
        (4, "e", "w", "ew", 6),
        (5, "ew", "est", "ewest", 6),
    ]


def test_greedy_nonoverlapping_apply(spark):
    """'aaaa' with merge (a,a): greedy left-to-right pairs up as
    (aa)(aa), never the overlapping middle — and the overlapping COUNT
    still sees 3 pairs in round one."""
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    out = [tuple(r) for r in bpe_train(df, n_merges=2)
           .orderBy("step").collect()]
    # round 1: (a,a) count 3 per word x2 words = 6
    assert out[0] == (0, "a", "a", "aa", 6)
    # after merge each word is 'aa aa' -> round 2 merges (aa,aa) x2
    assert out[1] == (1, "aa", "aa", "aaaa", 2)


def test_single_char_words_and_early_stop(spark):
    """Single-symbol words carry no pairs; when the vocabulary runs
    dry the trainer stops early instead of erroring."""
    df = spark.createDataFrame([(1, "a b a b ab")],
                               "doc_id long, text string")
    out = [tuple(r) for r in bpe_train(df, n_merges=4)
           .orderBy("step").collect()]
    assert out == [(0, "a", "b", "ab", 1)]   # only 'ab' had a pair


def test_subword_counts_broadcast_apply(spark):
    """Apply path: counts per doc match a hand tokenization; the
    chained replaces run on the distinct vocabulary."""
    from osm_pg_etl_spark.operators.bpe import bpe_subword_counts

    df = spark.createDataFrame(
        [(1, "low lower"), (2, "newest newest widest")],
        "doc_id long, text string")
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    out = {r["doc_id"]: (r["n_words"], r["n_subwords"])
           for r in bpe_subword_counts(df, merges).collect()}
    # low -> [low] (1); lower -> [low, e, r] (3)
    assert out[1] == (2, 4)
    # newest -> [n, e, w, est] (4) x2; widest -> [w, i, d, est] (4)
    assert out[2] == (3, 12)


def test_hashed_linear_score_exact(spark):
    """Hash-trick scorer: logit is the exact md5-derived weight sum
    (verified against hashlib), empty docs score 0.0."""
    import hashlib

    from osm_pg_etl_spark.operators.text import hashed_linear_score

    def w(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) \
            % 2001 - 1000

    df = spark.createDataFrame(
        [(1, "Alpha beta GAMMA"), (2, ""), (3, "x")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}
    exp1 = w("alpha") + w("beta") + w("gamma")
    assert (out[1]["n_tokens"], out[1]["logit"]) == (3, exp1)
    assert out[1]["score"] == round(exp1 / 3000.0, 6)
    assert (out[2]["n_tokens"], out[2]["logit"], out[2]["score"]) \
        == (0, 0, 0.0)
    assert out[3]["logit"] == w("x")
