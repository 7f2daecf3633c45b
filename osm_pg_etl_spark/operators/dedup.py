"""Deduplication operators for large-scale training-data pipelines.

Extensions beyond the reference surface (BASELINE.json north star). Four
families, each designed around Spark's shuffle model:

- **exact**: md5-groupBy. One shuffle on the 16-byte digest, map-side
  combinable; holds at any scale.
- **MinHash + LSH**: per-row signatures are narrow (no shuffle); the only
  shuffle is the band-bucket join, whose size is controlled by the band
  count. Candidate pairs are verified with exact Jaccard.
- **SimHash**: per-row bit signature (narrow), then banded bucketing like
  MinHash.
- **n-gram Jaccard**: exact all-pairs via an inverted shingle index — the
  classic explode→self-join; quadratic in bucket size, so intended for
  verification / small-candidate sets. The LSH path is the scale path.

All hashes are md5-derived (:mod:`..functions.hashing`) so results are
reproducible across engines and Spark versions — and checkable against a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hex, md5_long
from .text import tokens


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: groups of identical content. Returns one row per
    duplicated digest with the member count and the keeper (min id)."""
    return (df.select(md5_hex(text_col).alias("content_hash"), F.col(id_col))
            .groupBy("content_hash")
            .agg(F.count(F.lit(1)).alias("count"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("count") > 1))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct content digest."""
    keep = (df.select(md5_hex(text_col).alias("h"), F.col(id_col))
            .groupBy("h").agg(F.min(id_col).alias(id_col)))
    return df.join(keep.select(id_col), id_col, "left_semi")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct lowercase word n-grams. Documents shorter than ``n`` tokens
    yield a single shingle of the whole (lowercased) token sequence, so no
    document silently drops out of the dedup graph."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(
        F.when(k >= n, grams).otherwise(F.array(F.array_join(toks, " "))))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for hash-function i, min over the shingle set of
    ``md5_long(i, shingle)``. Computed entirely per-row (array transform +
    array_min) — adding signatures to a 100 TB table is a narrow map."""
    def hasher(i: int):
        # a factory (not a default-arg lambda): pyspark's higher-order
        # functions pass one column per declared parameter
        return lambda s: md5_long(s, seed=i)

    mins = [F.array_min(F.transform(shingles, hasher(i)))
            for i in range(num_hashes)]
    return F.array(*mins)


def _band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: md5 of each band's slice of the signature, prefixed
    with the band index so buckets from different bands never collide."""
    keys = [F.concat_ws("|", F.lit(str(b)),
                        F.concat_ws(",", *[F.element_at(signature, b * rows_per_band + r + 1)
                                           for r in range(rows_per_band)]))
            for b in range(bands)]
    return F.array(*[F.md5(k) for k in keys])


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            num_hashes: int = 16, bands: int = 4,
                            threshold: float = 0.7) -> DataFrame:
    """MinHash/LSH near-dup pairs: shingle → signature (narrow) → band
    bucket join (the only shuffle) → exact-Jaccard verification of
    candidates. Returns (id_a, id_b, jaccard_sim) with id_a < id_b.

    Band/row geometry trades recall for shuffle volume: with b bands of r
    rows the capture probability is 1-(1-s^r)^b. Buckets are bounded by
    near-dup cluster size; a pathological bucket (e.g. empty docs) is
    handled by AQE skew-join splitting.
    """
    rows_per_band = num_hashes // bands
    base = (df.select(F.col(id_col),
                      word_shingles(text_col, n).alias("_sh"))
            .withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))
            .withColumn("_bk", _band_keys(F.col("_sig"), bands, rows_per_band)))
    buckets = base.select(id_col, "_sh", F.explode("_bk").alias("bucket"))

    a = buckets.select(F.col(id_col).alias("id_a"),
                       F.col("_sh").alias("sh_a"), "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"),
                       F.col("_sh").alias("sh_b"), "bucket")
    pairs = (a.join(b, "bucket")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"))
             .distinct()
             .filter(F.col("jaccard_sim") >= threshold))
    return pairs


def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash fingerprint over lowercase tokens: per-bit majority vote of
    token-hash bits, packed into a long. Pure per-row expression."""
    hashes = F.transform(F.transform(tokens(text), lambda t: F.lower(t)),
                         lambda t: md5_long(t))
    # bit extraction via exact power-of-two division (hash < 2^32 so the
    # double division is exact); F.shiftright rejects lambda columns
    def voter(b: int):
        shift = float(1 << b)
        return lambda acc, h: acc + F.when(
            (h / F.lit(shift)).cast("long") % 2 == 1,
            F.lit(1)).otherwise(F.lit(-1))

    bit_votes = [F.aggregate(hashes, F.lit(0), voter(b)) for b in range(bits)]
    out = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", bits: int = 32,
                            bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band the ``bits``-bit fingerprint into
    ``bands`` chunks (two fingerprints within ``bands-1`` bit flips share at
    least one chunk — pigeonhole), bucket-join on chunks, verify Hamming
    distance. Returns (id_a, id_b, hamming) with id_a < id_b."""
    chunk = bits // bands
    mask = (1 << chunk) - 1
    sig = df.select(F.col(id_col), simhash(text_col, bits).alias("_sim"))
    keys = F.array(*[
        F.concat_ws("|", F.lit(str(b)),
                    (F.col("_sim") / F.lit(float(1 << (b * chunk))))
                    .cast("long") % F.lit(mask + 1))
        for b in range(bands)])
    buckets = sig.select(id_col, "_sim", F.explode(keys).alias("bucket"))
    a = buckets.select(F.col(id_col).alias("id_a"), F.col("_sim").alias("sim_a"), "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), F.col("_sim").alias("sim_b"), "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted shingle index:
    explode shingles → self-join on shingle → |A∩B| per pair → Jaccard from
    per-doc shingle counts. Exact but quadratic in posting-list length —
    use as the verifier / oracle; MinHash-LSH is the scale path. A
    frequency cutoff on pathological shingles (stopword runs) is the
    standard mitigation when running this directly on large corpora."""
    sh = df.select(F.col(id_col), word_shingles(text_col, n).alias("_sh"))
    sizes = sh.select(id_col, F.size("_sh").alias("_n"))
    inv = sh.select(id_col, F.explode("_sh").alias("shingle"))
    a = inv.select(F.col(id_col).alias("id_a"), "shingle")
    b = inv.select(F.col(id_col).alias("id_b"), "shingle")
    common = (a.join(b, "shingle")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).alias("_common")))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    return (common.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("_common").cast("double")
                     / (F.col("_na") + F.col("_nb") - F.col("_common")))
                    .alias("jaccard_sim"))
            .filter(F.col("jaccard_sim") >= threshold))
