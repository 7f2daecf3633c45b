"""Similarity search over embedding columns (``array<float>``).

Extensions beyond the reference surface (BASELINE.json north star):

- **brute-force cosine top-k** — the exact baseline: a narrow map computing
  the score (zip_with dot product, JVM-side) + a TakeOrderedAndProject.
  Linear scan; at 100 TB it parallelizes perfectly but reads everything.
- **random-hyperplane LSH buckets** — the scale path: deterministic
  (seeded) hyperplanes embedded as literals, per-row sign-bit signature
  (narrow), candidates searched only within the query's bucket(s).
  Multi-probe (flipping one bit) trades recall for fan-out.
- **embedding near-dup pairs** — cosine over LSH-bucketed candidates.

IVF (k-means coarse quantizer) is the step beyond hyperplane LSH; the
bucket-join skeleton below is the same, with centroid assignment replacing
sign bits.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, computed JVM-side."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _as_double_array(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(embeddings: DataFrame, query: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine against a literal query vector. The ORDER BY +
    LIMIT compiles to TakeOrderedAndProject — per-partition top-k then a
    single driver merge, no global sort shuffle."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (embeddings
            .select(F.col(id_col),
                    F.round(cosine(_as_double_array(F.col(vec_col)), q), 6)
                    .alias("cosine_sim"))
            .orderBy(F.desc("cosine_sim"), id_col)
            .limit(k))


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG so the
    signature is stable across numpy versions)."""
    state = seed
    out = []
    for _ in range(planes):
        vec = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            vec.append(((state >> 33) / float(1 << 31)) - 1.0)
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        out.append([x / norm for x in vec])
    return out


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit p set iff dot(vec, plane_p) >= 0. Narrow."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(dot(vec, lit_plane) >= 0,
                           F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_index(embeddings: DataFrame, num_planes: int = 8, dim: int = 64,
              vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Attach an LSH bucket id to every row (narrow map). Persist this and
    partition by bucket for repeated query workloads."""
    planes = _hyperplanes(dim, num_planes, seed)
    return embeddings.withColumn(
        "lsh_bucket", hyperplane_signature(_as_double_array(F.col(vec_col)), planes))


def lsh_topk(embeddings: DataFrame, query: list[float], k: int = 10,
             num_planes: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id", seed: int = 42,
             multi_probe: int = 1) -> DataFrame:
    """Approximate top-k: hash the query with the same hyperplanes, scan
    only rows in the query's bucket (plus ``multi_probe`` one-bit-flip
    neighbor buckets). With b planes this reads ~(1+probes)/2^b of the data."""
    dim = len(query)
    planes = _hyperplanes(dim, num_planes, seed)
    qsig = 0
    for p, plane in enumerate(planes):
        if sum(q * w for q, w in zip(query, plane)) >= 0:
            qsig |= 1 << p
    probe_buckets = [qsig] if multi_probe == 0 \
        else [qsig] + [qsig ^ (1 << p) for p in range(num_planes)][:multi_probe]

    indexed = lsh_index(embeddings, num_planes, dim, vec_col, seed)
    candidates = indexed.filter(F.col("lsh_bucket").isin(probe_buckets))
    q = F.array(*[F.lit(float(x)) for x in query])
    return (candidates
            .select(F.col(id_col),
                    F.round(cosine(_as_double_array(F.col(vec_col)), q), 6)
                    .alias("cosine_sim"))
            .orderBy(F.desc("cosine_sim"), id_col)
            .limit(k))


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                              vec_col: str = "embedding", id_col: str = "vec_id",
                              num_planes: int = 8, seed: int = 42,
                              exact: bool = False) -> DataFrame:
    """Near-duplicate vector pairs by cosine. ``exact=True`` does the full
    self-join (oracle/verification path, quadratic); default buckets by LSH
    signature first so only same-bucket pairs are scored — the all-pairs
    shuffle shrinks by ~2^planes at a small recall cost."""
    e = embeddings.select(F.col(id_col),
                          _as_double_array(F.col(vec_col)).alias("_v"))
    if exact:
        a = e.select(F.col(id_col).alias("id_a"), F.col("_v").alias("va"))
        b = e.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"))
        pairs = a.crossJoin(broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    else:
        dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
        planes = _hyperplanes(dim_row["d"], num_planes, seed)
        sig = e.withColumn("_b", hyperplane_signature(F.col("_v"), planes))
        a = sig.select(F.col(id_col).alias("id_a"), F.col("_v").alias("va"), "_b")
        b = sig.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"), "_b")
        pairs = a.join(b, "_b").filter(F.col("id_a") < F.col("id_b"))
    return (pairs
            .select("id_a", "id_b",
                    F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold)
            .distinct())
