"""Statistical aggregates — SURVEY §2.4 A3-A6, §2.5 W2-W5.

The reference defines a custom exact-median UDAF (``general-functions.sql:
7-34``) and window-based weighted medians (``general-functions.sql:52-106``).
Spark's built-in ``percentile`` is an exact interpolating percentile
(PERCENTILE_CONT semantics, matching ``osm-complete-graphs.sql:33-38``), so
the median UDAF needs no custom aggregation machinery. Weighted medians are
re-expressed with window running sums — the same construction the reference
uses, minus its dynamic SQL (Python parameterization replaces ``format()`` +
``EXECUTE``, ``general-functions.sql:61-72``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def median(c: Column | str) -> Column:
    """Exact median aggregate (``general-functions.sql:29-34``): NULLs
    excluded (the SFUNC skips them at ``:12``), even counts average the two
    middle values (``:23-24`` LIMIT/OFFSET midpoint + AVG)."""
    return F.percentile(F.col(c) if isinstance(c, str) else c, F.lit(0.5))


def median_by_group(df: DataFrame, group_cols: list[str], value_col: str,
                    alias: str = "median") -> DataFrame:
    """``SELECT g, median(x) ... GROUP BY g`` (``osm-road-graphs.sql:43-46``,
    ``osm-complete-graphs.sql:33-38``). Partial aggregation happens map-side;
    the grouped result is tiny (one row per highway class) and broadcastable
    for the imputation join (J6)."""
    return df.groupBy(*group_cols).agg(median(value_col).alias(alias))


def weighted_median(df: DataFrame, x: str, w: str,
                    group_cols: list[str] | None = None,
                    alias: str = "weighted_median",
                    reference_quirks: bool = False) -> DataFrame:
    """Weighted median via running-sum windows — port of
    ``weighted_median`` (``general-functions.sql:52-75``) and
    ``weighted_median_by_group`` (``:84-106``).

    Construction:

    - order rows by x; compute running weight sum including (W3) and
      excluding (W4) the current row, plus the total weight (W5);
    - keep rows where total/2 lies in [prev_sum, run_sum];
    - aggregate the straddling rows' x (see modes below).

    NULL weights count as 0 (``coalesce(w,0)``, ``:65-67``).

    **Two modes**, because the reference's plpgsql has measured quirks
    (r6: both functions executed live on PostgreSQL 15 via
    ``tests/test_pg_reference_parity.py``):

    - the reference never coalesces the FIRST row's ``prevsum`` (NULL →
      ``BETWEEN`` fails), so the smallest row can never be the hit: a
      weight profile whose median IS the minimum (e.g. weights 10,1,1)
      returns NULL/empty live, and its all-zero-weight smoke table
      ``temp_table2`` averages only rows 2..n (= 2.74, not the all-rows
      2.2833…);
    - the grouped variant aggregates the straddle with ``max`` (upper
      value — its ``prevx`` window expression equals x, so the even-count
      CASE collapses to max) while the ungrouped variant averages —
      internally inconsistent conventions.

    Default (``reference_quirks=False``) is the REPAIRED construction:
    prev coalesced to 0 everywhere (the minimum can be the median) and
    the interpolating average used in both shapes — this is what every
    gate pins. ``reference_quirks=True`` reproduces the live PostgreSQL
    outputs bit for bit (first-row exclusion + grouped max), for users
    who need drop-in agreement with the reference, quirks included.

    Scale note: the grouped form shuffles on the group key and sorts within
    partitions. The ungrouped form does NOT plan a single-partition window:
    it buckets x into deterministic ordered ranges (pure function of the
    data, ``functions.partitioning``), computes per-bucket running sums, and
    adds broadcast cumulative bucket offsets (the same JVM-side prefix-sum
    construction as ``create_topology``'s dense ids). Exact because the
    decimal sums are associative; the only unpartitioned window runs over
    the one-row-per-bucket offsets table.
    """
    gcols = group_cols or []
    # Exact decimal weight sums: the midpoint-straddle comparison below must
    # not depend on float summation order (ties at total/2 would otherwise be
    # engine- and partitioning-dependent).
    cw = F.coalesce(F.col(w), F.lit(0)).cast("decimal(28,6)")

    if gcols:
        # (an applyInPandas formulation of the same computation lives in
        # weighted_median_pandas below — the true UDTF analog of U5)
        w_ord = Window.partitionBy(*gcols).orderBy(F.col(x))
        prev_raw = F.sum(cw).over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
        run = F.sum(cw).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        prev = F.coalesce(prev_raw, F.lit(0).cast("decimal(28,6)"))
        total = F.sum(cw).over(Window.partitionBy(*gcols))
        scored = df.select(*gcols, F.col(x).cast("double").alias("_x"),
                           run.alias("_run"), prev.alias("_prev"),
                           total.alias("_tot"),
                           prev_raw.isNull().alias("_isfirst"))
    else:
        # distributed global prefix sum: bucket p holds smaller x than p+1
        # (deterministic data-derived boundaries, not runtime partition ids),
        # so run = local running sum + sum of earlier buckets' totals
        from ..functions.partitioning import deterministic_buckets  # noqa: PLC0415

        base = df.select(F.col(x).cast("double").alias("_x"), cw.alias("_w"))
        bucketed = base.withColumn(
            "_pid", deterministic_buckets(base, "_x"))
        w_local = Window.partitionBy("_pid").orderBy("_x")
        w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        zero = F.lit(0).cast("decimal(28,6)")
        offs = (bucketed.groupBy("_pid").agg(F.sum("_w").alias("_c"))
                .select("_pid",
                        F.coalesce(F.sum("_c").over(w_off), zero).alias("_off"),
                        F.sum("_c").over(w_off).isNull().alias("_firstpid"),
                        F.sum("_c").over(Window.partitionBy()).alias("_tot")))
        local_run = F.sum("_w").over(w_local.rowsBetween(Window.unboundedPreceding, 0))
        local_prev_raw = F.sum("_w").over(
            w_local.rowsBetween(Window.unboundedPreceding, -1))
        scored = (bucketed.join(F.broadcast(offs), "_pid")
                  .select("_x",
                          (local_run + F.col("_off")).alias("_run"),
                          (F.coalesce(local_prev_raw, zero)
                           + F.col("_off")).alias("_prev"),
                          "_tot",
                          (local_prev_raw.isNull()
                           & F.col("_firstpid")).alias("_isfirst")))

    half = F.col("_tot") / 2
    hit = scored.filter((half >= F.col("_prev")) & (half <= F.col("_run")))
    if reference_quirks:
        # the reference's un-coalesced prevsum: the globally/per-group
        # first row can never straddle (measured live — see docstring)
        hit = hit.filter(~F.col("_isfirst"))
    pick = F.max("_x") if (reference_quirks and gcols) else F.avg("_x")
    agg = hit.groupBy(*gcols).agg(pick.alias(alias))
    return agg


def weighted_median_pandas(df: DataFrame, x: str, w: str,
                           group_cols: list[str],
                           alias: str = "weighted_median") -> DataFrame:
    """``weighted_median_by_group`` as a true UDTF (§2.10 U5): the
    reference's plpgsql ``RETURNS TABLE`` function maps to ``applyInPandas``
    — one Arrow batch per group in, one result row per group out.

    Semantics are identical to :func:`weighted_median` (proved equivalent in
    tests); this variant exists for computations a window construction can't
    express. Per-group data must fit one executor's memory — the same
    contract as any grouped pandas UDF."""
    import pandas as pd  # noqa: PLC0415

    schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*group_cols).dtypes]
        + [f"{alias} double"])

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf[[x, w]].copy()
        s[w] = s[w].fillna(0)
        s = s.sort_values(x, kind="mergesort")
        run = s[w].cumsum()
        prev = run - s[w]
        half = s[w].sum() / 2.0
        hit = s[x][(prev <= half) & (half <= run)]
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out[alias] = [float(hit.astype(float).mean())]
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(one_group, schema=schema)


def quantile_sketch_by_group(df: DataFrame, group_cols: list[str],
                             value_col: str, hash_cols: list[str],
                             k: int = 256,
                             qs: tuple[float, ...] = (0.25, 0.5, 0.75,
                                                      0.9, 0.99),
                             scale: int = 4,
                             salt_parts: int = 32) -> DataFrame:
    """Mergeable bounded-memory quantile sketch per group — the scale-safe
    sibling of :func:`quantiles_by_group` (whose exact Percentile
    aggregate buffers a value→count map per group: memory-unbounded when
    a skewed group's column is nearly all-distinct).

    The sketch is a KMV-style deterministic uniform sample: each row gets
    ``md5(concat_ws('|', hash_cols))`` and a group keeps the ``k`` rows
    with the smallest hashes (ties broken by value, so the selected value
    MULTISET is a pure function of the data). Bottom-k-by-fixed-hash is
    mergeable by construction — the bottom-k of a union is the bottom-k
    of the parts' bottom-k sets — and the estimate is PERCENTILE_CONT
    over the sample (standard error ≈ sqrt(p(1-p)/k)), with the group's
    TRUE row count carried alongside.

    Plan shape (the reason this exists): the exact path and a naive
    per-group rank-filter both let a handful of giant groups own whole
    reducers. Here phase 1 ranks within (group, salt) — salt =
    xxhash64 of the row hash mod ``salt_parts`` — so every sort
    partition holds ≤ rows/salt_parts rows (spillable, skew-free), and
    phase 2 re-ranks only the ≤ salt_parts·k surviving candidates per
    group. The salt provably cannot change the answer: any row in the
    global bottom-k is in its salt partition's bottom-k, so the
    candidate set always contains the true sample — which is why the
    single-node oracle can recompute the identical sketch with one
    plain ROW_NUMBER, no salt. ``hash_cols`` should be integer-valued
    (both engines format integers identically inside the md5 input;
    float formatting differs).

    Returns group_cols + p25/p50/... + ``n_values`` (true non-null row
    count) + ``n_sampled`` (min(k, n_values))."""
    from pyspark.sql import Window  # noqa: PLC0415

    v = F.col(value_col)
    h = F.md5(F.concat_ws("|", *[F.col(c).cast("string")
                                 for c in hash_cols]))
    base = (df.filter(v.isNotNull())
            .select(*group_cols, v.alias("_v"), h.alias("_h"))
            .withColumn("_salt", F.pmod(F.xxhash64("_h"),
                                        F.lit(salt_parts))))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("_h", "_v")
    c1 = Window.partitionBy(*group_cols, "_salt")
    cand = (base
            .withColumn("_rn1", F.row_number().over(w1))
            .withColumn("_cnt", F.count("_v").over(c1))
            .filter(F.col("_rn1") <= k))
    w2 = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    ranked = cand.withColumn("_rn2", F.row_number().over(w2))
    sample_v = F.when(F.col("_rn2") <= k, F.col("_v"))
    arr = F.percentile(sample_v, F.array(*[F.lit(q) for q in qs]))
    names = [f"p{round(q * 100)}" for q in qs]
    return (ranked.groupBy(*group_cols)
            .agg(*[F.round(arr[i], scale).alias(n)
                   for i, n in enumerate(names)],
                 F.sum(F.when(F.col("_rn1") == 1, F.col("_cnt")))
                 .alias("n_values"),
                 F.count(sample_v).alias("n_sampled")))


# method="auto" crossover: above this estimated input size the exact
# percentile's value->count map is assumed unbounded-cardinality-risky
# (measured r11, SCALING.md: on a 97%-distinct column the map IS the
# data) and the bounded-memory approx sketch takes over. 64 MB ~= 3.5 M
# lineitem rows: the sf0.01 gate (1 MB) and the sf0.1 headline bench
# (11 MB) stay on the exact, hash-reproducible path; sf1+ (119 MB+)
# flips to the 100-TB-safe sketch.
AUTO_APPROX_BYTES = 64 * 1024 * 1024


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated input size for ``df`` (file bytes for parquet
    scans) — the cheap, job-free proxy the ``method="auto"`` crossover
    keys on. None when the estimate is unavailable (then callers fall
    back to the exact path, the conservative-for-correctness choice)."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps Scala BigInt to a Python int; keep a string fallback
        # in case a py4j version hands back the raw JVM object
        size = size if isinstance(size, int) else int(size.toString())
        # plans with no real estimate (RDD-backed createDataFrame, some
        # joins) report spark.sql.defaultSizeInBytes = Long.MaxValue —
        # that is "unknown", not "huge": return None so auto stays exact
        return None if size >= (1 << 62) else size
    except Exception:  # py4j / analysis errors: no estimate
        return None


def quantiles_by_group(df: DataFrame, group_cols: list[str], value_col: str,
                       qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
                       scale: int = 4,
                       method: str = "auto",
                       accuracy: int = 10000,
                       auto_approx_bytes: int = AUTO_APPROX_BYTES
                       ) -> DataFrame:
    """Multi-quantile profile per group, one column per requested quantile
    named ``p25``, ``p50``, ``p99``... — the n-quantile generalization of
    :func:`median_by_group`; the column profile a data-quality dashboard
    or a length-filter threshold sweep needs.

    ``method`` picks the memory/exactness point (r11, the documented
    scale recipe; r12 wires the crossover into the default):

    - ``"auto"`` (default) — exact below ``auto_approx_bytes`` of
      Catalyst-estimated input (small/gate-checked runs stay
      hash-reproducible), approx above it (the memory axis dominates:
      SCALING.md's r11 crossover measurement). Deterministic in the
      input size, so a given dataset always takes the same path.
    - ``"exact"`` — PERCENTILE_CONT semantics (rank ``q*(n-1)``, linear
      interpolation; NULLs excluded) via one ``F.percentile`` aggregate:
      Spark buffers a value→count map per group, so memory is O(distinct
      values per group). Right when group cardinality is bounded (enums,
      codes) or the run is gate-checked. On a ~97%-distinct column this
      map IS the data — memory-unbounded under group skew at 100 TB.
    - ``"approx"`` — THE 100-TB default: ``F.percentile_approx``
      (Greenwald–Khanna-style mergeable sketch, JVM-side, map-side
      combinable), memory O(``accuracy``) per group regardless of
      cardinality, rank error ≤ 1/``accuracy``. Same output shape; not
      bit-reproducible across engines, so gates keep the exact or KMV
      paths.
    - For cross-engine hash-exactness WITH bounded memory, use
      :func:`quantile_sketch_by_group` (deterministic KMV bottom-k whose
      oracle recomputes the identical sketch state); measured error and
      the exact-vs-sketch crossover live in SCALING.md.
    """
    col = F.col(value_col)
    if method == "auto":
        size = _plan_size_bytes(df)
        method = ("approx" if size is not None
                  and size > auto_approx_bytes else "exact")
    if method == "exact":
        arr = F.percentile(col, F.array(*[F.lit(q) for q in qs]))
    elif method == "approx":
        arr = F.percentile_approx(col, F.array(*[F.lit(q) for q in qs]),
                                  F.lit(accuracy))
    else:
        raise ValueError("method must be 'auto', 'exact' or 'approx' (use "
                         "quantile_sketch_by_group for the deterministic "
                         "bounded-memory sketch)")
    names = [f"p{round(q * 100)}" for q in qs]
    return (df.groupBy(*group_cols)
            .agg(*[F.round(arr[i], scale).alias(n)
                   for i, n in enumerate(names)],
                 F.count(col).alias("n_values")))
