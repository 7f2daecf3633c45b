"""Mutable-table semantics over immutable parquet — the reference's
UPDATE/DELETE/MERGE surface (SURVEY §2.1 S5-S6; ``osm-road-graphs.sql``'s
in-place UPDATE passes) as a versioned, partition-level copy-on-write store.

This is a miniature of the Delta/Iceberg transaction-log design, built only
on parquet + JSON manifests so it runs anywhere Spark runs:

- Rows are hash-bucketed on the primary key into ``n_buckets`` partitions
  (a disk-level ``_bucket=`` directory per written version).
- Every mutation (merge / update / delete) rewrites **only the buckets it
  touches** and writes a new manifest mapping each bucket to the version
  directory that last rewrote it — mutation cost is proportional to the
  touched key range, not table size, which is what makes UPDATE viable at
  100 TB.
- A snapshot read unions the per-version directories with a disk-partition
  filter on ``_bucket`` (Spark prunes the untouched directories at plan
  time), so readers always see one consistent version; old manifests remain
  readable (time travel).

On a real deployment the same call sites map 1:1 to Delta/Iceberg
``MERGE INTO`` / ``UPDATE`` / ``DELETE`` — this module exists so the
semantics are executable and testable without those jars. Concurrency
control is last-writer-wins on the manifest pointer (single-writer
assumption; a lakehouse log is the production answer).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET = "_bucket"


class MutableTable:
    """A keyed, versioned parquet table supporting merge/update/delete.

    Layout under ``path``::

        data/v<N>/_bucket=<b>/*.parquet   -- buckets rewritten by version N
        manifest/v<N>.json                -- {bucket: version that owns it}
        _latest                           -- current version number
    """

    def __init__(self, spark: SparkSession, path: str, key: str,
                 n_buckets: int = 16):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key = key
        self.n_buckets = n_buckets
        self._schema = None

    def _data_schema(self):
        """Schema of the bucketed data files (incl. ``_bucket``), read
        once from version 0 — which ``create`` always materializes in
        full. Passing it explicitly to every scan means a version dir
        whose rewrite produced ZERO rows (e.g. a delete emptying every
        touched bucket — just _SUCCESS on disk) reads as an empty
        DataFrame instead of failing schema inference."""
        if self._schema is None:
            self._schema = self.spark.read.parquet(
                f"{self.path}/data/v0").schema
        return self._schema

    # ---- snapshot bookkeeping -------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return f"{self.path}/manifest/v{version}.json"

    def latest_version(self) -> int:
        with open(f"{self.path}/_latest", encoding="utf-8") as fh:
            return int(fh.read().strip())

    def versions(self) -> list[int]:
        mdir = f"{self.path}/manifest"
        return sorted(int(f[1:-5]) for f in os.listdir(mdir)
                      if f.startswith("v") and f.endswith(".json"))

    def _read_manifest(self, version: int) -> dict[str, int]:
        with open(self._manifest_path(version), encoding="utf-8") as fh:
            return {k: int(v) for k, v in json.load(fh).items()}

    def _commit(self, version: int, manifest: Mapping[str, int]) -> None:
        os.makedirs(f"{self.path}/manifest", exist_ok=True)
        with open(self._manifest_path(version), "w", encoding="utf-8") as fh:
            json.dump(dict(manifest), fh)
        tmp = f"{self.path}/_latest.tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(str(version))
        os.replace(tmp, f"{self.path}/_latest")  # atomic pointer flip

    def _bucket_of(self, c: Column) -> Column:
        # crc32 of the string key: stable across Spark versions/restarts
        # (unlike hash()'s seed-sensitive murmur3 on some types)
        return F.pmod(F.crc32(c.cast("string")), F.lit(self.n_buckets)) \
                .cast("int")

    def _write_buckets(self, df: DataFrame, version: int) -> None:
        (df.repartition(_BUCKET)
           .write.mode("errorifexists").partitionBy(_BUCKET)
           .parquet(f"{self.path}/data/v{version}"))

    # ---- public API ------------------------------------------------------

    def create(self, df: DataFrame) -> "MutableTable":
        """Materialize version 0 from ``df`` (all buckets)."""
        data = df.withColumn(_BUCKET, self._bucket_of(F.col(self.key)))
        self._write_buckets(data, 0)
        self._commit(0, {str(b): 0 for b in range(self.n_buckets)})
        return self

    def read(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest). One parquet scan
        per distinct owning version, disk-partition-pruned to the buckets
        that version still owns."""
        return self._read_buckets(version, None)

    def _read_buckets(self, version: int | None,
                      only: list[int] | None) -> DataFrame:
        """``read`` restricted to a bucket subset (``only=None`` = all)."""
        version = self.latest_version() if version is None else version
        manifest = self._read_manifest(version)
        by_version: dict[int, list[int]] = {}
        for bucket, owner in manifest.items():
            if only is None or int(bucket) in only:
                by_version.setdefault(owner, []).append(int(bucket))
        if not by_version:
            return self.read(version).limit(0)
        parts = []
        for owner, buckets in sorted(by_version.items()):
            scan = (self.spark.read.schema(self._data_schema())
                    .parquet(f"{self.path}/data/v{owner}"))
            parts.append(scan.filter(F.col(_BUCKET).isin(buckets)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.drop(_BUCKET)

    def snapshot_changes(self, v_from: int,
                         v_to: int | None = None,
                         columns: list[str] | None = None) -> DataFrame:
        """CDC between two snapshots *with row payloads*: one row per
        changed key with ``change`` ∈ insert | update | delete plus the
        ``old``/``new`` row structs — the retract/apply feed an
        incremental view-maintenance pass consumes. Manifest-pruned: a
        bucket owned by the same data version in both manifests cannot
        differ and is never scanned — a diff after a point mutation reads
        only the rewritten buckets, not the table. The remaining buckets
        full-outer join on the key and compare null-safely.

        ``columns`` (optional) declares the tracked column set: when the
        consumer is a maintained aggregate that only depends on a few
        columns, passing them restricts BOTH the comparison and the
        parquet scan to key + those columns (the projection lands before
        the struct, so Spark pushes the pruning into the scan instead of
        reading the whole row). An update that touches only untracked
        columns is then — correctly, for that consumer — not a change.
        ``None`` keeps full-row semantics."""
        v_to = self.latest_version() if v_to is None else v_to
        mf = self._read_manifest(v_from)
        mt = self._read_manifest(v_to)
        changed = sorted(int(b) for b in set(mf) | set(mt)
                         if mf.get(b) != mt.get(b))
        old = self._read_buckets(v_from, changed)
        new = self._read_buckets(v_to, changed)
        value_cols = [c for c in old.columns if c != self.key]
        if columns is not None:
            missing = sorted(set(columns) - set(value_cols))
            if missing:
                raise ValueError(
                    f"tracked columns not in table (or are the key): "
                    f"{missing}")
            value_cols = [c for c in value_cols if c in set(columns)]
            old = old.select(self.key, *value_cols)
            new = new.select(self.key, *value_cols)
        o = old.select(self.key, F.struct(*value_cols).alias("_o"))
        n = new.select(self.key, F.struct(*value_cols).alias("_n"))
        j = o.join(n, self.key, "full_outer")
        change = (F.when(F.col("_n").isNull(), F.lit("delete"))
                  .when(F.col("_o").isNull(), F.lit("insert"))
                  .when(~F.col("_o").eqNullSafe(F.col("_n")),
                        F.lit("update")))
        return (j.select(self.key, change.alias("change"),
                         F.col("_o").alias("old"), F.col("_n").alias("new"))
                .filter(F.col("change").isNotNull()))

    def snapshot_diff(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Key-level CDC: :meth:`snapshot_changes` without the payloads."""
        return self.snapshot_changes(v_from, v_to).select(self.key, "change")

    def _mutate(self, touched: DataFrame,
                rewrite: Callable[[DataFrame], DataFrame]) -> "MutableTable":
        """Copy-on-write one step: ``touched`` is a tiny DataFrame with the
        affected bucket ids; ``rewrite(old)`` maps the current rows of those
        buckets (with ``_bucket`` column) to their replacement."""
        version = self.latest_version()
        manifest = self._read_manifest(version)
        buckets = [r[_BUCKET] for r in touched.distinct().collect()]
        if not buckets:
            self._commit(version + 1, manifest)
            return self
        current = self.read(version)
        old = (current.withColumn(_BUCKET, self._bucket_of(F.col(self.key)))
               .filter(F.col(_BUCKET).isin(buckets)))
        self._write_buckets(rewrite(old), version + 1)
        for b in buckets:
            manifest[str(b)] = version + 1
        self._commit(version + 1, manifest)
        return self

    def merge(self, source: DataFrame, when_matched: str = "update",
              insert_unmatched: bool = True) -> "MutableTable":
        """``MERGE INTO`` on the primary key: ``when_matched`` is
        ``"update"`` (replace the row with the source row) or ``"delete"``;
        unmatched source rows are inserted unless ``insert_unmatched`` is
        False. Source keys must be unique. Only buckets containing source
        keys are rewritten."""
        if when_matched not in ("update", "delete"):
            raise ValueError(f"when_matched must be update|delete, "
                             f"got {when_matched!r}")
        src = source.withColumn(_BUCKET, self._bucket_of(F.col(self.key)))

        def rewrite(old: DataFrame) -> DataFrame:
            kept = old.join(src.select(self.key), self.key, "left_anti")
            if when_matched == "delete":
                return kept
            if insert_unmatched:
                return kept.unionByName(src)
            hits = src.join(old.select(self.key), self.key, "left_semi")
            return kept.unionByName(hits)

        return self._mutate(src.select(_BUCKET), rewrite)

    def update(self, condition: Column,
               assignments: Mapping[str, Column]) -> "MutableTable":
        """``UPDATE SET col = expr WHERE condition`` — recompute-as-rewrite
        of every bucket holding a matching row (the S5 pattern, now with
        real in-place table semantics)."""
        current = self.read()
        touched = (current.filter(condition)
                   .select(self._bucket_of(F.col(self.key)).alias(_BUCKET)))

        def rewrite(old: DataFrame) -> DataFrame:
            cond = F.coalesce(condition, F.lit(False))
            return old.select(
                *[F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                  if c in assignments else F.col(c)
                  for c in old.columns])

        return self._mutate(touched, rewrite)

    def delete(self, condition: Column) -> "MutableTable":
        """``DELETE WHERE condition`` — NULL-preserving inverse filter
        (rows where the predicate is NULL survive, 3VL like the reference's
        S6), rewriting only buckets with a matching row."""
        current = self.read()
        touched = (current.filter(condition)
                   .select(self._bucket_of(F.col(self.key)).alias(_BUCKET)))

        def rewrite(old: DataFrame) -> DataFrame:
            return old.filter(~F.coalesce(condition, F.lit(False)))

        return self._mutate(touched, rewrite)


    def compact(self) -> "MutableTable":
        """Rewrite every bucket into one fresh version — the lakehouse
        ``OPTIMIZE`` analog. A long mutation history spreads bucket
        ownership across versions, so a snapshot read unions one scan per
        owning version; compaction collapses that back to a single scan
        (and is the natural point to re-bucket or sort). Cost: one full
        table rewrite, same as any OPTIMIZE."""
        version = self.latest_version()
        data = (self.read(version)
                .withColumn(_BUCKET, self._bucket_of(F.col(self.key))))
        self._write_buckets(data, version + 1)
        self._commit(version + 1,
                     {str(b): version + 1 for b in range(self.n_buckets)})
        return self

    def vacuum(self, retain_last: int = 1) -> list[int]:
        """Drop version directories and manifests not reachable from the
        newest ``retain_last`` manifests — the ``VACUUM`` analog that
        reclaims copy-on-write storage. Time travel keeps working for
        retained manifests (including older owner versions they still
        reference); earlier versions become unreadable. Returns the
        removed version numbers. Single-writer, like every commit."""
        import shutil  # noqa: PLC0415

        if retain_last < 1:
            raise ValueError(f"retain_last must be >= 1, got {retain_last}")
        versions = self.versions()
        retained = versions[-retain_last:]
        keep_owners: set[int] = set()
        for v in retained:
            keep_owners.update(self._read_manifest(v).values())
        for v in versions:
            if v not in retained:
                os.remove(self._manifest_path(v))
        removed = []
        data_dir = f"{self.path}/data"
        for d in os.listdir(data_dir) if os.path.isdir(data_dir) else []:
            if not d.startswith("v"):
                continue
            n = int(d[1:])
            if n not in keep_owners:
                shutil.rmtree(os.path.join(data_dir, d))
                removed.append(n)
        return sorted(removed)


def merge_statement(target: DataFrame, source: DataFrame,
                    key_cols: Sequence[str]) -> DataFrame:
    """Stateless MERGE (upsert) expression for callers that manage their own
    storage: target rows whose key appears in ``source`` are replaced, new
    keys appended — the anti-join + union plan a lakehouse engine generates
    for ``MERGE INTO`` (cf. :func:`..streaming.actions.apply_actions`)."""
    return (target.join(source.select(*key_cols).distinct(),
                        list(key_cols), "left_anti")
            .unionByName(source))
