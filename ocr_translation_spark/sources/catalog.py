"""Thin table catalog: Iceberg when the runtime has it, parquet paths
otherwise (SURVEY.md section 7 — Iceberg is packaging, not semantics).

On a production cluster this resolves names through a configured
Iceberg catalog (``spark.read.format("iceberg").load("db.tbl")``,
MERGE-based idempotent appends). In this container there is no Iceberg
connector, so the same API is served by a parquet directory layout:

    root/
      documents.parquet | documents/   (file or dir both fine)
      media.parquet
      ...

Writes emulate MERGE idempotence by partition-directory overwrite
(the resume protocol's commit unit — see operators/resume.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = False  # no connector in this environment

    def _path(self, name: str) -> str:
        p = os.path.join(self.root, f"{name}.parquet")
        if os.path.exists(p):
            return p
        return os.path.join(self.root, name)

    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def load_or_none(self, name: str) -> DataFrame | None:
        """Cache-error fallback (reference parity: a cache GET error
        falls back to recompute, ``TranslationQueue.js:58-83``): a
        missing OR unreadable/corrupt cache table degrades to None —
        the caller recomputes — instead of failing the job.

        Validation is EAGER (schema resolve + one-row probe) because
        Spark reads are lazy: a poisoned cache path must surface here,
        where we can degrade, not mid-pipeline where it would abort the
        run. Individually corrupt files inside an otherwise-healthy
        table are dropped (ignoreCorruptFiles) — their entries read as
        cache misses and are recomputed, exactly the reference's
        per-GET error semantics.
        """
        if not self.exists(name):
            return None
        try:
            df = self.spark.read.option("ignoreCorruptFiles", "true").parquet(
                self._path(name)
            )
            df.limit(1).collect()
            return df
        except Exception:
            return None

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(os.path.join(self.root, name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self.root, name))

    def _write_swap(self, df: DataFrame, path: str) -> None:
        """Crash-safe table replace: fully write to a TEMP directory,
        then swap in with directory renames. The live table is never
        read-and-overwritten in place (Spark's ``cache()`` is not a
        durability barrier: evicted blocks would be recomputed from a
        half-truncated source mid-write). A crash at any point leaves
        either the old table or the new one, never a torn mix."""
        import shutil
        import uuid

        tmp = f"{path}.__swap_tmp_{uuid.uuid4().hex[:8]}"
        old = f"{path}.__swap_old_{uuid.uuid4().hex[:8]}"
        try:
            # full materialization into tmp happens while `path` is
            # still intact — a failure here leaves the table untouched
            df.write.mode("overwrite").parquet(tmp)
            if os.path.exists(path):
                os.rename(path, old)
            os.rename(tmp, path)
        except Exception:
            if not os.path.exists(path) and os.path.exists(old):
                os.rename(old, path)  # roll back the first rename
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        shutil.rmtree(old, ignore_errors=True)

    def merge_by_key(self, df: DataFrame, name: str, key: str) -> None:
        """Idempotent upsert: existing rows win on key collision
        (cache-table semantics: a cached result never changes).
        Crash-safe via ``_write_swap``; with a real Iceberg catalog
        this whole method is one ``MERGE INTO`` (atomic snapshot
        commit). An UNREADABLE existing table raises — use
        ``merge_cache`` when the table is advisory/rebuildable.
        """
        path = os.path.join(self.root, name)
        if not os.path.exists(path):
            df.write.mode("overwrite").parquet(path)
            return
        existing = self.spark.read.parquet(path)
        merged = existing.unionByName(
            df.join(existing.select(key), key, "left_anti")
        )
        self._write_swap(merged, path)

    def merge_cache(self, df: DataFrame, name: str, key: str) -> None:
        """``merge_by_key`` with cache-table error semantics: an
        unreadable/corrupt existing table is REPLACED by the new
        entries instead of failing the run — a cache is rebuildable
        by definition, and aborting the job to protect corrupt
        advisory data inverts the priorities (reference parity: cache
        errors degrade to recompute, ``TranslationQueue.js:58-83``).
        Readable files inside a partly-corrupt table are preserved."""
        path = os.path.join(self.root, name)
        if not os.path.exists(path):
            df.write.mode("overwrite").parquet(path)
            return
        existing = self.load_or_none(name)
        if existing is None:
            self._write_swap(df, path)
            return
        merged = existing.unionByName(
            df.join(existing.select(key), key, "left_anti")
        )
        self._write_swap(merged, path)
