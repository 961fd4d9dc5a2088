"""Deterministic sampling for training-data pipelines.

A curation pipeline needs REPRODUCIBLE samples (the same corpus always
yields the same subset, on any cluster, resumable mid-run) — RNG-based
``df.sample`` is partition-order-dependent and non-resumable. These
operators derive sampling decisions from content-addressed hashes:

* ``stratified_sample`` — k rows per stratum, chosen as the smallest
  sha256(id) within the stratum: a uniform, deterministic draw that
  any engine reproduces bit-for-bit (the DuckDB oracle does). One
  shuffle on the stratum key; the rank window is the standard top-k
  shape (no global sort).
* ``hash_sample`` — keep ~1/m of rows by hash residue: a pure
  per-row predicate (zero shuffle), the same rule the IVF quantizer
  trains on (``functions/ivf.training_set``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sample_key(id_col: Column) -> Column:
    """64-bit-prefix sha256 sort key: uniform and engine-reproducible."""
    return F.substring(F.sha2(id_col.cast("string"), 256), 1, 16)


def stratified_sample(
    df: DataFrame, strata_col: str, k: int, id_col: str
) -> DataFrame:
    """k deterministic rows per stratum (smallest hash wins, id breaks
    the astronomically-unlikely hash tie)."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_key(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def hash_sample(df: DataFrame, id_col: str, mod: int, keep: int = 0) -> DataFrame:
    """Keep rows whose 64-bit id-hash residue mod ``mod`` equals
    ``keep`` (~1/mod of rows), as a pure predicate — pushes past any
    downstream shuffle."""
    h = F.conv(sample_key(F.col(id_col)), 16, 10).cast("decimal(20,0)")
    return df.filter(h % mod == keep)
