"""Leakage-safe train/validation/test splitting.

Splitting a training corpus doc-by-doc leaks: near-duplicate documents
land on both sides of the train/test boundary and the test set scores
memorization, not generalization (the contamination failure mode
measured by Lee et al. '22, "Deduplicating Training Data Makes
Language Models Better"). The safe unit of assignment is the near-dup
CLUSTER: every member of a connected component of the near-dup pair
graph must receive the SAME split.

``cluster_safe_split`` derives the split from a sha256 hash of the
CLUSTER id, not the doc id:

* deterministic — a re-run (or a different engine) assigns
  identically, no RNG state to ship;
* cluster-atomic by construction — members share cluster_id, hence
  the hash, hence the split;
* proportions hold per-bucket in expectation over the hash, and the
  assignment is stable under corpus growth: adding documents never
  reassigns an existing cluster (the property a frozen eval set
  needs).

100 TB shape: one row-local hash + CASE over the already-computed
cluster table. The expensive part (connected components) is the
dedup_clusters stage the pipeline already ran.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _bucket(cluster_id: Column, total: int) -> Column:
    """sha256-derived bucket in [0, total) — the repo's standard
    engine-portable hash (hex prefix as unsigned int)."""
    return (
        F.conv(
            F.substring(F.sha2(cluster_id.cast("string"), 256), 1, 12),
            16,
            10,
        ).cast("long")
        % total
    )


def cluster_safe_split(
    clusters: DataFrame,
    weights: list[tuple[str, int]] = (
        ("test", 1),
        ("valid", 1),
        ("train", 8),
    ),
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id, split): assign every near-dup cluster
    atomically to a named split with integer weights (default
    10%/10%/80%). ``clusters`` is dedup_clusters-shaped —
    (doc_id, cluster_id, ...)."""
    weights = list(weights)
    if not weights or any(w <= 0 for _, w in weights):
        raise ValueError("weights must be positive")
    total = sum(w for _, w in weights)
    b = _bucket(F.col("cluster_id"), total)
    expr = None
    lo = 0
    for name, w in weights[:-1]:
        cond = b < F.lit(lo + w)
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
        lo += w
    expr = (
        expr.otherwise(weights[-1][0])
        if expr is not None
        else F.lit(weights[-1][0])
    )
    return clusters.select(
        F.col(id_col), F.col("cluster_id"), expr.alias("split")
    )


def stratified_kfold(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    k: int = 5,
    salt: str = "kfold",
) -> DataFrame:
    """(id, stratum, fold): deterministic stratified k-fold assignment
    with EXACT balance — within every stratum the fold sizes differ by
    at most 1, which a pure hash-mod split cannot promise (binomial
    fluctuation makes small-stratum folds arbitrarily lopsided, and
    cross-validation variance grows with that imbalance).

    fold = (row_number within stratum, ordered by the salted 60-bit
    sha256 of the id with the id as tiebreak, minus 1) mod k — the
    hash provides the shuffle (ordering by raw id would fold
    correlated neighbors together), the rank provides the balance,
    and both are pure functions of (salt, ids): re-running on a grown
    corpus never depends on row order, and the DuckDB twin spells the
    identical arithmetic.

    Scale shape: ONE hash-partitioned window shuffle on the stratum
    key; per-stratum state is a row counter. Skewed strata are a
    sort, not a memory risk. NULL strata are kept as their own
    stratum (NULL-keyed windows are one partition on both engines).
    """
    from ocr_translation_spark.functions.sketches import hash60

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = hash60(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return df.select(
        id_col,
        stratum_col,
        ((F.row_number().over(w) - 1) % k).cast("integer").alias("fold"),
    )
