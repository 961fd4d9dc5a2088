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

from pyspark.sql import Column, DataFrame, functions as F


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
