"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (pure Catalyst, no Python), per-query top-k via a
  rank window. At 100 TB the corpus side streams through executors
  once; only queries are broadcast.
* ``lsh_bucketed_topk`` — the scale path: sign-random-projection LSH
  (Charikar '02). Both sides are bucketed by the sign pattern of H
  fixed pseudo-random hyperplanes (deterministic: hyperplane components
  derive from xxhash64(dim, plane) — no RNG state, reproducible on any
  cluster). Candidates = bucket equi-join (optionally with multi-probe
  on single-bit flips), exact cosine re-rank inside buckets only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — exact top-k by cosine.

    Self-matches (same id) are excluded. Ties break by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane component list.

    Component (d, p) = centered hash in [-1, 1) — pure function, no RNG
    state, identical on every executor and every run.
    """
    import numpy as np

    # xxhash-free python twin: use a stable integer mix
    vals = []
    for d in range(dim):
        h = (d * 2654435761 + plane * 40503 + 12345) & 0xFFFFFFFF
        h ^= h >> 16
        h = (h * 2246822519) & 0xFFFFFFFF
        h ^= h >> 13
        vals.append((h / 2**31) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return list(np.array(vals) / n)


def srp_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (int, 2**n_planes buckets)."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        out = out + F.when(_dot(vec.cast("array<double>"), plane) >= 0,
                           F.lit(1 << p)).otherwise(0)
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket, exact cosine
    re-rank within bucket. Recall grows with fewer planes / multiprobe;
    cost shrinks with more planes. Returns same schema as brute force.

    ``multiprobe``: additionally probe buckets reachable by flipping
    each of the first ``multiprobe`` sign bits of the query's bucket
    (near-boundary vectors land one bit away; probing 1-bit flips
    recovers most of that recall for (multiprobe+1)x the candidates).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", srp_bucket(F.col("qv"), dim, n_planes))
    if multiprobe > 0:
        probes = F.array_distinct(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(min(multiprobe, n_planes))
                ],
            )
        )
        q = q.withColumn("bucket", F.explode(probes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", srp_bucket(F.col("cv"), dim, n_planes))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("sim"),
        )
        # multiprobe can reach the same neighbor via several buckets
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
