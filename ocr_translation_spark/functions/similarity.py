"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (pure Catalyst, no Python), per-query top-k via a
  rank window. At 100 TB the corpus side streams through executors
  once; only queries are broadcast.
* ``lsh_bucketed_topk`` — the scale path: sign-random-projection LSH
  (Charikar '02). Both sides are bucketed by the sign pattern of H
  fixed pseudo-random Rademacher hyperplanes (deterministic, derived
  from sha256 of the plane/dim coordinates — no RNG state,
  reproducible on any cluster AND by the DuckDB oracle). Candidates =
  bucket equi-join (optionally with multi-probe on single-bit flips),
  exact cosine re-rank inside buckets only.
* ``srp_near_dup_pairs`` — embedding near-dup at scale: same SRP
  buckets, candidate PAIRS share a bucket (never an all-pairs cross
  join), exact cosine verify >= threshold.
"""

from __future__ import annotations

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


def srp_plane_signs(dim: int, plane: int) -> list[float]:
    """Deterministic Rademacher (+1/-1) hyperplane components.

    Sign (d, p) = low bit of sha256("plane:<p>:<d>") — a pure function
    of the coordinates, no RNG state, identical on every executor and
    every run, and trivially re-computable by an external oracle
    (``__spark_entry__.py`` embeds the same signs as SQL literals, so
    the LSH queries are value-checked end to end). Rademacher planes
    are a standard SRP instantiation (Achlioptas '01 sparse random
    projections; signs suffice for Charikar '02 sign-LSH).
    """
    import hashlib

    return [
        1.0
        if hashlib.sha256(f"plane:{plane}:{d}".encode()).digest()[0] & 1
        else -1.0
        for d in range(dim)
    ]


def srp_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (int, 2**n_planes buckets)."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in srp_plane_signs(dim, p)])
        out = out + F.when(_dot(vec.cast("array<double>"), plane) >= 0,
                           F.lit(1 << p)).otherwise(0)
    return out


def srp_table_bucket(
    vec: Column, dim: int, table: int, planes_per_table: int
) -> Column:
    """Bucket id within hash table ``table`` — the sign pattern of that
    table's own slice of the global plane sequence (planes
    ``table*planes_per_table ..+planes_per_table``)."""
    out = F.lit(0)
    for p in range(planes_per_table):
        plane = F.array(
            *[
                F.lit(v)
                for v in srp_plane_signs(dim, table * planes_per_table + p)
            ]
        )
        out = out + F.when(
            _dot(vec.cast("array<double>"), plane) >= 0, F.lit(1 << p)
        ).otherwise(0)
    return out


def srp_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float,
    n_tables: int = 8,
    planes_per_table: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, sim >= threshold)
    via banded SRP-LSH — the SCALE path for what the all-pairs
    baseline (``embedding_neardup``) does in O(n^2).

    OR-amplification across L hash tables of H planes each (the SRP
    analogue of MinHash banding): a pair is a candidate iff it shares
    a bucket in ANY table; recall at cosine s is 1-(1-p^H)^L with
    p = 1 - arccos(s)/pi. Defaults (L=8, H=6) give ~0.98 at s=0.9.
    Candidates come from a (table, bucket) equi-join — never an
    all-pairs cross join — and are verified with exact cosine; cost is
    sum over buckets of bucket_size^2.

    Hot-bucket guard: EXACT-duplicate vectors (the same page embedded
    many times) share every table's bucket, so a B-copy group would
    emit B^2 candidates in one bucket task. Identical vectors are
    collapsed to one representative (groupBy on the vector itself —
    collision-free; a production deployment over packed floats would
    key on a 256-bit content hash) before bucketing, and pairs fan
    back out afterwards: within-group cosine is computed on the
    (identical) member vectors, cross-group pairs inherit the verified
    representative similarity. Output rows are unchanged.
    ``max_bucket_size`` drops still-oversized buckets (true SRP
    collisions between distinct vectors) with a logged count.

    Repeat calls with the same corpus plan and parameters return the
    prepared DataFrame (``_lsh_common.prepared``).
    """
    from ._lsh_common import prepared

    return prepared(
        "srp_near_dup_pairs",
        df,
        (dim, threshold, n_tables, planes_per_table, id_col, vec_col,
         round_digits, max_bucket_size),
        lambda: _build_srp_near_dup_pairs(
            df, dim, threshold, n_tables, planes_per_table, id_col,
            vec_col, round_digits, max_bucket_size,
        ),
    )


def _build_srp_near_dup_pairs(
    df, dim, threshold, n_tables, planes_per_table, id_col, vec_col,
    round_digits, max_bucket_size,
):
    from ._lsh_common import (
        cap_buckets,
        collapse_exact,
        fan_out_pairs,
        pin_exclusive,
        within_group_pairs,
    )

    # (no spread_small_input: the plane dot products run on reps AFTER
    # the collapse shuffle, already at full parallelism)
    # the vector IS the collapse fingerprint (groupBy on the array is
    # collision-free; a production deployment over packed floats would
    # key on a 256-bit content hash); one corpus pass feeds the pinned
    # collapse aggregate, and when no exact-duplicate vectors exist the
    # fan-out suffix is skipped entirely (dup_expand=None).
    members = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_fp"),
    )
    rep_rows, dup_expand = collapse_exact(members, "srp_near_dup_pairs")
    base = rep_rows.select("_id", F.col("_fp").alias("v")).withColumn(
        "buckets",
        F.array(
            *[
                srp_table_bucket(F.col("v"), dim, t, planes_per_table)
                for t in range(n_tables)
            ]
        ),
    )
    # the L*H plane dot products feed the band explode AND both verify
    # joins read the vectors — pin once per call (released on repeat)
    base = pin_exclusive(base, "srp_near_dup_pairs")
    # candidate generation carries ids only (vectors do not ride the
    # L-way band explode shuffle); vectors join back for the few pairs
    banded = base.select(
        "_id", F.posexplode("buckets").alias("tbl", "bucket")
    )
    if max_bucket_size is not None:
        banded, _ = cap_buckets(
            banded, ("tbl", "bucket"), max_bucket_size, "srp_near_dup_pairs"
        )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["tbl", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = base.select("_id", "v")
    rep_pairs = (
        cand.join(
            vecs.select(F.col("_id").alias("id_a"), F.col("v").alias("va")),
            "id_a",
        )
        .join(
            vecs.select(F.col("_id").alias("id_b"), F.col("v").alias("vb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_digits).alias(
                "sim"
            ),
        )
        .filter(F.col("sim") >= threshold)
    )

    if dup_expand is None:
        return rep_pairs
    cross = fan_out_pairs(rep_pairs, dup_expand, "sim")
    # within-group pairs: sim computed on the (shared) group vector —
    # bit-for-bit what the uncollapsed join would produce (incl. the
    # zero-vector edge, where cosine is NULL and the pair is dropped)
    within = (
        within_group_pairs(dup_expand)
        .join(base.select(F.col("_id").alias("_rep"), "v"), "_rep")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v"), F.col("v")), round_digits).alias(
                "sim"
            ),
        )
        .filter(F.col("sim") >= threshold)
    )
    return cross.unionByName(within)


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


def mutual_nn_align(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Bitext-style alignment: (a_id, b_id, sim, margin_bp) for every
    MUTUAL nearest-neighbor pair between two embedding corpora.

    The translation-pair mining shape (the reference's en->vi theme at
    corpus scale): a pair survives iff a's best match in B is b AND
    b's best match in A is a — the mutual-NN criterion that filters
    hubness mismatches in bitext mining (Artetxe & Schwenk '19), plus
    a margin score: best minus second-best similarity from a's side in
    integer basis points (difference margin; a ratio margin is
    ill-defined for negative cosines). margin_bp is NULL when B has a
    single candidate.

    Exactness discipline: cosine is evaluated with the same
    index-ordered fold as brute_force_topk, so the doubles are
    bit-identical to DuckDB's list_dot_product; the margin subtracts
    the two basis-point INTEGERS (never doubles), so it is exact.

    Scale shape: this is the labeled exact baseline. ``df_a`` is the
    side that gets BROADCAST (the brute_force_topk convention for its
    queries side) — the caller must pass the broadcast-sized corpus
    as ``df_a``; a multi-GB A side would OOM the executors. ``df_b``
    is scanned linearly, with one scored relation feeding both
    direction windows. At corpus scale candidate generation delegates
    to the SRP-LSH / IVF paths (ann_recall_eval measures their
    recall) with this operator applied to the candidate set.
    """
    a = df_a.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).cast("array<double>").alias("av"),
    )
    b = df_b.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).cast("array<double>").alias("bv"),
    )
    # the broadcast-nested-loop join inherits the CORPUS side's
    # partitioning; a small parquet corpus arrives as one split and
    # would score |A| x |B| cosines on one task — spread it (O(|B|)
    # shuffle, a no-op when the corpus is already parallel)
    target = df_b.sparkSession.sparkContext.defaultParallelism
    if b.rdd.getNumPartitions() < target:
        b = b.repartition(target)
    scored = (
        F.broadcast(a)
        .crossJoin(b)
        .select(
            "a_id",
            "b_id",
            F.round(
                cosine(F.col("av"), F.col("bv")), round_digits
            ).alias("sim"),
        )
        # both direction windows read this once: lazy localCheckpoint
        # materializes the scored relation on first action and the
        # blocks are released by the ContextCleaner when dropped
        .localCheckpoint(eager=False)
    )
    wa = Window.partitionBy("a_id").orderBy(
        F.col("sim").desc(), F.col("b_id").asc()
    )
    ranked = scored.withColumn("ra", F.row_number().over(wa)).filter(
        F.col("ra") <= 2
    )
    bp = lambda c: F.round(c * 10000).cast("long")  # noqa: E731
    best_a = ranked.filter(F.col("ra") == 1).select(
        "a_id", "b_id", "sim", bp(F.col("sim")).alias("_bp1")
    )
    second_a = ranked.filter(F.col("ra") == 2).select(
        "a_id", bp(F.col("sim")).alias("_bp2")
    )
    wb = Window.partitionBy("b_id").orderBy(
        F.col("sim").desc(), F.col("a_id").asc()
    )
    best_b = (
        scored.withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") == 1)
        .select(F.col("b_id").alias("bb_id"), F.col("a_id").alias("ba_id"))
    )
    return (
        best_a.join(
            best_b,
            (F.col("b_id") == F.col("bb_id"))
            & (F.col("a_id") == F.col("ba_id")),
        )
        .join(second_a, "a_id", "left")
        .select(
            "a_id", "b_id", "sim",
            (F.col("_bp1") - F.col("_bp2")).alias("margin_bp"),
        )
    )
