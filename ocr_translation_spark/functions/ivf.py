"""IVF-style ANN: a k-medians coarse quantizer + inverted-list probe.

The second scale path for similarity search (beside SRP-LSH in
similarity.py), shaped like FAISS IVF-Flat: cluster the corpus with a
small coarse quantizer, store an inverted list per cluster, and at
query time probe only the ``n_probe`` closest clusters, re-ranking
candidates with exact cosine. At 100 TB the corpus is scanned once per
Lloyd iteration and once for assignment; queries touch
``n_probe / n_clusters`` of the data.

Why k-MEDIANS and not k-means: the centroid update must be
reproducible by the external oracle, and a mean over doubles depends
on the (partition-dependent) summation order — the same data can
yield last-ulp-different centroids run to run. A median is an
order-independent exact statistic (Spark ``percentile`` ==
DuckDB ``quantile_cont``, already value-matched elsewhere in this
repo), so centroids, assignments, and final top-k agree bit-for-bit.

Determinism contract (mirrored by the DuckDB oracle in
``__spark_entry__.py``):
* init: centroids = the vectors with the ``n_clusters`` smallest ids;
* assign: max cosine, ties to the smaller cluster id (row_number);
* update: per-dimension median per cluster; empty cluster keeps its
  previous centroid;
* probe: ``n_probe`` best clusters per query by the same ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import _dot, cosine


def _centroid_df(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in cents], "cid int, cvec array<double>"
    )


def _rank_clusters(e: DataFrame, cent_df: DataFrame, id_name: str) -> DataFrame:
    """Cross-join against the (tiny) centroid set and rank by cosine
    desc, cid asc — rank 1 is the assignment, ranks <= n_probe are the
    probe set. The centroid side is k rows; Spark broadcasts it."""
    scored = e.crossJoin(F.broadcast(cent_df)).select(
        id_name,
        "v",
        "cid",
        cosine(F.col("v"), F.col("cvec")).alias("_cos"),
    )
    w = Window.partitionBy(id_name).orderBy(
        F.col("_cos").desc(), F.col("cid").asc()
    )
    return scored.withColumn("_rank", F.row_number().over(w))


def training_set(
    e: DataFrame,
    sample_hex_zeros: int | None = None,
    cap: int | None = None,
) -> DataFrame:
    """Deterministic BOUNDED quantizer-training subset of (_id, v).

    Exact per-(cid, dim) medians buffer a whole group's values on one
    task, so training on the full corpus OOMs at scale (a group holds
    ~n/k values). Standard IVF practice (FAISS trains its coarse
    quantizer on a sample) applies: train on a hash-sample of bounded
    size, assign/probe the full corpus with the resulting centroids.

    The sample rule is a pure function of the id so any engine can
    reproduce it: keep ids whose sha256(id-as-string) starts with
    ``sample_hex_zeros`` '0' hex chars (each char keeps ~1/16), then
    hard-cap at the ``cap`` smallest sampled ids (a distributed top-k,
    not a full sort). Both knobs None => train on everything (the
    small-data/test configuration).
    """
    t = e
    if sample_hex_zeros:
        prefix = "0" * sample_hex_zeros
        t = t.filter(
            F.substring(
                F.sha2(F.col("_id").cast("string"), 256), 1, sample_hex_zeros
            )
            == prefix
        )
    if cap is not None:
        t = t.orderBy("_id").limit(cap)
    return t


def kmedians_centroids(
    emb: DataFrame,
    dim: int,
    n_clusters: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_hex_zeros: int | None = None,
    train_cap: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Lloyd-style k-medians; returns [(cid, centroid)] after ``iters``
    updates. Centroids live on the driver between iterations (k * dim
    doubles — tiny); each iteration is one distributed assign + one
    distributed per-dim median over the (bounded — see
    ``training_set``) training sample."""
    spark = emb.sparkSession
    e = training_set(
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ),
        train_sample_hex_zeros,
        train_cap,
    )
    init = (
        e.orderBy("_id")
        .limit(n_clusters)
        .collect()
    )
    cents = [(i, list(r["v"])) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = (
            _rank_clusters(e, _centroid_df(spark, cents), "_id")
            .filter(F.col("_rank") == 1)
            .select("_id", "v", "cid")
        )
        med = (
            assigned.select("cid", F.posexplode("v").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.expr("percentile(val, 0.5)").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "m"))
                    ),
                    lambda s: s["m"],
                ).alias("cvec")
            )
            .collect()
        )
        updated = {r["cid"]: list(r["cvec"]) for r in med}
        # an empty cluster keeps its previous centroid
        cents = [(cid, updated.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int = 8,
    iters: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    train_sample_hex_zeros: int | None = None,
    train_cap: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank): exact-cosine top-k within
    the ``n_probe`` closest inverted lists per query. Same output
    schema as brute_force_topk; recall < 1 by design (a probed-out
    true neighbor is the IVF trade-off), measured in the recall gate
    test. ``train_sample_hex_zeros``/``train_cap`` bound the quantizer
    training set (see ``training_set``); assignment and probing always
    run over the FULL corpus."""
    spark = corpus.sparkSession
    cents = kmedians_centroids(
        corpus, dim, n_clusters=n_clusters, iters=iters,
        id_col=id_col, vec_col=vec_col,
        train_sample_hex_zeros=train_sample_hex_zeros, train_cap=train_cap,
    )
    cent_df = _centroid_df(spark, cents)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    inverted = (
        _rank_clusters(c, cent_df, "neighbor_id")
        .filter(F.col("_rank") == 1)
        .select("neighbor_id", F.col("v").alias("cv"), "cid")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    probes = (
        _rank_clusters(q, cent_df, "query_id")
        .filter(F.col("_rank") <= n_probe)
        .select("query_id", F.col("v").alias("qv"), "cid")
    )
    scored = (
        probes.join(inverted, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
