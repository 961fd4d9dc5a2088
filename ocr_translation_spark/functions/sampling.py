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


def weighted_mixture_sample(
    df: DataFrame, strata_col: str, id_col: str, cap: float
) -> DataFrame:
    """Deterministic mixture resampling: downsample every stratum
    (source/domain) toward an expected ``cap`` rows, leaving smaller
    strata untouched — the standard move to stop one crawl/domain from
    dominating a training mixture.

    Acceptance is content-addressed, not RNG: row kept iff

        h(id) * n_s  <  cap * 2^60,     h(id) = first 60 bits of
                                        sha256(id), n_s = stratum size

    i.e. accept with probability min(1, cap / n_s), decided purely by
    the row's own hash — reproducible on any engine, any partitioning,
    resumable mid-run.  The comparison runs in exact DECIMAL(38,0)
    integer arithmetic (h < 2^60, so h * n_s needs up to ~38 digits at
    trillion-row strata): no float threshold, no engine-rounding drift,
    which is what makes the DuckDB twin (HUGEINT there) bit-exact.

    Shape at 100 TB: one tiny aggregation for the per-stratum counts
    (|strata| rows — domains, not docs), broadcast back, then a pure
    per-row predicate.  ZERO shuffle of the corpus itself.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n_s"))
    h = F.conv(
        F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 15),
        16,
        10,
    ).cast("decimal(38,0)")
    # exact integer threshold: int cap stays exact; a fractional cap is
    # snapped to its 53-bit float value on BOTH engines identically.
    # The value exceeds int64 (cap * 2^60), so it travels as a string
    # literal cast to DECIMAL — F.lit(int) would overflow py4j's long.
    _t = cap * (16**15) if isinstance(cap, int) else int(cap * float(16**15))
    threshold = F.lit(str(_t)).cast("decimal(38,0)")
    return (
        df.join(F.broadcast(counts), strata_col)
        .filter(h * F.col("_n_s") < threshold)
        .drop("_n_s")
    )


def training_shuffle_order(
    df: DataFrame, n_buckets: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """(id, bucket, pos): a deterministic global shuffle for training
    order — the "shuffle your corpus before training" step, made
    reproducible and resumable.

    Every row gets a content-addressed 64-bit hash key; the corpus is
    split into ``n_buckets`` hash buckets and ordered by the key
    within each bucket.  Reading buckets in index order, each bucket
    by ``pos``, visits the corpus in a deterministic pseudo-random
    permutation any engine reproduces bit-for-bit (the DuckDB twin
    does) — unlike ``df.orderBy(rand())``, which is
    partition-order-dependent and changes on every run/retry.

    100 TB shape: ONE shuffle on the bucket key, then a per-bucket
    rank window — no global sort, no single-partition window.
    ``n_buckets`` is the parallelism knob (the pack_documents
    precedent): size it so a bucket fits one task, e.g. 2^16 buckets
    puts ~1.5 GB of a 100 TB corpus in each window partition.  The
    (bucket, pos) pair is a total order, so downstream packing/sharding
    can range-read any slice of the permutation.
    """
    h = sample_key(F.col(id_col))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_buckets)
    ).cast("int")
    w = Window.partitionBy("bucket").orderBy("hkey", id_col)
    return (
        df.select(
            F.col(id_col), bucket.alias("bucket"), h.alias("hkey")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "bucket", "pos")
    )
