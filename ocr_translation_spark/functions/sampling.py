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


def budget_apportion(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer
    ``budget`` across groups, proportional to exact integer weights —
    the token-budget allocator for dataset mixing: "give each source
    a share of the 1e12-token budget proportional to its corpus size,
    with the quotas summing EXACTLY to the budget".

    Floating-point shares cannot guarantee the sum (rounding drift),
    so the classic exact method: ``quota_i = budget * w_i div W``
    (truncating), then the residual ``budget - sum(quota)`` seats go
    one each to the largest remainders ``(budget * w_i) mod W``
    (ties broken by group name — fully deterministic, engine-exact).

    Scale shape: one hash aggregate reduces the corpus to O(groups)
    rows; the remainder rank is a window over those group rows only
    (never the corpus); the grand total attaches as a 1-row broadcast.
    DECIMAL(38,0) products (budget * w_i at web scale exceeds BIGINT).
    Output: (group, weight, quota) with sum(quota) == budget exactly
    (guaranteed when budget >= 0 and W > 0; raises on an empty/
    zero-weight corpus rather than dividing by zero)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    dec = "decimal(38,0)"
    g = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.col(weight_col).cast(dec)).cast(dec).alias("w")
    )
    tot = g.agg(
        F.sum("w").cast(dec).alias("tw"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    j = g.crossJoin(F.broadcast(tot))
    b = F.lit(budget).cast(dec)
    # the zero-weight guard lives INSIDE the quota expression — a
    # side-column would be pruned by Catalyst and never evaluated
    base = F.when(
        F.col("tw") > 0,
        F.call_function("div", b * F.col("w"), F.col("tw")),
    ).otherwise(
        F.raise_error(
            F.lit("budget_apportion: zero total weight")
        ).cast(dec)
    )
    rem = b * F.col("w") - base * F.col("tw")  # (b*w) mod tw, exact
    scored = j.select(
        "group",
        F.col("w").cast("long").alias("weight"),
        base.cast("long").alias("_base"),
        rem.alias("_rem"),
    )
    # residual seats: budget - sum(base) < n_groups, computed exactly
    # from the same aggregate; rank over O(groups) rows
    tot2 = scored.agg(
        (F.lit(budget) - F.sum("_base")).cast("long").alias("_resid")
    )
    w_rank = Window.orderBy(F.col("_rem").desc(), F.col("group").asc())
    return (
        scored.crossJoin(F.broadcast(tot2))
        .withColumn("_rk", F.row_number().over(w_rank))
        .select(
            "group",
            "weight",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_resid"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )


def weighted_priority_sample(
    df: DataFrame, weight_col: str, k: int, id_col: str
) -> DataFrame:
    """Deterministic weight-proportional sample of ``k`` rows without
    replacement — sequential Poisson sampling (Ohlsson '98), the
    order-sampling scheme production πps samplers use: draw a uniform
    u_i per row, rank by u_i / w_i ascending, take the k smallest.
    Heavier rows draw smaller priorities, so inclusion probability is
    approximately proportional to weight for k << n; unlike quota
    schemes it needs no weight normalization pass.

    u_i here is the content-addressed 60-bit sha256 hash (the
    ``sketches`` convention) — reproducible on any engine, resumable,
    and independent of partition order. The priority is EXACT integer
    arithmetic, ``h div w`` in BIGINT (a double u/w collides and ties
    unpredictably across engines; the integer quantization error is
    ~1e-15 relative for realistic weights); ties break by id. Weights
    must be positive integers — zero or negative weights are rejected
    loudly in-plan, not clamped (a silently clamped weight is a
    silently wrong distribution).

    Spark shape (100 TB): the priority is a per-row expression (zero
    shuffle) and the selection is orderBy(priority).limit(k) — Spark
    plans TakeOrderedAndProject: each task keeps a k-row heap, the
    driver merges O(tasks x k). No global sort ever materializes.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    ic = F.col(id_col)
    h = F.conv(
        F.substring(F.sha2(ic.cast("string"), 256), 1, 15), 16, 10
    ).cast("long")
    w = F.col(weight_col)
    guarded_w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.lit(
                "weighted_priority_sample: weights must be positive "
                f"integers (offending column: {weight_col})"
            )
        ).cast("long"),
    ).otherwise(w.cast("long"))
    return (
        df.select(
            "*",
            F.call_function("div", h, guarded_w).alias("priority"),
        )
        .orderBy("priority", ic)
        .limit(k)
    )
