"""Exact percent-rank feature normalization without a global sort.

Rank transforms (map a feature to its corpus percentile) are the
robust normalization ML pipelines reach for when features have heavy
tails — but the naive ``percent_rank() OVER (ORDER BY v)`` is a
SINGLE-PARTITION window: Spark moves the whole corpus to one task
(the same scale-killer blocking.global_rank_by removes for string
keys; this is the numeric-key counterpart with SQL tie semantics).

Scalable identity: SQL ``percent_rank`` is (rank-1)/(n-1) where
``rank - 1`` = the count of STRICTLY SMALLER values. That count only
needs the per-distinct-value cumulative:

  1. aggregate to (value, cnt) — one shuffle, map-side combine;
  2. ``repartitionByRange`` the O(distinct) rollup by value — range
     partitions are non-overlapping and ordered, so ANY boundary
     choice yields the same final ranks (the sampled boundaries need
     not be deterministic for the OUTPUT to be);
  3. per-partition running sums + driver-side cumulative partition
     offsets (O(partitions) driver state) give each value its exact
     n_smaller — no task ever sees more than its range slice;
  4. one value-keyed equi-join maps the corpus through the rollup;
     ``pct_ppm = 1e6 * n_smaller div (n-1)`` in DECIMAL(38,0) (a
     LONG product overflows past n ~ 9.2e12).

The DuckDB twin runs the NAIVE single-sort ``rank() OVER (ORDER BY
v)`` formulation — an independent proof of the decomposition.

Spark shape (100 TB): two corpus shuffles (the rollup aggregate and
the normalize join, both on the value key) + one range shuffle of
the O(distinct) rollup; the window runs per range partition. Ties
share a pct by construction (they are ONE rollup row).

Reference parity note: the reference normalizes nothing; this is
curation surface for the quality/score columns the engine's other
operators emit (quality_scores, hashed_classifier_score, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def value_n_smaller(
    rollup: DataFrame, num_ranges: int = 32
) -> tuple[DataFrame, int]:
    """The reusable core: given an O(distinct) ``(_v, _cnt)`` rollup,
    return ``(mapping, n)`` where mapping is ``(_v, _cnt, _nsm)`` —
    ``_nsm`` = exact count of rows with a STRICTLY SMALLER value —
    and ``n`` is the total row count. Range-partitioned per-value
    cumulatives + O(partitions) driver-side offsets; no task ever
    sees more than its range slice. Shared by rank_normalize (pct =
    _nsm ppm) and correlation.spearman_rank_corr (2-scaled average
    rank = 2*_nsm + _cnt + 1)."""
    if num_ranges < 1:
        raise ValueError("num_ranges must be >= 1")
    ranged = rollup.repartitionByRange(num_ranges, F.col("_v"))
    # pin: spark_partition_id() must not be re-derived under a
    # different physical plan between the counts collect and the
    # window pass
    ranged = ranged.localCheckpoint(eager=False)
    pid = ranged.withColumn("_pid", F.spark_partition_id())

    # O(partitions) driver state: cumulative row-count offsets in
    # partition order (range partitions are ordered by construction)
    counts = sorted(
        pid.groupBy("_pid").agg(F.sum("_cnt").alias("c")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["c"]
    n = acc
    if n == 0:
        return pid.select("_v", "_cnt", F.lit(0).alias("_nsm")), 0
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )

    w = (
        Window.partitionBy("_pid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_smaller = (
        off[F.col("_pid")] + F.sum("_cnt").over(w) - F.col("_cnt")
    )
    return pid.select("_v", "_cnt", n_smaller.alias("_nsm")), n


def rank_normalize(
    df: DataFrame,
    value_col: str,
    id_cols: tuple[str, ...] = ("doc_id",),
    out_col: str = "pct_rank_ppm",
    num_ranges: int = 32,
) -> DataFrame:
    """(id_cols..., value, pct_rank_ppm) per non-null row: the exact
    SQL percent_rank of ``value_col`` in ppm (truncating), computed
    with range-partitioned per-value cumulatives instead of a
    single-task global sort. A single-row corpus (n == 1) maps to 0
    by the SQL convention."""
    base = df.select(
        *[F.col(c) for c in id_cols],
        F.col(value_col).alias("_v"),
    ).filter(F.col("_v").isNotNull())

    rollup = base.groupBy("_v").agg(F.count(F.lit(1)).alias("_cnt"))
    nsm, n = value_n_smaller(rollup, num_ranges)
    pct = (
        F.when(F.lit(n) <= 1, F.lit(0).cast("long")).otherwise(
            F.call_function(
                "div",
                F.col("_nsm").cast("decimal(38,0)")
                * F.lit(1000000).cast("decimal(38,0)"),
                F.lit(max(n - 1, 1)).cast("decimal(38,0)"),
            ).cast("long")
        )
    )
    mapping = nsm.select(
        "_v", pct.alias("_pct")
    )
    return base.join(mapping, "_v").select(
        *[F.col(c) for c in id_cols],
        F.col("_v").alias(value_col),
        F.col("_pct").alias(out_col),
    )
