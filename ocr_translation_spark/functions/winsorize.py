"""Winsorized (clipped) robust statistics per group, in exact
micro-units — the feature-clipping stage of an ML data pipeline
("clamp the signal at p05/p95 before aggregating so a handful of
outliers can't own the mean") with a value-oracle-able result.

Composition of two exact operators:
  1. the per-group clip cutoffs are DISCRETE quantiles from
     :func:`selection.group_exact_quantiles` — bounded-state
     narrowing, values are real data elements;
  2. one corpus pass joins the broadcast O(groups) cutoff table,
     clamps, and aggregates. Values enter the sums as HALF_UP-rounded
     MICRO integers (round(v * 1e6) as long), so every sum is exact,
     order-insensitive long arithmetic and the winsorized mean is a
     truncating integer division — the repo's micro-unit discipline
     (double sums are order-sensitive at the ulp and break value
     oracles).

Output per group: n, n_low / n_high (rows clamped at each side), the
cutoffs in micro, sum and mean of the clipped values in micro.

Spark shape (100 TB): the quantile stage's narrowing rounds are
O(groups x bins) state; the final pass is one scan + one hash
aggregate with a broadcast O(groups) join — no shuffle of the corpus
beyond the aggregate's partial/final exchange.

Headroom: sums accumulate in BIGINT micro-units, so a single group
overflows past ~9.2e18 micro = 9.2e12 value-units (e.g. 10^12 rows
averaging 9 units); beyond that widen cv_micro to DECIMAL(38,0)
before the sum (the mean division already runs in DECIMAL).

Reference parity: the reference exposes no robust statistics — this
is corpus-curation surface (clamp outlier signals before thresholding
on their mean) layered over the extraction outputs its pipeline
(src/utils/ocr.js, src/utils/translator.js) produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .selection import group_exact_quantiles


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q_low: str = "0.05",
    q_high: str = "0.95",
    bins: int = 128,
    limit: int = 131072,
) -> DataFrame:
    """(grp, n, n_low, n_high, lo_micro, hi_micro, sum_micro,
    mean_micro) — aggregates of value clamped into [p(q_low),
    p(q_high)] per group, all in exact micro integers."""
    cuts = (
        group_exact_quantiles(
            df, group_col, value_col,
            qs=(q_low, q_high), bins=bins, limit=limit,
        )
        .groupBy("grp")
        .agg(
            F.max(F.when(F.col("q") == q_low, F.col("value")))
            .alias("lo"),
            F.max(F.when(F.col("q") == q_high, F.col("value")))
            .alias("hi"),
        )
    )
    base = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("grp").isNotNull())
    clipped = base.join(F.broadcast(cuts), "grp").select(
        "grp",
        F.when(F.col("v") < F.col("lo"), 1).otherwise(0).alias("low"),
        F.when(F.col("v") > F.col("hi"), 1).otherwise(0).alias("high"),
        F.round(
            F.greatest(F.least(F.col("v"), F.col("hi")), F.col("lo"))
            * 1000000
        ).cast("long").alias("cv_micro"),
        F.round(F.col("lo") * 1000000).cast("long").alias("lo_micro"),
        F.round(F.col("hi") * 1000000).cast("long").alias("hi_micro"),
    )
    return clipped.groupBy("grp", "lo_micro", "hi_micro").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("low").alias("n_low"),
        F.sum("high").alias("n_high"),
        F.sum("cv_micro").alias("sum_micro"),
    ).select(
        "grp", "n", "n_low", "n_high", "lo_micro", "hi_micro",
        "sum_micro",
        # truncating IntegralDivide; sums here are non-negative-safe
        # only in the sense that DuckDB HUGEINT `//` also truncates
        # toward zero (verified: -7 // 2 = -3), so the twin matches
        # for negative-valued corpora too
        F.call_function(
            "div",
            F.col("sum_micro").cast("decimal(38,0)"),
            F.col("n").cast("decimal(38,0)"),
        ).cast("long").alias("mean_micro"),
    )
