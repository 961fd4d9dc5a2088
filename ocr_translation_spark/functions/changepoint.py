"""CUSUM changepoint detection over grouped daily-volume series, in
exact cross-multiplied integers.

Where did a series' LEVEL shift? The offline CUSUM statistic (Page,
Biometrika'54; the Pettitt-style location form) is, for a series of
daily counts x_1..x_T with prefix sums S_t and total N:

    D_t = T * S_t - t * N        (t = 1 .. T-1)

i.e. T*N times (the share of volume seen by t) minus (the share of
time elapsed) — zero everywhere iff volume is perfectly uniform; its
extremum marks the most likely single level shift, with sign giving
the direction (D > 0: the early segment ran HOT; D < 0: it ran cold).
Cross-multiplying by T and N keeps every quantity a BIGINT — no
mean, no division, no float — so the DuckDB twin is value-identical.
(Headroom: |D| <= T * N; at T ~ 3.6e3 days and N ~ 2.5e15 rows per
series the product reaches the int64 edge — widen to DECIMAL(38,0)
past that.)

The reported split means (level before/after the changepoint) are
truncating integer micro-units, matching DuckDB HUGEINT ``//``.

Spark shape (100 TB):
  1. ONE corpus aggregation shuffle builds the (series, day) volume
     table — O(series x days) rows, partials collapse map-side.
  2. Prefix sums, the t index, and the argmax are windows partitioned
     by series over that tiny table; the argmax rank reuses the same
     partitioning (sorts, no new Exchange).
Ties at the extremum break to the EARLIEST day (deterministic).
Series with a single active day have no interior split and emit no
row.

Reference parity note: the reference has no monitoring plane; this is
the corpus-operations view its queue metrics would feed — "when did a
source's volume regime change?"
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cusum_changepoint(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(series, cp_day, t_cp, n_days, total, dev, direction,
    mean_before_micro, mean_after_micro) per series with >= 2 active
    days: the interior day t maximizing |T*S_t - t*N| (ties ->
    earliest), the signed direction at the extremum, and the exact
    truncating micro-unit mean daily volume of the two segments
    (days 1..t vs t+1..T)."""
    daily = (
        events.filter(
            # NULL days would enter the ORDER-SENSITIVE prefix-sum
            # window, where Spark sorts nulls first and DuckDB last
            F.col(series_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(
            F.col(series_col).alias("series"),
            F.date_format(
                F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd"
            ).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )

    ws = Window.partitionBy("series").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("series")
    cum = daily.select(
        "series",
        "day",
        F.sum("x").over(ws).alias("s_t"),
        F.row_number()
        .over(Window.partitionBy("series").orderBy("day"))
        .alias("t"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
        F.sum("x").over(wall).alias("total"),
    ).filter(F.col("t") < F.col("n_days"))

    d = (
        F.col("n_days") * F.col("s_t") - F.col("t") * F.col("total")
    ).alias("d_signed")
    scored = cum.select(
        "series", "day", "s_t", "t", "n_days", "total", d
    )
    pick = Window.partitionBy("series").orderBy(
        F.abs(F.col("d_signed")).desc(), F.col("day").asc()
    )
    # cast BEFORE the 1e6 multiply: a LONG s_t * 1000000 would
    # overflow at per-series volume ~9.2e12, far inside the D_t
    # headroom documented above
    mb = F.call_function(
        "div",
        F.col("s_t").cast("decimal(38,0)")
        * F.lit(1000000).cast("decimal(38,0)"),
        F.col("t").cast("decimal(38,0)"),
    ).cast("long")
    ma = F.call_function(
        "div",
        (F.col("total") - F.col("s_t")).cast("decimal(38,0)")
        * F.lit(1000000).cast("decimal(38,0)"),
        (F.col("n_days") - F.col("t")).cast("decimal(38,0)"),
    ).cast("long")
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            "series",
            F.col("day").alias("cp_day"),
            F.col("t").alias("t_cp"),
            "n_days",
            "total",
            F.abs(F.col("d_signed")).alias("dev"),
            F.when(F.col("d_signed") >= 0, F.lit("hot_before"))
            .otherwise(F.lit("cold_before"))
            .alias("direction"),
            mb.alias("mean_before_micro"),
            ma.alias("mean_after_micro"),
        )
    )
