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


def burst_windows(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    enter_num: int = 2,
    enter_den: int = 1,
    exit_num: int = 1,
    exit_den: int = 1,
) -> DataFrame:
    """Hysteresis burst segmentation per series, in exact
    cross-multiplied integers — the two-state simplification of
    Kleinberg's burst automaton (KDD'02): a series ENTERS burst state
    on a day whose volume reaches ``enter_num/enter_den`` times its
    mean daily volume, LEAVES it on a day that falls below
    ``exit_num/exit_den`` times the mean, and CARRIES the previous
    state through the hysteresis band in between (that carry is what
    distinguishes a sustained burst from threshold flicker — a plain
    per-row predicate cannot express it).

    All comparisons are cross-multiplied BIGINTs (day volume x vs
    per-series total N over T days: enter iff
    ``x * T * enter_den >= enter_num * N``), so the DuckDB twin is
    value-identical; no mean, no division, no float. Headroom:
    ``x * T * den`` tops out at ``N * T * den`` — at T ~ 3.6e3 days,
    den <= 8 and N ~ 3e11 rows/series the product stays inside int64;
    widen to DECIMAL(38,0) past that.

    The state machine itself is the last-non-null-carry window idiom:
    ``e = 1`` on enter days, ``0`` on exit days, NULL in the band;
    ``state = coalesce(last(e ignore nulls) over days-so-far, 0)`` —
    one ordered window per series, identical syntax in DuckDB. Burst
    intervals then fall out of the standard gaps-and-islands rollup
    (island id = running count of 0->1 transitions).

    Spark shape (100 TB): ONE corpus aggregation shuffle builds the
    (series, day) volume table; the per-series totals, the
    carry-forward state, the island ids, and the island rollup are
    all windows/aggregates PARTITIONED BY series over that
    O(series x days) table — they share one partitioning, so the
    whole state machine costs one small exchange after the rollup.

    Semantics note: the machine runs over a series' ACTIVE days (days
    with >= 1 event). Calendar gaps carry the state like band days
    do; densify through a date spine first (the events_hourly_gapfill
    shape) if zero-volume days must force an exit.

    Emits one row per burst: (series, burst_start, burst_end,
    n_burst_days, burst_volume, peak_volume).
    """
    if enter_num * exit_den < exit_num * enter_den:
        raise ValueError(
            "enter threshold must be >= exit threshold "
            f"(got enter {enter_num}/{enter_den} < exit "
            f"{exit_num}/{exit_den}) — with enter below exit a day "
            "can satisfy both and the state is ill-defined"
        )
    daily = (
        events.filter(
            # NULL days/series would enter the ORDER-SENSITIVE
            # carry-forward window (Spark sorts nulls first, DuckDB
            # last)
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

    wall = Window.partitionBy("series")
    wday = Window.partitionBy("series").orderBy("day")
    wrun = wday.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lhs_enter = F.col("x") * F.col("n_days") * F.lit(enter_den)
    lhs_exit = F.col("x") * F.col("n_days") * F.lit(exit_den)
    e = (
        F.when(lhs_enter >= F.lit(enter_num) * F.col("total"), F.lit(1))
        .when(lhs_exit < F.lit(exit_num) * F.col("total"), F.lit(0))
        .otherwise(F.lit(None).cast("int"))
    )
    staged = daily.select(
        "series",
        "day",
        "x",
        F.count(F.lit(1)).over(wall).alias("n_days"),
        F.sum("x").over(wall).alias("total"),
    ).select("series", "day", "x", e.alias("e"))
    st = staged.select(
        "series",
        "day",
        "x",
        F.coalesce(
            F.last("e", ignorenulls=True).over(wrun), F.lit(0)
        ).alias("state"),
    )
    isl = st.select(
        "series",
        "day",
        "x",
        "state",
        F.sum(
            F.when(
                (F.col("state") == 1)
                & (F.lag("state", 1, 0).over(wday) == 0),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .over(wrun)
        .alias("island"),
    )
    return (
        isl.filter(F.col("state") == 1)
        .groupBy("series", "island")
        .agg(
            F.min("day").alias("burst_start"),
            F.max("day").alias("burst_end"),
            F.count(F.lit(1)).alias("n_burst_days"),
            F.sum("x").alias("burst_volume"),
            F.max("x").alias("peak_volume"),
        )
        .drop("island")
    )
