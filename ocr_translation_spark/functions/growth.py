"""Running-distinct accounting: daily active / new / cumulative
distinct users over an event stream.

The naive formulation — ``count(DISTINCT user) OVER (ORDER BY day)``
— re-buffers the whole user set per day (O(days x users) window
state; Spark refuses DISTINCT window aggregates outright). The
scalable identity is FIRST-TOUCH decomposition: a user contributes to
the cumulative count exactly on their first-seen day, so

    cum_users(d) = sum over d' <= d of new_users(d')

turns an unbounded-distinct window over the corpus into one ordinary
cumulative SUM over the O(days) daily rollup. The DuckDB twin runs
the NAIVE windowed-distinct form — an independent proof of the
identity, not a re-statement of the plan.

Spark shape (100 TB):
  1. ONE shuffle to distinct (user, day) pairs — map-side partial
     dedup collapses the fan-in first.
  2. ONE shuffle on user for the per-user min(day) (first touch).
  3. day-level aggregates and the cumulative window run over
     O(days) rows — the single-partition window is on a table whose
     size is the calendar, not the corpus.

Reference parity note: the reference's queue dashboards count jobs
ever-seen vs active (`src/utils/MessageQueue`); this is that
accounting generalized to corpus growth curves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cumulative_new_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(day, dau, new_users, returning_users, cum_users) per active
    day: distinct actives, first-touch users, their difference, and
    the running total of distinct users ever seen through that day.
    Days are ISO strings (lexicographic == chronological)."""
    day = F.date_format(
        F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd"
    ).alias("day")
    pairs = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(F.col(user_col).alias("u"), day)
        .distinct()
    )
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    new = (
        pairs.groupBy("u")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    # O(days) rows from here on; the unbounded window is fine
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        dau.join(new, "day", "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .select(
            "day",
            "dau",
            "new_users",
            (F.col("dau") - F.col("new_users")).alias(
                "returning_users"
            ),
            F.sum("new_users").over(w).alias("cum_users"),
        )
    )


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """(day, dau, wau) for EVERY calendar day between the corpus's
    first and last active day: distinct users active that day, and
    distinct users active in the ``window_days``-day window ENDING
    that day (the standard WAU curve for window_days=7).

    A sliding distinct is not a window function on Spark (DISTINCT
    window aggregates are refused outright), and first-touch
    decomposition only linearizes the UNBOUNDED case — a sliding
    window has churn on both edges. The scalable identity here is
    BOUNDED CONTRIBUTION EXPLODE: a distinct (user, day) pair
    contributes to exactly ``window_days`` report days, so

        wau(d) = |{u : (u, d') active, d' in (d - W, d]}|
               = count_distinct(user) over the pairs exploded to
                 their <= W target days

    which turns the sliding distinct into one ordinary two-phase
    distinct aggregate over a corpus inflated by at most W (a fixed
    small constant — 7 — NOT the calendar length). The DuckDB twin
    runs the NAIVE correlated windowed-distinct per spine day — an
    independent formulation, not a re-statement.

    Spark shape (100 TB): one shuffle to distinct (user, day) pairs
    (map-side partial dedup collapses the event fan-in first), the
    W-way explode is row-local, then one distinct-count aggregate
    keyed by day; the calendar spine comes from a 1-row bounds
    aggregate and is broadcast back, so no stage ever materializes
    more than W x |distinct pairs| rows.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    pairs = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            user_col,
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("d"),
        )
        .distinct()
    )
    # dau folds into the SAME aggregate as wau: a pair's self
    # contribution (day == d) is unique per (user, day) by pairs'
    # distinctness, so counting self rows IS the daily distinct count
    # — no separate daily rollup shuffle, no second spine join
    # (plan-audited: 6 -> 4 warm shuffles).
    contrib = pairs.select(
        user_col,
        "d",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("day"),
    )
    counts = contrib.groupBy("day").agg(
        F.sum(
            F.when(F.col("day") == F.col("d"), 1).otherwise(0)
        ).alias("dau"),
        F.countDistinct(user_col).alias("wau"),
    )
    spine = (
        pairs.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return (
        spine.join(counts, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
        )
    )
