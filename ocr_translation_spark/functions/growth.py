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
