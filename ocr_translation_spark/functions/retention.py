"""Cohort retention analysis over an event stream.

The classic product-analytics rollup: bucket users by the week of
their FIRST event (the cohort), then for every later event count how
many distinct cohort members were still active k weeks on. Output is
the (cohort_week, week_offset) retention triangle.

Spark shape (100 TB):
  1. ONE shuffle on user_id — a window ``min(ts) over (partition by
     user_id)`` annotates every event with its user's first-seen
     timestamp without a join or a second scan of the fact table.
  2. ONE small aggregation shuffle on (cohort_week, week_offset) —
     output cardinality is O(weeks²), tiny at any scale; partial
     (map-side) aggregation collapses the fan-in first.
Week arithmetic is exact integer DATE math (Monday-truncated weeks,
day-diff / 7), so the DuckDB twin is value-identical — no float
anywhere.

Reference parity note: the reference tracks per-job progress events
(`src/services/job.js` SSE updates); retention generalizes that event
stream to corpus-level engagement accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, active_users, n_events) retention
    triangle. ``cohort_week`` is the Monday of the user's first event
    week; ``week_offset`` = whole weeks between that Monday and the
    Monday of the event's week (0 = the cohort week itself)."""
    w = Window.partitionBy(user_col)
    first_ts = F.min(ts_col).over(w)
    cohort_monday = F.date_trunc("week", first_ts)
    event_monday = F.date_trunc("week", F.col(ts_col))
    offset = F.floor(
        F.datediff(event_monday.cast("date"), cohort_monday.cast("date"))
        / 7
    )
    return (
        events.select(
            # ISO string, not DATE: pandas round-trips Spark DATE as
            # datetime.date but DuckDB DATE as datetime64 — a dtype
            # mismatch in the driver's compare. The string form is
            # unambiguous on both engines.
            F.date_format(cohort_monday, "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            offset.cast("long").alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct(user_col).alias("active_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
