"""Bot / automated-traffic detection from inter-arrival regularity,
in exact integer arithmetic.

Crawlers and scripted clients fire on timers; humans don't. The
classic signal is the coefficient of variation of a user's
inter-event gaps — near 1 for Poisson-ish human traffic, near 0 for
a cron loop. The squared CV has an exact cross-multiplied integer
form that needs no mean, no variance division and no float:

    cv2_ppm = (1e6 * n_gaps * sum(g^2)) div (sum(g))^2  -  1e6

(Cauchy-Schwarz gives n*sum(g^2) >= sum(g)^2, so the value is >= 0
even under truncating division.) Gaps are whole SECONDS (floor of
the epoch difference of the per-user time-sorted sequence — the gap
multiset of a sorted sequence is tie-order independent, so no
tie-break column is needed). Intermediates run in DECIMAL(38,0) /
HUGEINT: at second granularity the numerator stays inside 38 digits
up to ~1e6 gaps per user over multi-year spans.

A user is flagged when they are BOTH busy and metronomic:
``n_events >= min_events AND cv2_ppm <= max_cv2_ppm`` (an all-equal
timestamp burst has sum(g) = 0 and is flagged as perfectly regular).

Spark shape (100 TB): ONE shuffle on user_id — the lag window and
the subsequent per-user aggregate share the same hash partitioning
(the aggregate keys are a superset of the window's partition key, so
AQE plans no second exchange); output is O(users). No join, no
Python.

Reference parity note: the reference rate-limits clients per IP
(`src/middlewares`, disabled in its config); this is the batch
analytics view of the same abuse-detection concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bot_regularity_scores(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 20,
    max_cv2_ppm: int = 300000,
) -> DataFrame:
    """(user_id, n_events, n_gaps, span_s, sum_gap_sq, cv2_ppm,
    is_bot) per user with >= 2 events: exact squared-CV of the
    inter-arrival gaps in ppm and the busy-and-metronomic flag.
    ``span_s`` = sum of gaps = last - first arrival, seconds."""
    if min_events < 2:
        raise ValueError("min_events must be >= 2")
    w = Window.partitionBy("u").orderBy("sec")
    gaps = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("u"),
            F.col(ts_col).cast("long").alias("sec"),
        )
        .select(
            "u",
            "sec",
            (F.col("sec") - F.lag("sec").over(w)).alias("g"),
        )
    )
    num = (
        F.lit(1000000).cast("decimal(38,0)")
        * F.col("n_gaps").cast("decimal(38,0)")
        * F.col("sum_gap_sq").cast("decimal(38,0)")
    )
    den = (
        F.col("span_s").cast("decimal(38,0)")
        * F.col("span_s").cast("decimal(38,0)")
    )
    return (
        gaps.groupBy("u")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("g").alias("n_gaps"),
            F.sum("g").alias("span_s"),
            F.sum(F.col("g") * F.col("g")).alias("sum_gap_sq"),
        )
        .filter(F.col("n_gaps") >= 1)
        .withColumn(
            "cv2_ppm",
            F.when(F.col("span_s") == 0, F.lit(0).cast("long"))
            .otherwise(
                (
                    F.call_function("div", num, den)
                    - F.lit(1000000)
                ).cast("long")
            ),
        )
        .select(
            F.col("u").alias("user_id"),
            "n_events",
            "n_gaps",
            "span_s",
            "sum_gap_sq",
            "cv2_ppm",
            (
                (F.col("n_events") >= F.lit(min_events))
                & (F.col("cv2_ppm") <= F.lit(max_cv2_ppm))
            ).alias("is_bot"),
        )
    )
