"""Multi-touch conversion attribution with exact integer credit.

Last-touch attribution (the as-of join, `purchase_attribution_asof`)
answers "which touch closed the sale"; MULTI-touch attribution
answers "how should the conversion's credit be shared across every
touch that preceded it" — the marketing/behavior-analytics workload
that grades channels. Linear attribution splits each conversion's
credit equally across its lookback-window touches.

Fractional credit in floats drifts under reordering and never sums
back to the conversion count; here each conversion's 1,000,000 micro
credit is apportioned by LARGEST REMAINDER: every touch gets
``1e6 div k`` and the ``1e6 mod k`` leftover goes to the k earliest
touches (+1 each, ties broken by touch id) — deterministic, and
``sum(credit) == 1e6 * n_conversions`` EXACTLY, which the unit tests
and the DuckDB twin pin. Conversions with no preceding touch keep
their full credit in a ``(none)`` channel row — never silently
dropped.

Spark shape (100 TB): ONE hash shuffle per side on the user key for
the conversions x touches join; the interval predicate filters inside
the joined partition. The per-conversion windows (count, rank) are
keyed by (user, conversion) — a SUPERSET of the join key, so they
reuse the join's hash layout without a second exchange
(ClusteredDistribution is satisfied by the subset partitioning). The
final per-channel rollup is an O(channels) aggregate. Per-user
activity bounds the join fan-out; hot users are the documented
salting candidates (`operators/partitioning.py`).

Reference parity note: the reference has no attribution surface;
this is events-pipeline breadth beyond parity, the fractional-credit
counterpart of the as-of last-touch join already in-window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MICRO = 1_000_000


def linear_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: tuple[str, ...],
    lookback: str = "24 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-channel linear attribution report: ``(channel, n_touches,
    n_conversions, credit_micro)``; untouched conversions appear as
    channel ``(none)`` with full credit."""
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type must not be one of touch_types: a "
            "conversion attributing to itself double-counts credit"
        )
    base = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    conv = base.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = base.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("channel"),
    )
    # ONE pass: the LEFT join keeps untouched conversions as a single
    # NULL-touch row each, so the '(none)' accounting leg needs no
    # second scan + anti-join + re-derived credit subtree
    pairs = conv.join(
        touch,
        (conv["u"] == touch["u"])
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {lookback}")
        ),
        "left",
    ).select(conv["u"], "conv_id", "touch_id", "touch_ts", "channel")
    # (u, conv_id) is a superset of the join key u: both windows
    # reuse the join's hash layout — no second exchange. count() over
    # touch_id skips the NULL marker rows, so k = real touches.
    wk = Window.partitionBy("u", "conv_id")
    wr = wk.orderBy("touch_ts", "touch_id")
    ranked = pairs.select(
        "conv_id",
        "channel",
        "touch_id",
        F.count("touch_id").over(wk).alias("k"),
        F.row_number().over(wr).alias("rn"),
    )
    credited = ranked.select(
        "conv_id",
        "channel",
        "touch_id",
        F.when(F.col("touch_id").isNull(), F.lit(MICRO).cast("long"))
        .otherwise(
            F.expr(f"{MICRO} div k")  # integral divide, no doubles
            + (F.col("rn") <= F.lit(MICRO) % F.col("k")).cast("long")
        )
        .alias("credit"),
    )
    return credited.groupBy(
        F.coalesce(F.col("channel"), F.lit("(none)")).alias("channel")
    ).agg(
        F.count("touch_id").alias("n_touches"),
        F.count_distinct("conv_id").alias("n_conversions"),
        F.sum("credit").alias("credit_micro"),
    )
