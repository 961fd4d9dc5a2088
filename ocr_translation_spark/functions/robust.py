"""Robust (median/MAD) anomaly detection over grouped time series.

Flags anomalous days per series using the median absolute deviation —
the robust-statistics alternative to mean/stddev z-scores (a single
huge spike inflates a stddev enough to mask itself; the MAD is
insensitive to up to 50% contamination, Leys et al. JESP'13).

Everything is EXACT integer arithmetic. The median is the LOW median
— the element at 1-indexed rank floor((n+1)/2) of the ascending sort —
selected by rank, not averaged: the conventional even-n midpoint
average produces .5 values whose engine-specific rounding breaks value
oracles, and rank selection is a pure function of the multiset. The
outlier test is an integer cross-multiply (|v - med| > k * MAD), no
division anywhere.

Spark shape (100 TB):
  1. ONE corpus aggregation shuffle builds the (series, day) volume
     table — output is O(series x days), tiny relative to the event
     corpus, partials collapse map-side.
  2. Median and MAD are rank selections over windows partitioned by
     series on that tiny table; the deviation re-sort reuses the same
     partitioning (no new Exchange, just another sort).
  3. Per-series medians broadcast back via an equi-join on the
     series key (O(series) rows).

Degenerate-MAD note: if more than half the days share the median
volume, MAD = 0 and every deviating day is flagged — the documented
behavior of the estimator (callers wanting slack add a floor to k).

Reference parity note: the reference counts per-job progress ticks
(`src/services/job.js`); this is the corpus-level monitoring view —
"did any document source's daily volume spike or crater?"
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _low_median(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """(key, out) = low median of ``val`` per key by rank selection."""
    w = Window.partitionBy(key).orderBy(F.col(val).asc())
    wc = Window.partitionBy(key)
    return (
        df.select(
            F.col(key),
            F.col(val),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(wc).alias("_n"),
        )
        # 1-indexed rank floor((n+1)/2): n=4 -> 2 (lower middle), n=5 -> 3
        .filter(F.expr("_rn = (_n + 1) div 2"))
        .select(F.col(key), F.col(val).alias(out))
    )


def mad_outlier_days(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    k: int = 3,
) -> DataFrame:
    """(series, day, n_events, med, mad, deviation, is_outlier) per
    (series, day): daily volumes with the per-series low median, the
    MAD (low median of absolute deviations) and the robust flag
    ``deviation > k * mad`` (integer cross-multiply)."""
    daily = events.groupBy(
        F.col(series_col).alias("series"),
        F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))

    med = _low_median(daily, "series", "n_events", "med")
    dev = daily.join(med, "series").withColumn(
        "deviation", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = _low_median(dev, "series", "deviation", "mad")
    return (
        dev.join(mad, "series")
        .select(
            "series",
            "day",
            "n_events",
            "med",
            "mad",
            "deviation",
            (F.col("deviation") > F.lit(k) * F.col("mad")).alias(
                "is_outlier"
            ),
        )
    )
