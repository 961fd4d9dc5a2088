"""Point-in-time-correct feature join with embargo (feature-store).

Training-label construction joins each label row to feature values
"as of" the label's timestamp. Two classic leaks hide in the naive
join: using a feature computed AFTER the label event (future leak),
and using one computed within the label's immediate past when the
feature pipeline could not actually have delivered it yet (latency
leak — the reason feature stores expose an EMBARGO / blackout
interval; cf. the point-in-time join every feature-store paper and
product documents, e.g. Feast/Tecton's core join).

    pit value(label) = latest feature with feat_ts <= label_ts - embargo

This module runs the embargoed as-of join AND the naive one in the
same pass shape and emits a per-label ``leak_averted`` flag — the
rows where the naive join would have silently picked a different
(later) feature. The audit is the point: a silent 0.3% of leaked
labels is how offline metrics go irreproducible.

Scale shape: both passes are the union-tag as-of machinery
(functions/timeseries.asof_backward) keyed on the entity. Each pass
is one key-hash exchange over its own union relation (the second
union's fresh branch prevents reusing the first window's
partitioning — plan-audited: 4 warm shuffles total incl. the feature
pre-aggregate), i.e. two windowed-aggregate cost envelopes; no range
explosion, no per-key quadratic fan-out at any point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_translation_spark.functions.timeseries import asof_backward


def pit_feature_join(
    labels: DataFrame,
    features: DataFrame,
    key_col: str,
    label_ts_col: str,
    feat_ts_col: str,
    value_cols: list[str],
    embargo_seconds: int = 0,
) -> DataFrame:
    """Labels with point-in-time feature columns: every input label
    row gains ``<col>_pit`` for each of ``value_cols``, the chosen
    feature timestamp ``feat_ts_pit`` (NULL when no feature is old
    enough), and ``leak_averted`` — true when the NAIVE as-of join
    (no embargo) would have picked a different, later feature row.
    ``features`` must be unique per (key, feat_ts); pre-aggregate
    otherwise (the as-of contract)."""
    if embargo_seconds < 0:
        raise ValueError(
            f"embargo_seconds must be >= 0, got {embargo_seconds}"
        )
    feats = features.select(
        key_col, F.col(feat_ts_col).alias("_fts"), *value_cols
    )
    # pass 1 — embargoed pick on the shifted timestamp
    lab = labels.withColumn(
        "_ets",
        F.col(label_ts_col)
        - F.expr(f"INTERVAL {int(embargo_seconds)} SECOND"),
    )
    r1 = feats.withColumn("_ets", F.col("_fts")).drop("_fts")
    step1 = asof_backward(
        lab, r1, key_col, "_ets", value_cols, suffix="_pit"
    ).withColumnRenamed("_ets_pit", "feat_ts_pit")
    # pass 2 — the naive pick's TIMESTAMP only, for the leak audit
    # (same key partitioning: one exchange, a second window sort)
    r2 = feats.select(
        key_col, F.col("_fts").alias(label_ts_col)
    )
    step2 = asof_backward(
        step1, r2, key_col, label_ts_col, [], suffix="_naive"
    ).withColumnRenamed(f"{label_ts_col}_naive", "_naive_ts")
    return (
        step2.withColumn(
            "leak_averted",
            ~F.col("_naive_ts").eqNullSafe(F.col("feat_ts_pit")),
        )
        .drop("_ets", "_naive_ts")
    )
