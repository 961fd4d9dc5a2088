"""Time-series operators Spark lacks as primitives, built scale-first.

``asof_backward`` — backward as-of join (for each left row, the
latest right row with the same key and ts <= left ts, ties included).
Spark has no ASOF JOIN; the naive formulations are a range join
(quadratic fan-out per key) or a per-key collect. The scalable shape
used here is the union-tag trick:

    union(left tagged 1, right tagged 0)
      -> ONE shuffle: window partitionBy(key) orderBy(ts, tag)
      -> last(right_value, ignoreNulls) over rows unbounded..current
      -> keep tag=1 rows

Cost is a single hash shuffle on the key plus a linear per-partition
sort-scan — the same budget as any windowed aggregate, with no range
explosion and no skew amplification beyond the key distribution
itself. Right rows sort BEFORE left rows at equal ts (tag 0 < 1), so
the join is inclusive (ts >= right ts), matching DuckDB's native
``ASOF LEFT JOIN`` which serves as the value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach, to every left row, the latest right row at-or-before its
    timestamp (per key): the right timestamp lands in
    ``{ts_col}{suffix}`` and each of ``value_cols`` in
    ``{col}{suffix}``; all NULL when no right row precedes. The right
    side should be unique per (key, ts) — pre-aggregate it otherwise
    (which of several equal-ts rows wins is undefined in any as-of
    engine).
    """
    value_cols = value_cols or []
    carried = [F.col(ts_col).alias(f"{ts_col}{suffix}")] + [
        F.col(c).alias(f"{c}{suffix}") for c in value_cols
    ]
    r = right.select(F.col(key_col), F.col(ts_col), *carried).withColumn(
        "_tag", F.lit(0)
    )
    l = left.withColumn("_tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in [f"{ts_col}{suffix}"] + [f"{c}{suffix}" for c in value_cols]:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_tag") == 1).drop("_tag")
