"""One-pass table profiling: per-column audit statistics.

The first step of ingesting an unfamiliar 100 TB source is a data
audit — per column: row count, NULL count, EXACT distinct count, and
min/max. Running ``count_distinct`` per column issues one aggregate
per column over the full scan; the distributed-profiler shape is
instead ONE pass:

1. stack the table row-wise into (col_name, value) pairs — an
   ``explode`` over a per-row struct array, linear in rows x columns,
   no shuffle yet;
2. ONE hash aggregate on (col_name, value) collapses repeated values
   (map-side partial aggregation does most of this before the
   shuffle — value-skewed columns collapse early);
3. a tiny per-column rollup over the distinct-value table yields all
   four statistics at once: n_rows = sum of value counts, n_nulls =
   the NULL group's count, n_distinct = the number of non-null value
   groups, min/max = extremes over the value column.

Values are carried in CANONICAL form so both engines agree exactly:
strings as themselves, integers as BIGINT, money/doubles quantized
half-up to integer ten-thousandths (the ``_msum`` convention),
timestamps as epoch microseconds. min/max are emitted typed —
``min_str``/``max_str`` for text columns, ``min_num``/``max_num`` for
numeric — so no cross-engine float/timestamp rendering ambiguity can
leak into the value hash.

100 TB shape: one wide scan, one shuffle keyed by (column, value) —
uniformly spread unless a column is single-valued, in which case the
map-side combine already reduced it to one row per partition — and an
O(columns)-row rollup. No per-column jobs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def canon_money(c: Column) -> Column:
    """Half-up integer ten-thousandths (exact for 4-decimal money)."""
    return F.floor(c * 10000 + F.lit(0.5)).cast("long")


def canon_ts(c: Column) -> Column:
    # parquet NTZ timestamps need the cast before unix_micros (the
    # session runs UTC, so this matches DuckDB's epoch_us exactly —
    # same pattern as the events_* oracle queries)
    return F.unix_micros(c.cast("timestamp"))


def profile_table(
    df: DataFrame,
    text_cols: list[str] = (),
    int_cols: list[str] = (),
    money_cols: list[str] = (),
    ts_cols: list[str] = (),
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str, min_num, max_num)."""

    def _entry(name: str, val_str: Column, val_num: Column) -> Column:
        src = F.col(name)
        return F.struct(
            F.lit(name).alias("col_name"),
            src.isNull().cast("int").alias("is_null"),
            F.when(src.isNotNull(), val_str).alias("val_str"),
            F.when(src.isNotNull(), val_num).alias("val_num"),
        )

    entries = []
    null_str = F.lit(None).cast("string")
    null_num = F.lit(None).cast("long")
    for c in text_cols:
        entries.append(_entry(c, F.col(c), null_num))
    for c in int_cols:
        entries.append(_entry(c, null_str, F.col(c).cast("long")))
    for c in money_cols:
        entries.append(_entry(c, null_str, canon_money(F.col(c))))
    for c in ts_cols:
        entries.append(_entry(c, null_str, canon_ts(F.col(c))))
    if not entries:
        raise ValueError("no columns to profile")

    stacked = df.select(
        F.explode(F.array(*entries)).alias("e")
    ).select("e.col_name", "e.is_null", "e.val_str", "e.val_num")

    per_val = stacked.groupBy(
        "col_name", "is_null", "val_str", "val_num"
    ).agg(F.count("*").alias("c"))

    return per_val.groupBy("col_name").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("is_null") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count(F.when(F.col("is_null") == 0, 1))
        .cast("long")
        .alias("n_distinct"),
        F.min("val_str").alias("min_str"),
        F.max("val_str").alias("max_str"),
        F.min("val_num").alias("min_num"),
        F.max("val_num").alias("max_num"),
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Hot-key skew diagnostic for a prospective shuffle key — the
    audit a pipeline runs BEFORE choosing salting / AQE skew handling
    (axes this engine leans on: ``operators/partitioning.py``).

    Output: the ``top_k`` hottest keys with exact count, per-key load
    share and cumulative share in integer micro-units
    (``share_micro = 1e6 * cnt div total``), rank-ordered. A key whose
    share approaches ``1e6 / shuffle_partitions`` is a straggler
    candidate; the cumulative column shows how concentrated the skew
    is (Zipf head mass).

    Scale shape: ONE key-hash aggregate over the corpus + a single-row
    total broadcast; top-k via TakeOrdered; the rank/cumulative window
    runs AFTER the limit, over exactly ``top_k`` rows — O(k) regardless
    of corpus size.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), "key")
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("cnt").desc(), "key")
    share = F.call_function(
        "div", F.lit(1_000_000).cast("long") * F.col("cnt"), F.col("total")
    ).cast("long")
    cum = F.call_function(
        "div",
        F.lit(1_000_000).cast("long")
        * F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
        F.col("total"),
    ).cast("long")
    return top.select(
        F.row_number().over(w).alias("rank"),
        "key",
        F.col("cnt").cast("long").alias("cnt"),
        share.alias("share_micro"),
        cum.alias("cum_share_micro"),
    )
