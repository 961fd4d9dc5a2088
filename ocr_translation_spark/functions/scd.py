"""Slowly-Changing-Dimension Type-2 history build from a change feed.

The warehouse-standard versioned-dimension operator: given a stream of
observed attribute states per business key (CDC rows, periodic
snapshots, or an event log), emit one row per *distinct consecutive
state* with its validity interval:

    (key, version, valid_from, valid_to, attrs..., is_current)

``valid_to`` is the next version's ``valid_from`` (half-open
intervals, the Kimball convention) and NULL on the current row.
Consecutive rows whose tracked attributes are unchanged are collapsed
(change compression) — re-observing the same state must NOT open a
new version, or snapshot-sourced dimensions grow one version per
snapshot instead of one per change.

Spark shape (100 TB):
  ONE shuffle total — the key-partitioned window. All three steps
  (change detection via ``lag``, version numbering via
  ``row_number``, interval close via ``lead``) run over windows on
  the SAME partition key, so Catalyst plans a single Exchange and
  sorts once per step within it; no join, no second scan of the
  feed. Output cardinality is O(distinct states) <= O(input).

Determinism: rows are ordered by (ts, tie) inside each key — the
caller supplies a unique tie column so equal-timestamp feeds (bulk
loads, same-day CDC) produce a stable version sequence on any
partitioning. Attribute comparison is null-safe (``eqNullSafe``), so
NULL -> 'X' and 'X' -> NULL both open versions.

Relation to :mod:`.diff` (snapshot_diff): the diff operator compares
exactly TWO snapshots and emits add/remove/change rows; SCD2 folds an
*unbounded ordered history* of states into validity intervals. The
two compose: diff output is a valid change feed for this operator.

Reference parity note: the reference keeps only the latest OCR /
translation result per content hash (`src/services/ocr.js` cache
set overwrites). SCD2 is the lossless generalization a warehouse
needs: every historical state queryable as-of any time.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tie_col: str,
) -> DataFrame:
    """Fold an ordered change feed into SCD Type-2 validity intervals.

    Parameters
    ----------
    changes : one row per observed state (CDC row / snapshot member).
    key_col : business key the history is tracked per.
    ts_col : observation timestamp (the version's ``valid_from``).
    attr_cols : tracked attributes; a version opens iff any of them
        differs (null-safely) from the previous observation.
    tie_col : unique-per-row column breaking equal-``ts`` ordering so
        the version sequence is deterministic.

    Returns one row per version:
    ``key, version, valid_from, valid_to, <attrs>, is_current``.
    """
    if not attr_cols:
        raise ValueError("scd2_history needs at least one tracked attribute")
    order = [F.col(ts_col).asc(), F.col(tie_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)

    # A version opens when any tracked attribute null-safely differs
    # from the previous observation of the same key. First-row
    # detection is row_number == 1, NOT "lag(ts/tie) IS NULL": a feed
    # whose first-ordered row carries NULL ts and tie would make the
    # SECOND row look first and open a spurious version (the DuckDB
    # twin tests rn = 1 — the formulations must agree).
    unchanged = F.lit(True)
    for a in attr_cols:
        unchanged = unchanged & F.col(a).eqNullSafe(F.lag(a).over(w))
    is_first = F.row_number().over(w) == 1
    opens = changes.withColumn(
        "_opens", is_first | ~unchanged
    ).filter(F.col("_opens")).drop("_opens")

    # Version numbering + interval close over the same partition key:
    # no new Exchange, just another sort spec on the existing one.
    w2 = Window.partitionBy(key_col).orderBy(*order)
    valid_to = F.lead(ts_col).over(w2)
    return opens.select(
        F.col(key_col),
        # long, not int: DuckDB row_number() is BIGINT and the driver
        # compares schemas
        F.row_number().over(w2).cast("long").alias("version"),
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        *[F.col(a) for a in attr_cols],
        valid_to.isNull().alias("is_current"),
    )


def scd2_asof(history: DataFrame, ts) -> DataFrame:
    """Reconstruct the dimension state as of time ``ts`` from an
    :func:`scd2_history` output: the version whose half-open validity
    interval contains it (valid_from <= ts < valid_to, NULL valid_to
    = open-ended). A row-local filter — time travel over an SCD2
    table costs a partition-prunable scan, no window, no join; keys
    born after ``ts`` simply do not appear."""
    t = F.lit(ts)
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    ).drop("is_current")
