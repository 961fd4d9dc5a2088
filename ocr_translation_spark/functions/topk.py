"""Grouped top-k with per-partition pruning ("top-k pushdown").

The standard Spark top-k-per-group — a rank window — shuffles EVERY
row to its group's partition and sorts whole groups, O(rows) shuffle
bytes and an unbounded hot-group sort. But top-k is a mergeable
summary: a row in the global top-k of its group is necessarily in the
top-k of whatever partition it sits in, so one bounded local prune
per partition cuts the shuffle to O(k x partitions x groups-touched)
rows before the exact window runs. This is the TopK pushdown classic
(the same partial-aggregate argument as map-side combine; Spark only
does it automatically for the GLOBAL orderBy-limit case via
TakeOrdered, not per group).

Spark shape (100 TB):
  1. LOCAL prune: one Arrow-vectorized ``mapInPandas`` pass keeps, for
     every group PRESENT IN the partition, its k best rows under the
     full deterministic ordering (value, then tiebreak) — state
     bounded at k rows per (partition, group).
  2. EXACT finish: the standard rank window over the pruned relation;
     per group at most k x (partitions that contained it) rows reach
     the shuffle, independent of group size.

Soundness requires the local and global orderings to be IDENTICAL,
ties included — hence the mandatory ``tiebreak_col`` (a unique id):
with a total order, local-top-k ⊇ global-top-k is exact, not
heuristic, and the result equals the plain window's row set.

NULL ordering values sort last under both engines' DESC and are
dropped up front (a NULL cannot be a "best" row); NULL group keys are
dropped like everywhere else in the repo's grouped operators.

Reference parity note: the reference lists "recent jobs" per user
with an ORDER BY LIMIT (`src/services/job.js`); this is the grouped,
corpus-scale form.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _local_prune(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int,
    ascending: bool,
) -> DataFrame:
    """Stage 1: each partition's k best rows per group it contains —
    <= k x groups-in-partition output rows, the bound the pushdown is
    about (test-pinned)."""
    clean = df.filter(
        F.col(group_col).isNotNull() & F.col(order_col).isNotNull()
    )
    schema = clean.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if not b.empty]
        if not parts:
            return
        pdf = pd.concat(parts)
        pdf = pdf.sort_values(
            [group_col, order_col, tiebreak_col],
            ascending=[True, ascending, True],
            kind="mergesort",
        )
        yield pdf.groupby(group_col, sort=False).head(k)

    return clean.mapInPandas(prune, schema)


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int = 3,
    ascending: bool = False,
) -> DataFrame:
    """Top-``k`` rows per group under (order_col ``ascending``,
    tiebreak_col asc), all columns passed through plus ``rank``.
    ``tiebreak_col`` must be unique per row for the prune to be exact.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    pruned = _local_prune(df, group_col, order_col, tiebreak_col, k,
                          ascending)
    order = (
        F.col(order_col).asc() if ascending else F.col(order_col).desc()
    )
    w = Window.partitionBy(group_col).orderBy(
        order, F.col(tiebreak_col).asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
