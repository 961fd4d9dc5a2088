"""Incremental materialized-rollup maintenance (mergeable partial
aggregates).

A 100 TB corpus with daily ingest cannot afford to recompute its
summary tables from scratch per batch. The classic fix (self-
maintainable views over distributive aggregates — Gray et al.'s data
cube / Jagadish et al.) is to store MERGEABLE partials per group key:

    count  -> merged by sum
    sum    -> merged by sum   (exact DECIMAL, order-insensitive)
    min    -> merged by min
    max    -> merged by max

so updating the view costs ``agg(delta) + merge(old_view, delta_view)``
— it reads the DELTA and the (tiny, one-row-per-key) stored rollup,
never the base corpus. ``merge_rollups`` consumes any DataFrame with
rollup-shaped columns, including one read back from parquet, which is
what makes this genuinely incremental: the base scan happens once in
the view's lifetime.

Column-name conventions carry the merge semantics: ``n_rows`` merges
by sum, ``sum_*`` by sum, ``min_*`` by min, ``max_*`` by max. The
merge is associative and commutative, so any delta arrival order and
any partitioning produce the identical view — verified by the DuckDB
oracle twin recomputing the view from the FULL base in one pass.

Exactness: callers must pass sum measures in an exact type (DECIMAL or
integer). A double sum is order-sensitive and would break both the
incremental==full invariant and the cross-engine oracle.

100 TB shape: both build and merge are single hash aggregates on the
group key; the merge input is O(|delta| + |keys|). No windows, no
joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

COUNT_COL = "n_rows"


def build_rollup(
    df: DataFrame,
    keys: list[str],
    sums: list[str] = (),
    mins: list[str] = (),
    maxs: list[str] = (),
) -> DataFrame:
    """One-pass mergeable rollup of ``df`` by ``keys``.

    Emits ``n_rows`` plus ``sum_<c>`` / ``min_<c>`` / ``max_<c>`` per
    measure. The output is both the answer AND the mergeable state.
    """
    aggs = [F.count("*").cast("long").alias(COUNT_COL)]
    for c in sums:
        aggs.append(F.sum(c).alias(f"sum_{c}"))
    for c in mins:
        aggs.append(F.min(c).alias(f"min_{c}"))
    for c in maxs:
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    old: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge two rollups of identical shape into one.

    Pure state merge — neither input's base rows are touched, so this
    is the O(|delta| + |keys|) maintenance step. Merge semantics are
    derived from the column names ``build_rollup`` emitted; an
    unrecognized column is an error rather than a silently wrong
    default.
    """
    if set(old.columns) != set(delta.columns):
        raise ValueError(
            f"rollup shapes differ: {sorted(old.columns)} vs "
            f"{sorted(delta.columns)}"
        )
    u = old.unionByName(delta)
    aggs = []
    for c in old.columns:
        if c in keys:
            continue
        if c == COUNT_COL:
            aggs.append(F.sum(c).cast("long").alias(c))
        elif c.startswith("sum_"):
            # re-cast to the stored dtype: Spark widens DECIMAL sums
            # (p,s) -> (38,s), which would drift the view's schema a
            # little wider on every merge generation otherwise
            aggs.append(
                F.sum(c).cast(old.schema[c].dataType).alias(c)
            )
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"non-mergeable rollup column: {c}")
    return u.groupBy(*keys).agg(*aggs)
