"""Filter-funnel drop accounting for curation cascades.

Production corpus-cleaning pipelines (C4, RefinedWeb, FineWeb) publish
per-filter removal statistics — how many documents each rule rejects,
and how many it is the FIRST to reject given the cascade order — both
to audit the pipeline and to spot a rule that suddenly starts eating
the corpus.  This operator computes that report in ONE corpus scan and
ONE single-row aggregation:

  for stage i with predicate p_i:
    n_fail          = #docs failing p_i (regardless of other stages)
    n_dropped_here  = #docs passing p_1..p_{i-1} but failing p_i
                      (the docs this stage removes from the funnel)
    n_remaining     = #docs passing p_1..p_i (cumulative survivors)

All three are conditional counts folded into one hash aggregate, so at
100 TB the cost is the scan plus a constant-width partial-agg merge —
no shuffle of document rows, no per-stage pass.  The one-row aggregate
is exploded into one output row per stage driver-free (array of
structs + explode, all JVM-side).

Repo convention tie-in: every lossy operator here accounts for what it
drops (cap_buckets logs, quarantine tables, sampling probabilities);
this makes the accounting itself a first-class, oracle-checkable
operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def filter_funnel(
    df: DataFrame, filters: list[tuple[str, Column]]
) -> DataFrame:
    """Per-stage drop-accounting report for an ordered filter cascade.

    ``filters`` is an ordered list of (name, boolean Column).  Returns
    one row per stage: (stage, filter, n_fail, n_dropped_here,
    n_remaining), with ``stage`` 1-based in cascade order.
    """
    if not filters:
        raise ValueError("filters must be non-empty")

    aggs = []
    so_far = F.lit(True)
    for i, (name, pred) in enumerate(filters, start=1):
        aggs.append(
            F.sum(F.when(~pred, 1).otherwise(0)).alias(f"_f{i}")
        )
        aggs.append(
            F.sum(F.when(so_far & ~pred, 1).otherwise(0)).alias(f"_d{i}")
        )
        so_far = so_far & pred
        aggs.append(F.sum(F.when(so_far, 1).otherwise(0)).alias(f"_r{i}"))

    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(name).alias("filter"),
                F.coalesce(F.col(f"_f{i}"), F.lit(0)).alias("n_fail"),
                F.coalesce(F.col(f"_d{i}"), F.lit(0)).alias(
                    "n_dropped_here"
                ),
                F.coalesce(F.col(f"_r{i}"), F.lit(0)).alias("n_remaining"),
            )
            for i, (name, _) in enumerate(filters, start=1)
        ]
    )
    return (
        one.select(F.explode(rows).alias("e"))
        .select("e.stage", "e.filter", "e.n_fail", "e.n_dropped_here",
                "e.n_remaining")
    )
