"""Retrieval-quality evaluation operators.

An approximate index (SRP-LSH, IVF) is only shippable with a measured
recall; at 100 TB the evaluation itself must be a distributed join,
not a driver-side loop over queries. ``topk_recall`` compares an
approximate top-k result against the exact one entirely in-plan:

* per-query exact-result sizes: one hash aggregate;
* hits: one equi-join on (query_id, neighbor_id) + one aggregate;
* recall emitted in exact integer MICRO-units (``1e6 * hits div k``,
  truncating integer division) so the number is engine-exact — the
  repo-wide convention for oracle-checkable fractions.

Queries whose approximate list missed EVERYTHING still appear (left
join, zero-filled) — an evaluation that silently drops its worst rows
overstates recall, the exact failure mode it exists to catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def topk_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall of ``approx`` vs ``exact``; both carry
    (query_id, neighbor_id [, ...]). Returns
    (query_id, n_exact, n_hit, recall_micro)."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    e_cnt = e.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    h_cnt = (
        e.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    return e_cnt.join(h_cnt, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
        F.expr(
            "(1000000 * coalesce(n_hit, 0L)) div n_exact"
        ).alias("recall_micro"),
    )
