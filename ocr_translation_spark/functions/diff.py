"""Incremental snapshot diff — the CDC accounting view between two
crawls of the same corpus.

A web-scale pipeline re-crawls continuously; downstream stages want
"what changed since the snapshot I last processed": which documents
are new, which disappeared, which changed content, which are
untouched (and can skip recompute entirely — the incremental-resume
premise of `operators/resume.py` at the corpus level).

Spark shape at 100 TB: ONE full-outer equi-join on the id — with both
snapshots bucketed by id (the Iceberg bucket(N, doc_id) layout the
engine assumes everywhere) this runs with ZERO exchanges
(plan-asserted in tests/test_snapshot_diff_bucketed.py; only cheap
within-partition merge sorts remain, since Spark trusts bucket sort
metadata only in narrow layouts); otherwise it is one
hash-partitioned shuffle per side.
Content comparison is by sha256 of the payload, computed row-locally
on each side BEFORE the join, so the join carries 64-byte digests
instead of document bodies — at 2 KB/doc that is a 30x reduction in
shuffle bytes for the changed-detection case.

Reference parity note: the reference's cache GET/SET
(`src/services/ocr.js`) skips recompute per item; this operator is
the batch-corpus generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "text",
) -> DataFrame:
    """(id, status, old_sha, new_sha) with status in
    added | removed | changed | unchanged — one row per id present in
    either snapshot."""
    # Presence is carried by explicit per-side marker columns, NOT by
    # digest nullness: sha2(NULL payload) is NULL, so a NULL-text doc
    # present on both sides would otherwise masquerade as added.
    a = old.select(
        F.col(id_col).alias("__id"),
        F.sha2(F.col(payload_col), 256).alias("old_sha"),
        F.lit(True).alias("__in_old"),
    )
    b = new.select(
        F.col(id_col).alias("__id"),
        F.sha2(F.col(payload_col), 256).alias("new_sha"),
        F.lit(True).alias("__in_new"),
    )
    j = a.join(b, "__id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        # null-safe inequality: a NULL payload on exactly one side is
        # a content change, on both sides it is unchanged
        .when(
            ~F.col("old_sha").eqNullSafe(F.col("new_sha")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col("__id").alias(id_col),
        status.alias("status"),
        "old_sha",
        "new_sha",
    )
