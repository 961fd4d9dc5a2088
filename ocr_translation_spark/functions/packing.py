"""Deterministic sequence packing for training-batch construction.

Training dataloaders concatenate documents in a fixed order and split
the stream into fixed token budgets ("concat-then-chunk" packing).
True bin packing is NP-hard and inherently sequential; the shape that
scales — and what production dataloaders actually do — is streaming
assignment: lay documents out in a deterministic order and assign each
to the pack where it STARTS (``floor(start_offset / budget)``). A
document straddling a budget boundary overflows its pack by at most
one document — the standard, documented approximation.

Scale design: a single global running sum would be one unpartitioned
window (the whole corpus through one task). Instead documents are
hash-bucketed first and packed WITHIN each bucket — buckets are
independent, so the cumulative sum runs per bucket (one shuffle, no
single-task bottleneck) and the pack identity is the composite
``(bucket, pack_id)``. Every step is exact integer arithmetic over a
content-hash ordering, so any engine reproduces the assignment
bit-for-bit (the DuckDB twin does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import sample_key
from .text import token_count


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 256,
    bucket_hex_digits: int = 3,
) -> DataFrame:
    """Assign each doc a ``(bucket, pack_id)`` plus its start offset in
    the bucket's concatenated token stream. Deterministic: both the
    bucket (the leading ``bucket_hex_digits`` hex digits of sha256(id)
    — 16^digits buckets) and the within-bucket order derive from the
    id's hash, so the layout is a pure function of the corpus.

    ``bucket_hex_digits`` bounds the per-task window state: the
    running-sum window sorts ONE bucket — corpus/16^digits rows — on a
    single task. The default (3 digits = 4096 buckets) keeps that
    share under 0.025% of the corpus; at 10^12 docs that is ~2.4e8
    rows per bucket — large but sortable, and one more digit divides
    it by 16 again. A 1-digit layout (16 buckets) puts 6% of the
    corpus through one task's sort — the unbounded-partition hazard
    this bucketing exists to avoid — so small digit counts are for
    tests only. Hash bucketing spreads uniformly regardless of id
    distribution (see the bounded-share test)."""
    key = sample_key(F.col(id_col))
    w = (
        Window.partitionBy("bucket")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            key.alias("_key"),
            F.conv(F.substring(key, 1, bucket_hex_digits), 16, 10)
            .cast("int")
            .alias("bucket"),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
        .withColumn(
            "start_offset",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
        )
        .withColumn(
            "pack_id",
            F.floor(F.col("start_offset") / budget_tokens).cast("int"),
        )
        .drop("_key")
    )
