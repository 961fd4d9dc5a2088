"""Input validation with quarantine routing (reference T9).

Reference parity: the reject-guards at ``controllers/pdf.js:14-16,
144-146`` and ``src/utils/pdf.js:14-22`` return HTTP 400s; in a batch
job invalid rows must not fail the run OR vanish silently — they are
routed to a quarantine output with a machine-readable reason.

Valid rows (processed): non-null doc_id, non-null spans array, every
span has a known kind, media spans carry a ref, offsets non-null.
An EMPTY spans array is valid (extracted output = empty array,
FIXTURES.md section 1).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from .. import semantics as S


class SplitResult(NamedTuple):
    valid: DataFrame
    quarantined: DataFrame  # input columns + reason:string


def _reason_col() -> F.Column:
    spans = F.col("spans")
    bad_span = lambda pred: F.exists(spans, pred)  # noqa: E731
    return (
        F.when(F.col("doc_id").isNull(), "null_doc_id")
        .when(spans.isNull(), "null_spans")
        .when(
            bad_span(lambda s: s["kind"].isNull() | ~s["kind"].isin(list(S.ALL_KINDS))),
            "unknown_span_kind",
        )
        .when(
            bad_span(
                lambda s: (s["kind"] == S.KIND_MEDIA) & s["media_ref"].isNull()
            ),
            "media_span_without_ref",
        )
        .when(bad_span(lambda s: s["offset"].isNull()), "null_offset")
    )


def validate_documents(docs: DataFrame) -> SplitResult:
    tagged = docs.withColumn("reason", _reason_col())
    valid = tagged.filter(F.col("reason").isNull()).drop("reason")
    quarantined = tagged.filter(F.col("reason").isNotNull())
    return SplitResult(valid, quarantined)


def quarantine_metrics(quarantined: DataFrame) -> DataFrame:
    """Machine-readable quarantine summary: one row per reject reason
    (the batch twin of the reference's per-request 400 counters).
    Append beside the lineage/metrics tables for dashboards."""
    return quarantined.groupBy("reason").agg(F.count("*").alias("n_docs"))


def redrive_quarantine(spark, quarantine_path: str) -> SplitResult:
    """Dead-letter re-drive: re-validate previously quarantined rows
    (after an upstream fix or a validator change) and split them into
    rows now fit for reprocessing vs still-dead. The caller feeds
    ``valid`` back through ``extract``/``ResumableRun`` and overwrites
    the quarantine dir with ``quarantined`` — the same
    read-validate-route operator, applied to its own output, so the
    dead-letter queue only ever shrinks."""
    rows = spark.read.parquet(quarantine_path).drop("reason")
    return validate_documents(rows)
