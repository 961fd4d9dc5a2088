"""Explicit repartitioning + salted-key skew mitigation.

Reference parity: the BullMQ queue hop is the reference's shuffle
boundary (``controllers/pdf.js:36-40`` -> ``OCRQueue.js:40-47``); its
work-stealing worker pools are what kept per-worker load even. In Spark
the equivalent levers are an explicit hash repartition on the document
key plus, where one key's payload is far heavier than the median
(media-heavy docs: 50-200 media spans vs 0-5, FIXTURES.md), a salt
component so a hot key's rows spread over several partitions.

Where salting matters at 100 TB (and where it doesn't):

* Pre-explode, one doc = one row, so a hash repartition on ``doc_id``
  is already row-uniform — but NOT byte-uniform when span arrays are
  skewed. ``salted_repartition`` with a weight column splits byte-heavy
  keys across ``salt_buckets`` partitions.
* Post-explode span streams keyed by ``doc_id`` are row-skewed; the
  same salt applies (grouping back per-doc happens only in the final
  collect, where groups are doc-sized and bounded).
* The OCR compute input is deduped to distinct content hashes
  (stage_a), which is the strongest skew mitigation of all: per-task
  cost is uniform in distinct payloads, not in document fan-in.
  A hot media_ref referenced by millions of docs costs ONE OCR.
* AQE skew-join splitting (enabled in session.py) covers residual
  join-side skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key_col: str = "doc_id",
    weight_col: str | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Hash-repartition on ``key_col`` with a weight-scaled salt.

    Rows whose ``weight_col`` is large get a salt drawn from up to
    ``salt_buckets`` values (proportional to log2(weight)), so a heavy
    key no longer maps to a single partition. Light rows keep salt 0,
    preserving plain hash partitioning for the common case.
    """
    key_hash = F.xxhash64(F.col(key_col))
    if weight_col is None:
        return df.repartition(num_partitions, key_hash)
    # buckets available to this row: 1 (light) .. salt_buckets (heavy)
    buckets = F.least(
        F.lit(salt_buckets),
        F.greatest(F.lit(1), F.ceil(F.log2(F.col(weight_col) + F.lit(1)))),
    )
    # the salt must vary WITHIN a hot key's rows — a key-derived salt
    # would be constant per key and split nothing — but it must also be
    # DETERMINISTIC per row: monotonically_increasing_id depends on row
    # order within the task, and after a partial stage retry (executor
    # lost mid-shuffle) the re-executed map task can see rows in a
    # different order, re-salting rows into different partitions than
    # the already-fetched reducer outputs assumed — lost/duplicated
    # rows (the SPARK-23207 class of bug). Hash of the FULL row content
    # is order-independent: identical under any retry, and it varies
    # across a hot key's rows unless the rows are byte-identical (in
    # which case their placement together is harmless).
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), buckets)
    return df.repartition(num_partitions, key_hash, salt)


def media_weight(spans_col: str = "spans") -> F.Column:
    """Per-doc media span count — the salt weight for media-heavy skew."""
    return F.size(
        F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("media"))
    )
