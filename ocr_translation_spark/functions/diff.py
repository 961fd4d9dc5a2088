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


def _hash60_str(c):
    """60-bit sha-derived hash of a string column (the sketches.py
    convention, inlined to keep diff.py dependency-free)."""
    return F.conv(
        F.substring(F.sha2(c, 256), 1, 15), 16, 10
    ).cast("long")


def merkle_bucket_summary(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    buckets: int = 256,
) -> DataFrame:
    """(bucket, n_rows, checksum): one order-insensitive fingerprint
    per id-hash bucket. checksum = bit_xor of per-row 60-bit sha
    digests over (id, payload) — xor is commutative/associative with
    no overflow, so the fingerprint is a pure function of the row SET
    and identical under any partitioning or insertion order. NULL
    payloads hash the id alone (still per-row deterministic)."""
    # chr(1) separator makes the (id, payload) concat unambiguous;
    # DuckDB spells the same bytes concat_ws(chr(1), ...)
    row_h = _hash60_str(
        F.concat_ws(
            chr(1),
            F.col(id_col).cast("string"),
            F.col(payload_col).cast("string"),
        )
    )
    bucket = F.pmod(
        _hash60_str(F.col(id_col).cast("string")), F.lit(buckets)
    )
    return (
        df.select(bucket.alias("bucket"), row_h.alias("_h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_h)").alias("checksum"),
        )
    )


def merkle_bucket_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """Replica/snapshot divergence detection in O(diverged buckets):
    (id, status) with status in added | removed | changed — exactly
    the non-unchanged rows of :func:`snapshot_diff`, found without a
    full corpus-vs-corpus join.

    The anti-entropy shape (Merkle-tree repair in Dynamo-style
    systems, one level deep): both sides aggregate to ``buckets``
    order-insensitive fingerprints — two O(rows) scans emitting
    O(buckets) rows — and the row-level detail join runs ONLY over
    buckets whose (count, checksum) disagree. Replicas drifted by d
    rows spread over b <= d buckets cost ~rows*b/buckets per side in
    the detail join; replicas in exact agreement cost NO row-level
    join at all (two scans + an O(buckets) compare).

    Exactness caveat (stated, not hidden): a diverged bucket is
    missed only if its digest multiset xor-collides AND its row count
    is unchanged (probability ~2^-60 per bucket, needing compensating
    digest changes); the pytest pins equality with the naive full
    snapshot_diff on real drift.

    The diverged-bucket ids are collected (O(buckets) driver values —
    control metadata, the stream registries' probed-prefix
    discipline) and pushed into both sides as a LITERAL isin
    predicate, so bucket-clustered layouts prune whole files.
    """
    sa = merkle_bucket_summary(old, id_col, payload_col, buckets)
    sb = merkle_bucket_summary(new, id_col, payload_col, buckets)
    joined = sa.alias("a").join(
        sb.alias("b"), F.col("a.bucket") == F.col("b.bucket"), "full"
    )
    bad = (
        joined.filter(
            F.col("a.bucket").isNull()
            | F.col("b.bucket").isNull()
            | (F.col("a.n_rows") != F.col("b.n_rows"))
            | (F.col("a.checksum") != F.col("b.checksum"))
        )
        .select(
            F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("k")
        )
        .collect()
    )
    diverged = sorted(r["k"] for r in bad)

    def narrowed(df):
        if not diverged:
            # no divergence: an empty-but-correctly-typed relation
            # (derives the id column's real type, runs no row join)
            return df.limit(0)
        bucket = F.pmod(
            _hash60_str(F.col(id_col).cast("string")), F.lit(buckets)
        )
        return df.filter(bucket.isin(diverged))

    detail = snapshot_diff(
        narrowed(old),
        narrowed(new),
        id_col=id_col,
        payload_col=payload_col,
    )
    return detail.filter(F.col("status") != "unchanged").select(
        id_col, "status"
    )
