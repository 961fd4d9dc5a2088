"""Merkle bucket-checksum replica diff (functions/diff.py): result
equality with the naive full snapshot_diff on planted drift, empty
result (with the id column's real dtype) on identical replicas,
order/partition invariance of the xor fingerprint, and the
narrowing property (diverged buckets ≪ buckets)."""

from pyspark.sql import functions as F

from ocr_translation_spark.functions.diff import (
    merkle_bucket_diff,
    merkle_bucket_summary,
    snapshot_diff,
)


def _old(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )


def _new(spark, n=3000):
    # drift: ids %97==0 removed, %89==0 changed, 5 added
    base = _old(spark, n).filter(F.col("doc_id") % 97 != 0)
    changed = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 89 == 0,
            F.concat(F.lit("CHANGED-"), F.col("doc_id")),
        ).otherwise(F.col("text")),
    )
    added = spark.range(1000000, 1000005).select(
        F.col("id").alias("doc_id"),
        F.lit("brand new").alias("text"),
    )
    return changed.unionByName(added)


def test_equals_naive_full_diff(spark):
    old, new = _old(spark), _new(spark)
    got = sorted(
        (r["doc_id"], r["status"])
        for r in merkle_bucket_diff(old, new, buckets=64).collect()
    )
    want = sorted(
        (r["doc_id"], r["status"])
        for r in snapshot_diff(old, new).collect()
        if r["status"] != "unchanged"
    )
    assert got == want
    statuses = {s for _, s in got}
    assert statuses == {"added", "removed", "changed"}


def test_identical_replicas_empty_with_real_dtype(spark):
    old = _old(spark)
    out = merkle_bucket_diff(old, _old(spark), buckets=32)
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == "bigint"  # not a stub schema


def test_summary_is_partition_and_order_invariant(spark):
    old = _old(spark, 1000)
    a = {tuple(r) for r in merkle_bucket_summary(
        old.coalesce(1), "doc_id", "text", 16).collect()}
    b = {tuple(r) for r in merkle_bucket_summary(
        old.orderBy(F.rand(7)).repartition(13), "doc_id", "text", 16
    ).collect()}
    assert a == b


def test_detail_join_narrows_to_diverged_buckets(spark):
    # 1 changed row out of 3000 must diverge exactly ONE of 256
    # buckets — the detail join's input is ~1/256 of the corpus
    old = _old(spark)
    new = old.withColumn(
        "text",
        F.when(F.col("doc_id") == 42, F.lit("tampered"))
        .otherwise(F.col("text")),
    )
    sa = {r["bucket"]: (r["n_rows"], r["checksum"])
          for r in merkle_bucket_summary(old, "doc_id", "text", 256)
          .collect()}
    sb = {r["bucket"]: (r["n_rows"], r["checksum"])
          for r in merkle_bucket_summary(new, "doc_id", "text", 256)
          .collect()}
    diverged = [k for k in set(sa) | set(sb) if sa.get(k) != sb.get(k)]
    assert len(diverged) == 1
    got = merkle_bucket_diff(old, new, buckets=256).collect()
    assert [(r["doc_id"], r["status"]) for r in got] == [
        (42, "changed")
    ]
