"""Leakage-safe cluster-atomic splitting (functions/splitting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.splitting import cluster_safe_split


def _clusters(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def test_split_is_cluster_atomic(spark):
    # 30 docs in 7 clusters of varying size
    rows = [(i, i % 7) for i in range(30)]
    got = cluster_safe_split(_clusters(spark, rows)).collect()
    assert len(got) == 30
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())


def test_split_matches_hash_rule_and_is_stable_under_growth(spark):
    import hashlib

    rows = [(i, i) for i in range(200)]
    got = {
        r.doc_id: r.split
        for r in cluster_safe_split(_clusters(spark, rows)).collect()
    }

    def want(cid):
        b = int(hashlib.sha256(str(cid).encode()).hexdigest()[:12], 16) % 10
        return "test" if b == 0 else ("valid" if b == 1 else "train")

    assert got == {i: want(i) for i in range(200)}
    # growth stability: adding clusters never reassigns existing ones
    grown = {
        r.doc_id: r.split
        for r in cluster_safe_split(
            _clusters(spark, rows + [(i, i) for i in range(200, 400)])
        ).collect()
    }
    assert all(grown[i] == got[i] for i in range(200))
    # all three splits non-empty at n=200 and roughly weighted
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"test", "valid", "train"}
    assert c["train"] > c["test"] and c["train"] > c["valid"]


def test_split_near_dups_never_straddle_on_testdata(spark):
    from ocr_translation_spark.functions.dedup import (
        minhash_near_dup_pairs,
    )
    from ocr_translation_spark.functions.graph import dedup_clusters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_near_dup_pairs(docs, jaccard_threshold=0.5)
    split = cluster_safe_split(dedup_clusters(pairs, docs))
    # every near-dup PAIR must share a split
    a = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    straddle = (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddle == 0
    assert split.count() == docs.count()


def test_split_custom_weights_and_validation(spark):
    rows = [(i, i) for i in range(50)]
    df = _clusters(spark, rows)
    two_way = cluster_safe_split(df, weights=[("held", 1), ("rest", 1)])
    assert {r.split for r in two_way.collect()} <= {"held", "rest"}
    with pytest.raises(ValueError, match="positive"):
        cluster_safe_split(df, weights=[("a", 0), ("b", 1)])
    with pytest.raises(ValueError, match="positive"):
        cluster_safe_split(df, weights=[])
