"""Recall gates for the approximate (LSH) operators against exact
all-pairs ground truth (VERDICT r1 items 1/6): the approximation
contract is explicit — precision 1.0 (exact verify on candidates) and
measured recall above the derived-banding design point.

Ground truth is computed with a crossJoin HERE, in the test, at 500
rows — the operators under test must never contain one (asserted on
the physical plan).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.dedup import (
    derive_banding,
    minhash_near_dup_pairs,
    shingles,
)
from ocr_translation_spark.functions.similarity import (
    cosine,
    srp_near_dup_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
needs_testdata = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def _no_cross_join(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_derive_banding_thresholds():
    # t=0.5 must NOT keep the old 8x4 (recall ~0.40); 16x2 recalls ~0.99
    assert derive_banding(32, 0.5) == (16, 2)
    # high thresholds afford sharper banding (r=8 would only recall
    # 1-(1-0.9^8)^4 ~ 0.89 — below the floor, so r=4 is the pick)
    assert derive_banding(32, 0.9) == (8, 4)
    # recall floor honored: 1-(1-t^r)^b >= 0.95 at the returned (b, r)
    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = derive_banding(32, t)
        assert 1 - (1 - t**r) ** b >= 0.95


@needs_testdata
def test_minhash_recall_vs_exact_all_pairs(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    sh = docs.select(
        F.col("doc_id").alias("_id"), shingles(F.col("text"), 3).alias("g")
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("g").alias("ga"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(inter / union, 6) >= 0.5)
        .select("id_a", "id_b")
        .collect()
    }
    assert len(exact) > 10  # the corpus plants real near-dup pairs

    lsh_df = minhash_near_dup_pairs(docs, jaccard_threshold=0.5)
    _no_cross_join(lsh_df)
    got = {(r["id_a"], r["id_b"]) for r in lsh_df.collect()}

    assert got <= exact  # precision 1.0: every pair exact-verified
    recall = len(got & exact) / len(exact)
    # derived banding (16x2) designs for >=0.95 theoretical candidate
    # recall at t=0.5; observed recall on the deterministic corpus
    assert recall >= 0.95, f"recall {recall:.3f} below design point"


@needs_testdata
def test_srp_neardup_recall_vs_exact_all_pairs(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    e = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    a = e.select(F.col("_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 4) >= 0.42)
        .select("id_a", "id_b")
        .collect()
    }
    assert len(exact) > 10

    lsh_df = srp_near_dup_pairs(
        emb, dim=64, threshold=0.42, n_tables=8, planes_per_table=4
    )
    _no_cross_join(lsh_df)
    got = {(r["id_a"], r["id_b"]) for r in lsh_df.collect()}

    assert got <= exact  # exact cosine verify on candidates
    recall = len(got & exact) / len(exact)
    # 0.42 cosine is a LOW-similarity regime for sign-LSH
    # (p = 1 - arccos(0.42)/pi ~ 0.637; 1-(1-p^4)^8 ~ 0.77 theoretical);
    # the deterministic corpus measures above it
    assert recall >= 0.7, f"recall {recall:.3f}"


@needs_testdata
def test_ivf_recall_vs_brute_force(spark):
    from ocr_translation_spark.functions.ivf import ivf_topk
    from ocr_translation_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    # (no _no_cross_join here: IVF deliberately cross-joins every
    # vector against the EIGHT centroids — cost n*k, the quantizer —
    # while neighbor candidates still come from the inverted-list
    # equi-join, never an n*n pairing)
    ivf_df = ivf_topk(emb, queries, dim=64, k=5, n_clusters=8, iters=2,
                      n_probe=2)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf_df.collect()}
    recall = len(got & exact) / len(exact)
    # probing 2/8 inverted lists: recall < 1 by design; the
    # deterministic corpus measures well above the floor
    assert recall >= 0.5, f"IVF recall {recall:.3f}"
    # determinism: same inputs -> identical result set
    got2 = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, dim=64, k=5, n_clusters=8,
                          iters=2, n_probe=2).collect()
    }
    assert got2 == got
