"""Distributed recall@k evaluation (functions/evaluation)."""

from __future__ import annotations

from ocr_translation_spark.functions.evaluation import topk_recall


def _df(spark, pairs):
    return spark.createDataFrame(
        pairs, "query_id long, neighbor_id long"
    )


def test_recall_hand_computed(spark):
    exact = _df(spark, [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)])
    approx = _df(spark, [(1, 10), (1, 99), (1, 12), (2, 55), (2, 66)])
    got = {
        r.query_id: (r.n_exact, r.n_hit, r.recall_micro)
        for r in topk_recall(approx, exact).collect()
    }
    assert got[1] == (3, 2, 666666)  # floor(2e6/3)
    assert got[2] == (2, 0, 0)       # zero-hit query still present


def test_recall_perfect_and_extra_approx_rows(spark):
    exact = _df(spark, [(1, 10), (1, 11)])
    # approx returning MORE rows than exact must not inflate recall
    approx = _df(spark, [(1, 10), (1, 11), (1, 12), (1, 13)])
    got = topk_recall(approx, exact).collect()
    assert len(got) == 1 and got[0].recall_micro == 1000000


def test_recall_matches_lsh_vs_brute_on_testdata(spark):
    from pyspark.sql import functions as F

    from ocr_translation_spark.functions.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, qs, k=5)
    approx = lsh_bucketed_topk(emb, qs, dim=64, k=5, n_planes=6,
                               multiprobe=2)
    rows = topk_recall(approx, exact).collect()
    assert len(rows) == 10
    # python-side recomputation of the same recall
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    for r in rows:
        n_exact = sum(1 for q, _ in e if q == r.query_id)
        n_hit = sum(1 for p in e if p[0] == r.query_id and p in a)
        assert (r.n_exact, r.n_hit) == (n_exact, n_hit)
        assert r.recall_micro == (1_000_000 * n_hit) // n_exact
