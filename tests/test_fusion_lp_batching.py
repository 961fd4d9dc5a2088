"""Units for RRF fusion, label propagation, and batching waste."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.batching import batching_waste
from ocr_translation_spark.functions.fusion import rank_topn, rrf_fuse
from ocr_translation_spark.functions.graph import label_propagation


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


def test_rrf_hand_computed(spark):
    # doc 1: rank 1 + rank 2 ; doc 2: rank 2 lex only ; doc 3: rank 1
    # auth only. k = 60, scale = 1e6.
    lex = _ranked(spark, [(1, 1), (2, 2)])
    auth = _ranked(spark, [(3, 1), (1, 2)])
    got = {
        r.doc_id: (r.lex_rank, r.auth_rank, r.rrf_micro)
        for r in rrf_fuse(
            {"lex": lex, "auth": auth}, k=60, top_k=10
        ).collect()
    }
    s = 1_000_000
    assert got[1] == (1, 2, s // 61 + s // 62)
    assert got[2] == (2, None, s // 62)
    assert got[3] == (None, 1, s // 61)


def test_rrf_top_k_cut_is_deterministic(spark):
    # two ids with IDENTICAL fused score (same single-list rank):
    # the cut keeps the smaller id
    lex = _ranked(spark, [(7, 1)])
    auth = _ranked(spark, [(5, 1)])
    got = [
        r.doc_id
        for r in rrf_fuse({"lex": lex, "auth": auth}, top_k=1).collect()
    ]
    assert got == [5]


def test_rrf_rejects_empty(spark):
    with pytest.raises(ValueError):
        rrf_fuse({})


def test_rank_topn_orders_and_limits(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20)], "doc_id long, score long"
    )
    got = {
        r.doc_id: r.rank
        for r in rank_topn(
            df, [F.col("score").desc(), F.col("doc_id").asc()], 2
        ).collect()
    }
    assert got == {2: 1, 3: 2}


def _lp(spark, edges, seeds, iterations=2):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    s = spark.createDataFrame(seeds, "node long, label string")
    return {
        r.node: (r.label, r.round_assigned)
        for r in label_propagation(e, s, iterations=iterations).collect()
    }


def test_lp_majority_and_min_tie(spark):
    # node 10 has two 'x' neighbors and one 'y' -> majority x;
    # node 20 has one 'x' and one 'y' -> tie -> min label 'x';
    # node 30 touches only 'y' -> y
    edges = [(1, 10), (2, 10), (3, 10), (1, 20), (3, 20), (3, 30)]
    seeds = [(1, "x"), (2, "x"), (3, "y")]
    got = _lp(spark, edges, seeds, iterations=1)
    assert got[10] == ("x", 1)
    assert got[20] == ("x", 1)
    assert got[30] == ("y", 1)


def test_lp_seeds_are_clamped_and_rounds_cascade(spark):
    # chain seed(1,'x') - 2 - 3: round 1 labels 2, round 2 labels 3;
    # node 2's label never flips node 1
    edges = [(1, 2), (2, 3)]
    seeds = [(1, "x")]
    got = _lp(spark, edges, seeds, iterations=2)
    assert got == {1: ("x", 0), 2: ("x", 1), 3: ("x", 2)}
    # budget of 1 round leaves node 3 unlabeled
    got1 = _lp(spark, edges, seeds, iterations=1)
    assert 3 not in got1 and got1[2] == ("x", 1)


def test_lp_early_exit_when_saturated(spark):
    # everything labeled in round 1; a big budget adds nothing
    edges = [(1, 2)]
    seeds = [(1, "x")]
    got = _lp(spark, edges, seeds, iterations=10)
    assert got == {1: ("x", 0), 2: ("x", 1)}


def test_batching_waste_hand_computed(spark):
    # lengths by id order: 10, 100, 10, 100 ; batch_size 2
    # arrival: [10,100] + [10,100] -> padded 2*100 * 2 = 400
    # sorted:  [10,10] + [100,100] -> padded 2*10 + 2*100 = 220
    df = spark.createDataFrame(
        [(1, 10), (2, 100), (3, 10), (4, 100)], "doc_id long, ln long"
    )
    got = {
        r.policy: r
        for r in batching_waste(
            df, F.col("ln"), batch_size=2
        ).collect()
    }
    a, s = got["arrival"], got["sorted"]
    assert (a.n_batches, a.real_tokens, a.padded_tokens) == (2, 220, 400)
    assert (s.n_batches, s.real_tokens, s.padded_tokens) == (2, 220, 220)
    assert a.waste_ppm == (400 - 220) * 1_000_000 // 400
    assert s.waste_ppm == 0


def test_batching_sorted_never_worse_randomized(spark):
    import hashlib

    rows = [
        (i, int(hashlib.sha256(str(i).encode()).hexdigest()[:4], 16) % 500 + 1)
        for i in range(257)  # deliberately not a batch multiple
    ]
    df = spark.createDataFrame(rows, "doc_id long, ln long")
    got = {
        r.policy: r for r in batching_waste(df, F.col("ln"), batch_size=32).collect()
    }
    assert got["sorted"].real_tokens == got["arrival"].real_tokens
    assert got["sorted"].padded_tokens <= got["arrival"].padded_tokens
    # partial final batch accounted: 257 = 8*32 + 1 -> 9 batches
    assert got["sorted"].n_batches == 9


def test_batching_rejects_bad_batch_size(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, ln long")
    with pytest.raises(ValueError):
        batching_waste(df, F.col("ln"), batch_size=0)


def test_lp_duplicate_and_conflicting_seeds_resolve(spark):
    # review-finding regression: duplicate seed rows must not
    # double-count votes; conflicting labels for one node resolve to
    # the min label
    edges = [(1, 10), (2, 10)]
    seeds = [(1, "y"), (1, "y"), (2, "x")]  # dup rows for node 1
    got = _lp(spark, edges, seeds, iterations=1)
    # without dedup node 10 would see y twice and x once -> y;
    # deduped it is a 1-1 tie -> min label x
    assert got[10] == ("x", 1)
    # conflicting seed labels: min wins, one row out
    seeds2 = [(1, "z"), (1, "a")]
    got2 = _lp(spark, [(1, 2)], seeds2, iterations=1)
    assert got2[1] == ("a", 0) and got2[2] == ("a", 1)


def test_hits_rejects_zero_iterations(spark):
    from ocr_translation_spark.functions.graph import hits_scores

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    n = spark.createDataFrame([(1,), (2,)], "node long")
    with pytest.raises(ValueError):
        hits_scores(e, n, iterations=0)


def test_batching_out_of_range_length_raises(spark):
    # review-finding regression: lpad TRUNCATES overflowing keys (a
    # silent reorder); the in-plan guard must raise instead
    df = spark.createDataFrame(
        [(1, 10), (2, 2_000_000)], "doc_id long, ln long"
    )
    with pytest.raises(Exception, match="length out of"):
        batching_waste(df, F.col("ln"), batch_size=2).collect()
