"""Unit tests for greedy_set_cover (functions/cover.py) and
neighbor_feature_agg (functions/graph.py): hand-built instances with
known greedy traces (early stop, ties, duplicate items) and a
pure-Python mean-pooling mirror on random graphs."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from ocr_translation_spark.functions.cover import greedy_set_cover
from ocr_translation_spark.functions.graph import neighbor_feature_agg


def _sets(spark, d):
    return spark.createDataFrame(
        [(k, list(v)) for k, v in d.items()],
        "doc_id long, items array<string>",
    )


def _cover(spark, d, k=8):
    rows = greedy_set_cover(_sets(spark, d), k=k).collect()
    return [(r["round"], r.doc_id, r.newly_covered, r.covered_total)
            for r in sorted(rows)]


def test_cover_greedy_trace_and_early_stop(spark):
    got = _cover(
        spark,
        {1: "abcd", 2: "cde", 3: "ef", 4: "ab"},
        k=4,
    )
    # round 1: doc 1 (4 new); round 2: doc 3 (2 new: e, f);
    # round 3: best remaining gain is 0 -> stop (no padding rows)
    assert got == [(1, 1, 4, 4), (2, 3, 2, 6)]


def test_cover_tie_breaks_by_id(spark):
    got = _cover(spark, {9: "ab", 2: "cd", 5: "ef"}, k=1)
    assert got == [(1, 2, 2, 2)]


def test_cover_duplicate_items_count_once(spark):
    got = _cover(spark, {1: ["x", "x", "y"], 2: ["z", "z", "z"]}, k=2)
    assert got == [(1, 1, 2, 2), (2, 2, 1, 3)]


def test_cover_k_exceeds_corpus(spark):
    got = _cover(spark, {1: "ab", 2: "cd"}, k=10)
    assert [r[1] for r in got] == [1, 2]


def test_cover_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        greedy_set_cover(_sets(spark, {1: "a"}), k=0)


def test_cover_matches_python_greedy(spark):
    rng = random.Random(7)
    d = {
        i: {f"t{rng.randint(0, 60)}" for _ in range(rng.randint(1, 15))}
        for i in range(40)
    }
    got = _cover(spark, {k: sorted(v) for k, v in d.items()}, k=6)
    cov, expect, total = set(), [], 0
    remaining = dict(d)
    for rnd in range(1, 7):
        best = max(
            remaining.items(), key=lambda kv: (len(kv[1] - cov), -kv[0])
        )
        g = len(best[1] - cov)
        if g == 0:
            break
        cov |= best[1]
        total += g
        expect.append((rnd, best[0], g, total))
        del remaining[best[0]]
    assert got == expect


# ---------------------------------------------------------------------------


def _graph(spark, feats, edges):
    v = spark.createDataFrame(
        [(k, *v) for k, v in feats.items()],
        "id long, f1 long, f2 long",
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    return v, e


def _py_mean_agg(feats, edges, rounds):
    indeg = defaultdict(int)
    preds = defaultdict(list)
    for s, t in edges:
        indeg[t] += 1
        preds[t].append(s)
    cur = {k: list(v) for k, v in feats.items()}
    for _ in range(rounds):
        nxt = {}
        for v, f in cur.items():
            sums = list(f)
            for u in preds[v]:
                for j in range(len(f)):
                    sums[j] += cur[u][j]
            nxt[v] = [s // (1 + indeg[v]) for s in sums]
        cur = nxt
    return cur


def test_gnn_hand_graph_one_round(spark):
    feats = {1: (60, 6), 2: (30, 3), 3: (90, 9)}
    edges = [(1, 2), (3, 2), (2, 3)]
    v, e = _graph(spark, feats, edges)
    got = {
        r.id: (r.f1, r.f2)
        for r in neighbor_feature_agg(v, e, ["f1", "f2"], rounds=1).collect()
    }
    assert got == {
        1: (60, 6),  # isolated target: unchanged (indeg 0)
        2: ((30 + 60 + 90) // 3, (3 + 6 + 9) // 3),
        3: ((90 + 30) // 2, (9 + 3) // 2),
    }


def test_gnn_truncation_is_exact_div(spark):
    v, e = _graph(spark, {1: (7, 0), 2: (0, 0)}, [(1, 2)])
    got = {r.id: r.f1 for r in
           neighbor_feature_agg(v, e, ["f1", "f2"], rounds=1).collect()}
    assert got[2] == 3  # (0 + 7) div 2, truncated


def test_gnn_random_matches_python_mirror(spark):
    rng = random.Random(11)
    n = 25
    feats = {
        i: (rng.randint(0, 10**6), rng.randint(0, 10**6))
        for i in range(n)
    }
    edges = list({
        (rng.randrange(n), rng.randrange(n)) for _ in range(80)
    })
    edges = [(s, t) for s, t in edges if s != t]
    v, e = _graph(spark, feats, edges)
    got = {
        r.id: [r.f1, r.f2]
        for r in neighbor_feature_agg(v, e, ["f1", "f2"], rounds=2).collect()
    }
    assert got == _py_mean_agg(
        {k: list(v) for k, v in feats.items()}, edges, 2
    )


def test_gnn_validation(spark):
    v, e = _graph(spark, {1: (1, 1)}, [])
    with pytest.raises(ValueError):
        neighbor_feature_agg(v, e, ["f1"], rounds=0)
    with pytest.raises(ValueError):
        neighbor_feature_agg(v, e, [], rounds=1)


def test_cover_null_items_rows_never_crash(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, None)],
        "doc_id long, items array<string>",
    )
    got = [
        (r["round"], r.doc_id, r.newly_covered)
        for r in greedy_set_cover(df, k=3).collect()
    ]
    # doc 2's NULL items sort last (size -1) and stop the loop
    assert got == [(1, 1, 2)]


def test_gnn_dangling_src_does_not_deflate_mean(spark):
    # edge 2->1 where src 2 has no vertex row: no message arrives, so
    # it must not count in the divisor either
    v = spark.createDataFrame([(1, 100, 10)], "id long, f1 long, f2 long")
    e = spark.createDataFrame([(2, 1)], "src long, dst long")
    got = neighbor_feature_agg(v, e, ["f1", "f2"], rounds=2).collect()
    assert [(r.id, r.f1, r.f2) for r in got] == [(1, 100, 10)]
