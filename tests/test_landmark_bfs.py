"""Units for composite-state landmark BFS + harmonic centrality."""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from ocr_translation_spark.functions.graph import (
    harmonic_centrality,
    landmark_bfs,
)


def _py_landmark_bfs(edges, landmarks, max_hops):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for lm in landmarks:
        dist = {lm: 0}
        dq = deque([lm])
        while dq:
            u = dq.popleft()
            if dist[u] == max_hops:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for node, d in dist.items():
            out[(node, lm)] = d
    return out


def _py_harmonic(edges, landmarks, max_hops):
    d = _py_landmark_bfs(edges, landmarks, max_hops)
    out = {}
    for (node, _), dist in d.items():
        if dist > 0:
            ppm, n = out.get(node, (0, 0))
            out[node] = (ppm + 1_000_000 // dist, n + 1)
    return out


def _dfs(spark, edges, landmarks):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    lm = spark.createDataFrame([(x,) for x in landmarks], "landmark long")
    return e, lm


def test_per_landmark_distances_on_a_chain(spark):
    # 0-1-2-3-4 chain, landmarks at both ends: each node keeps BOTH
    # distances (bfs_distances would collapse to the min)
    edges = [(i, i + 1) for i in range(4)]
    e, lm = _dfs(spark, edges, [0, 4])
    got = {
        (r["node"], r["landmark"]): r["dist"]
        for r in landmark_bfs(e, lm, max_hops=4).collect()
    }
    assert got == _py_landmark_bfs(edges, [0, 4], 4)
    assert got[(2, 0)] == 2 and got[(2, 4)] == 2
    assert got[(1, 0)] == 1 and got[(1, 4)] == 3


def test_hop_budget_bounds_state(spark):
    edges = [(i, i + 1) for i in range(6)]
    e, lm = _dfs(spark, edges, [0])
    got = landmark_bfs(e, lm, max_hops=2).collect()
    assert {(r["node"], r["dist"]) for r in got} == {
        (0, 0), (1, 1), (2, 2),
    }


def test_matches_python_on_random_graph(spark):
    # deterministic pseudo-random graph, 3 landmarks
    state, edges = 99991, []
    for _ in range(120):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % 40
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % 40
        if a != b:
            edges.append((a, b))
    lms = [0, 7, 23]
    e, lm = _dfs(spark, edges, lms)
    got = {
        (r["node"], r["landmark"]): r["dist"]
        for r in landmark_bfs(e, lm, max_hops=3).collect()
    }
    assert got == _py_landmark_bfs(edges, lms, 3)


def test_harmonic_centrality_exact_ppm(spark):
    # star: center 0 linked to 1..4; landmarks {1, 2}
    edges = [(0, i) for i in range(1, 5)]
    e, lm = _dfs(spark, edges, [1, 2])
    got = {
        r["node"]: (r["harmonic_ppm"], r["n_reached"])
        for r in harmonic_centrality(e, lm, max_hops=3).collect()
    }
    assert got == _py_harmonic(edges, [1, 2], 3)
    # center: dist 1 from both landmarks -> 2e6 ppm; leaves: dist 2
    # from the other landmark (+ 0 from self, excluded)
    assert got[0] == (2_000_000, 2)
    assert got[1] == (500_000, 1)  # only landmark 2 at dist 2
    assert got[3] == (1_000_000, 2)  # dist 2 from each: 2 * 500000


def test_landmark_self_row_excluded_but_cross_landmark_counted(spark):
    edges = [(0, 1)]
    e, lm = _dfs(spark, edges, [0, 1])
    got = {
        r["node"]: (r["harmonic_ppm"], r["n_reached"])
        for r in harmonic_centrality(e, lm, max_hops=3).collect()
    }
    # each landmark reached by the OTHER at dist 1; self dist 0 dropped
    assert got == {0: (1_000_000, 1), 1: (1_000_000, 1)}
