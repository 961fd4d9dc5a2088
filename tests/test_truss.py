"""k-truss edge peeling (functions/truss.py): pure-Python peel
parity, multi-round cascades, degenerate inputs, bounded iterations."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pytest

from ocr_translation_spark.functions.truss import ktruss_edges


def _ktruss_py(edges, k):
    """Reference peel: recount support, drop < k-2, repeat."""
    cur = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for u, v in cur:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v]) for u, v in cur
        }
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return {e: sup[e] for e in cur}
        cur = nxt


def _run(spark, edges, k, **kw):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    return {
        (r["u"], r["v"]): r["support"]
        for r in ktruss_edges(df, k, **kw).collect()
    }


K5_CHAIN = list(combinations(range(5), 2)) + [
    (4, 5), (5, 6), (6, 7), (4, 6), (5, 7)
]


def test_clique_survives_chain_cascades_out(spark):
    # k=4: the overlapping-triangle chain needs TWO peel rounds —
    # (5,6) starts at support 2 and only drops after round 1 removes
    # its skip-edge neighbors
    got = _run(spark, K5_CHAIN, 4)
    assert got == {e: 3 for e in combinations(range(5), 2)}
    assert got == _ktruss_py(K5_CHAIN, 4)


def test_k3_keeps_every_triangle_edge(spark):
    got = _run(spark, K5_CHAIN, 3)
    assert got == _ktruss_py(K5_CHAIN, 3)
    assert len(got) == 15  # every edge closes >= 1 triangle


def test_k2_reports_support_without_peeling(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]  # (2,3) has support 0
    got = _run(spark, edges, 2)
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1, (2, 3): 0}


def test_matches_python_peel_on_hash_graph(spark):
    # deterministic pseudo-random graph, dense enough for 4/5-trusses
    def h(i, j):
        return int(
            hashlib.sha256(f"{i}:{j}".encode()).hexdigest()[:4], 16
        )

    edges = [
        (i, j)
        for i in range(24)
        for j in range(i + 1, 24)
        if h(i, j) % 4 == 0
    ]
    for k in (3, 4, 5):
        assert _run(spark, edges, k) == _ktruss_py(edges, k), k


def test_duplicates_reversals_and_self_loops_collapse(spark):
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (3, 3)]
    got = _run(spark, edges, 3)
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1}


def test_empty_graph(spark):
    got = _run(spark, [(7, 7)], 3)  # only a self-loop -> empty
    assert got == {}


def test_unconverged_peel_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(spark, K5_CHAIN, 4, max_iters=1)


def test_k_validation(spark):
    with pytest.raises(ValueError):
        ktruss_edges(None, 1)


def test_peel_to_empty_is_a_fixpoint_not_a_timeout(spark):
    # a single triangle at k=5 empties in round 1; max_iters=1 must
    # return the empty truss, not raise (review regression)
    got = _run(spark, [(0, 1), (1, 2), (2, 0)], 5, max_iters=1)
    assert got == {}
