"""k-core decomposition: hand-computed cores, the hub-with-leaves
motivation case, cascade peels, the convergence guard, and randomized
parity against a pure-Python peel."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from ocr_translation_spark.functions.graph import kcore_decomposition


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs],
        "id_a long, id_b long",
    )


def _run(spark, pairs, k, **kw):
    return {
        r["node"]: r["core_degree"]
        for r in kcore_decomposition(_edges(spark, pairs), k, **kw).collect()
    }


def _py_kcore(pairs, k):
    adj: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


TRIANGLE_TAIL = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]


def test_triangle_with_tail(spark):
    # the tail (4, 5) peels off; the triangle is the entire 2-core
    assert _run(spark, TRIANGLE_TAIL, 2) == {1: 2, 2: 2, 3: 2}
    assert _run(spark, TRIANGLE_TAIL, 3) == {}


def test_hub_with_leaves_has_no_two_core(spark):
    # the motivating case: degree-8 hub, yet no vertex survives k=2
    star = [(0, i) for i in range(1, 9)]
    assert _run(spark, star, 2) == {}
    assert _run(spark, star, 1) == {0: 8, **{i: 1 for i in range(1, 9)}}


def test_clique_survives_whole(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    assert _run(spark, k5, 4) == {i: 4 for i in range(5)}


def test_cascade_peel_chain(spark):
    # a path graph cascades end-inward: no 2-core at all
    chain = [(i, i + 1) for i in range(6)]
    assert _run(spark, chain, 2) == {}


def test_self_loops_and_duplicate_edges_ignored(spark):
    pairs = TRIANGLE_TAIL + [(1, 1), (2, 1), (1, 2)]
    assert _run(spark, pairs, 2) == {1: 2, 2: 2, 3: 2}


def test_k_below_one_raises(spark):
    with pytest.raises(ValueError, match=">= 1"):
        kcore_decomposition(_edges(spark, [(1, 2)]), 0)


def test_empty_edges(spark):
    assert _run(spark, [], 2) == {}


def test_convergence_guard_fires(spark):
    # the chain needs 3 peel rounds; one round must error loudly
    chain = [(i, i + 1) for i in range(6)]
    with pytest.raises(RuntimeError, match="converge"):
        kcore_decomposition(_edges(spark, chain), 2, max_iters=1)


def test_randomized_parity_with_python_peel(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(120)
        ]
        for k in (2, 3, 4):
            assert _run(spark, pairs, k) == _py_kcore(pairs, k), (
                f"trial {trial} k={k}"
            )
