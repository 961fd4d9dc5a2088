"""Boruvka minimum spanning forest (functions/mst.py) vs a pure-Python
Kruskal mirror with the same (w, u, v) total order."""

from __future__ import annotations

import random

import pytest

from ocr_translation_spark.functions.mst import minimum_spanning_forest


def _kruskal(edges):
    """Independent mirror: sort by (w, u, v), union-find."""
    norm = sorted(
        {(w, min(u, v), max(u, v)) for u, v, w in edges if u != v}
    )
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, u, v in norm:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long, w long")
    rows = minimum_spanning_forest(df).collect()
    return {(r["u"], r["v"], r["w"]) for r in rows}


def test_single_cycle_drops_heaviest(spark):
    edges = [(1, 2, 10), (2, 3, 20), (3, 1, 30)]
    assert _run(spark, edges) == {(1, 2, 10), (2, 3, 20)}


def test_tie_break_is_lexicographic(spark):
    # triangle with equal weights: (w, u, v) order keeps (1,2) and
    # (1,3), drops (2,3) — exactly what tie-broken Kruskal does
    edges = [(2, 3, 5), (1, 3, 5), (1, 2, 5)]
    assert _run(spark, edges) == _kruskal(edges) == {
        (1, 2, 5),
        (1, 3, 5),
    }


def test_disconnected_forest_and_parallel_edges(spark):
    edges = [
        (1, 2, 4),
        (2, 1, 7),  # parallel (reversed) heavier: never chosen
        (2, 3, 1),
        (5, 6, 2),
        (6, 7, 9),
        (7, 5, 3),
        (8, 8, 1),  # self-loop: dropped
    ]
    got = _run(spark, edges)
    assert got == _kruskal(edges)
    assert (1, 2, 4) in got and (5, 6, 2) in got
    assert (6, 7, 9) not in got  # heaviest on the 5-6-7 cycle


def test_empty_edges(spark):
    df = spark.createDataFrame([], "u long, v long, w long")
    assert minimum_spanning_forest(df).count() == 0


@pytest.mark.parametrize("seed", [3, 17])
def test_randomized_graphs_match_kruskal(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = []
    for _ in range(120):
        u, v = rng.randrange(n), rng.randrange(n)
        edges.append((u, v, rng.randrange(1, 12)))  # many weight ties
    assert _run(spark, edges) == _kruskal(edges)


def test_partition_invariance(spark):
    rng = random.Random(5)
    edges = [
        (rng.randrange(30), rng.randrange(30), rng.randrange(1, 9))
        for _ in range(80)
    ]
    df = spark.createDataFrame(edges, "u long, v long, w long")
    a = {
        tuple(r)
        for r in minimum_spanning_forest(df).collect()
    }
    b = {
        tuple(r)
        for r in minimum_spanning_forest(df.repartition(7)).collect()
    }
    assert a == b == _kruskal(edges)


def test_chain_converges_within_log_rounds(spark):
    # path graph of 64 vertices: every edge is in the forest; Boruvka
    # contracts a path in <= log2(64) rounds — well inside the bound
    edges = [(i, i + 1, 100 - i) for i in range(63)]
    got = _run(spark, edges)
    assert got == _kruskal(edges)
    assert len(got) == 63
