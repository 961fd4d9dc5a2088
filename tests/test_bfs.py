"""Units for multi-source BFS hop distances (frontier expansion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translation_spark.functions.graph import bfs_distances


def _run(spark, edges, seeds, max_hops=4):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {
        r.node: r.dist
        for r in bfs_distances(e, s, max_hops=max_hops).collect()
    }


def test_bfs_chain_distances(spark):
    # 0-1-2-3-4-5 chain, seed {0}: dist = index, budget cuts at 4
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, edges, [0], max_hops=4)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # 5 is beyond budget


def test_bfs_is_undirected_and_min_over_paths(spark):
    # edges only stored one way; triangle gives two routes to node 2:
    # 0->1->2 (2 hops) and 0->2 (1 hop) — min wins
    edges = [(1, 0), (1, 2), (0, 2)]
    got = _run(spark, edges, [0])
    assert got == {0: 0, 1: 1, 2: 1}


def test_bfs_multi_source_claims_nearest_seed(spark):
    # chain 0-1-2-3-4, seeds at both ends: middle node is 2 from either
    edges = [(i, i + 1) for i in range(4)]
    got = _run(spark, edges, [0, 4])
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_unreachable_nodes_are_absent(spark):
    # two components; seed in one — the other never appears
    edges = [(0, 1), (10, 11)]
    got = _run(spark, edges, [0])
    assert got == {0: 0, 1: 1}


def test_bfs_early_exit_on_exhausted_component(spark):
    # component explored in 1 hop; a huge budget must not add rounds
    # (observable: result identical and still correct)
    edges = [(0, 1), (0, 2)]
    got = _run(spark, edges, [0], max_hops=50)
    assert got == {0: 0, 1: 1, 2: 1}


def test_bfs_seed_not_in_graph_is_singleton(spark):
    edges = [(0, 1)]
    got = _run(spark, edges, [99])
    assert got == {99: 0}


def test_bfs_matches_pure_python_reference(spark):
    # deterministic pseudo-random graph vs a textbook BFS
    import collections
    import hashlib

    n = 60
    edges = []
    for i in range(n):
        for k in (1, 2):
            h = int(
                hashlib.sha256(f"{i}:{k}".encode()).hexdigest()[:8], 16
            )
            j = h % n
            if j != i:
                edges.append((i, j))
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = [i for i in range(n) if i % 17 == 0]
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for hop in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    got = _run(spark, edges, seeds, max_hops=3)
    assert got == dist
