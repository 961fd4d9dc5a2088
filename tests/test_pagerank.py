"""Unit tests for the fixed-iteration integer PageRank
(functions/graph.pagerank): hand-computed recurrences, dangling-mass
semantics, and determinism across partition counts."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from ocr_translation_spark.functions.graph import pagerank


def _run(spark, edge_list, node_list, iterations=3):
    edges = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edge_list]
    )
    nodes = spark.createDataFrame([Row(node=n) for n in node_list])
    return {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            edges, nodes, iterations=iterations
        ).collect()
    }


def test_two_node_cycle_is_stationary(spark):
    """A<->B is already the stationary distribution: every step maps
    1_000_000 -> 150_000 + 850_000 = 1_000_000."""
    ranks = _run(spark, [(1, 2), (2, 1)], [1, 2])
    assert ranks == {1: 1_000_000, 2: 1_000_000}


def test_chain_hand_computed(spark):
    """A->B, 2 iterations, dangling B drops its mass:
    r1(A)=150000, r1(B)=150000+850000*(1000000//1)//1e6=1000000;
    r2(A)=150000, r2(B)=150000+(850000*150000)//1e6=277500."""
    ranks = _run(spark, [(1, 2)], [1, 2], iterations=2)
    assert ranks == {1: 150_000, 2: 277_500}


def test_star_graph_center_accumulates(spark):
    """N spokes all linking to the center: center rank grows with
    in-degree, spokes fall to the no-inlink base."""
    spokes = list(range(1, 6))
    ranks = _run(spark, [(s, 0) for s in spokes], [0] + spokes)
    base = min(ranks.values())
    assert all(ranks[s] == base for s in spokes)
    assert ranks[0] > 5 * base


def test_out_degree_splits_contribution(spark):
    """u with out-degree 2 contributes r//2 to each target."""
    ranks = _run(spark, [(1, 2), (1, 3)], [1, 2, 3], iterations=1)
    expected = 150_000 + (850_000 * (1_000_000 // 2)) // 1_000_000
    assert ranks[2] == ranks[3] == expected
    assert ranks[1] == 150_000


def test_partition_count_invariance(spark):
    """Exact integer arithmetic => identical ranks regardless of the
    physical partitioning of edges and nodes."""
    edge_list = [(i, (i * 7 + 3) % 23) for i in range(23)]
    nodes = list(range(23))
    a = _run(spark, edge_list, nodes)
    edges = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edge_list]
    ).repartition(13)
    nd = spark.createDataFrame(
        [Row(node=n) for n in nodes]
    ).repartition(5)
    b = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edges, nd, iterations=3).collect()
    }
    assert a == b


def test_total_mass_bounded(spark):
    """Floor division only loses mass: total rank after any number of
    steps is bounded above by N * rank_scale."""
    edge_list = [(i, (i + 1) % 10) for i in range(10)]
    ranks = _run(spark, edge_list, list(range(10)))
    assert sum(ranks.values()) <= 10 * 1_000_000
    assert all(r >= 150_000 for r in ranks.values())


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def _run_ppr(spark, edge_list, node_list, seed_list, iterations=3):
    edges = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edge_list]
    )
    nodes = spark.createDataFrame([Row(node=n) for n in node_list])
    seeds = spark.createDataFrame([Row(node=n) for n in seed_list])
    return {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            edges, nodes, seeds=seeds, iterations=iterations
        ).collect()
    }


def _ppr_reference(edge_list, node_list, seed_list, iterations=3):
    from collections import defaultdict

    out = defaultdict(list)
    for s, d in edge_list:
        out[s].append(d)
    seeds = set(seed_list)
    r = {n: (1_000_000 if n in seeds else 0) for n in node_list}
    for _ in range(iterations):
        inbound = defaultdict(int)
        for u, ds in out.items():
            if u in r:
                c = r[u] // len(ds)
                for d in ds:
                    inbound[d] += c
        r = {
            n: (150_000 if n in seeds else 0)
            + (850_000 * inbound.get(n, 0)) // 1_000_000
            for n in node_list
        }
    return r


def test_ppr_unreachable_nodes_score_exactly_zero(spark):
    # seed 1 -> 2 -> 3 chain plus a disconnected 8 <-> 9 cycle: the
    # cycle gets NO restart mass and NO walk mass — exactly 0
    ranks = _run_ppr(
        spark, [(1, 2), (2, 3), (8, 9), (9, 8)], [1, 2, 3, 8, 9], [1]
    )
    assert ranks[8] == 0 and ranks[9] == 0
    assert ranks[1] > 0 and ranks[2] > 0 and ranks[3] > 0


def test_ppr_matches_pure_python_reference(spark):
    import hashlib

    n = 30
    edges = sorted(
        {
            (i, int(hashlib.sha256(f"{i}:{k}".encode()).hexdigest()[:8], 16) % n)
            for i in range(n)
            for k in (1, 2)
        }
        - {(i, i) for i in range(n)}
    )
    nodes = list(range(n))
    seeds = [0, 7, 14, 21, 28]
    assert _run_ppr(spark, edges, nodes, seeds) == _ppr_reference(
        edges, nodes, seeds
    )


def test_ppr_seed_proximity_ordering(spark):
    # 1 -> 2 -> 3: closer to the seed = more mass
    ranks = _run_ppr(spark, [(1, 2), (2, 3)], [1, 2, 3], [1])
    assert ranks[1] > ranks[2] > ranks[3] > 0


def test_ppr_duplicate_seed_rows_are_deduped(spark):
    edges = [(1, 2)]
    a = _run_ppr(spark, edges, [1, 2], [1])
    b = _run_ppr(spark, edges, [1, 2], [1, 1])
    assert a == b
