"""DAG longest-path layering: hand graphs, cycles, random DP parity."""

from __future__ import annotations

import random

import pytest

from ocr_translation_spark.functions.dag import (
    layer_histogram,
    longest_path_layers,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def _layers(df):
    return {r["node"]: r["layer"] for r in df.collect()}


def _mirror(pairs, node_ids):
    """Longest-path-ending-at DP over a topological order."""
    from collections import defaultdict

    preds = defaultdict(list)
    for u, v in pairs:
        preds[v].append(u)
    memo = {}

    def depth(v):
        if v not in memo:
            memo[v] = (
                1 + max(depth(u) for u in preds[v]) if preds[v] else 0
            )
        return memo[v]

    return {v: depth(v) for v in node_ids}


def test_chain_and_diamond(spark):
    # 1->2->3 chain plus diamond 1->4, 4->3: layer(3) = max path = 2
    pairs = [(1, 2), (2, 3), (1, 4), (4, 3)]
    got = _layers(longest_path_layers(_edges(spark, pairs)))
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}


def test_isolated_nodes_layer_zero(spark):
    got = _layers(
        longest_path_layers(
            _edges(spark, [(1, 2)]),
            nodes=_nodes(spark, [1, 2, 7, 9]),
        )
    )
    assert got == {1: 0, 2: 1, 7: 0, 9: 0}


def test_empty_edges_all_isolated(spark):
    got = _layers(
        longest_path_layers(
            _edges(spark, []), nodes=_nodes(spark, [3, 5])
        )
    )
    assert got == {3: 0, 5: 0}


def test_cycle_detected_as_nonconvergence(spark):
    with pytest.raises(RuntimeError, match="not converged"):
        longest_path_layers(
            _edges(spark, [(1, 2), (2, 3), (3, 1)]), max_iters=6
        )


def test_random_dag_dp_parity(spark):
    rng = random.Random(7)
    n = 60
    pairs = sorted(
        {
            (u, rng.randrange(u + 1, n))
            for u in range(n - 1)
            for _ in range(2)
            if u + 1 < n
        }
    )
    got = _layers(
        longest_path_layers(
            _edges(spark, pairs), nodes=_nodes(spark, range(n))
        )
    )
    assert got == _mirror(pairs, range(n))


def test_layer_histogram_rollup(spark):
    layers = longest_path_layers(
        _edges(spark, [(1, 2), (2, 3), (5, 3)])
    )
    hist = {
        r["layer"]: (r["n_nodes"], r["min_node"], r["max_node"])
        for r in layer_histogram(layers).collect()
    }
    assert hist == {0: (2, 1, 5), 1: (1, 2, 2), 2: (1, 3, 3)}
