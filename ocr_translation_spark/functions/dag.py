"""DAG longest-path layering: topological levels for dependency DAGs.

Build-system scheduling, lineage-graph staging, and derivation-depth
audits all need "which LEVEL does each node sit at", where
``layer(v) = 0`` for sources and ``layer(v) = 1 + max(layer(u))`` over
in-neighbors ``u -> v`` — the longest path ending at ``v``. Level k
is exactly the set of nodes a level-synchronous scheduler can run in
round k once rounds 0..k-1 finished.

Algorithm: synchronous relaxation to the greatest fixed point — the
ninth iterative-graph discipline in this repo, sharing the
connected-components resource contract (graph.connected_components):

* each round is ONE join (labels to edges) + ONE groupBy-max, both
  shuffles on uniformly distributed node ids;
* the node's own previous layer rides the aggregate as ``old`` (one
  non-null per node), so convergence is read off the same aggregate —
  one job per round, no second labels-to-labels join;
* rounds needed = longest path length (the relaxation strictly grows
  some label until the fixed point); ``max_iters`` bounds cyclic or
  adversarially deep inputs, ERRORING OUT rather than silently
  returning unconverged layers — on a cycle the max-relaxation never
  converges, so the bound doubles as a cycle detector;
* per-round persist + unpersist of the previous round, periodic
  ``localCheckpoint`` so round k's plan does not replay rounds 1..k-1.

Deterministic: max() over integers — a pure function of the edge set,
so the DuckDB recursive-CTE twin (enumerate all paths, take the max
length per terminal node) reproduces it bit-for-bit; path enumeration
is the INDEPENDENT formulation, feasible on oracle-scale graphs while
the relaxation never materializes paths at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CHECKPOINT_EVERY = 4


def longest_path_layers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iters: int = 40,
) -> DataFrame:
    """(node, layer) with layer = longest directed path ending at the
    node, for an ACYCLIC ``edges`` relation (a cycle is detected as
    non-convergence and raises). ``nodes`` optionally supplies
    isolated vertices (returned at layer 0); otherwise the vertex set
    is the ids appearing in ``edges``."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()  # read EVERY round — never replay edge derivation
    )
    verts = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)  # materializes e as a side effect
    )
    labels = verts.select(
        "node", F.lit(0).cast("long").alias("layer")
    ).persist()
    n_edge_verts = labels.count()  # materialize round 0

    def _with_isolated(out: DataFrame) -> DataFrame:
        if nodes is None:
            return out
        iso = (
            nodes.select(F.col(node_col).alias("node"))
            .join(verts, "node", "left_anti")
            .select("node", F.lit(0).cast("long").alias("layer"))
        )
        return out.unionByName(iso)

    if n_edge_verts == 0:
        e.unpersist()
        labels.unpersist()
        return _with_isolated(
            verts.select("node", F.lit(0).cast("long").alias("layer"))
        )

    # ZERO-INCREMENT SELF-LOOPS make each relaxation round a
    # single-reference plan: layer(v) = max(layer(v) + 0, layer(u) + 1
    # over in-edges) is one join + one max-aggregate with the labels
    # frame referenced ONCE — the old union-retention branch
    # referenced it twice, forcing an eager persist + count EVERY
    # round. Single-reference rounds chain lazily, so `unroll` rounds
    # share one checkpoint + one convergence job: layers are
    # monotone non-decreasing, so an unchanged sum(layer) across a
    # block proves no round in it grew anything (the first round was
    # already the fixed point; extra rounds past it are exact
    # no-ops). A cycle still grows some layer every block and hits
    # max_iters — the error contract is unchanged.
    ew = (
        e.select("u", "v", F.lit(1).cast("long").alias("w"))
        .unionByName(
            verts.select(
                F.col("node").alias("u"),
                F.col("node").alias("v"),
                F.lit(0).cast("long").alias("w"),
            )
        )
        # pre-partition on the join key: every round joins on u, so
        # the cached layout satisfies the join's distribution
        # requirement round after round
        .repartition("u")
        .persist()
    )
    unroll = 4
    rounds = 0
    prev_sum = 0  # all layers start at 0
    try:
        while rounds < max_iters:
            new = labels
            for _ in range(min(unroll, max_iters - rounds)):
                new = (
                    new.select(F.col("node").alias("u"), "layer")
                    .join(ew, "u")
                    .select(
                        F.col("v").alias("node"),
                        (F.col("layer") + F.col("w")).alias("layer"),
                    )
                    .groupBy("node")
                    .agg(F.max("layer").alias("layer"))
                )
                rounds += 1
            new = new.localCheckpoint(eager=False).persist()
            cur_sum = new.agg(
                F.coalesce(F.sum("layer"), F.lit(0)).alias("s")
            ).collect()[0]["s"]
            labels.unpersist()
            labels = new
            if cur_sum == prev_sum:
                return _with_isolated(
                    labels.select("node", "layer").localCheckpoint(
                        eager=True
                    )
                )
            prev_sum = cur_sum
        raise RuntimeError(
            f"longest_path_layers: not converged after {max_iters} "
            "rounds — cyclic input or a longer-than-expected critical "
            "path; verify acyclicity or raise max_iters"
        )
    finally:
        labels.unpersist()
        ew.unpersist()
        e.unpersist()


def layer_histogram(layers: DataFrame) -> DataFrame:
    """Stable O(depth) rollup of a (node, layer) labeling: one row per
    layer with n_nodes, min_node, max_node — the scheduler's
    wave-width profile."""
    return layers.groupBy("layer").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )
