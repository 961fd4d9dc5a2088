"""k-truss decomposition: edge peeling by triangle support.

The k-truss (Cohen '08, "Trusses: cohesive subgraphs for social
network analysis") is the maximal subgraph in which EVERY EDGE closes
at least k-2 triangles within the subgraph. It is the edge-grained
sharpening of the k-core (graph.kcore_decomposition): a star hub
survives any degree screen but no 3-truss, because degree counts
neighbors while support counts neighbors that KNOW EACH OTHER. On
crawl/link graphs the k-truss isolates genuinely dense communities —
link farms, mutual-citation rings, template-interlinked site clusters
— that degree-based screens over-approximate.

PEELING WITH RECOUNT — the tenth iterative-graph discipline in this
repo: repeatedly delete every edge whose support in the CURRENT
subgraph is below k-2 until a fixpoint. Unlike the k-core (where a
vertex deletion decrements neighbor degrees by exactly one), an edge
deletion can destroy many triangles at once, so each round recounts
support from scratch via the degree-oriented wedge join — the same
Suri-Vassilvitskii shape as graph.triangle_counts:

  * rank every vertex by (degree, id) over the CURRENT edge set and
    orient each edge low->high — per-vertex out-degree is then
    O(sqrt(m)), so the wedge self-join cannot explode on hubs;
  * wedges = one self-equi-join of oriented edges on the source;
    triangles = wedges whose closure edge exists (one more
    equi-join); each triangle materializes exactly once;
  * per-edge support = the triangle list exploded back to its three
    canonical edges + one hash aggregate.

Every stage is an equi-join or hash aggregate on uniformly
distributed vertex/edge keys; the edge set only SHRINKS, so per-round
cost falls monotonically. Convergence is read off the round's one
job (the surviving-edge count, the connected_components convention);
the loop errors loudly after ``max_iters`` instead of returning an
unfinished peel. Superseded round caches are released; the fixpoint
result is eagerly localCheckpoint'ed so its blocks outlive the
finally-block unpersist.

Deterministic: the k-truss is a UNIQUE subgraph (union of all
subgraphs with min support >= k-2), a pure function of the edge set
— the DuckDB twin reproduces it by unrolling MORE peel rounds than
convergence needs (extra rounds are no-ops at the fixpoint) with a
naive id-oriented triangle enumeration, an independent formulation
of the same fixpoint.

Reference parity note: the reference has no graph plane; this
composes with the repo's derived link graphs the same way
kcore/triangle_counts do — the cohesion screen a crawl pipeline runs
before trusting anchor-text or PageRank mass from a suspiciously
dense neighborhood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _edge_support(e: DataFrame) -> DataFrame:
    """(u, v, support) for every canonical edge of ``e`` — triangle
    count within ``e`` — via the degree-oriented wedge join."""
    deg = (
        e.select(F.col("u").alias("vertex"))
        .unionAll(e.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    du = deg.select(F.col("vertex").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("vertex").alias("v"), F.col("degree").alias("dv"))
    a_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(a_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(a_first, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(a_first, F.col("dv")).otherwise(F.col("du")).alias(
                "rb_deg"
            ),
        )
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    rank_lt = (F.col("e1.rb_deg") < F.col("e2.rb_deg")) | (
        (F.col("e1.rb_deg") == F.col("e2.rb_deg"))
        & (F.col("e1.b") < F.col("e2.b"))
    )
    wedges = e1.join(
        e2, (F.col("e1.a") == F.col("e2.a")) & rank_lt
    ).select(
        F.col("e1.a").alias("x"),
        F.col("e1.b").alias("y"),
        F.col("e2.b").alias("z"),
    )
    closure = oriented.select(
        F.col("a").alias("y"), F.col("b").alias("z")
    )
    tris = wedges.join(closure, ["y", "z"])

    def _canon(p, q):
        return [F.least(p, q).alias("u"), F.greatest(p, q).alias("v")]

    tri_edges = (
        tris.select(*_canon(F.col("x"), F.col("y")))
        .unionAll(tris.select(*_canon(F.col("x"), F.col("z"))))
        .unionAll(tris.select(*_canon(F.col("y"), F.col("z"))))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("_sup"))
    )
    return e.join(tri_edges, ["u", "v"], "left").select(
        "u",
        "v",
        F.coalesce(F.col("_sup"), F.lit(0).cast("long")).alias(
            "support"
        ),
    )


def ktruss_edges(
    edges: DataFrame,
    k: int,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    """The k-truss of the undirected simple graph of ``edges``:
    (u, v, support) per surviving canonical edge, ``support`` = its
    triangle count WITHIN the truss (>= k-2 by definition).
    Self-loops drop; duplicate/reversed edges collapse. ``k >= 2``
    (the 2-truss keeps every edge and reports its support)."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    n_edges = cur.count()
    first = cur
    try:
        for it in range(max_iters):
            if n_edges == 0:
                return cur.select(
                    "u", "v", F.lit(0).cast("long").alias("support")
                ).localCheckpoint(eager=True)
            scored = _edge_support(cur)
            # eager localCheckpoint EVERY round: a support recount is
            # an ~8-operator subtree, so without truncation round r's
            # plan nests r of them and Catalyst re-optimization time
            # compounds (the HITS lesson, BENCH/PLANS.md Round-5j);
            # the checkpoint also materializes the round, so the
            # count below is a cached-scan job
            nxt = scored.filter(
                F.col("support") >= k - 2
            ).localCheckpoint(eager=True)
            n_next = nxt.count()
            if cur is not first:
                cur.unpersist()
            cur = nxt
            if n_next == n_edges or n_next == 0:
                # fixpoint: unchanged set (the support just computed
                # IS the support within the final subgraph) or the
                # empty truss, which is definitionally final — don't
                # spend a round of max_iters rediscovering emptiness
                return cur.select("u", "v", "support")
            n_edges = n_next
        raise RuntimeError(
            f"k-truss peel did not converge in {max_iters} rounds; "
            "raise max_iters (each round deletes at least one edge, "
            "so this only bounds adversarially long cascades)"
        )
    finally:
        if cur is not first:
            cur.unpersist()
        first.unpersist()
