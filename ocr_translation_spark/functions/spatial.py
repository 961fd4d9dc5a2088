"""Grid-bucketed spatial join: points x rectangular zones.

Joining a corpus of points (lat/lon of events, tile coordinates of
image crops, layout boxes of OCR spans) to a table of rectangular
zones (geofences, tiles, page regions) is a containment theta-join —
``x BETWEEN x0 AND x1 AND y BETWEEN y0 AND y1`` — which Spark can
only execute as a broadcast-nested-loop: O(|points| x |zones|)
comparisons, the classic spatial-join scale-killer.

The scalable form (the approach GeoSpark/Sedona and every spatial
warehouse use) turns containment into an EQUI-join on a grid cell:

  * each zone explodes to the grid cells its rectangle covers — a
    bounded fan-out of O(area / cell^2) rows on the dimension side;
  * each point maps to exactly ONE cell (its coordinates truncated
    by ``cell_bits``);
  * a hash equi-join on (cx, cy) followed by the EXACT containment
    predicate yields precisely the contained pairs.

Because a point owns a single cell, a (point, zone) pair can meet in
at most one cell — no post-join dedup is needed (the dedup a corner-
overlap scheme would force). Both sides hash-partition on the cell
key, so the join runs shuffle-co-located at any scale; with a
dimension-sized zone table Spark broadcasts the exploded cells and
the whole join is one codegen stage. A point contained in k zones
emits k rows — spatial-join semantics, unlike the LPM join
(`iplpm.py`) which resolves to the single most specific match.

The DuckDB twin runs the raw containment theta-join — the
formulation this operator exists to avoid — so the oracle proves the
grid decomposition loses and invents nothing.

Reference parity note: the reference has no spatial surface (its
bounding boxes die inside tesseract, `src/utils/ocr.js`); this is
training-data/log-pipeline breadth beyond parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grid_point_in_rect_join(
    points: DataFrame,
    zones: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    cell_bits: int = 8,
    how: str = "inner",
) -> DataFrame:
    """All (point, zone) pairs with the point inside the rectangle.

    ``zones`` must carry integer ``x0 <= x1`` and ``y0 <= y1``
    (inclusive bounds); ``points`` integer coordinates. Cells are
    ``2^cell_bits`` wide — pick it so a typical zone covers O(1..100)
    cells; the fan-out is (width/cell + 1) * (height/cell + 1) rows
    per zone. Points with NULL coordinates match nothing.

    ``how="left"`` keeps unmatched points with NULL zone columns in
    ONE pass — the containment predicate lives in the join condition
    (Spark still extracts the (cx, cy) equi-keys for the hash join),
    so unmatched accounting never needs a second scan + anti-join
    over the corpus.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left': {how!r}")
    if cell_bits < 0:
        raise ValueError(f"cell_bits must be >= 0: {cell_bits}")
    px, py = F.col(x_col), F.col(y_col)
    # step pinned to +1 so an inverted rectangle (x0 > x1) fails
    # loudly at runtime instead of silently enumerating a DESCENDING
    # cell sequence and joining the wrong cells
    one = F.lit(1)
    zcells = zones.select(
        "*",
        F.explode(
            F.sequence(
                F.shiftright(F.col("x0"), cell_bits),
                F.shiftright(F.col("x1"), cell_bits),
                one,
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.shiftright(F.col("y0"), cell_bits),
                F.shiftright(F.col("y1"), cell_bits),
                one,
            )
        ).alias("cy"),
    )
    pcells = points.withColumns(
        {
            "_pcx": F.shiftright(px, cell_bits),
            "_pcy": F.shiftright(py, cell_bits),
        }
    )
    cond = (
        (F.col("_pcx") == zcells["cx"])
        & (F.col("_pcy") == zcells["cy"])
        & px.between(zcells["x0"], zcells["x1"])
        & py.between(zcells["y0"], zcells["y1"])
    )
    return (
        pcells.join(zcells, cond, how)
        .drop("_pcx", "_pcy", "cx", "cy")
    )


def grid_density_clusters(
    points: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_bits: int = 6,
    min_pts_expr=None,
    grid_cells: int = 4096,
) -> DataFrame:
    """Grid-DBSCAN: density clusters as connected components of CORE
    grid cells (cells holding >= min_pts points), 8-adjacency.

    The deterministic grid variant of DBSCAN (GriDBSCAN / the
    cell-based preclustering every distributed DBSCAN implementation
    uses): instead of per-point epsilon balls — a theta self-join —
    points collapse to their (x >> cell_bits, y >> cell_bits) cell,
    density is a per-cell count, and clusters are connected components
    over the 8-neighborhood of core cells. Every step is an equi-key
    operation: one groupBy for the counts, a bounded x9 neighbor-key
    explode on the (tiny) core-cell set for adjacency, and the repo's
    CC loop over a graph whose size is the number of DENSE cells, not
    points — at 10^12 points the cell table is bounded by the grid,
    so the clustering cost is independent of corpus size after the
    first aggregate.

    ``min_pts_expr``: a Column giving the core threshold (e.g. a
    multiple of the mean density computed in-plan); defaults to
    ``greatest(8, 4 * total_points / grid_cells)`` — four times the
    mean cell density, floored at 8 so uniform noise at tiny scale
    does not promote every occupied cell.

    Returns one row per cluster: (cluster_id = min packed core-cell
    id, n_cells, n_points = points in the cluster's core cells,
    min_cx, max_cx, min_cy, max_cy) plus ONE noise-accounting row
    (cluster_id = -1, n_cells = count of non-core occupied cells,
    n_points = points outside all core cells, bbox NULLs) — dropped
    rows are never silent (repo convention).

    Iterative (CC loop) — executes when called; callers that re-invoke
    on one source should memoize via _lsh_common.prepared().
    """
    from .graph import connected_components

    # packing stride for (cx, cy) -> cell id: neighbor keys reach
    # cy - 1 and cy + 1, so the stride must exceed the cy domain by
    # > 1 on each side or a wrapped key would alias a REAL adjacent
    # cell ((cx, -1) == (cx - 1, stride - 1)). The domain itself is
    # guarded IN-PLAN (the suffix_classes packing convention): points
    # must be non-negative with cy < stride - 1, i.e. coordinates in
    # [0, (stride - 2) << cell_bits] — out-of-domain input raises
    # loudly instead of silently merging far-apart cells.
    side = 1 << cell_bits
    stride = F.lit(side * 4)
    cy_max = side * 4 - 2
    bad = (
        (F.col(x) < 0)
        | (F.col(y) < 0)
        | (F.shiftright(F.col(y).cast("long"), cell_bits) > cy_max)
    )
    cells = (
        points.select(
            F.when(
                bad,
                F.raise_error(
                    F.lit(
                        "grid_density_clusters: point outside the "
                        "packable domain (negative, or y cell > "
                        f"{cy_max}); raise cell_bits"
                    )
                ).cast("long"),
            )
            .otherwise(
                F.shiftright(F.col(x).cast("long"), cell_bits)
            )
            .alias("cx"),
            F.shiftright(F.col(y).cast("long"), cell_bits).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_pts_expr is None:
        total = points.select(
            F.count(F.lit(1)).alias("_total")
        )
        cells = cells.crossJoin(F.broadcast(total))
        # integer div, not a double cast: DuckDB's double->int cast
        # ROUNDS while Spark's truncates (the corr_features lesson)
        min_pts_expr = F.greatest(
            F.lit(8).cast("long"),
            F.expr(f"4 * _total div {grid_cells}"),
        )
    cells = cells.withColumn("_thr", min_pts_expr).localCheckpoint(
        eager=True
    )

    core = cells.where(F.col("n") >= F.col("_thr")).select(
        "cx",
        "cy",
        "n",
        (F.col("cx") * stride + F.col("cy")).alias("cid"),
    )

    # 8-adjacency as an equi-join: each core cell claims its 9
    # neighbor keys; an edge exists when a claimed key IS a core cell
    neigh = core.select(
        "cid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + F.lit(dx)).alias("nx"),
                        (F.col("cy") + F.lit(dy)).alias("ny"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                    if (dx, dy) != (0, 0)
                ]
            )
        ).alias("nb"),
    ).select(
        "cid", (F.col("nb.nx") * stride + F.col("nb.ny")).alias("nid")
    )
    edges = neigh.join(
        core.select(F.col("cid").alias("nid")), "nid"
    ).select("cid", "nid")

    cc = connected_components(
        edges, src="cid", dst="nid", nodes=core, node_col="cid"
    )
    clusters = (
        core.join(cc.withColumnRenamed("node", "cid"), "cid")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").alias("n_points"),
            F.min("cx").alias("min_cx"),
            F.max("cx").alias("max_cx"),
            F.min("cy").alias("min_cy"),
            F.max("cy").alias("max_cy"),
        )
    )
    noise = cells.where(F.col("n") < F.col("_thr")).agg(
        F.lit(-1).cast("long").alias("cluster_id"),
        F.count(F.lit(1)).alias("n_cells"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_points"),
        F.lit(None).cast("long").alias("min_cx"),
        F.lit(None).cast("long").alias("max_cx"),
        F.lit(None).cast("long").alias("min_cy"),
        F.lit(None).cast("long").alias("max_cy"),
    )
    return clusters.unionByName(noise).select(
        "cluster_id",
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("n_points").cast("long").alias("n_points"),
        "min_cx",
        "max_cx",
        "min_cy",
        "max_cy",
    )
