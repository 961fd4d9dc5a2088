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
