"""OCR layout analysis: block/line segmentation + reading-order sort.

The north-star pipeline (BASELINE.json) describes stage A as "page/
block/line segmentation via connected-component + reading-order
sort". This module is that operator over OCR token bounding boxes:
given (doc_id, token_id, x0, x1, y0, y1) rows in ARBITRARY order
(OCR engines emit detection order, not reading order), emit each
token's block id, line id, and 1-based reading rank.

ALGORITHM — a simplified XY-cut (Nagy et al., the classic recursive
projection-profile segmentation), expressed as two 1-D interval
connected-component passes, which are exactly the gaps-and-islands
pattern and therefore pure window arithmetic on BOTH engines:

* blocks (columns): project every box of a page onto the x axis and
  merge overlapping/touching intervals. Sorted by (x0, token_id),
  interval i starts a new island iff x0_i > max(x1) of ALL previous
  intervals — a running max over the ROWS UNBOUNDED PRECEDING TO 1
  PRECEDING frame. The island id (running sum of start flags) IS the
  connected component of the x-interval overlap graph: transitive
  chains merge because the running max carries the furthest right
  edge seen so far. Ordering islands by x gives left-to-right column
  order for free.
* lines: the same pass on the y axis WITHIN each (doc, block).
* reading order: row_number over (block, line, x0, token_id) —
  left column top-to-bottom, then the next column.

Why islands and not a pairwise-overlap join: interval CC via
self-join explodes on dense pages (a 1000-token page has ~10^6
candidate pairs); the islands formulation is one sort + two window
functions per axis, O(n log n) per page, zero joins.

Scale shape: every window partitions by doc_id (or (doc_id, block)) —
uniform keys, per-page state bounded by page token count, so the
whole operator is 2-3 hash-partitioned window shuffles regardless of
corpus size; nothing is ever global.

Assumption (documented, standard for XY-cut): column gaps are wider
than intra-column word gaps on the x projection, and line gaps are
positive on the y projection within a column. Rotated/skewed pages
need a deskew upstream; that is a pixel-domain concern, not a
layout-sort one.

Reference parity note: the reference's OCR stage gets reading order
for free from tesseract's TSV ordering (``src/utils/ocr.js:13-17``);
a from-scratch distributed pipeline has to reconstruct it from box
geometry, which is this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _island_id(partition_cols, lo: str, hi: str, tie: str):
    """1-based gaps-and-islands id over [lo, hi] intervals: a new
    island starts where lo exceeds the running max of every previous
    interval's hi (strictly — touching intervals merge)."""
    order = [F.col(lo).asc(), F.col(tie).asc()]
    prev = Window.partitionBy(*partition_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = Window.partitionBy(*partition_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cm = F.max(F.col(hi)).over(prev)
    starts = F.when(cm.isNull() | (F.col(lo) > cm), 1).otherwise(0)
    return F.sum(starts).over(run)


def reading_order(
    boxes: DataFrame,
    doc: str = "doc_id",
    tok: str = "token_id",
    x0: str = "x0",
    x1: str = "x1",
    y0: str = "y0",
    y1: str = "y1",
) -> DataFrame:
    """(doc, tok, block_id, line_id, reading_rank) for every input
    box; block_id / line_id are 1-based in left-to-right /
    top-to-bottom order, reading_rank is the 1-based page-global
    reading position (blocks left-to-right, lines top-to-bottom,
    words left-to-right). Deterministic: ties broken by token id."""
    blocks = boxes.withColumn(
        "block_id", _island_id([doc], x0, x1, tok).cast("long")
    )
    lines = blocks.withColumn(
        "line_id", _island_id([doc, "block_id"], y0, y1, tok).cast("long")
    )
    rank_w = Window.partitionBy(doc).orderBy(
        F.col("block_id").asc(),
        F.col("line_id").asc(),
        F.col(x0).asc(),
        F.col(tok).asc(),
    )
    return lines.select(
        doc,
        tok,
        "block_id",
        "line_id",
        F.row_number().over(rank_w).cast("long").alias("reading_rank"),
    )
