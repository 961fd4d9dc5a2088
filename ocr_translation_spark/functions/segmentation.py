"""Lexical-cohesion topic segmentation (TextTiling-style).

Long crawled documents routinely concatenate unrelated topics
(boilerplate, forum threads, wiki sections); chunking them on topic
boundaries instead of fixed windows is a standard curation step. The
classic unsupervised signal is LEXICAL COHESION (Hearst, CL'97
TextTiling): slide a gap across the token stream, score each gap by
the vocabulary overlap of the w tokens before vs after, and place
boundaries at gaps whose similarity sits in a deep valley between
flanking peaks.

This implementation keeps Hearst's block-comparison + depth scoring
in EXACT integers and simplifies the peak search to prefix/suffix
running maxima (the deepest-valley form: depth(g) =
(max sim left of g) + (max sim right of g) - 2 sim(g); Hearst's
hill-climb finds the NEAREST peaks — the running-max form is
monotone-equivalent for single-valley documents and deterministic
everywhere, and is what the twin can mirror exactly):

* sim(g) = |distinct(tokens[g-w+1 .. g]) ∩ distinct(tokens[g+1 .. g+w])|
  — an integer, no cosine floats;
* boundary where depth(g) >= threshold, reported with its scores.

Shape: gaps are EXPLODED row-locally (the explode's child projection
materializes the token array once per document — computing sims via
nested array lambdas instead would re-inline the tokenization per
gap, the word_cooccurrence lesson), the per-gap slice intersection is
whole-stage codegen, and the prefix/suffix maxima are ONE doc-keyed
window shuffle (uniform keys, per-doc state = gap count). Total: 1
shuffle, like the reading-order operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def texttiling_boundaries(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    depth_threshold: int = 4,
) -> DataFrame:
    """(id, pos, sim, depth) for every detected topic boundary: pos
    is the 1-based token index ENDING the left block (gap g means
    "between token g and g+1"), sim the block-overlap count at the
    gap, depth the valley depth. Documents shorter than 2w tokens
    have no gaps and emit nothing."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if depth_threshold < 1:
        raise ValueError(
            f"depth_threshold must be >= 1, got {depth_threshold}"
        )
    base = df.select(
        id_col,
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_tk"),
    )
    gaps = base.select(
        id_col,
        "_tk",
        F.explode(
            F.when(
                F.size("_tk") >= 2 * w,
                F.sequence(F.lit(w), F.size("_tk") - w),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    )
    sim = F.size(
        F.array_intersect(
            F.slice("_tk", F.col("pos") - (w - 1), F.lit(w)),
            F.slice("_tk", F.col("pos") + 1, F.lit(w)),
        )
    )
    scored = gaps.select(
        id_col, "pos", sim.cast("long").alias("sim")
    )
    left = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    depth = (
        F.max("sim").over(left)
        + F.max("sim").over(right)
        - 2 * F.col("sim")
    )
    return (
        scored.select(
            id_col,
            F.col("pos").cast("long").alias("pos"),
            "sim",
            depth.cast("long").alias("depth"),
        )
        .where(F.col("depth") >= depth_threshold)
    )
