"""Weak supervision: labeling-function votes, majority label, LF audit.

Programmatic labeling (Snorkel-style) is how large corpora get
training labels without annotators: many cheap heuristic labeling
functions (LFs) each vote +1 / -1 or abstain, a label model combines
the votes, and an LF *analysis* (coverage / overlap / conflict — the
LFAnalysis triple from Ratner et al., VLDB 2018) tells the author
which heuristics are dead weight or fighting each other.

Everything here is row-local until one aggregate:

* ``majority_label`` — per row: positive/negative vote counts and the
  majority label (sign of the vote sum, ties and all-abstain -> 0).
  Zero shuffles; a pure codegen map.
* ``lf_report`` — per LF: rows, labeled count, coverage (exact ppm),
  overlap (votes alongside >= 1 other non-abstain), conflict (votes
  against >= 1 opposite-sign vote). ONE single-row aggregate computes
  all 4k counters (per-row "others" counts derive from the row's own
  pos/neg totals, no pairwise LF join), then ``stack`` unpivots to k
  rows — the whole report is one corpus scan and no shuffle at any
  corpus size.

LFs are (name, Column) pairs; the Column must evaluate to -1, 0
(abstain), or +1. Out-of-range votes raise in-plan (raise_error) —
a silently coerced vote would corrupt every downstream count.

Reference parity note: the reference labels nothing; this is the
curation-side complement of the trained scorers
(hashed_classifier_score consumes labels; this MANUFACTURES them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _checked_vote(name: str, col: Column) -> Column:
    v = col.cast("int")
    return (
        F.when(v.isin(-1, 0, 1), v)
        .when(v.isNull(), F.lit(0))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"labeling function {name} voted "),
                    v.cast("string"),
                    F.lit(" (must be -1, 0, or 1)"),
                )
            ).cast("int")
        )
    )


def majority_label(
    df: DataFrame,
    lfs: list[tuple[str, Column]],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_pos, n_neg, label) per row; label is the sign of the
    vote sum — 0 on ties or when every LF abstains."""
    if not lfs:
        raise ValueError("lfs must be non-empty")
    votes = [(_checked_vote(n, c)).alias(f"_v_{i}") for i, (n, c) in enumerate(lfs)]
    voted = df.select(F.col(id_col), *votes)
    n_pos = sum(
        F.when(F.col(f"_v_{i}") == 1, 1).otherwise(0)
        for i in range(len(lfs))
    )
    n_neg = sum(
        F.when(F.col(f"_v_{i}") == -1, 1).otherwise(0)
        for i in range(len(lfs))
    )
    return voted.select(
        F.col(id_col),
        n_pos.cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
        F.when(n_pos > n_neg, 1)
        .when(n_neg > n_pos, -1)
        .otherwise(0)
        .cast("int")
        .alias("label"),
    )


def lf_report(
    df: DataFrame, lfs: list[tuple[str, Column]]
) -> DataFrame:
    """One row per LF: (lf_name, n_rows, n_labeled, coverage_ppm,
    n_overlap, n_conflict)."""
    if not lfs:
        raise ValueError("lfs must be non-empty")
    k = len(lfs)
    voted = df.select(
        *[
            _checked_vote(n, c).alias(f"_v_{i}")
            for i, (n, c) in enumerate(lfs)
        ]
    )
    row_pos = sum(
        F.when(F.col(f"_v_{i}") == 1, 1).otherwise(0) for i in range(k)
    )
    row_neg = sum(
        F.when(F.col(f"_v_{i}") == -1, 1).otherwise(0) for i in range(k)
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i in range(k):
        v = F.col(f"_v_{i}")
        others_pos = row_pos - F.when(v == 1, 1).otherwise(0)
        others_neg = row_neg - F.when(v == -1, 1).otherwise(0)
        labeled = v != 0
        aggs.append(
            F.sum(F.when(labeled, 1).otherwise(0))
            .cast("long")
            .alias(f"_lab_{i}")
        )
        aggs.append(
            F.sum(
                F.when(
                    labeled & ((others_pos + others_neg) > 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"_ovl_{i}")
        )
        aggs.append(
            F.sum(
                F.when(
                    ((v == 1) & (others_neg > 0))
                    | ((v == -1) & (others_pos > 0)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"_cfl_{i}")
        )
    wide = voted.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _lab_{i}, _ovl_{i}, _cfl_{i}"
        for i, (name, _) in enumerate(lfs)
    )
    return wide.select(
        F.col("_n"),
        F.expr(
            f"stack({k}, {stack_args})"
            " as (lf_name, n_labeled, n_overlap, n_conflict)"
        ),
    ).select(
        "lf_name",
        F.col("_n").alias("n_rows"),
        "n_labeled",
        F.expr(
            "case when _n > 0 then (1000000 * n_labeled) div _n"
            " else 0 end"
        ).alias("coverage_ppm"),
        "n_overlap",
        "n_conflict",
    )
