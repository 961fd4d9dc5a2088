"""Reciprocal-rank fusion of bounded ranked lists (hybrid retrieval).

RRF (Cormack et al., SIGIR'09): fuse K rankings of the same id space
by summing 1/(k + rank) per list an id appears in — the standard way
to combine lexical (BM25) retrieval with a query-independent or
semantic signal without score calibration, since only RANKS enter.
Here in exact integer micro-units (``scale div (k + rank)``,
truncating division) so the DuckDB twin is value-identical.

Spark shape: the inputs are bounded top-N lists by contract (a
retrieval fan-in, not a corpus — ranking a corpus globally is the
inverted index / TakeOrdered operators' job), so the union +
per-id aggregate + final TakeOrdered all run on O(K * N) rows.
:func:`rank_topn` turns a scored bounded list into (id, rank) with a
deterministic tie-break; its single-partition window is safe ONLY
because the input is already LIMIT-ed — for corpus-scale ranking use
``blocking.global_rank_by`` (bucket offsets, no single task).

Reference parity note: the reference returns OCR jobs ranked by
insertion order only (`src/services/job.js` queue order); fusion is
what a retrieval layer over the extracted corpus needs when several
relevance signals exist.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def rank_topn(
    df: DataFrame,
    order: Sequence[Column],
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, rank) for the top ``n`` rows of a BOUNDED scored list
    under ``order`` (caller includes a unique tie-break column).
    The global window is single-partition by construction — callers
    must pass bounded (already top-N / LIMIT-ed) inputs only."""
    w = Window.orderBy(*order)
    return (
        df.select(F.col(id_col), F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= n)
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    top_k: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fuse named (id, rank) lists by reciprocal rank.

    Returns ``(id, <name>_rank ..., rrf_micro)`` for the ``top_k``
    fused ids, ordered (rrf_micro desc, id asc). An id absent from a
    list has a NULL ``<name>_rank`` and contributes 0 — the standard
    RRF treatment of finite lists.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    parts = [
        df.select(
            F.col(id_col).alias("_id"),
            F.col("rank").cast("long").alias("_rank"),
            F.lit(name).alias("_tag"),
        )
        for name, df in rankings.items()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    contrib = F.call_function(
        "div", F.lit(scale).cast("long"), F.lit(k) + F.col("_rank")
    )
    fused = u.groupBy("_id").agg(
        *[
            F.max(
                F.when(F.col("_tag") == name, F.col("_rank"))
            ).alias(f"{name}_rank")
            for name in rankings
        ],
        F.sum(contrib).cast("long").alias("rrf_micro"),
    )
    return (
        fused.orderBy(F.col("rrf_micro").desc(), F.col("_id").asc())
        .limit(top_k)
        .withColumnRenamed("_id", id_col)
    )
