"""Positional proximity ranking: minimal cover window.

Term-frequency ranking (BM25) ignores WHERE the query terms sit; the
classic proximity signal is the smallest token window containing ALL
query terms at least once (Clarke/Cormack/Tudhope, IPM'00 "shortest
substring retrieval" — the span primitive behind every "terms near
each other" boost). This module computes, per document, the exact
minimal cover-window length for a FIXED small query term set,
entirely row-locally.

Algorithm: the O(n) LAST-OCCURRENCE SWEEP as ONE ``F.aggregate`` fold
over the indexed token array — at each occurrence of a query term,
update that term's last-seen position; once every term has been seen,
``position - min(last seen) + 1`` is a candidate window and the
running minimum over candidates is exact (every minimal window's
right edge is an occurrence of its rarest-right term, which the sweep
visits). One fold means the token array is an argument of ONE
top-level higher-order function, evaluated once per row — the
nested-transform cartesian alternative re-inlines the tokenization
into every lambda level (the repo's word_cooccurrence lesson:
Catalyst does not CSE subtrees into lambda bodies), and is also
O(prod tf_i) instead of O(n).

The DuckDB twin deliberately runs that brute-force nested-transform
cartesian minimum instead — an INDEPENDENT formulation of the same
value, not a re-statement of the sweep.

Scale shape: zero shuffles for the corpus scan (whole-stage codegen
fold per row); top-k is TakeOrderedAndProject. A fixed query is the
point — per-query work is one embarrassingly parallel pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_UNSEEN = 0  # positions are 1-based, so 0 is a safe sentinel
_NOBEST = 0


def min_cover_window(toks: Column, terms: list[str]) -> Column:
    """Length of the smallest token window containing every term in
    ``terms`` (NULL when any term is absent or the array is empty).
    Exact integer; terms must be distinct and non-empty."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError(f"terms must be distinct: {terms}")
    m = len(terms)
    indexed = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda t, i: F.struct(t.alias("t"), i.cast("long").alias("i")),
    )
    init = F.struct(
        *[F.lit(_UNSEEN).cast("long").alias(f"l{j}") for j in range(m)],
        F.lit(_NOBEST).cast("long").alias("best"),
    )

    def _merge(acc: Column, x: Column) -> Column:
        nl = [
            F.when(x["t"] == F.lit(terms[j]), x["i"]).otherwise(
                acc[f"l{j}"]
            )
            for j in range(m)
        ]
        all_seen = nl[0] > 0
        for c in nl[1:]:
            all_seen = all_seen & (c > 0)
        cand = x["i"] - F.least(*nl) + 1 if m > 1 else F.lit(1)
        best = F.when(
            all_seen,
            F.when(acc["best"] == _NOBEST, cand).otherwise(
                F.least(acc["best"], cand)
            ),
        ).otherwise(acc["best"])
        return F.struct(
            *[c.alias(f"l{j}") for j, c in enumerate(nl)],
            best.cast("long").alias("best"),
        )

    swept = F.aggregate(
        F.when(F.size(toks) >= 1, indexed).otherwise(
            F.array().cast(
                "array<struct<t:string,i:bigint>>"
            )
        ),
        init,
        _merge,
        lambda acc: F.when(acc["best"] > 0, acc["best"]),
    )
    return swept


def proximity_topk(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """(id, window_len, prox_ppm, rank): the k documents with the
    smallest minimal cover window for ``terms`` (ties by id).
    prox_ppm = 1e6 div window_len — the inverse-span score, exact.
    Documents missing any term are excluded (no window exists)."""
    scored = (
        df.select(
            id_col,
            min_cover_window(
                F.split(F.trim(F.col(text_col)), r"\s+"), terms
            ).alias("window_len"),
        )
        .where(F.col("window_len").isNotNull())
        .select(
            id_col,
            F.col("window_len").cast("long").alias("window_len"),
            F.expr("1000000 div window_len").alias("prox_ppm"),
        )
    )
    # rank runs AFTER limit(k), so the window moves only k rows — but
    # an EMPTY partition spec trips Spark's "No Partition Defined"
    # WindowExec warning on every run. A constant partition key is the
    # same single k-row partition (rank over all k rows, identical
    # result) without the per-run warning noise.
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.asc("window_len"), F.asc(id_col)
    )
    return (
        scored.orderBy(F.asc("window_len"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("integer"))
    )
