"""Maximal-Marginal-Relevance diversified re-ranking.

MMR (Carbonell & Goldstein, SIGIR'98) is the standard fix for a
top-k that returns five copies of the same answer: greedily pick the
candidate maximizing

    lambda * rel(d)  -  (1 - lambda) * max_{s in S} sim(d, s)

against the already-selected set ``S``.  Search result
diversification, dedup-aware retrieval shortlists, and diverse
training-example selection all run exactly this loop.

Exactness: relevance is caller-supplied integer weight, similarity is
exact set-Jaccard in ppm (``1e6 * |A∩B| div |A∪B|`` over the shingle
sets), and with ``lambda = lam_num/lam_den`` the selection objective
is kept in cross-multiplied integer form

    mmr_score_w = lam_num * rel  -  (lam_den - lam_num) * sim_ppm_max

(no division anywhere — a trailing integer division would have to
truncate, and DuckDB ``//`` truncates toward zero while Python ``//``
floors, which differ on the negative scores MMR produces).  Ties
break by ascending id: the whole ranking is a pure function of the
candidate set.

Spark shape, and why it holds at 100 TB:

* MMR is inherently sequential in ``k`` but only WITHIN one query's
  candidate list, which upstream retrieval already bounded (top-30
  here; top-100s in production).  The scalable axis is the NUMBER of
  queries — millions of independent groups — so the operator is ONE
  shuffle on the group key and a per-group Arrow-batched
  ``applyInPandas`` doing the O(n_cand^2 * k) greedy in exact Python
  ints (the skyline / grouped-topk precedent: Python crossings are
  fine when the per-group payload is bounded and the work is not
  expressible as a fixed-depth relational plan).
* No similarity pre-join: the pairwise Jaccards are computed inside
  the group worker against at most ``k`` selected sets — materializing
  the n^2 sim matrix as a DataFrame would shuffle strictly more rows
  to compute strictly less.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _jaccard_ppm(a: frozenset, b: frozenset) -> int:
    u = len(a | b)
    if u == 0:
        return 1_000_000
    return 1_000_000 * len(a & b) // u


def mmr_rerank(
    cands: DataFrame,
    group_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel_w",
    shingle_col: str = "shingles",
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Per-group MMR top-``k``: ``(group, sel_rank, id,
    mmr_score_w)``.

    ``cands`` is one row per (group, candidate) with an integer
    relevance weight and a distinct-shingle array (``dedup.shingles``
    output or any set representation). Groups with fewer than ``k``
    candidates return all of them. The first pick's score is
    ``lam_num * rel`` (empty selected set — the max-sim term is 0 by
    convention).
    """
    import pandas as pd

    schema = StructType(
        [
            cands.schema[group_col],
            StructField("sel_rank", IntegerType(), False),
            cands.schema[id_col],
            StructField("mmr_score_w", LongType(), False),
        ]
    )
    div_w = lam_den - lam_num

    def _greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rows = sorted(
            (
                (int(r), i, frozenset(s))
                for r, i, s in zip(
                    pdf[rel_col], pdf[id_col], pdf[shingle_col]
                )
            ),
            key=lambda t: (-t[0], t[1]),
        )
        sel: list[tuple[object, int]] = []  # (id, score)
        sel_sets: list[frozenset] = []
        remaining = list(rows)
        while remaining and len(sel) < k:
            best_j = best_score = best_id = None
            for j, (rel, i, sh) in enumerate(remaining):
                ms = (
                    max(_jaccard_ppm(sh, s) for s in sel_sets)
                    if sel_sets
                    else 0
                )
                score = lam_num * rel - div_w * ms
                # max score, ties by MIN id (ids in one group share a
                # type, so < works for numeric and string ids alike)
                if (
                    best_j is None
                    or score > best_score
                    or (score == best_score and i < best_id)
                ):
                    best_j, best_score, best_id = j, score, i
            _, i, sh = remaining.pop(best_j)
            sel.append((i, best_score))
            sel_sets.append(sh)
        g = pdf[group_col].iloc[0]
        return pd.DataFrame(
            {
                group_col: [g] * len(sel),
                "sel_rank": range(1, len(sel) + 1),
                id_col: [i for i, _ in sel],
                "mmr_score_w": [s for _, s in sel],
            }
        )

    return cands.groupBy(group_col).applyInPandas(_greedy, schema)
