"""Greedy maximum-coverage selection (budgeted set cover).

Training-data curation routinely asks for "the k documents that
together cover the most distinct vocabulary / topics / n-grams" —
facility-location selection. Maximum coverage is NP-hard; the greedy
algorithm (pick the set with the most still-uncovered items, repeat)
is the classic (1 - 1/e)-approximation (Nemhauser/Wolsey/Fisher '78
submodular maximization), and for a VALUE ORACLE it has the decisive
property of being fully deterministic — ties broken by id make the
selected sequence a pure function of the input.

Distributed shape: k driver-coordinated rounds (the repo's CC / BPE /
k-center precedent). Each round is ONE job over the persisted
(id, items) projection — compute every candidate's marginal gain
``size(array_except(items, covered))`` row-locally against the
BROADCAST covered-item literal, then TakeOrdered(1). Driver state is
the covered set, bounded by k x max items-per-doc (the SELECTION
size, never the corpus); no shuffle at all — the argmax is a
TakeOrderedAndProject over a map-side projection. A lazy-greedy
(Minoux) priority queue would skip rescans but needs a mutable
distributed heap; at k scans of a column-pruned projection the plain
form is the honest Spark answer.

The result is collected and re-emitted as a local k-row DataFrame
(the selection IS driver-sized by construction), which also makes
repeat invocations cheap via ``prepared()`` at the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def greedy_set_cover(
    df: DataFrame,
    id_col: str = "doc_id",
    items_col: str = "items",
    k: int = 8,
) -> DataFrame:
    """(round, <id>, newly_covered, covered_total): the first ``k``
    greedy max-coverage picks over ``items_col`` (array of items;
    deduplicated internally). Ties broken by smallest id; stops early
    when the best remaining marginal gain is 0 (every further pick
    would be arbitrary padding) or the corpus is exhausted — the
    output may therefore have fewer than k rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = df.sparkSession
    proj = df.select(
        id_col, F.array_distinct(F.col(items_col)).alias("its")
    ).persist()
    try:
        covered: set = set()
        picked: list = []
        rows = []
        total = 0
        for rnd in range(1, k + 1):
            if covered:
                gain = F.size(
                    F.array_except(
                        F.col("its"),
                        F.array(*[F.lit(x) for x in sorted(covered)]),
                    )
                )
            else:
                gain = F.size(F.col("its"))
            cand = proj
            if picked:
                cand = cand.where(~F.col(id_col).isin(picked))
            best = (
                cand.select(id_col, "its", gain.alias("nc"))
                .orderBy(F.desc("nc"), F.asc(id_col))
                .limit(1)
                .collect()
            )
            # nc can be -1 (size(NULL) under non-ANSI) or NULL for
            # NULL items arrays — any non-positive best gain means no
            # candidate adds coverage (NULL-items rows sort last and
            # must not crash the covered.update below)
            if (
                not best
                or best[0]["nc"] is None
                or best[0]["nc"] <= 0
            ):
                break
            b = best[0]
            covered.update(b["its"])
            picked.append(b[id_col])
            total += b["nc"]
            rows.append((rnd, b[id_col], b["nc"], total))
        schema = T.StructType(
            [
                T.StructField("round", T.IntegerType(), False),
                T.StructField(
                    id_col,
                    next(
                        f.dataType
                        for f in df.schema.fields
                        if f.name == id_col
                    ),
                    True,
                ),
                T.StructField("newly_covered", T.LongType(), False),
                T.StructField("covered_total", T.LongType(), False),
            ]
        )
        return spark.createDataFrame(
            [(r, i, int(n), int(t)) for r, i, n, t in rows], schema
        )
    finally:
        proj.unpersist()
