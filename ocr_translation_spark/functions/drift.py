"""Corpus drift detection: the terms whose relative frequency shifted
most between two corpus slices, in exact integer micro-ratios.

The distribution-shift monitor a continuously-recrawled training
corpus needs ("what vocabulary is this month's crawl over/under-
representing vs last month's?" / "what distinguishes source X?") —
the Monroe et al. '08 log-odds family, reformulated without logs so
the statistic is a pure integer function of the counts (the repo's
exact-micro-unit discipline: libm ulps break value oracles, and a
monotone transform does not change the ranking):

  ratio_micro(term) =
      ((c_a + 1) * (T_b + V)) * 10^6 // ((c_b + 1) * (T_a + V))

with c_side the term's count in that side, T_side the side's total
token count, and V the joint vocabulary size — Laplace-smoothed
relative-frequency ratio in parts-per-million, exact DECIMAL(38)
cross-multiplication with truncating division on both engines.

Spark shape (100 TB): ONE corpus pass — union the two sides with a
flag, explode tokens, hash-aggregate conditional counts per term
(map-side partial collapse; the output is O(vocabulary), independent
of corpus rows). Totals and V are a 1-row aggregate over that vocab
relation, broadcast back as literals-via-crossjoin; the two top-k
heads are TakeOrdered (no global sort). Rare-term noise is cut by an
exact min_count floor, stated in the result contract.

Reference parity note: the reference has no corpus analytics; this
belongs to the training-data-pipeline surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def corpus_drift_terms(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Top-``k`` most A-enriched and top-``k`` most B-enriched terms:
    (term, cnt_a, cnt_b, ratio_micro, direction, rank), terms with
    cnt_a + cnt_b < min_count excluded. direction 'a' ranks by
    ratio_micro descending, 'b' ascending; ties break by term.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sides = df_a.select(
        F.lit(1).alias("_a"), F.col(text_col).alias("_t")
    ).unionByName(
        df_b.select(F.lit(0).alias("_a"), F.col(text_col).alias("_t"))
    )
    toks = sides.select(
        "_a",
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col("_t"), F.lit("")), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    vocab = toks.groupBy("term").agg(
        F.sum("_a").alias("cnt_a"),
        F.sum(1 - F.col("_a")).alias("cnt_b"),
    )
    totals = vocab.agg(
        F.sum("cnt_a").alias("ta"),
        F.sum("cnt_b").alias("tb"),
        F.count(F.lit(1)).alias("v"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = (
        vocab.filter(F.col("cnt_a") + F.col("cnt_b") >= min_count)
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            "cnt_a",
            "cnt_b",
            F.call_function(
                "div",
                dec(F.col("cnt_a") + 1)
                * dec(F.col("tb") + F.col("v"))
                * F.lit(1000000),
                dec(F.col("cnt_b") + 1)
                * dec(F.col("ta") + F.col("v")),
            ).alias("ratio_micro"),
        )
        # both rank heads read this once: without the checkpoint each
        # head would re-run the corpus explode + vocab aggregate
        # (plans are trees); the materialized relation is O(filtered
        # vocabulary), never corpus
        .localCheckpoint(eager=False)
    )
    def head(direction, asc):
        order = [
            F.col("ratio_micro").asc() if asc
            else F.col("ratio_micro").desc(),
            F.col("term").asc(),
        ]
        # TakeOrdered head first; the rank window then runs on the
        # k surviving rows only (a k-row SinglePartition, not a
        # global sort)
        return (
            scored.orderBy(*order)
            .limit(k)
            .select(
                "*",
                F.lit(direction).alias("direction"),
                F.row_number().over(Window.orderBy(*order))
                .alias("rank"),
            )
        )

    return head("a", False).unionByName(head("b", True))
