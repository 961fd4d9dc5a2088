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


def histogram_drift(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    n_bins: int = 16,
) -> DataFrame:
    """Numeric-feature distribution drift between two row slices as an
    equi-width histogram comparison in exact parts-per-million — the
    population-stability-index workflow, with the per-bin statistic
    kept as the L1 (total-variation) contribution |share_a - share_b|
    instead of PSI's log term (the repo's no-libm discipline: a
    monotone-equivalent integer statistic oracles exactly; the L1 sum
    over bins IS 2x the total-variation distance the PSI thresholds
    proxy for).

    ``flag_col`` is a boolean column (True = slice A / "early"); bins
    are equi-width over the GLOBAL [min, max] of ``value_col`` (both
    slices pooled, so the binning is identical on both sides):

        bin = least(n_bins - 1, (v - vmin) * n_bins div (vmax - vmin + 1))

    over integer-quantized values. Output: one row per bin 0..n_bins-1
    (dense spine — empty bins appear with zeros), with a_n, b_n,
    a_ppm, b_ppm (share of that slice, truncating div), and
    l1_ppm = |a_ppm - b_ppm|.

    Rows with a NULL value or a NULL flag cannot be binned or
    attributed; they are counted in a ``bin = -1`` accounting row
    (a_n = excluded rows flagged TRUE, b_n = every other excluded
    row — FALSE or NULL flag; ppm/l1 NULL), excluded from the shares
    — never silently dropped (repo convention).

    Scale shape: ONE pass — a single hash aggregate to (bin, flag)
    cells (output O(n_bins)), a 1-row global min/max aggregate
    broadcast back, and a literal spine; no shuffle wider than the
    bin count.
    """
    v = F.col(value_col).cast("long")
    flag = F.col(flag_col)
    base = df.select(v.alias("v"), flag.alias("a"))
    valid = base.where(
        F.col("v").isNotNull() & F.col("a").isNotNull()
    )
    excluded = base.where(
        F.col("v").isNull() | F.col("a").isNull()
    ).agg(
        F.lit(-1).cast("long").alias("bin"),
        F.coalesce(
            F.sum(F.when(F.col("a").eqNullSafe(True), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("a_n"),
        F.coalesce(
            F.sum(F.when(F.col("a").eqNullSafe(True), 0).otherwise(1)),
            F.lit(0),
        )
        .cast("long")
        .alias("b_n"),
    )
    mm = valid.agg(
        F.min("v").alias("_vmin"), F.max("v").alias("_vmax")
    )
    binned = valid.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(n_bins - 1).cast("long"),
            F.call_function(
                "div",
                (F.col("v") - F.col("_vmin")) * F.lit(n_bins),
                F.col("_vmax") - F.col("_vmin") + F.lit(1),
            ),
        ).alias("bin"),
        "a",
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0))
        .cast("long")
        .alias("a_n"),
        F.sum(F.when(F.col("a"), 0).otherwise(1))
        .cast("long")
        .alias("b_n"),
    )
    spine = cells.sparkSession.range(n_bins).select(
        F.col("id").alias("bin")
    )
    dense = spine.join(cells, "bin", "left").select(
        "bin",
        F.coalesce("a_n", F.lit(0)).alias("a_n"),
        F.coalesce("b_n", F.lit(0)).alias("b_n"),
    )
    tot = dense.agg(
        F.sum("a_n").alias("_ta"), F.sum("b_n").alias("_tb")
    )
    ppm = lambda n, t: F.when(  # noqa: E731 — local formula alias
        t > 0, F.call_function("div", n * F.lit(1_000_000), t)
    ).otherwise(F.lit(0))
    out = dense.crossJoin(F.broadcast(tot)).select(
        "bin",
        "a_n",
        "b_n",
        ppm(F.col("a_n"), F.col("_ta")).alias("a_ppm"),
        ppm(F.col("b_n"), F.col("_tb")).alias("b_ppm"),
    )
    binned_rows = out.select(
        "bin",
        "a_n",
        "b_n",
        "a_ppm",
        "b_ppm",
        F.abs(F.col("a_ppm") - F.col("b_ppm")).alias("l1_ppm"),
    )
    return binned_rows.unionByName(
        excluded.select(
            "bin",
            "a_n",
            "b_n",
            F.lit(None).cast("long").alias("a_ppm"),
            F.lit(None).cast("long").alias("b_ppm"),
            F.lit(None).cast("long").alias("l1_ppm"),
        )
    )
