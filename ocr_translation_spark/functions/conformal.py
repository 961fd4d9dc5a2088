"""Split-conformal calibration: finite-sample coverage thresholds
per group, and the coverage audit against a held-out set.

Split conformal prediction (Vovk et al., "Algorithmic Learning in a
Random World"; Lei et al., JASA'18) turns ANY score into a set
predictor with a DISTRIBUTION-FREE guarantee: with a calibration set
of n exchangeable nonconformity scores, the threshold

    t = the k-th smallest calibration score,
    k = ceil((n + 1) * (1 - alpha))

covers a fresh point with probability >= 1 - alpha — exactly, for
every n, with no model assumptions. The (n + 1) is the point: the
naive ceil(n * (1-alpha)) empirical quantile UNDER-covers in finite
samples; conformal's rank is data-dependent, which is why this
operator needs an explicit-rank order statistic, not a fixed
quantile. When k > n (tiny calibration sets: n < (1-alpha)/alpha)
the guarantee is only attainable by the infinite threshold — the
operator reports +inf and full coverage rather than a silently
clamped finite rank.

Spark shape (100 TB):
  * The k-th order statistic per group reuses
    selection.group_exact_quantiles' histogram-narrowing machinery
    via its ``rank_for`` hook — O(groups x bins) driver state per
    round, O(log_bins(n)) rounds, no per-group sort, no single-task
    state (the same distributed-selection discipline as the exact
    quantile family).
  * The audit side is ONE group-keyed aggregate over the test set
    after a BROADCAST join of the O(groups) threshold table.
  * Coverage is reported in the repo's truncating-ppm convention, so
    the DuckDB twin is value-identical.

Reference parity note: the reference applies no confidence gating to
its OCR output; this is the release-calibration operator a corpus
pipeline needs to turn per-document quality scores
(functions/classifier.py) into "keep with >= 90% guarantee" gates
whose error rate is certified, not estimated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conformal_rank(n: int, alpha_num: int, alpha_den: int) -> int:
    """k = ceil((n + 1) * (1 - alpha)) in exact integer arithmetic;
    may exceed n (the +inf-threshold regime)."""
    keep_num = alpha_den - alpha_num  # (1 - alpha) = keep_num/alpha_den
    return -(-((n + 1) * keep_num) // alpha_den)


def conformal_thresholds(
    calibration: DataFrame,
    test: DataFrame,
    group_col: str,
    score_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
    bins: int = 128,
    limit: int = 131072,
) -> DataFrame:
    """Per-group conformal threshold + held-out coverage audit:
    (grp, n_cal, k_rank, threshold, n_test, n_covered, coverage_ppm).

    ``threshold`` is the exact k-th smallest calibration score
    (a real data value), or +inf when k > n_cal; a test point is
    covered iff ``score <= threshold``. Groups with no calibration
    rows produce no output row (there is nothing to certify); groups
    with no test rows report n_test = 0 and NULL coverage. NULL
    groups/scores are excluded on both sides.
    """
    if not (0 < alpha_num < alpha_den):
        raise ValueError(
            f"alpha must be in (0,1): {alpha_num}/{alpha_den}"
        )
    from ocr_translation_spark.functions.selection import (
        group_exact_quantiles,
    )

    cal = calibration.select(
        F.col(group_col).alias("grp"),
        F.col(score_col).cast("double").alias("score"),
    ).filter(F.col("grp").isNotNull() & F.col("score").isNotNull())

    def _rank(label: str, n: int) -> int:
        return min(n, conformal_rank(n, alpha_num, alpha_den))

    sel = group_exact_quantiles(
        cal,
        "grp",
        "score",
        qs=("conformal",),
        bins=bins,
        limit=limit,
        rank_for=_rank,
    )
    # re-derive the UNclamped conformal rank from the group size the
    # selection already reports; clamped groups get the +inf regime.
    # ceil(a/b) = (a + b - 1) div b — pure integer arithmetic.
    keep_num = alpha_den - alpha_num
    k_real = F.call_function(
        "div",
        (F.col("n") + 1) * keep_num + (alpha_den - 1),
        F.lit(alpha_den),
    ).cast("long")
    thr = sel.select(
        F.col("grp"),
        F.col("n").alias("n_cal"),
        k_real.alias("k_rank"),
        F.when(k_real > F.col("n"), F.lit(float("inf")))
        .otherwise(F.col("value"))
        .alias("threshold"),
    )
    tst = test.select(
        F.col(group_col).alias("grp"),
        F.col(score_col).cast("double").alias("score"),
    ).filter(F.col("grp").isNotNull() & F.col("score").isNotNull())
    cov = (
        tst.join(F.broadcast(thr), "grp")
        .groupBy("grp", "n_cal", "k_rank", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (F.col("score") <= F.col("threshold")).cast("long")
            ).alias("n_covered"),
        )
    )
    empty_test = thr.join(
        cov.select("grp"), "grp", "left_anti"
    ).select(
        "grp", "n_cal", "k_rank", "threshold",
        F.lit(0).cast("long").alias("n_test"),
        F.lit(0).cast("long").alias("n_covered"),
    )
    out = cov.unionByName(empty_test)
    return out.select(
        "grp", "n_cal", "k_rank", "threshold", "n_test", "n_covered",
        F.when(
            F.col("n_test") > 0,
            F.call_function(
                "div", F.col("n_covered") * 1000000, F.col("n_test")
            ),
        ).alias("coverage_ppm"),
    )
