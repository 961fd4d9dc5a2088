"""Pairwise Pearson correlation from exact sufficient statistics.

Feature-correlation audit for training-data/feature-store pipelines:
which numeric signals are redundant (|r| ~ 1) or independent (r ~ 0)?
Inputs are integer-quantized feature columns (micro-units, cents —
the caller picks the quantization; CAST truncation of the same double
expression is engine-identical, so quantized inputs stay
value-oracle-checkable).

Spark shape (100 TB): ONE corpus scan into ONE single-row aggregate —
k sums, k sums-of-squares and k(k-1)/2 cross sums, all DECIMAL(38,0)
with map-side partial aggregation — then the pair rows are unpivoted
IN-PLAN with ``stack`` (no driver collect, no second scan, no join).
The only shuffle moves ONE row.

Per pair the output carries the EXACT integer pieces of Pearson's r:

  num   = n * sum_xy - sum_x * sum_y          (covariance numerator)
  den_x = n * sum_xx - sum_x^2                (variance numerators)
  den_y = n * sum_yy - sum_y^2

(r = num / sqrt(den_x * den_y) — sqrt is libm territory, so the exact
columns are the oracle surface) plus the convenience ``r2`` double,
``round(num^2 / (den_x * den_y), 6)`` computed from the exact decimals
with the same IEEE ops on both engines (the tfidf round(x, 6)
precedent), and ``r_sign``.  Constant features get NULL r2, never a
division error.  DECIMAL(38,0) bounds the honest scale: with
micro-unit features < 1e8 the cross sums hold to ~1e12 rows per
aggregation scope — beyond that, pre-scale the quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D38 = "decimal(38,0)"


def pairwise_corr(df: DataFrame, cols: list[str]) -> DataFrame:
    """(feat_x, feat_y, n, num, den_x, den_y, r_sign, r2) for every
    unordered column pair, from one single-row exact aggregate."""
    if len(cols) < 2:
        raise ValueError("need at least 2 feature columns")
    if len(set(cols)) != len(cols):
        raise ValueError("feature columns must be distinct")
    # complete-case analysis: count(*) must share the sums' support,
    # else a NULL in one feature silently corrupts every statistic
    # that includes the other features' values for that row
    df = df.dropna(subset=list(cols))
    aggs = [F.count(F.lit(1)).cast(_D38).alias("_n")]
    for c in cols:
        x = F.col(c).cast(_D38)
        aggs.append(F.sum(x).alias(f"_s_{c}"))
        aggs.append(F.sum(x * x).alias(f"_ss_{c}"))
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum(F.col(a).cast(_D38) * F.col(b).cast(_D38)).alias(
                f"_c_{a}_{b}"
            )
        )
    one = df.agg(*aggs)

    rows = []
    for a, b in pairs:
        rows.append(
            F.struct(
                F.lit(a).alias("feat_x"),
                F.lit(b).alias("feat_y"),
                F.col("_n").cast("long").alias("n"),
                (F.col("_n") * F.col(f"_c_{a}_{b}")
                 - F.col(f"_s_{a}") * F.col(f"_s_{b}"))
                .cast(_D38).alias("num"),
                (F.col("_n") * F.col(f"_ss_{a}")
                 - F.col(f"_s_{a}") * F.col(f"_s_{a}"))
                .cast(_D38).alias("den_x"),
                (F.col("_n") * F.col(f"_ss_{b}")
                 - F.col(f"_s_{b}") * F.col(f"_s_{b}"))
                .cast(_D38).alias("den_y"),
            )
        )
    unpivoted = one.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")
    den_prod = F.col("den_x").cast("double") * F.col("den_y").cast(
        "double"
    )
    num_d = F.col("num").cast("double")
    return unpivoted.select(
        "feat_x", "feat_y", "n", "num", "den_x", "den_y",
        F.signum(num_d).cast("int").alias("r_sign"),
        F.when(
            (F.col("den_x") > 0) & (F.col("den_y") > 0),
            F.round(num_d * num_d / den_prod, 6),
        ).alias("r2"),
    )


def spearman_rank_corr(
    df: DataFrame, x_col: str, y_col: str, num_ranges: int = 32
) -> DataFrame:
    """Exact Spearman rank correlation of two numeric columns:
    Pearson on tied-AVERAGE ranks, with every statistic integer-exact.

    Average ranks are half-integers (rank = n_smaller + (ties+1)/2),
    so both columns are ranked in 2-SCALED integers ``r2 = 2*n_smaller
    + ties + 1`` — the scale cancels in the correlation — computed
    with ranknorm.value_n_smaller (range-partitioned per-value
    cumulatives over the O(distinct) rollup; no single-task global
    sort) and mapped back through one value-keyed equi-join per
    column. The sufficient statistics then come from
    :func:`pairwise_corr` (one single-row DECIMAL(38,0) aggregate).

    Output adds ``rho2_signed_ppm``: sign(num) * num^2 * 1e6 /
    (den_x * den_y) evaluated in the MIRRORED truncating order
      a = (|num| * 1e6) div den_x;  out = sign * ((a * |num|) div den_y)
    — exact and engine-identical (DuckDB HUGEINT ``//`` floors, but
    every operand here is non-negative, so floor == truncate). With
    2-scaled ranks <= 2n the pieces stay inside DECIMAL(38,0) to
    n ~ 2e9 rows per scope; shard beyond that."""
    from ocr_translation_spark.functions.ranknorm import value_n_smaller

    base = df.select(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).dropna()

    ranked = base
    for side in ("_x", "_y"):
        rollup = base.groupBy(F.col(side).alias("_v")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        nsm, _n = value_n_smaller(rollup, num_ranges)
        r2 = (
            2 * F.col("_nsm") + F.col("_cnt") + 1
        ).cast("long").alias(f"_r2{side}")
        mapping = nsm.select(F.col("_v").alias(side), r2)
        ranked = ranked.join(mapping, side)

    stats = pairwise_corr(ranked, ["_r2_x", "_r2_y"])
    a = F.call_function(
        "div",
        F.abs(F.col("num")) * F.lit(1000000).cast(_D38),
        F.col("den_x"),
    )
    rho2 = F.call_function(
        "div", (a * F.abs(F.col("num"))).cast(_D38), F.col("den_y")
    )
    return stats.select(
        F.lit(x_col).alias("feat_x"),
        F.lit(y_col).alias("feat_y"),
        "n", "num", "den_x", "den_y", "r_sign",
        F.when(
            (F.col("den_x") > 0) & (F.col("den_y") > 0),
            (F.signum(F.col("num").cast("double")).cast("long")
             * rho2.cast("long")),
        ).alias("rho2_signed_ppm"),
    )
