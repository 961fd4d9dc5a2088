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
