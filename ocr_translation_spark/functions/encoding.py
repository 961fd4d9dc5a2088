"""Leakage-safe categorical target encoding (leave-one-out).

Target encoding replaces a high-cardinality category with the mean of
the label over that category — but the naive version leaks each row's
own label into its own feature, which inflates offline metrics and
collapses in production (the classic target-leakage failure; cf.
Micci-Barreca, SIGKDD Expl. '01, and every feature-store guide
since). The leave-one-out form excludes the row itself:

    loo(i) = (sum_cat - y_i) / (n_cat - 1)

and falls back to the leave-one-out GLOBAL mean for singleton
categories (n_cat == 1), so every row gets a well-defined exact
value from data that never includes its own label.

Exact integers: labels enter as non-negative micro-unit longs and the
division is spelled truncating, so both engines agree bit-for-bit.

Scale shape: ONE (category) aggregate producing (sum, count) — tiny,
broadcast back onto the corpus — plus ONE single-row global
aggregate; the per-row arithmetic is whole-stage codegen. No window,
no self-join: the "exclude self" subtraction is algebra, not a
second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D38 = "decimal(38,0)"


def loo_target_encoding(
    df: DataFrame,
    cat_col: str,
    y_col: str,
    id_cols: list[str] | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """(ids..., category, n_cat, loo_ppm): the leave-one-out target
    mean of ``y_col`` (non-negative integer micro-units) per row, at
    ``scale`` fixed-point, truncating division. Singleton categories
    fall back to the leave-one-out global mean; a 1-row corpus
    degenerates to NULL (no peer data exists at all). NULL categories
    are a stratum of their own (null-safe join — a plain equi-join
    would silently DROP them, violating the every-row contract).

    CONTRACT: ``y_col`` must be NON-NULL on every row. A NULL label
    is counted by ``_cn`` (count(*)) but not by ``_csum`` (sum skips
    NULL), so same-category peers would divide by an inflated
    n_cat - 1 (biased LOO mean) and the NULL-label row itself gets
    NULL loo_ppm — the DuckDB twin mirrors the same arithmetic, so
    the oracle cannot catch it. Filter or impute labels upstream;
    the "every row gets a well-defined exact value" promise above
    holds for labeled rows only."""
    id_cols = id_cols or ["doc_id"]
    cat = (
        df.groupBy(cat_col)
        .agg(
            F.sum(y_col).cast("long").alias("_csum"),
            F.count(F.lit(1)).alias("_cn"),
        )
        # two consumers (the rejoin and the global rollup): persist so
        # the corpus aggregate runs once per action — and the global
        # (sum, count) is exactly derivable from the category table,
        # never a second corpus scan
        .persist()
    )
    glob = cat.agg(
        F.sum("_csum").cast("long").alias("_gsum"),
        F.sum("_cn").cast("long").alias("_gn"),
    )
    num_cat = f"(cast(_csum as {_D38}) - {y_col}) * {scale}"
    num_glob = f"(cast(_gsum as {_D38}) - {y_col}) * {scale}"
    loo = F.expr(
        f"""CASE
          WHEN _cn > 1 THEN cast(
            ({num_cat} - {num_cat} % (_cn - 1)) / (_cn - 1)
            as {_D38})
          WHEN _gn > 1 THEN cast(
            ({num_glob} - {num_glob} % (_gn - 1)) / (_gn - 1)
            as {_D38})
        END"""
    ).cast("long")
    # cat is |categories| rows — AQE broadcasts it when small and
    # falls back to a key-partitioned join for genuinely
    # high-cardinality encoders; the 1-row global is always broadcast
    cat_j = cat.withColumnRenamed(cat_col, "_catk")
    return (
        df.join(
            cat_j, F.col(cat_col).eqNullSafe(F.col("_catk"))
        )
        .drop("_catk")
        .join(F.broadcast(glob))
        .select(
            *id_cols,
            cat_col,
            F.col("_cn").cast("long").alias("n_cat"),
            loo.alias("loo_ppm"),
        )
    )
