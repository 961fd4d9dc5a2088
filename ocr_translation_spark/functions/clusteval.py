"""Clustering-agreement evaluation: Adjusted Rand Index, exact.

Dedup/clustering pipelines need a scale-sound answer to "how close is
the produced clustering to the gold one". Pair-counting agreement is
the standard: the Rand index over the C(n,2) item pairs, and its
chance-corrected form ARI (Hubert & Arabie '85), which is 0 in
expectation for random labelings and 1 for identity.

Every ingredient is an integer binomial over the CONTINGENCY TABLE:

    S = sum_ij C(n_ij, 2),  A = sum_i C(a_i, 2),  B = sum_j C(b_j, 2)

so with T = C(n, 2):

    ARI = (T * S - A * B) / (T * (A + B) / 2 - A * B)

computed here as cross-multiplied DECIMAL(38,0) integers with the
C(.,2) values carried DOUBLED (x(x-1), kills every /2) and ONE signed
truncating division at ppm scale — ARI can be negative (worse than
chance), so the division is sign-split and runs on magnitudes
(truncating == flooring only for non-negatives; DuckDB's // floors).
Degenerate cases pinned: n < 2, and the both-trivial clusterings
(everything one cluster or everything singletons on BOTH sides) have
denominator 0 — ari_ppm is NULL there, components still reported.

Scale shape: ONE (gold, pred) count aggregate — the contingency table
is O(k_gold x k_pred) — then two O(k) rollups and scalar arithmetic.
The corpus is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D38 = "decimal(38,0)"


def _c2x(c: str) -> str:
    """2 * C(x, 2) = x * (x - 1), as DECIMAL(38,0) SQL text."""
    return f"(cast({c} as {_D38}) * ({c} - 1))"


def adjusted_rand_index(
    df: DataFrame,
    gold_col: str = "gold",
    pred_col: str = "pred",
    max_items: int = 110_000_000,
) -> DataFrame:
    """One row: (n_items, sum_comb_cells, sum_comb_gold,
    sum_comb_pred, ari_ppm). Combination sums are the true C(.,2)
    values (longs); ari_ppm is the exact chance-corrected index in
    signed truncating ppm, NULL when undefined (n < 2, or both
    clusterings trivial so the denominator is 0).

    RANGE GUARD: the cross-products are ~n^4 and the ppm scaling adds
    1e6. The worst committed case (balanced two-cluster agreement:
    gold == pred, two clusters of n/2) gives |num2| ~ n^4/2, so
    |num2| * 1e6 <= 10^38 - 1 requires n <= (2 * 10^32)^(1/4) ~
    1.19e8 — NOT the earlier ~2.4e8 claim, which ignored the
    balanced-agreement constant. Beyond the bound Spark's non-ANSI
    arithmetic would return NULL, indistinguishable from the
    legitimate degenerate cases (and DuckDB's HUGEINT overflows near
    the same point, so the engines can even diverge error-vs-NULL).
    n > ``max_items`` therefore raises IN-PLAN instead of silently
    NULLing (compute per-shard ARIs or subsample above the bound;
    the parameter exists so the guard itself is unit-testable)."""
    cells = (
        df.groupBy(gold_col, pred_col)
        .agg(F.count(F.lit(1)).alias("nij"))
        # three consumers (totals + both marginals) read the
        # contingency table: persist so the corpus is scanned ONCE
        # per action, not three times (the cohens_kappa convention;
        # no build-time unpersist — the returned relation still
        # references the cache, and the mark is O(k_gold x k_pred))
        .persist()
    )
    gold_sizes = cells.groupBy(gold_col).agg(F.sum("nij").alias("ai"))
    pred_sizes = cells.groupBy(pred_col).agg(F.sum("nij").alias("bj"))
    parts = (
        cells.agg(
            F.sum("nij").cast("long").alias("n"),
            F.sum(F.expr(_c2x("nij"))).cast(_D38).alias("s2x"),
        )
        .join(
            F.broadcast(
                gold_sizes.agg(
                    F.sum(F.expr(_c2x("ai"))).cast(_D38).alias("a2x")
                )
            )
        )
        .join(
            F.broadcast(
                pred_sizes.agg(
                    F.sum(F.expr(_c2x("bj"))).cast(_D38).alias("b2x")
                )
            )
        )
    )
    # t2x = 2*C(n,2). In doubled variables the canonical ratio
    # (T*S - A*B) / (T*(A+B)/2 - A*B) becomes, after clearing the
    # common 1/8: num2 = 2*t2x*s2x - 2*a2x*b2x over
    # den2 = t2x*(a2x+b2x) - 2*a2x*b2x — integral throughout.
    staged = parts.select(
        "n",
        "s2x",
        "a2x",
        "b2x",
        F.expr(f"cast(cast(n as {_D38}) * (n - 1) as {_D38})").alias(
            "t2x"
        ),
    ).select(
        "n",
        "s2x",
        "a2x",
        "b2x",
        F.expr(f"cast(2 * (t2x * s2x) - 2 * (a2x * b2x) as {_D38})")
        .alias("num2"),
        F.expr(f"cast(t2x * (a2x + b2x) - 2 * (a2x * b2x) as {_D38})")
        .alias("den2"),
    )
    signed_ppm = F.expr(
        f"""CASE
          WHEN n > {int(max_items)} THEN cast(raise_error(
            'adjusted_rand_index: n_items exceeds the exact '
            || 'DECIMAL(38,0) range of the ~n^4 cross-products '
            || '(max_items={int(max_items)}); compute per-shard '
            || 'or subsample') as long)
          WHEN n >= 2 AND den2 <> 0 THEN cast(
          (CASE WHEN num2 >= 0 THEN 1 ELSE -1 END)
          * (CASE WHEN den2 >= 0 THEN 1 ELSE -1 END)
          * ((abs(num2) * 1000000
              - (abs(num2) * 1000000) % abs(den2)) / abs(den2))
        as long) END"""
    )
    return staged.select(
        F.col("n").alias("n_items"),
        F.expr("cast(s2x / 2 as long)").alias("sum_comb_cells"),
        F.expr("cast(a2x / 2 as long)").alias("sum_comb_gold"),
        F.expr("cast(b2x / 2 as long)").alias("sum_comb_pred"),
        signed_ppm.alias("ari_ppm"),
    )
