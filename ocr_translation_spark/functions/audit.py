"""Declarative data-contract validation: exact violation counts per
constraint, the admission gate a pipeline runs before promoting a
table (the ops twin of ``profile.profile_table``, which DESCRIBES a
table; this module CHECKS it against declared expectations).

Constraint kinds:

* ``not_null(col)``
* ``in_range(col, lo, hi)``     (inclusive; NULL does not violate —
  declare ``not_null`` separately, so each gate reports one thing)
* ``matches(col, regex)``       (NULL does not violate)
* ``in_set(col, values)``       (NULL does not violate)
* ``unique(cols)``              (violations = rows beyond the first
  per duplicated key — i.e. ``n_rows - n_distinct_keys``)
* ``foreign_key(col, ref_df, ref_col)``  (violations = rows whose
  non-NULL key has no match — the classic anti-join check)

Scale shape: every row-local constraint compiles into ONE conditional
sum inside a SINGLE aggregate over ONE scan of the table — adding a
constraint adds a column to that aggregate, never a pass. ``unique``
costs one (count + count-distinct) aggregate on its key; each
``foreign_key`` is one LEFT ANTI equi-join counted (broadcast when
the reference side is dimension-sized, AQE otherwise). Output is one
tiny row per constraint — union'd driver-side from per-kind counts,
O(constraints) rows total.

Reference parity anchor: the reference validates uploads before
enqueueing (missing file / empty text guards,
``src/controllers/pdf.js:14-16,144-146``, ``src/utils/pdf.js:14-22``)
and quarantines failures; this operator is that same admission gate
generalized to declared table contracts with exact accounting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---- constraint constructors (plain tuples: (kind, name, payload)) ----


def not_null(col: str):
    return ("not_null", f"not_null({col})", (col,))


def in_range(col: str, lo, hi):
    return ("in_range", f"in_range({col},{lo},{hi})", (col, lo, hi))


def matches(col: str, regex: str):
    return ("matches", f"matches({col})", (col, regex))


def in_set(col: str, values: tuple):
    return ("in_set", f"in_set({col})", (col, tuple(values)))


def unique(cols: tuple):
    cols = tuple(cols)
    return ("unique", f"unique({','.join(cols)})", cols)


def foreign_key(col: str, ref_df: DataFrame, ref_col: str, ref_name: str):
    return (
        "foreign_key",
        f"foreign_key({col}->{ref_name}.{ref_col})",
        (col, ref_df, ref_col),
    )


def _violation_expr(kind: str, payload) -> Column:
    if kind == "not_null":
        (col,) = payload
        return F.col(col).isNull()
    if kind == "in_range":
        col, lo, hi = payload
        return F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    if kind == "matches":
        col, regex = payload
        return F.col(col).isNotNull() & ~F.col(col).rlike(regex)
    if kind == "in_set":
        col, values = payload
        return F.col(col).isNotNull() & ~F.col(col).isin(*values)
    raise ValueError(f"not a row-local constraint: {kind}")


def constraint_audit(df: DataFrame, constraints) -> DataFrame:
    """One row per constraint: (rule, n_rows, n_violations).
    Row-local constraints share one scan/aggregate; see module doc for
    the per-kind costs."""
    if not constraints:
        raise ValueError("no constraints declared")
    row_local = [
        (name, _violation_expr(kind, payload))
        for kind, name, payload in constraints
        if kind not in ("unique", "foreign_key")
    ]
    pieces: list[DataFrame] = []
    if row_local:
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.sum(cond.cast("long")).cast("long").alias(f"v{i}")
                for i, (_, cond) in enumerate(row_local)
            ],
        )
        # one tiny row -> explode into one row per constraint via a
        # literal map (stack); stays a single job over a single scan
        stack = ", ".join(
            f"'{name}', v{i}" for i, (name, _) in enumerate(row_local)
        )
        pieces.append(
            agg.selectExpr(
                "n_rows",
                f"stack({len(row_local)}, {stack}) "
                "as (rule, n_violations)",
            ).select("rule", "n_rows", "n_violations")
        )
    for kind, name, payload in constraints:
        if kind == "unique":
            keys = list(payload)
            pieces.append(
                df.agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    (
                        F.count(F.lit(1))
                        - F.count_distinct(*[F.col(k) for k in keys])
                    )
                    .cast("long")
                    .alias("n_violations"),
                ).select(
                    F.lit(name).alias("rule"),
                    "n_rows",
                    "n_violations",
                )
            )
        elif kind == "foreign_key":
            col, ref_df, ref_col = payload
            n_rows = df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows")
            )
            dangling = (
                df.where(F.col(col).isNotNull())
                .join(
                    ref_df.select(F.col(ref_col).alias(col)).distinct(),
                    col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
            pieces.append(
                n_rows.crossJoin(dangling).select(
                    F.lit(name).alias("rule"),
                    "n_rows",
                    "n_violations",
                )
            )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# Benford first-digit expected shares in exact ppm: round(log10(1 +
# 1/d) * 1e6). CONSTANTS, not runtime libm — a log evaluated in-plan
# would put libm ulps inside a value oracle (the repo's no-libm
# discipline); the law's reference distribution is fixed, so it ships
# as literals both engines copy verbatim.
BENFORD_PPM = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
)


def benford_deviation(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit audit of a positive amount column
    against Benford's law — the classic fabricated-/synthetic-data
    screen for financial and count columns.

    The digit is taken STRING-wise (first character of the integer
    part) instead of via floor(x / 10^floor(log10 x)): both engines
    format integers identically, so the extraction is exact where the
    log form would round. Rows with amount < 1 are counted in a
    digit-0 accounting row (never silently dropped), excluded from the
    shares. Output: one row per digit 1-9 (dense spine) with n,
    obs_ppm (truncating div), exp_ppm (the constant), dev_ppm =
    |obs - exp|, plus the digit-0 row (NULL ppms).

    Scale shape: one hash aggregate to <= 10 cells; the total rides a
    broadcast back. Zero shuffles wider than the digit domain.
    """
    d = F.when(
        F.col(amount_col) >= 1,
        F.substring(
            F.floor(F.col(amount_col)).cast("bigint").cast("string"),
            1,
            1,
        ).cast("long"),
    ).otherwise(F.lit(0))
    cells = (
        df.select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = cells.sparkSession.range(10).select(
        F.col("id").alias("digit")
    )
    dense = spine.join(cells, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    tot = dense.where("digit >= 1").agg(F.sum("n").alias("_t"))
    exp_ppm = F.element_at(
        F.array(*[F.lit(p).cast("long") for p in BENFORD_PPM]),
        F.col("digit").cast("int"),
    )
    obs_ppm = F.when(
        (F.col("digit") >= 1) & (F.col("_t") > 0),
        F.call_function(
            "div", F.col("n") * F.lit(1_000_000), F.col("_t")
        ),
    )
    return (
        dense.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            obs_ppm.alias("obs_ppm"),
            F.when(F.col("digit") >= 1, exp_ppm).alias("exp_ppm"),
            F.when(
                F.col("digit") >= 1,
                F.abs(obs_ppm - exp_ppm),
            ).alias("dev_ppm"),
        )
    )
