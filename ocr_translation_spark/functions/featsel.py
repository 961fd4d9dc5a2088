"""Chi-squared feature/label association scores in exact integers.

The classic filter-method feature-selection statistic (chi-squared
test of independence over the feature x label contingency table),
computed per feature value so a curation pipeline can rank which
sources / domains / tags are most predictive of a label (language,
quality bucket, spam flag) — and drop or stratify the rest.

For cell (f, l) with observed count O, row total R_f, column total
C_l and corpus size N, the textbook term is (O - E)^2 / E with
E = R_f * C_l / N.  Multiplying through by N gives the all-integer
form used here:

    d       = O * N - R_f * C_l
    cell    = (d * d) div (R_f * C_l)          -- exact when O = 0
    chi2_mu = (sum_l cell) * 1e6 div N         -- micro-units

Every step is DECIMAL(38,0) integer arithmetic with truncating
division (`div` / DuckDB HUGEINT `//`), so the DuckDB twin is
value-identical. ZERO cells matter: a label absent under a feature
value has d = -R*C and cell = R*C exactly — skipping absent cells
understates the statistic, so the grid is completed before scoring.

Headroom: |d| <= N^2 must fit DECIMAL(38,0)/HUGEINT after squaring,
i.e. exact to N ~ 3e9 rows per audited table. Past that, score a
deterministic hash-stratified sample (functions/sampling.py) or
pre-bucket the label — the statistic is count-based, so counts from
a 1-in-k systematic sample rescale exactly.

Spark shape (100 TB):
  ONE corpus shuffle — the (feature, label) cell aggregation, with
  map-side partial aggregation collapsing the fan-in. Everything
  after runs on the O(|F| x |L|) cell table: the margins are
  re-aggregations of the cells (never a second corpus scan), the
  zero-cell completion is a label-side broadcast row-multiply of the
  feature margins (a BroadcastNestedLoopJoin over the |L|-row and
  1-row tables — bounded by construction, not a corpus cartesian),
  and N is one single-row aggregate broadcast back (the bm25_topk
  corpus-stats pattern). tools/plan_stats.py shows the residual
  shuffles are all on the cell/margin tables, whose size is
  independent of corpus row count (|F| scales with distinct feature
  values only — e.g. domains — and the grid join shuffles THAT, the
  right cost at scale).

Reference parity note: the reference routes documents by MIME type
only (`src/controllers/pdf.js` file-type gates). Chi-squared scoring
is the corpus-level generalization: measure which metadata features
actually co-vary with the outcome before using them as routing keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "DECIMAL(38,0)"


def chi2_feature_scores(
    df: DataFrame,
    feature_col: str,
    label_col: str,
) -> DataFrame:
    """(feature_value, n_rows, chi2_micro) per distinct feature value.

    ``chi2_micro`` is the chi-squared statistic of the feature-value
    row against the label distribution, in exact micro-units; rank
    descending to get the most label-associated feature values. NULL
    feature / label values are first-class categories (groupBy keeps
    them), matching DuckDB GROUP BY semantics.
    """
    cells = df.groupBy(
        F.col(feature_col).alias("feature_value"),
        F.col(label_col).alias("_label"),
    ).agg(F.count(F.lit(1)).cast(_DEC).alias("_o"))

    # margins + N are re-aggregations of the tiny cell table — the
    # corpus is scanned exactly once, above.
    feats = cells.groupBy("feature_value").agg(
        F.sum("_o").cast(_DEC).alias("_r")
    )
    labs = cells.groupBy("_label").agg(F.sum("_o").cast(_DEC).alias("_c"))
    n = cells.agg(F.sum("_o").cast(_DEC).alias("_n"))

    # complete the grid: absent (feature, label) cells score too.
    # NULL-SAFE join keys: groupBy keeps NULL feature/label values as
    # first-class categories, and a plain-equality rejoin would
    # silently zero their observed counts (inflating every feature's
    # statistic); the DuckDB twin mirrors with IS NOT DISTINCT FROM.
    cells_r = cells.select(
        F.col("feature_value").alias("_fv"),
        F.col("_label").alias("_lb"),
        "_o",
    )
    grid = (
        feats.crossJoin(F.broadcast(labs))
        .join(
            cells_r,
            F.col("feature_value").eqNullSafe(F.col("_fv"))
            & F.col("_label").eqNullSafe(F.col("_lb")),
            "left",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "feature_value",
            "_r",
            "_n",
            (
                F.coalesce(F.col("_o"), F.lit(0).cast(_DEC)) * F.col("_n")
                - F.col("_r") * F.col("_c")
            ).alias("_d"),
            (F.col("_r") * F.col("_c")).alias("_rc"),
        )
    )
    cell_term = F.call_function("div", F.col("_d") * F.col("_d"), F.col("_rc"))
    return (
        grid.groupBy("feature_value")
        .agg(
            F.max("_r").cast("long").alias("n_rows"),
            F.max("_n").alias("_n_max"),
            # div returns LONG; re-widen before the corpus-size product
            F.sum(cell_term.cast(_DEC)).alias("_s"),
        )
        .select(
            "feature_value",
            "n_rows",
            F.call_function(
                "div",
                F.col("_s") * F.lit(1000000).cast(_DEC),
                F.col("_n_max"),
            )
            .cast("long")
            .alias("chi2_micro"),
        )
    )
