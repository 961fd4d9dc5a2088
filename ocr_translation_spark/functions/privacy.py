"""k-anonymity / l-diversity audit over quasi-identifier groups.

Privacy accounting for a corpus about to be released or used for
training: group rows by their quasi-identifier (QI) combination and
report, per equivalence class,

  * ``group_size``          — rows sharing the QI values,
  * ``n_sensitive_distinct``— distinct sensitive values in the class,
  * ``k_violation``         — group_size < k  (re-identification risk:
                              the class is too small to hide in),
  * ``l_violation``         — n_sensitive_distinct < l (attribute
                              disclosure: everyone in the class shares
                              the sensitive value),

so ``sum(group_size) where k_violation`` is exactly the row count a
suppression pass would drop (Sweeney, IJUFKS 2002; Machanavajjhala et
al., ICDE 2006 for l-diversity).

Spark shape (100 TB):
  Both statistics come from one groupBy (``count`` +
  ``countDistinct``); Spark plans countDistinct as the standard
  two-phase aggregate — a partial agg keyed (QI, sensitive), then the
  QI-keyed final — so the corpus is scanned ONCE and shuffled twice
  on uniformly mixed keys (warm_shuffles = 2 via tools/plan_stats.py;
  no join, no second scan). Output cardinality is O(distinct QI
  combinations) — the audit table, not the corpus. Flags are
  row-local comparisons against literals.

Everything is exact integer arithmetic — the DuckDB twin is
value-identical by construction.

Reference parity note: the reference redacts nothing — it stores raw
OCR text keyed by content hash (`src/services/ocr.js`). This audit is
the release gate a real corpus pipeline needs before that text leaves
the pipeline, composing with functions/pii.py (scrub first, then
audit what remains).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Column, functions as F


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: Sequence[str | Column],
    sensitive_col: str | Column,
    k: int,
    l: int,
) -> DataFrame:
    """One row per QI equivalence class with size / diversity flags.

    ``qi_cols`` may be raw columns or generalization expressions
    (banded numerics, truncated dates) — generalization IS the k-
    anonymity remediation, so the audit accepts it inline. Aliased
    expressions keep their alias; raw strings keep their name.
    """
    if k < 1 or l < 1:
        raise ValueError(f"k and l must be >= 1 (got k={k}, l={l})")
    qi = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    sens = (
        F.col(sensitive_col)
        if isinstance(sensitive_col, str)
        else sensitive_col
    )
    sel = df.select(*qi, sens.alias("_sens"))
    qi_names = sel.columns[:-1]  # the names the QI expressions landed under
    return (
        sel.groupBy(*qi_names)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("_sens").alias("n_sensitive_distinct"),
        )
        .withColumn("k_violation", F.col("group_size") < F.lit(k))
        .withColumn(
            "l_violation", F.col("n_sensitive_distinct") < F.lit(l)
        )
    )
