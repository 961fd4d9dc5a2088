"""Survival analysis: recurrent-event spells + Nelson-Aalen hazard.

The retention question product analytics actually asks — "how long
until a user buys again, and is repurchase slowing down?" — is a
right-censored waiting-time problem: every purchase opens a spell
that either closes at the next purchase (observed) or is still open
when the corpus ends (censored). Dropping the open spells (the naive
GROUP BY gap average) biases the estimate toward short waits — the
users who never came back are exactly the signal.

Two operators:

* ``recurrent_spells`` builds the spell table: one ``lead`` window
  per entity (a single entity-keyed shuffle; the window's frame is
  one row) plus a single-row global-max aggregate broadcast back for
  the censoring boundary. Durations are exact integer units:
  ``(unix_seconds(next) - unix_seconds(open)) div unit_seconds`` —
  both floor-of-epoch subtraction and DuckDB's boundary-crossing
  ``date_diff('second', ...)`` compute the same integer, so the
  twin is engine-exact.

* ``nelson_aalen`` reduces spells to the hazard table. Only the
  per-distinct-duration rollup matters: one map-side-combined
  aggregate touches the spells; the at-risk/cumulative pass runs
  over the O(distinct durations) rollup (a bounded domain — unit
  quantization is the caller's scale knob, same contract as
  evaluation.roc_auc's score rollup). Convention: deaths at d
  precede censorings at d, so both count as at-risk at d.

      n_at_risk(d)    = N_total - sum_{d' < d} (events + censored)
      hazard_ppm(d)   = 1e6 * n_events(d) div n_at_risk(d)
      cum_hazard_micro = running sum of hazard_ppm  (Nelson-Aalen)

  All integer arithmetic: the per-step truncating division is the
  estimator's published form scaled by 1e6, and integer sums are
  associative — the cumulative is deterministic under any
  parallelism (no float cumprod; Kaplan-Meier's product form is NOT
  exactly representable, Nelson-Aalen's sum form is).

Reference parity note: the reference has no analytics surface; this
is curation/ops surface over the events table (the same family as
user_retention_cohorts — cohorts count WHO returns, hazard measures
WHEN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def recurrent_spells(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    event_filter=None,
    unit_seconds: int = 3600,
) -> DataFrame:
    """One row per spell: (entity, duration, observed). A spell opens
    at each qualifying event and closes at the entity's next one
    (observed=1) or at the corpus-wide max timestamp (observed=0,
    right-censored). ``duration`` is in whole ``unit_seconds`` units
    (truncating); same-second repeat purchases yield duration 0,
    which is a legal (immediately-terminated) spell."""
    if unit_seconds < 1:
        raise ValueError("unit_seconds must be >= 1")
    base = df.filter(
        F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    if event_filter is not None:
        base = base.filter(event_filter)
    base = base.select(
        F.col(entity_col).alias("_e"),
        F.unix_timestamp(F.col(ts_col)).alias("_sec"),
    )
    # censoring boundary: ONE single-row aggregate, broadcast back
    # (the standard corpus-scalar shape — not a driver collect)
    max_sec = base.agg(F.max("_sec").alias("_max_sec"))
    w = Window.partitionBy("_e").orderBy("_sec")
    spells = (
        base.withColumn("_next", F.lead("_sec").over(w))
        .join(F.broadcast(max_sec))
        .select(
            F.col("_e").alias(entity_col),
            # integer div, not double division + cast: at large epoch
            # magnitudes a double quotient's ulp exceeds 1/unit and
            # can misround across an integer boundary
            F.expr(
                f"(coalesce(_next, _max_sec) - _sec)"
                f" div {int(unit_seconds)}L"
            ).alias("duration"),
            F.col("_next").isNotNull().cast("int").alias("observed"),
        )
    )
    return spells


def nelson_aalen(
    spells: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Hazard table over a spell set: one row per distinct duration —
    (duration, n_at_risk, n_events, n_censored, hazard_ppm,
    cum_hazard_micro). The spells relation is touched by ONE
    aggregate; everything after runs on the O(distinct) rollup."""
    rollup = (
        spells.filter(
            F.col(duration_col).isNotNull()
            & F.col(observed_col).isNotNull()
        )
        .groupBy(F.col(duration_col).alias("duration"))
        .agg(
            F.sum(
                F.when(F.col(observed_col) == 1, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_events"),
            F.sum(
                F.when(F.col(observed_col) == 1, 0).otherwise(1)
            )
            .cast("long")
            .alias("n_censored"),
        )
    )
    w_before = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_upto = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    leave = F.col("n_events") + F.col("n_censored")
    at_risk = F.sum(leave).over(w_all) - F.coalesce(
        F.sum(leave).over(w_before), F.lit(0).cast("long")
    )
    hazard = F.expr("(1000000 * n_events) div n_at_risk")
    return (
        rollup.withColumn("n_at_risk", at_risk)
        .withColumn("hazard_ppm", hazard)
        .withColumn(
            "cum_hazard_micro", F.sum("hazard_ppm").over(w_upto)
        )
        .select(
            "duration",
            "n_at_risk",
            "n_events",
            "n_censored",
            "hazard_ppm",
            "cum_hazard_micro",
        )
    )
