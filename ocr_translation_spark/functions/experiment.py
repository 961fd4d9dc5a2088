"""Deterministic online-controlled-experiment (A/B) analysis.

Every large experimentation platform assigns units to arms by HASHING
the unit id, not by RNG (Kohavi/Tang/Xu, "Trustworthy Online
Controlled Experiments": hash-and-bucket assignment is what makes
exposure reproducible across services, replays, and engines). The
same property makes the analysis oracle-able: with

    arm(u) = sha256("<salt>:" || u) taken as a 60-bit integer, mod k

any engine reproduces the split bit-for-bit — the DuckDB twin spells
the identical arithmetic — and re-running the report over a grown log
never reassigns a user (the resumability property RNG splits lack).

The report is the standard exposure->conversion funnel:

* a unit is EXPOSED if it has >= 1 exposure event; its exposure time
  is the FIRST such event;
* it CONVERTED if it has >= 1 conversion event AT OR AFTER first
  exposure — note ``max(conversion ts) >= min(exposure ts)`` decides
  that with two plain aggregates (a conversion after first exposure
  exists iff the LAST conversion is at/after the FIRST exposure), so
  the whole per-unit pass is ONE groupBy, no self-join, no window;
* per-arm conversion rate is reported in exact truncating ppm, and
  ``beats_control`` is the cross-multiplied integer comparison
  ``conv_a * exposed_ctrl > conv_ctrl * exposed_a`` — no division, no
  float, engine-identical. (Significance testing needs sqrt/normal
  tails — floats — so it is deliberately out of the exact contract;
  the counts this emits are the sufficient statistics for it.)

Spark shape (100 TB):
  1. ONE unit-keyed aggregation shuffle builds (unit, first_exposure,
     last_conversion) — partials collapse map-side, so the shuffle
     carries O(distinct units), not O(events).
  2. Arm assignment is a row-local hash — zero shuffle.
  3. The arm rollup is a k-row aggregate; the control row is pulled
     alongside every arm with an UNPARTITIONED window over those k
     rows (k = n_arms, bounded — the single-partition exchange moves
     n_arms rows, not data). A broadcast self-join would compute the
     unit-keyed aggregate TWICE (measured: 4 warm shuffles instead of
     3, with the corpus-sized unit shuffle duplicated); the window
     keeps it to one pass. A missing control arm yields NULL
     beats_control rather than silently dropping the report.

Overflow headroom: counts are longs; ``n_converted * 1_000_000`` and
the cross products hold to ~9.2e12 exposed units per arm — beyond a
1e12-document corpus's user base. Widen to DECIMAL(38,0) past that.

Reference parity note: the reference has no experimentation plane;
this is the corpus-operations view its pipeline metrics would feed
("did the new OCR model version convert more uploads to completed
translations than the old one?").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ocr_translation_spark.functions.sketches import hash60


def assign_arm(unit: Column, n_arms: int, salt: str = "arm") -> Column:
    """Deterministic arm in [0, n_arms): 60-bit sha256 hash of the
    salted unit id, mod n_arms. The salt domain-separates concurrent
    experiments over the same unit population (standard practice —
    without it every experiment would split users identically).
    DuckDB twin: ``('0x' || substr(sha256('<salt>:' || u::VARCHAR),
    1, 15))::UBIGINT % n_arms``."""
    return hash60(
        F.concat(F.lit(salt + ":"), unit.cast("string"))
    ) % n_arms


def ab_experiment_report(
    events: DataFrame,
    n_arms: int = 2,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    exposure: str = "view",
    conversion: str = "purchase",
    salt: str = "arm",
) -> DataFrame:
    """(arm, n_exposed, n_converted, cvr_ppm, beats_control) per arm
    with >= 1 exposed unit. Arm 0 is the control; its own
    beats_control is false by definition. cvr_ppm is the exact
    truncating integer ``n_converted * 1e6 div n_exposed``."""
    u, t, e = F.col(unit_col), F.col(ts_col), F.col(type_col)
    per_unit = (
        events.filter(u.isNotNull() & t.isNotNull())
        .groupBy(u.alias("unit"))
        .agg(
            F.min(F.when(e == exposure, t)).alias("first_exp"),
            F.max(F.when(e == conversion, t)).alias("last_conv"),
        )
        .filter(F.col("first_exp").isNotNull())
    )
    converted = (
        F.col("last_conv").isNotNull()
        & (F.col("last_conv") >= F.col("first_exp"))
    ).cast("long")
    per_arm = (
        per_unit.select(
            assign_arm(F.col("unit"), n_arms, salt).alias("arm"),
            converted.alias("conv"),
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_exposed"),
            F.sum("conv").alias("n_converted"),
        )
    )
    wall = Window.partitionBy()  # n_arms rows total
    joined = per_arm.select(
        "arm",
        "n_exposed",
        "n_converted",
        F.max(
            F.when(F.col("arm") == 0, F.col("n_exposed"))
        )
        .over(wall)
        .alias("ctrl_exposed"),
        F.max(
            F.when(F.col("arm") == 0, F.col("n_converted"))
        )
        .over(wall)
        .alias("ctrl_converted"),
    )
    return joined.select(
        "arm",
        "n_exposed",
        "n_converted",
        F.call_function(
            "div", F.col("n_converted") * 1000000, F.col("n_exposed")
        ).alias("cvr_ppm"),
        F.when(F.col("arm") == 0, F.lit(False))
        .otherwise(
            F.col("n_converted") * F.col("ctrl_exposed")
            > F.col("ctrl_converted") * F.col("n_exposed")
        )
        .alias("beats_control"),
    )


def stratified_effect(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    strata_cols: tuple[str, ...],
) -> DataFrame:
    """Post-stratified treatment-effect table — the causal estimator
    for OBSERVATIONAL exposure, where assignment rates differ by
    stratum and the naive pooled difference is confounded (Simpson's
    pattern). Within a stratum the assignment is as-good-as-random,
    so the stratum-wise difference of means is unbiased and the
    N_s/N-weighted sum is the ATE (identical to inverse-propensity
    weighting when the propensity is estimated as the stratum
    treatment share — the horvitz-thompson terms telescope).

    One hash aggregate over the corpus (5 counters per stratum), then
    exact integer arithmetic on the O(strata) rollup:

      y1_mean_ppm  = 1e6 * y1_sum div n_treated     (NULL if no t)
      y0_mean_ppm  = 1e6 * y0_sum div n_control     (NULL if no c)
      effect_ppm   = y1_mean_ppm - y0_mean_ppm      (NULL if either)
      weight_ppm   = 1e6 * n div N   (N via a window over the rollup)
      contrib_micro = (effect_ppm * n) div N  — summing this column
        IS the post-stratified ATE estimate in micro units.

    Outcomes must be integer-valued (binary or counts); fractional
    outcomes should be pre-scaled to integers by the caller — the
    whole point is engine-exact sums. Products go through
    DECIMAL(38,0) (effect * n overflows BIGINT past ~9e12-row
    strata).
    """
    gcols = [F.col(c) for c in strata_cols]
    base = df.select(
        *gcols,
        F.col(treat_col).cast("int").alias("_t"),
        F.col(outcome_col).cast("long").alias("_y"),
    ).filter(
        F.col("_t").isNotNull() & F.col("_y").isNotNull()
    )
    roll = base.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("_t") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treated"),
        F.sum(F.when(F.col("_t") == 1, F.col("_y")).otherwise(0))
        .cast("long")
        .alias("_y1"),
        F.sum(F.when(F.col("_t") == 1, 0).otherwise(F.col("_y")))
        .cast("long")
        .alias("_y0"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        roll.withColumn("_N", F.sum("n").over(w_all))
        .withColumn("n_control", F.col("n") - F.col("n_treated"))
        .withColumn(
            "y1_mean_ppm",
            F.expr(
                "case when n_treated > 0 then"
                " cast((cast(_y1 as decimal(38,0))"
                " * cast(1000000 as decimal(38,0)))"
                " div cast(n_treated as decimal(38,0)) as long) end"
            ),
        )
        .withColumn(
            "y0_mean_ppm",
            F.expr(
                "case when n_control > 0 then"
                " cast((cast(_y0 as decimal(38,0))"
                " * cast(1000000 as decimal(38,0)))"
                " div cast(n_control as decimal(38,0)) as long) end"
            ),
        )
        .withColumn(
            "effect_ppm", F.col("y1_mean_ppm") - F.col("y0_mean_ppm")
        )
        .withColumn(
            "weight_ppm",
            F.expr(
                "cast((cast(n as decimal(38,0))"
                " * cast(1000000 as decimal(38,0)))"
                " div cast(_N as decimal(38,0)) as long)"
            ),
        )
        .withColumn(
            "contrib_micro",
            F.expr(
                "case when effect_ppm is not null then"
                " cast((cast(effect_ppm as decimal(38,0))"
                " * cast(n as decimal(38,0)))"
                " div cast(_N as decimal(38,0)) as long) end"
            ),
        )
        .select(
            *strata_cols,
            "n",
            "n_treated",
            "n_control",
            "y1_mean_ppm",
            "y0_mean_ppm",
            "effect_ppm",
            "weight_ppm",
            "contrib_micro",
        )
    )
