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


def cuped_effect(
    events: DataFrame,
    cutoff: str,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    salt: str = "cuped",
) -> DataFrame:
    """CUPED variance-reduced A/B effect (Deng/Xu/Kohavi/Walker,
    WSDM'13): adjust each unit's post-period metric by its PRE-period
    metric before differencing arms —

        theta   = cov(x, y) / var(x)      (pooled over all units)
        y_adj_i = y_i - theta * (x_i - mean(x))
        effect  = mean(y_adj | treat) - mean(y_adj | control)

    with x = the unit's event count strictly before ``cutoff`` and
    y = its count at/after. Pre-period behavior is unaffected by
    treatment, so the adjustment shifts both arms identically in
    expectation (the estimator stays unbiased) while removing the
    rho^2 fraction of between-unit variance — the industry-standard
    sensitivity lever for exactly this exposure->outcome shape.

    Everything is EXACT integer/decimal arithmetic so the DuckDB twin
    is value-identical: theta is carried as the integer fraction
    (theta_num, theta_den) = (n*Sxy - Sx*Sy, n*Sxx - Sx^2), and the
    adjusted effect collapses to one rational

        [ (SyT*nC - SyC*nT) * theta_den
          - theta_num * (SxT*nC - SxC*nT) ]  /  (nT * nC * theta_den)

    (the mean(x) centering term cancels between arms). Reported ppm
    values use the repo's mirrored signed truncating division: both
    engines divide NON-NEGATIVE magnitudes (floor == truncate) and
    apply the sign separately. ``var_reduction_ppm`` is rho^2(x, y)
    in ppm via the two-step spearman order
    ``((|num|*1e6) div den_x) * |num| div den_y``. Zero pre-period
    variance (theta undefined) yields NULL theta/cuped columns; the
    raw effect still reports.

    Spark shape (100 TB):
      1. ONE unit-keyed aggregate (map-side partials; the shuffle
         carries O(units), not O(events)) builds (unit, x, y).
      2. Arm assignment is the row-local :func:`assign_arm` hash.
      3. ONE 2-row arm rollup carrying (n, Sx, Sy, Sxx, Sxy, Syy)
         per arm; the pooled statistics are conditional sums over
         those 2 rows — a final single-row aggregate. No joins, no
         windows, no second scan.

    Overflow: sums go through DECIMAL(38,0), but the adjusted-effect
    rational is the tight spot — ``eff_num = dy_cross*den -
    num*dx_cross`` scales ~n^4 * mean(y) * var(x) (NOT the earlier
    "under 1e25 at 1e9 units" claim, which ignored the n^4 growth:
    at 1e9 units averaging 1e4 events it is ~1e46+), and
    ``_signed_ppm`` multiplies by 1e6 again, so DECIMAL(38,0) can
    overflow from roughly 1e7-1e8 units at 1e4-event means. Under
    non-ANSI arithmetic that would silently NULL
    ``cuped_effect_ppm`` while theta/raw still report — so the
    select GUARDS in-plan: an overflow-minted NULL in the
    eff_num/eff_den/ppm chain (inputs are non-null by construction,
    so NULL there can only mean overflow) raises with a shard-or-
    subsample remedy instead of reporting a hole (the
    adjusted_rand_index convention).
    """
    d38 = "decimal(38,0)"
    u, t = F.col(unit_col), F.col(ts_col)
    per_unit = (
        events.filter(u.isNotNull() & t.isNotNull())
        .groupBy(u.alias("unit"))
        .agg(
            F.sum(F.when(t < F.lit(cutoff).cast("timestamp"), 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(t >= F.lit(cutoff).cast("timestamp"), 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    armed = per_unit.select(
        assign_arm(F.col("unit"), 2, salt).alias("arm"),
        F.col("x").cast(d38).alias("x"),
        F.col("y").cast(d38).alias("y"),
    )
    per_arm = armed.groupBy("arm").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def _arm(c: str, a: int) -> Column:
        # coalesce so a fully-filtered (empty) input reports integer
        # zeros like the DuckDB twin, not a row of NULL sums
        return F.coalesce(
            F.sum(
                F.when(F.col("arm") == a, F.col(c)).otherwise(
                    F.lit(0).cast(d38)
                )
            ),
            F.lit(0).cast(d38),
        )

    pooled = per_arm.agg(
        (_arm("n", 0) + _arm("n", 1)).alias("n"),
        _arm("n", 1).alias("n_treated"),
        _arm("n", 0).alias("n_control"),
        (_arm("sx", 0) + _arm("sx", 1)).alias("sx"),
        (_arm("sy", 0) + _arm("sy", 1)).alias("sy"),
        (_arm("sxx", 0) + _arm("sxx", 1)).alias("sxx"),
        (_arm("sxy", 0) + _arm("sxy", 1)).alias("sxy"),
        (_arm("syy", 0) + _arm("syy", 1)).alias("syy"),
        _arm("sx", 1).alias("sx_t"),
        _arm("sy", 1).alias("sy_t"),
        _arm("sx", 0).alias("sx_c"),
        _arm("sy", 0).alias("sy_c"),
    )

    def _signed_ppm(num: Column, den: Column) -> Column:
        """sign(num/den) * (|num| * 1e6) div |den| — NULL when den
        is 0. Both engines divide non-negative magnitudes."""
        mag = F.call_function(
            "div",
            (F.abs(num) * F.lit(1000000).cast(d38)).cast(d38),
            F.abs(den),
        )
        sign = (
            F.when((num > 0) == (den > 0), F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
        )
        return F.when(den != 0, sign * mag.cast("long"))

    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(d38)
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(d38)
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(d38)
    dy_cross = (
        F.col("sy_t") * F.col("n_control")
        - F.col("sy_c") * F.col("n_treated")
    ).cast(d38)
    dx_cross = (
        F.col("sx_t") * F.col("n_control")
        - F.col("sx_c") * F.col("n_treated")
    ).cast(d38)
    nn = (F.col("n_treated") * F.col("n_control")).cast(d38)
    eff_num = (dy_cross * den - num * dx_cross).cast(d38)
    eff_den = (nn * den).cast(d38)

    # rho^2 ppm, the guaranteed variance-reduction fraction: the
    # spearman two-step mirrored order over non-negative operands
    a_step = F.call_function(
        "div", (F.abs(num) * F.lit(1000000).cast(d38)).cast(d38), den
    )
    rho2 = F.call_function(
        "div", (a_step * F.abs(num)).cast(d38), deny
    )

    both = (F.col("n_treated") > 0) & (F.col("n_control") > 0)
    return pooled.select(
        F.col("n").cast("long").alias("n_units"),
        F.col("n_treated").cast("long").alias("n_treated"),
        F.col("n_control").cast("long").alias("n_control"),
        num.alias("theta_num"),
        den.alias("theta_den"),
        _signed_ppm(num, den).alias("theta_ppm"),
        F.when(both, _signed_ppm(dy_cross, nn)).alias("raw_effect_ppm"),
        F.when(
            both & (den != 0),
            # overflow guard: every input to the adjusted-effect
            # rational is non-null by construction (coalesced sums),
            # so a NULL in eff_num/eff_den or in the ppm quotient can
            # only be DECIMAL(38,0) overflow of the ~n^4 cross-terms
            # — raise in-plan instead of silently NULLing the one
            # column this operator exists to produce
            F.when(
                eff_num.isNull()
                | eff_den.isNull()
                | ((eff_den != 0)
                   & _signed_ppm(eff_num, eff_den).isNull()),
                F.raise_error(
                    F.lit(
                        "cuped_effect: adjusted-effect rational "
                        "overflows DECIMAL(38,0) (~n^4 cross-terms); "
                        "compute per-shard or subsample units"
                    )
                ).cast("long"),
            ).otherwise(_signed_ppm(eff_num, eff_den)),
        ).alias("cuped_effect_ppm"),
        F.when(
            (den > 0) & (deny > 0), rho2.cast("long")
        ).alias("var_reduction_ppm"),
    )


# chi-square upper critical values in ppm for the SRM convention
# alpha = 0.001 (Fabijan et al., "Diagnosing Sample Ratio Mismatch",
# KDD'19 — SRM alerts use a deliberately tight alpha because the test
# runs on every experiment every day). Irrational values, pinned as
# literals to 6 decimals; df = n_arms - 1.
_CHI2_CRIT_PPM_001 = {
    1: 10_827_566,
    2: 13_815_511,
    3: 16_266_236,
    4: 18_466_827,
    5: 20_515_006,
    6: 22_457_744,
    7: 24_321_886,
    8: 26_124_482,
    9: 27_877_165,
}


def srm_check(
    assignments: DataFrame,
    exp_col: str = "experiment",
    arm_col: str = "arm",
    weights: dict[str, int] | None = None,
    crit_ppm: int | None = None,
) -> DataFrame:
    """Sample-ratio-mismatch gate: per experiment, Pearson's
    chi-square of observed per-arm unit counts against the DESIGNED
    integer ratio, in exact micro-units.

    ``assignments`` is one row per (experiment, unit) with its arm;
    ``weights`` maps every designed arm name to its integer ratio
    weight (default 1:1 over the arms present in the data is NOT
    inferred — SRM is precisely the test that the data no longer
    reflects the design, so the design must come from the caller).

    With W = sum(weights) and N = units observed in the experiment,
    the exact per-arm Pearson term is

        (obs*W - N*w)^2 / (W*N*w)

    carried as DECIMAL(38,0) cross-products with ONE truncating
    division per arm at ppm scale, spelled ``(num - num % den) / den``
    so the quotient STAYS decimal — Spark's ``div`` operator returns
    BIGINT and silently overflows past 9.2e18, which a squared
    38-digit cross-product exceeds (probed); the subtracted-remainder
    form divides exactly and equals DuckDB's HUGEINT ``//`` for the
    non-negative operands here. chi2_ppm is engine-identical to the
    last digit. A designed arm
    with zero observed units still contributes its term (that is the
    strongest possible mismatch) via the experiments x arms literal
    spine, and units observed in arms the design does NOT know are
    counted per experiment as ``n_undesigned`` and flag
    unconditionally — corrupted assignment logging is itself a
    mismatch and must not silently fall out of N (chi2 stays over
    the designed arms; NULL if an experiment has no designed units).
    ``srm_flag`` is (chi2 > crit) OR n_undesigned > 0, with the
    alpha=0.001 critical value for df = n_arms - 1 (Fabijan et al.,
    KDD'19).

    Scale shape: one (experiment, arm) count aggregate over the
    assignment table, then everything is O(experiments x arms) — the
    designed-arm spine is a literal crossJoin on the tiny grouped
    side, never on units.
    """
    if not weights:
        raise ValueError("weights: designed arm -> integer ratio required")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    df = len(weights) - 1
    if df < 1:
        raise ValueError("SRM needs >= 2 designed arms")
    if crit_ppm is None:
        if df not in _CHI2_CRIT_PPM_001:
            raise ValueError(
                f"no built-in alpha=0.001 critical value for df={df}; "
                f"pass crit_ppm explicitly"
            )
        crit_ppm = _CHI2_CRIT_PPM_001[df]
    total_w = sum(weights.values())

    obs = (
        assignments.groupBy(exp_col, arm_col)
        .agg(F.count(F.lit(1)).alias("obs"))
        # three consumers (experiment spine, designed join, rogue-arm
        # rollup): persist so the corpus aggregate runs once per
        # action; the mark is O(experiments x arms)
        .persist()
    )
    designed_lits = [F.lit(a) for a in weights]
    # units in arms the DESIGN does not know are themselves a
    # sample-ratio mismatch (corrupted assignment logging) — they must
    # flag, not silently fall out of N
    rogue = (
        obs.where(~F.col(arm_col).isin(*designed_lits))
        .groupBy(exp_col)
        .agg(F.sum("obs").cast("long").alias("n_undesigned"))
    )
    design = F.explode(
        F.map_from_arrays(
            F.array(*designed_lits),
            F.array(*[F.lit(w) for w in weights.values()]),
        )
    )
    spine = (
        obs.select(exp_col)
        .distinct()
        .select(exp_col, design.alias(arm_col, "w"))
    )
    dec = "decimal(38,0)"
    joined = (
        spine.join(obs, [exp_col, arm_col], "left")
        .select(
            exp_col,
            arm_col,
            "w",
            F.coalesce("obs", F.lit(0)).cast("long").alias("obs"),
        )
        .withColumn(
            "n", F.sum("obs").over(Window.partitionBy(exp_col))
        )
    )
    num = (
        f"((cast(obs as {dec}) * {total_w} - cast(n as {dec}) * w)"
        f" * (cast(obs as {dec}) * {total_w} - cast(n as {dec}) * w)"
        f" * 1000000)"
    )
    den = f"(cast({total_w} as {dec}) * n * w)"
    # n = 0 (an experiment whose every unit sits in an undesigned
    # arm) must not reach the remainder: DECIMAL % 0 throws even
    # under non-ANSI arithmetic
    term = F.expr(
        f"CASE WHEN n > 0 THEN"
        f" cast(({num} - {num} % {den}) / {den} as {dec}) END"
    )
    per_exp = (
        joined.select(exp_col, "n", term.alias("term"))
        .groupBy(exp_col)
        .agg(
            F.max("n").alias("n_units"),
            # chi2 NULL when the experiment has no designed units at
            # all (n = 0 -> every term NULL); the rogue count still
            # fires the flag below
            F.when(
                F.max("n") > 0, F.sum("term").cast("decimal(38,0)")
            ).alias("chi2_ppm"),
        )
    )
    return per_exp.join(rogue, exp_col, "full").select(
        exp_col,
        F.coalesce(F.col("n_units"), F.lit(0))
        .cast("long")
        .alias("n_units"),
        F.coalesce("n_undesigned", F.lit(0)).alias("n_undesigned"),
        "chi2_ppm",
        F.lit(df).cast("integer").alias("df"),
        F.coalesce(
            (F.col("chi2_ppm") > F.lit(crit_ppm))
            | (F.coalesce("n_undesigned", F.lit(0)) > 0),
            F.lit(False),
        ).alias("srm_flag"),
    )
