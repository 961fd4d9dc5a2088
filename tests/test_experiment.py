"""Unit tests for deterministic A/B experiment analysis
(functions/experiment.py): hand-computed conversion semantics
(post-exposure rule, pre-exposure conversions ignored, unexposed
units excluded), pure-Python sha-parity for the arm assignment,
subset-stability (the reproducibility RNG splits lack), salt domain
separation, exact ppm rates, and the cross-multiplied control
comparison including the missing-control edge."""

import datetime
import hashlib

from pyspark.sql import functions as F

from ocr_translation_spark.functions.experiment import (
    ab_experiment_report,
    assign_arm,
)


def _arm_py(unit, n_arms, salt="arm"):
    h = hashlib.sha256(f"{salt}:{unit}".encode()).hexdigest()
    return int(h[:15], 16) % n_arms


def _t(day, sec=0):
    return datetime.datetime(2024, 1, day, 0, 0, sec)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_conversion_semantics(spark):
    rows = [
        # converted: purchase strictly after first view
        (1, _t(1), "view"),
        (1, _t(2), "purchase"),
        # NOT converted: only purchase is BEFORE first exposure
        (2, _t(3), "purchase"),
        (2, _t(4), "view"),
        # exposed, never converted
        (3, _t(1), "view"),
        # not exposed at all (conversion without exposure)
        (4, _t(1), "purchase"),
        # converted at the exact exposure instant (>= rule)
        (5, _t(6), "view"),
        (5, _t(6), "purchase"),
        # NULL unit excluded
        (None, _t(1), "view"),
    ]
    out = ab_experiment_report(_events(spark, rows), n_arms=2)
    got = {r["arm"]: r for r in out.collect()}

    exp = {}
    for u, conv in [(1, 1), (2, 0), (3, 0), (5, 1)]:
        a = _arm_py(u, 2)
        e = exp.setdefault(a, [0, 0])
        e[0] += 1
        e[1] += conv
    assert set(got) == set(exp)
    for a, (n_exp, n_conv) in exp.items():
        assert got[a]["n_exposed"] == n_exp
        assert got[a]["n_converted"] == n_conv
        assert got[a]["cvr_ppm"] == (n_conv * 1000000) // n_exp
    # control never beats itself
    if 0 in got:
        assert got[0]["beats_control"] is False


def test_assignment_matches_python_and_is_subset_stable(spark):
    units = list(range(200))
    df = spark.createDataFrame([(u,) for u in units], "unit long")
    got = {
        r["unit"]: r["a"]
        for r in df.select(
            "unit", assign_arm(F.col("unit"), 10).alias("a")
        ).collect()
    }
    for u in units:
        assert got[u] == _arm_py(u, 10)
    # subset stability is immediate from per-row hashing; pin it
    sub = {
        r["unit"]: r["a"]
        for r in df.filter(F.col("unit") % 3 == 0)
        .select("unit", assign_arm(F.col("unit"), 10).alias("a"))
        .collect()
    }
    assert all(got[u] == a for u, a in sub.items())


def test_salt_domain_separation(spark):
    units = list(range(64))
    df = spark.createDataFrame([(u,) for u in units], "unit long")
    both = df.select(
        assign_arm(F.col("unit"), 2, salt="exp_a").alias("a"),
        assign_arm(F.col("unit"), 2, salt="exp_b").alias("b"),
    ).collect()
    # with 64 units the chance two independent fair splits agree
    # everywhere is 2^-64 — any disagreement proves separation
    assert any(r["a"] != r["b"] for r in both)


def test_beats_control_cross_multiplied(spark):
    # engineer arms: arm-0 (control) converts 1/2, another arm 2/2
    units_by_arm = {0: [], 1: []}
    u = 0
    while len(units_by_arm[0]) < 2 or len(units_by_arm[1]) < 2:
        units_by_arm.setdefault(_arm_py(u, 2), []).append(u)
        u += 1
    c0, c1 = units_by_arm[0][:2], units_by_arm[1][:2]
    rows = []
    for unit in c0 + c1:
        rows.append((unit, _t(1), "view"))
    rows.append((c0[0], _t(2), "purchase"))  # control: 1/2
    rows.append((c1[0], _t(2), "purchase"))  # treatment: 2/2
    rows.append((c1[1], _t(2), "purchase"))
    out = {
        r["arm"]: r
        for r in ab_experiment_report(
            _events(spark, rows), n_arms=2
        ).collect()
    }
    assert out[0]["beats_control"] is False
    assert out[1]["beats_control"] is True
    assert out[0]["cvr_ppm"] == 500000
    assert out[1]["cvr_ppm"] == 1000000


def test_missing_control_yields_null_not_empty(spark):
    # only units hashing to arm 1 are exposed: the report must keep
    # the arm-1 row with NULL beats_control (never silently drop it)
    u = 0
    while _arm_py(u, 2) != 1:
        u += 1
    out = ab_experiment_report(
        _events(spark, [(u, _t(1), "view")]), n_arms=2
    ).collect()
    assert len(out) == 1
    assert out[0]["arm"] == 1
    assert out[0]["beats_control"] is None


# --- stratified_effect -------------------------------------------------


def test_stratified_effect_simpsons_reversal(spark):
    """Planted Simpson's pattern: within each stratum treatment HELPS
    (+), but treated units concentrate in the low-outcome stratum so
    the pooled difference is NEGATIVE — the stratified table must
    recover the positive per-stratum effects."""
    from ocr_translation_spark.functions.experiment import (
        stratified_effect,
    )

    rows = []
    # stratum A (low base rate): 80 treated (25% y), 20 control (10% y)
    rows += [("A", 1, 1 if i < 20 else 0) for i in range(80)]
    rows += [("A", 0, 1 if i < 2 else 0) for i in range(20)]
    # stratum B (high base rate): 20 treated (90% y), 80 control (75% y)
    rows += [("B", 1, 1 if i < 18 else 0) for i in range(20)]
    rows += [("B", 0, 1 if i < 60 else 0) for i in range(80)]
    df = spark.createDataFrame(rows, "s string, t int, y int")
    got = {
        r["s"]: r for r in stratified_effect(df, "t", "y", ("s",)).collect()
    }
    assert got["A"]["effect_ppm"] == 250000 - 100000
    assert got["B"]["effect_ppm"] == 900000 - 750000
    # pooled naive difference is negative (Simpson's reversal)
    y1 = sum(y for _, t, y in rows if t == 1)
    n1 = sum(1 for _, t, _ in rows if t == 1)
    y0 = sum(y for _, t, y in rows if t == 0)
    n0 = sum(1 for _, t, _ in rows if t == 0)
    assert y1 * n0 < y0 * n1
    # per-stratum bookkeeping
    assert (got["A"]["n"], got["A"]["n_treated"], got["A"]["n_control"]) == (
        100, 80, 20,
    )
    assert got["A"]["weight_ppm"] == 500000
    assert got["A"]["contrib_micro"] == (150000 * 100) // 200
    # summing contrib_micro IS the post-stratified ATE
    ate = sum(r["contrib_micro"] for r in got.values())
    assert ate == (150000 * 100) // 200 + (150000 * 100) // 200


def test_stratified_effect_one_armed_strata_null(spark):
    from ocr_translation_spark.functions.experiment import (
        stratified_effect,
    )

    rows = [("T", 1, 1), ("T", 1, 0), ("C", 0, 1)]
    df = spark.createDataFrame(rows, "s string, t int, y int")
    got = {
        r["s"]: r for r in stratified_effect(df, "t", "y", ("s",)).collect()
    }
    assert got["T"]["y1_mean_ppm"] == 500000
    assert got["T"]["y0_mean_ppm"] is None
    assert got["T"]["effect_ppm"] is None
    assert got["T"]["contrib_micro"] is None
    assert got["C"]["y1_mean_ppm"] is None


def test_stratified_effect_randomized_python_parity(spark):
    import random

    from ocr_translation_spark.functions.experiment import (
        stratified_effect,
    )

    rng = random.Random(20260819)
    rows = [
        (
            "s%d" % (i % 4),
            rng.randint(0, 1),
            rng.randint(0, 3),  # integer count outcome, not just 0/1
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "s string, t int, y int")
    got = {
        r["s"]: r for r in stratified_effect(df, "t", "y", ("s",)).collect()
    }
    N = len(rows)
    for stratum in ("s0", "s1", "s2", "s3"):
        sub = [(t, y) for s, t, y in rows if s == stratum]
        nt = sum(1 for t, _ in sub if t == 1)
        nc = len(sub) - nt
        y1 = sum(y for t, y in sub if t == 1)
        y0 = sum(y for t, y in sub if t == 0)
        m1 = 1000000 * y1 // nt
        m0 = 1000000 * y0 // nc
        eff = m1 - m0
        contrib = (
            abs(eff) * len(sub) // N * (1 if eff >= 0 else -1)
            if eff >= 0
            else -((-eff) * len(sub) // N)
        )
        r = got[stratum]
        assert (r["n"], r["n_treated"], r["n_control"]) == (
            len(sub), nt, nc,
        )
        assert (r["y1_mean_ppm"], r["y0_mean_ppm"]) == (m1, m0)
        assert r["effect_ppm"] == eff
        assert r["weight_ppm"] == 1000000 * len(sub) // N
        assert r["contrib_micro"] == contrib, (stratum, r, contrib)


# ---------------------------------------------------------------- CUPED


def _cuped_py(unit_xy, salt="cuped"):
    """Exact-Fraction mirror of cuped_effect over (unit -> (x, y))."""
    from fractions import Fraction

    def trunc_ppm(num, den):
        if den == 0:
            return None
        sign = 1 if (num > 0) == (den > 0) else -1
        return sign * (abs(num) * 1000000 // abs(den))

    arms = {u: _arm_py(u, 2, salt) for u in unit_xy}
    n = len(unit_xy)
    sx = sum(x for x, _ in unit_xy.values())
    sy = sum(y for _, y in unit_xy.values())
    sxx = sum(x * x for x, _ in unit_xy.values())
    sxy = sum(x * y for x, y in unit_xy.values())
    syy = sum(y * y for _, y in unit_xy.values())
    n_t = sum(1 for u in unit_xy if arms[u] == 1)
    n_c = n - n_t
    sx_t = sum(x for u, (x, _) in unit_xy.items() if arms[u] == 1)
    sy_t = sum(y for u, (_, y) in unit_xy.items() if arms[u] == 1)
    sx_c, sy_c = sx - sx_t, sy - sy_t
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    deny = n * syy - sy * sy
    dyc = sy_t * n_c - sy_c * n_t
    dxc = sx_t * n_c - sx_c * n_t
    nn = n_t * n_c
    out = {
        "n_units": n, "n_treated": n_t, "n_control": n_c,
        "theta_num": num, "theta_den": den,
        "theta_ppm": trunc_ppm(num, den),
        "raw_effect_ppm": (
            trunc_ppm(dyc, nn) if n_t > 0 and n_c > 0 else None
        ),
        "cuped_effect_ppm": (
            trunc_ppm(dyc * den - num * dxc, nn * den)
            if n_t > 0 and n_c > 0 and den != 0 else None
        ),
        "var_reduction_ppm": (
            (abs(num) * 1000000 // den) * abs(num) // deny
            if den > 0 and deny > 0 else None
        ),
    }
    # cross-check the rational algebra against the float textbook form
    if den != 0 and n_t and n_c:
        theta = Fraction(num, den)
        mean_x = Fraction(sx, n)
        adj_t = Fraction(sy_t, n_t) - theta * (Fraction(sx_t, n_t) - mean_x)
        adj_c = Fraction(sy_c, n_c) - theta * (Fraction(sx_c, n_c) - mean_x)
        eff = adj_t - adj_c
        got = Fraction(dyc * den - num * dxc, nn * den)
        assert eff == got, "rational collapse disagrees with textbook CUPED"
    return out


def _run_cuped(spark, rows, cutoff="2024-01-16 00:00:00"):
    from ocr_translation_spark.functions.experiment import cuped_effect

    df = _events(spark, rows)
    [r] = cuped_effect(df, cutoff=cutoff).collect()
    return {k: (int(v) if v is not None else None) for k, v in
            r.asDict().items()}


def _mk_rows(unit_xy):
    """(unit -> (x, y)) as pre/post event rows around Jan 16."""
    rows = []
    for u, (x, y) in unit_xy.items():
        rows += [
            (u, _t(2) + datetime.timedelta(seconds=i), "view")
            for i in range(x)
        ]
        rows += [
            (u, _t(20) + datetime.timedelta(seconds=i), "view")
            for i in range(y)
        ]
    return rows


def test_cuped_matches_exact_python_mirror(spark):
    # a unit exists iff it has >= 1 event, so (0, 0) units are out of
    # the population on both sides
    unit_xy = {
        u: xy
        for u in range(40)
        if (xy := ((u * 7) % 13, (u * 7) % 13 + (u % 3))) != (0, 0)
    }
    got = _run_cuped(spark, _mk_rows(unit_xy))
    assert got == _cuped_py(unit_xy)


def test_cuped_removes_planted_unit_variance(spark):
    # y = x exactly (pure unit heterogeneity, zero treatment effect):
    # theta = 1, CUPED effect exactly 0, raw effect whatever the
    # random split left over; variance reduction = 1e6 ppm
    unit_xy = {u: (1 + (u * 13) % 97, 1 + (u * 13) % 97) for u in range(60)}
    got = _run_cuped(spark, _mk_rows(unit_xy))
    assert got["theta_ppm"] == 1000000
    assert got["cuped_effect_ppm"] == 0
    assert got["var_reduction_ppm"] == 1000000
    assert got["raw_effect_ppm"] != 0  # the noise CUPED removed


def test_cuped_zero_pre_variance_degrades_to_null(spark):
    # constant x: den == 0 -> theta/cuped NULL, raw effect intact
    unit_xy = {u: (3, u % 5) for u in range(30)}
    got = _run_cuped(spark, _mk_rows(unit_xy))
    assert got["theta_ppm"] is None
    assert got["cuped_effect_ppm"] is None
    assert got["raw_effect_ppm"] == _cuped_py(unit_xy)["raw_effect_ppm"]


def test_cuped_single_arm_yields_null_effects(spark):
    # pick units that all hash to the same arm
    same = [u for u in range(200) if _arm_py(u, 2, "cuped") == 1][:10]
    unit_xy = {u: (u % 4, u % 7) for u in same}
    got = _run_cuped(spark, _mk_rows(unit_xy))
    assert got["n_control"] == 0
    assert got["raw_effect_ppm"] is None
    assert got["cuped_effect_ppm"] is None


def test_cuped_null_units_and_ts_dropped(spark):
    unit_xy = {u: (2 + u % 3, 1 + u % 4) for u in range(20)}
    rows = _mk_rows(unit_xy) + [(None, _t(2), "view"), (5, None, "view")]
    assert _run_cuped(spark, rows) == _cuped_py(unit_xy)


def test_cuped_empty_population_reports_zero_counts(spark):
    # fully NULL-filtered input: integer zeros + NULL effects, the
    # same degenerate row the DuckDB twin emits (review regression)
    rows = [(None, _t(2), "view"), (5, None, "view")]
    got = _run_cuped(spark, rows)
    assert got["n_units"] == got["n_treated"] == got["n_control"] == 0
    assert got["theta_num"] == 0 and got["theta_den"] == 0
    assert got["theta_ppm"] is None
    assert got["raw_effect_ppm"] is None
    assert got["cuped_effect_ppm"] is None
    assert got["var_reduction_ppm"] is None
