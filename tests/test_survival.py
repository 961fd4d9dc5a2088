"""Recurrent-event spells + Nelson-Aalen hazard (functions/survival)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.survival import (
    nelson_aalen,
    recurrent_spells,
)


def test_spells_hand_computed(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), "purchase"),
        (1, dt.datetime(2024, 1, 1, 5, 0, 0), "purchase"),
        (1, dt.datetime(2024, 1, 1, 5, 30, 0), "purchase"),
        (2, dt.datetime(2024, 1, 1, 2, 0, 0), "purchase"),
        (2, dt.datetime(2024, 1, 1, 3, 0, 0), "click"),  # filtered
        (None, dt.datetime(2024, 1, 1, 1, 0, 0), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = sorted(
        (r["user_id"], r["duration"], r["observed"])
        for r in recurrent_spells(
            df, "user_id", "ts", F.col("event_type") == "purchase", 3600
        ).collect()
    )
    # user 1: 0h->5h observed(5), 5h->5h30 observed(0), 5h30 censored
    # at corpus max 5h30 (0); user 2: 2h censored to 5h30 (3)
    assert got == [(1, 0, 0), (1, 0, 1), (1, 5, 1), (2, 3, 0)]


def test_hazard_hand_computed(spark):
    spells = spark.createDataFrame(
        [(0, 1), (0, 0), (3, 0), (5, 1)], "duration long, observed int"
    )
    m = {r["duration"]: r for r in nelson_aalen(spells).collect()}
    assert (
        m[0]["n_at_risk"],
        m[0]["n_events"],
        m[0]["n_censored"],
        m[0]["hazard_ppm"],
    ) == (4, 1, 1, 250000)
    assert (m[3]["n_at_risk"], m[3]["hazard_ppm"]) == (2, 0)
    assert (
        m[5]["n_at_risk"],
        m[5]["hazard_ppm"],
        m[5]["cum_hazard_micro"],
    ) == (1, 1000000, 1250000)


def test_hazard_randomized_python_parity(spark):
    rng = random.Random(20260819)
    spells = [
        (rng.randint(0, 15), rng.randint(0, 1)) for _ in range(300)
    ]
    df = spark.createDataFrame(spells, "duration long, observed int")
    got = {
        r["duration"]: (
            r["n_at_risk"],
            r["n_events"],
            r["n_censored"],
            r["hazard_ppm"],
            r["cum_hazard_micro"],
        )
        for r in nelson_aalen(df).collect()
    }
    total, cum, removed = len(spells), 0, 0
    for d in sorted({d for d, _ in spells}):
        ev = sum(1 for dd, o in spells if dd == d and o == 1)
        ce = sum(1 for dd, o in spells if dd == d and o == 0)
        at_risk = total - removed
        hz = 1000000 * ev // at_risk
        cum += hz
        assert got[d] == (at_risk, ev, ce, hz, cum), (d, got[d])
        removed += ev + ce


def test_at_risk_accounting_identity(spark):
    """n_at_risk decreases by exactly the prior row's leavers, and the
    last row's at-risk minus its leavers is zero — nobody vanishes."""
    rng = random.Random(7)
    spells = [(rng.randint(0, 8), rng.randint(0, 1)) for _ in range(120)]
    df = spark.createDataFrame(spells, "duration long, observed int")
    rows = sorted(nelson_aalen(df).collect(), key=lambda r: r["duration"])
    assert rows[0]["n_at_risk"] == len(spells)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_at_risk"] == prev["n_at_risk"] - (
            prev["n_events"] + prev["n_censored"]
        )
    last = rows[-1]
    assert (
        last["n_at_risk"] - last["n_events"] - last["n_censored"] == 0
    )


def test_spells_unit_validation(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
    )
    with pytest.raises(ValueError):
        recurrent_spells(df, unit_seconds=0)
