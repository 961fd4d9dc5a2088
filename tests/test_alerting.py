"""Cooldown-throttled alerting: pure-Python fold parity + edges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.alerting import throttled_alerts


def _mirror(secs: list[int], cooldown: int) -> dict:
    """Reference suppression fold in plain Python."""
    xs = sorted(secs)
    n_alerts, last_emit = 1, xs[0]
    for t in xs[1:]:
        if t - last_emit >= cooldown:
            n_alerts += 1
            last_emit = t
    return {
        "n_events": len(xs),
        "n_alerts": n_alerts,
        "n_suppressed": len(xs) - n_alerts,
        "first_sec": xs[0],
        "last_alert_sec": last_emit,
    }


def _run(spark, rows, cooldown):
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    out = throttled_alerts(df, "key", "ts", cooldown_s=cooldown)
    return {r["key"]: r.asDict() for r in out.collect()}


def _ts(sec: int):
    import datetime as dt

    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=sec)


def test_randomized_fold_parity(spark):
    rng = random.Random(20260820)
    rows, expected = [], {}
    for k in range(12):
        key = f"k{k}"
        n = rng.randint(1, 40)
        secs = sorted(
            rng.randrange(1_700_000_000, 1_700_000_000 + 200_000)
            for _ in range(n)
        )
        cooldown = 3600
        expected[key] = _mirror(secs, cooldown)
        rows += [(key, _ts(s)) for s in secs]
    got = _run(spark, rows, 3600)
    assert set(got) == set(expected)
    for key, exp in expected.items():
        g = got[key]
        for col, v in exp.items():
            assert g[col] == v, (key, col, g, exp)


def test_boundary_gap_exactly_cooldown_fires(spark):
    # gap == cooldown fires (>=, not >); gap == cooldown - 1 does not
    got = _run(
        spark,
        [("a", _ts(0)), ("a", _ts(100)), ("a", _ts(199))],
        100,
    )["a"]
    assert got["n_alerts"] == 2
    assert got["last_alert_sec"] == 100


def test_all_within_cooldown_single_alert(spark):
    got = _run(
        spark, [("a", _ts(s)) for s in (5, 6, 7, 8)], 1_000_000
    )["a"]
    assert got["n_alerts"] == 1
    assert got["n_suppressed"] == 3
    assert got["last_alert_sec"] == 5


def test_single_event_always_fires(spark):
    got = _run(spark, [("a", _ts(42))], 60)["a"]
    assert got == {
        "key": "a",
        "n_events": 1,
        "n_alerts": 1,
        "n_suppressed": 0,
        "first_sec": 42,
        "last_alert_sec": 42,
    }


def test_same_second_duplicates_suppressed(spark):
    got = _run(spark, [("a", _ts(9)), ("a", _ts(9))], 1)["a"]
    assert got["n_alerts"] == 1
    assert got["n_suppressed"] == 1


def test_cooldown_validation():
    with pytest.raises(ValueError):
        throttled_alerts(None, "k", "ts", cooldown_s=0)
