"""Exact-rational OLS trend slopes (functions/timeseries.trend_slopes)."""

from __future__ import annotations

import datetime
from fractions import Fraction

from ocr_translation_spark.functions.timeseries import trend_slopes


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _day(d):
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(days=d)


def test_hand_computed_positive_and_negative_slopes(spark):
    # "up": counts 1,2,3 on days 10,11,12 -> slope exactly +1/day
    # "down": counts 5,1 on days 10,11 -> slope exactly -4/day
    rows = []
    for d, c in [(10, 1), (11, 2), (12, 3)]:
        rows += [("up", _day(d))] * c
    for d, c in [(10, 5), (11, 1)]:
        rows += [("down", _day(d))] * c
    out = {r.event_type: r for r in trend_slopes(_ev(spark, rows), "event_type", "ts").collect()}
    up = out["up"]
    assert Fraction(up.slope_num, up.slope_den) == 1
    assert up.slope_micro == 1_000_000
    assert (up.n_days, up.total_rows) == (3, 6)
    down = out["down"]
    assert Fraction(down.slope_num, down.slope_den) == -4
    assert down.slope_micro == -4_000_000


def test_truncation_is_toward_zero_for_negative_slopes(spark):
    # counts 3,1,1 on days 0,1,2 -> slope = -1 exactly? sums: n=3,
    # sx=3, sy=5, sxy=0*3+1*1+2*1=3, sxx=5; num=3*3-3*5=-6, den=3*5-9=6
    # -> -1. Need a NON-integral negative: counts 3,1 on days 0,1 and
    # 2 on day 3: x=(0,1,3) y=(3,1,2): n=3 sx=4 sy=6 sxy=0+1+6=7
    # sxx=10; num=21-24=-3 den=30-16=14 -> -3/14 -> micro
    # -214285.71... -> toward zero = -214285 (floor would be -214286)
    rows = (
        [("e", _day(0))] * 3 + [("e", _day(1))] + [("e", _day(3))] * 2
    )
    r = trend_slopes(_ev(spark, rows), "event_type", "ts").collect()[0]
    assert (r.slope_num, r.slope_den) == (-3, 14)
    assert r.slope_micro == -214285  # NOT -214286


def test_single_day_key_emits_null_slope_not_dropped(spark):
    rows = [("solo", _day(5))] * 4
    r = trend_slopes(_ev(spark, rows), "event_type", "ts").collect()[0]
    assert (r.n_days, r.total_rows) == (1, 4)
    assert r.slope_num is None and r.slope_den is None
    assert r.slope_micro is None


def test_partition_invariance(spark):
    rows = [
        (f"t{i % 3}", _day(100 + (i * 7) % 20)) for i in range(300)
    ]
    df = _ev(spark, rows)
    a = {tuple(r) for r in trend_slopes(df, "event_type", "ts").collect()}
    b = {
        tuple(r)
        for r in trend_slopes(df.repartition(17), "event_type", "ts").collect()
    }
    assert a == b and len(a) == 3
