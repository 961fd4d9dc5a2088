"""Day-of-week seasonality index and the composed time-to-convert
quantiles: hand-planted weekday effects, exactness of the
cross-multiplied ratio, and last-touch + rank selection parity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from ocr_translation_spark.functions.timeseries import (
    seasonality_index,
)

# 1970-01-01 (epoch day 0) was a THURSDAY, so dow 0 = Thursday
THURSDAY = dt.datetime(2024, 3, 7)  # a Thursday
FRIDAY = THURSDAY + dt.timedelta(days=1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_type=t, ts=ts, event_id=i)
            for i, (t, ts) in enumerate(rows)
        ],
        "event_type string, ts timestamp_ntz, event_id long",
    )


def test_planted_weekday_effect(spark):
    # series 'a': two Thursdays at 3 events/day, two Fridays at 1/day
    rows = []
    for wk in (0, 1):
        thu = THURSDAY + dt.timedelta(weeks=wk)
        fri = FRIDAY + dt.timedelta(weeks=wk)
        rows += [("a", thu)] * 3 + [("a", fri)]
    out = {
        (r["series"], r["dow"]): (
            r["dow_days"],
            r["dow_events"],
            r["index_ppm"],
        )
        for r in seasonality_index(_ev(spark, rows)).collect()
    }
    # overall mean = 8 events / 4 days = 2; Thursday mean 3 -> 1.5e6;
    # Friday mean 1 -> 0.5e6. Thursday is epoch-dow 0, Friday 1.
    assert out == {
        ("a", 0): (2, 6, 1_500_000),
        ("a", 1): (2, 2, 500_000),
    }


def test_flat_series_is_exactly_one_million(spark):
    rows = [
        ("b", THURSDAY + dt.timedelta(days=d, hours=h))
        for d in range(14)
        for h in (1, 2)
    ]
    out = seasonality_index(_ev(spark, rows)).collect()
    assert len(out) == 7
    assert all(r["index_ppm"] == 1_000_000 for r in out)


def test_truncating_ratio_is_exact_integer_division(spark):
    # 3 events over 2 Thursdays vs 1 over 1 Friday:
    # overall mean = 4/3; Thursday mean = 3/2
    # index = (3 * 3 * 1e6) // (2 * 4) = 1_125_000 exactly
    rows = [
        ("c", THURSDAY),
        ("c", THURSDAY + dt.timedelta(weeks=1)),
        ("c", THURSDAY + dt.timedelta(weeks=1, hours=1)),
        ("c", FRIDAY),
    ]
    out = {
        r["dow"]: r["index_ppm"]
        for r in seasonality_index(_ev(spark, rows)).collect()
    }
    assert out == {0: 1_125_000, 1: 750_000}


def test_time_to_convert_last_touch_and_rank(spark):
    """The composed registered query picks the LAST preceding touch
    and the exact rank-ceil(q*n) element per channel."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    out = entry_mod.queries()["time_to_convert"](spark, sf).collect()
    assert {r["q"] for r in out} == {"0.5", "0.9"}
    # recompute in plain Python
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type")
        .collect()
    )
    ev = [r for r in ev if r["user_id"] is not None and r["ts"] is not None]
    convs = [r for r in ev if r["event_type"] == "purchase"]
    touches = [
        r
        for r in ev
        if r["event_type"] in ("click", "view", "signup")
    ]
    per_channel: dict = {}
    for c in convs:
        cand = [
            t
            for t in touches
            if t["user_id"] == c["user_id"] and t["ts"] <= c["ts"]
        ]
        if not cand:
            continue
        t = max(cand, key=lambda t: (t["ts"], t["event_id"]))
        delta = int(
            (c["ts"] - t["ts"]).total_seconds()
        )  # floor: deltas are non-negative
        per_channel.setdefault(t["event_type"], []).append(delta)
    expect = {}
    for ch, ds in per_channel.items():
        ds.sort()
        n = len(ds)
        expect[(ch, "0.5")] = ((n + 1) // 2, n, float(ds[(n + 1) // 2 - 1]))
        expect[(ch, "0.9")] = (
            (9 * n + 9) // 10,
            n,
            float(ds[(9 * n + 9) // 10 - 1]),
        )
    got = {
        (r["grp"], r["q"]): (r["rank"], r["n"], r["value"])
        for r in out
    }
    assert got == expect
