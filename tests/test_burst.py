"""Unit tests for hysteresis burst segmentation
(functions/changepoint.burst_windows): hand-computed islands
including the band-carry that distinguishes hysteresis from a plain
threshold, the all-band series (state stays 0), randomized
pure-Python parity, threshold-parameter validation, and NULL
exclusion."""

import datetime
import random

import pytest

from ocr_translation_spark.functions.changepoint import burst_windows


def _events(spark, counts_by_series):
    """counts_by_series: {series: [day1_count, day2_count, ...]}
    materialized as one event row per count unit on consecutive
    January days."""
    rows = []
    for s, counts in counts_by_series.items():
        for d, x in enumerate(counts, start=1):
            for i in range(x):
                rows.append(
                    (s, datetime.datetime(2024, 1, d, 0, 0, i % 60, i))
                )
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _ref(counts_by_series, enter=(2, 1), exit_=(1, 1)):
    out = set()
    for s, counts in counts_by_series.items():
        days = [f"2024-01-{d:02d}" for d in range(1, len(counts) + 1)]
        total, n = sum(counts), len(counts)
        state, start, vol, peak, nd = 0, None, 0, 0, 0
        for day, x in zip(days, counts):
            if x * n * enter[1] >= enter[0] * total:
                new = 1
            elif x * n * exit_[1] < exit_[0] * total:
                new = 0
            else:
                new = state
            if new == 1 and state == 0:
                start, vol, peak, nd = day, 0, 0, 0
            if new == 1:
                vol += x
                peak = max(peak, x)
                nd += 1
                end = day
            if new == 0 and state == 1:
                out.add((s, start, end, nd, vol, peak))
            state = new
        if state == 1:
            out.add((s, start, end, nd, vol, peak))
    return out


def _got(df):
    return {
        (
            r["series"], r["burst_start"], r["burst_end"],
            r["n_burst_days"], r["burst_volume"], r["peak_volume"],
        )
        for r in df.collect()
    }


def test_band_carry_joins_one_island(spark):
    # mean 3.75: 10 enters (>=7.5), 1 exits (<3.75), 5 is IN THE BAND
    # and must CARRY the burst — a plain threshold would split it
    counts = {"a": [1, 1, 10, 5, 10, 1, 1, 1]}
    got = _got(burst_windows(_events(spark, counts)))
    assert got == {
        ("a", "2024-01-03", "2024-01-05", 3, 25, 10)
    }


def test_band_only_series_never_bursts(spark):
    # uniform series: every day equals the mean — all in the band,
    # initial state 0 carries forever
    counts = {"b": [4, 4, 4, 4]}
    assert _got(burst_windows(_events(spark, counts))) == set()


def test_two_separate_bursts(spark):
    # mean = 30/10 = 3: two isolated 8-days (>=6 enters), 1 exits
    counts = {"c": [1, 8, 1, 1, 1, 1, 8, 1, 4, 4]}
    # 4 >= mean but < 2x mean: band -> trailing days carry state from
    # day 8's exit, so the second burst is day 7 alone
    got = _got(burst_windows(_events(spark, counts)))
    assert got == {
        ("c", "2024-01-02", "2024-01-02", 1, 8, 8),
        ("c", "2024-01-07", "2024-01-07", 1, 8, 8),
    }


def test_randomized_python_parity(spark):
    rng = random.Random(20260819)
    counts = {
        f"s{i}": [rng.randint(1, 12) for _ in range(rng.randint(2, 14))]
        for i in range(6)
    }
    got = _got(burst_windows(_events(spark, counts)))
    assert got == _ref(counts)


def test_custom_thresholds_and_validation(spark):
    counts = {"d": [2, 6, 4, 2]}
    # enter at >= 9/8 x mean (mean 3.5 -> 3.9375): days 6 and 4 enter,
    # 2 exits; 6,4 contiguous -> one island
    got = _got(
        burst_windows(_events(spark, counts), enter_num=9, enter_den=8)
    )
    assert got == {("d", "2024-01-02", "2024-01-03", 2, 10, 6)}
    with pytest.raises(ValueError):
        burst_windows(
            _events(spark, counts),
            enter_num=1, enter_den=2, exit_num=1, exit_den=1,
        )


def test_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [
            ("a", datetime.datetime(2024, 1, 1)),
            ("a", datetime.datetime(2024, 1, 1)),
            ("a", datetime.datetime(2024, 1, 2)),
            (None, datetime.datetime(2024, 1, 1)),
            ("a", None),
        ],
        "event_type string, ts timestamp",
    )
    # counts [2, 1]: mean 1.5, 2 < 3 never enters; no NULL crash
    assert _got(burst_windows(df)) == set()
