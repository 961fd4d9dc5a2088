"""Unit tests for exact-integer CUSUM changepoint detection
(functions/changepoint.py): hand-computed level-shift recovery,
pure-Python reference parity on randomized series, the earliest-day
tie-break, the uniform-series case, and single-day-series exclusion."""

import datetime
import random

from ocr_translation_spark.functions.changepoint import (
    cusum_changepoint,
)


def _ref(rows):
    daily = {}
    for g, ts in rows:
        d = ts.strftime("%Y-%m-%d")
        daily.setdefault(g, {}).setdefault(d, 0)
        daily[g][d] += 1
    out = {}
    for g, dd in daily.items():
        days = sorted(dd)
        T, N = len(days), sum(dd.values())
        if T < 2:
            continue
        best = None
        s = 0
        for t, day in enumerate(days[:-1], start=1):
            s += dd[day]
            dsig = T * s - t * N
            key = (-abs(dsig), day)
            if best is None or key < best[0]:
                mb = (s * 1000000) // t
                ma = ((N - s) * 1000000) // (T - t)
                best = (
                    key,
                    (
                        day, t, T, N, abs(dsig),
                        "hot_before" if dsig >= 0 else "cold_before",
                        mb, ma,
                    ),
                )
        out[g] = best[1]
    return out


def _got(df):
    return {
        r["series"]: (
            r["cp_day"], r["t_cp"], r["n_days"], r["total"],
            r["dev"], r["direction"], r["mean_before_micro"],
            r["mean_after_micro"],
        )
        for r in df.collect()
    }


def _mk(series, counts, base=datetime.datetime(2024, 5, 1)):
    rows = []
    for i, c in enumerate(counts):
        rows += [(series, base + datetime.timedelta(days=i))] * c
    return rows


def test_recovers_planted_level_shift(spark):
    # 5 days at ~2/day then 5 days at ~10/day: cp at day 5
    rows = _mk("s", [2, 2, 2, 2, 2, 10, 10, 10, 10, 10])
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = _got(cusum_changepoint(df))
    assert got["s"][0] == "2024-05-05"
    assert got["s"][5] == "cold_before"
    assert got["s"][6] == 2000000 and got["s"][7] == 10000000


def test_matches_python_reference_randomized(spark):
    rng = random.Random(23)
    rows = []
    for g in ("a", "b", "c"):
        rows += _mk(g, [rng.randrange(0, 9) for _ in range(15)])
    rows = [r for r in rows]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    assert _got(cusum_changepoint(df)) == _ref(rows)


def test_uniform_tiebreak_and_single_day_excluded(spark):
    # perfectly uniform: D_t = 0 everywhere, tie -> earliest day
    rows = _mk("u", [3, 3, 3, 3]) + _mk("one", [5])
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = _got(cusum_changepoint(df))
    assert got["u"][0] == "2024-05-01" and got["u"][4] == 0
    assert "one" not in got


def test_null_ts_and_series_rows_are_dropped(spark):
    # NULL days must not enter the order-sensitive prefix-sum window
    # (Spark sorts nulls first, DuckDB last — a silent twin split)
    rows = _mk("s", [2, 2, 10, 10])
    clean = _got(cusum_changepoint(
        spark.createDataFrame(rows, "event_type string, ts timestamp")
    ))
    dirty = _got(cusum_changepoint(
        spark.createDataFrame(
            rows + [("s", None), (None, rows[0][1])],
            "event_type string, ts timestamp",
        )
    ))
    assert dirty == clean
