"""COEC position-bias click model (functions/clickmodel.py): exact
Python mirror, planted under-ranked item, depth cut, NULL handling."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.clickmodel import (
    coec_position_bias,
    position_ctr_curve,
)


def _ts(day, sec):
    return datetime.datetime(2024, 1, day, 0, 0, 0) + datetime.timedelta(
        seconds=sec
    )


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _coec_py(rows, max_pos=10, item_mod=40):
    """Mirror: rows = (event_id, user_id, ts, type)."""
    sessions = {}
    for eid, u, t, ty in rows:
        if u is None or t is None:
            continue
        sessions.setdefault((u, t.date()), []).append((t, eid, ty))
    imps = []
    for sess in sessions.values():
        for pos, (t, eid, ty) in enumerate(sorted(sess), start=1):
            if pos <= max_pos:
                imps.append((eid % item_mod, pos, ty == "click"))
    curve = {}
    for _, pos, clk in imps:
        i, c = curve.get(pos, (0, 0))
        curve[pos] = (i + 1, c + clk)
    ctr = {p: c * 1000000 // i for p, (i, c) in curve.items()}
    out = {}
    for item, pos, clk in imps:
        n, c, e = out.get(item, (0, 0, 0))
        out[item] = (n + 1, c + clk, e + ctr[pos])
    return {
        item: (
            n, c, e, (c * 10**12 // e) if e > 0 else None
        )
        for item, (n, c, e) in out.items()
    }


def _run(spark, rows, **kw):
    out = coec_position_bias(
        _df(spark, rows),
        item=(F.col("event_id") % 40).alias("item_id"),
        **kw,
    )
    return {
        r["item_id"]: (
            r["n_impressions"], r["n_clicks"],
            r["expected_clicks_micro"], r["coec_ppm"],
        )
        for r in out.collect()
    }


def test_matches_python_mirror_on_interleaved_log(spark):
    rows = []
    eid = 0
    for u in range(6):
        for day in (3, 4, 5):
            for k in range(8):
                ty = "click" if (u + day + k) % 3 == 0 else "view"
                rows.append((eid, u, _ts(day, k), ty))
                eid += 1
    assert _run(spark, rows) == _coec_py(rows)


def test_planted_underranked_item_scores_above_parity(spark):
    # position 1 clicks 50%, position 2 clicks 10% globally; item 7
    # always shows at position 2 yet is always clicked -> COEC >> 1e6;
    # item 8 shows at position 2 and is never clicked -> COEC = 0
    rows = []
    for u in range(20):
        first_click = u % 2 == 0  # 50% ctr at position 1
        # position-1 filler ids stay congruent to 20 mod 40 so they
        # never collide with the planted items 7 / 8
        rows.append(
            (40 * u + 20, u, _ts(2, 0), "click" if first_click else "view")
        )
        item = 7 if u < 10 else 8
        # event ids congruent to 7 / 8 mod 40
        rows.append((40 * u + item, u, _ts(2, 1), "click" if item == 7 else "view"))
    got = _run(spark, rows)
    py = _coec_py(rows)
    assert got == py
    assert got[7][3] > 1000000  # out-clicks its position prior
    assert got[8][3] == 0


def test_depth_cut_drops_deep_positions(spark):
    rows = [(i, 1, _ts(2, i), "view") for i in range(15)]
    got = _run(spark, rows, max_pos=5)
    # only 5 impressions survive; items are event_id % 40 = 0..4
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(v[0] == 1 for v in got.values())


def test_null_user_or_ts_excluded(spark):
    rows = [
        (0, 1, _ts(2, 0), "click"),
        (1, None, _ts(2, 1), "click"),
        (2, 1, None, "click"),
    ]
    got = _run(spark, rows)
    assert set(got) == {0}
    assert got[0] == (1, 1, 1000000, 1000000)


def test_zero_expected_yields_null_not_division(spark):
    # no clicks anywhere: every position ctr is 0, expected is 0
    rows = [(i, 1, _ts(2, i), "view") for i in range(4)]
    got = _run(spark, rows)
    assert all(v[3] is None and v[2] == 0 for v in got.values())


def test_tiebreak_makes_positions_deterministic(spark):
    # identical timestamps: order falls to event_id
    rows = [(i, 1, _ts(2, 0), "click" if i == 0 else "view")
            for i in range(6)]
    for _ in range(3):
        curve = {
            r["pos"]: (r["n_impressions"], r["n_clicks"])
            for r in position_ctr_curve(_df(spark, rows)).collect()
        }
        assert curve == {p: (1, 1 if p == 1 else 0) for p in range(1, 7)}


def test_validation():
    with pytest.raises(ValueError):
        coec_position_bias(None, item="x", max_pos=0)


def test_null_event_type_is_a_non_click_impression(spark):
    # NULL type must count as an impression with clk = 0, not poison
    # the curve with NULL ctr (review regression)
    rows = [(0, 1, _ts(2, 0), None), (1, 1, _ts(2, 1), "click")]
    got = _run(spark, rows)
    assert got[0] == (1, 0, 0, None)       # pos 1: ctr 0
    assert got[1] == (1, 1, 1000000, 1000000)  # pos 2: ctr 1
    curve = {
        r["pos"]: (r["n_impressions"], r["n_clicks"], r["ctr_ppm"])
        for r in position_ctr_curve(_df(spark, rows)).collect()
    }
    assert curve == {1: (1, 0, 0), 2: (1, 1, 1000000)}


def test_curve_and_coec_share_position_semantics(spark):
    # both public entry points must derive from the same rollup —
    # cross-check expected_clicks against the standalone curve
    rows = []
    for u in range(5):
        for k in range(6):
            rows.append(
                (u * 40 + k, u, _ts(3, k), "click" if k % 2 else "view")
            )
    curve = {
        r["pos"]: r["ctr_ppm"]
        for r in position_ctr_curve(_df(spark, rows)).collect()
    }
    py = _coec_py(rows)
    got = _run(spark, rows)
    assert got == py
    for item, (n, c, exp, _) in got.items():
        # every impression of item sits at pos = (item % 40) + 1 here
        assert exp == n * curve[item % 40 + 1]
