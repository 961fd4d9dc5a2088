"""Linear multi-touch attribution: hand-computed credit splits,
largest-remainder exactness, lookback boundary inclusivity, the
(none) accounting leg, and the conservation invariant."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from ocr_translation_spark.functions.attribution import (
    MICRO,
    linear_attribution,
)

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type=t)
            for i, (u, t, ts) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _run(spark, rows, **kw):
    kw.setdefault("lookback", "24 hours")
    out = linear_attribution(
        _ev(spark, rows), "purchase", ("click", "view"), **kw
    )
    return {
        r["channel"]: (
            r["n_touches"],
            r["n_conversions"],
            r["credit_micro"],
        )
        for r in out.collect()
    }


def test_largest_remainder_split_and_boundaries(spark):
    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: one purchase, three touches -> 333334 + 2x333333,
        # remainder micro-unit goes to the EARLIEST touch
        (1, "click", T0 - 3 * h),
        (1, "view", T0 - 2 * h),
        (1, "view", T0 - 1 * h),
        (1, "purchase", T0),
        # boundary: exactly 24h before is IN; one microsecond earlier
        # is OUT; touches after the conversion are OUT
        (2, "click", T0 - dt.timedelta(hours=24)),
        (2, "view", T0 - dt.timedelta(hours=24) - us),
        (2, "view", T0 + us),
        (2, "purchase", T0),
        # user 3: untouched purchase -> (none) row, full credit
        (3, "purchase", T0),
    ]
    got = _run(spark, rows)
    assert got == {
        "click": (2, 2, 333334 + MICRO),
        "view": (2, 1, 2 * 333333),
        "(none)": (0, 1, MICRO),
    }
    # conservation: every conversion's credit sums back exactly
    # (three purchases planted: users 1, 2 and 3)
    assert sum(v[2] for v in got.values()) == 3 * MICRO


def test_same_timestamp_touch_included_and_id_tiebreak(spark):
    rows = [
        (1, "click", T0),  # same instant as the conversion: IN
        (1, "view", T0),  # tie broken by event_id: click is earlier
        (1, "purchase", T0),
    ]
    got = _run(spark, rows)
    assert got == {"click": (1, 1, 500000), "view": (1, 1, 500000)}


def test_cross_user_touches_never_leak(spark):
    rows = [
        (1, "click", T0 - dt.timedelta(hours=1)),
        (2, "purchase", T0),
    ]
    got = _run(spark, rows)
    assert got == {"(none)": (0, 1, MICRO)}


def test_conversion_in_touch_types_raises(spark):
    with pytest.raises(ValueError, match="double-counts"):
        linear_attribution(
            _ev(spark, [(1, "purchase", T0)]),
            "purchase",
            ("purchase", "click"),
        )


def test_conservation_on_planted_corpus(spark):
    """On the registered query's real corpus: total credit ==
    1e6 x (number of purchases by non-NULL users)."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    out = entry_mod.queries()["multi_touch_attribution"](
        spark, sf
    ).collect()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_conv = ev.filter(
        (ev.event_type == "purchase")
        & ev.user_id.isNotNull()
        & ev.ts.isNotNull()
    ).count()
    assert sum(r["credit_micro"] for r in out) == n_conv * MICRO
    assert sum(r["n_conversions"] for r in out) >= n_conv  # multi-count ok
