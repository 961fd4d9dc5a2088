"""Units: time-decayed top-k ranking + readability indices."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.text import add_readability
from ocr_translation_spark.functions.timeseries import decayed_topk


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _t(day, h=0):
    return dt.datetime(2024, 1, day, h)


def test_decayed_weights_are_exact_shifts(spark):
    # corpus max day = Jan 5. a: 1 event today (age 0) = 2^40;
    # b: 2 events age 1 = 2 * 2^39 = 2^40 -> TIE, broken by key asc;
    # c: 1 event age 2 = 2^38.
    rows = [
        ("a", _t(5)),
        ("b", _t(4)), ("b", _t(4, 6)),
        ("c", _t(3)),
    ]
    got = decayed_topk(
        _ev(spark, rows), ["key"], "ts", k=3, scale=2**40
    ).collect()
    assert [(r["key"], r["decayed_score"], r["n_events"]) for r in got] == [
        ("a", 2**40, 1), ("b", 2**40, 2), ("c", 2**38, 1),
    ]


def test_decayed_horizon_zeroes_old_events(spark):
    rows = [("old", _t(1)), ("new", _t(31))]
    got = decayed_topk(
        _ev(spark, rows), ["key"], "ts", k=2, horizon_days=10,
        scale=2**40,
    ).collect()
    by = {r["key"]: r["decayed_score"] for r in got}
    assert by == {"new": 2**40, "old": 0}  # age 30 > horizon -> 0


def test_decayed_k_bounds_output(spark):
    rows = [(f"k{i}", _t(5)) for i in range(10)]
    assert decayed_topk(_ev(spark, rows), ["key"], "ts", k=3).count() == 3


def test_decayed_validates_params(spark):
    df = _ev(spark, [("a", _t(1))])
    with pytest.raises(ValueError):
        decayed_topk(df, ["key"], "ts", k=0)
    with pytest.raises(ValueError):
        decayed_topk(df, ["key"], "ts", horizon_days=63)


def _score(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return add_readability(df).collect()[0]


def test_readability_hand_computed(spark):
    r = _score(spark, "the quickest! brown foxes jumped? over it.")
    # tokens: the quickest! brown foxes jumped? over it. -> 7 words
    assert r["words"] == 7
    assert r["sentences"] == 3
    # >6 chars: 'quickest!' (9) and 'jumped?' (7)
    assert r["long_words"] == 2
    assert r["chars"] == len("the quickest! brown foxes jumped? over it.".replace(" ", ""))
    assert r["lix_ppm"] == (7 * 1_000_000) // 3 + (2 * 100_000_000) // 7
    assert r["ari_ppm"] == (
        (r["chars"] * 4_710_000) // 7 + (7 * 500_000) // 3 - 21_430_000
    )


def test_readability_blank_text_is_null_not_error(spark):
    r = _score(spark, "   ")
    assert r["words"] == 0
    assert r["lix_ppm"] is None and r["ari_ppm"] is None


def test_readability_no_punctuation_floors_sentences(spark):
    r = _score(spark, "plain words only here")
    assert r["sentences"] == 1
    assert r["lix_ppm"] == 4 * 1_000_000 + 0
