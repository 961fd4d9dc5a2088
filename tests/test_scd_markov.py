"""Units for SCD Type-2 history fold and Markov transition counting."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.markov import markov_transitions
from ocr_translation_spark.functions.scd import scd2_history


def _ts(day: int, h: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, h)


def _hist(spark, rows):
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, tie long, color string, size string"
    )
    out = scd2_history(
        df, key_col="key", ts_col="ts", attr_cols=["color", "size"],
        tie_col="tie",
    )
    return {
        (r.key, r.version): r
        for r in out.collect()
    }


def test_scd2_change_compression_and_intervals(spark):
    # key 1 observes red/S, red/S (dup -> compressed), blue/S, blue/M
    rows = [
        (1, _ts(1), 10, "red", "S"),
        (1, _ts(2), 11, "red", "S"),
        (1, _ts(3), 12, "blue", "S"),
        (1, _ts(4), 13, "blue", "M"),
    ]
    h = _hist(spark, rows)
    assert len(h) == 3  # the duplicate observation opened NO version
    v1, v2, v3 = h[(1, 1)], h[(1, 2)], h[(1, 3)]
    assert (v1.color, v1.size) == ("red", "S")
    assert v1.valid_from == _ts(1) and v1.valid_to == _ts(3)
    assert v2.valid_to == _ts(4) and not v2.is_current
    assert v3.valid_to is None and v3.is_current


def test_scd2_reverting_state_reopens_a_version(spark):
    # red -> blue -> red must yield THREE versions (type 2 keeps
    # history; a revert is a new interval, not a merge)
    rows = [
        (1, _ts(1), 1, "red", "S"),
        (1, _ts(2), 2, "blue", "S"),
        (1, _ts(3), 3, "red", "S"),
    ]
    h = _hist(spark, rows)
    assert len(h) == 3
    assert h[(1, 3)].color == "red" and h[(1, 3)].is_current


def test_scd2_null_transitions_are_null_safe(spark):
    # NULL -> X and X -> NULL both open versions; NULL -> NULL does not
    rows = [
        (1, _ts(1), 1, None, "S"),
        (1, _ts(2), 2, None, "S"),   # unchanged (both NULL): compressed
        (1, _ts(3), 3, "red", "S"),  # NULL -> red: opens
        (1, _ts(4), 4, None, "S"),   # red -> NULL: opens
    ]
    h = _hist(spark, rows)
    assert len(h) == 3
    assert h[(1, 1)].color is None
    assert h[(1, 2)].color == "red"
    assert h[(1, 3)].color is None


def test_scd2_equal_timestamp_tie_break(spark):
    # same-instant observations are ordered by the unique tie column,
    # so the version sequence is deterministic
    rows = [
        (1, _ts(1), 2, "blue", "S"),
        (1, _ts(1), 1, "red", "S"),
    ]
    h = _hist(spark, rows)
    assert h[(1, 1)].color == "red" and h[(1, 2)].color == "blue"


def test_scd2_needs_attrs(spark):
    df = spark.createDataFrame([(1, _ts(1), 1)], "key long, ts timestamp, tie long")
    with pytest.raises(ValueError):
        scd2_history(df, "key", "ts", [], "tie")


def test_markov_counts_and_micro_probs(spark):
    # user 1: a -> b -> a -> b ; user 2: a -> b ; user 3: c (terminal)
    rows = [
        (1, _ts(1), 1, "a"), (1, _ts(2), 2, "b"),
        (1, _ts(3), 3, "a"), (1, _ts(4), 4, "b"),
        (2, _ts(1), 5, "a"), (2, _ts(2), 6, "b"),
        (3, _ts(1), 7, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        (r.prev_state, r.next_state): r
        for r in markov_transitions(df).collect()
    }
    # a->b three times, b->a once; c has no successor anywhere
    assert out[("a", "b")].n_transitions == 3
    assert out[("a", "b")].row_total == 3
    assert out[("a", "b")].prob_ppm == 1_000_000
    assert out[("b", "a")].n_transitions == 1
    assert ("c", "a") not in out and len(out) == 2


def test_markov_prob_mass_sums_to_at_most_1e6(spark):
    # truncating division: per-prev probability mass never exceeds 1e6
    # and the deficit is < number of distinct successors
    rows = [
        (1, _ts(1), i, s)
        for i, s in enumerate("abcabcabacbcaabbbc")
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = markov_transitions(df, tie_col="event_id")
    sums = (
        out.groupBy("prev_state")
        .agg(
            F.sum("prob_ppm").alias("mass"),
            F.count(F.lit(1)).alias("n_succ"),
        )
        .collect()
    )
    assert sums
    for r in sums:
        assert r.mass <= 1_000_000
        assert 1_000_000 - r.mass < r.n_succ


def test_markov_equal_ts_uses_tie_column(spark):
    rows = [
        (1, _ts(1), 2, "b"),
        (1, _ts(1), 1, "a"),
        (1, _ts(2), 3, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        (r.prev_state, r.next_state)
        for r in markov_transitions(df).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


def test_scd2_asof_reconstructs_point_in_time(spark):
    from ocr_translation_spark.functions.scd import scd2_asof

    rows = [
        (1, _ts(1), 1, "red", "S"),
        (1, _ts(5), 2, "blue", "S"),
        (2, _ts(3), 3, "green", "M"),
    ]
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, tie long, color string, size string"
    )
    hist = scd2_history(df, "key", "ts", ["color", "size"], "tie")
    # day 2: key 1 is red, key 2 not yet born
    asof = {r.key: r.color for r in scd2_asof(hist, _ts(2)).collect()}
    assert asof == {1: "red"}
    # day 5 exactly: half-open intervals — the NEW version applies
    asof5 = {r.key: r.color for r in scd2_asof(hist, _ts(5)).collect()}
    assert asof5 == {1: "blue", 2: "green"}
    # far future: current state, one row per key
    asof9 = {r.key: r.color for r in scd2_asof(hist, _ts(9)).collect()}
    assert asof9 == {1: "blue", 2: "green"}


def test_scd2_null_leading_timestamp_not_double_opened(spark):
    # review-finding regression: a first-ordered row with NULL ts and
    # tie must not make the SECOND row look first (rn=1 is the test,
    # not lag-IS-NULL) — an unchanged second observation stays
    # compressed
    rows = [
        (1, None, None, "red", "S"),
        (1, _ts(2), 5, "red", "S"),
    ]
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, tie long, color string, size string"
    )
    out = scd2_history(df, "key", "ts", ["color", "size"], "tie").collect()
    assert len(out) == 1  # one version, not a spurious second
    assert out[0].valid_from is None and out[0].is_current
