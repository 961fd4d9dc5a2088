"""Robots-rules longest-match filtering (functions/crawlpolicy.py):
RFC 9309 rule semantics against hand-built rule tables, plus the
broadcast-no-corpus-shuffle plan contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.crawlpolicy import robots_filter


def _urls(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, host string, path string"
    )


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "host string, prefix string, allow boolean"
    )


RULES = [
    ("h", "/", True),
    ("h", "/private/", False),
    ("h", "/private/open/", True),
    ("h", "/tmp/", False),
]


def _verdicts(spark, urls, rules):
    out = robots_filter(_urls(spark, urls), _rules(spark, rules))
    return {
        r["doc_id"]: (r["matched_prefix"], r["allowed"])
        for r in out.collect()
    }


def test_longest_match_wins(spark):
    got = _verdicts(
        spark,
        [
            (1, "h", "/private/p1"),          # disallow
            (2, "h", "/private/open/q2"),     # allow nested inside it
            (3, "h", "/tmp/t3"),              # disallow
            (4, "h", "/a/b4"),                # only '/' matches
        ],
        RULES,
    )
    assert got[1] == ("/private/", False)
    assert got[2] == ("/private/open/", True)
    assert got[3] == ("/tmp/", False)
    assert got[4] == ("/", True)


def test_rfc_allow_tie_break_at_equal_length(spark):
    # same-length allow and disallow rules both match: RFC 9309 /
    # Google parser resolve to ALLOW
    got = _verdicts(
        spark,
        [(1, "h", "/abc/x")],
        [("h", "/abc/", False), ("h", "/abd/", True), ("h", "/ab", True),
         ("h", "/abc/", True)],
    )
    assert got[1] == ("/abc/", True)


def test_no_match_default_and_unknown_host(spark):
    urls = [(1, "h", "/x"), (2, "nowhere", "/private/p")]
    rules = [("h", "/private/", False)]
    got = _verdicts(spark, urls, rules)
    assert got[1] == (None, True)
    assert got[2] == (None, True)
    closed = {
        r["doc_id"]: r["allowed"]
        for r in robots_filter(
            _urls(spark, urls), _rules(spark, rules), default_allow=False
        ).collect()
    }
    assert closed == {1: False, 2: False}


def test_null_host_or_path_matches_nothing(spark):
    got = _verdicts(
        spark,
        [(1, None, "/private/p"), (2, "h", None)],
        RULES,
    )
    assert got[1] == (None, True)
    assert got[2] == (None, True)


def test_null_rule_rows_are_dropped(spark):
    got = _verdicts(
        spark,
        [(1, "h", "/private/p")],
        RULES + [(None, "/private/p", True), ("h", None, True)],
    )
    assert got[1] == ("/private/", False)


def test_duplicate_length_same_verdict_is_deterministic(spark):
    # two same-length same-verdict matches: the struct order's
    # trailing prefix field picks the lexicographically larger one,
    # every run
    for _ in range(3):
        got = _verdicts(
            spark,
            [(1, "h", "/aa/bb/x")],
            [("h", "/aa/bb/", True), ("h", "/aa/bc/", True),
             ("h", "/aa/b", False)],
        )
        assert got[1] == ("/aa/bb/", True)


def test_url_side_is_never_shuffled(spark):
    """The rule table broadcasts; the frontier side must carry no
    hash-partitioned exchange (the rules groupBy is the only agg and
    it feeds the broadcast)."""
    urls = _urls(spark, [(i, "h", f"/private/p{i}") for i in range(64)])
    rules = _rules(spark, RULES)
    out = robots_filter(urls, rules)
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the only allowed hash exchange is the tiny rules aggregate
    assert plan.count("Exchange hashpartitioning") <= 1
    assert out.count() == 64


def test_preserves_url_columns_and_extra_attrs(spark):
    urls = spark.createDataFrame(
        [(1, "h", "/tmp/x", 9)],
        "doc_id long, host string, path string, depth int",
    )
    out = robots_filter(urls, _rules(spark, RULES))
    assert out.columns == [
        "doc_id", "host", "path", "depth", "matched_prefix", "allowed"
    ]
    row = out.collect()[0]
    assert row["depth"] == 9 and row["allowed"] is False


def test_null_verdict_rule_is_dropped(spark):
    # a NULL-allow rule must not win longest-match and then silently
    # fall back to the default (review regression)
    got = _verdicts(
        spark,
        [(1, "h", "/private/deep/x")],
        RULES + [("h", "/private/deep/", None)],
    )
    assert got[1] == ("/private/", False)
