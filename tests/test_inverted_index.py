"""Inverted index: pure-Python parity, exact df with bounded postings,
and the hot-term cap actually truncating."""

from __future__ import annotations

import collections
import re

from ocr_translation_spark.functions.index import inverted_index


def _py_index(rows, max_postings):
    postings = collections.defaultdict(list)
    for doc_id, text in rows:
        norm = re.sub(r"\s+", " ", text.strip().lower())
        for term in set(norm.split(" ")):
            if term:
                postings[term].append(doc_id)
    out = {}
    for term, ids in postings.items():
        ids.sort()
        out[term] = (
            len(ids),
            ",".join(str(i) for i in ids[:max_postings]),
        )
    return out


def test_inverted_index_matches_python(spark):
    rows = [
        (1, "the Quick  brown fox"),
        (2, "the quick fox fox"),  # within-doc dup term counts once
        (3, "  Lazy DOG the "),
        (4, ""),  # blank doc contributes nothing
        (5, "dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: (r["df"], r["postings_csv"])
        for r in inverted_index(df, max_postings=2).collect()
    }
    assert got == _py_index(rows, 2)
    # the hot term exceeded the cap: df exact, postings truncated
    assert got["the"] == (3, "1,2")


def test_inverted_index_bounded_postings(spark):
    # one term in every doc: postings capped, df = corpus size
    rows = [(i, f"common unique{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(
        7
    )
    got = {
        r["term"]: (r["df"], r["postings_csv"])
        for r in inverted_index(df, max_postings=5).collect()
    }
    assert got["common"] == (100, "0,1,2,3,4")
    assert got["unique42"] == (1, "42")
    assert all(
        len(p.split(",")) <= 5 for _, p in got.values()
    )


# ---------------------------------------------------------------------------
# anchor_text_agg — bounded per-target anchor aggregation
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src long, dst long, anchor string"
    )


def test_anchor_text_agg_caps_hot_target_but_counts_stay_exact(spark):
    from ocr_translation_spark.functions.index import anchor_text_agg

    rows = [(s, 1, f"anchor {s}") for s in range(5)] + [(9, 2, "only")]
    got = {
        r["dst"]: r.asDict()
        for r in anchor_text_agg(_edges(spark, rows), max_anchors=3).collect()
    }
    hot = got[1]
    assert hot["in_degree"] == 5 and hot["n_sources"] == 5
    # first 3 in (anchor, src) order despite 5 incoming links
    assert hot["anchors_csv"] == "anchor 0|anchor 1|anchor 2"
    assert got[2]["anchors_csv"] == "only"


def test_anchor_text_agg_distinct_sources_vs_in_degree(spark):
    from ocr_translation_spark.functions.index import anchor_text_agg

    rows = [(7, 1, "b"), (7, 1, "a"), (8, 1, "c")]
    (r,) = anchor_text_agg(_edges(spark, rows), max_anchors=16).collect()
    assert r["in_degree"] == 3
    assert r["n_sources"] == 2  # src 7 linked twice
    assert r["anchors_csv"] == "a|b|c"  # (anchor, src) order


def test_anchor_text_agg_single_exchange(spark):
    """Window rank + bounded collect + exact counts must share ONE
    dst-hash exchange (the inverted_index discipline)."""
    from ocr_translation_spark.functions.index import anchor_text_agg

    df = spark.range(200).selectExpr(
        "id as src", "id % 13 as dst", "concat('a', id) as anchor"
    )
    plan = (
        anchor_text_agg(df, max_anchors=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
