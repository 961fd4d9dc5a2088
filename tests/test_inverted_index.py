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
