"""BM25 ranked retrieval: pure-Python exact parity + plan shape."""

from __future__ import annotations

import re

import pytest

from ocr_translation_spark.functions.retrieval import SCORE_SCALE, bm25_topk

QUERY = ["dup", "join", "scan"]


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text.lower().strip()).split(" ") if t]


def _py_bm25(rows, query, k1=(6, 5), b=(3, 4)):
    """Exact-integer reference: same cleared-denominator formula,
    Python bigints (never overflow), floor division (all positive)."""
    a, c = k1
    p, r = b
    toks = {d: _tokens(t) for d, t in rows}
    n = len(rows)
    t_total = sum(len(v) for v in toks.values())
    df = {w: sum(1 for v in toks.values() if w in v) for w in query}
    out = []
    for d, v in toks.items():
        dl = len(v)
        matched, score = 0, 0
        for w in query:
            tf = sum(1 for x in v if x == w)
            if tf == 0:
                continue
            matched += 1
            numer = SCORE_SCALE * (2 * n - 2 * df[w] + 1) * (a + c) * r * tf * t_total
            denom = (2 * df[w] + 1) * (
                c * r * tf * t_total + a * (r - p) * t_total + a * p * dl * n
            )
            score += numer // denom
        if matched:
            out.append((d, matched, score))
    out.sort(key=lambda x: (-x[2], int(x[0])))
    return out


CORPUS = [
    ("0", "dup dup scan merge the fast join"),
    ("1", "join join join scan scan window sort"),
    ("2", "no matching words here at all"),
    ("3", ""),  # empty doc: dl = 0, never matches
    ("4", "dup"),  # shortest doc containing the rarest term
    ("5", "scan " * 40),  # long doc, one term, heavy length penalty
    ("6", "dup dup scan merge the fast join"),  # exact tie with doc 0
    ("7", "   Scan\t JOIN  "),  # normalization: case + whitespace
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id string, text string")


def test_matches_pure_python_reference(spark, corpus_df):
    got = [
        (r["doc_id"], r["n_matched"], r["score_micro"])
        for r in bm25_topk(corpus_df, QUERY, top_k=10).collect()
    ]
    assert got == _py_bm25(CORPUS, QUERY)


def test_no_match_and_empty_docs_excluded(spark, corpus_df):
    ids = {r["doc_id"] for r in bm25_topk(corpus_df, QUERY, top_k=10).collect()}
    assert "2" not in ids and "3" not in ids
    assert ids == {"0", "1", "4", "5", "6", "7"}


def test_tie_break_is_numeric_doc_id(spark, corpus_df):
    rows = bm25_topk(corpus_df, QUERY, top_k=10).collect()
    # docs 0 and 6 are byte-identical -> identical scores, 0 first
    scores = {r["doc_id"]: r["score_micro"] for r in rows}
    assert scores["0"] == scores["6"]
    order = [r["doc_id"] for r in rows]
    assert order.index("0") + 1 == order.index("6")


def test_top_k_truncates_after_ordering(spark, corpus_df):
    full = bm25_topk(corpus_df, QUERY, top_k=10).collect()
    top2 = bm25_topk(corpus_df, QUERY, top_k=2).collect()
    assert [r["doc_id"] for r in top2] == [r["doc_id"] for r in full[:2]]


def test_rarest_term_dominates(spark, corpus_df):
    # idf(dup) >> idf(scan/join): the dup-only doc 4 must outrank the
    # scan-only doc 5 despite 5's 40x term count
    scores = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(corpus_df, QUERY, top_k=10).collect()
    }
    assert scores["4"] > scores["5"]


def test_plan_is_shuffle_free_on_corpus(spark, corpus_df):
    """The only exchanges are the single-row stats aggregate and its
    broadcast; the corpus path has no hash-partitioned shuffle and the
    top-k is a TakeOrderedAndProject, not a global sort."""
    plan = bm25_topk(corpus_df, QUERY, top_k=10)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "TakeOrderedAndProject" in plan


def test_validation():
    with pytest.raises(ValueError):
        bm25_topk(None, [])
    with pytest.raises(ValueError):
        bm25_topk(None, ["a", "a"])
    with pytest.raises(ValueError):
        bm25_topk(None, ["a"], b=(5, 4))
