"""Unit tests for bot-regularity scoring (functions/behavior.py) and
MRR retrieval evaluation (functions/evaluation.mrr_eval)."""

import datetime
import random

from ocr_translation_spark.functions.behavior import (
    bot_regularity_scores,
)
from ocr_translation_spark.functions.evaluation import mrr_eval


# ---------------------------------------------------------------- bots
def _bot_ref(rows, min_events=20, max_cv2_ppm=300000):
    by_u = {}
    for u, ts in rows:
        if u is not None and ts is not None:
            by_u.setdefault(u, []).append(int(ts.timestamp()))
    out = {}
    for u, secs in by_u.items():
        secs.sort()
        g = [b - a for a, b in zip(secs, secs[1:])]
        if not g:
            continue
        n, span, ssq = len(g), sum(g), sum(x * x for x in g)
        cv2 = 0 if span == 0 else (1000000 * n * ssq) // (span * span) - 1000000
        out[u] = (
            len(secs), n, span, ssq, cv2,
            len(secs) >= min_events and cv2 <= max_cv2_ppm,
        )
    return out


def _bot_got(df):
    return {
        r["user_id"]: (
            r["n_events"], r["n_gaps"], r["span_s"], r["sum_gap_sq"],
            r["cv2_ppm"], r["is_bot"],
        )
        for r in df.collect()
    }


def test_bot_scores_match_python_reference(spark):
    rng = random.Random(31)
    base = datetime.datetime(2024, 4, 1)
    rows = [
        (rng.randrange(8), base + datetime.timedelta(
            seconds=rng.randrange(200000)))
        for _ in range(300)
    ]
    # metronome: 25 events exactly 60 s apart -> cv2 = 0, flagged
    rows += [(99, base + datetime.timedelta(seconds=60 * i))
             for i in range(25)]
    # burst: 20 events on the SAME second -> span 0, flagged
    rows += [(77, base)] * 20
    # single-event user: no gaps, no row
    rows += [(55, base)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = _bot_got(bot_regularity_scores(df))
    assert got == _bot_ref(rows)
    assert got[99][5] is True and got[99][4] == 0
    assert got[77] == (20, 19, 0, 0, 0, True)
    assert 55 not in got


def test_bot_partition_invariance(spark):
    base = datetime.datetime(2024, 4, 1)
    rows = [(1, base + datetime.timedelta(seconds=s))
            for s in (0, 10, 30, 90, 91, 300)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    a = _bot_got(bot_regularity_scores(df.coalesce(1)))
    b = _bot_got(bot_regularity_scores(df.repartition(5)))
    assert a == b


# ---------------------------------------------------------------- MRR
def test_mrr_first_relevant_and_empty(spark):
    rows = [
        ("1", "alpha beta pad pad"),   # both terms -> relevant
        ("2", "alpha pad pad pad"),
        ("3", "beta pad pad pad"),
        ("4", "gamma pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["query_id"]: (r["n_rel_topk"], r["first_rel_rank"],
                        r["rr_micro"])
        for r in mrr_eval(
            df,
            {"ab": ["alpha", "beta"], "none": ["alpha", "zzz"]},
            top_k=3,
        ).collect()
    }
    # doc 1 carries both terms at equal length/tf -> strictly top
    assert got["ab"] == (1, 1, 1000000)
    # no doc contains zzz -> zero relevant, rr = 0
    assert got["none"] == (0, 0, 0)


def test_mrr_truncating_reciprocal_and_fully_empty_query(spark):
    # short one-term docs outscore (BM25 length norm + idf) the
    # diluted both-term doc, forcing first_rel_rank = 3 — the
    # truncating division path genuinely runs
    rows = [
        ("1", "alpha"),
        ("2", "alpha beta " + "pad " * 30),
        ("3", "beta " + "pad " * 5),
        ("4", "pad pad"), ("5", "pad pad"), ("6", "pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["query_id"]: (r["n_rel_topk"], r["first_rel_rank"],
                        r["rr_micro"])
        for r in mrr_eval(
            df,
            {"q": ["alpha", "beta"], "void": ["zzz", "yyy"]},
            top_k=5,
        ).collect()
    }
    assert out["q"] == (1, 3, 333333)
    # a query matching NOTHING (empty top-k): zeros, not NULLs
    assert out["void"] == (0, 0, 0)


def test_bm25_pre_split_is_value_identical(spark):
    from pyspark.sql import functions as F
    from ocr_translation_spark.functions.retrieval import bm25_topk
    from ocr_translation_spark.functions.text import normalized_text

    rows = [("1", "Alpha  beta pad"), ("2", "alpha pad pad"),
            ("3", "BETA pad"), ("4", "pad pad pad")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    plain = bm25_topk(df, ["alpha", "beta"], top_k=4).collect()
    toks = df.select(
        "doc_id",
        F.filter(
            F.split(normalized_text(F.col("text")), " "),
            lambda t: t != "",
        ).alias("toks"),
    )
    split = bm25_topk(
        toks, ["alpha", "beta"], top_k=4,
        text_col="toks", pre_split=True,
    ).collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in split]
