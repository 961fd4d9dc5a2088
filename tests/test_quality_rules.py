"""Unit tests for functions/quality_rules.py — hand-computed verdicts,
threshold boundaries (cross-multiplied integer comparisons decide
exact-boundary docs), and the empty-document conventions. The DuckDB
value oracle (gopher_quality_rules in __spark_entry__) pins engine
equality on the planted-dirt corpus; these pin the MATH."""

from __future__ import annotations

from ocr_translation_spark.functions.quality_rules import (
    gopher_quality_rules,
)


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = gopher_quality_rules(df, **kw).orderBy("doc_id").collect()
    return [r.asDict() for r in rows]


GOOD = "the quick data value runs the whole data table value check"  # 11 words


def test_clean_doc_keeps(spark):
    (r,) = _run(spark, [GOOD])
    assert r["n_words"] == 11
    assert r["n_stop_hits"] == 3  # the, data, value
    assert all(r[k] for k in r if k.startswith("r_"))
    assert r["keep"]


def test_word_count_bounds(spark):
    short, ok = _run(spark, ["the data val tok", GOOD], min_words=5)
    assert short["n_words"] == 4 and not short["r_word_count"]
    assert ok["r_word_count"]
    (capped,) = _run(spark, [GOOD], max_words=10)
    assert not capped["r_word_count"]  # 11 > 10


def test_mean_word_len_boundary_is_exact(spark):
    # 4 words x 3 chars = 12 chars: lower bound 3*4=12 holds with
    # equality -> passes; one 2-char word tips the sum to 11 -> fails.
    at, below = _run(
        spark, ["abc def ghi jkl", "abc def ghi kl"], min_stop_hits=0
    )
    assert at["n_word_chars"] == 12 and at["r_mean_word_len"]
    assert below["n_word_chars"] == 11 and not below["r_mean_word_len"]


def test_symbol_ratio_counts_hashes_and_ellipses(spark):
    (r,) = _run(spark, ["a b c d e f g h i j # ... #"], min_stop_hits=0)
    # 13 words, '#' x2 + '...' x1 = 3 symbols: 300 > 130 -> fails
    assert r["n_symbols"] == 3 and not r["r_symbol_ratio"]
    (ok,) = _run(spark, ["a b c d e f g h i j # " + GOOD], min_stop_hits=0)
    # 1 symbol over 22 words: 100 <= 220 -> passes
    assert ok["n_symbols"] == 1 and ok["r_symbol_ratio"]


def test_bullet_and_ellipsis_line_fractions(spark):
    bullets = "\n".join(["- item"] * 10 + [GOOD])
    (r,) = _run(spark, [bullets])
    # 10 of 11 lines bulleted: 1000 > 990 -> fails
    assert r["n_lines"] == 11 and r["n_bullet_lines"] == 10
    assert not r["r_bullet_lines"]
    nine = "\n".join(["* item"] * 9 + [GOOD, GOOD])
    (ok,) = _run(spark, [nine])
    # 9 of 11: 900 <= 990 -> passes ('*' prefix also recognized)
    assert ok["n_bullet_lines"] == 9 and ok["r_bullet_lines"]

    ell = GOOD + "\nto be continued ...\nand more ..."
    (e,) = _run(spark, [ell])
    # 2 of 3 lines end '...': 200 > 90 -> fails
    assert e["n_ellipsis_lines"] == 2 and not e["r_ellipsis_lines"]


def test_alpha_fraction_boundary(spark):
    # 4 alpha + 1 numeric = exactly 80%: 400 >= 400 -> passes
    (at,) = _run(spark, ["the data value word 123"], min_stop_hits=0)
    assert at["n_alpha_words"] == 4 and at["r_alpha_words"]
    (below,) = _run(spark, ["the data value 12 34"], min_stop_hits=0)
    assert below["n_alpha_words"] == 3 and not below["r_alpha_words"]


def test_stopword_floor_counts_distinct_members(spark):
    (r,) = _run(spark, ["the the the word list"])
    assert r["n_stop_hits"] == 1  # repeats of 'the' count once
    assert not r["r_stopwords"]


def test_empty_doc_conventions(spark):
    (r,) = _run(spark, [""])
    assert r["n_words"] == 0 and r["n_lines"] == 0
    assert not r["r_word_count"] and not r["keep"]
    # zero-denominator ratio rules pass by convention
    for k in (
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_bullet_lines",
        "r_ellipsis_lines",
        "r_alpha_words",
    ):
        assert r[k], k


def test_plan_is_shuffle_free(spark):
    df = spark.range(100).selectExpr(
        "id as doc_id", "concat('the data value word w', id) as text"
    )
    plan = (
        gopher_quality_rules(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
