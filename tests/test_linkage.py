"""Fellegi-Sunter record-linkage scoring (functions/linkage)."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from ocr_translation_spark.functions.linkage import (
    DEFAULT_FIELDS,
    DEFAULT_THRESHOLD,
    fs_score,
    record_linkage_fs,
)

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


def test_fs_score_hand_computed(spark):
    # all four agreement patterns of interest, weights checked against
    # the rational arithmetic done independently with Fraction
    rows = [
        (True, True, True, True),
        (True, False, True, True),
        (False, False, False, False),
        (False, True, True, False),
    ]
    df = spark.createDataFrame(
        rows,
        "agree_text boolean, agree_lang boolean, "
        "agree_source boolean, agree_len boolean",
    )
    got = {
        (r.agree_text, r.agree_lang, r.agree_source, r.agree_len): (
            r.score_num,
            r.score_den,
            r.score_ppm,
            r.is_match,
        )
        for r in fs_score(df).collect()
    }
    ratios = {
        "agree": [Fraction(400, 1), Fraction(19, 6), Fraction(9, 1), Fraction(4, 1)],
        "dis": [Fraction(1, 5), Fraction(1, 14), Fraction(1, 9), Fraction(1, 3)],
    }
    for pattern, (num, den, ppm, is_match) in got.items():
        want = Fraction(1)
        for i, agree in enumerate(pattern):
            want *= ratios["agree" if agree else "dis"][i]
        assert Fraction(num, den) == want, pattern
        assert ppm == (num * 1_000_000) // den, pattern
        t_num, t_den = DEFAULT_THRESHOLD
        assert is_match == int(num * t_den >= t_num * den), pattern


def test_fs_score_rejects_bad_threshold(spark):
    import pytest

    df = spark.createDataFrame(
        [(True, True, True, True)],
        "agree_text boolean, agree_lang boolean, "
        "agree_source boolean, agree_len boolean",
    )
    with pytest.raises(ValueError, match="threshold"):
        fs_score(df, DEFAULT_FIELDS, threshold=(0, 1)).collect()


def test_exact_twin_scores_maximum_and_matches(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, base, "en", "web", len(base)),
        (2, base, "en", "web", len(base)),  # exact twin of 1
        (3, "zzz completely different text zzz", "en", "web", 33),
    ]
    out = {
        (r.id_a, r.id_b): r
        for r in record_linkage_fs(_docs(spark, rows)).collect()
    }
    twin = out[(1, 2)]
    # every field agrees -> maximal weight 400*19/6*9*4 = 45600/6
    assert (twin.score_num, twin.score_den) == (400 * 19 * 9 * 4, 6)
    assert twin.is_match == 1
    assert twin.agree_text == 1 and twin.agree_len == 1
    # the unrelated pair (if generated at all) must not classify match
    for (a, b), r in out.items():
        if (a, b) != (1, 2):
            assert r.is_match == 0, (a, b)


def test_length_rule_is_exact_five_percent(spark):
    # 5% rule: 20 * |da - db| <= max(da, db)
    long_a = "a" * 100
    rows = [
        (1, long_a, "en", "web", 100),
        (2, long_a, "en", "web", 105),  # 20*5=100 <= 105 -> agree
        (3, long_a, "en", "web", 106),  # 20*6=120 > 106 -> disagree
    ]
    out = {
        (r.id_a, r.id_b): (r.agree_len, r.agree_text)
        for r in record_linkage_fs(_docs(spark, rows)).collect()
    }
    assert out[(1, 2)][0] == 1
    assert out[(1, 3)][0] == 0
    # text equality is on the NORMALIZED text, independent of n_chars
    assert out[(1, 3)][1] == 1


def test_partition_invariance(spark):
    rows = [
        (i, f"document number {i % 7} body text", f"l{i % 3}",
         f"s{i % 2}", 25 + (i % 11))
        for i in range(60)
    ]
    df = _docs(spark, rows)
    a = {tuple(r) for r in record_linkage_fs(df).collect()}
    b = {tuple(r) for r in record_linkage_fs(df.repartition(13)).collect()}
    assert a == b and a


def test_scoring_adds_no_python_and_no_extra_shuffle(spark):
    # the scoring stage on top of blocking must stay row-local codegen:
    # same exchange count as the bare pair generator, no Python workers
    from ocr_translation_spark.functions.blocking import (
        sorted_neighborhood_pairs,
    )
    from ocr_translation_spark.functions.text import normalized_text

    rows = [
        (i, f"text body {i}", "en", "web", 12) for i in range(50)
    ]
    df = _docs(spark, rows)
    base = df.select(
        F.col("doc_id").alias("id"),
        normalized_text(F.col("text")).alias("nkey"),
        "lang", "source", F.col("n_chars").cast("long").alias("n_chars"),
    )
    bare = sorted_neighborhood_pairs(base, key="nkey", id_col="id", window=4)
    scored = record_linkage_fs(df)

    def _exchanges(q):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        return plan.count("Exchange")

    assert _exchanges(scored) == _exchanges(bare)


def test_golden_record_survivorship_rules(spark):
    from ocr_translation_spark.functions.linkage import golden_record

    # FS arithmetic: same text+lang+len with source differing scores
    # 400 * 19/6 * 1/9 * 4 = 30400/54 ~ 563 >= 100 -> match; a
    # longer/different text scores 1/5 * 19/6 * 9 * 4 = 22.8 -> no
    # match. So {1, 2, 3} chain into one entity (1-2 and 2-3 match
    # pairwise via identical text), 9 stays a singleton.
    long_txt = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, long_txt, "en", "web", len(long_txt)),
        (2, long_txt, "en", "api", len(long_txt)),
        (3, long_txt, "en", "web", len(long_txt) + 4),  # within 5%
        (9, "zzz completely different text zzz", "fr", "web", 33),
    ]
    out = {
        r.cluster_id: r
        for r in golden_record(
            spark.createDataFrame(rows, _DOC_SCHEMA)
        ).collect()
    }
    # every input row lands in exactly one golden record
    assert sum(r.n_members for r in out.values()) == len(rows)
    ent = out[1]  # min-id cluster label
    assert ent.canonical_id == 1 and ent.n_members == 3
    assert ent.text == long_txt         # longest by n_chars: doc 3
    assert ent.lang == "en"             # unanimous
    assert ent.source == "web"          # 2-vs-1 majority
    solo = out[9]
    assert (solo.n_members, solo.canonical_id) == (1, 9)
    assert solo.lang == "fr"


def test_golden_record_majority_tie_breaks_to_smallest_value(spark):
    from ocr_translation_spark.functions.linkage import golden_record

    # same text+lang+len, source differs (still >= 100, see above):
    # the 1-1 source tie must break to the SMALLEST value
    t = "identical text body for every member here " * 2
    rows = [
        (1, t, "en", "web", len(t)),
        (2, t, "en", "api", len(t)),
    ]
    out = golden_record(
        spark.createDataFrame(rows, _DOC_SCHEMA)
    ).collect()
    ent = [r for r in out if r.n_members == 2][0]
    assert ent.source == "api"  # 1-1 tie: min value wins
    assert ent.lang == "en"
    assert ent.text == t  # equal n_chars: doc_id asc keeps doc 1's
