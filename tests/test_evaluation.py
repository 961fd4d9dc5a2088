"""Distributed recall@k evaluation (functions/evaluation)."""

from __future__ import annotations

from ocr_translation_spark.functions.evaluation import topk_recall


def _df(spark, pairs):
    return spark.createDataFrame(
        pairs, "query_id long, neighbor_id long"
    )


def test_recall_hand_computed(spark):
    exact = _df(spark, [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)])
    approx = _df(spark, [(1, 10), (1, 99), (1, 12), (2, 55), (2, 66)])
    got = {
        r.query_id: (r.n_exact, r.n_hit, r.recall_micro)
        for r in topk_recall(approx, exact).collect()
    }
    assert got[1] == (3, 2, 666666)  # floor(2e6/3)
    assert got[2] == (2, 0, 0)       # zero-hit query still present


def test_recall_perfect_and_extra_approx_rows(spark):
    exact = _df(spark, [(1, 10), (1, 11)])
    # approx returning MORE rows than exact must not inflate recall
    approx = _df(spark, [(1, 10), (1, 11), (1, 12), (1, 13)])
    got = topk_recall(approx, exact).collect()
    assert len(got) == 1 and got[0].recall_micro == 1000000


def test_recall_matches_lsh_vs_brute_on_testdata(spark):
    from pyspark.sql import functions as F

    from ocr_translation_spark.functions.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, qs, k=5)
    approx = lsh_bucketed_topk(emb, qs, dim=64, k=5, n_planes=6,
                               multiprobe=2)
    rows = topk_recall(approx, exact).collect()
    assert len(rows) == 10
    # python-side recomputation of the same recall
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    for r in rows:
        n_exact = sum(1 for q, _ in e if q == r.query_id)
        n_hit = sum(1 for p in e if p[0] == r.query_id and p in a)
        assert (r.n_exact, r.n_hit) == (n_exact, n_hit)
        assert r.recall_micro == (1_000_000 * n_hit) // n_exact


# ---- span-level extraction evaluation ----

_SPAN_SCHEMA = (
    "doc_id string, ord int, kind string, text string, media_ref string"
)


def test_span_eval_hand_computed(spark):
    from ocr_translation_spark.functions.evaluation import span_eval

    gold = spark.createDataFrame(
        [
            ("d1", 0, "text", "hello", None),
            ("d1", 1, "media", None, "ref-1"),
            ("d1", 2, "text", "world", None),
            ("d2", 0, "text", "solo", None),
        ],
        _SPAN_SCHEMA,
    )
    pred = spark.createDataFrame(
        [
            ("d1", 0, "text", "hello", None),
            ("d1", 1, "text", "world", None),   # right triple, wrong pos
            ("d1", 2, "text", "WRONG", None),   # miss
            ("d2", 0, "text", "solo", None),    # perfect
        ],
        _SPAN_SCHEMA,
    )
    out = {r.doc_id: r for r in span_eval(pred, gold).collect()}
    d1 = out["d1"]
    # multiset: hello + world match (media span lost) -> tp=2 of 3
    assert (d1.n_pred, d1.n_gold, d1.tp) == (3, 3, 2)
    assert d1.pos_match == 1  # only position 0 aligns exactly
    assert d1.exact_seq == 0
    assert d1.precision_micro == (2 * 10**6) // 3
    assert d1.recall_micro == (2 * 10**6) // 3
    assert d1.f1_micro == (4 * 10**6) // 6
    d2 = out["d2"]
    assert d2.exact_seq == 1 and d2.f1_micro == 10**6
    assert d2.pos_match == 1


def test_span_eval_null_fields_count_in_multiset(spark):
    from ocr_translation_spark.functions.evaluation import span_eval

    # identical media spans (NULL text) must count as tp — the
    # sentinel-coalesce contract; without it the triple join drops
    # NULL keys and media spans never score
    rows = [("d", 0, "media", None, "r1"), ("d", 1, "media", None, "r2")]
    df = spark.createDataFrame(rows, _SPAN_SCHEMA)
    r = span_eval(df, df).collect()[0]
    assert (r.tp, r.exact_seq, r.f1_micro) == (2, 1, 10**6)


def test_span_eval_one_sided_docs_zero_filled(spark):
    from ocr_translation_spark.functions.evaluation import span_eval

    gold = spark.createDataFrame(
        [("only_gold", 0, "text", "x", None)], _SPAN_SCHEMA
    )
    pred = spark.createDataFrame(
        [("only_pred", 0, "text", "y", None)], _SPAN_SCHEMA
    )
    out = {r.doc_id: r for r in span_eval(pred, gold).collect()}
    og = out["only_gold"]
    assert (og.n_pred, og.n_gold, og.tp) == (0, 1, 0)
    assert og.precision_micro is None and og.recall_micro == 0
    op = out["only_pred"]
    assert (op.n_pred, op.n_gold) == (1, 0)
    assert op.recall_micro is None and op.precision_micro == 0
    assert op.exact_seq == 0 and og.exact_seq == 0


# --- roc_auc -----------------------------------------------------------


def _auc_py(rows):
    """Pure-Python pair-counting mirror: rows = [(score, label)]."""
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        return (len(pos), len(neg), 0, None)
    gt = sum(1 for p in pos for n in neg if p > n)
    tie = sum(1 for p in pos for n in neg if p == n)
    return (
        len(pos),
        len(neg),
        tie,
        (2 * gt + tie) * 1000000 // (2 * len(pos) * len(neg)),
    )


def test_roc_auc_randomized_python_parity(spark):
    import random

    from ocr_translation_spark.functions.evaluation import roc_auc

    rng = random.Random(20260819)
    rows = [
        (
            "g%d" % (i % 3),
            rng.randint(0, 12),  # narrow domain -> heavy ties
            1 if rng.random() < 0.35 + 0.04 * (i % 9) else 0,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, s int, y int")
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["tie_pairs"], r["auc_ppm"])
        for r in roc_auc(df, "s", "y", ("g",)).collect()
    }
    for g in ("g0", "g1", "g2"):
        want = _auc_py([(s, y) for gg, s, y in rows if gg == g])
        assert got[g] == want, (g, got[g], want)


def test_roc_auc_degenerate_and_all_ties(spark):
    from ocr_translation_spark.functions.evaluation import roc_auc

    # one class only -> AUC undefined (NULL), counts still reported
    df1 = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1)], "g string, s int, y int"
    )
    [r1] = roc_auc(df1, "s", "y", ("g",)).collect()
    assert (r1["n_pos"], r1["n_neg"], r1["auc_ppm"]) == (2, 0, None)
    # every score identical -> exactly 0.5 (all pairs are ties)
    df2 = spark.createDataFrame(
        [("a", 5, 1), ("a", 5, 0), ("a", 5, 1), ("a", 5, 0)],
        "g string, s int, y int",
    )
    [r2] = roc_auc(df2, "s", "y", ("g",)).collect()
    assert r2["auc_ppm"] == 500000 and r2["tie_pairs"] == 4
    # perfect separation -> exactly 1.0
    df3 = spark.createDataFrame(
        [("a", 9, 1), ("a", 8, 1), ("a", 1, 0), ("a", 2, 0)],
        "g string, s int, y int",
    )
    [r3] = roc_auc(df3, "s", "y", ("g",)).collect()
    assert r3["auc_ppm"] == 1000000 and r3["tie_pairs"] == 0


def test_roc_auc_ungrouped_and_null_filtering(spark):
    from ocr_translation_spark.functions.evaluation import roc_auc

    rows = [(3, 1), (2, 0), (None, 1), (4, None), (3, 0), (5, 1)]
    df = spark.createDataFrame(rows, "s int, y int")
    [r] = roc_auc(df, "s", "y").collect()
    # kept rows: (3,1) (2,0) (3,0) (5,1)
    want = _auc_py([(3, 1), (2, 0), (3, 0), (5, 1)])
    assert (r["n_pos"], r["n_neg"], r["tie_pairs"], r["auc_ppm"]) == want


# --- calibration_bins --------------------------------------------------


def test_calibration_hand_computed_and_negative_floor(spark):
    from ocr_translation_spark.functions.evaluation import (
        calibration_bins,
    )

    rows = [(7, 1), (6, 0), (4, 1), (3, 0), (-3, 1), (-5, 0)]
    df = spark.createDataFrame(rows, "s long, y int")
    got = {
        r["bin_id"]: (
            r["n"],
            r["n_pos"],
            r["pos_rate_ppm"],
            r["mean_score_micro"],
        )
        for r in calibration_bins(df, "s", "y", 4).collect()
    }
    # floor semantics: 7,6,4 -> bin 1; 3 -> bin 0; -3,-5 -> bin -1,-2
    assert got[1] == (3, 2, 666666, 5666666)
    assert got[0] == (1, 0, 0, 3000000)
    assert got[-1] == (1, 1, 1000000, -3000000)
    assert got[-2] == (1, 0, 0, -5000000)


def test_calibration_randomized_python_parity(spark):
    import random

    from ocr_translation_spark.functions.evaluation import (
        calibration_bins,
    )

    rng = random.Random(20260819)
    rows = [
        (rng.randint(-20, 40), rng.randint(0, 1)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "s long, y int")
    got = {
        r["bin_id"]: (r["n"], r["n_pos"], r["pos_rate_ppm"])
        for r in calibration_bins(df, "s", "y", 5).collect()
    }
    from collections import defaultdict

    byb = defaultdict(list)
    for s, y in rows:
        byb[s // 5].append(y)  # python // floors like F.floor
    for b, ys in byb.items():
        n, np_ = len(ys), sum(ys)
        assert got[b] == (n, np_, 1000000 * np_ // n), (b, got[b])
    assert set(got) == set(byb)


def test_calibration_validation(spark):
    import pytest

    from ocr_translation_spark.functions.evaluation import (
        calibration_bins,
    )

    df = spark.createDataFrame([(1, 1)], "s long, y int")
    with pytest.raises(ValueError):
        calibration_bins(df, "s", "y", 0)


# --- kendall_tau -------------------------------------------------------


def test_kendall_randomized_brute_force_parity(spark):
    import itertools
    import random

    from ocr_translation_spark.functions.evaluation import kendall_tau

    rng = random.Random(20260819)
    rows = [
        (rng.randint(0, 8), rng.randint(0, 8)) for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "a int, b int")
    [r] = kendall_tau(df, "a", "b").collect()
    c = d = 0
    for (a1, b1), (a2, b2) in itertools.combinations(rows, 2):
        s = (a2 - a1) * (b2 - b1)
        c += s > 0
        d += s < 0
    n = len(rows)
    num, den = (c - d) * 2000000, n * (n - 1)
    want = num // den if num >= 0 else -((-num) // den)
    assert (
        r["n_rows"], r["concordant"], r["discordant"], r["tau_a_ppm"]
    ) == (n, c, d, want)
    assert r["n_cells"] == len(set(rows))


def test_kendall_extremes_and_degenerate(spark):
    from ocr_translation_spark.functions.evaluation import kendall_tau

    perfect = spark.createDataFrame(
        [(i, i * 10) for i in range(12)], "a int, b int"
    )
    assert kendall_tau(perfect, "a", "b").collect()[0][
        "tau_a_ppm"
    ] == 1000000
    reversed_ = spark.createDataFrame(
        [(i, -i) for i in range(12)], "a int, b int"
    )
    assert kendall_tau(reversed_, "a", "b").collect()[0][
        "tau_a_ppm"
    ] == -1000000
    # all ties on one axis: tau-a = 0 (every pair is a tie)
    flat = spark.createDataFrame(
        [(i, 7) for i in range(10)], "a int, b int"
    )
    row = kendall_tau(flat, "a", "b").collect()[0]
    assert (row["concordant"], row["discordant"], row["tau_a_ppm"]) == (
        0, 0, 0,
    )
    single = spark.createDataFrame([(1, 1)], "a int, b int")
    assert kendall_tau(single, "a", "b").collect()[0][
        "tau_a_ppm"
    ] is None
