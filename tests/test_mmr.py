"""MMR diversified re-ranking (functions/mmr.py)."""

from __future__ import annotations

from ocr_translation_spark.functions.mmr import _jaccard_ppm, mmr_rerank


def _run(spark, rows, k=3, lam_num=7, lam_den=10):
    df = spark.createDataFrame(
        rows, "q string, doc_id long, rel_w long, sh array<string>"
    )
    out = mmr_rerank(
        df,
        group_col="q",
        id_col="doc_id",
        rel_col="rel_w",
        shingle_col="sh",
        k=k,
        lam_num=lam_num,
        lam_den=lam_den,
    )
    return {
        (r["q"], r["sel_rank"]): (r["doc_id"], r["mmr_score_w"])
        for r in out.collect()
    }


def test_near_dup_of_top_pick_demoted(spark):
    # doc 2 is a near-copy of top-relevance doc 1; doc 3 is less
    # relevant but disjoint -> MMR picks 1, then 3, then 2.
    rows = [
        ("q", 1, 100, ["a b c", "b c d", "c d e"]),
        ("q", 2, 99, ["a b c", "b c d", "c d x"]),
        ("q", 3, 60, ["p q r", "q r s"]),
    ]
    got = _run(spark, rows, k=3)
    assert got[("q", 1)] == (1, 700)
    # doc2 vs doc1 jaccard = 2/4 = 500000 ppm: 7*99 - 3*500000
    # doc3 vs doc1 jaccard = 0:               7*60 - 0 = 420
    assert got[("q", 2)] == (3, 420)
    assert got[("q", 3)] == (2, 7 * 99 - 3 * 500_000)


def test_small_group_returns_all_and_first_score(spark):
    rows = [("q", 7, 10, ["x"]), ("q", 8, 20, ["y"])]
    got = _run(spark, rows, k=5)
    assert got == {
        ("q", 1): (8, 140),
        ("q", 2): (7, 70),
    }


def test_tiebreak_min_id(spark):
    rows = [
        ("q", 5, 10, ["a"]),
        ("q", 3, 10, ["b"]),
        ("q", 4, 10, ["c"]),
    ]
    got = _run(spark, rows, k=1)
    assert got[("q", 1)] == (3, 70)


def test_identical_sets_score_full_similarity(spark):
    assert _jaccard_ppm(frozenset(["a"]), frozenset(["a"])) == 1_000_000
    assert _jaccard_ppm(frozenset(), frozenset()) == 1_000_000
    rows = [("q", 1, 50, ["a"]), ("q", 2, 50, ["a"])]
    got = _run(spark, rows, k=2)
    assert got[("q", 1)] == (1, 350)
    assert got[("q", 2)] == (2, 7 * 50 - 3 * 1_000_000)


def test_multi_group_python_parity_randomized(spark):
    import random

    rng = random.Random(20260819)
    vocab = [f"s{i}" for i in range(12)]
    rows = []
    for gi in range(6):
        for d in range(rng.randrange(1, 9)):
            sh = sorted(
                set(
                    rng.choice(vocab)
                    for _ in range(rng.randrange(1, 6))
                )
            )
            rows.append((f"g{gi}", gi * 100 + d, rng.randrange(1, 40), sh))

    def brute(group_rows, k, ln, ld):
        rem = sorted(
            [(r[2], r[1], frozenset(r[3])) for r in group_rows],
            key=lambda t: (-t[0], t[1]),
        )
        out, sets = [], []
        while rem and len(out) < k:
            best = None
            for j, (rel, i, sh) in enumerate(rem):
                ms = max((_jaccard_ppm(sh, s) for s in sets), default=0)
                sc = ln * rel - (ld - ln) * ms
                if best is None or (sc, -i) > (best[1], -best[2]):
                    best = (j, sc, i)
            j, sc, i = best
            _, _, sh = rem.pop(j)
            out.append((i, sc))
            sets.append(sh)
        return out

    got = _run(spark, rows, k=4)
    for gi in range(6):
        grp = [r for r in rows if r[0] == f"g{gi}"]
        want = brute(grp, 4, 7, 10)
        for rank, (i, sc) in enumerate(want, start=1):
            assert got[(f"g{gi}", rank)] == (i, sc)
