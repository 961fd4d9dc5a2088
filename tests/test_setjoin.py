"""Exact prefix-filtered set-similarity self-join (functions/setjoin).

Covers: hand-computable pairs, brute-force parity on a randomized
corpus, threshold-boundary exactness (integer keep rule), and the
prefix filter actually pruning (candidate explode emits fewer rows
than the full-token explode would).
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from ocr_translation_spark.functions.setjoin import setsim_selfjoin


def _brute(rows, t_num, t_den):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        a, b = set(sa), set(sb)
        if not a or not b:
            continue
        i = len(a & b)
        u = len(a | b)
        if t_den * i >= t_num * u:
            lo, hi = min(ia, ib), max(ia, ib)
            out.add((lo, hi, i, u))
    return out


def _run(spark, rows, t_num, t_den):
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    got = setsim_selfjoin(df, "id", "toks", t_num, t_den)
    return {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in got.collect()
    }


def test_hand_computed_pairs(spark):
    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),   # J(1,2) = 3/5 = 0.6
        (3, ["a", "b", "c", "d"]),   # J(1,3) = 1.0
        (4, ["x", "y"]),             # disjoint from the rest
        (5, []),                     # empty set: excluded entirely
    ]
    got = _run(spark, rows, 6, 10)
    assert got == {(1, 2, 3, 5), (1, 3, 4, 4), (2, 3, 3, 5)}
    # raise the bar past 0.6: the boundary pair must drop EXACTLY
    got = _run(spark, rows, 61, 100)
    assert got == {(1, 3, 4, 4)}


def test_threshold_boundary_is_integer_exact(spark):
    # J = 7/10 exactly: kept at t=7/10, dropped at t=701/1000
    rows = [
        (1, [f"s{i}" for i in range(7)] + ["a", "b", "c"]),
        (2, [f"s{i}" for i in range(7)] + ["d", "e", "f"]),
        # unrelated filler so df-ordering is nontrivial
        (3, ["a", "d", "zz"]),
    ]
    assert (1, 2, 7, 13) not in _run(spark, rows, 7, 10)  # 7/13 < 0.7
    rows = [
        (1, [f"s{i}" for i in range(14)] + ["a", "b", "c"]),
        (2, [f"s{i}" for i in range(14)] + ["d", "e", "f"]),
    ]
    # J = 14/20 = 0.7 exactly
    assert (1, 2, 14, 20) in _run(spark, rows, 7, 10)
    assert (1, 2, 14, 20) not in _run(spark, rows, 701, 1000)


def test_brute_force_parity_randomized(spark):
    rng = random.Random(20260818)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, rng.randint(3, 12))
        rows.append((i, base))
        if rng.random() < 0.4:  # plant a near-dup of this row
            mut = list(base)
            if len(mut) > 3 and rng.random() < 0.5:
                mut.pop(rng.randrange(len(mut)))
            else:
                mut.append(rng.choice(vocab))
            rows.append((1000 + i, sorted(set(mut))))
    rows = [(i, sorted(set(t))) for i, t in rows]
    for t_num, t_den in ((1, 2), (7, 10), (9, 10)):
        got = _run(spark, rows, t_num, t_den)
        want = _brute(rows, t_num, t_den)
        assert got == want, (t_num, t_den, got ^ want)


def test_prefix_filter_prunes_candidates(spark):
    # 100 size-10 sets over a 30-token vocab: at t=0.9 the prefix is 2
    # tokens, so the candidate explode must emit ~2 rows/set, not 10.
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(30)]
    rows = [(i, sorted(set(rng.sample(vocab, 10)))) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    out = setsim_selfjoin(df, "id", "toks", 9, 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # correctness against brute force at the same threshold
    assert {
        (r.id_a, r.id_b, r.inter_size, r.union_size) for r in out.collect()
    } == _brute(rows, 9, 10)


def test_jaccard_column_matches_sizes(spark):
    rows = [(1, ["a", "b", "c"]), (2, ["a", "b", "d"])]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    r = setsim_selfjoin(df, "id", "toks", 1, 2).collect()
    assert len(r) == 1 and r[0].jaccard == 0.5
    got = setsim_selfjoin(df, "id", "toks", 1, 2).select(
        F.round(F.col("inter_size") / F.col("union_size"), 6).alias("j")
    ).collect()
    assert got[0].j == r[0].jaccard
