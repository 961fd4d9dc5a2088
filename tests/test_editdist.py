"""Edit-distance similarity self-join (PassJoin segment filter).

Exactness is the whole contract: the pigeonhole candidate generator
must be LOSSLESS (the final levenshtein verify can only remove
spurious candidates, never recover missed ones).  So the tests are
brute-force parity on adversarial and randomized corpora — empties,
un-segmentable shorts, duplicates, unicode, shifted copies — plus the
plan shape the 100 TB story depends on (candidates come from one hash
equi-join, never a cartesian product over the corpus)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ocr_translation_spark.functions.editdist import edit_distance_self_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[len(b)]


def _brute(rows, k):
    exp = set()
    for x in range(len(rows)):
        for y in range(x + 1, len(rows)):
            ia, sa = rows[x]
            ib, sb = rows[y]
            d = _lev(sa, sb)
            if d <= k:
                exp.add((min(ia, ib), max(ia, ib), d))
    return exp


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id int, s string")
    got = edit_distance_self_join(df, "doc_id", "s", k=k)
    return {(r.doc_a, r.doc_b, r.dist) for r in got.collect()}


def test_adversarial_corpus_exact(spark):
    rows = [
        (1, "hello world xyz"),
        (2, "hello world xy"),      # 1 deletion
        (3, "hhello world xyz"),    # 1 insertion
        (4, "hallo world xyz"),     # 1 substitution
        (5, "hello world xyz"),     # exact duplicate -> dist 0
        (6, "completely different"),
        (7, "héllo wörld xyz"),     # unicode, dist 2 from row 1
        (8, ""),                    # empty
        (9, ""),                    # empty pair -> dist 0
        (10, "ab"),                 # shorts (< k+1): brute leg
        (11, "ba"),
        (12, "a"),
        (13, "abc"),                # exactly k+1: main leg boundary
        (14, "abcd"),
    ]
    for k in (1, 2):
        assert _run(spark, rows, k) == _brute(rows, k), f"k={k}"


def test_randomized_parity(spark):
    rng = random.Random(42)
    rows = []
    for i in range(250):
        n = rng.choice([0, 1, 2, 3, 5, 8, 12, 13, 14, 15, 16])
        rows.append((i, "".join(rng.choice("abcd") for _ in range(n))))
    # planted shifted copies of one base string
    base = "qwertyuiopas"
    rows += [(500, base), (501, "x" + base), (502, base[1:]),
             (503, base[:5] + "Z" + base[6:])]
    assert _run(spark, rows, 2) == _brute(rows, 2)


def test_main_leg_is_equi_join_not_cartesian(spark):
    # Corpus of only long strings: the short brute-force leg is empty,
    # and the candidate join must be a hash/sort-merge EQUI join.
    rows = [(i, f"abcdefghij{i % 7}klmno") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, s string")
    plan = edit_distance_self_join(df, "doc_id", "s", k=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only NestedLoop allowed is the broadcast short-leg (empty
    # here but still planned); it must be driven by a broadcast, never
    # a shuffle of the corpus against itself
    for line in plan.splitlines():
        if "NestedLoopJoin" in line:
            assert "Broadcast" in line, line


def test_two_table_join_parity(spark):
    rng = random.Random(11)
    L = [(i, "".join(rng.choice("abcd") for _ in range(
        rng.choice([0, 1, 2, 3, 5, 9, 13, 14, 15])))) for i in range(150)]
    R = [(i, "".join(rng.choice("abcd") for _ in range(
        rng.choice([0, 1, 2, 4, 8, 13, 14, 16])))) for i in range(80)]
    from ocr_translation_spark.functions.editdist import edit_distance_join

    ldf = spark.createDataFrame(L, "doc_id int, s string")
    rdf = spark.createDataFrame(R, "doc_id int, s string")
    got = {
        (r.id_l, r.id_r, r.dist)
        for r in edit_distance_join(ldf, rdf, k=2).collect()
    }
    exp = {
        (il, ir, _lev(sl, sr))
        for il, sl in L for ir, sr in R if _lev(sl, sr) <= 2
    }
    assert got == exp


def test_dist_values_and_symmetric_generation(spark):
    # equal-length pairs are generated from both probe directions and
    # must collapse to ONE row with the true distance
    rows = [(1, "aaaa"), (2, "aaab"), (3, "aaab")]
    got = _run(spark, rows, 2)
    assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 0)}
