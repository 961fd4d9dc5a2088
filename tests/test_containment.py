"""Unit tests for the asymmetric containment self-join
(functions/setjoin.containment_selfjoin): brute-force reference
parity on randomized sets (prefix-filter completeness), direction
asymmetry, the short-in-long case, and the threshold boundary."""

import random

from pyspark.sql import functions as F

from ocr_translation_spark.functions.setjoin import (
    containment_selfjoin,
)


def _ref(rows, t_num, t_den):
    want = {}
    for ia, sa in rows:
        for ib, sb in rows:
            if ia == ib:
                continue
            inter = len(set(sa) & set(sb))
            if t_den * inter >= t_num * len(sa):
                want[(ia, ib)] = (
                    inter, len(sa), len(sb),
                    (1000000 * inter) // len(sa),
                )
    return want


def _got(df):
    return {
        (r["id_a"], r["id_b"]): (
            r["inter_size"], r["size_a"], r["size_b"],
            r["containment_ppm"],
        )
        for r in df.collect()
    }


def _mk_df(spark, rows):
    return spark.createDataFrame(
        [(i, list(s)) for i, s in rows],
        "doc_id long, toks array<string>",
    )


def test_matches_bruteforce_reference(spark):
    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(40)]
    rows = [
        (i, sorted(rng.sample(vocab, rng.randrange(2, 12))))
        for i in range(30)
    ]
    got = _got(containment_selfjoin(_mk_df(spark, rows),
                                    "doc_id", "toks", 4, 5))
    assert got == _ref(rows, 4, 5)
    assert got  # non-degenerate: the reference finds pairs here


def test_asymmetry_and_short_in_long(spark):
    rows = [
        (1, ["a", "b"]),                      # fully inside 2
        (2, ["a", "b", "c", "d", "e", "f"]),
        (3, ["x", "y", "z"]),
    ]
    got = _got(containment_selfjoin(_mk_df(spark, rows),
                                    "doc_id", "toks", 1, 1))
    # 1 ⊆ 2 at t=1.0, but 2 ⊄ 1 — one direction only
    assert (1, 2) in got and (2, 1) not in got
    assert got[(1, 2)] == (2, 2, 6, 1000000)
    assert all(3 not in pair for pair in got)


def test_threshold_boundary_exact(spark):
    # |a∩b|/|a| = 3/4: kept at t=3/4, dropped at any larger t
    rows = [
        (1, ["a", "b", "c", "q"]),
        (2, ["a", "b", "c", "d", "e"]),
    ]
    df = _mk_df(spark, rows)
    at = _got(containment_selfjoin(df, "doc_id", "toks", 3, 4))
    assert at[(1, 2)] == (3, 4, 5, 750000)
    above = _got(containment_selfjoin(df, "doc_id", "toks", 76, 100))
    assert (1, 2) not in above
