"""Unit tests for range-partitioned exact percent-rank normalization
(functions/ranknorm.py): SQL percent_rank parity against a pure-
Python reference (ties share a pct), partition/range-count
invariance, the n == 1 convention, and null dropping."""

import random
from bisect import bisect_left

from ocr_translation_spark.functions.ranknorm import rank_normalize


def _ref(vals):
    s = sorted(vals)
    n = len(s)
    return {
        v: 0 if n <= 1 else (1000000 * bisect_left(s, v)) // (n - 1)
        for v in set(s)
    }


def _got(df):
    return {(r["doc_id"], r["v"]): r["pct_rank_ppm"] for r in df.collect()}


def test_matches_python_reference_with_ties(spark):
    rng = random.Random(43)
    vals = [round(rng.uniform(0, 50), 1) for _ in range(500)]  # many ties
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, v double")
    got = _got(rank_normalize(df, "v", num_ranges=7))
    want = _ref(vals)
    assert len(got) == len(rows)
    assert all(got[(i, v)] == want[v] for i, v in rows)


def test_range_count_invariance_and_edges(spark):
    rows = [(0, 5.0), (1, 5.0), (2, 1.0), (3, 9.0), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, v double")
    a = _got(rank_normalize(df, "v", num_ranges=1))
    b = _got(rank_normalize(df, "v", num_ranges=13))
    assert a == b
    # 4 non-null rows: min -> 0; the tied pair shares (1e6*1)//3
    assert a[(2, 1.0)] == 0
    assert a[(0, 5.0)] == a[(1, 5.0)] == 333333
    assert a[(3, 9.0)] == 1000000
    assert (4, None) not in a and len(a) == 4

    one = spark.createDataFrame([(0, 7.0)], "doc_id long, v double")
    assert _got(rank_normalize(one, "v")) == {(0, 7.0): 0}
