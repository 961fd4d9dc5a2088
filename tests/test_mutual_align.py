"""Unit tests for bitext-style mutual-NN alignment
(functions/similarity.mutual_nn_align): pure-Python parity on random
vectors (same index-ordered cosine fold, HALF_UP rounding like
F.round), planted reciprocal pairs, the hub-filtering property that
mutual-NN is FOR, the single-candidate NULL margin, and partition
invariance."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from ocr_translation_spark.functions.similarity import mutual_nn_align


def _round_half_up(x, digits):
    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
        )
    )


def _bp(sim):
    return int(
        Decimal(repr(sim * 10000)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def _cos(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    return dot / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(y * y for y in b)))


def _ref(A, B):
    sims = {
        (i, j): _round_half_up(_cos(av, bv), 4)
        for i, av in A.items() for j, bv in B.items()
    }
    best_a, second_a, best_b = {}, {}, {}
    for i in A:
        ranked = sorted(B, key=lambda j: (-sims[(i, j)], j))
        best_a[i] = ranked[0]
        if len(ranked) > 1:
            second_a[i] = sims[(i, ranked[1])]
    for j in B:
        best_b[j] = sorted(A, key=lambda i: (-sims[(i, j)], i))[0]
    out = {}
    for i, j in best_a.items():
        if best_b[j] == i:
            margin = (
                _bp(sims[(i, j)]) - _bp(second_a[i])
                if i in second_a else None
            )
            out[(i, j)] = (sims[(i, j)], margin)
    return out


def _dfs(spark, A, B, parts=5):
    mk = lambda d: spark.createDataFrame(  # noqa: E731
        [(k, v) for k, v in d.items()],
        "vec_id long, embedding array<double>",
    ).repartition(parts)
    return mk(A), mk(B)


def test_matches_python_reference(spark):
    rng = random.Random(13)
    A = {i: [rng.uniform(-1, 1) for _ in range(16)] for i in range(25)}
    B = {j: [rng.uniform(-1, 1) for _ in range(16)]
         for j in range(100, 140)}
    da, db = _dfs(spark, A, B)
    got = {
        (r["a_id"], r["b_id"]): (r["sim"], r["margin_bp"])
        for r in mutual_nn_align(da, db).collect()
    }
    assert got == _ref(A, B)
    assert len(got) > 0


def test_planted_reciprocal_pairs_all_align(spark):
    # near-copies across sides: each (i, 100+i) is mutual by a wide
    # margin
    rng = random.Random(7)
    base = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(10)}
    A = {i: v for i, v in base.items()}
    B = {100 + i: [x + 0.01 * rng.uniform(-1, 1) for x in v]
         for i, v in base.items()}
    da, db = _dfs(spark, A, B)
    got = {(r["a_id"], r["b_id"]) for r in mutual_nn_align(da, db).collect()}
    assert got == {(i, 100 + i) for i in range(10)}


def test_hub_vector_yields_single_mutual_pair(spark):
    # every A is closest to the same hub b; only the hub's own best A
    # survives — the failure mode mutual-NN exists to filter
    A = {i: [1.0, float(i) * 0.01] for i in range(5)}
    B = {100: [1.0, 0.0]}  # hub
    da, db = _dfs(spark, A, B, parts=2)
    got = mutual_nn_align(da, db).collect()
    assert len(got) == 1
    assert (got[0]["a_id"], got[0]["b_id"]) == (0, 100)
    # single candidate in B: margin undefined
    assert got[0]["margin_bp"] is None


def test_partition_invariance(spark):
    rng = random.Random(3)
    A = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(20)}
    B = {100 + j: [rng.uniform(-1, 1) for _ in range(8)]
         for j in range(20)}
    da1, db1 = _dfs(spark, A, B, parts=1)
    da2, db2 = _dfs(spark, A, B, parts=13)
    one = {tuple(r) for r in mutual_nn_align(da1, db1).collect()}
    many = {tuple(r) for r in mutual_nn_align(da2, db2).collect()}
    assert one == many
