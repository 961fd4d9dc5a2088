"""Unit tests for the bounded-memory sketches (Misra-Gries heavy
hitters, KMV cardinality) and the Bloom-prefiltered exact anti-join.

Each operator is checked three ways: against a pure-Python reference
on randomized data, for partition invariance (the merge logic must be
associative/commutative), and on the algorithmic edge its bound is
about (capacity smaller than the distinct count so the MG decrement
path actually runs; k smaller than the distinct count so KMV's
estimator path runs; Bloom false positives forced through the slow
path without changing the answer).
"""

import collections
import hashlib
import random

import pytest

from pyspark.sql import functions as F

from ocr_translation_spark.functions.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_might_contain,
)
from ocr_translation_spark.functions.sketches import (
    HASH_SPACE,
    group_kmv_distinct,
    kmv_distinct,
    misra_gries_heavy_hitters,
)


def _hash60_py(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- MG


def _mg_exact(rows, capacity):
    exact = collections.Counter(rows)
    n = sum(exact.values())
    return {k: c for k, c in exact.items() if c * capacity > n}


def test_mg_exact_counts_with_decrement_path(spark):
    # 4000 distinct keys >> capacity 32: every partition's dict
    # overflows and decrements, yet the recount stays exact.
    rng = random.Random(7)
    rows = [f"hot_{i % 3}" for i in range(3000)] + [
        f"cold_{rng.randrange(4000)}" for _ in range(2000)
    ]
    df = spark.createDataFrame([(r,) for r in rows], ["key"]).repartition(5)
    got = {
        r["key"]: r["cnt"]
        for r in misra_gries_heavy_hitters(df, "key", capacity=32).collect()
    }
    assert got == _mg_exact(rows, 32)
    assert set(got) == {"hot_0", "hot_1", "hot_2"}


def test_mg_partition_invariance(spark):
    rows = [f"hot_{i % 4}" for i in range(800)] + [
        f"c{i}" for i in range(900)
    ]
    df1 = spark.createDataFrame([(r,) for r in rows], ["key"]).coalesce(1)
    df7 = spark.createDataFrame([(r,) for r in rows], ["key"]).repartition(7)
    out1 = sorted(
        map(tuple, misra_gries_heavy_hitters(df1, "key", 16).collect())
    )
    out7 = sorted(
        map(tuple, misra_gries_heavy_hitters(df7, "key", 16).collect())
    )
    assert out1 == out7 == sorted(_mg_exact(rows, 16).items())


def test_mg_no_heavy_hitters_is_empty(spark):
    # uniform: nothing clears N/capacity with capacity < distinct
    df = spark.createDataFrame([(f"k{i % 50}",) for i in range(1000)], ["key"])
    assert misra_gries_heavy_hitters(df, "key", capacity=20).count() == 0


def test_mg_nulls_ignored(spark):
    rows = [("a",)] * 10 + [(None,)] * 90
    df = spark.createDataFrame(rows, "key string")
    got = {
        r["key"]: r["cnt"]
        for r in misra_gries_heavy_hitters(df, "key", capacity=4).collect()
    }
    # N counts only non-null keys: 10 * 4 > 10
    assert got == {"a": 10}


# --------------------------------------------------------------- KMV


def test_kmv_exact_path_below_k(spark):
    df = spark.createDataFrame([(f"v{i % 23}",) for i in range(500)], ["key"])
    row = kmv_distinct(df, "key", k=64).collect()[0]
    assert row["n_kept"] == 23
    assert row["est_distinct"] == 23


def test_kmv_estimator_matches_python_reference(spark):
    vals = [f"item-{i % 700}" for i in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], ["key"]).repartition(9)
    row = kmv_distinct(df, "key", k=48).collect()[0]
    hs = sorted({_hash60_py(v) for v in set(vals)})[:48]
    assert row["n_kept"] == 48
    assert row["kth_min"] == hs[-1]
    assert row["est_distinct"] == (48 - 1) * HASH_SPACE // hs[-1]
    # the estimate should be in the right ballpark of the truth (700)
    assert 0.5 * 700 < row["est_distinct"] < 2.0 * 700


def test_kmv_partition_invariance(spark):
    vals = [(f"x{i % 300}",) for i in range(2000)]
    r1 = kmv_distinct(
        spark.createDataFrame(vals, ["key"]).coalesce(1), "key", k=32
    ).collect()[0]
    r13 = kmv_distinct(
        spark.createDataFrame(vals, ["key"]).repartition(13), "key", k=32
    ).collect()[0]
    assert tuple(r1) == tuple(r13)


# ------------------------------------------------------------- Bloom


def test_bloom_build_matches_python_reference(spark):
    keys = [f"ref-{i}" for i in range(200)]
    ref = spark.createDataFrame([(k,) for k in keys], ["fp"]).repartition(4)
    m_bits, k = 1 << 12, 3
    words = bloom_build(ref, "fp", m_bits=m_bits, k=k)

    expect = [0] * (m_bits // 64)
    for key in keys:
        h = _hash60_py(key)
        h1, h2 = h % m_bits, 1 + (h >> 30) % (m_bits - 1)
        for i in range(k):
            p = (h1 + i * h2) % m_bits
            expect[p >> 6] |= 1 << (p & 63)
    # python ints are unbounded; fold to signed 64-bit two's complement
    expect = [w - (1 << 64) if w >= (1 << 63) else w for w in expect]
    assert words == expect


def test_bloom_no_false_negatives(spark):
    keys = [f"k{i}" for i in range(500)]
    ref = spark.createDataFrame([(k,) for k in keys], ["fp"])
    words = bloom_build(ref, "fp", m_bits=1 << 13)
    flagged = (
        ref.where(bloom_might_contain(words, F.col("fp"), m_bits=1 << 13))
        .count()
    )
    assert flagged == 500  # every build key must probe positive


def test_bloom_anti_join_equals_plain_anti_join(spark):
    rng = random.Random(11)
    big = spark.createDataFrame(
        [(f"d{i}", f"fp{rng.randrange(600)}") for i in range(3000)],
        ["id", "fp"],
    ).repartition(6)
    ref = spark.createDataFrame(
        [(f"fp{i}",) for i in range(0, 600, 5)], ["fp"]
    )
    got = sorted(
        map(tuple, bloom_anti_join(big, ref, "fp").select("id", "fp").collect())
    )
    want = sorted(
        map(
            tuple,
            big.join(ref, "fp", "left_anti").select("id", "fp").collect(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_bloom_null_keys_match_plain_anti_join(spark):
    # NULL big-side keys never equi-match: the plain anti-join KEEPS
    # them, and so must the prefiltered form (a NULL probe must not
    # fall out of both union branches). NULL ref keys must not crash
    # the build (they can never match anything).
    big = spark.createDataFrame(
        [("d1", "fp1"), ("d2", None), ("d3", "fp3"), ("d4", None)],
        "id string, fp string",
    )
    ref = spark.createDataFrame(
        [("fp1",), (None,), ("fpX",)], "fp string"
    )
    got = sorted(
        map(tuple, bloom_anti_join(big, ref, "fp").select("id", "fp").collect())
    )
    want = sorted(
        map(
            tuple,
            big.join(ref, "fp", "left_anti").select("id", "fp").collect(),
        )
    )
    assert got == want
    assert ("d2", None) in got and ("d4", None) in got


def test_bloom_empty_ref_keeps_everything(spark):
    big = spark.createDataFrame([(f"d{i}", f"f{i}") for i in range(50)],
                                ["id", "fp"])
    ref = big.where(F.lit(False)).select("fp")
    assert bloom_anti_join(big, ref, "fp").count() == 50


def test_bloom_rejects_unaligned_m():
    with pytest.raises(ValueError):
        bloom_build(None, "fp", m_bits=100)


def test_bloom_fast_path_actually_skips_rows(spark):
    # with a comfortably sized filter most clean rows must bypass the
    # join: the maybe-rate stays near the true match rate, not 100%.
    big = spark.createDataFrame(
        [(f"d{i}", f"fp{i}") for i in range(2000)], ["id", "fp"]
    )
    ref = spark.createDataFrame([(f"fp{i}",) for i in range(100)], ["fp"])
    words = bloom_build(ref, "fp")
    maybe = big.where(bloom_might_contain(words, F.col("fp"))).count()
    assert maybe < 2000 * 0.2  # 5% true matches + small fp rate


# ---- Count-Min sketch ----


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    import random

    from ocr_translation_spark.functions.sketches import cms_estimates

    rng = random.Random(20260818)
    rows = [(f"k{rng.randrange(60)}",) for _ in range(3000)]
    df = spark.createDataFrame(rows, "item string")
    # narrow sketch: collisions -> estimates may exceed, never fall
    narrow = cms_estimates(df, "item", depth=4, width=16).collect()
    assert all(r.overcount >= 0 for r in narrow)
    assert all(r.est_count == r.true_count + r.overcount for r in narrow)
    assert any(r.overcount > 0 for r in narrow)  # width 16 must collide
    # wide sketch: 60 keys in 4x4096 cells -> almost surely exact
    wide = cms_estimates(df, "item", depth=4, width=4096).collect()
    assert all(r.overcount == 0 for r in wide)
    truth = {}
    for (k,) in rows:
        truth[k] = truth.get(k, 0) + 1
    assert {r.key: r.true_count for r in wide} == truth


def test_cms_cells_are_mergeable_summaries(spark):
    from pyspark.sql import functions as F

    from ocr_translation_spark.functions.sketches import cms_cells

    rows = [(f"k{i % 9}",) for i in range(400)]
    df = spark.createDataFrame(rows, "item string")
    a = spark.createDataFrame(rows[:150], "item string")
    b = spark.createDataFrame(rows[150:], "item string")
    whole = {
        (r.row, r.bucket): r.cell_count
        for r in cms_cells(df, "item", 3, 32).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cms_cells(part, "item", 3, 32).collect():
            merged[(r.row, r.bucket)] = (
                merged.get((r.row, r.bucket), 0) + r.cell_count
            )
    assert merged == whole


def test_cms_partition_invariance(spark):
    from ocr_translation_spark.functions.sketches import cms_estimates

    rows = [(f"k{i % 13}",) for i in range(500)]
    df = spark.createDataFrame(rows, "item string")
    one = {
        tuple(r) for r in cms_estimates(df, "item", 4, 32).collect()
    }
    many = {
        tuple(r)
        for r in cms_estimates(
            df.repartition(11), "item", 4, 32
        ).collect()
    }
    assert one == many


# --------------------------------------------------------- group KMV


def test_group_kmv_both_branches_match_python_reference(spark):
    # group "small" stays below k (exact branch); group "big"
    # saturates (estimator branch) — both in one DataFrame so the
    # per-group window really isolates groups.
    rows = [("small", f"s{i % 9}") for i in range(200)]
    rows += [("big", f"b{i % 400}") for i in range(3000)]
    df = spark.createDataFrame(rows, ["g", "u"]).repartition(7)
    got = {
        r["grp"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
        for r in group_kmv_distinct(df, "g", key_col="u", k=32).collect()
    }
    assert got["small"] == (9, max(_hash60_py(f"s{i}") for i in range(9)), 9)
    hs = sorted({_hash60_py(f"b{i}") for i in range(400)})[:32]
    assert got["big"] == (32, hs[-1], (32 - 1) * HASH_SPACE // hs[-1])
    assert 0.5 * 400 < got["big"][2] < 2.0 * 400


def test_group_kmv_partition_invariance(spark):
    rows = [(f"g{i % 5}", f"v{i % 97}") for i in range(1500)]
    one = {
        tuple(r)
        for r in group_kmv_distinct(
            spark.createDataFrame(rows, ["g", "u"]).coalesce(1),
            "g", key_col="u", k=16,
        ).collect()
    }
    many = {
        tuple(r)
        for r in group_kmv_distinct(
            spark.createDataFrame(rows, ["g", "u"]).repartition(13),
            "g", key_col="u", k=16,
        ).collect()
    }
    assert one == many


def test_group_kmv_state_bounded_at_k_rows_per_group(spark):
    # the pre-aggregate minima relation must carry <= k rows per
    # group no matter the group's true cardinality
    rows = [("hot", f"u{i}") for i in range(5000)] + [("cold", "only")]
    df = spark.createDataFrame(rows, ["g", "u"])
    out = {r["grp"]: r["n_kept"] for r in
           group_kmv_distinct(df, "g", key_col="u", k=8).collect()}
    assert out == {"hot": 8, "cold": 1}


# ------------------------------------------------------- KMV overlap


def _kmv_overlap_ref(sets, k):
    want = {}
    for a in sets:
        for b in sets:
            if not a < b:
                continue
            ha = sorted({_hash60_py(x) for x in sets[a]})[:k]
            hb = sorted({_hash60_py(x) for x in sets[b]})[:k]
            full = sorted(set(ha) | set(hb))
            u_full, both_full = len(full), len(set(ha) & set(hb))
            m = full[:k]
            k_eff, theta = len(m), m[-1]
            in_both = sum(1 for h in m if h in set(ha) and h in set(hb))
            if len(ha) < k and len(hb) < k:
                eu, ei = u_full, both_full
            else:
                eu = (k_eff - 1) * HASH_SPACE // theta
                ei = in_both * eu // k_eff
            want[(a, b)] = (k_eff, theta, in_both, eu, ei,
                            ei * 1000000 // eu)
    return want


def test_kmv_overlap_matches_python_reference_both_branches(spark):
    from ocr_translation_spark.functions.sketches import kmv_set_overlap

    sets = {
        "A": {f"u{i}" for i in range(0, 700)},      # saturated
        "B": {f"u{i}" for i in range(350, 1000)},   # saturated
        "C": {f"u{i}" for i in range(0, 20)},       # exact
        "D": {f"u{i}" for i in range(5, 31)},       # exact
    }
    rows = [(g, u) for g, us in sets.items() for u in us] * 2  # dups
    df = spark.createDataFrame(rows, ["g", "u"]).repartition(7)
    got = {
        (r["a"], r["b"]): tuple(r)[2:]
        for r in kmv_set_overlap(df, "g", "u", k=48).collect()
    }
    assert got == _kmv_overlap_ref(sets, 48)
    # exact pair: true Jaccard of C,D = |{5..19}| / |{0..30}| = 15/31
    assert got[("C", "D")][3:5] == (31, 15)


def test_kmv_overlap_disjoint_sets_zero_intersection(spark):
    from ocr_translation_spark.functions.sketches import kmv_set_overlap

    rows = [("L", f"l{i}") for i in range(500)]
    rows += [("R", f"r{i}") for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "u"])
    r = kmv_set_overlap(df, "g", "u", k=32).collect()[0]
    assert (r["in_both"], r["est_inter"], r["jacc_micro"]) == (0, 0, 0)
    assert 250 < r["est_union"] < 4000  # ballpark of 1000


def test_kmv_overlap_partition_invariance(spark):
    from ocr_translation_spark.functions.sketches import kmv_set_overlap

    rows = [(f"g{i % 3}", f"v{i % 200}") for i in range(2000)]
    one = {tuple(r) for r in kmv_set_overlap(
        spark.createDataFrame(rows, ["g", "u"]).coalesce(1),
        "g", "u", k=16).collect()}
    many = {tuple(r) for r in kmv_set_overlap(
        spark.createDataFrame(rows, ["g", "u"]).repartition(13),
        "g", "u", k=16).collect()}
    assert one == many


def test_kmv_overlap_rejects_tiny_k(spark):
    from ocr_translation_spark.functions.sketches import kmv_set_overlap

    with pytest.raises(ValueError):
        kmv_set_overlap(spark.range(1).selectExpr("'g' g", "'u' u"),
                        "g", "u", k=1)


def test_group_kmv_null_keys_dropped(spark):
    # NULL keys hash to NULL and would rank FIRST under Spark's ASC
    # NULLS FIRST window, corrupting n_kept/kth_min (review fix); the
    # family convention is to ignore them
    rows = [("g", f"u{i}") for i in range(10)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "g string, u string")
    row = group_kmv_distinct(df, "g", key_col="u", k=8).collect()[0]
    hs = sorted(_hash60_py(f"u{i}") for i in range(10))[:8]
    assert (row["n_kept"], row["kth_min"]) == (8, hs[-1])


def test_kmv_overlap_null_keys_dropped(spark):
    from ocr_translation_spark.functions.sketches import kmv_set_overlap

    rows = [("L", "x"), ("L", None), ("R", "x"), ("R", None),
            ("R", "y")]
    df = spark.createDataFrame(rows, "g string, u string")
    r = kmv_set_overlap(df, "g", "u", k=8).collect()[0]
    # a phantom shared NULL member must not count: true sets are
    # {x} and {x, y}
    assert (r["est_union"], r["est_inter"]) == (2, 1)
