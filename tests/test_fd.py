"""Approximate-FD g3 discovery (functions/fd.py)."""

from __future__ import annotations

from ocr_translation_spark.functions.fd import fd_violations


def _run(spark, rows, cands):
    df = spark.createDataFrame(rows, "a string, b string, c long")
    out = fd_violations(df, cands)
    return {
        r["fd"]: (
            r["n_rows"],
            r["n_distinct_lhs"],
            r["n_violating_rows"],
            r["holds"],
        )
        for r in out.collect()
    }


def test_g3_plurality_definition(spark):
    # a=x maps to b in {p,p,p,q}: plurality keeps 3, violates 1;
    # a=y maps only to p: holds
    rows = [
        ("x", "p", 1),
        ("x", "p", 2),
        ("x", "p", 3),
        ("x", "q", 4),
        ("y", "p", 5),
    ]
    got = _run(spark, rows, [("a", "b")])
    assert got["a->b"] == (5, 2, 1, False)


def test_exact_fd_and_key_fd(spark):
    rows = [("x", "p", 1), ("x", "p", 2), ("y", "q", 3)]
    got = _run(spark, rows, [("a", "b"), ("c", "a")])
    assert got["a->b"] == (3, 2, 0, True)
    assert got["c->a"] == (3, 3, 0, True)


def test_null_is_a_distinct_value_both_sides(spark):
    rows = [
        (None, "p", 1),
        (None, "p", 2),
        (None, "q", 3),  # NULL lhs group: plurality p, 1 violation
        ("x", None, 4),
        ("x", None, 5),  # NULL rhs consistent: holds for a=x
    ]
    got = _run(spark, rows, [("a", "b")])
    assert got["a->b"] == (5, 2, 1, False)


def test_tie_plurality_keeps_max_count(spark):
    # 2-2 tie: keep 2, violate 2 (g3 is count-based, not value-based)
    rows = [("x", "p", 1), ("x", "p", 2), ("x", "q", 3), ("x", "q", 4)]
    got = _run(spark, rows, [("a", "b")])
    assert got["a->b"] == (4, 1, 2, False)


def test_brute_force_parity_randomized(spark):
    import random
    from collections import Counter

    rng = random.Random(20260819)
    rows = [
        (f"a{rng.randrange(6)}", f"b{rng.randrange(4)}", i)
        for i in range(80)
    ]
    got = _run(spark, rows, [("a", "b"), ("b", "a")])
    for lhs, rhs, name in ((0, 1, "a->b"), (1, 0, "b->a")):
        groups = {}
        for r in rows:
            groups.setdefault(r[lhs], []).append(r[rhs])
        viol = sum(
            len(v) - Counter(v).most_common(1)[0][1]
            for v in groups.values()
        )
        assert got[name] == (80, len(groups), viol, viol == 0)
