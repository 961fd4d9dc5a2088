"""Layout reading-order operator (functions/readingorder.py).

Semantics pinned by hand-built pages (the value oracle in
test_entry_oracle only proves Spark == DuckDB on the derived corpus;
these prove both compute the RIGHT thing): a scrambled two-column
page, transitive x-chain merging, the touching-intervals rule, tie
determinism, a seeded random-page pure-Python parity sweep, and the
one-exchange plan shape (hashpartitioning(doc_id) satisfies the
(doc_id, block_id) window's clustering, so passes 2-3 add sorts
only).
"""

from __future__ import annotations

import random
from collections import defaultdict

from ocr_translation_spark.functions.readingorder import reading_order

COLS = ["doc_id", "token_id", "x0", "x1", "y0", "y1"]


def _run(spark, rows):
    df = spark.createDataFrame(
        [tuple(r) for r in rows], "doc_id long, token_id long, "
        "x0 long, x1 long, y0 long, y1 long"
    )
    out = reading_order(df).collect()
    return {
        (r.doc_id, r.token_id): (r.block_id, r.line_id, r.reading_rank)
        for r in out
    }


def _py_islands(items):
    """items: (tie, lo, hi) sorted by (lo, tie); returns tie -> 1-based
    island id under the strict-gap rule (lo > running max hi starts)."""
    out, cm, isl = {}, None, 0
    for tie, lo, hi in sorted(items, key=lambda t: (t[1], t[0])):
        if cm is None or lo > cm:
            isl += 1
        cm = hi if cm is None else max(cm, hi)
        out[tie] = isl
    return out


def _py_reading_order(rows):
    """Pure-Python mirror of reading_order over COLS tuples."""
    bydoc = defaultdict(list)
    for r in rows:
        bydoc[r[0]].append(r)
    res = {}
    for doc, rs in bydoc.items():
        blk = _py_islands([(r[1], r[2], r[3]) for r in rs])
        byblock = defaultdict(list)
        for r in rs:
            byblock[blk[r[1]]].append(r)
        lin = {}
        for b, brs in byblock.items():
            for tok, li in _py_islands(
                [(r[1], r[4], r[5]) for r in brs]
            ).items():
                lin[tok] = li
        order = sorted(rs, key=lambda r: (blk[r[1]], lin[r[1]], r[2], r[1]))
        for rank, r in enumerate(order, 1):
            res[(doc, r[1])] = (blk[r[1]], lin[r[1]], rank)
    return res


def test_two_column_page_scrambled(spark):
    # column A (two lines) + column B (one line), fed in scrambled
    # detection order; ids chosen so token order != reading order
    rows = [
        (1, 5, 1000, 1300, 0, 40),  # B line1 word1
        (1, 3, 10, 130, 100, 140),  # A line2 word1
        (1, 1, 0, 120, 0, 40),  # A line1 word1
        (1, 6, 1250, 1400, 10, 50),  # B line1 word2
        (1, 4, 90, 230, 110, 150),  # A line2 word2
        (1, 2, 100, 220, 5, 45),  # A line1 word2
    ]
    got = _run(spark, rows)
    assert got == {
        (1, 1): (1, 1, 1),
        (1, 2): (1, 1, 2),
        (1, 3): (1, 2, 3),
        (1, 4): (1, 2, 4),
        (1, 5): (2, 1, 5),
        (1, 6): (2, 1, 6),
    }


def test_transitive_chain_merges_one_block(spark):
    # [0,10] and [18,30] are disjoint but [8,20] bridges them: the
    # running max carries 20 past x0=18, so all three are one block
    rows = [
        (7, 1, 0, 10, 0, 5),
        (7, 2, 18, 30, 0, 5),
        (7, 3, 8, 20, 0, 5),
    ]
    got = _run(spark, rows)
    assert {v[0] for v in got.values()} == {1}


def test_touching_merges_strict_gap_splits(spark):
    # x0 == prior x1 merges (strict >); x0 == prior x1 + 1 splits
    merged = _run(spark, [(1, 1, 0, 10, 0, 5), (1, 2, 10, 20, 0, 5)])
    assert {v[0] for v in merged.values()} == {1}
    split = _run(spark, [(1, 1, 0, 10, 0, 5), (1, 2, 11, 20, 0, 5)])
    assert {v[0] for v in split.values()} == {1, 2}


def test_identical_boxes_rank_by_token_id(spark):
    rows = [(3, 9, 0, 10, 0, 5), (3, 4, 0, 10, 0, 5)]
    got = _run(spark, rows)
    assert got[(3, 4)] == (1, 1, 1)
    assert got[(3, 9)] == (1, 1, 2)


def test_random_pages_match_python_mirror(spark):
    rng = random.Random(20260820)
    rows = []
    for doc in range(12):
        for tok in range(rng.randint(1, 25)):
            c = rng.randint(0, 2)
            x0 = c * 1000 + rng.randint(0, 600)
            y0 = rng.randint(0, 4) * 100 + rng.randint(0, 50)
            rows.append(
                (doc, tok, x0, x0 + rng.randint(1, 220), y0,
                 y0 + rng.randint(1, 45))
            )
    assert _run(spark, rows) == _py_reading_order(rows)


def test_single_exchange_plan(spark):
    from pyspark.sql import functions as F

    base = spark.range(2000).select(
        (F.col("id") % 50).alias("doc_id"),
        F.col("id").alias("token_id"),
        (F.col("id") % 7 * 100).alias("x0"),
        (F.col("id") % 7 * 100 + 90).alias("x1"),
        (F.col("id") % 5 * 60).alias("y0"),
        (F.col("id") % 5 * 60 + 40).alias("y1"),
    )
    plan = reading_order(base)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
