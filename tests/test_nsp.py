"""BERT-style NSP pair generation (functions/nsp.py): pure-Python
parity, adjacency law for positives, partner determinism, edge
cases."""

from __future__ import annotations

import hashlib

from ocr_translation_spark.functions.nsp import nsp_pairs


def _sha60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _py_pairs(rows, n_docs, seg_words):
    segs = {}
    for i, text in rows:
        toks = text.split()
        segs[i] = [
            " ".join(toks[c : c + seg_words])
            for c in range(0, max(len(toks), 1), seg_words)
            if toks[c : c + seg_words]
        ]
    out = []
    for i in segs:
        for c in range(len(segs[i]) - 1):
            if _sha60(f"{i}:{c}") % 2 == 0:
                out.append((i, c, segs[i][c], segs[i][c + 1], True))
            else:
                p = _sha60(f"n:{i}:{c}") % n_docs
                if p == i:
                    p = (p + 1) % n_docs
                if segs.get(p):
                    out.append((i, c, segs[i][c], segs[p][0], False))
    return sorted(out)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(seed, n):
    import random

    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(50)}" for _ in range(n))


def test_nsp_python_parity(spark):
    rows = [(i, _words(i, 10 + 7 * i)) for i in range(12)]
    rows[3] = (3, "")  # blank doc: no segments, no pairs, dead partner
    got = sorted(
        tuple(r)
        for r in nsp_pairs(_mk(spark, rows), n_docs=12, seg_words=4).collect()
    )
    assert got == _py_pairs(rows, 12, 4)


def test_nsp_positives_are_truly_adjacent(spark):
    rows = [(i, _words(100 + i, 40)) for i in range(8)]
    segmap = {
        i: [
            " ".join(t.split()[c : c + 4])
            for c in range(0, 40, 4)
        ]
        for i, t in rows
    }
    for r in nsp_pairs(_mk(spark, rows), n_docs=8, seg_words=4).collect():
        if r.is_next:
            assert segmap[r.doc_id][r.pair_id] == r.seg_a
            assert segmap[r.doc_id][r.pair_id + 1] == r.seg_b
        else:
            # negative seg_b is some doc's FIRST segment
            assert any(s[0] == r.seg_b for s in segmap.values())


def test_nsp_partition_invariance_and_balance(spark):
    rows = [(i, _words(7 * i + 1, 60)) for i in range(20)]
    df = _mk(spark, rows)
    a = sorted(tuple(r) for r in nsp_pairs(df, 20, seg_words=4).collect())
    b = sorted(
        tuple(r)
        for r in nsp_pairs(df.repartition(9), 20, seg_words=4).collect()
    )
    assert a == b
    n_pos = sum(1 for r in a if r[4])
    # sha coin: roughly half positives (loose band, deterministic)
    assert 0.3 <= n_pos / len(a) <= 0.7


def test_nsp_single_segment_docs_yield_nothing(spark):
    rows = [(0, "a b c"), (1, "d e"), (2, "")]
    assert nsp_pairs(_mk(spark, rows), 3, seg_words=8).count() == 0
