"""DSIR importance-weighted selection (functions/dsir.py)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from ocr_translation_spark.functions.dsir import dsir_importance_select


def _py_hash(tok: str) -> int:
    return int(hashlib.sha256(tok.encode()).hexdigest()[:5], 16)


def _py_buckets(text: str, nb: int) -> list[int]:
    norm = re.sub(r"\s+", " ", text.strip().lower())
    if norm == "":
        return []
    hs = [_py_hash(t) for t in norm.split(" ")]
    uni = [h % nb for h in hs]
    bi = [(hs[i] * 31 + hs[i + 1]) % nb for i in range(len(hs) - 1)]
    return uni + bi


def _py_select(rows, tgt_ids, k, nb):
    ct, cs = [0] * nb, [0] * nb
    for did, text in rows:
        side = ct if did in tgt_ids else cs
        for b in _py_buckets(text, nb):
            side[b] += 1
    tt, ts = sum(ct), sum(cs)
    w = [
        (ct[b] + 1) * 1_000_000 // (tt + nb)
        - (cs[b] + 1) * 1_000_000 // (ts + nb)
        for b in range(nb)
    ]
    pool = []
    for did, text in rows:
        if did in tgt_ids:
            continue
        bk = _py_buckets(text, nb)
        pool.append((did, len(bk), sum(w[b] for b in bk)))
    pool.sort(key=lambda r: (-r[2], r[0]))
    return pool[:k]


def _run(spark, rows, tgt_ids, k=100, nb=64, partitions=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if partitions:
        df = df.repartition(partitions)
    out = dsir_importance_select(
        df,
        F.col("doc_id").isin(*tgt_ids),
        k_select=k,
        n_buckets=nb,
    )
    return [(r.doc_id, r.n_grams, r.dsir_score_micro) for r in out.collect()]


def test_python_parity_and_target_excluded(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "alpha beta delta"),
        (3, "zeta eta theta iota"),
        (4, "alpha beta gamma"),
        (5, "zeta eta kappa"),
        (6, "   "),
    ]
    tgt = {1, 2}
    got = _run(spark, rows, tgt)
    want = _py_select(rows, tgt, 100, 64)
    assert got == want
    assert {r[0] for r in got} == {3, 4, 5, 6}  # pool only
    # target-like pool doc outranks target-unlike ones
    assert got[0][0] == 4


def test_topk_tiebreak_and_limit(spark):
    # identical texts -> identical scores; tie broken by doc_id asc
    rows = [(i, "same text here") for i in range(10)] + [
        (100, "target text content")
    ]
    got = _run(spark, rows, {100}, k=4)
    assert [r[0] for r in got] == [0, 1, 2, 3]


def test_partition_invariance(spark):
    import random

    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(20)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15))))
        for i in range(60)
    ]
    tgt = {i for i in range(60) if i % 5 == 0}
    a = _run(spark, rows, tgt, k=20)
    b = _run(spark, rows, tgt, k=20, partitions=17)
    assert a == b == _py_select(rows, tgt, 20, 64)


def test_blank_pool_doc_scores_zero(spark):
    rows = [(1, "a b c"), (2, ""), (3, "   ")]
    got = _run(spark, rows, {1}, k=10)
    by_id = {r[0]: r for r in got}
    assert by_id[2] == (2, 0, 0) and by_id[3] == (3, 0, 0)
