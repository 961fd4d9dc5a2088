"""Randomized cross-checks of the round-5 row-local operators against
independent pure-Python references — one Spark job per operator over a
seed-fixed random corpus (the repo's randomized-parity pattern: broad
input coverage without per-example Spark jobs)."""

from __future__ import annotations

import hashlib
import random
import re
import unicodedata

import pytest
from pyspark.sql import Row

from ocr_translation_spark.functions.classifier import (
    hashed_linear_score,
)
from ocr_translation_spark.functions.graph import pagerank
from ocr_translation_spark.functions.normalize import (
    canonicalize_text,
)
from ocr_translation_spark.functions.winnow import (
    BASE,
    MOD,
    winnowing_fingerprint,
)

_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "  \t"  # weighted spaces + tab
    "éÉüÜß"  # é É ü Ü ß
    "́̈"  # combining acute / diaeresis
)


def _random_texts(n, max_len, seed):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        length = rng.randint(0, max_len)
        out.append(
            "".join(rng.choice(_ALPHABET) for _ in range(length))
        )
    return out


# ------------------------------------------------------------ winnow


def _ref_winnow(text, k=8, w=4):
    cs = [ord(c) for c in text]
    if len(cs) < k:
        return []
    gh = []
    for i in range(len(cs) - k + 1):
        acc = 0
        for c in cs[i : i + k]:
            acc = (acc * BASE + c) % MOD
        gh.append(acc)
    if len(gh) < w:
        return []
    return sorted({min(gh[j : j + w]) for j in range(len(gh) - w + 1)})


def test_winnow_random_parity(spark):
    texts = _random_texts(120, 60, seed=0x571)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = {
        r["doc_id"]: r for r in winnowing_fingerprint(df).collect()
    }
    for i, t in enumerate(texts):
        fps = _ref_winnow(t)
        assert rows[i]["n_fingerprints"] == len(fps), repr(t)
        if fps:
            assert rows[i]["min_fp"] == min(fps), repr(t)
            exp = hashlib.sha256(
                ",".join(map(str, fps)).encode()
            ).hexdigest()
            assert rows[i]["fp_sha256"] == exp, repr(t)


# -------------------------------------------------------- classifier


def _ref_logit(text, n_buckets=2001):
    toks = re.split(" +", text)
    half = n_buckets // 2
    hs = [
        int(hashlib.sha256(t.encode()).hexdigest()[:5], 16)
        for t in toks
    ]
    uni = sum(h % n_buckets - half for h in hs)
    bi = sum(
        (31 * hs[i] + hs[i + 1]) % n_buckets - half
        for i in range(len(hs) - 1)
    )
    return len(toks), uni + bi


def test_classifier_random_parity(spark):
    texts = _random_texts(120, 80, seed=0x0C1)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = {
        r["doc_id"]: r for r in hashed_linear_score(df).collect()
    }
    for i, t in enumerate(texts):
        n_tok, logit = _ref_logit(t)
        assert rows[i]["n_tokens"] == n_tok, repr(t)
        assert rows[i]["logit"] == logit, repr(t)
        assert rows[i]["keep"] == (logit > 0), repr(t)


# ------------------------------------------------------ canonicalize


def _ref_canon(text):
    c = unicodedata.normalize("NFC", text).lower()
    return re.sub("[ \t\r\n]+", " ", c).strip()


def test_canonicalize_random_parity(spark):
    texts = _random_texts(120, 60, seed=0xCA0)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = {
        r["doc_id"]: r["canon_text"]
        for r in canonicalize_text(df)
        .select("doc_id", "canon_text")
        .collect()
    }
    for i, t in enumerate(texts):
        assert rows[i] == _ref_canon(t), repr(t)


# ---------------------------------------------------------- pagerank


def _ref_pagerank(edges, nodes, iterations=3):
    from collections import defaultdict

    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    r = {v: 1_000_000 for v in nodes}
    for _ in range(iterations):
        acc = defaultdict(int)
        for s, ds in out.items():
            c = r[s] // len(ds)
            for d in ds:
                acc[d] += c
        r = {
            v: 150_000 + (850_000 * acc.get(v, 0)) // 1_000_000
            for v in nodes
        }
    return r


def test_pagerank_random_parity(spark):
    rng = random.Random(0x96)
    nodes = list(range(40))
    edges = set()
    for _ in range(120):
        s, d = rng.randrange(40), rng.randrange(40)
        if s != d:
            edges.add((s, d))
    edges = sorted(edges)
    exp = _ref_pagerank(edges, nodes)
    edf = spark.createDataFrame(
        [Row(src=s, dst=d) for s, d in edges]
    )
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edf, ndf, iterations=3).collect()
    }
    assert got == exp


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
