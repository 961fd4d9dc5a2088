"""Contrastive triplets: anchors are exactly the members of
non-singleton near-dup clusters; positives are the smallest OTHER
same-cluster member; negatives the lowest-k sha probe landing in a
different cluster — recomputed in plain Python from the cluster
assignment."""

from __future__ import annotations

import hashlib

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _sha_neg(doc_id, k, n):
    h = hashlib.sha256(f"{doc_id}:{k}".encode()).hexdigest()[:12]
    return int(h, 16) % n


def test_triplets_match_python_recompute(spark):
    qs = entry_mod.queries()
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in qs["dedup_clusters"](spark, SF).collect()
    }
    n_docs = len(clusters)
    by_cluster: dict = {}
    for d, c in clusters.items():
        by_cluster.setdefault(c, []).append(d)

    expect = {}
    for c, members in by_cluster.items():
        if len(members) < 2:
            continue
        for a in members:
            pos = min(m for m in members if m != a)
            neg = None
            for k in (1, 2, 3):
                cand = _sha_neg(a, k, n_docs)
                if clusters[cand] != c:
                    neg = cand
                    break
            expect[a] = (pos, neg, c)

    got = {
        r["anchor_id"]: (
            r["positive_id"],
            r["negative_id"],
            r["cluster_id"],
        )
        for r in qs["contrastive_triplets"](spark, SF).collect()
    }
    assert got == expect
    assert expect, "degenerate corpus: no non-singleton clusters"
    # structural invariants, independently of the recompute
    for a, (p, n, c) in got.items():
        assert a != p and clusters[p] == c
        if n is not None:
            assert clusters[n] != c
