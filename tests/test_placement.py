"""Rendezvous-hash placement (functions/placement)."""

from __future__ import annotations

import hashlib

import pytest

from ocr_translation_spark.functions.placement import (
    rendezvous_assign,
    shard_report,
)

SHARDS = [f"shard{i}" for i in range(8)]


def _w(k, s):
    return hashlib.sha256(f"{k}:{s}".encode()).hexdigest()[:16]


def _assign(k, shards):
    return max(shards, key=lambda s: (_w(k, s), s))


def test_assign_matches_python_mirror(spark):
    keys = list(range(150))
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(df, "doc_id", SHARDS).collect()
    }
    assert got == {k: _assign(str(k), SHARDS) for k in keys}


def test_report_counts_and_minimal_disruption(spark):
    keys = list(range(200))
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    rep = {
        r["shard"]: (r["n_assigned"], r["share_ppm"], r["n_after_drop"])
        for r in shard_report(df, "doc_id", SHARDS, "shard3").collect()
    }
    assert set(rep) == set(SHARDS)
    cur = {k: _assign(str(k), SHARDS) for k in keys}
    survivors = [s for s in SHARDS if s != "shard3"]
    post = {k: _assign(str(k), survivors) for k in keys}
    for s in SHARDS:
        na = sum(1 for v in cur.values() if v == s)
        nd = sum(1 for v in post.values() if v == s)
        assert rep[s] == (na, 1000000 * na // len(keys), nd)
    # HRW's whole point: only the dropped shard's keys move
    assert rep["shard3"][2] == 0
    assert all(
        rep[s][2] >= rep[s][0] for s in survivors
    ), "a surviving shard lost keys on an unrelated drop"
    assert sum(rep[s][2] for s in SHARDS) == len(keys)


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        rendezvous_assign(df, "doc_id", [])
    with pytest.raises(ValueError):
        rendezvous_assign(df, "doc_id", ["a", "a"])
    with pytest.raises(ValueError):
        shard_report(df, "doc_id", ["a", "b"], "zzz")
    with pytest.raises(ValueError):
        shard_report(df, "doc_id", ["a"], "a")


def test_empty_shard_still_reported(spark):
    # one key, many shards: 7 shards own nothing but must appear
    df = spark.createDataFrame([(42,)], "doc_id long")
    rep = shard_report(df, "doc_id", SHARDS, "shard0").collect()
    assert len(rep) == len(SHARDS)
    assert sum(r["n_assigned"] for r in rep) == 1
