"""Edge semantics for interval_join and deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translation_spark.functions.sampling import (
    hash_sample,
    stratified_sample,
)
from ocr_translation_spark.functions.timeseries import interval_join


def test_interval_join_edges(spark):
    """Inclusive bounds on BOTH ends, bin-spanning intervals, multiple
    containing intervals, and non-matching keys/times."""
    events = spark.createDataFrame(
        [
            (1, 1, "2025-01-01 10:00:00"),   # exactly at i1 start
            (2, 1, "2025-01-01 10:59:59"),   # inside i1, other bin
            (3, 1, "2025-01-01 11:00:00"),   # exactly at i1 end + in i2
            (4, 1, "2025-01-01 12:00:01"),   # after everything
            (5, 2, "2025-01-01 10:30:00"),   # right time, wrong key
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [
            (1, 10, "2025-01-01 10:00:00", "2025-01-01 11:00:00"),
            (1, 11, "2025-01-01 10:45:00", "2025-01-01 12:00:00"),
        ],
        "user_id long, iv_id long, s string, e string",
    ).select(
        "user_id", "iv_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            events, intervals, "user_id", "ts", "s", "e", bin_seconds=600
        ).collect()
    )
    assert got == [(1, 10), (2, 10), (2, 11), (3, 10), (3, 11)]


def test_interval_join_bin_size_invariance(spark):
    """The result is independent of bin_seconds (only cost changes)."""
    ev = spark.range(50).select(
        F.lit(1).alias("k"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 137).alias("ts"),
    )
    iv = spark.range(5).select(
        F.lit(1).alias("k"),
        F.col("id").alias("iv_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 1000).alias("s"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 1000 + 800).alias("e"),
    )
    def run(bin_s):
        return sorted(
            (r["event_id"], r["iv_id"])
            for r in interval_join(ev, iv, "k", "ts", "s", "e", bin_s).collect()
        )
    base = run(600)
    assert base  # non-trivial
    assert run(60) == base
    assert run(7) == base


def test_stratified_sample_deterministic_and_sized(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s1 = {
        (r["source"], r["doc_id"])
        for r in stratified_sample(docs, "source", 5, "doc_id").collect()
    }
    s2 = {
        (r["source"], r["doc_id"])
        for r in stratified_sample(docs, "source", 5, "doc_id").collect()
    }
    assert s1 == s2  # identical draw every run
    from collections import Counter

    per = Counter(src for src, _ in s1)
    n_sources = docs.select("source").distinct().count()
    assert len(per) == n_sources
    assert all(v == 5 for v in per.values())
    # growing the stratum cap only ADDS rows (prefix-stable ranking)
    s10 = {
        (r["source"], r["doc_id"])
        for r in stratified_sample(docs, "source", 10, "doc_id").collect()
    }
    assert s1 <= s10


def test_hash_sample_rate_and_determinism(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    kept = hash_sample(df, "doc_id", mod=16)
    n = kept.count()
    assert 0.04 < n / 20_000 < 0.09  # ~1/16
    assert kept.count() == n  # stable
    # disjoint residue classes partition the corpus
    n_all = sum(
        hash_sample(df, "doc_id", mod=4, keep=k).count() for k in range(4)
    )
    assert n_all == 20_000


def test_interval_join_matches_brute_force_random(spark):
    """Property-style check: on a deterministic pseudo-random dataset,
    the binned interval join equals the brute-force theta join."""
    import hashlib

    def h(*k):
        return int.from_bytes(
            hashlib.blake2b(repr(k).encode(), digest_size=4).digest(), "big"
        )

    base = 1_700_000_000
    events = [
        (i, h("k", i) % 5, base + h("t", i) % 50_000) for i in range(300)
    ]
    intervals = []
    for j in range(60):
        s = base + h("s", j) % 50_000
        intervals.append((j, h("ik", j) % 5, s, s + h("len", j) % 4_000))

    ev = spark.createDataFrame(
        events, "event_id long, k long, tsec long"
    ).select("event_id", "k", F.timestamp_seconds("tsec").alias("ts"))
    iv = spark.createDataFrame(
        intervals, "iv_id long, k long, ssec long, esec long"
    ).select(
        "iv_id", "k",
        F.timestamp_seconds("ssec").alias("s"),
        F.timestamp_seconds("esec").alias("e"),
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(ev, iv, "k", "ts", "s", "e", 600).collect()
    )
    brute = sorted(
        (e_id, i_id)
        for (e_id, ek, et) in events
        for (i_id, ik, s, e) in intervals
        if ek == ik and s <= et <= e
    )
    assert got == brute and len(brute) > 20


def test_chunk_documents_reconstruction(spark):
    """Chunk windows tile the token stream: stripping each chunk's
    leading overlap (after chunk 0) and concatenating reproduces the
    original tokens; every chunk is <= max_tokens; consecutive chunks
    share exactly the overlap."""
    from ocr_translation_spark.functions.text import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    max_t, ov = 16, 4
    rows = chunk_documents(docs, max_tokens=max_t, overlap=ov).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]

    originals = {
        r["doc_id"]: r["text"].strip().split()
        for r in docs.collect()
    }
    assert set(by_doc) == set(originals)
    stride = max_t - ov
    for doc_id, chunks in by_doc.items():
        ordered = [chunks[i] for i in range(len(chunks))]
        toks = [c.split() if c else [] for c in ordered]
        assert all(len(t) <= max_t for t in toks)
        # chunk c is exactly the window [c*stride, c*stride + max_t),
        # and the windows tile the full token stream
        rebuilt = []
        for i, t in enumerate(toks):
            start = i * stride
            assert originals[doc_id][start : start + max_t] == t
            rebuilt[start : start + len(t)] = t
        assert rebuilt == originals[doc_id]


def test_chunk_documents_boundaries(spark):
    """Chunk-count arithmetic at the window boundaries, plus blank and
    multi-whitespace inputs, in one Spark pass (max=8, overlap=2,
    stride=6)."""
    from ocr_translation_spark.functions.text import chunk_documents

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    cases = {
        0: "",            # blank -> one empty chunk
        1: words(1),
        8: words(8),      # == max -> 1 chunk
        9: words(9),      # max+1 -> 2 chunks
        14: words(14),    # max+stride -> 2 chunks (second full)
        15: words(15),    # max+stride+1 -> 3 chunks
        100: "  a   b  ", # whitespace runs + padding -> 2 tokens
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in cases.items()], "doc_id long, text string"
    )
    rows = chunk_documents(df, max_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)

    expect_chunks = {0: 1, 1: 1, 8: 1, 9: 2, 14: 2, 15: 3, 100: 1}
    for doc_id, n in expect_chunks.items():
        assert len(by_doc[doc_id]) == n, (doc_id, by_doc[doc_id])
    assert by_doc[0][0]["chunk_text"] == ""
    assert by_doc[0][0]["n_chunk_tokens"] == 0
    assert by_doc[100][0]["chunk_text"] == "a b"
    assert by_doc[100][0]["n_chunk_tokens"] == 2
    # n=15: chunks cover [0:8], [6:14], [12:15]
    c = sorted(by_doc[15], key=lambda r: r["chunk_id"])
    assert [r["n_chunk_tokens"] for r in c] == [8, 8, 3]
    assert c[2]["chunk_text"] == "w12 w13 w14"


def test_pack_documents_layout_properties(spark):
    """Packing invariants: offsets within a bucket are a gapless
    tiling of the token stream in hash order; pack_id is the start
    offset's budget bin; the layout is deterministic."""
    from ocr_translation_spark.functions.packing import pack_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 128
    # 1 hex digit keeps every bucket multi-doc at this corpus size so
    # the tiling property is meaningfully exercised (the 3-digit
    # production default is covered by the bounded-share test below)
    rows = pack_documents(
        docs, budget_tokens=budget, bucket_hex_digits=1
    ).collect()
    assert len(rows) == docs.count()

    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert len(by_bucket) == 16  # one hex digit of buckets
    for bucket, rs in by_bucket.items():
        rs = sorted(rs, key=lambda r: r["start_offset"])
        expect = 0
        for r in rs:
            assert r["start_offset"] == expect  # gapless tiling
            assert r["pack_id"] == r["start_offset"] // budget
            expect += r["n_tokens"]
        # every pack holds at least one doc start and packs are dense
        packs = sorted({r["pack_id"] for r in rs})
        assert packs == list(range(packs[-1] + 1))

    again = pack_documents(
        docs, budget_tokens=budget, bucket_hex_digits=1
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_pack_documents_bucket_share_bounded_at_scale(spark):
    """The production default (3 hex digits = 4096 buckets) must keep
    every bucket's row share bounded as the corpus grows: the per-task
    window sort is corpus/16^digits, NOT corpus/16 (VERDICT r3 item 2).
    Checked at a 10x scale-up of the sf0.001 corpus size with adversarially
    sequential ids — hash bucketing must spread them uniformly."""
    from pyspark.sql import functions as F

    from ocr_translation_spark.functions.packing import pack_documents

    n = 5000  # ~10x the sf0.001 corpus
    docs = spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("token text number "), F.col("id")).alias("text"),
    )
    shares = (
        pack_documents(docs)
        .groupBy("bucket")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.count("*").alias("n_buckets"),
        )
        .collect()[0]
    )
    # 5000 rows over 4096 buckets: expected max occupancy ~5-6; a
    # 16-bucket layout would put ~312 rows in each. The bound below
    # (0.5% of the corpus) fails loudly if the default ever regresses
    # to a coarse bucketing, while being ~4x above the birthday-bound
    # noise ceiling for this n.
    assert shares["mx"] <= max(10, n * 0.005), shares
    assert shares["n_buckets"] > 1000  # the id space actually spreads


# ------------------------------------------------- training shuffle order


def test_training_shuffle_order_is_a_permutation(spark):
    from ocr_translation_spark.functions.sampling import (
        training_shuffle_order,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(300)], "doc_id long, text string"
    )
    out = training_shuffle_order(docs, n_buckets=16).collect()
    # bijection: every doc exactly once
    assert sorted(r["doc_id"] for r in out) == list(range(300))
    # pos is 1..n_b dense within each bucket
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["pos"])
    for b, ps in by_bucket.items():
        assert 0 <= b < 16
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # hash spreads across many buckets
    assert len(by_bucket) > 8


def test_training_shuffle_order_deterministic_and_shuffled(spark):
    from ocr_translation_spark.functions.sampling import (
        training_shuffle_order,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    )
    a = sorted(map(tuple, training_shuffle_order(docs, 8).collect()))
    b = sorted(map(tuple, training_shuffle_order(docs, 8).collect()))
    assert a == b  # reproducible on re-run
    # the permutation is not the identity order: reading bucket-major
    # must interleave doc_ids
    order = [r[0] for r in sorted(
        training_shuffle_order(docs, 8).collect(),
        key=lambda r: (r["bucket"], r["pos"]),
    )]
    assert order != sorted(order)


# ---- budget_apportion (largest-remainder / Hamilton) ----


def test_apportion_hand_computed_and_exact_sum(spark):
    from ocr_translation_spark.functions.sampling import budget_apportion

    # weights 3, 3, 4 over budget 10: bases 3,3,4 (exact thirds/fifths:
    # 10*3//10=3, 10*4//10=4), residual 0. Then budget 7 over weights
    # 1,1,1: bases 2,2,2, residual 1 -> smallest group name gets it.
    df = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 4)], "src string, w long"
    )
    out = {r.group: r.quota for r in budget_apportion(df, "src", "w", 10).collect()}
    assert out == {"a": 3, "b": 3, "c": 4}

    df2 = spark.createDataFrame(
        [("x", 1), ("y", 1), ("z", 1)], "src string, w long"
    )
    out2 = {r.group: r.quota for r in budget_apportion(df2, "src", "w", 7).collect()}
    assert sum(out2.values()) == 7
    assert out2 == {"x": 3, "y": 2, "z": 2}  # equal remainders: name asc


def test_apportion_sum_invariant_random(spark):
    import random

    from ocr_translation_spark.functions.sampling import budget_apportion

    rng = random.Random(20260818)
    rows = [(f"s{i}", rng.randrange(1, 10**6)) for i in range(37)]
    df = spark.createDataFrame(rows, "src string, w long")
    for budget in (0, 1, 999, 10**9):
        got = budget_apportion(df, "src", "w", budget).collect()
        assert sum(r.quota for r in got) == budget
        # quota within 1 of the exact proportional share
        tw = sum(w for _, w in rows)
        for r in got:
            lo = (budget * dict(rows)[r.group]) // tw
            assert r.quota in (lo, lo + 1)


def test_apportion_zero_weight_raises(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    from ocr_translation_spark.functions.sampling import budget_apportion

    df = spark.createDataFrame([("a", 0)], "src string, w long")
    with pytest.raises(SparkRuntimeException, match="zero total weight"):
        budget_apportion(df, "src", "w", 5).collect()
    with pytest.raises(ValueError, match="budget"):
        budget_apportion(df, "src", "w", -1)
