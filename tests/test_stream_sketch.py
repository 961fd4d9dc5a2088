"""Streaming heavy-hitter sketch: the Misra-Gries merge guarantees
(underestimate-only, bounded undercount, heavy-key recall), bounded
state size, restart continuation, and crash-replay idempotence of the
running total."""

from __future__ import annotations

import collections
import os
import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_translation_spark.streaming import (
    read_sketch_output,
    stream_heavy_hitters,
)

CAPACITY = 16


def _write_chunks(tmp_path, chunks, start=0):
    in_dir = tmp_path / "in"
    os.makedirs(in_dir, exist_ok=True)
    for i, keys in enumerate(chunks, start=start):
        p = str(in_dir / f"chunk{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"key": keys}), preserve_index=False
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(in_dir)


def _mk_stream(spark, tmp_path, in_dir):
    return stream_heavy_hitters(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        str(tmp_path / "state"),
        capacity=CAPACITY,
        max_files_per_trigger=1,
    )


def _skewed_chunks(n_chunks=4, per_chunk=800, seed=3):
    rng = random.Random(seed)
    chunks = []
    for _ in range(n_chunks):
        keys = [f"hot_{rng.randrange(3)}" for _ in range(per_chunk // 2)]
        keys += [f"cold_{rng.randrange(5000)}" for _ in range(per_chunk // 2)]
        rng.shuffle(keys)
        chunks.append(keys)
    return chunks


def test_sketch_guarantees_and_bounded_state(spark, tmp_path):
    chunks = _skewed_chunks()
    in_dir = _write_chunks(tmp_path, chunks)
    q = _mk_stream(spark, tmp_path, in_dir)
    q.awaitTermination(300)

    exact = collections.Counter(k for c in chunks for k in c)
    n = sum(exact.values())
    out = {
        r["key"]: r
        for r in read_sketch_output(spark, str(tmp_path / "out")).collect()
    }

    # bounded state: never more than capacity summary rows
    assert 0 < len(out) <= CAPACITY
    row = next(iter(out.values()))
    assert row["n_total"] == n
    assert row["threshold"] == n // (CAPACITY + 1)

    # underestimate-only, with the merge theorem's bounded undercount
    for key, r in out.items():
        assert r["min_count"] <= exact[key], key
        assert exact[key] - r["min_count"] <= n // (CAPACITY + 1) + 1, key

    # recall: every key with true count > N/(capacity+1) must survive
    heavy = {k for k, c in exact.items() if c * (CAPACITY + 1) > n}
    assert heavy  # the planted hot keys are heavy by construction
    assert heavy <= set(out)


def test_sketch_restart_continues_history(spark, tmp_path):
    first = _skewed_chunks(n_chunks=2, seed=5)
    in_dir = _write_chunks(tmp_path, first)
    q = _mk_stream(spark, tmp_path, in_dir)
    q.awaitTermination(300)

    # second epoch: new files arrive, the SAME checkpoint+state resume
    second = _skewed_chunks(n_chunks=2, seed=6)
    _write_chunks(tmp_path, second, start=10)
    q2 = _mk_stream(spark, tmp_path, in_dir)
    q2.awaitTermination(300)

    exact = collections.Counter(k for c in first + second for k in c)
    n = sum(exact.values())
    out = {
        r["key"]: r
        for r in read_sketch_output(spark, str(tmp_path / "out")).collect()
    }
    row = next(iter(out.values()))
    # history survives the restart: N covers BOTH epochs exactly
    assert row["n_total"] == n
    heavy = {k for k, c in exact.items() if c * (CAPACITY + 1) > n}
    assert heavy <= set(out)


def test_sketch_replay_is_idempotent(spark, tmp_path):
    """Re-delivering already-merged batch ids must not double-count:
    the additive merge is guarded by the persisted last_batch. Driven
    through the real surface by re-running the SAME input files
    against the SAME state with a FRESH checkpoint — the replayed
    stream re-delivers them as batch ids 0..k <= last_batch."""
    chunks = _skewed_chunks(n_chunks=2, seed=7)
    in_dir = _write_chunks(tmp_path, chunks)
    q = _mk_stream(spark, tmp_path, in_dir)
    q.awaitTermination(300)

    n = sum(len(c) for c in chunks)
    state = spark.read.parquet(str(tmp_path / "state" / "hh_state"))
    before = sorted(map(tuple, state.collect()))
    assert before[0][2] == n  # n_total

    q2 = stream_heavy_hitters(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck_replay"),  # fresh checkpoint => replay
        str(tmp_path / "state"),
        capacity=CAPACITY,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(300)

    state2 = spark.read.parquet(str(tmp_path / "state" / "hh_state"))
    after = sorted(map(tuple, state2.collect()))
    assert after == before  # no double count, summary untouched


def test_sketch_replay_preserves_batch_snapshots(spark, tmp_path):
    """The batch=<id> output dirs are per-batch history: a replayed
    batch must not overwrite its dir with the CURRENT summary."""
    chunks = _skewed_chunks(n_chunks=3, seed=9)
    in_dir = _write_chunks(tmp_path, chunks)
    q = _mk_stream(spark, tmp_path, in_dir)
    q.awaitTermination(300)

    # snapshot history before the replay: batch 0 saw only chunk 0
    snap0 = read_sketch_output(spark, str(tmp_path / "out"), batch=0)
    n0_before = snap0.collect()[0]["n_total"]
    assert n0_before == len(chunks[0])

    q2 = stream_heavy_hitters(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck_replay2"),  # fresh checkpoint => replay
        str(tmp_path / "state"),
        capacity=CAPACITY,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(300)

    snap0_after = read_sketch_output(spark, str(tmp_path / "out"), batch=0)
    assert snap0_after.collect()[0]["n_total"] == n0_before
