"""Streaming KMV cardinality: stream-final state must be BYTE-equal
to the batch sketch over the concatenated history (set-union merge is
lossless), state stays bounded at k rows, restarts continue from the
persisted minima, and crash-replays of already-merged batches are
no-ops."""

from __future__ import annotations

import os
import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from ocr_translation_spark.functions.sketches import kmv_distinct
from ocr_translation_spark.streaming import (
    read_kmv_output,
    stream_kmv_distinct,
)

K = 32


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


def _mk_stream(spark, tmp_path, in_dir, ck="ck"):
    return stream_kmv_distinct(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / ck),
        str(tmp_path / "state"),
        k=K,
        max_files_per_trigger=1,
    )


def _chunks(n_chunks=3, per_chunk=600, seed=11):
    rng = random.Random(seed)
    return [
        [f"user_{rng.randrange(2000)}" for _ in range(per_chunk)]
        for _ in range(n_chunks)
    ]


def test_stream_equals_batch_sketch(spark, tmp_path):
    chunks = _chunks()
    in_dir = _write_chunks(tmp_path, chunks)
    q = _mk_stream(spark, tmp_path, in_dir)
    q.awaitTermination(300)

    got = read_kmv_output(spark, str(tmp_path / "out")).collect()[0]
    batch = kmv_distinct(
        spark.createDataFrame(
            [(k,) for c in chunks for k in c], ["key"]
        ),
        "key",
        k=K,
    ).collect()[0]
    assert (got["n_kept"], got["kth_min"], got["est_distinct"]) == (
        batch["n_kept"], batch["kth_min"], batch["est_distinct"]
    )
    # per-batch snapshots are monotone in n_kept up to saturation
    n0 = read_kmv_output(spark, str(tmp_path / "out"), 0).collect()[0]
    assert n0["n_kept"] <= got["n_kept"] == K

    # bounded state: <= K rows ever persisted
    state = spark.read.parquet(str(tmp_path / "state" / "kmv_state"))
    assert state.count() <= K


def test_restart_continues_from_persisted_minima(spark, tmp_path):
    chunks = _chunks(2, per_chunk=60, seed=5)
    in_dir = _write_chunks(tmp_path, chunks[:1])
    _mk_stream(spark, tmp_path, in_dir).awaitTermination(300)
    first = read_kmv_output(spark, str(tmp_path / "out"), 0).collect()[0]

    _write_chunks(tmp_path, chunks[1:], start=1)
    _mk_stream(spark, tmp_path, in_dir).awaitTermination(300)
    final = read_kmv_output(spark, str(tmp_path / "out")).collect()[0]

    both = kmv_distinct(
        spark.createDataFrame(
            [(k,) for c in chunks for k in c], ["key"]
        ),
        "key",
        k=K,
    ).collect()[0]
    assert final["n_kept"] >= first["n_kept"]
    assert (final["n_kept"], final["kth_min"]) == (
        both["n_kept"], both["kth_min"]
    )


def test_crash_replay_is_a_noop(spark, tmp_path):
    chunks = _chunks(2, per_chunk=400, seed=7)
    in_dir = _write_chunks(tmp_path, chunks)
    _mk_stream(spark, tmp_path, in_dir).awaitTermination(300)
    state1 = sorted(
        r["h"]
        for r in spark.read.parquet(
            str(tmp_path / "state" / "kmv_state")
        ).collect()
        if r["h"] is not None
    )
    out1 = read_kmv_output(spark, str(tmp_path / "out"), 0).collect()[0]

    # fresh checkpoint, same state dir: batch ids restart at 0, every
    # batch replays with id <= last_batch and must not re-merge or
    # rewrite snapshots
    _mk_stream(spark, tmp_path, in_dir, ck="ck2").awaitTermination(300)
    state2 = sorted(
        r["h"]
        for r in spark.read.parquet(
            str(tmp_path / "state" / "kmv_state")
        ).collect()
        if r["h"] is not None
    )
    out2 = read_kmv_output(spark, str(tmp_path / "out"), 0).collect()[0]
    assert state1 == state2
    assert tuple(out1) == tuple(out2)


def test_null_keys_ignored(spark, tmp_path):
    in_dir = _write_chunks(
        tmp_path, [["a", None, "b", None, "a"]]
    )
    _mk_stream(spark, tmp_path, in_dir).awaitTermination(300)
    got = read_kmv_output(spark, str(tmp_path / "out")).collect()[0]
    assert (got["n_kept"], got["est_distinct"]) == (2, 2)


def test_checkpoint_reset_new_data_still_merges(spark, tmp_path):
    # review fix: batch ids restart at 0 under a reset checkpoint; a
    # watermark-gated merge would silently drop the NEW file's keys.
    # The set-union merge must run unconditionally.
    in_dir = _write_chunks(tmp_path, [["a", "b", "c"]])
    _mk_stream(spark, tmp_path, in_dir).awaitTermination(300)
    got1 = read_kmv_output(spark, str(tmp_path / "out")).collect()[0]
    assert got1["est_distinct"] == 3

    # checkpoint is RESET (ck2) but the state dir is retained, and a
    # new file lands: it replays as batch 0 <= last_batch
    _write_chunks(tmp_path, [["d", "e"]], start=1)
    _mk_stream(spark, tmp_path, in_dir, ck="ck2").awaitTermination(300)
    got2 = read_kmv_output(spark, str(tmp_path / "out")).collect()[0]
    assert got2["est_distinct"] == 5
