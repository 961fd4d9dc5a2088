"""Streaming decayed trending: stream == batch parity for retained
keys, exact cross-batch decay, lower-bound-only eviction, bounded
state, and crash-replay idempotence."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_translation_spark.functions.timeseries import decayed_topk
from ocr_translation_spark.streaming import (
    read_trending_output,
    stream_decayed_topk,
)

SCALE = 2**40


def _write_chunks(tmp_path, chunks, start=0):
    in_dir = tmp_path / "in"
    os.makedirs(in_dir, exist_ok=True)
    for i, rows in enumerate(chunks, start=start):
        p = str(in_dir / f"chunk{i}.parquet")
        df = pd.DataFrame(rows, columns=["key", "ts"])
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(in_dir)


def _run(spark, tmp_path, in_dir, capacity=64, ck="ck"):
    q = stream_decayed_topk(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / ck),
        str(tmp_path / "state"),
        capacity=capacity,
        scale=SCALE,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)


def _t(day, h=0):
    return dt.datetime(2024, 3, day, h)


def test_stream_matches_batch_operator_exactly(spark, tmp_path):
    chunks = [
        [("a", _t(1)), ("a", _t(1, 6)), ("b", _t(2))],
        [("b", _t(3)), ("c", _t(3)), ("a", _t(4))],
        [("c", _t(4, 12)), ("a", _t(2))],  # late event for day 2
    ]
    in_dir = _write_chunks(tmp_path, chunks)
    _run(spark, tmp_path, in_dir)
    got = {
        r["key"]: (r["decayed_score"], r["as_of_day"])
        for r in read_trending_output(
            spark, str(tmp_path / "out")
        ).collect()
    }
    all_rows = [r for c in chunks for r in c]
    batch = {
        r["key"]: r["decayed_score"]
        for r in decayed_topk(
            spark.createDataFrame(all_rows, "key string, ts timestamp"),
            ["key"], "ts", k=10, scale=SCALE,
        ).collect()
    }
    assert {k: v[0] for k, v in got.items()} == batch
    assert all(v[1] == dt.date(2024, 3, 4) for v in got.values())
    # hand value: a has events on days 1,1,4,2 -> ages 3,3,0,2
    assert got["a"][0] == 2 * (SCALE >> 3) + SCALE + (SCALE >> 2)


def test_decay_advances_across_batches_without_new_events_for_key(
    spark, tmp_path
):
    chunks = [
        [("x", _t(1))],
        [("y", _t(3))],  # advances day_now by 2: x halves twice
    ]
    in_dir = _write_chunks(tmp_path, chunks)
    _run(spark, tmp_path, in_dir)
    b0 = {
        r["key"]: r["decayed_score"]
        for r in read_trending_output(
            spark, str(tmp_path / "out"), batch=0
        ).collect()
    }
    b1 = {
        r["key"]: r["decayed_score"]
        for r in read_trending_output(
            spark, str(tmp_path / "out"), batch=1
        ).collect()
    }
    assert b0 == {"x": SCALE}
    assert b1 == {"x": SCALE >> 2, "y": SCALE}


def test_eviction_is_lower_bound_only_and_state_bounded(spark, tmp_path):
    # capacity 2: c is evicted at batch 0 (rank 3); when it returns
    # with fresh volume it re-enters from zero history -- a strict
    # lower bound -- while the continuously retained key stays exact.
    # Eviction must NOT rewind event time (c carried day 2).
    chunks = [
        [("a", _t(1))] * 6 + [("b", _t(1))] * 5 + [("c", _t(1))],
        [("c", _t(2))] * 3,
    ]
    in_dir = _write_chunks(tmp_path, chunks)
    _run(spark, tmp_path, in_dir, capacity=2)
    out = {
        r["key"]: r["decayed_score"]
        for r in read_trending_output(
            spark, str(tmp_path / "out")
        ).collect()
    }
    assert len(out) <= 2
    assert out["a"] == 6 * (SCALE >> 1)  # exact: retained since day 1
    # c's true decayed score is (SCALE >> 1) + 3*SCALE; its day-1
    # history was evicted, so it restarts at 3*SCALE
    assert out["c"] == 3 * SCALE
    assert out["c"] < (SCALE >> 1) + 3 * SCALE
    assert "b" not in out  # b (2.5*SCALE) evicted at batch 1


def test_crash_replay_is_idempotent(spark, tmp_path):
    chunks = [[("a", _t(1))], [("a", _t(2))]]
    in_dir = _write_chunks(tmp_path, chunks)
    _run(spark, tmp_path, in_dir)
    before = {
        r["key"]: r["decayed_score"]
        for r in read_trending_output(
            spark, str(tmp_path / "out")
        ).collect()
    }
    assert before == {"a": SCALE + (SCALE >> 1)}
    # fresh checkpoint => the same files replay; merges must be no-ops
    _run(spark, tmp_path, in_dir, ck="ck_replay")
    after = {
        r["key"]: r["decayed_score"]
        for r in read_trending_output(
            spark, str(tmp_path / "out")
        ).collect()
    }
    assert after == before
    # batch-0 snapshot history survives the replay untouched
    b0 = {
        r["key"]: r["decayed_score"]
        for r in read_trending_output(
            spark, str(tmp_path / "out"), batch=0
        ).collect()
    }
    assert b0 == {"a": SCALE}


def test_horizon_prunes_state(spark, tmp_path):
    chunks = [
        [("old", _t(1))],
        [("new", _t(20))],  # age 19 > horizon 10 -> old's bucket pruned
    ]
    in_dir = _write_chunks(tmp_path, chunks)
    q = stream_decayed_topk(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        str(tmp_path / "state"),
        capacity=8,
        horizon_days=10,
        scale=SCALE,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    out = {
        r["key"]: r["decayed_score"]
        for r in read_trending_output(
            spark, str(tmp_path / "out")
        ).collect()
    }
    assert out == {"new": SCALE}  # old fell off the horizon entirely
