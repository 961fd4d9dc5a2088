"""Watermark + event-time windowed streaming aggregation: late data
beyond the watermark is dropped deterministically, and append mode
emits only finalized windows."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_translation_spark.streaming import stream_windowed_counts


def _write_events(path: str, rows: list[tuple], mtime: float) -> None:
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    tbl = pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_watermark_drops_late_rows(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    # batch 1: three 10:xx clicks + a 12:50 click (after this batch the
    # watermark advances to 12:20, past the 10:00-11:00 window's end)
    _write_events(
        os.path.join(in_dir, "a.parquet"),
        [
            (1, "2025-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2025-01-01 10:10:00", 1, "click", 2.0, "{}"),
            (3, "2025-01-01 10:20:00", 2, "click", 3.0, "{}"),
            (4, "2025-01-01 12:50:00", 2, "click", 4.0, "{}"),
        ],
        now - 30,
    )
    # batch 2 runs with watermark 12:20: the 10:00 window is EVICTED
    # and emitted (late-row acceptance ends at eviction, not at
    # watermark crossing — a row this batch would still merge)
    _write_events(
        os.path.join(in_dir, "b.parquet"),
        [(6, "2025-01-01 14:00:00", 3, "view", 5.0, "{}")],
        now - 20,
    )
    # batch 3: a LATE 10:15 click — its window was evicted in batch 2,
    # so the watermark contract DROPS it (numRowsDroppedByWatermark)
    _write_events(
        os.path.join(in_dir, "c.parquet"),
        [(5, "2025-01-01 10:15:00", 3, "click", 100.0, "{}")],
        now - 10,
    )

    out_dir = str(tmp_path / "out")
    q = stream_windowed_counts(
        spark, in_dir, out_dir, str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for s in p.get("stateOperators", [])
    )
    assert dropped == 1  # exactly the late 10:15 click

    rows = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"], r["total_value"],
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    # the finalized 10:00 window holds ONLY the three on-time clicks:
    # the late 100.0-value row was dropped by the watermark
    key = ("2025-01-01 10:00:00", "click")
    assert key in rows, rows
    assert rows[key] == (3, 6.0), rows
    # nothing anywhere counts the late row's value
    assert all(v[1] < 100.0 for v in rows.values())


def test_stateful_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions close on an
    in-stream gap AND on event-time timeout when a user goes quiet."""
    from ocr_translation_spark.streaming import stream_sessionize

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    # batch 1: u1 two events 5min apart (one session); u2 one event
    _write_events(
        os.path.join(in_dir, "a.parquet"),
        [
            (1, "2025-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2025-01-01 10:05:00", 1, "click", 2.0, "{}"),
            (3, "2025-01-01 10:00:00", 2, "view", 7.0, "{}"),
        ],
        now - 30,
    )
    # batch 2: u1 at 10:30 — 25min > 10min gap, closes u1's first
    # session in-stream and opens a second one
    _write_events(
        os.path.join(in_dir, "b.parquet"),
        [(4, "2025-01-01 10:30:00", 1, "click", 3.0, "{}")],
        now - 20,
    )
    # batch 3: u2 far in the future — advances the watermark so u1's
    # open 10:30 session and u2's old 10:00 session TIME OUT
    _write_events(
        os.path.join(in_dir, "c.parquet"),
        [(5, "2025-01-01 12:00:00", 2, "view", 9.0, "{}")],
        now - 10,
    )
    # batch 4: one more tick so the timeouts registered in batch 3
    # actually fire against the advanced watermark
    _write_events(
        os.path.join(in_dir, "d.parquet"),
        [(6, "2025-01-01 12:30:00", 2, "view", 1.0, "{}")],
        now - 5,
    )

    out_dir = str(tmp_path / "out")
    q = stream_sessionize(
        spark, in_dir, out_dir, str(tmp_path / "ck"),
        gap_minutes=10, max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    rows = {
        (r["user_id"], str(r["session_start"])): (
            r["n_events"], r["total_value"], str(r["session_end"]),
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    # u1's first session closed by the in-stream gap
    assert rows[(1, "2025-01-01 10:00:00")] == (2, 3.0, "2025-01-01 10:05:00")
    # u1's second session closed by event-time timeout
    assert rows[(1, "2025-01-01 10:30:00")] == (1, 3.0, "2025-01-01 10:30:00")
    # u2's first session closed by its own much-later event
    assert rows[(2, "2025-01-01 10:00:00")] == (1, 7.0, "2025-01-01 10:00:00")
    # u2's 12:00 session closed in-stream by the 12:30 event (30min gap)
    assert rows[(2, "2025-01-01 12:00:00")] == (1, 9.0, "2025-01-01 12:00:00")
    # the open tail (u2 @ 12:30) is NOT emitted
    assert (2, "2025-01-01 12:30:00") not in rows


def test_stateful_sessionize_late_event_across_batches(spark, tmp_path):
    """A watermark-admitted LATE event (older than the session's stored
    last event, arriving in a later micro-batch) must merge into the
    open session without regressing session_end / the event-time
    timeout. Regression test: the pre-fix code assigned last_us
    unconditionally, so the late 10:04 event rewound the session end
    from 10:08 to 10:04 and the 10:16 event then (wrongly) split the
    session."""
    from ocr_translation_spark.streaming import stream_sessionize

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = time.time()
    # batch 1: u1 at 10:00 and 10:08 (one open session)
    _write_events(
        os.path.join(in_dir, "a.parquet"),
        [
            (1, "2025-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2025-01-01 10:08:00", 1, "click", 2.0, "{}"),
        ],
        now - 50,
    )
    # batch 2: LATE event at 10:04 (within the 30-min watermark delay)
    _write_events(
        os.path.join(in_dir, "b.parquet"),
        [(3, "2025-01-01 10:04:00", 1, "click", 4.0, "{}")],
        now - 40,
    )
    # batch 3: 10:16 — 8 min after the TRUE last event (10:08), so it
    # belongs to the same session (gap = 10 min)
    _write_events(
        os.path.join(in_dir, "c.parquet"),
        [(4, "2025-01-01 10:16:00", 1, "click", 8.0, "{}")],
        now - 30,
    )
    # batches 4+5: u2 far ahead, advancing the watermark so u1's open
    # session times out and is emitted
    _write_events(
        os.path.join(in_dir, "d.parquet"),
        [(5, "2025-01-01 12:00:00", 2, "view", 1.0, "{}")],
        now - 20,
    )
    _write_events(
        os.path.join(in_dir, "e.parquet"),
        [(6, "2025-01-01 12:30:00", 2, "view", 1.0, "{}")],
        now - 10,
    )

    out_dir = str(tmp_path / "out")
    q = stream_sessionize(
        spark, in_dir, out_dir, str(tmp_path / "ck"),
        gap_minutes=10, watermark_delay="30 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    u1 = [
        r for r in spark.read.parquet(out_dir).collect() if r["user_id"] == 1
    ]
    # ONE session covering all four events, not a premature split
    assert len(u1) == 1, u1
    r = u1[0]
    assert str(r["session_start"]) == "2025-01-01 10:00:00"
    assert str(r["session_end"]) == "2025-01-01 10:16:00"
    assert (r["n_events"], r["total_value"]) == (4, 15.0)


def test_stream_sessionize_parity_with_batch(spark, tmp_path):
    """Strong stream==batch oracle (VERDICT r2 item 7): drain the fixed
    sf0.001 events corpus through the stateful stream and assert the
    CLOSED-session set equals the batch events_sessionize result modulo
    each user's open tail session (which stays in state)."""
    import shutil

    import __spark_entry__ as E
    from ocr_translation_spark.streaming import stream_sessionize

    sf = "/root/testdata/sf0.001"
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    shutil.copy(
        os.path.join(sf, "events.parquet"), str(in_dir / "events.parquet")
    )

    out_dir = str(tmp_path / "out")
    q = stream_sessionize(
        spark, str(in_dir), out_dir, str(tmp_path / "ck"), gap_minutes=10
    )
    q.awaitTermination(300)

    batch = E.queries()["events_sessionize"](spark, sf).collect()
    last_sid = {}
    for r in batch:
        last_sid[r["user_id"]] = max(
            last_sid.get(r["user_id"], 0), r["session_id"]
        )
    all_sessions = {
        (r["user_id"], r["start_ts"]): (r["n_events"], r["total_value"])
        for r in batch
    }
    closed = {
        k
        for r in batch
        if r["session_id"] != last_sid[r["user_id"]]  # the open tails
        for k in [(r["user_id"], r["start_ts"])]
    }
    got = {
        (
            r["user_id"],
            r["session_start"].strftime("%Y-%m-%d %H:%M:%S"),
        ): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # every definitely-closed batch session is emitted; tail sessions
    # MAY also appear when their event-time timeout fired before the
    # final watermark — but only with batch-identical values
    assert closed <= set(got), sorted(closed - set(got))
    assert set(got) <= set(all_sessions), sorted(set(got) - set(all_sessions))
    for k, (n, total) in got.items():
        assert all_sessions[k][0] == n, k
        # float sum order differs between engines; rounding to 4 dp on
        # both sides leaves at most a last-digit wobble
        assert abs(all_sessions[k][1] - total) <= 5e-4, (k, got[k])
