"""Stream-stream interval join: inner results equal the batch join
over the full input (parity), and left-outer null-extends an
unmatched click only after the watermark proves it final."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_translation_spark.streaming import stream_click_purchase_join

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write_events(path: str, rows: list[tuple], mtime: float) -> None:
    df = pd.DataFrame(rows, columns=COLS)
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


CLICKS = [
    (1, "2025-01-01 10:00:00", 1, "click", 0.0, "{}"),
    (2, "2025-01-01 10:05:00", 2, "click", 0.0, "{}"),
    (3, "2025-01-01 12:00:00", 3, "click", 0.0, "{}"),  # never matched
]
PURCHASES = [
    # user 1: one inside the 1h span, one outside (exactly at +1h is IN)
    (101, "2025-01-01 11:00:00", 1, "purchase", 10.0, "{}"),
    (102, "2025-01-01 11:30:00", 1, "purchase", 20.0, "{}"),
    # user 2: two inside the span -> two joined rows
    (103, "2025-01-01 10:10:00", 2, "purchase", 30.0, "{}"),
    (104, "2025-01-01 10:50:00", 2, "purchase", 40.0, "{}"),
    # watermark pusher on the purchase side (user 9 never clicks)
    (105, "2025-01-01 15:00:00", 9, "purchase", 50.0, "{}"),
]
# expected inner matches: (click, purchase)
EXPECT_INNER = {(1, 101), (2, 103), (2, 104)}


def _run(spark, tmp_path, join_type):
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    os.makedirs(cdir)
    os.makedirs(pdir)
    now = time.time()
    _write_events(os.path.join(cdir, "c1.parquet"), CLICKS, now - 30)
    _write_events(
        os.path.join(pdir, "p1.parquet"), PURCHASES[:4], now - 30
    )
    # watermark pushers: the GLOBAL watermark is min(click wm,
    # purchase wm) (multipleWatermarkPolicy=min), so BOTH sides need a
    # late event before an unmatched click is provably final; and
    # state flushes in the batch AFTER the watermark advanced, so a
    # third batch (c3) must exist for the null-extended row to emit
    # inside one availableNow drain
    _write_events(
        os.path.join(pdir, "p2.parquet"), PURCHASES[4:], now - 20
    )
    _write_events(
        os.path.join(cdir, "c2.parquet"),
        [(11, "2025-01-01 16:00:00", 8, "click", 0.0, "{}")],
        now - 20,
    )
    _write_events(
        os.path.join(cdir, "c3.parquet"),
        [(12, "2025-01-01 18:00:00", 8, "click", 0.0, "{}")],
        now - 10,
    )
    out = str(tmp_path / f"out_{join_type}")
    q = stream_click_purchase_join(
        spark, cdir, pdir, out, str(tmp_path / f"ck_{join_type}"),
        max_span="1 hour", watermark_delay="10 minutes",
        join_type=join_type, max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    return spark.read.parquet(out)


def test_inner_join_matches_batch_semantics(spark, tmp_path):
    got = _run(spark, tmp_path, "inner")
    pairs = {
        (r["click_id"], r["purchase_id"]) for r in got.collect()
    }
    assert pairs == EXPECT_INNER
    vals = {r["purchase_id"]: r["purchase_value"] for r in got.collect()}
    assert vals == {101: 10.0, 103: 30.0, 104: 40.0}


def test_left_outer_finalizes_unmatched_click(spark, tmp_path):
    got = _run(spark, tmp_path, "left_outer")
    rows = got.collect()
    pairs = {
        (r["click_id"], r["purchase_id"])
        for r in rows
        if r["purchase_id"] is not None
    }
    assert pairs == EXPECT_INNER
    # click 3 (12:00, span ends 13:00) is finalized null-extended once
    # the purchase watermark passed 14:50; click 1's unmatched-with-102
    # row does NOT appear (102 is outside the span but 101 matched, and
    # outer extension is per-ROW, not per-candidate)
    nulls = {r["click_id"] for r in rows if r["purchase_id"] is None}
    assert nulls == {3}
    # the null-extended row carries the click's own columns
    (r3,) = [r for r in rows if r["click_id"] == 3]
    assert r3["user_id"] == 3 and r3["purchase_value"] is None


def test_join_state_survives_restart(spark, tmp_path):
    """A click buffered in run 1 must match a purchase that only
    arrives in run 2 under the SAME checkpoint — the join state
    (buffered rows + watermarks) is part of the checkpoint contract."""
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    os.makedirs(cdir)
    os.makedirs(pdir)
    now = time.time()
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    _write_events(
        os.path.join(cdir, "c1.parquet"),
        [(1, "2025-01-01 10:00:00", 1, "click", 0.0, "{}")],
        now - 40,
    )
    _write_events(
        os.path.join(pdir, "p1.parquet"),
        [(100, "2025-01-01 09:00:00", 9, "purchase", 1.0, "{}")],
        now - 40,
    )
    q1 = stream_click_purchase_join(
        spark, cdir, pdir, out, ck,
        max_span="1 hour", watermark_delay="10 minutes",
    )
    q1.awaitTermination(300)
    assert spark.read.parquet(out).where(
        "purchase_id is not null"
    ).count() == 0  # nothing matched yet; the click is buffered state

    # run 2, same checkpoint: only the matching purchase is new
    _write_events(
        os.path.join(pdir, "p2.parquet"),
        [(101, "2025-01-01 10:30:00", 1, "purchase", 7.0, "{}")],
        now - 10,
    )
    q2 = stream_click_purchase_join(
        spark, cdir, pdir, out, ck,
        max_span="1 hour", watermark_delay="10 minutes",
    )
    q2.awaitTermination(300)
    got = spark.read.parquet(out).where("purchase_id is not null").collect()
    assert [(r["click_id"], r["purchase_id"]) for r in got] == [(1, 101)]
