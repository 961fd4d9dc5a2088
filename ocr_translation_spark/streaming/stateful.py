"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a lag/running-sum window
(oracle-checked ``events_sessionize``); a continuous ingest needs the
STATEFUL twin: per-user session accumulators that survive across
micro-batches, close when the inactivity gap is exceeded (either by a
later event or by an event-time TIMEOUT when the user goes quiet), and
emit exactly the closed sessions. This is the shape Spark provides for
operators its built-in windowed aggregates can't express — arbitrary
per-key state + event-time timeouts — and the Arrow-batched
``applyInPandasWithState`` keeps it off the slow per-row UDF path.

State per user: (start_us, last_us, n_events, total_value). Timeout =
last event + gap, clamped above the current watermark (Spark rejects
timeouts at/below it). Emission is append-only closed sessions —
idempotent for downstream consumers; the open tail session stays in
state (the next run's checkpoint resumes it).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .windowed import EVENTS_SCHEMA

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n int, total double"


def _session_fn(gap_us: int):
    import pandas as pd

    def _closed_row(user_id, start_us, last_us, n, total):
        return {
            "user_id": user_id,
            "session_start": pd.to_datetime(start_us, unit="us"),
            "session_end": pd.to_datetime(last_us, unit="us"),
            "n_events": n,
            "total_value": round(total, 4),
        }

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame([_closed_row(user_id, start_us, last_us, n, total)])
            return

        data = pd.concat(list(pdfs))
        data = data.sort_values(["ts", "event_id"])
        cur = list(state.get) if state.exists else None
        closed = []
        for ts, val in zip(data["ts"], data["value"]):
            ts_us = ts.value // 1000  # pandas ns -> us
            if cur is not None and ts_us - cur[1] > gap_us:
                closed.append(_closed_row(user_id, *cur))
                cur = None
            if cur is None:
                cur = [ts_us, ts_us, 0, 0.0]
            # extend bounds, never regress them: a watermark-admitted
            # LATE event (older than the stored last event of a session
            # carried over from a previous micro-batch) merges into the
            # open session instead of rewinding session_end / the
            # event-time timeout (which would close it prematurely and
            # split one session into two)
            cur[0] = min(cur[0], ts_us)
            cur[1] = max(cur[1], ts_us)
            cur[2] += 1
            cur[3] += float(val)
        state.update(tuple(cur))
        # close the open session when the user goes quiet past the gap;
        # Spark rejects timeouts <= current watermark, so clamp above it
        timeout_ms = max(
            (cur[1] + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 10,
    watermark_delay: str = "1 minute",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuously sessionize an events directory; emits CLOSED
    sessions (append mode) to parquet. Returns the StreamingQuery."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark_delay)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
