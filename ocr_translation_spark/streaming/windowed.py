"""Event-time windowed streaming aggregation with late-data handling.

The idiomatic Structured Streaming shape the engine exposes for
continuously-arriving event tables: ``readStream -> withWatermark ->
groupBy(window(...)) -> append sink``. The watermark bounds state (a
window's accumulator is evicted+emitted once the watermark —
``max(event_time) - delay`` over prior batches — passes the window
end) and defines the late-data contract: an event arriving AFTER its
window was evicted is dropped (``numRowsDroppedByWatermark``); an
event arriving in the same batch as the eviction still merges. That
asymmetry is Spark's documented guarantee boundary, pinned by the
test — and the trade a 100 TB streaming ingest makes to keep state
finite.

Append output mode emits each window exactly once, when the watermark
passes its end — so downstream readers see only FINAL window rows
(idempotent to re-read, safe to join). Windows still open when an
``availableNow`` drain terminates are intentionally unemitted; the
next run's checkpoint resume picks them up.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Windowed per-event-type counts/sums over a growing events
    directory; returns the StreamingQuery.

    ``max_files_per_trigger`` splits a drain into multiple
    micro-batches (tests use it to advance the watermark between
    batches deterministically).
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    # watermarks require TIMESTAMP (not NTZ); the session TZ is pinned
    # UTC (session.py) so the cast is wall-time faithful
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    agg = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
