"""Stream-stream interval join with watermark-bounded state.

The idiomatic Structured Streaming shape for correlating two unbounded
event streams — here click->purchase attribution within a time bound,
the streaming form of the batch ``purchases_in_session`` /
``purchase_attribution_asof`` family:

``readStream x2 -> withWatermark both -> join on key + time range``.

Semantics Spark guarantees (and the tests pin):

* Both sides buffer state; the TIME-RANGE predicate + both watermarks
  let the engine evict a buffered row once no future match can arrive
  — state is O(watermark window), not O(stream), which is the whole
  trade that makes the join runnable over a 100 TB/day firehose.
* Inner join: a match is emitted in the micro-batch where both rows
  are present — results equal the batch join over the union of all
  inputs (parity test).
* Left-outer join: the null-extended row for an unmatched click is
  emitted only once the watermark proves no future purchase can match
  (so downstream never sees a retraction — append-only contract).

Scale shape: the join key (``user_id``) hash-partitions both streams
identically, so each micro-batch's join is co-partitioned with no
extra exchange beyond the two stream shuffles; skewed users are
bounded by the time-range eviction.

Reference parity note: the reference service has no streaming surface;
this is Structured-Streaming breadth per the brief (stream-stream
joins complement the windowed-agg / stateful / dedup / sketch
operators already covered).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from .windowed import EVENTS_SCHEMA


def stream_click_purchase_join(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_span: str = "1 hour",
    watermark_delay: str = "30 minutes",
    join_type: str = "inner",
    max_files_per_trigger: int | None = None,
):
    """Join each click to every purchase by the same user within
    ``(click.ts, click.ts + max_span]``; returns the StreamingQuery
    (availableNow drain into a parquet append sink).

    ``join_type``: ``inner`` or ``left_outer`` (unmatched clicks
    null-extended once provably final). ``max_files_per_trigger``
    splits a drain into several micro-batches so tests can advance
    the watermark deterministically between files.
    """

    def _src(d):
        reader = spark.readStream.schema(EVENTS_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        s = reader.parquet(d)
        # watermarks need TIMESTAMP (not NTZ); session TZ pinned UTC
        return s.withColumn("ts", F.col("ts").cast("timestamp"))

    clicks = (
        _src(clicks_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark_delay)
    )
    purchases = (
        _src(purchases_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark_delay)
    )

    joined = clicks.join(
        purchases,
        on=F.expr(
            "user_id = p_user_id AND "
            "purchase_ts > click_ts AND "
            f"purchase_ts <= click_ts + interval {max_span}"
        ),
        how=join_type,
    ).select(
        "click_id", "user_id", "click_ts",
        "purchase_id", "purchase_ts", "purchase_value",
    )

    return (
        joined.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
