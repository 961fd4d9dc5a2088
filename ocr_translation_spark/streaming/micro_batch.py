"""Structured-Streaming wrapper over the batch extraction pipeline.

The reference is request-driven (SSE push per job); the batch north
rule needs no streaming — but a continuously-fed documents table is the
natural production shape, so this provides the idiomatic wrapper:

``readStream`` over the input directory -> ``foreachBatch`` running the
SAME ``extract()`` plan per micro-batch -> parquet append, with
``Trigger.AvailableNow`` for catch-up-and-stop semantics and the
streaming checkpoint for exactly-once progress (the streaming twin of
operators/resume.py; both make re-processing idempotent, one at the
micro-batch level, one at the bucket level).

``foreachBatch`` is the right tool here because the media branch of the
pipeline contains a per-doc regroup (aggregation), which append-mode
streaming cannot express statelessly; per-micro-batch it is just a
batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import OUT_SCHEMA, extract


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    media: DataFrame | None = None,
    available_now: bool = True,
    **extract_kwargs,
):
    """Run the extraction as a stream; returns the StreamingQuery.

    With ``available_now=True`` the query drains existing input files
    and stops (use ``query.awaitTermination()``).
    """
    stream = (
        spark.readStream.schema(OUT_SCHEMA)  # input shares the span schema
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        result = extract(spark, batch_df, media, **extract_kwargs).result
        result.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
