"""Streaming heavy hitters: a bounded-state frequency sketch over an
arriving key stream (the incremental twin of
``functions.sketches.misra_gries_heavy_hitters``).

A trending-keys / hot-URL / abuse-detection pipeline cannot recount
the full history per micro-batch, and keeping one counter per distinct
key ever seen is exactly the unbounded state streaming must avoid.
This operator keeps the MERGE form of the Misra-Gries summary
(Agarwal et al., "Mergeable Summaries", PODS'12) as its ONLY persisted
state — at most ``capacity`` (key, weight) rows plus one running
total — and folds each micro-batch in:

* per batch: exact key counts (one hash aggregate — the micro-batch's
  own perfect MG summary), union with the persisted summary, sum
  weights, subtract the (capacity+1)-th largest weight from every
  entry and drop the non-positives. The survivors (<= capacity rows)
  REPLACE the state.
* guarantees carried by the merge theorem, asserted in tests: every
  summary weight UNDERESTIMATES the true count by at most
  N/(capacity+1), so any key with true frequency > N/(capacity+1)
  is guaranteed present; keys can never be over-counted.
* per batch output: the summary snapshot (key, min_count) with the
  running N and the error bound, overwritten into a ``batch=<id>``
  dir (crash-replay rewrites the same dir).

Unlike the exact batch operator (which recounts candidates in a
second pass), a one-pass stream cannot recount history, so the
emitted counts are lower bounds with the stated error — that is the
standard streaming trade, and the registry dedup streams next door
show the exact-via-registry alternative when state CAN grow with the
key space.

Crash safety: the merge is additive, so replaying a micro-batch after
a crash must NOT re-fold it. The state table carries the last merged
batch id and is replaced atomically (Catalog's swap-write); a replayed
batch id <= the persisted one only rewrites its (idempotent,
overwrite-mode) output dir. The state dir and the stream checkpoint
must therefore live and die together — deleting only the checkpoint
restarts batch ids and would skip genuinely-new merges.

Reference parity note: the reference service has no streaming
analytics; this belongs to the training-data-pipeline surface the
brief requires beyond parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import Catalog

STATE = "hh_state"

_STATE_SCHEMA = (
    "key string, weight long, n_total long, last_batch long"
)


def _load_state(cat: Catalog):
    """(rows, n_total, last_batch) from the persisted summary; empty
    state for a fresh stream. A corrupt table degrades to empty —
    loudly, matching the registry streams' never-silently convention."""
    df = cat.load_or_none(STATE)
    if df is None:
        if cat.exists(STATE):
            import logging

            logging.getLogger(__name__).warning(
                "heavy-hitter state table unreadable; restarting the "
                "sketch from empty (history counts are lost)"
            )
        return [], 0, -1
    rows = df.collect()  # <= capacity rows by construction
    if not rows:
        return [], 0, -1
    return (
        # a single key=None row is the empty-summary placeholder that
        # still carries (n_total, last_batch)
        [
            (r["key"], r["weight"])
            for r in rows
            if r["key"] is not None
        ],
        rows[0]["n_total"],
        rows[0]["last_batch"],
    )


def stream_heavy_hitters(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    key_col: str = "key",
    capacity: int = 64,
    schema: str = "key string",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuously sketch an arriving key directory. Returns the
    StreamingQuery. Per-batch output rows:
    (key, min_count, n_total, threshold) where ``min_count`` is the
    guaranteed lower bound on the key's true count and ``threshold`` =
    n_total / (capacity + 1) is the maximum undercount."""
    cat = Catalog(spark, state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        state_rows, n_total, last_batch = _load_state(cat)

        merged_this_call = batch_id > last_batch
        if merged_this_call:
            keyed = batch_df.select(
                F.col(key_col).alias("key")
            ).where(F.col(key_col).isNotNull())
            # two jobs read batch_counts (the total and the top-k);
            # persist so the micro-batch is scanned/aggregated once
            batch_counts = keyed.groupBy("key").agg(
                F.count(F.lit(1)).alias("weight")
            ).persist()
            try:
                n_batch = (
                    batch_counts.agg(F.sum("weight")).collect()[0][0]
                    or 0
                )
                if state_rows:
                    prior = spark.createDataFrame(
                        state_rows, "key string, weight long"
                    )
                    merged = batch_counts.unionByName(prior).groupBy(
                        "key"
                    ).agg(F.sum("weight").alias("weight"))
                else:
                    merged = batch_counts
                # (capacity+1)-th largest weight: TakeOrdered collects
                # O(capacity) rows — control-sized by the sketch bound
                top = merged.orderBy(
                    F.col("weight").desc(), "key"
                ).limit(capacity + 1).collect()
            finally:
                batch_counts.unpersist()
            if len(top) > capacity:
                kth = top[-1]["weight"]
                survivors = [
                    (r["key"], r["weight"] - kth)
                    for r in top
                    if r["weight"] > kth
                ]
            else:
                survivors = [(r["key"], r["weight"]) for r in top]
            n_total += int(n_batch)
            state_rows = survivors
            state_df = spark.createDataFrame(
                [
                    (k, w, n_total, batch_id)
                    for k, w in (state_rows or [(None, None)])
                ],
                _STATE_SCHEMA,
            )
            # atomic replace: summary + N + batch id commit together
            cat.replace(state_df, STATE)

        # The batch=<id> dirs are per-batch SNAPSHOTS: on a replayed
        # (already-merged) batch id, rewriting from the CURRENT state
        # would overwrite history with the latest summary, so replays
        # leave an existing dir untouched. The one legitimate replay
        # write is the crash window between the state swap and this
        # write: there batch_id == last_batch and the current state IS
        # that batch's snapshot.
        out_path = os.path.join(output_dir, f"batch={batch_id}")
        if merged_this_call or not os.path.exists(out_path):
            out = spark.createDataFrame(
                [
                    (k, w, n_total)
                    for k, w in (state_rows or [])
                    if k is not None
                ],
                "key string, min_count long, n_total long",
            ).withColumn(
                "threshold",
                F.floor(
                    F.col("n_total") / F.lit(capacity + 1)
                ).cast("long"),
            )
            out.write.mode("overwrite").parquet(out_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sketch_output(
    spark: SparkSession, output_dir: str, batch: int | None = None
) -> DataFrame:
    """The summary snapshot for one batch dir (default: the latest)."""
    if batch is None:
        ids = [
            int(d.split("=", 1)[1])
            for d in os.listdir(output_dir)
            if d.startswith("batch=")
        ]
        if not ids:
            raise FileNotFoundError(
                f"no batch=<id> output dirs under {output_dir!r} — "
                "has the sketch stream produced a batch yet?"
            )
        batch = max(ids)
    return spark.read.parquet(os.path.join(output_dir, f"batch={batch}"))
