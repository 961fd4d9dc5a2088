"""Streaming distinct-count: a bounded-state KMV cardinality sketch
over an arriving key stream (the incremental twin of
``functions.sketches.kmv_distinct``).

"How many distinct users/URLs has this stream EVER seen?" cannot be
answered by windowed ``approx_count_distinct`` (window-scoped) or an
exact distinct registry (state grows with the key space — the
dedup-stream trade next door). The KMV summary is the textbook
mergeable answer: the ONLY persisted state is the k smallest 60-bit
sha-derived hashes ever observed (plus the merged-batch watermark),
and set-union + re-truncate IS the lossless merge (Beyer et al.
SIGMOD'07) — merging per-batch k-minima yields byte-identical state
to sketching the concatenated history, which is what the stream ≡
batch parity test asserts against ``kmv_distinct`` itself.

Per micro-batch:
  * one distributed job: the batch's distinct hash k-minima
    (dedup + orderBy/limit k — an O(k) collect);
  * a driver-side set-union with the <= k persisted minima and
    re-truncation to k (2k values, control-sized);
  * atomic state replace (Catalog swap-write) carrying the batch id;
  * a (n_kept, kth_min, est_distinct) snapshot written to a
    ``batch=<id>`` dir — the same exact-integer estimator as the
    batch operator (n_kept below k; floor((k-1)*2^60/kth_min) once
    saturated).

Crash safety: KMV merge is a set union, so the merge runs
UNCONDITIONALLY — replaying an already-merged batch is mathematically
a no-op, and (unlike the replay-gated additive MG merge next door)
this means new data arriving under a reset/relocated checkpoint
(whose batch ids restart at 0) still enters the sketch. The batch-id
watermark only orders the snapshot bookkeeping: a pure replay leaves
existing snapshot dirs untouched; a replayed id that carried new data
rewrites its snapshot to the state it just produced.

Reference parity note: the reference service has no streaming
analytics; this belongs to the training-data-pipeline surface the
brief requires beyond parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.sketches import HASH_SPACE, hash60
from ..sources.catalog import Catalog

STATE = "kmv_state"

_STATE_SCHEMA = "h long, last_batch long"


def _load_state(cat: Catalog):
    """(sorted minima list, last_batch); empty for a fresh stream. A
    corrupt table degrades to empty — loudly, matching the registry
    streams' never-silently convention."""
    df = cat.load_or_none(STATE)
    if df is None:
        if cat.exists(STATE):
            import logging

            logging.getLogger(__name__).warning(
                "KMV state table unreadable; restarting the sketch "
                "from empty (history minima are lost)"
            )
        return [], -1
    rows = df.collect()  # <= k rows by construction
    if not rows:
        return [], -1
    # a single h=None row is the empty-summary placeholder that still
    # carries last_batch
    return (
        sorted(r["h"] for r in rows if r["h"] is not None),
        rows[0]["last_batch"],
    )


def _estimate(minima: list[int], k: int) -> int:
    if not minima:
        return 0
    if len(minima) < k:
        return len(minima)
    return (k - 1) * HASH_SPACE // minima[-1]


def stream_kmv_distinct(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    key_col: str = "key",
    k: int = 64,
    schema: str = "key string",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuously sketch an arriving key directory. Returns the
    StreamingQuery. Per-batch snapshot rows (one row):
    (n_kept, kth_min, est_distinct) for the WHOLE history so far."""
    if k < 2:
        raise ValueError("k must be >= 2")
    cat = Catalog(spark, state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        minima, last_batch = _load_state(cat)

        # ALWAYS merge: a KMV merge is a set union, so replaying an
        # already-merged batch is mathematically a no-op — and gating
        # the merge on the batch-id watermark would silently DROP new
        # data that arrives under a reset/relocated checkpoint (its
        # batch ids restart at 0 <= last_batch). Unlike the MG sketch
        # next door (whose additive merge must be replay-gated), the
        # watermark here only orders the snapshot bookkeeping.
        batch_min = [
            r["h"]
            for r in (
                batch_df.where(F.col(key_col).isNotNull())
                .select(hash60(F.col(key_col)).alias("h"))
                .distinct()
                .orderBy(F.col("h").asc())
                .limit(k)
                .collect()
            )
        ]
        merged = sorted(set(minima) | set(batch_min))[:k]
        changed = merged != minima
        new_watermark = max(last_batch, batch_id)
        if changed or batch_id > last_batch:
            minima = merged
            state_df = spark.createDataFrame(
                [(h, new_watermark) for h in (minima or [None])],
                _STATE_SCHEMA,
            )
            # atomic replace: minima + watermark commit together
            cat.replace(state_df, STATE)

        # a pure replay (state unchanged) leaves an existing snapshot
        # untouched; when a replayed id DID carry new data (reset
        # checkpoint), the state after this call IS that batch's
        # snapshot, so overwriting is the consistent choice
        out_path = os.path.join(output_dir, f"batch={batch_id}")
        if changed or not os.path.exists(out_path):
            spark.createDataFrame(
                [(
                    len(minima),
                    minima[-1] if minima else None,
                    _estimate(minima, k),
                )],
                "n_kept long, kth_min long, est_distinct long",
            ).write.mode("overwrite").parquet(out_path)

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


def read_kmv_output(
    spark: SparkSession, output_dir: str, batch: int | None = None
) -> DataFrame:
    """The cardinality snapshot for one batch dir (default: latest)."""
    if batch is None:
        ids = [
            int(d.split("=", 1)[1])
            for d in os.listdir(output_dir)
            if d.startswith("batch=")
        ]
        if not ids:
            raise FileNotFoundError(
                f"no batch=<id> output dirs under {output_dir!r} — "
                "has the KMV stream produced a batch yet?"
            )
        batch = max(ids)
    return spark.read.parquet(os.path.join(output_dir, f"batch={batch}"))
