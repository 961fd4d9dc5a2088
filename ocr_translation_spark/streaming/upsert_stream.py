"""Streaming CDC upsert materialization: maintain the CURRENT version
of a keyed table from an arriving change stream, merge-on-read style.

The missing sink between the append-only streams (dedup/sketch
outputs) and the batch snapshot differ (``functions/diff.py``): a
crawler or extraction pipeline emits (doc_id, seq, op, payload)
change rows — re-fetches, re-extractions, deletions — and downstream
consumers want "the latest live version of every document" as a
table. With a real Iceberg catalog this is ``MERGE INTO`` per
micro-batch; this module reproduces the LAYOUT that makes that cheap
at 100 TB, on the same catalog machinery the cache tables use:

* per micro-batch, the batch is reduced to its LATEST change per key
  (one in-batch window) and APPENDED as a ``batch=K`` delta dir,
  sub-partitioned by the 256-way sha-prefix bucket ``p`` of the key —
  write I/O is O(batch), never O(state), and the delta layout is
  prunable by key prefix exactly like the near-dup registries;
* the current state is resolved AT READ TIME (merge-on-read):
  last-writer-wins by (seq, delete-beats-upsert on ties, NUMERIC
  batch id, then a full-row hash as the final deterministic
  tie-break), tombstones filtered at the end.
  Point lookups prune to the key's ``p`` partition across delta dirs;
* when the delta count passes ``compact_every``, the resolved state
  (tombstones included — see below) is rewritten as a single
  ``base`` delta and the old dirs are dropped in one crash-safe
  directory swap (Catalog.replace) — the read cost is amortized back
  to O(1) dirs, the classic MoR compaction trade.

Idempotence / crash safety: replaying micro-batch K rewrites the same
``batch=K`` dir (overwrite mode), and last-writer-wins resolution is
idempotent under re-application — unlike an additive sketch merge, no
last-merged-batch bookkeeping is needed. A crash mid-compaction
leaves either the old dir set or the new one (directory swap).
Tombstones are RETAINED by compaction: the replay window after a
crash-before-checkpoint-commit can re-deliver the pre-compaction
batch; dropping the tombstone would let an older upsert in that
replayed delta resurrect a deleted key. (With checkpoint-committed
batch ids, age-based tombstone expiry is the standard production
refinement.)

Reference parity note: this is the batch-table materialization of the
reference's job-result store (GET /result/:jobId returns the LATEST
outcome for a job id, ``src/controllers/pdf.js:272-303``), rebuilt
as a streaming table maintenance operator.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

STATE = "upsert_state"
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def _prefix_part(c):
    """256-way partition bucket: first 2 hex chars of sha256(key)."""
    return F.substring(F.sha2(c.cast("string"), 256), 1, 2)


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, STATE)


def _heal(state_dir: str) -> None:
    """Finish an interrupted compaction swap: a crash between the two
    renames leaves the delta set stranded at the ``old`` name with
    nothing live — put it back. WRITER-ONLY (called from process()):
    a reader renaming/deleting directories would race the writer's
    own swap — see _read_deltas for the reader-side, read-only
    fallback."""
    root, old = _state_path(state_dir), _state_path(state_dir) + ".__old"
    if not os.path.exists(root) and os.path.exists(old):
        os.rename(old, root)
    shutil.rmtree(old, ignore_errors=True)


def _delta_root(state_dir: str) -> str | None:
    """The directory holding the live delta set. Readers land here:
    if the live root is missing mid-compaction-crash, fall back to
    the stranded ``old`` copy WITHOUT touching the filesystem (no
    renames, no deletes — only the stream's writer heals)."""
    root, old = _state_path(state_dir), _state_path(state_dir) + ".__old"
    if os.path.exists(root):
        return root
    if os.path.exists(old):
        return old
    return None


def _delta_dirs(state_dir: str) -> list[str]:
    root = _delta_root(state_dir)
    if root is None:
        return []
    return sorted(
        d for d in os.listdir(root)
        if d.startswith("batch=") or d.startswith("base=")
    )


def _delta_ord(name: str) -> int:
    """Numeric recency of a delta dir: batch id * 2, +1 for live batch
    dirs so a replayed ``batch=K`` outranks the ``base=K`` that
    already folded it (their rows agree; the order just has to be
    deterministic). A plain string sort would order 'batch=9' AFTER
    'batch=10' — the tie-break must be numeric."""
    kind, _, num = name.partition("=")
    return int(num) * 2 + (1 if kind == "batch" else 0)


def _resolve(changes: DataFrame, key_col: str, seq_col: str) -> DataFrame:
    """Last-writer-wins resolution: highest seq wins; a delete beats
    an upsert at equal seq (CDC convention: the delete is the later
    intent within a version); the NUMERIC delta id breaks cross-batch
    duplicates (later batch wins); a hash over the full row breaks
    exact same-batch duplicates deterministically (a CDC source may
    emit the same (key, seq, op) twice with different payloads — the
    winner must not depend on partition-arrival order, or replays
    persist a different row). Tombstones are KEPT — callers filter."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col).desc(),
        F.col("op").asc(),  # 'delete' < 'upsert'
        F.col("_delta").desc(),
        F.xxhash64(
            F.struct(*[c for c in changes.columns if c != "_delta"])
        ).desc(),
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _read_deltas(
    spark: SparkSession, state_dir: str, buckets: list[str] | None = None
) -> DataFrame | None:
    root = _delta_root(state_dir)
    dirs = _delta_dirs(state_dir)
    if root is None or not dirs:
        return None
    frames = []
    for d in dirs:
        df = spark.read.parquet(os.path.join(root, d))
        if buckets is not None:
            df = df.where(F.col("p").isin(buckets))
        frames.append(
            df.withColumn("_delta", F.lit(_delta_ord(d)).cast("long"))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def current_state(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    buckets: list[str] | None = None,
) -> DataFrame:
    """The materialized CURRENT table: latest live (non-deleted) row
    per key across all delta dirs. ``buckets`` prunes the scan to the
    given ``p`` partitions (point-lookup path: pass
    ``[sha256(key)[:2]]``)."""
    deltas = _read_deltas(spark, state_dir, buckets)
    if deltas is None:
        raise FileNotFoundError(f"no upsert state under {state_dir}")
    return (
        _resolve(deltas, key_col, seq_col)
        .where(F.col("op") != OP_DELETE)
        .drop("_delta", "op", "p")
    )


def stream_upsert(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    schema: str,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    compact_every: int = 8,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain the keyed table from a change-row stream. ``schema``
    describes the arriving files and must include ``key_col``,
    ``seq_col`` and ``op_col`` ('upsert' | 'delete'). Returns the
    StreamingQuery."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        _heal(state_dir)
        root = _state_path(state_dir)
        b = batch_df.where(F.col(key_col).isNotNull()).withColumn(
            "op", F.col(op_col)
        )
        # latest change per key WITHIN the batch; _delta constant here
        # (the row-hash tie-break handles same-batch duplicates)
        latest = _resolve(
            b.withColumn("_delta", F.lit(0).cast("long")), key_col, seq_col
        ).drop("_delta")
        (
            latest.withColumn("p", _prefix_part(F.col(key_col)))
            .write.mode("overwrite")  # replay rewrites the same dir
            .partitionBy("p")
            .parquet(os.path.join(root, f"batch={batch_id}"))
        )
        if len(_delta_dirs(state_dir)) > compact_every:
            # resolve EVERYTHING (tombstones kept, see module doc),
            # rewrite as ONE base delta, swap the dir set atomically.
            # The write into tmp fully materializes BEFORE any rename,
            # so the resolution never reads a half-moved source.
            resolved = _resolve(
                _read_deltas(spark, state_dir), key_col, seq_col
            ).drop("_delta")
            tmp, old = root + ".__tmp", root + ".__old"
            shutil.rmtree(tmp, ignore_errors=True)
            (
                resolved.write.mode("overwrite")
                .partitionBy("p")
                .parquet(os.path.join(tmp, f"base={batch_id}"))
            )
            os.rename(root, old)
            os.rename(tmp, root)
            shutil.rmtree(old, ignore_errors=True)

    reader = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("path", input_dir)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load()
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
