"""Streaming time-decayed trending top-k: the incremental twin of
``functions.timeseries.decayed_topk``.

A trending dashboard cannot re-scan the event history per micro-batch.
This operator's ONLY persisted state is per-key PER-DAY counts inside
the decay horizon — at most ``capacity x (horizon_days + 1)`` rows —
so the decayed score is recomputed EXACTLY at every batch:

    score(key, day_now) = sum over retained days d of
                          cnt(key, d) * (scale >> (day_now - d))

Keeping day buckets (not a pre-decayed running score) is what makes
the stream value-identical to the batch operator for retained keys:
aging a SUM by a shift truncates differently than summing per-event
shifts, so a running-score design would drift by up to one unit per
halving — the per-day form has no such drift, and late events land in
their own day bucket and decay correctly.

Bounds and trades, asserted in tests:

* Keys continuously retained since their first in-horizon event have
  EXACT scores (stream == batch parity).
* Eviction (rank > capacity at some batch) discards that key's
  history; if it returns, it restarts from zero — emitted scores are
  therefore LOWER BOUNDS of the true decayed score (dropping history
  only loses mass). An evicted key's lost mass was <= the
  capacity-th score at eviction time and halves every day after.
* Day buckets older than ``horizon_days`` contribute 0 by the batch
  operator's own definition and are pruned — state cannot grow with
  stream age.

Crash safety follows sketch_stream: the state table carries the last
merged batch id and is swap-replaced atomically (Catalog.replace), so
a crash-replayed micro-batch is a no-op merge; per-batch snapshot dirs
are overwrite-idempotent. The state dir and the stream checkpoint live
and die together.

Reference parity note: the reference service has no streaming
analytics; this belongs to the training-data-pipeline surface the
brief requires beyond parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import Catalog

STATE = "trend_state"

_STATE_SCHEMA = (
    "key string, day date, cnt long, as_of date, last_batch long"
)


def _load_state(cat: Catalog):
    """([(key, day, cnt)], as_of, last_batch); empty for a fresh
    stream — loudly on a corrupt table (the registry streams'
    convention). ``as_of`` is persisted explicitly: deriving it from
    retained buckets would roll event-time BACK whenever the only
    key carrying the newest day is evicted."""
    df = cat.load_or_none(STATE)
    if df is None:
        if cat.exists(STATE):
            import logging

            logging.getLogger(__name__).warning(
                "trending state table unreadable; restarting the "
                "decayed counts from empty (history is lost)"
            )
        return [], None, -1
    rows = df.collect()  # <= capacity * (horizon + 1) by construction
    if not rows:
        return [], None, -1
    return (
        [
            (r["key"], r["day"], r["cnt"])
            for r in rows
            if r["key"] is not None
        ],
        rows[0]["as_of"],
        rows[0]["last_batch"],
    )


def _scores(buckets, day_now, horizon_days, scale):
    """Exact decayed score per key from day buckets (driver-side over
    the capacity-bounded state)."""
    out: dict[str, int] = {}
    for k, d, c in buckets:
        age = (day_now - d).days
        if 0 <= age <= horizon_days:
            out[k] = out.get(k, 0) + c * (scale >> age)
        else:
            out.setdefault(k, 0)
    return out


def stream_decayed_topk(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    key_col: str = "key",
    ts_col: str = "ts",
    capacity: int = 64,
    horizon_days: int = 40,
    scale: int = 1_000_000_000_000,
    schema: str = "key string, ts timestamp",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuously rank a (key, ts) stream by exact decayed count.
    Returns the StreamingQuery. Per-batch snapshot rows:
    (key, decayed_score, as_of_day) — the top ``capacity`` keys."""
    if not 0 <= horizon_days <= 62:
        raise ValueError("horizon_days must be in [0, 62] (BIGINT shift)")
    cat = Catalog(spark, state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        buckets, as_of, last_batch = _load_state(cat)

        merged_this_call = batch_id > last_batch
        if merged_this_call:
            day_rows = (
                batch_df.select(
                    F.col(key_col).alias("key"),
                    F.to_date(ts_col).alias("day"),
                )
                .where(
                    F.col(key_col).isNotNull()
                    & F.col("day").isNotNull()
                )
                .groupBy("key", "day")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()  # O(batch distinct (key, day)) control rows
            )
            merged: dict[tuple, int] = {}
            for k, d, c in buckets:
                merged[(k, d)] = merged.get((k, d), 0) + c
            for r in day_rows:
                kd = (r["key"], r["day"])
                merged[kd] = merged.get(kd, 0) + r["cnt"]
            if merged:
                # event time only moves FORWARD (late batches cannot
                # rewind it), and it survives eviction of the key
                # that carried the newest day
                day_now = max(d for _, d in merged)
                if as_of is not None and as_of > day_now:
                    day_now = as_of
                as_of = day_now
                # prune: buckets past the horizon contribute 0 forever
                merged = {
                    (k, d): c
                    for (k, d), c in merged.items()
                    if (day_now - d).days <= horizon_days
                }
                flat = [(k, d, c) for (k, d), c in merged.items()]
                scores = _scores(flat, day_now, horizon_days, scale)
                keep = sorted(
                    scores, key=lambda k: (-scores[k], k)
                )[:capacity]
                keep_set = set(keep)
                buckets = [
                    (k, d, c) for k, d, c in flat if k in keep_set
                ]
            state_df = spark.createDataFrame(
                [
                    (k, d, c, as_of, batch_id)
                    for k, d, c in (buckets or [(None, None, None)])
                ],
                _STATE_SCHEMA,
            )
            cat.replace(state_df, STATE)

        out_path = os.path.join(output_dir, f"batch={batch_id}")
        if merged_this_call or not os.path.exists(out_path):
            if buckets and as_of is not None:
                scores = _scores(
                    buckets, as_of, horizon_days, scale
                )
                rows = [
                    (k, scores[k], as_of)
                    for k in sorted(
                        scores, key=lambda k: (-scores[k], k)
                    )
                ]
            else:
                rows = []
            spark.createDataFrame(
                rows, "key string, decayed_score long, as_of_day date"
            ).write.mode("overwrite").parquet(out_path)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    writer = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_trending_output(
    spark: SparkSession, output_dir: str, batch: int | None = None
) -> DataFrame:
    """The trending snapshot for one batch dir (default: latest)."""
    if batch is None:
        ids = [
            int(d.split("=", 1)[1])
            for d in os.listdir(output_dir)
            if d.startswith("batch=")
        ]
        if not ids:
            raise FileNotFoundError(
                f"no batch=<id> output dirs under {output_dir!r}"
            )
        batch = max(ids)
    return spark.read.parquet(
        os.path.join(output_dir, f"batch={batch}")
    )
