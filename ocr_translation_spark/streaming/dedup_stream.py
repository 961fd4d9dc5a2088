"""Streaming ingest deduplication: the incremental twin of
``functions.dedup.exact_dedup``.

An LLM-training data pipeline dedups AT INGEST — every arriving batch
of documents is checked against everything ever seen, duplicates are
flagged against a stable canonical id, and the registry grows — rather
than re-running a full-corpus dedup per snapshot. Shape:

* ``readStream`` over a documents directory -> ``foreachBatch``;
* per batch: fingerprint (sha256 of normalized text — the same
  ``content_hash`` the batch operator and its DuckDB oracle use),
  claim unseen fingerprints with the batch-min doc_id, and MERGE the
  claims into a persisted registry (``Catalog.merge_cache``: O(new)
  appends, existing-wins — so a canonical id never changes once
  assigned, and crash-replays are idempotent);
* output: every input doc annotated ``(fp, canonical_id, is_dup)``,
  written to a ``batch=<id>`` dir with overwrite — re-running a batch
  after a crash rewrites the same dir instead of appending twice
  (exactly-once output at batch granularity).

At 100 TB the registry is a fingerprint-keyed table that one equi-join
probes per batch — the same single-shuffle shape as batch
``exact_dedup``, amortized over arrival instead of paid per snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.dedup import content_hash
from ..sources.catalog import Catalog

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

REGISTRY = "dedup_registry"


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    registry_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: str = DOCS_SCHEMA,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuously dedup an arriving documents directory. Returns the
    StreamingQuery. Output rows: (doc_id, fp, canonical_id, is_dup).

    Canonical assignment: the first batch to see a fingerprint claims
    it with that batch's min doc_id; later sightings are duplicates.
    When arrival order is doc_id-ordered this equals the batch
    operator's global-min survivor exactly (pinned by the parity
    test); under arbitrary arrival the canonical is the first-seen
    min — stable forever after, which is what an append-only corpus
    needs (a re-assigned canonical would re-label history).
    """
    cat = Catalog(spark, registry_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.select(
            F.col(id_col).alias("doc_id"),
            content_hash(F.col(text_col)).alias("fp"),
        ).persist()
        try:
            batch_min = b.groupBy("fp").agg(F.min("doc_id").alias("_claim"))
            reg = cat.load_cache(REGISTRY, "fp")
            if reg is None:
                claims = batch_min
            else:
                claims = batch_min.join(
                    reg.select("fp"), "fp", "left_anti"
                )
            cat.merge_cache(
                claims.select(
                    "fp", F.col("_claim").alias("canonical_id")
                ),
                REGISTRY,
                "fp",
            )
            # merged registry covers every fp in this batch
            reg2 = cat.load_cache(REGISTRY, "fp")
            out = b.join(reg2, "fp", "left").select(
                "doc_id",
                "fp",
                "canonical_id",
                (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
            )
            # overwrite the batch's own dir: crash-replay idempotent
            out.write.mode("overwrite").parquet(
                os.path.join(output_dir, f"batch={batch_id}")
            )
        finally:
            b.unpersist()

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


def read_dedup_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(output_dir).drop("batch")
