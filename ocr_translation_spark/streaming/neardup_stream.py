"""Streaming ingest NEAR-duplicate detection: the incremental twin of
``functions.dedup.minhash_near_dup_pairs``.

Each arriving batch is checked against every document ever seen using
a persisted MinHash-LSH registry — the shape a training-data ingest
actually needs (flag near-dups of anything in the corpus so far,
without re-running all-pairs dedup per snapshot):

* per batch, documents collapse to one representative per exact
  content fingerprint (the hot-bucket guard: a B-copy class probes the
  registry once, not B times);
* new fingerprints merge their minhash signature and banded bucket
  keys into two registry tables via O(new) existing-wins appends
  (``Catalog.merge_cache``) — a fingerprint's signature and canonical
  id never change once recorded, so crash replays are idempotent;
* candidates = banded equi-join of the batch's buckets against the
  registry buckets (never an all-pairs comparison); similarity is the
  standard MinHash ESTIMATE (fraction of matching signature
  components — the stream cannot re-shingle documents it no longer
  has, which is exactly why it stores signatures);
* survivorship is id-ordered like the batch operator's (id_a < id_b)
  pair convention: a doc is flagged against the best-estimate earlier
  (smaller canonical id) match at/above the threshold.

Output per input doc: (doc_id, fp, canonical_id, is_exact_dup,
near_dup_of, est_jaccard); ``near_dup_of`` is NULL when nothing
qualifies. Written per-batch with overwrite (exactly-once at batch
granularity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.dedup import (
    band_hash,
    content_hash,
    derive_banding,
    minhash_signature,
    shingles,
)
from ..sources.catalog import Catalog
from .dedup_stream import DOCS_SCHEMA

SIG_REGISTRY = "neardup_sig_registry"  # fp -> (canonical_id, sig)
BAND_REGISTRY = "neardup_band_registry"  # k -> (band, band_hash, fp)


def _sig_est(a, b, n_hashes: int):
    """Unbiased MinHash Jaccard estimate: matching-component fraction."""
    matches = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.round(matches / F.lit(float(n_hashes)), 6)


def stream_near_dup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    registry_dir: str,
    n_hashes: int = 32,
    bands: int | None = None,
    jaccard_threshold: float = 0.5,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: str = DOCS_SCHEMA,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuously flag near-duplicates against the whole history.
    Returns the StreamingQuery."""
    if bands is None:
        bands_, rpb = derive_banding(n_hashes, jaccard_threshold)
    else:
        assert n_hashes % bands == 0
        bands_, rpb = bands, n_hashes // bands
    cat = Catalog(spark, registry_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_text"),
            content_hash(F.col(text_col)).alias("fp"),
        ).persist()
        try:
            # one representative per exact-dup group in the batch
            reps = (
                b.groupBy("fp")
                .agg(
                    F.min("doc_id").alias("_claim"),
                    F.expr("min_by(_text, doc_id)").alias("_text"),
                )
                .withColumn(
                    "sig",
                    minhash_signature(
                        shingles(F.col("_text"), shingle_k), n_hashes
                    ),
                )
                .drop("_text")
                .persist()
            )
            # merge new fingerprints into both registries (existing
            # wins: canonical id + signature immutable once recorded)
            cat.merge_cache(
                reps.select(
                    "fp", F.col("_claim").alias("canonical_id"), "sig"
                ),
                SIG_REGISTRY,
                "fp",
            )
            banded = reps.select(
                "fp",
                F.posexplode(
                    F.array(
                        *[
                            band_hash(F.col("sig"), i, rpb)
                            for i in range(bands_)
                        ]
                    )
                ).alias("band", "band_hash"),
            )
            cat.merge_cache(
                banded.select(
                    F.concat_ws(
                        "|", "band", "band_hash", "fp"
                    ).alias("k"),
                    "band",
                    "band_hash",
                    "fp",
                ),
                BAND_REGISTRY,
                "k",
            )

            sig_reg = cat.load_cache(SIG_REGISTRY, "fp")
            band_reg = cat.load_cache(BAND_REGISTRY, "k").select(
                "band", "band_hash", F.col("fp").alias("fp_reg")
            )
            # candidates: batch buckets x registry buckets (equi-join)
            cand = (
                banded.join(band_reg, ["band", "band_hash"])
                .filter(F.col("fp") != F.col("fp_reg"))
                .select("fp", "fp_reg")
                .dropDuplicates(["fp", "fp_reg"])
            )
            mine = sig_reg.select(
                "fp",
                F.col("canonical_id").alias("_my_id"),
                F.col("sig").alias("_my_sig"),
            )
            theirs = sig_reg.select(
                F.col("fp").alias("fp_reg"),
                F.col("canonical_id").alias("_their_id"),
                F.col("sig").alias("_their_sig"),
            )
            scored = (
                cand.join(mine, "fp")
                .join(theirs, "fp_reg")
                # id-ordered survivorship: only earlier canonicals count
                .filter(F.col("_their_id") < F.col("_my_id"))
                .withColumn(
                    "est_jaccard",
                    _sig_est(
                        F.col("_my_sig"), F.col("_their_sig"), n_hashes
                    ),
                )
                .filter(F.col("est_jaccard") >= jaccard_threshold)
            )
            w = Window.partitionBy("fp").orderBy(
                F.col("est_jaccard").desc(), F.col("_their_id").asc()
            )
            best = (
                scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(
                    "fp",
                    F.col("_their_id").alias("near_dup_of"),
                    "est_jaccard",
                )
            )
            out = (
                b.select("doc_id", "fp")
                .join(
                    sig_reg.select("fp", "canonical_id"), "fp", "left"
                )
                .join(best, "fp", "left")
                .select(
                    "doc_id",
                    "fp",
                    "canonical_id",
                    (F.col("doc_id") != F.col("canonical_id")).alias(
                        "is_exact_dup"
                    ),
                    "near_dup_of",
                    "est_jaccard",
                )
            )
            out.write.mode("overwrite").parquet(
                os.path.join(output_dir, f"batch={batch_id}")
            )
        finally:
            b.unpersist()
            try:
                reps.unpersist()
            except Exception:
                pass

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
