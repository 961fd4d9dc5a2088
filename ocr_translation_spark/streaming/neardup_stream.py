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
* BOTH registries are written partitioned by a 2-hex-digit (256-way)
  key prefix (``p``), and every per-batch read is PRUNED to the
  partitions the batch actually probes: the band join reads only the
  batch's band-hash prefixes, the signature lookups read only the
  batch's / the candidates' fingerprint prefixes. Per-batch registry
  I/O therefore scales with the batch's bucket set, NOT the history
  size (the r3 scale hazard: ``load_cache`` re-read the whole history
  each micro-batch);
* candidates = banded equi-join of the batch's buckets against the
  registry buckets (never an all-pairs comparison); similarity is the
  standard MinHash ESTIMATE (fraction of matching signature
  components — the stream cannot re-shingle documents it no longer
  has, which is exactly why it stores signatures). An optional
  ``max_registry_bucket`` cap drops oversized REGISTRY buckets from
  candidate generation with a logged count (same contract as the
  batch operators' ``max_bucket_size``);
* survivorship is id-ordered like the batch operator's (id_a < id_b)
  pair convention: a doc is flagged against the best-estimate earlier
  (smaller canonical id) match at/above the threshold.

Output per input doc: (doc_id, fp, canonical_id, is_exact_dup,
near_dup_of, est_jaccard); ``near_dup_of`` is NULL when nothing
qualifies. Written per-batch with overwrite (exactly-once at batch
granularity).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_LOG = logging.getLogger("ocr_translation_spark.stream_near_dup")

from ..functions.dedup import (
    band_hash,
    content_hash,
    derive_banding,
    minhash_signature,
    shingles,
)
from ..sources.catalog import Catalog
from .dedup_stream import DOCS_SCHEMA

SIG_REGISTRY = "neardup_sig_registry"  # fp -> (canonical_id, sig), part by p
BAND_REGISTRY = "neardup_band_registry"  # k -> (band, band_hash, fp), part by p


def _prefix_part(c):
    """256-way partition key: first 2 hex digits of a sha256-hex value.
    A pure function of the registry key, so partition-dir pruning under
    existing-wins reads is exact (see Catalog.load_cache)."""
    return F.conv(F.substring(c, 1, 2), 16, 10).cast("int")


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
    max_registry_bucket: int | None = None,
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
        pinned = [b]  # every persisted df; released in the finally
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
            pinned.append(reps)
            # merge new fingerprints into both registries (existing
            # wins: canonical id + signature immutable once recorded),
            # partitioned by the 2-hex-digit key prefix for pruned reads
            cat.merge_cache(
                reps.select(
                    "fp", F.col("_claim").alias("canonical_id"), "sig"
                ).withColumn("p", _prefix_part(F.col("fp"))),
                SIG_REGISTRY,
                "fp",
                partition_by=("p",),
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
            ).persist()
            pinned.append(banded)
            cat.merge_cache(
                banded.select(
                    F.concat_ws(
                        "|", "band", "band_hash", "fp"
                    ).alias("k"),
                    "band",
                    "band_hash",
                    "fp",
                ).withColumn("p", _prefix_part(F.col("band_hash"))),
                BAND_REGISTRY,
                "k",
                partition_by=("p",),
            )

            # pruned loads: collect the batch's probed partition values
            # (<= 256 ints, driver-side metadata) and push them below
            # the existing-wins window so the scan touches only those
            # partition dirs — per-batch registry I/O is O(probed
            # buckets), not O(history)
            fp_ps = [
                r["p"]
                for r in b.select(
                    _prefix_part(F.col("fp")).alias("p")
                ).distinct().collect()
            ]
            # load_cache is None for a missing/unreadable registry
            # (e.g. the only batches so far were empty — a zero-row
            # parquet write leaves no readable footer — or the table
            # is corrupt). Cache-error contract: degrade to the
            # batch's OWN entries (exactly what a fresh registry would
            # contain for these fingerprints), never kill the stream.
            sig_mine = cat.load_cache(
                SIG_REGISTRY, "fp", where=F.col("p").isin(fp_ps)
            )
            if sig_mine is None:
                _LOG.warning(
                    "stream_near_dup: signature registry unreadable — "
                    "this micro-batch's own signatures stand in for "
                    "registry history (recall vs history is lost for "
                    "this batch; see cache-error contract)"
                )
                sig_mine = reps.select(
                    "fp", F.col("_claim").alias("canonical_id"), "sig"
                )
            else:
                sig_mine = sig_mine.drop("p")
            band_ps = [
                r["p"]
                for r in banded.select(
                    _prefix_part(F.col("band_hash")).alias("p")
                ).distinct().collect()
            ]
            band_reg = cat.load_cache(
                BAND_REGISTRY, "k", where=F.col("p").isin(band_ps)
            )
            if band_reg is not None:
                band_reg = band_reg.select(
                    "band", "band_hash", F.col("fp").alias("fp_reg")
                )
            else:
                # degraded registry: within-batch candidates only — a
                # recall reduction, so it is LOGGED like every other
                # drop (cap_buckets convention), never silent
                _LOG.warning(
                    "stream_near_dup: band registry unreadable — this "
                    "micro-batch is matched only against itself; all "
                    "historical near-dup recall is lost for this batch"
                )
                band_reg = banded.select(
                    "band", "band_hash", F.col("fp").alias("fp_reg")
                )
            if max_registry_bucket is not None:
                from ..functions._lsh_common import cap_buckets

                band_reg, _ = cap_buckets(
                    band_reg, ("band", "band_hash"), max_registry_bucket,
                    "stream_near_dup:registry",
                )
            # candidates: batch buckets x registry buckets (equi-join);
            # persisted so the candidate-prefix collect below does not
            # recompute the join
            cand = (
                banded.join(band_reg, ["band", "band_hash"])
                .filter(F.col("fp") != F.col("fp_reg"))
                .select("fp", "fp_reg")
                .dropDuplicates(["fp", "fp_reg"])
            ).persist()
            pinned.append(cand)
            reg_ps = [
                r["p"]
                for r in cand.select(
                    _prefix_part(F.col("fp_reg")).alias("p")
                ).distinct().collect()
            ]
            sig_theirs = cat.load_cache(
                SIG_REGISTRY, "fp", where=F.col("p").isin(reg_ps)
            )
            if sig_theirs is not None:
                sig_theirs = sig_theirs.drop("p")
            else:
                _LOG.warning(
                    "stream_near_dup: signature registry unreadable for "
                    "candidate partners — matching degrades to this "
                    "micro-batch's own signatures"
                )
                sig_theirs = reps.select(
                    "fp", F.col("_claim").alias("canonical_id"), "sig"
                )
            mine = sig_mine.select(
                "fp",
                F.col("canonical_id").alias("_my_id"),
                F.col("sig").alias("_my_sig"),
            )
            theirs = sig_theirs.select(
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
                    sig_mine.select("fp", "canonical_id"), "fp", "left"
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
            for d in pinned:
                try:
                    d.unpersist()
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
