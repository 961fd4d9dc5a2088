"""Raw media ingestion via Spark's binaryFile source (reference S3).

Reference parity: the filesystem demo source (``index.js:7`` reading
``./data/sample.png``) and the multipart upload sources (S1/S2) — in
batch form, media lands as files and is ingested into the ``media``
side table shape ``(media_ref, media_bytes, media_kind)`` with a
content-address ref (sha256 prefix, matching datagen's ``img_<sha8>``
convention).

At scale: binaryFile is a real FileFormat — partition pruning and
``pathGlobFilter`` pushdown apply; ``maxBytesPerTrigger``-style
batching is handled by file-split planning. One row per file; files
larger than a partition are still one row (media payloads should be
object-store blobs with refs when they exceed tens of MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

KNOWN_KINDS = ("png", "jpg", "jpeg", "gif", "webp", "tiff", "bin")


def ingest_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a directory of media files into the media-table shape."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    out = raw.select(
        F.concat(
            F.lit("img_"), F.substring(F.sha2(F.col("content"), 256), 1, 8)
        ).alias("media_ref"),
        F.col("content").alias("media_bytes"),
        F.when(ext.isin(list(KNOWN_KINDS)), ext)
        .otherwise("bin")
        .alias("media_kind"),
    )
    # Content addressing makes byte-identical files (file copies are
    # routine) the SAME ref — emitting both rows would violate the
    # media table's one-row-per-ref contract and abort extract() with
    # DUPLICATED_MAP_KEY at the per-doc map build. Collapse to one row
    # per ref; ties pick the max kind so the survivor is deterministic.
    # (The 8-hex-char ref keeps datagen's img_<sha8> convention; its
    # 32-bit birthday bound is ~65k distinct files — callers ingesting
    # more should ref by the full hash, and this collapse also converts
    # a prefix collision from a job-aborting crash into a droppable
    # duplicate.)
    survivor = F.max_by(
        F.struct("media_bytes", "media_kind"),
        # deterministic survivor even across genuine prefix collisions:
        # order by (kind, full content hash), take both fields from the
        # same winning row
        F.struct(F.col("media_kind"), F.sha2(F.col("media_bytes"), 256)),
    )
    return (
        out.groupBy("media_ref")
        .agg(survivor.alias("_s"))
        .select(
            "media_ref",
            F.col("_s.media_bytes").alias("media_bytes"),
            F.col("_s.media_kind").alias("media_kind"),
        )
    )
