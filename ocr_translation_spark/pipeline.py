"""End-to-end extraction pipeline (stages A -> B -> C), Spark-first.

The distributed twin of ``semantics.extract_doc``; pytest asserts
span-sequence equality ``(kind, text, media_ref, order)`` per doc.

Physical shape (what .explain should show, and why it scales):

  documents ──┬─ no-media docs:   stage B+C as pure codegen array
              │                   expressions — ZERO shuffles, never
              │                   leaves the JVM.
              └─ media docs:      posexplode -> left join the per-ref
                                  OCR results (broadcast when small,
                                  AQE skew-join otherwise) -> groupBy
                                  doc_id collect -> order restore ->
                                  stage B+C codegen.
  media side table ── semi-join to referenced refs only -> sha2 dedup
                      -> (optional cache join) -> mapInPandas OCR over
                      DISTINCT payloads (stage A).

Shuffle budget: distinct(media_ref) + the per-doc regroup on the
media-docs branch only. Text-only docs (the overwhelming majority of a
web corpus) take the shuffle-free branch. OCR cost is per distinct
payload — document fan-in and media-heavy skew cannot concentrate
compute (see operators/partitioning.py for the salting discussion).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.partitioning import media_weight, salted_repartition
from .operators.stage_a_ocr import ocr_distinct_media
from .operators.stage_b_boiler import strip_boilerplate
from .operators.stage_c_translate import translate_spans

SPAN_STRUCT = "struct<kind:string,text:string,media_ref:string,offset:int>"
OUT_SCHEMA = f"doc_id string, spans array<{SPAN_STRUCT}>"


class ExtractResult(NamedTuple):
    result: DataFrame
    new_ocr_cache: DataFrame  # (h, ocr_text) — MERGE into the cache table


def _sort_spans_by_offset(spans_col):
    return F.array_sort(
        spans_col,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )


def _reoffset(spans_col):
    """Final re-enumeration: offset = array position 0..n-1."""
    return F.transform(
        spans_col,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def _has_media(spans_col="spans"):
    return F.exists(F.col(spans_col), lambda s: s["kind"] == F.lit("media"))


def extract(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame | None = None,
    *,
    ocr_cache: DataFrame | None = None,
    use_cache: bool = True,
    num_partitions: int | None = None,
    salt_buckets: int = 8,
    broadcast_ocr: bool = True,
) -> ExtractResult:
    """Run the full extraction over ``docs(doc_id, spans)``.

    ``media(media_ref, media_bytes)`` is the side table for stage A;
    pass None for corpora with no media payloads (stage A is skipped,
    media spans keep text=null — same as an unresolvable ref).
    ``broadcast_ocr``: hint the per-ref OCR result join as broadcast.
    Right at any scale where distinct-media x avg-text fits an executor
    (typical); set False to let sort-merge + AQE handle a huge distinct
    media set.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    docs = docs.select("doc_id", _sort_spans_by_offset(F.col("spans")).alias("spans"))
    # Explicit shuffle boundary (the reference's queue hop): balances
    # byte-skewed inputs before the branch split.
    docs = salted_repartition(
        docs.withColumn("_w", media_weight("spans")),
        num_partitions,
        key_col="doc_id",
        weight_col="_w",
        salt_buckets=salt_buckets,
    )

    text_docs = docs.filter(~_has_media()).select("doc_id", "spans")

    if media is None:
        media_docs_out = docs.filter(_has_media()).select("doc_id", "spans")
        new_cache = spark.createDataFrame([], "h string, ocr_text string")
    else:
        media_docs = docs.filter(_has_media()).select("doc_id", "spans")
        ex = media_docs.select(
            "doc_id", F.posexplode("spans").alias("pos", "s")
        )
        needed_refs = (
            ex.filter(F.col("s.kind") == "media")
            .select(F.col("s.media_ref").alias("media_ref"))
            .where(F.col("media_ref").isNotNull())
            .distinct()
        )
        media_needed = media.join(needed_refs, "media_ref", "left_semi")
        ocr_results, new_cache = ocr_distinct_media(
            media_needed, ocr_cache_df=ocr_cache, use_cache=use_cache
        )
        ocr_join = ocr_results.select("media_ref", "ocr_text")
        if broadcast_ocr:
            ocr_join = F.broadcast(ocr_join)
        joined = ex.join(
            ocr_join,
            (F.col("s.kind") == "media")
            & (F.col("s.media_ref") == ocr_join["media_ref"]),
            "left",
        )
        enriched = joined.select(
            "doc_id",
            "pos",
            F.struct(
                F.col("s.kind").alias("kind"),
                F.coalesce(F.col("ocr_text"), F.col("s.text")).alias("text"),
                F.col("s.media_ref").alias("media_ref"),
                F.col("s.offset").alias("offset"),
            ).alias("s"),
        )
        regrouped = enriched.groupBy("doc_id").agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "s"))
            ).alias("_ps")
        )
        media_docs_out = regrouped.select(
            "doc_id",
            F.transform(F.col("_ps"), lambda x: x["s"]).alias("spans"),
        )

    all_docs = text_docs.unionByName(media_docs_out)
    stripped = strip_boilerplate(all_docs)
    translated = translate_spans(stripped)
    result = translated.select(
        "doc_id", _reoffset(F.col("spans")).alias("spans")
    )
    return ExtractResult(result, new_cache)
