"""End-to-end extraction pipeline (stages A -> B -> C), Spark-first.

The distributed twin of ``semantics.extract_doc``; pytest asserts
span-sequence equality ``(kind, text, media_ref, order)`` per doc.

Physical shape (what .explain should show, and why it scales):

  main path   documents -> salted repartition -> LEFT JOIN the per-doc
              OCR map (broadcast when the distinct-media set is small,
              sort-merge + AQE skew-join otherwise) -> one codegen
              stage: patch OCR text into the span array (element_at),
              stage B strip (array filter), stage C translate (map
              literal), re-offset. Span arrays never explode.

  OCR side    documents -> project media REFS only (a few per doc) ->
              explode -> distinct -> semi-join the media side table ->
              sha2 dedup (+ optional cache join) -> mapInPandas OCR
              over DISTINCT payloads (stage A) -> regroup to a per-doc
              ref->text map (tiny rows).

Shuffle budget: distinct(media_ref) + the tiny per-doc map regroup +
the explicit entry repartition. With a broadcastable OCR map the main
path is a single narrow codegen stage after the repartition; text-only
docs pay one broadcast-probe and nothing else. OCR cost is per
distinct payload — document fan-in and media-heavy skew cannot
concentrate compute (see operators/partitioning.py for salting).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.partitioning import media_weight, salted_repartition
from .operators.stage_a_ocr import ocr_distinct_media
# (strip_boilerplate stays available as a standalone operator; the
# pipeline uses the fused token path below)

SPAN_STRUCT = "struct<kind:string,text:string,media_ref:string,offset:int>"
OUT_SCHEMA = f"doc_id string, spans array<{SPAN_STRUCT}>"


class ExtractResult(NamedTuple):
    result: DataFrame
    new_ocr_cache: DataFrame  # (h, ocr_text) — MERGE into the cache table


def _sort_spans_by_offset(spans_col):
    # STABLE sort on an (offset, original-index, span) key-prefix
    # struct: natural struct ordering is codegen'd, unlike a comparator
    # lambda which is evaluated interpreted per comparison. The index
    # tie-break matters for parity: the golden spec uses Python's
    # STABLE sorted(key=offset), so two spans sharing an offset (legal
    # input even though datagen never produces it) must keep their
    # input order — a bare (offset, span) key would reorder them by
    # span content instead.
    keyed = F.transform(
        spans_col,
        lambda s, i: F.struct(
            s["offset"].alias("o"), i.alias("i"), s.alias("s")
        ),
    )
    return F.transform(F.array_sort(keyed), lambda x: x["s"])


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


def extract(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame | None = None,
    *,
    ocr_cache: DataFrame | None = None,
    use_cache: bool = True,
    cache_flag_col: str | None = None,
    num_partitions: int | None = None,
    salt_buckets: int = 8,
    broadcast_ocr: bool = False,
    pre_partitioned: bool = False,
) -> ExtractResult:
    """Run the full extraction over ``docs(doc_id, spans)``.

    ``media(media_ref, media_bytes)`` is the side table for stage A;
    pass None for corpora with no media payloads (stage A is skipped,
    media spans keep text=null — same as an unresolvable ref).
    ``broadcast_ocr``: optional explicit broadcast HINT for the
    DISTINCT-media ocr_side join. Default False — the scale-safe
    declarative plan: AQE auto-upgrades the join to broadcast at
    runtime when the side is genuinely small, while an explicit hint
    on a large distinct-media set forces a single-threaded driver
    build (a fixed serial cost that caps scaling efficiency — measured
    ~10s at 1M distinct media). Set True only when you KNOW the
    distinct-media set is small and want to skip AQE's first shuffle
    pass. The per-doc resolved map is never broadcast (it scales with
    the corpus).
    ``cache_flag_col``: optional per-doc boolean column — the
    reference's per-request ``cached`` flag (controllers/pdf.js:38):
    docs with False get FRESHLY computed OCR even on a cache hit (and
    never a possibly-stale cached value); the store stays
    unconditional either way.
    """
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    flag = (
        F.coalesce(F.col(cache_flag_col), F.lit(True))
        if cache_flag_col is not None
        else F.lit(True)
    )
    docs = docs.select(
        "doc_id",
        _sort_spans_by_offset(F.col("spans")).alias("spans"),
        flag.alias("_use_cache"),
    )

    if media is None:
        resolved = None
        new_cache = spark.createDataFrame([], "h string, ocr_text string")
    else:
        # OCR side: explode ONLY the media refs (a few per doc) from the
        # un-repartitioned input — text spans never leave their array.
        refs_per_doc = docs.select(
            "doc_id",
            "_use_cache",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.filter(
                            F.col("spans"),
                            lambda s: (s["kind"] == F.lit("media"))
                            & s["media_ref"].isNotNull(),
                        ),
                        lambda s: s["media_ref"],
                    )
                )
            ).alias("media_ref"),
        )
        if cache_flag_col is None:
            needed_refs = refs_per_doc.select("media_ref").distinct()
            media_needed = media.join(needed_refs, "media_ref", "left_semi")
            ocr_results, new_cache = ocr_distinct_media(
                media_needed, ocr_cache_df=ocr_cache, use_cache=use_cache
            )
            ocr_side = ocr_results.select("media_ref", "ocr_text")
            pick = F.struct(
                "media_ref", F.col("ocr_text").alias("_text")
            )
        else:
            # a ref needs a fresh compute if ANY doc using it opted out
            needed_refs = refs_per_doc.groupBy("media_ref").agg(
                F.max(~F.col("_use_cache")).alias("_fresh")
            )
            media_needed = media.join(needed_refs, "media_ref")
            ocr_results, new_cache = ocr_distinct_media(
                media_needed,
                ocr_cache_df=ocr_cache,
                use_cache=use_cache,
                fresh_col="_fresh",
            )
            ocr_side = ocr_results.select(
                "media_ref", "ocr_text", "ocr_text_fresh"
            )
            # per-request routing: cached=True docs take the
            # cache-preferred value, cached=False docs the fresh one
            pick = F.struct(
                "media_ref",
                F.when(F.col("_use_cache"), F.col("ocr_text"))
                .otherwise(F.col("ocr_text_fresh"))
                .alias("_text"),
            )
        if broadcast_ocr:
            ocr_side = F.broadcast(ocr_side)
        # Per-doc ref->text map: tiny rows through the regroup shuffle.
        # NEVER broadcast `resolved` — it has one row per media-bearing
        # document, so its size scales with the CORPUS, not with the
        # distinct-media set; a driver-side broadcast build OOMs at
        # scale. It goes through a shuffle join; AQE still picks a
        # broadcast join at runtime when the map is genuinely small.
        resolved = (
            refs_per_doc.join(ocr_side, "media_ref", "left")
            .groupBy("doc_id")
            .agg(
                F.map_from_entries(F.collect_list(pick)).alias("_ocr")
            )
        )

    # Explicit shuffle boundary (the reference's queue hop): balances
    # byte-skewed inputs for the codegen stage and the output write.
    # ``pre_partitioned``: the input is ALREADY hash-distributed on
    # doc_id (a bucketed table / Iceberg bucket partition) — skip the
    # full-corpus repartition entirely; with a bucketed source the
    # per-doc OCR-map join needs no shuffle and no sort on the big
    # side, which is the layout a 100 TB deployment would use.
    if pre_partitioned:
        main = docs.select("doc_id", "spans")
    else:
        main = salted_repartition(
            docs.withColumn("_w", media_weight("spans")),
            num_partitions,
            key_col="doc_id",
            weight_col="_w",
            salt_buckets=salt_buckets,
            single_row_keys=True,  # one row per doc_id at the entry hop
        ).select("doc_id", "spans")

    if resolved is None:
        all_docs = main
    else:
        all_docs = main.join(resolved, "doc_id", "left").select(
            "doc_id",
            F.transform(
                F.col("spans"),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    F.when(
                        (s["kind"] == F.lit("media"))
                        & s["media_ref"].isNotNull(),
                        F.coalesce(
                            F.element_at(F.col("_ocr"), s["media_ref"]),
                            s["text"],
                        ),
                    )
                    .otherwise(s["text"])
                    .alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )

    # Stages B + C + re-offset fused into ONE expression chain that
    # tokenizes each span EXACTLY ONCE: an inner transform materializes
    # the Python-split token array into the span struct (a nested
    # transform node is evaluated once per row — the per-element
    # re-evaluation hazard applies to outer subtrees referenced inside
    # lambdas, not to the lambda's own input), the keep filter and the
    # dictionary translation then both read that array. The unfused
    # strip_boilerplate + translate_spans operators (same semantics,
    # used standalone and by tests) tokenize 3x per span — measured
    # ~25% slower end-to-end on the extraction headline after the
    # whitespace-parity fix priced tokenization up.
    from .operators.stage_b_boiler import keep_from_tokens, py_tokens_strict
    from .operators.stage_c_translate import translate_tokens

    toked = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            py_tokens_strict(s["text"]).alias("toks"),
        ),
    )
    kept = F.filter(
        toked, lambda t: keep_from_tokens(t["kind"], t["text"], t["toks"])
    )
    spans_out = F.transform(
        kept,
        lambda t, i: F.struct(
            t["kind"].alias("kind"),
            F.when(t["text"].isNull(), None)
            .otherwise(translate_tokens(t["toks"]))
            .alias("text"),
            t["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    result = all_docs.select("doc_id", spans_out.alias("spans"))
    return ExtractResult(result, new_cache)
