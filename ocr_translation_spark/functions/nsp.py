"""BERT-style next-sentence-prediction pair generation.

The second training-example constructor (beside T5 span corruption in
corruption.py): from each document's non-overlapping word-window
segments, emit (seg_a, seg_b, is_next) pairs — 50/50 (by hash) the
true next segment vs the FIRST segment of a hash-drawn partner
document (BERT, Devlin et al. NAACL'19: "50% of the time B is the
actual next sentence ... 50% of the time it is a random sentence from
the corpus").

Everything is a pure function of (doc_id, segment index): the
positive/negative coin and the negative's partner document are
sha256-derived, so output is deterministic, partition-layout
invariant, and DuckDB-twin-reproducible — the property that lets a
training set be re-materialized identically by any engine.

Spark shape, and why it holds at 100 TB:
* segmentation is the chunk_documents map stage (row-local sequence +
  slice + posexplode — no shuffle, no skew);
* positives need NO join at all: the next segment comes from a
  ``lead()`` window over (doc, segment index) — ONE corpus shuffle on
  the uniform doc id;
* negatives are ONE equi-join of the hash-partnered rows against the
  per-doc first-segment relation, keyed on the sha-uniform partner id
  (never a random shuffle, never a driver-side sample);
* a negative whose partner document has no non-empty segment is
  dropped (deterministically — blank partners are visible to both
  engines); positives are unaffected.

Contract: like the repo's derived link graph (_sha_link_edges),
partner drawing folds hashes into a contiguous ``[0, n_docs)`` id
space; ``n_docs`` is a driver-side scalar of the same kind the
quality-decile cutoffs use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import chunk_documents


def _sha60(col) -> F.Column:
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast(
        "long"
    )


def nsp_pairs(
    df: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 32,
) -> DataFrame:
    """(doc_id, pair_id, seg_a, seg_b, is_next): one pair per adjacent
    segment boundary; ``pair_id`` is the index of seg_a within its
    document. Requires contiguous ``[0, n_docs)`` ids (see module
    docstring)."""
    ch = chunk_documents(
        df,
        id_col=id_col,
        text_col=text_col,
        max_tokens=seg_words,
        overlap=0,
    ).filter(F.col("n_chunk_tokens") > 0)

    w = Window.partitionBy(id_col).orderBy("chunk_id")
    base = (
        ch.select(
            F.col(id_col),
            "chunk_id",
            "chunk_text",
            F.lead("chunk_text").over(w).alias("_next"),
        )
        .filter(F.col("_next").isNotNull())
    )
    coin = (
        _sha60(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("chunk_id").cast("string"),
            )
        )
        % 2
    )
    pos = base.filter(coin == 0).select(
        F.col(id_col),
        F.col("chunk_id").alias("pair_id"),
        F.col("chunk_text").alias("seg_a"),
        F.col("_next").alias("seg_b"),
        F.lit(True).alias("is_next"),
    )
    praw = (
        _sha60(
            F.concat(
                F.lit("n:"),
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("chunk_id").cast("string"),
            )
        )
        % n_docs
    )
    partner = F.when(
        praw == F.col(id_col), (praw + 1) % n_docs
    ).otherwise(praw)
    firsts = ch.filter(F.col("chunk_id") == 0).select(
        F.col(id_col).alias("_pid"),
        F.col("chunk_text").alias("_ftext"),
    )
    neg = (
        base.filter(coin == 1)
        .withColumn("_partner", partner)
        .join(firsts, F.col("_partner") == F.col("_pid"))
        .select(
            F.col(id_col),
            F.col("chunk_id").alias("pair_id"),
            F.col("chunk_text").alias("seg_a"),
            F.col("_ftext").alias("seg_b"),
            F.lit(False).alias("is_next"),
        )
    )
    return pos.unionByName(neg)
