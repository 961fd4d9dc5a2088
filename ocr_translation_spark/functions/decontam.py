"""Benchmark decontamination via word n-gram overlap.

Training-data curation must drop (or at least flag) corpus documents
that overlap an evaluation benchmark — otherwise eval scores measure
memorization, not generalization.  The standard recipe (GPT-3 appendix
C / PaLM / Llama: exact n-gram collision against the eval set) is:

1. tokenize the benchmark docs, emit every word ``n``-gram, dedupe —
   this is the *contamination dictionary*;
2. for each corpus doc, count how many of its distinct ``n``-grams
   appear in the dictionary; any hit flags the doc.

Spark shape, and why it holds at 100 TB:

* The benchmark side is an **eval suite** — fixed small size (MBs of
  text, ~1e5-1e6 distinct grams) regardless of corpus scale, so the
  contamination dictionary is **broadcast**: the corpus-side scan
  streams through a broadcast-hash-join probe with ZERO shuffle of the
  (huge) exploded corpus grams.  The only shuffle is the per-doc
  re-aggregation keyed on ``doc_id`` — uniform by construction.
* Gram explosion happens AFTER column pruning (only ``id_col`` and the
  gram array survive the scan), so the corpus pass moves
  O(tokens) data, not O(row width).
* If a caller ever decontaminates against a benchmark too large to
  broadcast, the same code works with the hint dropped — Catalyst
  falls back to a shuffled hash join; semantics are unchanged.

All arithmetic is exact integer counting, so the DuckDB twin in
``__spark_entry__.oracle_sql()`` reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalized_text, tokens, word_grams


def doc_ngrams(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, gram) rows of DISTINCT word n-grams per document (distinct
    because contamination is a set-membership question — a gram hitting
    the dictionary twice is still one contaminated gram)."""
    toks = tokens(normalized_text(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_grams(toks, n))).alias("gram"),
    )


def benchmark_ngrams(
    bench: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The contamination dictionary: distinct n-grams over the whole
    benchmark (one column, ready to broadcast)."""
    return doc_ngrams(bench, n, id_col, text_col).select("gram").distinct()


def ngram_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus doc: ``n_grams`` (distinct grams), ``n_hits`` (grams
    also present in the benchmark), ``contaminated`` (any hit).

    Docs too short to produce a single n-gram (< n tokens) survive with
    0/0/false via the final LEFT join from the corpus ids.
    """
    dictionary = F.broadcast(
        benchmark_ngrams(bench, n, id_col, text_col).withColumn(
            "_hit", F.lit(1)
        )
    )
    per_doc = (
        doc_ngrams(corpus, n, id_col, text_col)
        .join(dictionary, "gram", "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_hit").alias("n_hits"),  # count() skips nulls
        )
    )
    return (
        corpus.select(F.col(id_col))
        .join(per_doc, corpus[id_col] == per_doc["_id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
