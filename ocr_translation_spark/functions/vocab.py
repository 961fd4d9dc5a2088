"""Corpus vocabulary construction and per-document OOV coverage.

A tokenizer-training / data-audit pipeline needs two passes:

1. **build the vocabulary** — global token frequencies, keep the top
   ``top_v`` (ties broken by token text so the cut is deterministic on
   any engine / partition count);
2. **score each document against it** — what fraction of the doc's
   token *occurrences* fall outside the vocabulary (OOV rate).  High
   OOV flags boilerplate/garbage/wrong-language docs; the corpus-level
   OOV mass tells you whether ``top_v`` is big enough.

Spark shape, and why it holds at 100 TB:

* Pass 1 is explode -> one hash aggregation keyed on the token (heavy
  hitters exist, but partial map-side aggregation collapses them
  before the shuffle — the shuffled rows are O(distinct tokens), not
  O(token occurrences)) -> a top-``top_v`` sort of the *aggregated*
  counts (|vocab| rows, trivially small).
* Pass 2 **broadcasts the vocabulary** (top_v rows by construction —
  a 50k-token vocab is ~1 MB) and probes it from the exploded corpus
  stream; the only shuffle is the per-doc re-aggregation on a uniform
  ``doc_id`` key.

Counting is exact-integer; the single double division is performed
identically by any IEEE engine, so the DuckDB twin is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalized_text, tokens


def _occurrences(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, tok) rows, one per token OCCURRENCE.  Blank documents are
    excluded here (split('') would yield a phantom '' token) and
    restored as 0-token rows by the caller's LEFT join."""
    toks = tokens(normalized_text(F.col(text_col)))
    return df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("_id"), F.explode(toks).alias("tok")
    )


def build_vocab(
    df: DataFrame,
    top_v: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top ``top_v`` tokens by corpus frequency: (tok, n_occ), ordering
    ties by token text so the vocabulary is deterministic."""
    counts = (
        _occurrences(df, id_col, text_col)
        .groupBy("tok")
        .agg(F.count("*").alias("n_occ"))
    )
    return counts.orderBy(F.col("n_occ").desc(), F.col("tok").asc()).limit(
        top_v
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per doc: ``n_tokens``, ``n_oov`` (occurrences outside ``vocab``),
    ``oov_rate`` (rounded to 6 dp; 0.0 for empty docs)."""
    voc = F.broadcast(
        vocab.select("tok").withColumn("_in_vocab", F.lit(1))
    )
    per_doc = (
        _occurrences(df, id_col, text_col)
        .join(voc, "tok", "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, df[id_col] == per_doc["_id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("n_oov").cast("double") / F.col("n_tokens"), 6
                )
            )
            .alias("oov_rate"),
        )
    )
