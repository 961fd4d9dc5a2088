"""Corpus-trained bigram language-model fluency scoring.

CCNet (and the LLaMA/Falcon data pipelines after it) rank web
documents by the perplexity of a small n-gram language model and keep
the most "fluent" tail.  The Spark-native recipe: train the n-gram
counts on the corpus itself (two hash aggregates), then score every
document against the trained table with add-one smoothing:

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 .) + V)

where ``c(w1 w2)`` is the corpus bigram count, ``c(w1 .)`` the count
of ``w1`` as a bigram prefix, and ``V`` the corpus vocabulary size.

The per-document score is the **mean smoothed transition
probability** (arithmetic mean of ``P``), kept in exact integer
arithmetic: each ``P`` is materialised as
``((c12 + 1) * 1_000_000) div (c1 + V)`` — a bigint — and summed
exactly, so the DuckDB twin in ``__spark_entry__.oracle_sql()`` is
bit-for-bit reproducible at any parallelism.  (True perplexity is the
*geometric* mean, ``exp(mean log P)`` — a one-line change — but log
sums are irrational and aggregation-order-sensitive, which breaks
this repo's exact-oracle convention; the arithmetic mean ranks
fluency the same direction and filters the same tail.)

Spark shape, and why it holds at 100 TB:

* Both count tables shrink the corpus to its *type* inventory
  (unigram/bigram vocabulary) via map-side partial hash aggregation —
  the classic word-count shape; keys are uniform under hashing.
* The model table (bigram type -> (c12, c1)) is vocabulary-sized.  On
  English web text that is 1e8-1e9 rows — too big to broadcast, so
  the scoring probe stays a shuffled equi-join on the gram key; on
  smaller vocabularies AQE broadcasts it automatically.  Either way
  the corpus side is exploded AFTER column pruning and shuffles only
  (doc_id, gram).
* The final per-document reduction is one hash aggregate on the doc
  id.  No window, no sort, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .passage import _safe_tokens
from .text import word_grams

_SCALE = 1_000_000


def bigram_lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bigrams, sum_p_micro, mean_p_micro): corpus-trained
    smoothed bigram transition scores per document.

    ``mean_p_micro`` is ``sum_p_micro div n_bigrams`` — the mean
    transition probability in micro-units, kept in INTEGER division
    because a rounded double ratio here lands on exact .5 ties
    constantly (the numerator is itself micro-scaled), and
    Spark/DuckDB disagree on double round-half ties.  Documents with
    fewer than 2 tokens score (0, 0, 0).
    """
    base = df.select(
        F.col(id_col).alias("_id"), _safe_tokens(text_col).alias("t")
    )
    ex = base.select(F.explode("t").alias("w"))
    vsize = ex.agg(F.count_distinct("w").alias("V"))

    # explode_outer keeps gram-less documents (<2 tokens) as one
    # null-gram row, so the per-doc re-aggregation already covers every
    # input document — no third corpus scan + doc_id re-join to restore
    # them afterwards.
    bi = base.select(
        "_id", F.explode_outer(word_grams(F.col("t"), 2)).alias("gram")
    )
    bic = (
        bi.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    pre = (
        bic.withColumn("w1", F.substring_index("gram", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    model = bic.join(
        pre, F.substring_index(bic["gram"], " ", 1) == pre["w1"]
    ).select("gram", "c12", "c1")

    scored = (
        bi.join(model, "gram", "left")  # null gram matches nothing
        .crossJoin(F.broadcast(vsize))
        .select(
            "_id",
            "gram",
            F.expr(
                f"CAST((c12 + 1) * {_SCALE} DIV (c1 + V) AS BIGINT)"
            ).alias("p_micro"),
        )
    )
    per = scored.groupBy("_id").agg(
        F.count("gram").alias("n_bigrams"),  # non-null grams only
        F.coalesce(F.sum("p_micro"), F.lit(0)).alias("sum_p_micro"),
    )
    return per.select(
        F.col("_id").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("sum_p_micro").cast("long").alias("sum_p_micro"),
        F.when(F.col("n_bigrams") == 0, F.lit(0))
        .otherwise(F.expr("sum_p_micro DIV n_bigrams"))
        .cast("long")
        .alias("mean_p_micro"),
    )
