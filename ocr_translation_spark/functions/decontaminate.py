"""Eval-benchmark n-gram decontamination of a training corpus.

Exact-match decontamination (``bloom.bloom_anti_join``) only catches a
training document that IS an eval document.  The published standard
for pretraining corpora is stricter: GPT-3 (appendix C), The Pile and
PaLM flag a training document as *contaminated* if it shares any word
``n``-gram (8-13 words) with any eval-benchmark document — a leaked
test question quoted inside an otherwise-original page must still be
caught.  This module is that check as a distributed report:

for every training document ``(id, n_tokens, n_grams,
n_hit_positions, n_hit_grams, n_eval_docs_hit, contaminated)``.

Spark shape, and why it holds at 100 TB:

* The eval side is a *benchmark suite* — millions of grams, not
  billions — so its distinct ``(gram, eval_id)`` table is broadcast
  (``broadcast_eval=True``, the default); the training corpus is then
  ONE narrow scan: row-local tokenize + gram explode feeding a
  broadcast hash join.  No corpus-wide shuffle of any kind touches
  clean documents.
* Only the *hit* rows (gram occurrences that matched an eval gram —
  by construction a tiny fraction of the corpus, or the corpus is
  unusable anyway) reach the per-document aggregate; the three
  distinct-counts expand only those rows.
* The final stats-vs-hits join is keyed on the doc id with the hit
  rollup as the (small) right side — AQE picks a broadcast join when
  it fits and degrades to a shuffled join, never wrong, when a
  pathological corpus makes the hit set large.
* All logic is exact string/integer work, so the DuckDB twin in
  ``__spark_entry__.oracle_sql()`` is bit-exact.

Reference parity: the reference pipeline has no corpus-level
decontamination (it is a per-document OCR/translate service); this is
one of the training-data-pipeline operators the build brief requires
beyond the reference's own surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalized_text, tokens, word_grams


def _safe_tokens(text_col: str):
    """Token array of the normalized text; [] (not ['']) for blank."""
    t = F.col(text_col)
    return F.when(
        F.trim(t) == "", F.array().cast("array<string>")
    ).otherwise(tokens(normalized_text(t)))


def ngram_decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    k: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-training-document eval-overlap report.

    Returns one row per ``train`` document:

    * ``n_tokens`` / ``n_grams`` — tokenization accounting
      (``n_grams = max(n_tokens - k + 1, 0)``);
    * ``n_hit_positions`` — distinct gram start positions whose gram
      occurs in ANY eval document (how much of the document leaks);
    * ``n_hit_grams`` — distinct leaked gram strings;
    * ``n_eval_docs_hit`` — distinct eval documents sharing a gram
      (one leaked question vs a whole leaked benchmark);
    * ``contaminated`` — ``n_hit_positions > 0``, the GPT-3 drop rule.

    ``broadcast_eval=False`` falls back to a shuffled join for an
    eval side too large to broadcast; semantics are identical.
    """
    tb = train.select(
        F.col(id_col).alias("_id"), _safe_tokens(text_col).alias("t")
    )
    stats = tb.select(
        "_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.greatest(F.size("t") - F.lit(k - 1), F.lit(0))
        .cast("long")
        .alias("n_grams"),
    )
    eval_grams = (
        evalset.select(
            F.col(eval_id_col).alias("_eid"),
            F.explode(
                F.array_distinct(
                    word_grams(_safe_tokens(eval_text_col), k)
                )
            ).alias("gram"),
        )
        # distinct per (gram, eval doc): within-eval-doc repetition
        # must not multiply hit rows
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    train_grams = tb.select(
        "_id",
        F.posexplode(word_grams(F.col("t"), k)).alias("gpos", "gram"),
    )
    hits = train_grams.join(eval_grams, "gram")
    per_doc = hits.groupBy("_id").agg(
        F.countDistinct("gpos").cast("long").alias("n_hit_positions"),
        F.countDistinct("gram").cast("long").alias("n_hit_grams"),
        F.countDistinct("_eid").cast("long").alias("n_eval_docs_hit"),
    )
    return stats.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "n_grams",
        F.coalesce("n_hit_positions", F.lit(0).cast("long")).alias(
            "n_hit_positions"
        ),
        F.coalesce("n_hit_grams", F.lit(0).cast("long")).alias(
            "n_hit_grams"
        ),
        F.coalesce("n_eval_docs_hit", F.lit(0).cast("long")).alias(
            "n_eval_docs_hit"
        ),
        F.col("n_hit_positions").isNotNull().alias("contaminated"),
    )
