"""Corpus collocation mining and tokenizer-training pair statistics.

Two corpus-statistics operators a training-data pipeline runs before
tokenizer training / phrase-aware filtering:

* :func:`pmi_collocations` — PMI-style lift-ranked adjacent-bigram
  collocations ("new york", "machine learning"): the association-
  mining step behind phrase vocabularies and boilerplate phrase
  detection.
* :func:`bpe_pair_counts` — the counting step of one BPE merge round:
  adjacent symbol-pair frequencies weighted by word frequency, the
  inner loop of tokenizer training (Sennrich et al. 2016, public).

Scale shape (100 TB):

* Both operators reduce the corpus to term-keyed hash aggregates
  first; everything downstream runs over the VOCABULARY (orders of
  magnitude smaller than the corpus), which is the standard
  distributed-BPE optimization — per-merge work scales with distinct
  words, not corpus tokens.
* PMI's two unigram attachments are equi-joins on the term key
  (broadcast at small vocab, shuffle-hash at web vocab — uniform
  sha-distributed keys, no skew hazard beyond stopwords, which are
  exactly the high-count keys AQE handles).
* All scoring is EXACT integer arithmetic (DECIMAL(38,0) intermediate,
  truncating integral ``div``) so the DuckDB twin reproduces every
  value bit-for-bit — no float ranking ties that engines break
  differently.

Reference parity note: the reference service (hairbui76/ocr-translation)
has no corpus-statistics surface; this is training-data-pipeline
breadth beyond parity, per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalized_text

#: scale of the exact lift score: lift_micro = floor(1e6 * lift)
LIFT_SCALE = 1_000_000

_DEC = "decimal(38,0)"


def _clean_tokens(text: Column) -> Column:
    """Non-empty whitespace tokens of normalized text."""
    return F.filter(
        F.split(normalized_text(text), " "), lambda t: t != ""
    )


def adjacent_pairs(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (empty for <2
    tokens). zip_with evaluates its array inputs once — no per-index
    re-tokenization (see dedup.shingles for the Catalyst CSE note);
    zip_with pads the shorter side with NULL, so the final dangling
    (last_token, NULL) element is filtered out."""
    toks = _clean_tokens(text)
    n = F.size(toks)
    nxt = F.when(n > 1, F.slice(toks, 2, n - 1)).otherwise(
        F.array().cast("array<string>")
    )
    pairs = F.zip_with(
        toks, nxt, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    return F.filter(pairs, lambda p: p.getField("w2").isNotNull())


def pmi_collocations(
    df: DataFrame,
    min_count: int = 2,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-bigram collocations ranked by exact integer
    PMI lift.

    ``lift_micro = (c_xy * T * 1e6) div (c_x * c_y)`` — the PMI
    argument (p(x,y)/(p(x)p(y))) in micro-units, truncated: identical
    on any engine, unlike a float log-PMI whose ulp would reorder
    ties. Monotone in true PMI, so the RANKING is the PMI ranking.

    Exactness/overflow: intermediates are DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB); ``c_xy * T * 1e6 <= T^2 * 1e6`` stays inside
    38 digits to T ~ 1e16 tokens. The emitted BIGINT lift is bounded
    by ``T * 1e6 / min_count``; any production run uses min_count
    >= 100, keeping it inside long to T ~ 1e15.

    One explode + two hash aggregates + two term-keyed equi-joins +
    one broadcast scalar; top-k via TakeOrdered (no global sort).
    """
    uni = (
        df.select(F.explode(_clean_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.agg(F.sum("c").cast("long").alias("t_total"))
    pairs = (
        df.select(F.explode(adjacent_pairs(F.col(text_col))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    joined = (
        pairs.join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(total))
    )
    numer = (
        F.col("pair_count").cast(_DEC)
        * F.col("t_total").cast(_DEC)
        * F.lit(LIFT_SCALE).cast(_DEC)
    )
    denom = F.col("c1").cast(_DEC) * F.col("c2").cast(_DEC)
    return (
        joined.select(
            "w1",
            "w2",
            "pair_count",
            F.call_function("div", numer, denom)
            .cast("long")
            .alias("lift_micro"),
        )
        .orderBy(
            F.col("lift_micro").desc(),
            F.col("pair_count").desc(),
            "w1",
            "w2",
        )
        .limit(top_k)
    )


def bpe_pair_counts(
    df: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Adjacent character-pair frequencies weighted by word frequency —
    the count table one BPE merge round ranks (the merge itself picks
    the argmax row).

    The corpus collapses to ``(word, n_occurrences)`` FIRST (one
    term-keyed hash aggregate); pair explosion runs over DISTINCT
    words only — the distributed-BPE trick that makes per-merge cost
    scale with vocabulary, not corpus size. Pair generation is a
    row-local codegen transform over ``sequence(1, len-1)`` (guarded:
    Spark's ``sequence(1, 0)`` DESCENDS, so 1-char words take the
    empty-array branch instead).

    Output: (left, right, pair_count) top-k, count-desc then
    lexicographic — all exact BIGINT.
    """
    words = (
        df.select(F.explode(_clean_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    ln = F.length("word")
    pair_idx = F.when(ln >= 2, F.sequence(F.lit(1), ln - 1)).otherwise(
        F.array().cast("array<integer>")
    )
    pairs = F.transform(
        pair_idx,
        lambda i: F.struct(
            F.substring(F.col("word"), i, 1).alias("left"),
            F.substring(F.col("word"), i + 1, 1).alias("right"),
        ),
    )
    return (
        words.select(
            F.explode(pairs).alias("p"), F.col("n_occ")
        )
        .groupBy(
            F.col("p.left").alias("left"), F.col("p.right").alias("right")
        )
        .agg(F.sum("n_occ").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left", "right")
        .limit(top_k)
    )
