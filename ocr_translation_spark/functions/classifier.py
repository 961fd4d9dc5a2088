"""Hashed-feature linear quality classifier (fastText-style scoring).

Every production LLM curation pipeline runs a cheap linear classifier
over hashed bag-of-words(+bigram) features to score document quality
(the GPT-3/CCNet "looks like reference text" filter). The expensive
part at 100 TB is NOT the model — it is moving text into Python. This
implementation keeps the entire score row-local and JVM-side:

  tokens  = split(text)                    (codegen)
  h(tok)  = first 5 hex chars of sha256    (codegen, ONE per token)
  w_uni   = h % n_buckets - n_buckets//2   (codegen)
  w_bi    = (31*h1 + h2) % n_buckets - n_buckets//2  (arithmetic mix
            of the two token hashes: no second sha256, no pair-string
            allocation)
  logit   = aggregate(unigrams) + aggregate(bigram mixes)  (codegen)

ZERO shuffles, ZERO Python crossings, exact BIGINT arithmetic — so the
DuckDB oracle is bit-identical and the plan is a pure map at any
scale. Swapping in real trained weights is a broadcast-join of a
(bucket, weight) table against the exploded features — same shape, one
map-side broadcast; the hash-derived weights here make the operator
self-contained and deterministically verifiable.

Reference parity note: the reference has no classifier stage; this is
part of the training-data-pipeline surface the brief requires beyond
reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tok_hash(tok: Column) -> Column:
    """Leading 5 hex chars of sha256(token) as an integer in
    [0, 2^20). Portable: DuckDB spells it
    ('0x' || substr(sha256(s),1,5))::UBIGINT."""
    return F.conv(
        F.substring(F.sha2(tok, 256), 1, 5), 16, 10
    ).cast("long")


def hashed_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 2001,
    use_bigrams: bool = True,
) -> DataFrame:
    """(id, n_tokens, logit, keep): hashed unigram+bigram linear score.

    `keep` = logit > 0. With hash-uniform weights the keep rate is
    ~50% — a non-degenerate oracle target. `n_buckets` odd keeps the
    weight range sign-symmetric.
    """
    half = n_buckets // 2

    # Hash each token ONCE; unigram weights fold the hash directly,
    # bigram weights MIX adjacent token hashes arithmetically
    # ((31*h1 + h2) mod n) instead of hashing the concatenated pair —
    # half the sha256 work and no per-pair string allocation, with the
    # same hash-uniform weight distribution. h < 2^20 so 31*h1 + h2
    # < 2^25: no overflow anywhere near long range.
    #
    # The hash ARRAY is materialized as a named column in its own
    # projection, then referenced by attribute. Inlining it as a raw
    # expression into the bigram lambda would copy the whole
    # transform(toks, sha256) tree into EVERY element_at reference —
    # re-hashing all n tokens per bigram, O(n^2) sha256 per row
    # (measured 2.2x slower than the concat version it was meant to
    # beat). CollapseProject keeps multi-referenced non-trivial
    # projections separate, so the attribute form hashes each token
    # exactly once.
    hashed = df.withColumn(
        "__hs",
        F.transform(F.split(F.col(text_col), " +"), _tok_hash),
    )
    hs = F.col("__hs")
    n = F.size(hs)
    uni = F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: acc + (h % n_buckets) - half,
    )
    if use_bigrams:
        # sequence(1, n-1) DESCENDS when n < 2 — guard with when().
        pair_hashes = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.element_at(hs, i) * 31
                + F.element_at(hs, i + 1),
            ),
        ).otherwise(F.array().cast("array<long>"))
        bi = F.aggregate(
            pair_hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (h % n_buckets) - half,
        )
    else:
        bi = F.lit(0).cast("long")

    # Two-step projection: `keep` derives from the NAMED logit column
    # (attribute reference), not a second copy of the uni+bi
    # expression tree — lambda-bearing aggregates are excluded from
    # subexpression elimination, so an inline copy would run both
    # array aggregates twice per row.
    scored = hashed.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        (uni + bi).alias("logit"),
    )
    return scored.withColumn("keep", F.col("logit") > 0)
