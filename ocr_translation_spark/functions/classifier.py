"""Hashed-feature linear quality classifier (fastText-style scoring).

Every production LLM curation pipeline runs a cheap linear classifier
over hashed bag-of-words(+bigram) features to score document quality
(the GPT-3/CCNet "looks like reference text" filter). The expensive
part at 100 TB is NOT the model — it is moving text into Python. This
implementation keeps the entire score row-local and JVM-side:

  tokens  = split(text)                   (codegen)
  feature = first 5 hex chars of sha256   (codegen)
  weight  = (hex_as_int % n_buckets) - (n_buckets // 2)   (codegen)
  logit   = aggregate(tokens ++ bigrams, 0L, acc + weight)  (codegen)

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


def _hash_weight(tok: Column, n_buckets: int) -> Column:
    """Deterministic signed integer weight for a token: interpret the
    leading 5 hex chars of sha256(token) as an int, fold into
    [-n_buckets//2, n_buckets - n_buckets//2). Portable: DuckDB spells
    it ('0x' || substr(sha256(s),1,5))::UBIGINT % n - n//2."""
    h = F.conv(F.substring(F.sha2(tok, 256), 1, 5), 16, 10).cast("long")
    return (h % F.lit(n_buckets)) - F.lit(n_buckets // 2)


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
    toks = F.split(F.col(text_col), " +")
    n = F.size(toks)

    def _w(tok: Column) -> Column:
        return _hash_weight(tok, n_buckets)

    uni = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + _w(t)
    )
    if use_bigrams:
        # sequence(1, n-1) DESCENDS when n < 2 — guard with when().
        bigrams = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat(
                    F.element_at(toks, i),
                    F.lit(" "),
                    F.element_at(toks, i + 1),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        bi = F.aggregate(
            bigrams, F.lit(0).cast("long"), lambda acc, t: acc + _w(t)
        )
    else:
        bi = F.lit(0).cast("long")

    logit = (uni + bi).alias("logit")
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        logit,
        ((uni + bi) > 0).alias("keep"),
    )
