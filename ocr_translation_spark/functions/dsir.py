"""DSIR-style importance-weighted data selection.

"Data Selection for Language Models via Importance Resampling" (Xie
et al., NeurIPS'23) selects pretraining documents whose hashed-n-gram
distribution looks like a small trusted *target* corpus: train bucket
frequencies on target vs raw pool, weight every document by how much
its grams favor the target model, keep the top-weighted pool docs.
FineWeb/DoReMi-era pipelines all carry a variant of this operator.

This implementation keeps the published structure but replaces the
log-likelihood ratio with an exact integer surrogate so the result is
deterministically verifiable: per hashed bucket ``b``

    w(b) = (ct_b + 1) * 1e6  div  (T_t + B)
         - (cs_b + 1) * 1e6  div  (T_s + B)

(Laplace-smoothed target-vs-source ppm difference; ``T_x`` = total
gram occurrences on side x, ``B`` = bucket count), and a document's
score is the BIGINT sum of ``w(bucket(g))`` over its gram
occurrences — monotone in the same "target-like minus source-like"
direction as the published log ratio, with no transcendental (libm
ulps break value oracles; see bm25's rational-idf note).

Spark shape, and why it holds at 100 TB:

* Gram hashing/bucketing is ROW-LOCAL codegen (sha256 once per token,
  bigrams mix adjacent hashes arithmetically — classifier.py's
  scheme); the model-training pass is ONE corpus scan reduced to
  ``n_buckets`` rows by a hash aggregate with map-side combine.
* The trained weights are collected driver-side — ``n_buckets`` is a
  fixed sketch parameter (DSIR uses 10^4; bloom.py collects m/64
  words the same way), NOT data-sized — and embedded as ONE constant-
  folded array literal, so the scoring pass is a second corpus scan
  with a row-local ``aggregate()``: zero joins, zero shuffles, zero
  Python in either pass.
* Selection is top-``k_select`` by (score desc, id) via
  TakeOrderedAndProject — per-task k-heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .classifier import _tok_hash
from .text import normalized_text


def _safe_hashes(text_col: str) -> Column:
    """Per-token hash array of the normalized text; [] for blank."""
    t = F.col(text_col)
    return F.when(
        F.trim(t) == "", F.array().cast("array<long>")
    ).otherwise(
        F.transform(F.split(normalized_text(t), " "), _tok_hash)
    )


def _bucket_stream(hs: Column, n_buckets: int) -> Column:
    """Unigram + adjacent-bigram hash buckets of a token-hash array,
    O(n) row-local (zip_with over a shifted slice — never per-index
    element_at, which re-evaluates the source array per element)."""
    n = F.size(hs)
    uni = F.transform(hs, lambda h: h % n_buckets)
    shifted = F.when(n > 1, F.slice(hs, 2, n - 1)).otherwise(
        F.array().cast("array<long>")
    )
    bi = F.filter(
        F.zip_with(hs, shifted, lambda a, b: (a * 31 + b) % n_buckets),
        lambda x: x.isNotNull(),
    )
    return F.concat(uni, bi)


def dsir_importance_select(
    df: DataFrame,
    is_target: Column,
    k_select: int = 100,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k_select`` pool documents by hashed-gram importance score.

    ``is_target`` marks the trusted target corpus; every other row is
    the raw pool ("source"). Returns ``(id, n_grams,
    dsir_score_micro)`` for the selected pool docs, ordered by
    (score desc, id) — a total order, so the selected SET is a pure
    function of the input at any partition count.
    """
    # Two-step projection: the hash array is a NAMED column referenced
    # by attribute inside _bucket_stream. Inlining it would copy the
    # transform(split, sha256) tree into every one of the four
    # references (size/transform/slice/zip_with) — re-hashing all n
    # tokens 4x per row; CollapseProject keeps multi-referenced
    # non-trivial projections separate (classifier.py's note).
    hashed = df.select(
        F.col(id_col).alias("_id"),
        is_target.alias("_tgt"),
        _safe_hashes(text_col).alias("__hs"),
    )
    base = hashed.select(
        "_id",
        "_tgt",
        _bucket_stream(F.col("__hs"), n_buckets).alias("_bk"),
    )
    counts = (
        base.select("_tgt", F.explode("_bk").alias("b"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
            .cast("long")
            .alias("ct"),
            F.sum(F.when(F.col("_tgt"), 0).otherwise(1))
            .cast("long")
            .alias("cs"),
        )
        .collect()
    )
    ct = [0] * n_buckets
    cs = [0] * n_buckets
    for r in counts:
        ct[r["b"]] = r["ct"]
        cs[r["b"]] = r["cs"]
    tt, ts = sum(ct), sum(cs)
    weights = [
        (ct[b] + 1) * 1_000_000 // (tt + n_buckets)
        - (cs[b] + 1) * 1_000_000 // (ts + n_buckets)
        for b in range(n_buckets)
    ]
    # ONE Py4J call for the whole weight vector: F.lit(list) builds the
    # array literal JVM-side (1024 individual F.lit()+cast calls cost
    # ~1.7 s of driver round-trips per invocation, measured)
    w_lit = F.lit(weights).cast("array<long>")
    scored = base.where(~F.col("_tgt")).select(
        F.col("_id").alias(id_col),
        F.size("_bk").cast("long").alias("n_grams"),
        F.aggregate(
            "_bk",
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(w_lit, (b + 1).cast("int")),
        ).alias("dsir_score_micro"),
    )
    return scored.orderBy(
        F.col("dsir_score_micro").desc(), F.col(id_col).asc()
    ).limit(k_select)
