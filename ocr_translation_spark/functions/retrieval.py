"""Ranked retrieval: exact-integer BM25 scoring for a fixed query.

The query-side complement of the index-side operators
(:mod:`.index` builds the posting lists, :mod:`__spark_entry__`'s
``tfidf_top_terms`` ranks per-document terms): given a FIXED set of
query terms, rank the corpus by Okapi BM25 and return the top-k
documents. This is the candidate-scoring step of retrieval-augmented
data curation (select documents "about" a topic) and of search-quality
evaluation over a crawl.

Scale shape (100 TB): for a fixed query-term set the whole computation
is shuffle-free on the corpus —

* ``tf`` per (doc, query term) and ``dl`` are row-local array
  aggregates over the tokenized text (whole-stage codegen, no
  explode);
* the corpus statistics BM25 needs (N, total token count, per-term
  document frequencies) collapse into ONE single-row aggregate,
  broadcast back as a 1-row cross join;
* the final top-k is a ``TakeOrderedAndProject`` (per-partition
  partial top-k, no global sort shuffle).

So the plan is two column-pruned corpus scans (stats pass + scoring
pass) and scalar-sized everything else — no corpus-keyed exchange at
any size. Contrast with scoring arbitrary many-term queries, where the
inverted index (:mod:`.index`) is the right access path.

Exactness: all arithmetic is integer (DECIMAL(38,0) intermediates,
truncating integral ``div``), mirroring the repo-wide oracle
convention. Two standard BM25 ingredients are made rational:

* ``k1`` and ``b`` are rational parameters (defaults 6/5 and 3/4 —
  the classic 1.2 / 0.75);
* the idf is the RATIONAL Robertson argument
  ``(N - df + 1/2) / (df + 1/2) = (2N - 2df + 1) / (2df + 1)``
  without the ``ln`` (libm's last ulp is engine-dependent and breaks
  a value oracle). ``ln`` is monotone, so per-term idf ORDER is
  preserved; multi-term scores weight terms by the ratio rather than
  its log, which favors rare terms more strongly — acceptable for a
  curation ranking and exactly reproducible everywhere.

With common denominators cleared, the per-(doc, term) contribution in
micro-units is::

    score_micro = (SCALE * (2N - 2df + 1) * (a+c) * r * tf * T)
              div ((2df + 1) * (c*r*tf*T + a*(r-p)*T + a*p*dl*N))

for ``k1 = a/c``, ``b = p/r``, corpus token total ``T``, corpus doc
count ``N``, document length ``dl``. Every factor is a positive
integer, so truncating division equals floor on Spark (DECIMAL
IntegralDivide) and DuckDB (HUGEINT ``//``) alike. Overflow bound:
the numerator is ``<= SCALE * 2N * 44 * tf * T``; with SCALE=1e6 it
stays inside 38 digits while ``N * tf * T <= ~1e28`` — comfortably
beyond a 10^12-document corpus.

Reference parity note: the reference service (hairbui76/ocr-translation)
has no retrieval surface; this is training-data-pipeline breadth
beyond parity, per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalized_text

#: scale of the emitted score: score_micro = floor(1e6 * score)
SCORE_SCALE = 1_000_000

_DEC = "decimal(38,0)"


def _dec(x) -> Column:
    c = x if isinstance(x, Column) else F.lit(x)
    return c.cast(_DEC)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    text_col: str = "text",
    id_col: str = "doc_id",
    pre_split: bool = False,
) -> DataFrame:
    """Top-k documents for ``query_terms`` by exact-integer BM25.

    Returns (doc_id, n_matched, score_micro), score-desc then
    numeric-doc_id tie-break (ties are real on synthetic corpora —
    identical (tf-vector, dl) pairs score identically).

    ``query_terms`` must be a small fixed list (a query, not a
    vocabulary): per-term tf becomes one row-local array aggregate
    each, and the stats row carries one df per term. For scoring
    against a large term set, build the inverted index instead.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    a, c = k1
    p, r = b
    if a <= 0 or c <= 0 or r <= 0 or not (0 <= p <= r):
        raise ValueError("k1 must be positive rational, b in [0, 1]")

    # pre_split: text_col already holds the normalized token array
    # (array<string>) — lets a multi-query caller (evaluation.mrr_eval)
    # normalize+tokenize the corpus ONCE and pin it instead of paying
    # the regexp pass per query; value-identical by construction
    toks = (
        F.col(text_col)
        if pre_split
        else F.filter(
            F.split(normalized_text(F.col(text_col)), " "),
            lambda t: t != "",
        )
    )

    # arity-1 lambda built through a call, NOT `lambda t, w=w: ...`:
    # a defaulted second parameter makes F.filter pass the (element,
    # index) form and the index silently replaces the term
    def _tf(w: str) -> Column:
        return F.size(F.filter(F.col("_toks"), lambda t: t == F.lit(w)))

    # materialize the token array once; tf/dl are row-local over it
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    ).select(
        "doc_id",
        F.size("_toks").alias("_dl"),
        *[_tf(w).alias(f"_tf{i}") for i, w in enumerate(query_terms)],
    )
    # ONE single-row aggregate carries every corpus statistic BM25
    # needs; broadcast back as a 1-row cross join
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_t"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    def term_score(i: int) -> Column:
        tf, dfq = F.col(f"_tf{i}"), F.col(f"_df{i}")
        n, t, dl = F.col("_n"), F.col("_t"), F.col("_dl")
        numer = (
            _dec(SCORE_SCALE)
            * _dec(2 * n - 2 * dfq + 1)
            * _dec((a + c) * r)
            * _dec(tf)
            * _dec(t)
        )
        denom = _dec(2 * dfq + 1) * (
            _dec(c * r) * _dec(tf) * _dec(t)
            + _dec(a * (r - p)) * _dec(t)
            + _dec(a * p) * _dec(dl) * _dec(n)
        )
        return F.when(
            tf > 0, F.call_function("div", numer, denom)
        ).otherwise(F.lit(0).cast(_DEC))

    matched = sum(
        (F.col(f"_tf{i}") > 0).cast("int")
        for i in range(len(query_terms))
    )
    score = sum(term_score(i) for i in range(len(query_terms)))
    return (
        scored.select(
            "doc_id",
            matched.alias("n_matched"),
            score.cast("long").alias("score_micro"),
        )
        .where(F.col("n_matched") > 0)
        .orderBy(
            F.col("score_micro").desc(),
            F.col("doc_id").cast("long").asc(),
        )
        .limit(top_k)
    )
