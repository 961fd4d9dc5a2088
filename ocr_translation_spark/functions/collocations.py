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


#: symbol-boundary delimiter for the BPE merge encoding; words
#: containing it are excluded (and the DuckDB twin mirrors the filter)
BPE_DELIM = ";"


def _bpe_seq(word: Column) -> Column:
    """Encode a word's symbol sequence as ``;c1;;c2;;...;;ck;``.

    Every symbol is wrapped ``;sym;`` and wrapped symbols concatenate,
    so the merge of pair (l, r) is ONE literal string replacement
    ``;l;;r;`` -> ``;lr;``. Both boundaries of both symbols are part of
    the pattern, which makes leftmost non-overlapping replace-all (the
    shared semantics of Spark's and DuckDB's ``replace``) EXACTLY
    greedy left-to-right BPE pair merging:

    * no prefix/suffix false positives (``;a;;ab;`` does not match
      ``;a;;a;`` — the pattern's closing ``;`` misses), and
    * runs collapse correctly (``;a;;a;;a;;a;`` under ``(a,a)`` ->
      ``;aa;;aa;`` because each match consumes BOTH symbols' wrappers,
      unlike a space-separated encoding whose shared separator breaks
      the chain).
    """
    return F.regexp_replace(word, "(.)", f"{BPE_DELIM}$1{BPE_DELIM}")


def _bpe_symbols(seq: Column) -> Column:
    """Decode ``;a;;bc;`` back to ``[a, bc]``."""
    return F.split(F.btrim(seq, F.lit(BPE_DELIM)), BPE_DELIM * 2)


def bpe_train_merges(
    df: DataFrame,
    rounds: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016,
    public): the first ``rounds`` merge decisions over the corpus,
    returned as ``(round, left, right, pair_count)``.

    Per round: adjacent symbol-pair counts (weighted by word
    frequency, over DISTINCT words only — per-merge work scales with
    vocabulary, not corpus tokens), argmax with the deterministic
    tie-break (count desc, then lexicographic), then the merge applied
    to every word as one literal ``replace`` (see :func:`_bpe_seq` for
    why that is exactly greedy BPE).

    Scale shape (100 TB): ONE corpus-scale shuffle total (the
    word-frequency aggregate, persisted); each round is then a
    vocabulary-scale explode + hash aggregate + a 1-row collect —
    O(rounds) driver round-trips carrying O(1) rows each, the same
    driver-coordination budget as ``graph.pagerank`` /
    ``connected_components``. The merge itself is a row-local codegen
    map (k nested ``replace`` calls after k rounds; a production run
    with hundreds of merges would checkpoint the vocabulary every few
    dozen rounds — at rounds <= O(10) recomputation is cheaper than a
    write barrier).

    Ties and counts are exact BIGINT; the DuckDB oracle twin unrolls
    the same rounds as chained CTEs with scalar-subquery merges.
    """
    spark = df.sparkSession
    base = (
        df.select(F.explode(_clean_tokens(F.col(text_col))).alias("word"))
        .where(~F.col("word").contains(BPE_DELIM))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .select(_bpe_seq(F.col("word")).alias("seq"), "n_occ")
        .persist()
    )
    words = base
    out_schema = (
        "round int, left string, right string, pair_count long"
    )
    try:
        merges: list[tuple] = []
        for rnd in range(1, rounds + 1):
            # adjacent pairs via zip_with against the 1-shifted slice:
            # each array argument is evaluated ONCE per row — an
            # element_at(syms, i) lambda would re-split the sequence
            # per element (the documented no-CSE-into-lambda pitfall,
            # quadratic in symbol count)
            syms = _bpe_symbols(F.col("seq"))
            n = F.size(syms)
            nxt = F.when(n > 1, F.slice(syms, 2, n - 1)).otherwise(
                F.array().cast("array<string>")
            )
            pairs = F.filter(
                F.zip_with(
                    syms,
                    nxt,
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                ),
                lambda p: p.getField("r").isNotNull(),
            )
            best = (
                words.select(F.explode(pairs).alias("p"), "n_occ")
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("n_occ").cast("long").alias("c"))
                .orderBy(F.col("c").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not best:
                break
            l, r, c = best[0]["l"], best[0]["r"], best[0]["c"]
            merges.append((rnd, l, r, c))
            pat = f"{BPE_DELIM}{l}{BPE_DELIM}{BPE_DELIM}{r}{BPE_DELIM}"
            rep = f"{BPE_DELIM}{l}{r}{BPE_DELIM}"
            words = words.select(
                F.replace(F.col("seq"), F.lit(pat), F.lit(rep)).alias("seq"),
                "n_occ",
            )
        return spark.createDataFrame(merges, out_schema)
    finally:
        # the result is a local-rows DataFrame, so the cached
        # vocabulary is safe to release here
        base.unpersist()


def word_cooccurrence(
    df: DataFrame,
    window: int = 4,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """GloVe-style windowed word co-occurrence counts (Pennington et
    al. 2014, public): for every token pair within ``window`` positions,
    the co-occurrence count and the distance-weighted total
    ``sum(floor(1e6 / distance))`` in exact integer micro-units (the
    1/d context weighting of the published counting step, made
    engine-exact).

    Pair generation is ROW-LOCAL codegen (one ``zip_with`` of the
    token array against its d-shifted slice per distance d — no
    self-join on position, which at 100 TB would shuffle the corpus
    ``window`` times); the only shuffle is the final pair-keyed hash
    aggregate, whose skew (stopword pairs) is exactly what AQE skew
    handling absorbs. Pairs are canonicalized ``(least, greatest)`` so
    the count matrix is the symmetric upper triangle. Top-k via
    TakeOrdered with a full deterministic tie-break.

    Implementation note: an index-based form
    (``transform(sequence(1, n-1), i -> transform(..., j ->
    element_at(toks, i) ...))``) is O(pairs x tokenization) — Catalyst
    does not CSE the token-array subtree into nested lambda bodies, so
    every ``element_at`` re-splits the document (measured 66 s vs
    0.9 s at sf0.1). ``zip_with`` evaluates each array argument once
    (same note as ``adjacent_pairs`` / ``dedup.shingles``), keeping
    tokenization O(window) per row.
    """
    toks = _clean_tokens(F.col(text_col))
    n = F.size(toks)

    def _pairs_at(d: int) -> Column:
        """Pairs (t[i], t[i+d]) via zip_with against the d-shifted
        slice; zip_with pads the shorter side with NULL, so the d
        dangling tails are filtered by the b-null check below (the
        raw (a, b) ride along because least/greatest IGNORE nulls —
        canonicalizing here would turn a padding row into a real-
        looking (a, a) pair)."""
        shifted = F.when(n > d, F.slice(toks, d + 1, n - d)).otherwise(
            F.array().cast("array<string>")
        )
        return F.zip_with(
            toks,
            shifted,
            lambda a, b: F.struct(
                a.alias("a"), b.alias("b"), F.lit(d).alias("d")
            ),
        )

    pairs = F.filter(
        F.concat(*[_pairs_at(d) for d in range(1, window + 1)]),
        lambda p: p.getField("b").isNotNull(),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.least("p.a", "p.b").alias("w1"),
            F.greatest("p.a", "p.b").alias("w2"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.call_function(
                    "div",
                    F.lit(1_000_000).cast("long"),
                    F.col("p.d").cast("long"),
                )
            )
            .cast("long")
            .alias("weight_micro"),
        )
        .orderBy(
            F.col("weight_micro").desc(), F.col("n_pairs").desc(), "w1", "w2"
        )
        .limit(top_k)
    )


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    preview_tokens: int = 20,
) -> DataFrame:
    """Apply a trained BPE merge list to tokenize the corpus — the
    APPLY side of :func:`bpe_train_merges` (together they are the full
    tokenizer-training/tokenization loop of an LLM data pipeline).

    ``merges`` is the ordered list of ``(left, right)`` pairs (e.g.
    ``[(r["left"], r["right"]) for r in bpe_train_merges(...).collect()]``).
    Each word is symbol-encoded (:func:`_bpe_seq`), the merges are
    applied IN TRAINING ORDER as nested literal ``replace`` calls
    (each exactly greedy left-to-right, see ``_bpe_seq``), and the
    result is decoded back to a token array.

    Scale shape: the whole operator is a ROW-LOCAL codegen map — zero
    shuffles, zero Python, constant work per character per merge. The
    merge list is baked into the plan as literals (a production
    tokenizer has a fixed merge table; thousands of merges would use
    a mapInPandas trie instead — at the O(10)-merge scale of the
    in-repo trainer, literal nesting is strictly faster).

    Output: ``(doc_id, n_tokens, tokens_csv)`` with ``tokens_csv`` the
    first ``preview_tokens`` tokens space-joined (scalar so the DuckDB
    twin compares exactly).
    """
    def _encode(w: Column) -> Column:
        seq = _bpe_seq(w)
        for l, r in merges:
            pat = f"{BPE_DELIM}{l}{BPE_DELIM}{BPE_DELIM}{r}{BPE_DELIM}"
            rep = f"{BPE_DELIM}{l}{r}{BPE_DELIM}"
            seq = F.replace(seq, F.lit(pat), F.lit(rep))
        return _bpe_symbols(seq)

    toks = F.flatten(
        F.transform(_clean_tokens(F.col(text_col)), _encode)
    )
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(F.slice(toks, 1, preview_tokens), " ").alias(
            "tokens_csv"
        ),
    )


def textrank_keywords(
    df: DataFrame,
    window: int = 2,
    iterations: int = 3,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04):
    PageRank over the corpus word co-occurrence graph — vertices are
    vocabulary terms, an undirected edge links every token pair
    within ``window`` positions, and the top-``top_k`` terms by rank
    are the keywords. The published graph is unweighted and
    undirected with damping 0.85; ranks come from
    :func:`graph.pagerank`'s exact integer recurrence (3 synchronous
    power steps here), so the DuckDB twin reproduces every score
    bit-for-bit.

    Spark shape at 100 TB: pair generation is the same row-local
    zip_with-over-shifted-slices codegen as :func:`word_cooccurrence`
    (no positional self-join); the corpus collapses to the DISTINCT
    edge set in one hash aggregate — O(vocab^2) bounded, in practice
    vocab-sized — and everything after runs on the vocabulary graph,
    which is tiny relative to the corpus (the whole point: corpus
    passes are O(1), the iteration runs on O(vocab) rows). Returns
    ``(term, rank_micro)`` ordered by (rank desc, term) — a total
    order, partition-count invariant.
    """
    from .graph import pagerank

    toks = _clean_tokens(F.col(text_col))
    n = F.size(toks)

    def _pairs_at(d: int) -> Column:
        shifted = F.when(n > d, F.slice(toks, d + 1, n - d)).otherwise(
            F.array().cast("array<string>")
        )
        return F.zip_with(
            toks,
            shifted,
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )

    pairs = F.filter(
        F.concat(*[_pairs_at(d) for d in range(1, window + 1)]),
        lambda p: p.getField("b").isNotNull()
        & (p.getField("a") != p.getField("b")),
    )
    edges = (
        df.select(F.explode(pairs).alias("p"))
        .select(
            F.least("p.a", "p.b").alias("w1"),
            F.greatest("p.a", "p.b").alias("w2"),
        )
        .distinct()
    )
    und = edges.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst")
    ).unionAll(
        edges.select(F.col("w2").alias("src"), F.col("w1").alias("dst"))
    )
    vocab = und.select(F.col("src").alias("term")).distinct()
    pr = pagerank(
        und,
        vocab,
        src="src",
        dst="dst",
        node_col="term",
        iterations=iterations,
    )
    return pr.orderBy(
        F.col("rank_micro").desc(), F.col("term").asc()
    ).limit(top_k)
