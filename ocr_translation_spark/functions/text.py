"""Text-analysis operators for a training-data pipeline, all columnar.

Every function here is pure Catalyst expression work (whole-stage
codegen, zero Python, zero shuffles) so it survives a 100 TB scan:
these are exactly the per-row scoring passes a web-corpus curation job
runs before dedup/filtering.

Each operator has a DuckDB-SQL oracle twin in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Small fixed stopword sets for the language-ID heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "in", "is", "to", "it", "on", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "du", "que", "pour"),
}

PUNCT_CHARS = ".,;:!?'\"()-"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.trim(text) == "", 0).otherwise(F.size(tokens(text)))


def add_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", token_count(F.col(text_col)))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    stripped = F.translate(text, PUNCT_CHARS, "")
    n = F.length(text)
    return F.when(n == 0, 0.0).otherwise((n - F.length(stripped)) / n)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(list(STOPWORDS[lang])))
    )
    return F.when(F.size(toks) == 0, 0.0).otherwise(hits / F.size(toks))


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) == 0, 0.0).otherwise(total / F.size(toks))


def add_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features + a keep flag.

    The keep rule is the usual curation gate shape: enough tokens,
    plausible mean token length, not punctuation soup.
    """
    t = F.col(text_col)
    out = (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(t), 6))
        .withColumn("mean_tok_len", F.round(mean_token_len(t), 6))
    )
    keep = (
        (F.col("n_tokens") >= 5)
        & (F.col("mean_tok_len") >= 2.0)
        & (F.col("mean_tok_len") <= 12.0)
        & (F.col("punct_ratio") <= 0.3)
    )
    return out.withColumn("quality_keep", keep)


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language-ID heuristic.

    Scores each candidate language by stopword-token hit count; emits
    the argmax (ties broken by language code order) or 'und' when no
    stopword hits at all. Pure expression — a greatest-of-N over
    per-language counters.
    """
    toks = tokens(F.col(text_col))

    def _in_set(sw):
        # closure factory: a default-arg lambda would have 2 params and
        # F.filter would bind the array index to it
        return lambda t: F.lower(t).isin(list(sw))

    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, _in_set(sw))).alias("score"),
                F.lit(code).alias("code"),
            )
            for code, sw in sorted(STOPWORDS.items())
        ]
    )
    # argmax by (score desc, code asc): struct sort compares fields in
    # order, so sort ascending on (-score, code) and take the head.
    ordered = F.array_sort(
        F.transform(
            scored,
            lambda s: F.struct(
                (-s["score"]).alias("neg_score"), s["code"].alias("code")
            ),
        )
    )
    head = F.element_at(ordered, 1)
    lang = F.when(head["neg_score"] >= 0, "und").otherwise(head["code"])
    return df.withColumn("lang_guess", lang)


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: whole-doc sha256 over normalized text plus
    a 64-bit shingle fingerprint (min over 3-gram hashes — a 1-hash
    MinHash, the document-fingerprinting primitive).

    Shingles come from ``dedup.shingles`` (zip_with over shifted
    slices): the old sequence+element_at form re-evaluated the token
    split per element — O(n^2) re-tokenization per row (Catalyst has
    no CSE across lambda boundaries). The min-shingle hash is the
    16-hex-char sha256 prefix (orders like the unsigned 64-bit value;
    DuckDB-reproducible, so the query has a value oracle).
    """
    from .dedup import shingles  # late import: dedup imports this module

    t = F.col(text_col)
    norm = normalized_text(t)
    sh = shingles(t, 3)
    return df.withColumn("fp_sha256", F.sha2(norm, 256)).withColumn(
        "fp_min_shingle",
        F.array_min(
            F.transform(sh, lambda s: F.substring(F.sha2(s, 256), 1, 16))
        ),
    )


def word_grams(toks: Column, k: int) -> Column:
    """NON-distinct word k-grams (multiset — unlike ``dedup.shingles``,
    which deduplicates for set-Jaccard). Same zip_with-over-shifted-
    slices shape (evaluates the token array once; per-index element_at
    lambdas re-evaluate it per element). Documents with fewer than k
    tokens yield an empty list."""
    n = F.size(toks)
    grams = toks
    for j in range(1, k):
        shifted = F.when(n > j, F.slice(toks, j + 1, n - j)).otherwise(
            F.array().cast("array<string>")
        )
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.filter(grams, lambda g: g.isNotNull())


def run_length_stats(arr: Column) -> Column:
    """Multiset statistics of an array's values, computed IN-ROW:
    ``struct(mx, dup, types, hapax, sumc2)`` where, over the value
    counts ``c`` of the array's elements,

    * ``mx``    = max(c)                 (most frequent value's count)
    * ``dup``   = sum(c where c >= 2)    (occurrences of repeated values)
    * ``types`` = count(distinct values)
    * ``hapax`` = count(values with c == 1)
    * ``sumc2`` = sum(c^2)               (Simpson numerator)

    Shape: ``array_sort`` then ONE sequential ``aggregate`` scan over
    the sorted array tracking the current run — equal values are
    adjacent after the sort, so every count is a run length. All of it
    runs inside whole-stage codegen on the row's own array: the
    explode -> (id, value) shuffle -> re-aggregate dance this replaces
    moved O(total occurrences) rows through TWO shuffles to compute
    numbers that never leave the row. Per-doc cost is O(g log g)
    comparisons; cross-doc cost is ZERO — embarrassingly parallel at
    any corpus size.

    The merge lambda references only its own (acc, x) arguments — no
    outer subtree — so the per-element re-evaluation hazard
    (Catalyst performs no CSE across lambda boundaries) does not bite.
    """
    zero = F.lit(0).cast("long")

    def _flushed(acc):
        # close the open run into the totals
        return {
            "mx": F.greatest(acc["mx"], acc["run"]),
            "dup": acc["dup"]
            + F.when(acc["run"] >= 2, acc["run"]).otherwise(zero),
            "types": acc["types"]
            + F.when(acc["run"] > 0, F.lit(1).cast("long")).otherwise(zero),
            "hapax": acc["hapax"]
            + F.when(acc["run"] == 1, F.lit(1).cast("long")).otherwise(zero),
            "sumc2": acc["sumc2"] + acc["run"] * acc["run"],
        }

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("mx"),
        zero.alias("dup"),
        zero.alias("types"),
        zero.alias("hapax"),
        zero.alias("sumc2"),
    )

    def merge(acc, x):
        extend = F.struct(
            x.alias("prev"),
            (acc["run"] + 1).alias("run"),
            acc["mx"].alias("mx"),
            acc["dup"].alias("dup"),
            acc["types"].alias("types"),
            acc["hapax"].alias("hapax"),
            acc["sumc2"].alias("sumc2"),
        )
        fl = _flushed(acc)
        new_run = F.struct(
            x.alias("prev"),
            F.lit(1).cast("long").alias("run"),
            fl["mx"].alias("mx"),
            fl["dup"].alias("dup"),
            fl["types"].alias("types"),
            fl["hapax"].alias("hapax"),
            fl["sumc2"].alias("sumc2"),
        )
        return F.when(
            (acc["run"] > 0) & (acc["prev"] == x), extend
        ).otherwise(new_run)

    def finish(acc):
        fl = _flushed(acc)
        return F.struct(
            fl["mx"].alias("mx"),
            fl["dup"].alias("dup"),
            fl["types"].alias("types"),
            fl["hapax"].alias("hapax"),
            fl["sumc2"].alias("sumc2"),
        )

    return F.aggregate(F.array_sort(arr), init, merge, finish)


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/C4-style word-level repetition quality signals per doc:

    * ``top_bigram_frac`` — the most frequent bigram's share of all
      bigram occurrences (boilerplate/navigation pages spike here);
    * ``dup_trigram_frac`` — fraction of trigram occurrences whose
      trigram appears more than once (templated/spun text);
    * ``distinct_token_ratio`` — vocabulary diversity (keyword-stuffed
      pages crater it).

    Shape: ZERO shuffle. Every signal is a function of the row's own
    gram multiset, so the counts are computed in-row by
    ``run_length_stats`` (sort + one codegen scan) instead of the
    explode -> (doc_id, gram) shuffle -> re-aggregate dance an
    aggregation-shaped plan would pay — that plan moved O(gram
    occurrences) rows through two exchanges to compute numbers that
    never leave the row. Embarrassingly parallel at any corpus size.
    Documents too short to have grams report 0 fractions. All
    arithmetic is exact integer counting + one double division, so any
    engine reproduces it (DuckDB twin in __spark_entry__)."""
    from ._lsh_common import prepared

    def _build():
        return _repetition_signals_plan(df, id_col, text_col)

    # the gram chains + run-scan are a large expression tree; building
    # and analyzing it costs ~0.7 s of pure driver time at ANY data
    # size. Memoize the built plan per (source, params) like a prepared
    # statement (same pattern and immutable-source caveat as the LSH
    # family — see _lsh_common.prepared / invalidate).
    return prepared(
        "text.repetition_signals", df, (id_col, text_col), _build
    )


def _repetition_signals_plan(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    toks = tokens(normalized_text(F.col(text_col)))
    # materialize each gram array ONCE per row (a projection column is
    # evaluated once; repeating the word_grams subtree in every output
    # expression would rebuild it per reference — no CSE across HOFs)
    base = df.select(
        F.col(id_col).alias("_id"),
        toks.alias("t"),
        word_grams(toks, 2).alias("_g2"),
        word_grams(toks, 3).alias("_g3"),
    )
    g2 = run_length_stats(F.col("_g2"))
    g3 = run_length_stats(F.col("_g3"))
    n2 = F.size(F.col("_g2"))
    n3 = F.size(F.col("_g3"))
    return base.select(
        F.col("_id").alias(id_col),
        n2.cast("long").alias("n_bigrams"),
        F.round(
            F.when(n2 == 0, F.lit(0.0)).otherwise(g2["mx"] / n2), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.when(n3 == 0, F.lit(0.0)).otherwise(g3["dup"] / n3), 6
        ).alias("dup_trigram_frac"),
        F.round(
            F.size(F.array_distinct(F.col("t"))) / F.size(F.col("t")), 6
        ).alias("distinct_token_ratio"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into token-bounded overlapping chunks — the
    sliding-window pass that feeds tokenization in a training-data
    pipeline. Fully columnar (sequence + transform + posexplode, zero
    Python, no shuffle): chunk c covers tokens
    ``[c*stride, c*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; the final chunk is the first
    one whose window reaches the end (shorter tails allowed, no
    padding). Empty/blank docs yield one empty chunk so no document is
    silently dropped.

    Output: (id, chunk_id, n_chunk_tokens, chunk_text). At 100 TB this
    is a pure map stage — rows fan out ~n_tokens/stride with no
    skew-sensitive operation anywhere.
    """
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.trim(F.col(text_col)) == "", 0).otherwise(F.size(toks))
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - max_tokens) / F.lit(float(stride))) + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda c: F.slice(toks, c * stride + 1, max_tokens),
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "_ctoks"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_ctoks").alias("n_chunk_tokens"),
            F.array_join("_ctoks", " ").alias("chunk_text"),
        )
        # blank docs: one chunk, zero tokens, empty text
        .withColumn(
            "n_chunk_tokens",
            F.when(F.col("chunk_text") == "", 0).otherwise(
                F.col("n_chunk_tokens")
            ),
        )
    )


def token_concentration(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram concentration quality signals per doc (the token-level
    complement of ``repetition_signals``' bigram/trigram view):

    * ``top_token_frac`` — most frequent token's share of occurrences
      (a doc that is 40% one word is keyword stuffing);
    * ``simpson_index`` — 1 - sum(c^2)/n^2, the probability two random
      token draws differ: collapses toward 0 on degenerate docs without
      needing logarithms (entropy would drag libm into the oracle
      comparison; Simpson is pure integer arithmetic + one division,
      so any engine is bit-exact);
    * ``hapax_frac`` — fraction of the doc's distinct tokens occurring
      exactly once (hapax legomena rate; natural prose is hapax-rich,
      templated text is not).

    Shape: ZERO shuffle — every signal is a function of the row's own
    token multiset, so the counts come from ``run_length_stats`` (one
    in-row sort + codegen scan) instead of an explode -> shuffle ->
    re-aggregate plan. Embarrassingly parallel at any corpus size.
    Short/empty docs report 0 values.

    Plan memoized per (source, params) like ``repetition_signals`` —
    same ``prepared()`` pattern and immutable-source caveat.
    """
    from ._lsh_common import prepared

    return prepared(
        "text.token_concentration",
        df,
        (id_col, text_col),
        lambda: _token_concentration_plan(df, id_col, text_col),
    )


def _token_concentration_plan(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    toks = tokens(normalized_text(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.when(F.trim(F.col(text_col)) != "", toks)
        .otherwise(F.array().cast("array<string>"))
        .alias("_t"),
    )
    s = run_length_stats(F.col("_t"))
    n = F.size(F.col("_t")).cast("long")
    return base.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.round(s["mx"].cast("double") / n, 6))
        .alias("top_token_frac"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0) - s["sumc2"].cast("double") / (n * n), 6
            )
        )
        .alias("simpson_index"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.round(s["hapax"].cast("double") / s["types"], 6))
        .alias("hapax_frac"),
    )


def add_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Classical readability indices in exact cross-multiplied ppm
    integers — LIX (Bjornsson 1968) and ARI (Senter & Smith 1967) —
    plus their component counts:

    * ``words``      whitespace tokens (empty tokens dropped)
    * ``sentences``  count of sentence-final punctuation ``[.!?]``,
      floored at 1 so fragment documents still score
    * ``long_words`` tokens longer than 6 characters (the LIX cut)
    * ``chars``      non-whitespace characters (the ARI cut)
    * ``lix_ppm``    1e6*words//sentences + 1e8*long_words//words
    * ``ari_ppm``    4.71*chars/words + 0.5*words/sentences - 21.43,
      cross-multiplied into ppm with truncating division

    Truncating integer division on non-negative operands is
    engine-neutral (Spark ``div`` == DuckDB ``//`` here), so both
    indices are value-oracle-checkable — the same exactness discipline
    as the Gopher rules and the quality scorer.  Zero-word documents
    get NULL indices, never a division error.  Row-local, zero
    shuffles, whole-stage codegen.
    """
    t = F.col(text_col)
    toks = F.filter(
        F.split(F.trim(t), r"\s+"), lambda x: x != F.lit("")
    )
    words = F.size(toks)
    sentences = F.greatest(
        F.lit(1), F.length(F.regexp_replace(t, r"[^.!?]", ""))
    )
    long_words = F.size(F.filter(toks, lambda x: F.length(x) > 6))
    chars = F.length(F.regexp_replace(t, r"\s", ""))
    out = (
        df.withColumn("words", words.cast("long"))
        .withColumn("sentences", sentences.cast("long"))
        .withColumn("long_words", long_words.cast("long"))
        .withColumn("chars", chars.cast("long"))
    )
    return out.withColumn(
        "lix_ppm",
        F.when(
            F.col("words") > 0,
            F.expr(
                "(words * 1000000) div sentences"
                " + (long_words * 100000000) div words"
            ),
        ).cast("long"),
    ).withColumn(
        "ari_ppm",
        F.when(
            F.col("words") > 0,
            F.expr(
                "(chars * 4710000) div words"
                " + (words * 500000) div sentences - 21430000"
            ),
        ).cast("long"),
    )
