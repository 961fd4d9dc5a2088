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
