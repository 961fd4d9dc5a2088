"""Lexicon-based taxonomy tagging — broadcast-free topic assignment.

A curation pipeline routinely buckets documents into coarse domains
(code / news / forum / reference ...) with a small keyword lexicon
before mixing (the "domain tags" of public corpus reports). For a
FIXED small lexicon the 100 TB-correct shape is not an explode + join
at all: the per-topic keyword sets compile into row-local
``size(filter(tokens, isin(...)))`` counts — ZERO shuffles, zero
Python, whole-stage codegen — and the argmax folds over topics in
sorted order so ties break toward the lexicographically smallest
topic, deterministically on any engine.

(The explode + broadcast-join form only wins when the lexicon itself
is too large for a literal IN-list — thousands of topics / millions of
keywords — at which point ``hashed_classifier_score`` is the better
operator anyway.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalized_text

#: default lexicon over the synthetic corpus vocabulary; topics sorted
DEFAULT_LEXICON: dict[str, tuple[str, ...]] = {
    "ops": ("scan", "join", "merge", "filter", "hash", "sort"),
    "perf": ("fast", "slow", "small", "big", "batch", "stream"),
    "schema": ("data", "value", "row", "column", "table", "key"),
}


def taxonomy_tag(
    df: DataFrame,
    lexicon: dict[str, tuple[str, ...]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword counts per topic plus the argmax tag.

    Output: ``(doc_id, n_<topic>... , top_topic, top_score)`` with
    ``top_topic = ''`` when every topic scores 0 (untagged). Scores
    count token OCCURRENCES (not distinct hits), so a document that
    says "join" five times is more ops-y than one that says it once.
    """
    lex = lexicon or DEFAULT_LEXICON
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda t: t != "",
    )
    out = df.select("doc_id", toks.alias("_toks"))
    topics = sorted(lex)
    def _counter(words: tuple[str, ...]):
        # array_contains over a literal array, not Column.isin (isin's
        # In(...) type coercion trips over the lambda variable), and a
        # TRUE closure, not a default arg — `lambda x, w=...` is
        # arity-2, which F.filter treats as its (element, index) form
        # (the repo's documented arity pitfall).
        arr = F.array(*[F.lit(w) for w in words])
        return lambda x: F.array_contains(arr, x)

    for t in topics:
        out = out.withColumn(
            f"n_{t}",
            F.size(F.filter(F.col("_toks"), _counter(lex[t]))).cast(
                "long"
            ),
        )
    # fold in sorted topic order with a STRICT > so the first (i.e.
    # smallest) topic wins score ties — mirrored by the oracle's CASE
    best_topic, best_score = F.lit(""), F.lit(0).cast("long")
    for t in topics:
        is_better = F.col(f"n_{t}") > best_score
        best_topic = F.when(is_better, F.lit(t)).otherwise(best_topic)
        best_score = F.when(is_better, F.col(f"n_{t}")).otherwise(
            best_score
        )
    return out.select(
        "doc_id",
        *[f"n_{t}" for t in topics],
        best_topic.alias("top_topic"),
        best_score.alias("top_score"),
    )
