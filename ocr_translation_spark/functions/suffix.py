"""Exact-substring duplicate spans via distributed suffix
prefix-doubling (the ExactSubstr discipline of Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022:
remove every span whose length->=L window occurs elsewhere in the
corpus — exact, collision-free, unlike hashed-gram dedup).

The classical tool is a corpus-wide suffix array; the distributed
construction is prefix doubling (Manber-Myers): after round r every
position carries a label identifying the equivalence class of the
first 2^r characters of its suffix, and round r+1 refines by pairing
each position's label with the label 2^r characters ahead.  This
module runs exactly that refinement, with two deliberate deviations
from the textbook sequential form, both chosen for the Spark execution
model:

* Labels are INJECTIVE but not ORDER-PRESERVING (each class is named
  by its minimum packed position id, assigned with one window
  aggregate per round instead of a global dense rank).  Duplicate
  detection needs only equality of L-prefixes, never lexicographic
  order, and dropping order-preservation removes the one primitive
  that does not distribute well (a global dense rank needs either a
  single partition or a two-pass bucket-offset rank).
* Doubling stops at k = L (the duplicate-window threshold), not at
  k = n: ceil(log2 L) rounds total — 5 for L = 32 — independent of
  corpus size, instead of log2(total chars) ~ 47 at 10^14 positions.

Exactness argument (induction on k): labels at k = 1 are raw
codepoints (equal iff same char); a missing successor is the sentinel
-1, which no codepoint equals, so labels at 2k are equal iff both
k-halves are equal iff the first 2k characters (sentinel-padded past
the suffix end) are equal.  With L a power of two, positions share a
label at k = L exactly when their L-character windows are identical —
no neighbor-LCP pass, no hash collisions.

Honest cost accounting vs the one-shuffle alternative: for a SINGLE
fixed L, grouping positions by sha2(window) (what passage_dedup does
at the gram level) shuffles ~(8B hash + key) once and wins on raw
bytes.  Prefix doubling earns its log2(L) rounds when the guarantee
must be collision-free (hashed grams are probabilistic), when several
dyadic window scales are wanted from one pass (the round-k label
table IS the k-prefix class table for k = 1, 2, 4, ..., L), or as the
base of a full suffix order.  Each round is two shuffles over fixed
24-byte rows ((pid, label, successor-label) longs), so the total
volume is ~log2(L) * 48B per corpus character — partition-uniform
(pid / label keys are hash-distributed), no skew, no Python, no
driver-side data.

Scale note: positions = corpus characters, so at 100 TB this operator
is deliberately the most expensive in the repo — exactly as in the
published pipeline, which builds the full suffix array of the corpus.
The per-round state is 3 longs/char regardless of corpus size, and
every stage is a uniform hash shuffle; there is no single point of
accumulation.

Reference parity note: the reference (hairbui76/ocr-translation) has
no dedup of any kind; this is part of the brief's training-data
curation extension, sibling to functions/passage.py (hashed-gram
repeated spans) and functions/dedup.py (document-level near-dup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# packed position id = doc_id * _POS_SPACE + pos.  Guarded in-plan:
# documents must be shorter than _POS_SPACE - 64 characters so that
# pid +- k (k <= 64) can never alias into a neighboring document's
# position range (positions only exist for pos < len <= SPACE - 64,
# while an underflowing pid - k lands at pos >= SPACE - 64).
_POS_SPACE = 1 << 21


def suffix_classes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_k: int = 32,
) -> DataFrame:
    """(doc_id, pos, cls): ``cls`` identifies the equivalence class of
    the first ``max_k`` characters of the suffix starting at 0-based
    ``pos`` (sentinel-padded past the document end): two rows share
    ``cls`` iff those prefixes are identical strings.  ``max_k`` must
    be a power of two.

    Iterative (log2(max_k) rounds, each executed when called — same
    driver-coordinated discipline as graph.connected_components).
    Intermediates are eager localCheckpoints: the previous round's
    blocks are reclaimed by the ContextCleaner as its reference drops,
    but size executor storage for up to two concurrent copies of the
    (pid, cls) table while a round materializes.
    """
    if max_k < 1 or max_k & (max_k - 1):
        raise ValueError(f"max_k must be a power of two, got {max_k}")
    # pid +- k must stay inside one document's packed range: the
    # length guard below reserves `margin` slots past every document
    # end, so any k <= margin/2 can neither cross into the next doc's
    # positions nor underflow into the previous doc's (an underflow
    # lands at pos >= _POS_SPACE - margin, above any guarded length)
    margin = max(64, 2 * max_k)
    if margin >= _POS_SPACE // 2:
        raise ValueError(f"max_k {max_k} too large for _POS_SPACE")

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("t"),
    ).where(F.col("t").isNotNull() & (F.length("t") > 0))

    # in-plan guards: doc too long for the packed pid space, or doc_id
    # negative (would fold two documents onto one pid range)
    guarded = base.withColumn(
        "t",
        F.when(
            F.length("t") > F.lit(_POS_SPACE - margin),
            F.raise_error(
                F.concat(
                    F.lit("suffix_classes: document "),
                    F.col("doc_id").cast("string"),
                    F.lit(" exceeds the packed position space; "
                          "raise _POS_SPACE"),
                )
            ),
        )
        .when(
            F.col("doc_id") < 0,
            F.raise_error(F.lit("suffix_classes: negative doc_id")),
        )
        .otherwise(F.col("t")),
    )

    # one row per character position; posexplode over the char array
    # so the document string itself never rides along the explode.
    # The loop state is EXACTLY (pid, cls) — 2 longs — so every
    # round's two shuffles move the minimum; doc_id and pos are pure
    # functions of pid (div/mod _POS_SPACE), recovered arithmetically
    # at the end instead of carried through 2*log2(L) shuffles.
    cur = guarded.select(
        "doc_id",
        F.posexplode(F.split(F.col("t"), "")).alias("pos", "ch"),
    ).select(
        (F.col("doc_id") * F.lit(_POS_SPACE) + F.col("pos")).alias(
            "pid"
        ),
        F.ascii("ch").cast("long").alias("cls"),
    ).localCheckpoint(eager=True)

    k = 1
    while k < max_k:
        succ = cur.select(
            (F.col("pid") - F.lit(k)).alias("pid"),
            F.col("cls").alias("c2"),
        )
        paired = cur.join(succ, "pid", "left").select(
            "pid",
            F.col("cls").alias("c1"),
            F.coalesce("c2", F.lit(-1)).alias("c2"),
        )
        w = Window.partitionBy("c1", "c2")
        cur = paired.select(
            "pid", F.min("pid").over(w).alias("cls")
        ).localCheckpoint(eager=True)
        k *= 2

    space = F.lit(_POS_SPACE)
    return cur.select(
        F.call_function("div", F.col("pid"), space).alias("doc_id"),
        (F.col("pid") % space).alias("pos"),
        "cls",
    )


def substring_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 32,
) -> DataFrame:
    """Per-document exact-substring duplication accounting at window
    threshold ``min_len`` (a power of two): one row per input document
    with

    * ``n_windows``     — length-``min_len`` windows the doc contains,
    * ``dup_windows``   — windows that occur >= 2 times in the corpus
                          (anywhere: same doc or another doc),
    * ``n_spans``       — maximal merged spans those windows cover,
    * ``covered_chars`` — characters under the union of the duplicated
                          windows (the ExactSubstr removal budget).

    Duplicate windows are found by suffix-class equality (see module
    docstring), the span merge is one per-doc window pass (windows
    [p, p+L) merge while the next start is <= p + L), and documents
    with no duplicated window — including empty or short docs — come
    back with zeros, never dropped (repo drop-accounting convention).
    """
    lit_l = F.lit(min_len)
    cls = suffix_classes(
        docs, id_col=id_col, text_col=text_col, max_k=min_len
    )

    # windows fully inside the document; class size counted among
    # eligible rows only (short suffixes can never match a full
    # window's class anyway — the sentinel is not a character).
    # Lengths come from the doc-dim join on doc_id — the same key the
    # island window below partitions by, so the shuffle is shared.
    lengths = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(text_col).alias("n_chars"),
    )
    elig = cls.join(lengths, "doc_id").where(
        F.col("pos") <= F.col("n_chars") - lit_l
    )
    marked = (
        elig.withColumn(
            "class_n", F.count(F.lit(1)).over(Window.partitionBy("cls"))
        )
        .where(F.col("class_n") >= 2)
        .select("doc_id", "pos")
    )

    wd = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        marked.withColumn("prev", F.lag("pos").over(wd))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull()
                | (F.col("pos") - F.col("prev") > lit_l),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                wd.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    per_span = islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"),
        F.max("pos").alias("e"),
        F.count(F.lit(1)).alias("npos"),
    )
    per_doc = per_span.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") + lit_l - F.col("s")).alias("covered_chars"),
        F.sum("npos").alias("dup_windows"),
    )

    all_docs = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.greatest(
            F.coalesce(F.length(text_col), F.lit(0)) - lit_l + 1,
            F.lit(0),
        )
        .cast("long")
        .alias("n_windows"),
    )
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.coalesce("dup_windows", F.lit(0)).cast("long").alias(
            "dup_windows"
        ),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("covered_chars", F.lit(0)).cast("long").alias(
            "covered_chars"
        ),
    )
