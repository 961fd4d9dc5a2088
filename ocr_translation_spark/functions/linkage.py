"""Fellegi-Sunter record-linkage scoring (Fellegi & Sunter, JASA
1969) over blocked candidate pairs.

The classification stage that sits on top of a candidate generator
(here: sorted-neighborhood blocking, ``functions/blocking.py``): each
candidate pair gets a COMPARISON VECTOR of field agreements, every
field contributes its likelihood ratio — m/u on agreement,
(1-m)/(1-u) on disagreement — and the pair's match weight is the
product of those ratios (conditional-independence / naive-Bayes
assumption, as in the original paper and every production
merge/purge system since Hernandez & Stolfo SIGMOD'95).

Exactness discipline (the repo-wide rule for value-oracled
operators): the textbook formulation sums LOG weights, but libm logs
differ in ulps across engines and break value oracles. Log-odds
ordering equals ratio ordering, so the weight is kept as an EXACT
RATIONAL — per-field ratios are integer pairs (num, den), the pair
score is the BIGINT product ``score_num / score_den``, and the
match/possible/non-match decision is the cross-multiplied compare
``score_num * t_den >= t_num * score_den``. With the default four
fields the largest numerator product is 400*19*9*4 = 273,600 —
nowhere near BIGINT range even after the 1e6 ppm scaling.

Scale shape: the expensive part is candidate generation, which the
SNM generator bounds at O(n * (window-1)) pairs with no token
explode; the comparison attributes ride the generator's existing
rank equi-join (``carry=``), so scoring adds ZERO joins and ZERO
shuffles on top of blocking — every agreement and the weight product
are row-local whole-stage-codegen expressions.

Reference anchor: the reference pipeline's cache-identity join is an
EXACT sha256 equi-join (src/utils/hash.js:5-25 via OCRQueue.js:66);
this family generalizes that identity test to graded field evidence,
the standard curation need when near-identical records lack byte
identity.
"""

from __future__ import annotations

from functools import reduce
from operator import mul

from pyspark.sql import Column, DataFrame, functions as F

from .blocking import sorted_neighborhood_pairs
from .text import normalized_text

# (agreement column, agree_num, agree_den, disagree_num, disagree_den)
# Ratios are the m/u likelihood ratios as exact rationals; e.g. the
# normalized-text field corresponds to m=0.8, u=0.002 (agree ratio
# 400) and (1-m)/(1-u) ~ 1/5 on disagreement.
DEFAULT_FIELDS: tuple[tuple[str, int, int, int, int], ...] = (
    ("agree_text", 400, 1, 1, 5),
    ("agree_lang", 19, 6, 1, 14),
    ("agree_source", 9, 1, 1, 9),
    ("agree_len", 4, 1, 1, 3),
)

#: classify as match when score_num/score_den >= 100 (i.e. posterior
#: odds two orders of magnitude in favour under the default prior).
DEFAULT_THRESHOLD: tuple[int, int] = (100, 1)


def fs_score(
    pairs: DataFrame,
    fields: tuple[tuple[str, int, int, int, int], ...] = DEFAULT_FIELDS,
    threshold: tuple[int, int] = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Append the exact-rational Fellegi-Sunter weight to ``pairs``.

    ``pairs`` must already carry one BOOLEAN column per field (the
    comparison vector). Adds ``score_num``/``score_den`` (BIGINT
    rational weight), ``score_ppm`` (truncating parts-per-million
    scalar for human ranking) and ``is_match`` (cross-multiplied
    threshold compare, INT 0/1). Purely row-local."""
    t_num, t_den = threshold
    if t_num <= 0 or t_den <= 0:
        raise ValueError("threshold must be a positive rational")

    def _factor(agree: str, a: int, d: int) -> Column:
        return F.when(F.col(agree), F.lit(a)).otherwise(F.lit(d)).cast(
            "long"
        )

    num = reduce(mul, [_factor(c, an, dn) for c, an, _, dn, _ in fields])
    den = reduce(mul, [_factor(c, ad, dd) for c, _, ad, _, dd in fields])
    out = pairs.withColumn("score_num", num).withColumn("score_den", den)
    return out.withColumn(
        "score_ppm",
        F.expr("(score_num * 1000000L) div score_den"),
    ).withColumn(
        "is_match",
        (
            F.col("score_num") * F.lit(t_den)
            >= F.lit(t_num) * F.col("score_den")
        ).cast("int"),
    )


def record_linkage_fs(
    docs: DataFrame,
    window: int = 4,
    prefix_len: int = 2,
    threshold: tuple[int, int] = DEFAULT_THRESHOLD,
) -> DataFrame:
    """End-to-end record linkage over a ``documents``-shaped table
    (doc_id, text, lang, source, n_chars): SNM blocking on the
    normalized text -> four-field comparison vector -> exact-rational
    Fellegi-Sunter weight -> threshold classification.

    The comparison attributes are CARRIED through the blocking
    generator's rank equi-join rather than joined back afterwards, so
    the whole operator costs exactly the generator's shuffles (the
    per-bucket rank window + the integer rank join); scoring itself is
    shuffle-free codegen. Carry only the comparison fields at scale —
    never the raw span payload.

    Length agreement is the exact-integer 5%% rule
    ``20 * |len_a - len_b| <= max(len_a, len_b)``."""
    base = docs.select(
        F.col("doc_id").alias("id"),
        normalized_text(F.col("text")).alias("nkey"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars").cast("long").alias("n_chars"),
    ).withColumn(
        # the blocking SORT needs the full nkey, but the pair join only
        # needs an EQUALITY bit — carry the fixed-width sha256 digest
        # (the repo's exact-identity idiom, same as the reference's
        # sha256 cache join) instead of the whole normalized text, so
        # the candidate fan-out never ships document-length payloads
        "nhash",
        F.sha2(F.col("nkey"), 256),
    )
    pairs = sorted_neighborhood_pairs(
        base,
        key="nkey",
        id_col="id",
        window=window,
        prefix_len=prefix_len,
        carry=("nhash", "lang", "source", "n_chars"),
    )
    cmp = (
        pairs.withColumn(
            "agree_text", F.col("nhash_a").eqNullSafe(F.col("nhash_b"))
        )
        .withColumn(
            "agree_lang", F.col("lang_a").eqNullSafe(F.col("lang_b"))
        )
        .withColumn(
            "agree_source",
            F.col("source_a").eqNullSafe(F.col("source_b")),
        )
        .withColumn(
            "agree_len",
            F.lit(20) * F.abs(F.col("n_chars_a") - F.col("n_chars_b"))
            <= F.greatest(F.col("n_chars_a"), F.col("n_chars_b")),
        )
    )
    scored = fs_score(cmp, DEFAULT_FIELDS, threshold)
    return scored.select(
        "id_a",
        "id_b",
        "rank_dist",
        F.col("agree_text").cast("int").alias("agree_text"),
        F.col("agree_lang").cast("int").alias("agree_lang"),
        F.col("agree_source").cast("int").alias("agree_source"),
        F.col("agree_len").cast("int").alias("agree_len"),
        "score_num",
        "score_den",
        "score_ppm",
        "is_match",
    )


def golden_record(
    docs: DataFrame,
    window: int = 4,
    prefix_len: int = 2,
    threshold: tuple[int, int] = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Master-data survivorship ("golden record"): Fellegi-Sunter
    matches -> connected components -> ONE merged row per entity
    cluster, with deterministic per-attribute survivorship rules —
    the merge/purge endgame (Hernandez & Stolfo SIGMOD'95) after
    blocking and scoring:

    * ``canonical_id`` — min member id (the repo-wide survivor rule);
    * ``text`` — the LONGEST member's text (n_chars desc, id asc —
      the dedup_best_quality policy), picked via one max(struct(...))
      so no second corpus pass;
    * ``lang`` / ``source`` — majority vote, ties to the smallest
      value (min(struct(-count, value)));
    * ``n_members`` — cluster size (1 for unmatched singletons;
      every input row appears in exactly one golden record).

    Cost on top of scoring: the CC loop (O(diameter) tiny-graph
    rounds over MATCH edges only — the corpus never enters the loop)
    plus one members join and two cluster-keyed aggregates."""
    from ._lsh_common import prepared
    from .graph import connected_components

    def _cc() -> DataFrame:
        matches = (
            record_linkage_fs(docs, window, prefix_len, threshold)
            .where(F.col("is_match") == 1)
            .select("id_a", "id_b")
        )
        return connected_components(
            matches,
            src="id_a",
            dst="id_b",
            nodes=docs.select("doc_id"),
            node_col="doc_id",
        )

    # the CC loop is O(diameter) driver-coordinated jobs; memoize the
    # converged (checkpoint-backed) labels per (docs plan, params) the
    # same way dedup_clusters does — prepared()'s immutable-source
    # caveat applies
    cc = prepared(
        "linkage:golden_cc", (docs,), (window, prefix_len, threshold), _cc
    )
    m = docs.join(cc, docs["doc_id"] == cc["node"]).select(
        "cluster_id",
        "doc_id",
        "text",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    base = m.groupBy("cluster_id").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max(
            F.struct(
                F.col("n_chars"),
                (-F.col("doc_id")).alias("_negid"),
                F.col("text"),
            )
        )["text"].alias("text"),
    )

    def _majority(col: str) -> DataFrame:
        counts = m.groupBy("cluster_id", col).agg(
            F.count(F.lit(1)).cast("long").alias("_c")
        )
        return counts.groupBy("cluster_id").agg(
            F.min(F.struct((-F.col("_c")).alias("_negc"), F.col(col)))[
                col
            ].alias(col)
        )

    return (
        base.join(_majority("lang"), "cluster_id")
        .join(_majority("source"), "cluster_id")
        .select(
            "cluster_id",
            "canonical_id",
            "n_members",
            "text",
            "lang",
            "source",
        )
    )
