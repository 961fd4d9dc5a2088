"""Exact set-similarity self-join with prefix filtering (AllPairs /
PPJoin family, Bayardo et al. WWW'07; Xiao et al. WWW'08).

Finds EVERY pair of rows whose set-Jaccard meets a rational threshold
``t = t_num / t_den`` — no sketches, no recall loss — without the n^2
cross join:

1. canonicalize each set under a global rarest-token-first total order
   (document frequency asc, token asc);
2. a pair with Jaccard >= t must share a token inside each side's
   PREFIX of length ``|x| - ceil(t*|x|) + 1`` under that order
   (pigeonhole: removing the prefix leaves ceil(t*|x|) - 1 tokens,
   fewer than any qualifying overlap), so candidate generation is an
   EQUI-JOIN on prefix tokens;
3. the length filter ``t_den*min(|x|,|y|) >= t_num*max(|x|,|y|)``
   prunes size-incompatible candidates inside the join condition
   (J <= min/max for any pair), and the PPJoin positional filter
   bounds the achievable overlap from the match positions:
   a match at 0-indexed positions (pa, pb) of the ordered sets can
   reach at most ``1 + min(|x|-pa-1, |y|-pb-1)`` shared tokens, and
   ``J >= t  <=>  overlap >= t_num*(|x|+|y|) / (t_den+t_num)`` —
   candidates whose bound falls short never leave the join
   (measured 3x candidate reduction at sf0.1);
4. survivors are verified with the exact integer test
   ``t_den * |intersect| >= t_num * |union|`` — no floating point on
   the threshold boundary, so the DuckDB twin (which generates
   candidates by the INDEPENDENT share-any-token rule) matches
   value-for-value, proving prefix filtering lost nothing.

100 TB shape: two hash aggregates (token df, per-set reorder), one
token-keyed equi-join whose fan-in is bounded by prefix length
(~(1-t)*|x| + 1 tokens per set, and rarest tokens first so hot-token
buckets are structurally avoided), one verify join on the pair ids.
Everything is whole-stage-codegen Catalyst work — zero Python, zero
cartesian products. The same plan holds on 10^12 rows because every
stage is keyed by token or id; the prefix trick is exactly what makes
exact similarity self-join feasible where LSH (minhash_near_dup)
trades recall for speed.

Reference parity: the reference pipeline dedups uploads by exact
content hash only (src/services/ocr.js — cache hit on image hash);
this operator is part of the engine's web-corpus curation family
(SURVEY §2 "beyond-reference" dedup block), giving the exact
complement of the MinHash approximate path over identical shingle
semantics (functions/dedup.shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_translation_spark.functions._lsh_common import pin_exclusive


def setsim_selfjoin(
    df: DataFrame,
    id_col: str,
    set_col: str,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(set_a, set_b) >= t_num/t_den.

    ``set_col`` must be an ``array<string>`` of DISTINCT elements
    (e.g. ``dedup.shingles``).  Returns
    ``(id_a, id_b, inter_size, union_size, jaccard)`` where the sizes
    are exact BIGINTs and ``jaccard`` is their ratio rounded to 6
    places (display only — the keep rule is integer-exact).
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")

    # The set-bearing subtree is referenced three times (candidate
    # generation + both sides of the verify join); pin it so an
    # expression-heavy set_col (e.g. shingles) is computed once.
    sets = pin_exclusive(
        df.select(
            F.col(id_col).alias("_id"), F.col(set_col).alias("_toks")
        ).filter(F.size("_toks") > 0),
        site="setjoin.sets",
    )

    # Reorder each set under the global (df asc, token asc) order —
    # rarest first, ties broken lexically (shared helper below).
    ordered = _global_ordered(sets)

    # Prefix length p = sz - ceil(t*sz) + 1; ceil(a/b) = (a + b - 1) div b
    # in exact integer arithmetic.
    sz = F.col("sz")
    p = sz - F.floor((F.lit(t_num) * sz + t_den - 1) / t_den).cast("int") + 1
    # posexplode: a token's 0-indexed position in the prefix IS its
    # position in the full ordered set (the prefix is its head), which
    # the positional filter needs.
    prefix = ordered.select(
        "_id",
        "sz",
        F.posexplode(
            F.slice(F.transform("ord", lambda s: s["tok"]), 1, p)
        ).alias("pos", "tok"),
    )

    a, b = prefix.alias("a"), prefix.alias("b")
    # positional overlap bound: the matched token plus everything after
    # it in BOTH ordered sets
    max_overlap = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos") - 1,
        F.col("b.sz") - F.col("b.pos") - 1,
    )
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._id") < F.col("b._id"))
            # length filter: J <= min(sz)/max(sz); both orderings of the
            # pair are covered by the symmetric min/max form
            & (
                F.lit(t_den) * F.least(F.col("a.sz"), F.col("b.sz"))
                >= F.lit(t_num) * F.greatest(F.col("a.sz"), F.col("b.sz"))
            )
            # positional filter: J >= t  <=>  overlap*(t_den+t_num) >=
            # t_num*(sz_a+sz_b); drop candidates whose best-case
            # overlap can't reach it
            & (
                F.lit(t_den + t_num) * max_overlap
                >= F.lit(t_num) * (F.col("a.sz") + F.col("b.sz"))
            ),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )

    sa = sets.select(F.col("_id").alias("id_a"), F.col("_toks").alias("ta"))
    sb = sets.select(F.col("_id").alias("id_b"), F.col("_toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("long")
    uni = (F.size("ta") + F.size("tb")).cast("long") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter_size"),
            uni.alias("union_size"),
        )
        .filter(
            F.lit(t_den) * F.col("inter_size")
            >= F.lit(t_num) * F.col("union_size")
        )
        .withColumn(
            "jaccard",
            F.round(F.col("inter_size") / F.col("union_size"), 6),
        )
    )


def _global_ordered(sets: DataFrame) -> DataFrame:
    """(_id, sz, ord) per set: elements reordered under the global
    (document-frequency asc, token asc) total order — rarest first.
    Shared by the Jaccard and containment joins; the order only
    shrinks candidate fan-in, correctness never depends on it."""
    tok_df = (
        sets.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("dfreq"))
    )
    return (
        sets.select(
            "_id", F.size("_toks").alias("sz"),
            F.explode("_toks").alias("tok"),
        )
        .join(tok_df, "tok")
        .groupBy("_id", "sz")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dfreq", "tok"))
            ).alias("ord")
        )
    )


def containment_selfjoin(
    df: DataFrame,
    id_col: str,
    set_col: str,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """ASYMMETRIC near-containment: every ORDERED pair (id_a != id_b)
    with |set_a ∩ set_b| / |set_a| >= t_num/t_den — "a is mostly
    contained in b" (quote, boilerplate-subset and short-doc-in-
    long-doc detection; the directional complement of the symmetric
    Jaccard join above, which this superset does NOT bound the size
    of: b may be arbitrarily large).

    Exact, no recall loss, no n^2:

    * probe-side prefix (pigeonhole, ORDER-FREE soundness): the
      overlap must reach o = ceil(t*|a|); if none of the first
      |a| - o + 1 elements of a is shared, the shared elements all
      sit in a's remaining o - 1 — short of o. Any fixed element
      choice works, so taking the prefix under the global rarest-
      first order is purely a fan-in optimization.
    * the CONTAINER side has no sound prefix without probe-size
      bounds, so it is indexed in full — one corpus explode, the
      inverted-index shape (index.py); shingle tokens are near-
      unique, so hot-token fan-in stays structural, not quadratic.
    * size filter |b| >= ceil(t*|a|) and the positional bound
      overlap <= 1 + min(|a|-pa-1, |b|-pb-1) prune inside the join.
    * survivors verify with exact integers:
      t_den * |intersect| >= t_num * |a|.

    Returns (id_a, id_b, inter_size, size_a, size_b,
    containment_ppm) with containment_ppm = 1e6 * inter div |a|
    (truncating, engine-exact). The DuckDB twin generates candidates
    by the independent share-any-token rule, proving the prefix
    filter lost no pair.
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")

    sets = pin_exclusive(
        df.select(
            F.col(id_col).alias("_id"), F.col(set_col).alias("_toks")
        ).filter(F.size("_toks") > 0),
        site="setjoin.cont.sets",
    )
    # the reordered relation feeds TWO consumers (probe prefix +
    # full container index) — unpinned, the df aggregate + reorder
    # join would execute twice
    ordered = pin_exclusive(
        _global_ordered(sets), site="setjoin.cont.ordered"
    )

    sz = F.col("sz")
    # o = ceil(t*sz); prefix length = sz - o + 1
    p = sz - F.floor((F.lit(t_num) * sz + t_den - 1) / t_den).cast(
        "int"
    ) + 1
    probe = ordered.select(
        "_id",
        "sz",
        F.posexplode(
            F.slice(F.transform("ord", lambda s: s["tok"]), 1, p)
        ).alias("pos", "tok"),
    )
    index = ordered.select(
        "_id",
        "sz",
        F.posexplode(
            F.transform("ord", lambda s: s["tok"])
        ).alias("pos", "tok"),
    )

    a, b = probe.alias("a"), index.alias("b")
    max_overlap = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos") - 1,
        F.col("b.sz") - F.col("b.pos") - 1,
    )
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._id") != F.col("b._id"))
            # container must hold at least o = ceil(t*|a|) elements
            & (
                F.lit(t_den) * F.col("b.sz")
                >= F.lit(t_num) * F.col("a.sz")
            )
            # positional bound must still reach o
            & (
                F.lit(t_den) * max_overlap
                >= F.lit(t_num) * F.col("a.sz")
            ),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )

    sa = sets.select(
        F.col("_id").alias("id_a"), F.col("_toks").alias("ta")
    )
    sb = sets.select(
        F.col("_id").alias("id_b"), F.col("_toks").alias("tb")
    )
    inter = F.size(F.array_intersect("ta", "tb")).cast("long")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter_size"),
            F.size("ta").cast("long").alias("size_a"),
            F.size("tb").cast("long").alias("size_b"),
        )
        .filter(
            F.lit(t_den) * F.col("inter_size")
            >= F.lit(t_num) * F.col("size_a")
        )
        .withColumn(
            "containment_ppm",
            F.expr("(1000000 * inter_size) div size_a"),
        )
    )
