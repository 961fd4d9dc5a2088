"""Exact edit-distance similarity self-join (PassJoin-style).

Finds every unordered pair of rows whose strings are within Levenshtein
distance ``k`` — EXACTLY (no recall loss) — without a cross join, using
the pigeonhole segment filter of PassJoin (Li, Deng, Feng, "PASS-JOIN: a
partition-based method for similarity joins", PVLDB 5(3), 2011):

  If ed(a, b) <= k and a is partitioned into k+1 contiguous segments,
  then at least one segment of a occurs EXACTLY as a contiguous
  substring of b (an optimal alignment spends its <= k edits across
  k+1 segments, so one segment is edit-free), and its position in b is
  shifted from its position in a by at most k.

Spark shape (the part that matters at 100 TB):

  * index side  — each string of length L >= k+1 emits its k+1
    segments keyed ``(L, i, segment)``: k+1 rows per input row.
  * probe side  — each string of length M emits, for every candidate
    partner length L in [max(k+1, M-k), M] and every segment slot i,
    the substrings of itself at the allowed (position ± k) window:
    O((k+1)^2 * (2k+1)) short substrings per row (~45 for k=2).
  * candidates  — ONE hash equi-join on ``(L, i, substring)``; pairs
    are normalised (lo, hi) and deduplicated; a final columnar
    ``levenshtein(s_lo, s_hi, k)`` verify keeps true pairs and yields
    the exact distance.  Everything is explode + equi-join + hash
    distinct on uniform short keys — bucketable and shuffle-bounded by
    candidate count, never |rows|^2.
  * pairs are generated with the index on the shorter-or-equal string
    (probe only looks DOWN in length), so each unequal-length pair is
    produced from one direction only; equal-length pairs arrive from
    both directions and collapse in the distinct.

Strings shorter than k+1 cannot be segmented (a segment would be
empty); every pair involving one has BOTH lengths <= 2k (the partner is
within k), so they are resolved by a brute-force leg over the tiny
``length <= 2k`` subset (broadcast self-join).  Degenerate corpora that
are mostly such micro-strings should use a smaller k.

Hot-key note: a corpus with a heavily repeated template substring makes
one ``(L, i, substring)`` key hot.  AQE skew-join handles moderate skew;
for adversarial corpora apply the same bucket-cap pattern the LSH
family uses (functions/_lsh_common.py) before the candidate join.

Reference parity: the reference pipeline has no similarity join — this
is part of the training-data curation surface (fuzzy dedup of titles /
short fields) layered on the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _segments_expr(k: int, len_col: str, s_col: str) -> str:
    """SQL expr: array<struct<i,seg>> — the k+1 PassJoin segments of
    ``s_col`` (length ``len_col`` >= k+1).

    Convention (mirrored exactly by the probe side): with
    base = L div (k+1), rem = L mod (k+1), the FIRST k+1-rem segments
    have length ``base`` and the LAST rem have ``base + 1``.
    start(i) = i*base + max(0, i - (k+1-rem)).
    """
    p = k + 1
    return f"""
      transform(sequence(0, {k}), i -> struct(
        i AS i,
        substring({s_col},
          i * ({len_col} div {p})
            + greatest(0, i - ({p} - {len_col} % {p})) + 1,
          ({len_col} div {p})
            + if(i >= {p} - {len_col} % {p}, 1, 0)) AS seg))
    """


def _probe_expr(
    k: int, len_col: str, s_col: str, extend_up: bool = False
) -> str:
    """SQL expr: array<struct<L,i,sub>> — all substrings of ``s_col``
    that could equal segment i of a partner of length L, for
    L in [max(k+1, M-k), M] (shorter-or-equal partners only — the
    self-join case, where each pair is generated from its longer
    member) or [max(k+1, M-k), M+k] when ``extend_up`` (the two-table
    case, where only one side is indexed so the probe must look both
    up and down in length), and start positions within ±k of the
    partner segment's start (clamped to the string).  The ±k window is
    the sound simplification of PassJoin's tighter per-slot bound: any
    edit-free segment's shift is bounded by the total number of edits,
    <= k.
    """
    p = k + 1
    up = f"{len_col} + {k}" if extend_up else len_col
    # Partner-segment geometry as functions of (L, i); kept as inline
    # SQL so Catalyst folds it per lambda element (3x3 elements).
    st = f"(i * (L div {p}) + greatest(0, i - ({p} - L % {p})))"
    sl = f"((L div {p}) + if(i >= {p} - L % {p}, 1, 0))"
    lo = f"greatest(0, {st} - {k})"
    hi = f"least({len_col} - {sl}, {st} + {k})"
    return f"""
      flatten(transform(
        if({up} < greatest({p}, {len_col} - {k}), array(),
           sequence(greatest({p}, {len_col} - {k}), {up})), L ->
        flatten(transform(sequence(0, {k}), i ->
          transform(
            if({hi} < {lo}, array(), sequence({lo}, {hi})),
            pos -> struct(L AS L, i AS i,
                          substring({s_col}, pos + 1, {sl}) AS sub))))))
    """


def edit_distance_self_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "s",
    k: int = 2,
) -> DataFrame:
    """All pairs (doc_a < doc_b, dist) with levenshtein <= k — exact.

    ``df`` must have one row per id; ``text_col`` is the (short)
    string to compare.  Returns columns (doc_a, doc_b, dist).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    p = k + 1

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_s"),
        F.length(text_col).alias("_len"),
    )

    long_side = base.filter(F.col("_len") >= p)

    idx = long_side.select(
        "_id", "_s", "_len",
        F.explode(F.expr(_segments_expr(k, "_len", "_s"))).alias("e"),
    ).select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("s_a"),
        F.col("_len").alias("L"),
        F.col("e.i").alias("i"),
        F.col("e.seg").alias("seg"),
    )

    probe = long_side.select(
        "_id", "_s",
        F.explode(F.expr(_probe_expr(k, "_len", "_s"))).alias("e"),
    ).select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("s_b"),
        F.col("e.L").alias("L"),
        F.col("e.i").alias("i"),
        F.col("e.sub").alias("seg"),
    )

    cand = idx.join(probe, ["L", "i", "seg"]).filter(
        F.col("id_a") != F.col("id_b")
    )

    # Short-string leg: every pair with a member of length < k+1 has
    # both lengths <= 2k; brute-force that tiny subset (broadcast).
    shorts = base.filter(F.col("_len") <= 2 * k)
    s_a = shorts.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
        F.col("_len").alias("_la"),
    )
    s_b = shorts.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("s_b"),
        F.col("_len").alias("_lb"),
    )
    short_cand = s_a.join(F.broadcast(s_b), F.col("id_a") != F.col("id_b")).filter(
        # at least one member is un-segmentable; longer-both pairs are
        # already covered (exactly) by the main leg
        (F.col("_la") < p) | (F.col("_lb") < p)
    ).select("id_a", "s_a", "id_b", "s_b")

    pairs = (
        cand.select("id_a", "s_a", "id_b", "s_b")
        .unionByName(short_cand)
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_a"))
            .otherwise(F.col("s_b")).alias("s_lo"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_b"))
            .otherwise(F.col("s_a")).alias("s_hi"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    dist = F.levenshtein("s_lo", "s_hi", k)
    return (
        pairs.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("doc_a", "doc_b", F.col("dist").cast("int").alias("dist"))
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 2,
    left_id: str = "doc_id",
    left_text: str = "s",
    right_id: str = "doc_id",
    right_text: str = "s",
) -> DataFrame:
    """Two-table (R-S) exact edit-distance join: every (left, right)
    pair within Levenshtein distance ``k`` — fuzzy decontamination /
    fuzzy lookup against a reference set.

    Same PassJoin machinery as the self-join, but only the LEFT side is
    indexed, so the RIGHT side probes both UP and DOWN in length
    (L in [max(k+1, M-k), M+k]) instead of relying on pair symmetry.
    Left strings too short to segment (length <= k) can only match
    right strings of length <= 2k — both micro-subsets are resolved by
    a broadcast brute-force leg.  Output: (id_l, id_r, dist).

    At scale the LEFT is naturally the big corpus and the RIGHT the
    (often broadcast-able) reference set, but the candidate join is a
    hash equi-join on (L, slot, substring) either way.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    p = k + 1

    lbase = left.select(
        F.col(left_id).alias("id_l"),
        F.col(left_text).alias("s_l"),
        F.length(left_text).alias("_ll"),
    )
    rbase = right.select(
        F.col(right_id).alias("id_r"),
        F.col(right_text).alias("s_r"),
        F.length(right_text).alias("_lr"),
    )

    idx = lbase.filter(F.col("_ll") >= p).select(
        "id_l", "s_l",
        F.col("_ll").alias("L"),
        F.explode(F.expr(_segments_expr(k, "_ll", "s_l"))).alias("e"),
    ).select(
        "id_l", "s_l", "L",
        F.col("e.i").alias("i"),
        F.col("e.seg").alias("seg"),
    )

    probe = rbase.select(
        "id_r", "s_r",
        F.explode(
            F.expr(_probe_expr(k, "_lr", "s_r", extend_up=True))
        ).alias("e"),
    ).select(
        "id_r", "s_r",
        F.col("e.L").alias("L"),
        F.col("e.i").alias("i"),
        F.col("e.sub").alias("seg"),
    )

    cand = idx.join(probe, ["L", "i", "seg"]).select(
        "id_l", "s_l", "id_r", "s_r"
    )

    short_l = lbase.filter(F.col("_ll") < p).select("id_l", "s_l")
    short_r = rbase.filter(F.col("_lr") <= 2 * k).select("id_r", "s_r")
    short_cand = short_l.crossJoin(F.broadcast(short_r))

    dist = F.levenshtein("s_l", "s_r", k)
    return (
        cand.unionByName(short_cand)
        .dropDuplicates(["id_l", "id_r"])
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_l", "id_r", F.col("dist").cast("int").alias("dist"))
    )
