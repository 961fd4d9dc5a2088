"""Bounded-memory frequency / cardinality sketches (heavy hitters, KMV).

At 100 TB the two questions a curation pipeline asks of a heavy-tailed
key column (URLs, hosts, user ids, n-grams) are "which keys dominate?"
and "how many distinct keys are there?" — and the naive answers
(full groupBy, countDistinct) shuffle the ENTIRE key space. These two
operators bound that cost:

* :func:`misra_gries_heavy_hitters` — the classic 2-pass exact heavy
  hitter algorithm. Pass 1 runs Misra-Gries (SODA'82 / the "Frequent"
  algorithm) per partition inside an Arrow-batched ``mapInPandas``:
  O(capacity) memory per task regardless of the distinct-key count,
  emitting <= capacity candidate keys per partition. The averaging
  argument gives the superset guarantee: any key with global count
  > N/capacity must exceed N_p/capacity in at least one partition, so
  the candidate union contains every global heavy hitter. Pass 2
  broadcast-joins the tiny candidate set back and counts EXACTLY, so
  the result is exact (not approximate) while the only shuffle carries
  <= |candidates|+1 groups after map-side partial aggregation.

* :func:`kmv_distinct` — the K-Minimum-Values cardinality sketch
  (Bar-Yossef et al., RANDOM'02). Each partition streams its rows
  through a running "k smallest distinct 60-bit hashes" set (bounded
  O(k + batch) memory), the per-partition survivors (<= k each) merge
  into the global k minima, and the estimate is the deterministic
  integer (k-1) * 2^60 / h_k. Everything is exact integer arithmetic
  over a sha256-derived hash both engines can compute, so the DuckDB
  oracle is bit-identical — a *deterministically verifiable* sketch.

Reference parity note: the reference (a Node OCR/translate service)
has no analytics surface; these belong to the training-data-pipeline
operator families the brief requires beyond reference parity.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

#: 60-bit hash space size; 15 hex chars of sha256. Chosen so the
#: KMV numerator (k-1) * 2^60 stays far inside DECIMAL(38,0) /
#: HUGEINT range and the hash itself inside signed BIGINT.
HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS


def hash60(c: Column) -> Column:
    """First 15 hex chars of sha256 as an integer in [0, 2^60).

    Portable: DuckDB spells the same value
    ``('0x' || substr(sha256(x), 1, 15))::UBIGINT``.
    """
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")


def _mg_scan(capacity: int):
    """Per-partition Misra-Gries pass over Arrow batches, vectorized
    with the MERGE form of the sketch (Agarwal et al., "Mergeable
    Summaries", PODS'12): each batch's exact ``value_counts`` is a
    perfect MG summary of that batch, and two MG summaries merge by
    summing counters, then subtracting the (capacity+1)-th largest
    count from every entry and dropping the non-positives — which
    restores the size bound while keeping the underestimate error
    <= N/(capacity+1). That is strictly tighter than element-at-a-time
    MG's N/capacity, so the candidate-superset guarantee for the
    cnt*capacity > N threshold is preserved, and the Python work per
    batch is three pandas ops instead of a per-element dict loop
    (~100x on wide batches).
    """

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series([], dtype="int64")
        for pdf in batches:
            vc = pdf.iloc[:, 0].dropna().value_counts()
            counters = pd.concat([counters, vc]).groupby(level=0).sum()
            if len(counters) > capacity:
                kth = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters - kth
                counters = counters[counters > 0]
        # object dtype keeps Arrow's cast to the declared key type
        # valid even for an empty (e.g. all-null) partition, whose
        # default empty index would otherwise surface as int64
        yield pd.DataFrame(
            {"key": pd.Series(list(counters.index), dtype="object")}
        )

    return scan


def misra_gries_heavy_hitters(
    df: DataFrame,
    key_col: str = "key",
    capacity: int = 64,
    key_type: str = "string",
) -> DataFrame:
    """Exact heavy hitters: every key with count * capacity > N.

    Returns (key, cnt) with EXACT counts — the sketch only narrows the
    candidate set; pass 2 recounts. The N in the threshold is derived
    in-plan (a window sum over the tiny aggregated result), so the
    whole query is one deterministic DataFrame with no driver-side
    values baked in.

    Plan shape: pass 1 is a map-only Python stage emitting <= capacity
    rows per partition; pass 2 is one scan + broadcast semi-annotation
    + one hash aggregate whose map-side partial collapse bounds the
    shuffle at |candidates| + 1 groups per partition.
    """
    key = F.col(key_col)
    keyed = df.select(key.alias("key")).where(key.isNotNull())

    candidates = (
        keyed.mapInPandas(_mg_scan(capacity), schema=f"key {key_type}")
        .distinct()
        .withColumn("__cand", F.lit(True))
    )

    # One scan: non-candidate rows fold into a single NULL group so the
    # same aggregate yields both the candidate counts and (summed) N.
    annotated = keyed.join(F.broadcast(candidates), on="key", how="left")
    grouped = (
        annotated.groupBy(
            F.when(F.col("__cand"), F.col("key")).alias("key")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # grouped holds <= |candidates| + 1 rows in total, so the
    # unpartitioned window (single task) is over control-sized data.
    n_total = F.sum("cnt").over(Window.partitionBy())
    return (
        grouped.withColumn("__n", n_total)
        .where(F.col("key").isNotNull())
        .where(F.col("cnt") * F.lit(capacity) > F.col("__n"))
        .select("key", "cnt")
    )


def _kmv_scan(k: int):
    """Per-partition running k-smallest-distinct-hash pass."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kept = pd.Series([], dtype="int64")
        for pdf in batches:
            kept = (
                pd.concat([kept, pdf.iloc[:, 0].dropna().astype("int64")])
                .drop_duplicates()
                .nsmallest(k)
            )
        yield pd.DataFrame({"h": kept.reset_index(drop=True)})

    return scan


def kmv_distinct(
    df: DataFrame,
    key_col: str = "key",
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count sketch: one row
    (n_kept, kth_min, est_distinct).

    * n_kept < k  => the merged minima ARE the full distinct hash set:
      est_distinct = n_kept exactly.
    * n_kept == k => est_distinct = floor((k-1) * 2^60 / kth_min) —
      the standard (unbiased up to the -1 correction) KMV estimator,
      computed in exact DECIMAL(38,0) integer arithmetic so any engine
      reproduces it bit-for-bit.

    The merge is associative and order-independent (set-min), so the
    result is invariant to partitioning — asserted in tests.
    """
    hashed = df.select(hash60(F.col(key_col)).alias("h"))
    per_part = hashed.mapInPandas(_kmv_scan(k), schema="h long")
    # global merge: <= k rows per partition in, k rows out
    minima = per_part.distinct().orderBy("h").limit(k)

    numer = F.lit(k - 1).cast("decimal(38,0)") * F.lit(HASH_SPACE).cast(
        "decimal(38,0)"
    )
    # integral `div`, not floor(a / b): decimal division rounds
    # half-up at its result scale, so floor() of it can land one above
    # the true quotient when the exact ratio sits just under an
    # integer; `div` (IntegralDivide) truncates exactly, matching
    # DuckDB's HUGEINT `//`.
    return minima.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_min"),
    ).select(
        "n_kept",
        "kth_min",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("long"))
        .otherwise(
            F.call_function(
                "div", numer, F.col("kth_min").cast("decimal(38,0)")
            )
        )
        .alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05)
# ---------------------------------------------------------------------------


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Row-``row``'s bucket for ``key``: a sha256-derived integer both
    engines compute bit-identically (same derivation family as
    ``hash60`` / the frontier slot hash)."""
    h = F.sha2(F.concat(F.lit(f"{row}:"), key.cast("string")), 256)
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width
    ).cast("int")


def cms_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """The Count-Min cell table: (row, bucket, cell_count) with
    ``cell_count`` = total observations of every key hashing there.
    At most ``depth * width`` rows — the ENTIRE sketch state, however
    large the corpus (the point of a sketch). One explode (factor
    ``depth``, a constant) + one hash aggregate on the (row, bucket)
    key; per-partition partial aggregation collapses each partition
    to <= depth*width cells before the shuffle, so the exchange
    carries sketch-sized data, not corpus-sized."""
    key = F.col(key_col)
    rb = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rb.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("cell_count"))


def cms_estimates(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Per distinct key: the Count-Min estimate next to the exact
    count — (key, true_count, est_count, overcount). The sketch
    NEVER undercounts (each cell sums a superset of the key's own
    observations; the min over rows keeps the bound), the exact dual
    of Misra-Gries next door which never OVERcounts; ``overcount =
    est - true >= 0`` is the per-key witness. The estimate join is
    ``depth`` broadcast lookups against the <= depth*width cell
    table."""
    keys = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
    )
    # The estimates audit needs the per-key rollup anyway, and a cell's
    # count is BY DEFINITION the sum of observations of every key
    # hashing there — so the cell table is derived from `keys`
    # (sum(true_count) per (row, bucket)), value-identical to
    # cms_cells' own corpus pass while scanning the corpus ONCE
    # instead of twice (and hashing each distinct key depth times
    # instead of every row). cms_cells stands unchanged for the
    # pure sketch-build path, where no per-key table may exist.
    kb = keys.select(
        "key",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col("key"), r, width).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(
        "key",
        "true_count",
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
    )
    cells = kb.groupBy("row", "bucket").agg(
        F.sum("true_count").cast("long").alias("cell_count")
    )
    probes = kb
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("key", "true_count")
        .agg(F.min("cell_count").cast("long").alias("est_count"))
        .select(
            "key",
            "true_count",
            "est_count",
            (F.col("est_count") - F.col("true_count")).alias(
                "overcount"
            ),
        )
    )


def _group_minima(
    df: DataFrame, group_col, key_col: str, k: int
) -> DataFrame:
    """(grp, h): each group's k smallest distinct 60-bit key hashes —
    the shared derivation of group_kmv_distinct and kmv_set_overlap.
    One (group, hash) dedup shuffle + a per-group rank window. NULL
    keys are dropped (the family convention — kmv_distinct's scan and
    the KMV stream do the same; an unfiltered NULL would rank first
    under Spark's ASC NULLS FIRST and corrupt n_kept/kth_min)."""
    grp = F.col(group_col) if isinstance(group_col, str) else group_col
    return (
        df.select(
            grp.cast("string").alias("grp"),
            hash60(F.col(key_col)).alias("h"),
        )
        .filter(F.col("h").isNotNull())
        .distinct()
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("grp").orderBy(F.col("h").asc())
            ),
        )
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def group_kmv_distinct(
    df: DataFrame,
    group_col,
    key_col: str = "key",
    k: int = 64,
) -> DataFrame:
    """Per-GROUP KMV distinct-count sketch:
    (grp, n_kept, kth_min, est_distinct) — one row per group.

    The scale path for per-group cardinality ("distinct users per
    domain/day") when exact countDistinct's expand-shuffle over the
    full key set is too heavy: state per group is bounded at k hashes
    regardless of the group's true cardinality, and the estimator is
    the same exact-integer KMV form as the global
    :func:`kmv_distinct` (n_kept when the minima set is complete,
    floor((k-1) * 2^60 / kth_min) once it saturates).

    Spark shape (100 TB): dedup of (group, hash) — one shuffle on the
    uniformly mixed composite key with map-side partial collapse —
    then a rank window per group that keeps the k smallest hashes
    (the per-group dual of the global orderBy-limit; output is
    <= k rows per group BEFORE the final O(groups) aggregate). A hot
    group costs one sorted window partition over its distinct hashes,
    never a collected set.

    Deterministic: sha-derived hashes + set-minima — partition
    invariant, value-oracle-able per group.
    """
    minima = _group_minima(df, group_col, key_col, k)
    numer = F.lit(k - 1).cast("decimal(38,0)") * F.lit(HASH_SPACE).cast(
        "decimal(38,0)"
    )
    return minima.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_min"),
    ).select(
        "grp",
        "n_kept",
        "kth_min",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("long"))
        .otherwise(
            F.call_function(
                "div", numer, F.col("kth_min").cast("decimal(38,0)")
            )
        )
        .alias("est_distinct"),
    )


def kmv_set_overlap(
    df: DataFrame,
    group_col: str,
    key_col: str = "key",
    k: int = 64,
) -> DataFrame:
    """Distinct-set overlap between every pair of groups from merged
    KMV sketches (theta-sketch-style set operations, Beyer et al.
    SIGMOD'07): one row per unordered group pair (a < b) with
    (a, b, k_eff, theta, in_both, est_union, est_inter, jacc_micro).

    "How many distinct users do event types X and Y share?" at corpus
    scale: exact distinct-intersection needs a full dedup of BOTH key
    sets per pair; this needs one dedup shuffle of (group, hash) and
    then works entirely on the O(groups x k) per-group minima.

    Estimator: merge the two groups' k-minima, keep the k smallest
    distinct hashes M (theta = max M, k_eff = |M|); then
    ``est_union = (k_eff - 1) * 2^60 / theta`` and the intersection
    is scaled from the fraction of M seen in BOTH sketches:
    ``est_inter = in_both * est_union / k_eff`` (truncating integer
    division on both engines). When NEITHER group saturated its
    sketch (n_kept < k) the minima ARE the full hash sets and the
    union/intersection/Jaccard are exact — both branches live and
    value-oracle-checked. jacc_micro = est_inter * 10^6 / est_union.

    Spark shape (100 TB): the only corpus-sized work is the
    (group, hash) dedup with map-side partial collapse; pair
    construction, merge windows and flag aggregation all run on the
    bounded minima relation (groups x k rows). Deterministic:
    sha-derived hashes, set minima, integer arithmetic.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    # the minima relation (O(groups x k) rows) is referenced three
    # times below (kept, side_a, side_b); a lazy localCheckpoint makes
    # the corpus-sized dedup + rank window run ONCE instead of per
    # plan reference (blocks are released by the ContextCleaner)
    minima = _group_minima(df, group_col, key_col, k).localCheckpoint(
        eager=False
    )
    kept = minima.groupBy("grp").agg(F.count(F.lit(1)).alias("n_kept"))
    pairs = (
        kept.alias("x")
        .join(kept.alias("y"), F.col("x.grp") < F.col("y.grp"))
        .select(
            F.col("x.grp").alias("a"),
            F.col("y.grp").alias("b"),
            F.col("x.n_kept").alias("na"),
            F.col("y.n_kept").alias("nb"),
        )
    )
    side_a = pairs.join(minima, pairs.a == minima.grp).select(
        "a", "b", "na", "nb", "h",
        F.lit(1).alias("wa"), F.lit(0).alias("wb"),
    )
    side_b = pairs.join(minima, pairs.b == minima.grp).select(
        "a", "b", "na", "nb", "h",
        F.lit(0).alias("wa"), F.lit(1).alias("wb"),
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("a", "b", "na", "nb", "h")
        .agg(F.max("wa").alias("ia"), F.max("wb").alias("ib"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("a", "b").orderBy(F.col("h").asc())
            ),
        )
    )
    trunc = F.col("_rn") <= k
    agg = merged.groupBy("a", "b", "na", "nb").agg(
        # full merge of the two sketches (<= 2k rows/pair): when
        # neither sketch saturated these ARE the full hash sets
        F.count(F.lit(1)).alias("u_full"),
        F.sum(F.col("ia") * F.col("ib")).alias("both_full"),
        # k-truncated combined sketch for the estimator branch
        F.sum(F.when(trunc, 1).otherwise(0)).alias("k_eff"),
        F.max(F.when(trunc, F.col("h"))).alias("theta"),
        F.sum(F.when(trunc, F.col("ia") * F.col("ib")).otherwise(0))
        .alias("in_both"),
    )
    exact = (F.col("na") < k) & (F.col("nb") < k)
    numer = (F.col("k_eff") - 1).cast("decimal(38,0)") * F.lit(
        HASH_SPACE
    ).cast("decimal(38,0)")
    est_union = F.when(exact, F.col("u_full").cast("long")).otherwise(
        F.call_function("div", numer, F.col("theta").cast("decimal(38,0)"))
    )
    return (
        agg.select(
            "a", "b", "k_eff", "theta", "in_both",
            exact.alias("_exact"),
            F.col("both_full"),
            est_union.alias("est_union"),
        )
        .select(
            "a", "b", "k_eff", "theta", "in_both", "est_union",
            F.when(F.col("_exact"), F.col("both_full").cast("long"))
            .otherwise(
                F.call_function(
                    "div",
                    F.col("in_both").cast("decimal(38,0)")
                    * F.col("est_union").cast("decimal(38,0)"),
                    F.col("k_eff").cast("decimal(38,0)"),
                )
            )
            .alias("est_inter"),
        )
        .select(
            "a", "b", "k_eff", "theta", "in_both", "est_union",
            "est_inter",
            F.call_function(
                "div",
                F.col("est_inter").cast("decimal(38,0)")
                * F.lit(1000000),
                F.col("est_union").cast("decimal(38,0)"),
            ).alias("jacc_micro"),
        )
    )
