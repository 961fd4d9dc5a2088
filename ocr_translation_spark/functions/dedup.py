"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the whole point of each design):

* ``exact_dedup`` — one shuffle on a uniformly distributed content
  hash; the canonical survivor is the min doc_id per hash group.
* ``minhash_near_dup_pairs`` — shingle -> K minhashes -> B bands; a
  candidate pair must share a (band, band-hash) bucket, so the join is
  an equi-join on bucket keys (never an all-pairs cross join). Bucket
  fan-out is bounded by banding; verification re-checks true shingle
  Jaccard only on candidates. This is the standard web-dedup pipeline
  (MinHashLSH as in Broder '97 / MMDS ch.3) expressed in DataFrame ops.
* ``simhash64`` — 64-bit hyperplane-free SimHash: per-token 64-bit
  hashes vote bitwise; near-dups share most bits. Columnar (bit tricks
  via aggregate over the token array), no Python.
* ``ngram_jaccard`` — exact verify metric over shingle sets
  (array_intersect / array_union).

All operators work on a flat ``(id, text)`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalized_text


def content_hash(text: Column) -> Column:
    return F.sha2(normalized_text(text), 256)


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One survivor per distinct normalized text: (h, keep_id, n_dups)."""
    return (
        df.select(
            F.col(id_col).cast("long").alias("_id"), content_hash(F.col(text_col)).alias("h")
        )
        .groupBy("h")
        .agg(
            F.min("_id").alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of normalized text (short texts
    fall back to the whole normalized string as one shingle).

    Built with zip_with over shifted slices rather than per-index
    element_at lambdas: zip_with evaluates its array arguments ONCE,
    while expressions referenced inside a lambda body are re-evaluated
    per element (Catalyst has no CSE across lambda boundaries) — the
    naive form re-tokenizes the text O(n*k) times per row.
    """
    norm = normalized_text(text)
    toks = F.split(norm, " ")
    n = F.size(toks)
    grams = toks
    for j in range(1, k):
        shifted = F.when(n > j, F.slice(toks, j + 1, n - j)).otherwise(
            F.array().cast("array<string>")
        )
        # F.concat (not concat_ws): a null operand must null the gram
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    grams = F.filter(grams, lambda g: g.isNotNull())
    return F.array_distinct(F.when(n < k, F.array(norm)).otherwise(grams))


def minhash_signature(sh: Column, n_hashes: int = 32) -> Column:
    """K independent minhashes: min over xxhash64(shingle, seed_i)."""
    def _seeded(i):
        # closure factory: a (s, i=i) lambda has arity 2, which transform
        # treats as (element, array_index) — the seed would be clobbered
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[
            F.array_min(F.transform(sh, _seeded(i))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold.

    LSH banding: rows_per_band = n_hashes // bands; a pair is a
    candidate iff some band's minhash slice matches exactly.
    """
    assert n_hashes % bands == 0
    rpb = n_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), shingle_k).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))

    # Band join on ids ONLY — shingle arrays must not ride through the
    # band shuffle (they would be duplicated `bands` times); they are
    # joined back just for the candidate pairs, which are few.
    banded = base.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("sig")[b * rpb + r] for r in range(rpb)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.select(F.col("_id").alias("id_a"), "band", "band_hash")
    right = banded.select(F.col("_id").alias("id_b"), "band", "band_hash")
    cand_ids = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_tbl = base.select("_id", "sh")
    cand = cand_ids.join(
        sh_tbl.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a")),
        "id_a",
    ).join(
        sh_tbl.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard(
    df_pairs: DataFrame, text_a: str, text_b: str, k: int = 3
) -> Column:
    a, b = shingles(F.col(text_a), k), shingles(F.col(text_b), k)
    return F.round(
        F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b)), 6
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash of the token multiset, fully columnar.

    For each bit position, tokens vote +1/-1 by their xxhash64 bit;
    the output bit is 1 when the vote sum is positive.

    Single-pass shape: one aggregate with an array<long>[64] vote
    accumulator. (64 separate aggregates would each recompute the
    token-hash array -- Catalyst does not CSE across them.) Bits are
    tested with mask literals because shift functions take only
    Python-int shift amounts. Project the result ONCE (withColumn)
    rather than referencing it repeatedly.
    """
    toks = F.split(normalized_text(text), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    masks = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(2 ** 63)).cast("long")
            for i in range(64)
        ]
    )
    zeros = F.array_repeat(F.lit(0).cast("long"), 64)
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(
                    h.bitwiseAND(m) != 0, F.lit(1).cast("long")
                ).otherwise(F.lit(-1).cast("long")),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
