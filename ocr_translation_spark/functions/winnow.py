"""Winnowing document fingerprints over a rolling polynomial hash
(Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003; the MOSS algorithm).

The rolling-hash fingerprint family the brief calls for: hash every
k-gram of CHARACTERS with a polynomial rolling hash, slide a window of
w consecutive gram-hashes, keep each window's minimum — the guarantee
is that any shared substring of length >= k + w - 1 between two
documents yields at least one identical fingerprint, while storing
only ~2/(w+1) of the gram hashes. Character-level grams (not token
shingles) make the fingerprint robust to tokenization differences —
the property sha-shingle fingerprints (functions/text.add_fingerprint)
don't have.

Arithmetic is EXACT integer polynomial evaluation mod a 31-bit prime
(products stay < 2^39, far inside BIGINT), so the DuckDB twin
reproduces every fingerprint bit-for-bit.

Spark shape: completely row-local — one projection computing nested
higher-order functions over the codepoint array (whole-stage codegen,
O(n*k + n*w) integer ops per document, no Python, no shuffle at any
corpus size). The codepoint and gram-hash arrays are materialized as
named columns so multi-referenced subtrees are computed once per row
(the classifier.py lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MOD = 1_000_000_007  # 31-bit prime: (MOD-1)*257 + c < 2^39
BASE = 257


def winnowing_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """(id, n_fingerprints, min_fp, fp_sha256): the winnowed
    fingerprint set per document, summarized as its size, minimum, and
    the sha256 of the comma-joined sorted distinct fingerprint values
    (a stable set digest two engines agree on).

    Documents shorter than k + w - 1 characters have no full winnow
    window: n_fingerprints = 0, min_fp / fp_sha256 NULL."""
    # codepoint array, materialized once; 1-based char walk via
    # substr — identical semantics in DuckDB (ord(text[i])), avoiding
    # split('')'s engine-specific empty-edge behavior
    # sequence(1, 0) DESCENDS ([1, 0]) and ascii('') = 0, so an empty
    # document would fabricate a phantom [0, 0] codepoint array —
    # masked by the n >= k guard at the default k, but wrong for
    # k <= 2. Guard the empty case explicitly.
    with_cs = df.withColumn(
        "__cs",
        F.when(
            F.length(text_col) > 0,
            F.transform(
                F.sequence(F.lit(1), F.length(text_col)),
                lambda i: F.ascii(
                    F.col(text_col).substr(i, F.lit(1))
                ).cast("long"),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )
    n = F.size(F.col("__cs"))
    # gram hashes: h(i) = fold of k codepoints, (acc*BASE + c) % MOD
    with_gh = with_cs.withColumn(
        "__gh",
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.aggregate(
                    F.slice(F.col("__cs"), i, k),
                    F.lit(0).cast("long"),
                    lambda acc, c: (acc * BASE + c) % MOD,
                ),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )
    m = F.size(F.col("__gh"))
    # winnow: minimum of each window of w consecutive gram hashes
    fps = F.when(
        m >= w,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), m - (w - 1)),
                    lambda j: F.array_min(
                        F.slice(F.col("__gh"), j, w)
                    ),
                )
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    with_fps = with_gh.withColumn("__fps", fps)
    nf = F.size(F.col("__fps"))
    return with_fps.select(
        F.col(id_col),
        nf.cast("long").alias("n_fingerprints"),
        F.when(nf > 0, F.array_min(F.col("__fps"))).alias("min_fp"),
        F.when(
            nf > 0,
            F.sha2(
                F.array_join(
                    F.transform(
                        F.col("__fps"),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ),
                256,
            ),
        ).alias("fp_sha256"),
    )
