"""Sorted-neighborhood blocking for record linkage (merge/purge,
Hernandez & Stolfo SIGMOD'95).

The third classic candidate-generation strategy next to LSH
(minhash/simhash) and prefix filtering (setsim_join): sort the corpus
by a domain blocking key and compare each record only to its w-1
successors in sort order. Near-identical records sort adjacently, so
a tiny window finds them at O(n*w) candidate cost — no token explode
at all, which makes SNM the cheapest generator when a good sort key
exists (normalized text, name+zip, URL).

The scale problem is the GLOBAL rank: a row_number() over an
unpartitioned window is a single-task bottleneck. The distributed
form used here:

1. bucket every row by a PREFIX of the blocking key — prefix order is
   consistent with key order, so (bucket, key) sorts identically to
   key;
2. count rows per bucket: one tiny aggregate, collected to the driver
   (O(distinct prefixes), bounded by construction);
3. global_rank = cumulative offset of the bucket (a broadcast-mapped
   literal) + row_number() within the bucket — every window runs
   per-bucket, parallel, no global sort;
4. neighbor candidates: explode d in 1..w-1 and equi-join rank ==
   rank + d — shuffle on integers, fan-out exactly (w-1) per row.

Determinism: sort order is (key, id) so ties cannot reorder between
engines; the DuckDB twin uses a plain global row_number() — an
INDEPENDENT formulation whose value match proves the bucket-offset
rank correct.

Cross-engine exactness requires the blocking key to order identically
in both engines; keys built from ASCII-safe normalizations (the repo's
``normalized_text``) satisfy this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_rank_by(
    df: DataFrame,
    key: str,
    id_col: str,
    prefix_len: int = 2,
    rank_col: str = "rank",
) -> DataFrame:
    """Dense 1-based global rank under (key, id) order, computed with
    per-bucket windows + driver-side cumulative offsets — no
    single-task global sort. O(distinct key prefixes) driver state."""
    b = df.withColumn("_bkt", F.substring(F.col(key), 1, prefix_len))
    counts = sorted(
        b.groupBy("_bkt").count().collect(), key=lambda r: r["_bkt"]
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_bkt"]] = acc
        acc += r["count"]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_bkt").orderBy(F.col(key), F.col(id_col))
    return b.withColumn(
        rank_col,
        (off[F.col("_bkt")] + F.row_number().over(w)).cast("long"),
    ).drop("_bkt")


def sorted_neighborhood_pairs(
    df: DataFrame,
    key: str,
    id_col: str,
    window: int = 3,
    prefix_len: int = 2,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Candidate pairs (id_a, id_b, rank_dist) whose global sort ranks
    under (key, id) differ by less than ``window``. id_a/id_b follow
    sort order (rank_a < rank_b).

    ``carry`` names payload columns of ``df`` to ride through the rank
    equi-join and come back suffixed ``_a``/``_b`` — downstream pair
    scorers (``linkage.record_linkage_fs``) get their comparison
    attributes without any join-back, so scoring adds zero shuffles on
    top of blocking. Carry comparison fields only, never the raw
    document payload."""
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_rank_by(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(key).alias("_key"),
            *[F.col(c) for c in carry],
        ),
        key="_key",
        id_col="_id",
        prefix_len=prefix_len,
    )
    a = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("rank").alias("rank_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
        F.explode(
            F.sequence(F.lit(1), F.lit(window - 1))
        ).alias("_d"),
    ).withColumn("_rank_b", F.col("rank_a") + F.col("_d"))
    b = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("rank").alias("_rank_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    return a.join(b, "_rank_b").select(
        "id_a",
        "id_b",
        F.col("_d").cast("int").alias("rank_dist"),
        *[F.col(f"{c}_a") for c in carry],
        *[F.col(f"{c}_b") for c in carry],
    )
