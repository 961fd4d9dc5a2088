"""Skip-gram training pairs with frequency-proportional negative
sampling (word2vec SGNS, Mikolov et al. NeurIPS'13).

Two pieces a distributed embedding-training data job needs:

* **Positive pairs** — (center, context) for every adjacent token pair
  within the window, both directions, generated row-locally with
  ``arrays_zip`` over shifted slices (never ``element_at`` inside a
  nested lambda — Catalyst re-evaluates the array per element; the
  word_cooccurrence lesson).
* **Negative draws** — for each positive occurrence, ``m`` words
  sampled from the unigram distribution.  The classical engine-side
  technique is an alias/CDF table: this implementation materializes
  the top-``vocab_size`` unigram CDF ``(term, lo, hi)`` — an O(V)
  driver-side prefix sum over one corpus aggregation, the same bounded
  collect as IVF centroids — and resolves each 60-bit sha-derived
  uniform draw ``u in [0, total)`` with a BROADCAST range join
  (``lo <= u < hi``).  The draw key is (doc_id, position, direction,
  slot), so sampling is deterministic, reproducible under
  partitioning, and i.i.d. across occurrences.  Mikolov's count^0.75
  smoothing is deliberately NOT applied: the 3/4 power is irrational,
  and exact integer weights keep the operator value-oracle-checkable;
  plug a smoothed weight column into the same CDF if ulps don't
  matter.

Out-of-vocabulary tokens (rank > vocab_size) drop out of both the
center and context side — standard vocab truncation.

Scale shape: one token-explode aggregation for the vocab, one
row-local pair explode, one broadcast semi-filter per pair side, one
broadcast range join for the negatives, one final hash aggregation.
The only non-broadcast shuffles touch (term)- or (center, word)-keyed
aggregates — uniform keys.  Reference parity note: the reference has
no training-pair generator; this extends the training-data family
(word_cooccurrence, nsp_pairs, contrastive_triplets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unigram_cdf(
    docs: DataFrame,
    tokens_col,
    vocab_size: int,
) -> list[tuple[str, int, int]]:
    """Top-``vocab_size`` unigram CDF as [(term, lo, hi)], ordered by
    (count desc, term asc); ``hi - lo`` = corpus count.  O(V) driver
    state from ONE corpus aggregation."""
    counts = (
        docs.select(F.explode(tokens_col).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(vocab_size)
        .collect()
    )
    cdf, lo = [], 0
    for r in counts:
        cdf.append((r["term"], lo, lo + r["cnt"]))
        lo += r["cnt"]
    return cdf


def skipgram_negsamp(
    docs: DataFrame,
    tokens_col,
    vocab_size: int = 16,
    negatives_per_pair: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """(center, word, label, n_pairs): label 1 rows are adjacent
    skip-gram positives (both directions), label 0 rows the
    deterministic unigram-CDF negative draws — ``negatives_per_pair``
    per positive occurrence."""
    if negatives_per_pair < 0:
        raise ValueError("negatives_per_pair must be >= 0")
    spark = docs.sparkSession
    cdf = unigram_cdf(docs, tokens_col, vocab_size)
    if not cdf:
        return spark.createDataFrame(
            [], "center string, word string, label int, n_pairs long"
        )
    total = cdf[-1][2]
    vocab = spark.createDataFrame(
        cdf, "term string, lo long, hi long"
    )

    t = tokens_col
    n = F.size(t)
    zipped = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(t, 1, n - 1).alias("a"),
            F.slice(t, 2, n - 1).alias("b"),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    adj = docs.select(
        F.col(id_col).alias("_id"), F.posexplode(zipped).alias("i", "p")
    ).select(
        "_id",
        (F.col("i") + 1).alias("pos"),  # 1-based left-token position
        F.col("p.a").alias("a"),
        F.col("p.b").alias("b"),
    )
    pairs = adj.select(
        "_id", "pos", F.lit("f").alias("dir"),
        F.col("a").alias("center"), F.col("b").alias("word"),
    ).unionByName(
        adj.select(
            "_id", "pos", F.lit("b").alias("dir"),
            F.col("b").alias("center"), F.col("a").alias("word"),
        )
    )
    # vocab truncation: both sides must be in the top-V vocab
    in_vocab = pairs.join(
        F.broadcast(vocab.select(F.col("term").alias("center"))),
        "center",
    ).join(
        F.broadcast(vocab.select(F.col("term").alias("word"))),
        "word",
    )

    positives = in_vocab.groupBy("center", "word").agg(
        F.count("*").alias("n_pairs")
    ).withColumn("label", F.lit(1))

    if negatives_per_pair:
        draws = in_vocab.select(
            "center", "_id", "pos", "dir",
            F.explode(
                F.sequence(F.lit(0), F.lit(negatives_per_pair - 1))
            ).alias("slot"),
        ).withColumn(
            "u",
            F.expr(
                "cast(conv(substr(sha2(concat('neg:', cast(_id as string),"
                " ':', cast(pos as string), ':', dir, ':',"
                " cast(slot as string)), 256), 1, 15), 16, 10) as bigint)"
            )
            % F.lit(int(total)),
        )
        negatives = (
            draws.join(
                F.broadcast(vocab),
                (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")),
            )
            .groupBy("center", F.col("term").alias("word"))
            .agg(F.count("*").alias("n_pairs"))
            .withColumn("label", F.lit(0))
        )
        out = positives.unionByName(negatives)
    else:
        out = positives
    return out.select("center", "word", "label", "n_pairs")
