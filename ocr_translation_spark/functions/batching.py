"""Inference-batching padding-waste accounting (length bucketing).

Batched transformer inference pads every sequence in a batch to the
batch max, so batch composition decides how much compute is spent on
pad tokens. This operator quantifies that: assemble fixed-size
batches under a POLICY (arrival order vs length-sorted), charge each
batch ``rows_in_batch * max_len`` padded tokens, and report per
policy the exact totals and waste share — the measurable case for
length-sorted batching, and the serving-side dual of
:mod:`.packing` (which packs TRAINING sequences; this accounts
INFERENCE batches).

Everything is exact integer arithmetic (counts, token sums,
``waste_ppm = (padded - real) * 1e6 div padded``).

Spark shape (100 TB):
  Ranks are computed with :func:`..functions.blocking.global_rank_by`
  — per-bucket windows + driver-side cumulative bucket offsets
  (O(distinct 2-char prefixes) driver state), NEVER a single-task
  global sort; the lexicographic bucket key is the zero-padded sort
  value, so string order == numeric order. Per policy that is one
  bucket-keyed window shuffle, then one (policy, batch) aggregate and
  one O(batches) rollup. The DuckDB twin ranks with a plain window —
  an INDEPENDENT formulation, so a value match re-proves the bucket-
  offset rank (the snm_candidate_pairs discipline).

Reference parity note: the reference OCRs one upload per BullMQ job
(`src/queues/ocr.js`) — batch composition never arises; at corpus
scale it dominates inference cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .blocking import global_rank_by


def _policy_stats(
    ranked: DataFrame, policy: str, batch_size: int
) -> DataFrame:
    batches = (
        ranked.select(
            F.call_function(
                "div", F.col("rank") - F.lit(1), F.lit(batch_size)
            ).alias("_batch"),
            F.col("_len"),
        )
        .groupBy("_batch")
        .agg(
            F.count(F.lit(1)).alias("_rows"),
            F.sum("_len").alias("_real"),
            F.max("_len").alias("_mx"),
        )
    )
    return batches.agg(
        F.lit(policy).alias("policy"),
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("_real").cast("long").alias("real_tokens"),
        F.sum(F.col("_rows") * F.col("_mx")).cast("long").alias(
            "padded_tokens"
        ),
    ).select(
        "policy",
        "n_batches",
        "real_tokens",
        "padded_tokens",
        F.call_function(
            "div",
            (F.col("padded_tokens") - F.col("real_tokens"))
            * F.lit(1_000_000),
            F.col("padded_tokens"),
        ).alias("waste_ppm"),
    )


def batching_waste(
    df: DataFrame,
    len_expr: Column,
    id_col: str = "doc_id",
    batch_size: int = 32,
) -> DataFrame:
    """(policy, n_batches, real_tokens, padded_tokens, waste_ppm) for
    the two batching policies over ``df``:

    * ``arrival`` — batches cut in id order (the naive stream);
    * ``sorted``  — batches cut in (length, id) order, so each batch
      holds near-equal lengths and the per-batch max is tight.

    ``len_expr`` is the per-row sequence length (e.g. a token count);
    rows with length NULL are excluded. Note the comparison is
    EMPIRICAL, not a theorem: for full batches sorted grouping
    minimizes the sum of batch maxima (a majorization argument), but
    the REMAINDER batch can flip it when the arrival order is already
    length-grouped (e.g. lengths [10,10,1] at B=2: arrival pads 21,
    sorted 30) — which is exactly why this operator reports measured
    totals instead of assuming the sorted policy wins.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1 (got {batch_size})")
    # persisted ONCE: each global_rank_by drives a driver-side bucket
    # count collect and the policy aggregate scans again — without the
    # cache the token-length projection runs over the corpus 4x
    base = (
        df.select(
            F.col(id_col).alias("_id"), len_expr.cast("long").alias("_len")
        )
        .filter(F.col("_len").isNotNull())
        .persist()
    )

    def _bounded(col: Column, limit: int, what: str) -> Column:
        # F.lpad silently TRUNCATES values wider than the pad, which
        # would reorder the sort keys, not just skew buckets — so the
        # bound is enforced in-plan, on the violating rows only (the
        # guard lives INSIDE the key expression: a side column would
        # be pruned by Catalyst and never evaluated).
        return F.when(
            (col >= 0) & (col < limit), col.cast("string")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"batching_waste: {what} out of [0, {limit}): "),
                    col.cast("string"),
                )
            )
        )
    # zero-padded sort keys: lexicographic bucket order == numeric,
    # valid ONLY while values fit the pad width (enforced above —
    # ids < 1e10, lengths < 1e6 tokens; wider corpora raise loudly
    # and the pads/prefixes get widened together). prefix_len picks
    # the rank-bucket granularity (global_rank_by windows per key
    # prefix): 5 of 10 id digits = one bucket per 1e5 ids; 4 of 6
    # length digits = one bucket per 100 length units — a SKEWED
    # length distribution concentrates buckets (rank values
    # unaffected, window parallelism suffers).
    arrival = global_rank_by(
        base.withColumn(
            "_k",
            F.lpad(_bounded(F.col("_id"), 10**10, "id"), 10, "0"),
        ),
        key="_k",
        id_col="_id",
        prefix_len=5,
    )
    slen = global_rank_by(
        base.withColumn(
            "_k",
            F.concat(
                F.lpad(_bounded(F.col("_len"), 10**6, "length"), 6, "0"),
                F.lit(":"),
                F.lpad(_bounded(F.col("_id"), 10**10, "id"), 10, "0"),
            ),
        ),
        key="_k",
        id_col="_id",
        prefix_len=4,
    )
    return _policy_stats(arrival, "arrival", batch_size).unionByName(
        _policy_stats(slen, "sorted", batch_size)
    )
