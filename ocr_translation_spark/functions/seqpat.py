"""Sequential pattern mining: level-wise GSP support counting.

Frequent-subsequence mining over per-session ordered symbol sequences
(GSP, Srikant & Agrawal EDBT'96; PrefixSpan counts the same patterns).
A pattern ``(a, b, c)`` is *contained* in a session iff its symbols
appear in that order with arbitrary gaps; support = number of distinct
sessions containing the pattern.  This is the ORDERED complement of
the unordered itemset miner (``functions/assoc.py``) and strictly more
general than the adjacent-only transition counts in
``functions/markov.py``.

Spark shape (scale contract):

* ONE session-key shuffle builds the per-session ordered symbol array
  (``sort_array`` over ``collect_list(struct(order..., symbol))`` —
  collect_list is unordered, the struct sort restores determinism).
  The array relation is persisted and reused by every level.
* Level 1 is one hash aggregation over ``explode(array_distinct(...))``.
* Levels ``2..max_len`` follow the Apriori/GSP candidate discipline:
  candidates are generated DRIVER-SIDE from the previous frequent
  level (every length-(L-1) subsequence of a candidate must itself be
  frequent — lossless for gapped subsequences because containment is
  monotone), broadcast as an array literal, and counted with ONE hash
  aggregation per level.  Containment is a row-local ``aggregate``
  fold (pointer advances on match) — whole-stage codegen, zero Python.
* Driver state is O(frequent patterns), the same bounded-collect
  discipline as ``sketches.heavy_hitters`` and
  ``collocations``/``bpe_train_merges``; ``max_alphabet`` guards the
  candidate cross-product loudly instead of letting a high-cardinality
  symbol column explode it silently.

Reference parity note: the reference pipeline has no sequence miner —
this is part of the training-data/analytics extension family, like the
association-rule and Markov-transition operators beside it.

The DuckDB oracle twin is deliberately INDEPENDENT: it counts
containment by regex over the delimited session string
(``,a,(.*,)?b,``) across the FULL alphabet cross-product — no Apriori,
no fold — so value equality also proves the pruning lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel


def contains_subsequence(seq: Column, pattern: Column) -> Column:
    """True iff ``pattern`` (array) is a gapped subsequence of ``seq``
    (array): one left-to-right fold, pointer advances on match."""
    return (
        F.aggregate(
            seq,
            F.lit(0),
            lambda acc, x: F.when(
                (acc < F.size(pattern))
                & (x == F.element_at(pattern, acc + 1)),
                acc + 1,
            ).otherwise(acc),
        )
        == F.size(pattern)
    )


def _level_subpatterns(pat: tuple) -> set:
    """Every length-(n-1) subsequence (drop one position)."""
    return {pat[:i] + pat[i + 1:] for i in range(len(pat))}


def frequent_sequences(
    events: DataFrame,
    session_cols: list[str],
    order_cols: list[str],
    symbol_col: str,
    min_support_ppm: int,
    max_len: int = 3,
    max_alphabet: int = 256,
) -> DataFrame:
    """(pattern, length, support) for every gapped subsequence of
    length 1..``max_len`` contained in at least
    ``min_support_ppm`` ppm of sessions (exact cross-multiplied
    integer threshold: ``support * 1e6 >= ppm * n_sessions``).

    ``pattern`` is the '>'-joined symbol string.  Raises if more than
    ``max_alphabet`` symbols are frequent — the candidate space is
    O(|L1|^max_len) before pruning and must stay broadcastable.
    """
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    spark = events.sparkSession
    sym = F.col(symbol_col)
    seqs = (
        events.filter(sym.isNotNull())
        .groupBy(*session_cols)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        *[F.col(c).alias(f"_o{i}")
                          for i, c in enumerate(order_cols)],
                        sym.alias("_s"),
                    )
                )
            ).alias("evs")
        )
        .select(F.transform("evs", lambda e: e["_s"]).alias("seq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        n_sessions = seqs.count()

        def _is_frequent_expr(support_col: Column) -> Column:
            return (
                support_col * F.lit(1_000_000)
                >= F.lit(int(min_support_ppm)) * F.lit(int(n_sessions))
            )

        l1_rows = (
            seqs.select(
                F.explode(F.array_distinct("seq")).alias("s")
            )
            .groupBy("s")
            .agg(F.count("*").alias("support"))
            .filter(_is_frequent_expr(F.col("support")))
            .collect()
        )
        if len(l1_rows) > max_alphabet:
            raise ValueError(
                f"{len(l1_rows)} frequent symbols exceed max_alphabet="
                f"{max_alphabet}; raise the support threshold or the cap"
            )
        result: list[tuple[str, int, int]] = [
            (r["s"], 1, r["support"]) for r in l1_rows
        ]
        l1_syms = sorted(r["s"] for r in l1_rows)
        prev: dict[tuple, int] = {(r["s"],): r["support"] for r in l1_rows}

        for level in range(2, max_len + 1):
            cands = [
                p + (s,)
                for p in sorted(prev)
                for s in l1_syms
                if all(q in prev for q in _level_subpatterns(p + (s,)))
            ]
            if not cands:
                break
            cand_lit = F.array(
                *[
                    F.array(*[F.lit(s) for s in c]).alias("p")
                    for c in cands
                ]
            )
            counted = (
                seqs.select(
                    F.explode(
                        F.filter(
                            cand_lit,
                            lambda p: contains_subsequence(
                                F.col("seq"), p
                            ),
                        )
                    ).alias("pat")
                )
                .groupBy("pat")
                .agg(F.count("*").alias("support"))
                .filter(_is_frequent_expr(F.col("support")))
                .collect()
            )
            prev = {tuple(r["pat"]): r["support"] for r in counted}
            result.extend(
                (">".join(p), len(p), s) for p, s in prev.items()
            )
            if not prev:
                break
    finally:
        seqs.unpersist()
    return spark.createDataFrame(
        result or [("", 0, 0)],
        "pattern string, length int, support long",
    ).filter(F.col("length") > 0)
