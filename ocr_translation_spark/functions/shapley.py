"""Shapley-value channel attribution (cooperative-game credit).

Rule-based attribution (first/last/linear, multi_touch_attribution)
fixes credit by position; the Markov model (markov_transitions)
needs a path chain. The third classic discipline treats channels as
PLAYERS in a cooperative game (Shapley '53; popularized for marketing
attribution by Zhao et al., arXiv:1804.05327 and productized in every
major ads platform): the characteristic function v(S) is the observed
conversion rate of units exposed to EXACTLY the channel set S, and
each channel's credit is its Shapley value

    phi_i = sum over S not containing i of
            |S|! (n-1-|S|)! / n! * (v(S u {i}) - v(S))

— the unique credit assignment satisfying efficiency, symmetry, and
dummy-player axioms.

Exactness: v is quantized once per subset as c_S * 1e6 div m_S
(truncating ppm, engine-identical), factorial weights are exact
integer literals, the weighted sum runs in BIGINT (|delta| <= 1e6,
weights <= (n-1)!, 2^(n-1) terms — far inside 2^63 for the n <= 5
this supports), and the single division by n! is sign-split
truncating. Unobserved subsets contribute v = 0 (documented choice:
no evidence, no lift — shared by the twin).

Scale shape: ONE unit-keyed aggregate folds each unit's exposure set
into a BITMASK (bit_or) with its conversion flag; everything after is
O(2^n x n) on <= 32 subset rows — literal spine, two tiny joins, one
channel rollup. The corpus is touched exactly once.
"""

from __future__ import annotations

from math import factorial

from pyspark.sql import DataFrame, functions as F


def shapley_attribution(
    exposures: DataFrame,
    conversions: DataFrame,
    channels: list[str],
    unit_col: str = "unit",
    channel_col: str = "channel",
    universe: DataFrame | None = None,
) -> DataFrame:
    """(channel, shapley_ppm): exact truncating-ppm Shapley credit per
    channel. ``exposures`` holds (unit, channel) rows (channels
    outside ``channels`` are ignored); ``conversions`` holds one
    column of converted unit ids (duplicates fine); ``universe``
    (one column of unit ids) defines the population. WITHOUT a
    universe, units that neither convert nor touch any channel are
    INVISIBLE to both inputs, so the empty-set baseline v(emptyset)
    would be computed over converted unexposed units only — a biased
    baseline. Pass the population whenever unexposed non-converters
    exist (the registered query passes every active user).
    n = len(channels) must be 2..5 (2^n subset spine)."""
    n = len(channels)
    if not 2 <= n <= 5:
        raise ValueError(f"need 2..5 channels, got {n}")
    if len(set(channels)) != n:
        raise ValueError(f"channels must be distinct: {channels}")
    idx = F.create_map(
        *[
            c
            for i, ch in enumerate(channels)
            for c in (F.lit(ch), F.lit(1 << i))
        ]
    )
    conv = (
        conversions.select(
            F.col(conversions.columns[0]).alias("_u")
        )
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    masks = (
        exposures.select(
            F.col(unit_col).alias("_u"),
            idx[F.col(channel_col)].alias("_bit"),
        )
        .where(F.col("_bit").isNotNull())
        .groupBy("_u")
        .agg(F.bit_or("_bit").alias("_mask"))
    )
    if universe is not None:
        pop = universe.select(
            F.col(universe.columns[0]).alias("_u")
        ).distinct()
        joined = pop.join(masks, "_u", "left").join(conv, "_u", "left")
    else:
        joined = masks.join(conv, "_u", "full")
    units = joined.select(
        F.coalesce("_mask", F.lit(0)).alias("_mask"),
        F.coalesce("_c", F.lit(0)).alias("_c"),
    )
    rates = units.groupBy("_mask").agg(
        F.count(F.lit(1)).alias("m"), F.sum("_c").alias("c")
    )
    spark = exposures.sparkSession
    spine = spark.range(1 << n).select(
        F.col("id").cast("integer").alias("s")
    )
    v = spine.join(
        rates, F.col("s") == F.col("_mask"), "left"
    ).select(
        "s",
        F.when(
            F.col("m") > 0,
            F.expr("cast(c as long) * 1000000 div m"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("v_ppm"),
    )
    # subset-channel pairs with i not in S; weights by popcount(S)
    wlits = ", ".join(
        str(factorial(k) * factorial(n - 1 - k)) for k in range(n)
    )
    pairs = (
        spine.crossJoin(
            spark.range(n).select(
                F.col("id").cast("integer").alias("i")
            )
        )
        .where(F.expr("(s div shiftleft(1, i)) % 2 = 0"))
        .select(
            "s",
            "i",
            F.expr("s + shiftleft(1, i)").alias("s_with"),
            F.expr(
                f"element_at(array({wlits}), bit_count(s) + 1)"
            ).alias("w"),
        )
    )
    terms = (
        pairs.join(v.withColumnRenamed("v_ppm", "v_s"), "s")
        .join(
            v.select(
                F.col("s").alias("s_with"),
                F.col("v_ppm").alias("v_sw"),
            ),
            "s_with",
        )
        .groupBy("i")
        .agg(
            F.sum(F.col("w") * (F.col("v_sw") - F.col("v_s"))).alias(
                "num"
            )
        )
    )
    nf = factorial(n)
    phi = F.expr(
        f"cast(CASE WHEN num >= 0 THEN 1 ELSE -1 END"
        f" * (abs(num) div {nf}) as long)"
    )
    ch_arr = ", ".join(f"'{c}'" for c in channels)
    return terms.select(
        F.expr(f"element_at(array({ch_arr}), i + 1)").alias("channel"),
        phi.alias("shapley_ppm"),
    )
