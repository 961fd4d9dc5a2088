"""Association-rule mining (Agrawal & Srikant, VLDB'94) over
basket/item rows: frequent item pairs with exact support,
confidence and lift.

The market-basket family a curation pipeline uses for co-occurring
tag / property / phrase discovery and template detection (two
mid-frequency items that co-occur in far more baskets than
independence predicts are usually a template family). Differs from
``pmi_collocations`` (ADJACENT bigrams weighted by token counts) and
``item_cooccurrence_sim`` (cosine similarity ranking) in emitting the
classic support / confidence / lift rule measures with explicit
frequency-band and support thresholds.

Scale shape (100 TB):

* input is reduced to DISTINCT (basket, item) rows immediately (one
  hash aggregate), then to the mid-frequency item BAND — the Apriori
  L1 prune: items below min support cannot form frequent pairs
  (downward closure), items above the ceiling (stopword-like) are
  discarded as uninformative, so the candidate space collapses before
  any pairing;
* per-basket fan-out is bounded by ``per_basket_cap`` (rarest-first
  by item frequency — the FP-growth f-list ordering): pair generation
  costs <= C(cap, 2) per basket REGARDLESS of basket size, the same
  hot-key discipline as inverted_index / item_cooccurrence_sim;
* pair support is one hash aggregate on the (item_a, item_b) key; the
  band attachment is a broadcast equi-join (the band is
  vocabulary-scale, not corpus-scale).

All thresholds are exact integer cross-products (``df * lo_den >=
n_baskets * lo_num`` — never a float rate), and confidence / lift are
truncating integral divisions in micro-units over DECIMAL(38,0)
intermediates (DuckDB HUGEINT ``//``), so every emitted value is
engine-exact.

Reference parity note: the reference service has no corpus-statistics
surface; this is training-data-pipeline breadth beyond parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "decimal(38,0)"
SCALE = 1_000_000


def association_rules(
    items: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    item_lo: tuple[int, int] = (1, 10),
    item_hi: tuple[int, int] = (2, 5),
    pair_min: tuple[int, int] = (1, 25),
    per_basket_cap: int = 32,
) -> DataFrame:
    """Frequent item pairs with exact support, confidence (both
    directions) and lift in micro-units.

    ``items`` holds (basket, item) observations (duplicates allowed —
    reduced to distinct presence first). Items whose basket frequency
    sits in [item_lo, item_hi] (fractions of the basket count, exact
    rationals) survive the L1 prune; per basket only the
    ``per_basket_cap`` rarest band items (by (df, item) order)
    generate pairs; pairs below the ``pair_min`` support fraction are
    dropped.

    Output: item_a < item_b, supp_ab/supp_a/supp_b (basket counts;
    supp_a/supp_b are the L1 frequencies), conf_ab_micro =
    1e6*supp_ab div supp_a (rule a=>b), conf_ba_micro likewise,
    lift_micro = 1e6*supp_ab*n_baskets div (supp_a*supp_b)."""
    if per_basket_cap < 2:
        raise ValueError("per_basket_cap must be >= 2")
    di = (
        items.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        # a NULL basket can never form pairs (the equi-join drops NULL
        # keys) but would inflate n_baskets and every per-item df,
        # shifting the exact thresholds — drop both NULL sides up front
        # (matches the oracle's count(DISTINCT basket) NULL handling)
        .where(F.col(item_col).isNotNull() & F.col(basket_col).isNotNull())
        .distinct()
    )
    n_baskets = di.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    item_df = di.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    lo_n, lo_d = item_lo
    hi_n, hi_d = item_hi
    band = (
        item_df.crossJoin(F.broadcast(n_baskets))
        .where(
            (F.col("df") * F.lit(lo_d) >= F.col("n_baskets") * F.lit(lo_n))
            & (F.col("df") * F.lit(hi_d) <= F.col("n_baskets") * F.lit(hi_n))
        )
        .select("item", "df")
    )
    banded = di.join(F.broadcast(band), "item")
    w = Window.partitionBy("basket").orderBy("df", "item")
    capped = (
        banded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_basket_cap)
        .select("basket", "item", "df")
    )
    a = capped.select(
        "basket", F.col("item").alias("item_a"), F.col("df").alias("df_a")
    )
    b = capped.select(
        "basket", F.col("item").alias("item_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("supp_ab"),
            F.first("df_a").alias("supp_a"),
            F.first("df_b").alias("supp_b"),
        )
    )
    p_n, p_d = pair_min
    kept = pairs.crossJoin(F.broadcast(n_baskets)).where(
        F.col("supp_ab") * F.lit(p_d) >= F.col("n_baskets") * F.lit(p_n)
    )
    m = F.lit(SCALE).cast(_DEC)
    return kept.select(
        "item_a",
        "item_b",
        "supp_ab",
        "supp_a",
        "supp_b",
        F.call_function(
            "div", F.col("supp_ab").cast(_DEC) * m, F.col("supp_a").cast(_DEC)
        )
        .cast("long")
        .alias("conf_ab_micro"),
        F.call_function(
            "div", F.col("supp_ab").cast(_DEC) * m, F.col("supp_b").cast(_DEC)
        )
        .cast("long")
        .alias("conf_ba_micro"),
        F.call_function(
            "div",
            F.col("supp_ab").cast(_DEC) * F.col("n_baskets").cast(_DEC) * m,
            F.col("supp_a").cast(_DEC) * F.col("supp_b").cast(_DEC),
        )
        .cast("long")
        .alias("lift_micro"),
    )
