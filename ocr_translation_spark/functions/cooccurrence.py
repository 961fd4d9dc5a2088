"""Item-item co-occurrence similarity (collaborative filtering's
counting core).

"Users who interacted with A also interacted with B" over an events
log: the association signal behind item-to-item recommenders (Linden
et al. '03, Amazon item-based CF) and behavioral clustering. The
whole computation is counting, so it is exact:

1. collapse events to DISTINCT (user, item) with an interaction
   count: one hash aggregate;
2. CAP each user's item set at ``max_items_per_user``, keeping the
   most-interacted items (ties to the smaller item id) via a rank
   window OVER THE SAME user key — no extra shuffle. The cap is the
   scale guard: a crawler/bot account touching 10^6 items would
   otherwise emit C(10^6, 2) pairs from the within-user self-join;
   capped, per-user fan-out is bounded by C(cap, 2) forever;
3. within-user pairs: a self-equi-join on user (co-partitioned with
   the window — Spark reuses the exchange), item_a < item_b;
4. one (item_a, item_b) aggregate for the co-count, plus a
   dictionary-sized per-item count broadcast back;
5. cosine similarity over binary user-incidence vectors, SQUARED and
   scaled to exact integer micro-units:
       sim2_micro = (1e6 * n_co^2) div (c_a * c_b)
   — squaring removes the sqrt, keeping the score pure integer
   arithmetic (monotone in the true cosine, so ranking is
   preserved), which is what makes the DuckDB twin value-exact.

100 TB shape: three aggregates + one capped self-join, every stage
keyed by user or item pair; the only unbounded quantity (items per
user) is the one the cap bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def item_cooccurrence_sim(
    df: DataFrame,
    user_col: str,
    item_col: str,
    max_items_per_user: int = 20,
    min_co: int = 2,
) -> DataFrame:
    """(item_a, item_b, n_co, c_a, c_b, sim2_micro) for item pairs
    co-interacted by >= ``min_co`` users (post-cap)."""
    if max_items_per_user < 2:
        raise ValueError("max_items_per_user must be >= 2")
    ui = (
        df.select(
            F.col(user_col).alias("u"), F.col(item_col).alias("i")
        )
        .filter(F.col("i").isNotNull())
        .groupBy("u", "i")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("u").orderBy(
        F.col("n").desc(), F.col("i").asc()
    )
    capped = (
        ui.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_items_per_user)
        .select("u", "i")
    )
    item_cnt = capped.groupBy("i").agg(
        F.count("*").cast("long").alias("c")
    )
    a = capped.select("u", F.col("i").alias("item_a"))
    b = capped.select("u", F.col("i").alias("item_b"))
    co = (
        a.join(b, "u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_co"))
        .filter(F.col("n_co") >= min_co)
    )
    ca = F.broadcast(
        item_cnt.select(F.col("i").alias("item_a"), F.col("c").alias("c_a"))
    )
    cb = F.broadcast(
        item_cnt.select(F.col("i").alias("item_b"), F.col("c").alias("c_b"))
    )
    return (
        co.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_co",
            "c_a",
            "c_b",
            F.expr(
                "(1000000L * n_co * n_co) div (c_a * c_b)"
            ).alias("sim2_micro"),
        )
    )
