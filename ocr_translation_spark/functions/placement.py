"""Rendezvous (highest-random-weight) shard placement + rebalance audit.

Routing a 10^12-row corpus onto S storage/served shards needs a
placement that (a) any node can compute locally from the key alone —
no lookup table to distribute or keep consistent — and (b) moves the
MINIMUM number of keys when the shard set changes. Rendezvous hashing
(Thaler & Ravishankar 1998) gives both: a key lands on the shard
maximizing hash(key, shard), and removing one shard relocates exactly
the keys that lived there (every other key's argmax is untouched —
the minimal-disruption property consistent-hashing rings only
approximate).

``rendezvous_assign`` is a pure row-local codegen map: an array of
(weight, shard) structs and one array_max — zero shuffles, no state,
S hash evaluations per row. Weights are the first 16 hex chars of
sha256(key ':' shard) compared lexicographically (engine-identical);
exact weight ties (a 64-bit sha collision between two shards for one
key) break to the LARGER shard name by struct comparison — the twin
mirrors with ORDER BY w DESC, s DESC.

``shard_report`` audits a topology change in ONE corpus scan: both
the current and the post-change assignment are computed per row, a
(phase, shard) explode folds them through a single shard-keyed
aggregate, and the tiny S-row result carries exact share_ppm. The
minimal-disruption property is then checkable arithmetic:
sum(n_after_drop) == sum(n_assigned) and every surviving shard has
n_after_drop >= n_assigned.

Reference parity note: the reference routes jobs to one Redis queue;
this is the explicit-placement generalization its 9+9 worker pools
(SURVEY P1/P2) would need on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _weight(key: Column, shard: str) -> Column:
    return F.substring(
        F.sha2(F.concat(key, F.lit(":" + shard)), 256), 1, 16
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    shards: list[str],
    out_col: str = "shard",
) -> DataFrame:
    """Adds ``out_col`` = the HRW winner among ``shards`` for each
    row's key. Row-local; no shuffle."""
    if not shards:
        raise ValueError("shards must be non-empty")
    if len(set(shards)) != len(shards):
        raise ValueError("shard names must be unique")
    key = F.col(key_col).cast("string")
    arr = F.array(
        *[
            F.struct(
                _weight(key, s).alias("w"), F.lit(s).alias("s")
            )
            for s in shards
        ]
    )
    return df.withColumn(out_col, F.array_max(arr)["s"])


def shard_report(
    df: DataFrame,
    key_col: str,
    shards: list[str],
    dropped: str,
) -> DataFrame:
    """One row per shard in ``shards``: (shard, n_assigned,
    share_ppm, n_after_drop) where n_after_drop is the assignment
    count once ``dropped`` leaves the topology (0 for the dropped
    shard itself). One corpus scan, one shard-keyed aggregate."""
    if dropped not in shards:
        raise ValueError(f"dropped shard {dropped!r} not in shards")
    if len(shards) < 2:
        raise ValueError("need >= 2 shards to drop one")
    survivors = [s for s in shards if s != dropped]
    both = rendezvous_assign(
        rendezvous_assign(df, key_col, shards, "_cur"),
        key_col,
        survivors,
        "_post",
    )
    phased = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("cur").alias("p"), F.col("_cur").alias("s")
                ),
                F.struct(
                    F.lit("post").alias("p"), F.col("_post").alias("s")
                ),
            )
        ).alias("ps")
    ).select(F.col("ps.p").alias("p"), F.col("ps.s").alias("s"))
    counts = phased.groupBy("s").agg(
        F.sum(F.when(F.col("p") == "cur", 1).otherwise(0))
        .cast("long")
        .alias("n_assigned"),
        F.sum(F.when(F.col("p") == "post", 1).otherwise(0))
        .cast("long")
        .alias("n_after_drop"),
    )
    # the dropped shard may vanish from the aggregate entirely when it
    # owned nothing; rejoin against the declared topology so the
    # report always has exactly len(shards) rows
    topo = df.sparkSession.createDataFrame(
        [(s,) for s in shards], "shard string"
    )
    from pyspark.sql import Window

    joined = topo.join(
        counts, topo["shard"] == counts["s"], "left"
    ).select(
        "shard",
        F.coalesce(F.col("n_assigned"), F.lit(0))
        .cast("long")
        .alias("n_assigned"),
        F.coalesce(F.col("n_after_drop"), F.lit(0))
        .cast("long")
        .alias("n_after_drop"),
    )
    # the window runs over the S-row report, not the corpus
    total = F.sum("n_assigned").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return joined.withColumn("_tot", total).select(
        "shard",
        "n_assigned",
        F.expr(
            "case when _tot > 0 then cast("
            "(cast(n_assigned as decimal(38,0))"
            " * cast(1000000 as decimal(38,0)))"
            " div cast(_tot as decimal(38,0)) as long) end"
        ).alias("share_ppm"),
        "n_after_drop",
    )
