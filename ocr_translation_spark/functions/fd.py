"""Functional-dependency discovery (approximate-FD g3 error).

Schema profiling for data-lake tables: for candidate dependencies
``A -> B``, measure how exactly each holds.  The standard measure
(TANE, Huhtala et al., Comput. J. '99) is the *g3 error*: the minimum
number of rows whose removal makes the FD exact,

    g3(A -> B) = n_rows - sum_over_a( max_b count(a, b) )

— i.e. every A-group keeps its plurality B-value, everything else is
a violation.  Exact integers end to end.

Spark shape at 100 TB: ALL candidates are checked in ONE corpus scan —
each row explodes to one ``(candidate, lhs, rhs)`` triple per
candidate (row-local; candidate lists are short), then two hash
aggregates reduce corpus -> (candidate, lhs, rhs) counts -> per-lhs
plurality -> O(candidates) rows.  Both shuffles carry uniformly
hashed composite keys with map-side partial aggregation; nothing
returns to the driver but the per-candidate report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# NULL must be a legal (and distinct) value on both sides of an FD;
# aggregation keys treat NULL groups fine, but the string-cast union
# needs a sentinel that cannot collide with real data.
_NULL = "\x00<null>"


def fd_violations(
    df: DataFrame, candidates: list[tuple[str, str]]
) -> DataFrame:
    """One row per candidate: ``(fd, n_rows, n_distinct_lhs,
    n_violating_rows, holds)``.

    ``candidates`` is a list of ``(lhs_col, rhs_col)`` name pairs;
    ``fd`` is rendered ``"lhs->rhs"``. Values are string-cast with a
    NULL sentinel so heterogeneous column types share one pass.
    """
    triples = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{a}->{b}").alias("fd"),
                        F.coalesce(
                            F.col(a).cast("string"), F.lit(_NULL)
                        ).alias("lhs"),
                        F.coalesce(
                            F.col(b).cast("string"), F.lit(_NULL)
                        ).alias("rhs"),
                    )
                    for a, b in candidates
                ]
            )
        ).alias("t")
    ).select("t.fd", "t.lhs", "t.rhs")
    pair_counts = triples.groupBy("fd", "lhs", "rhs").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_lhs = pair_counts.groupBy("fd", "lhs").agg(
        F.sum("c").alias("n_l"), F.max("c").alias("keep_l")
    )
    return (
        per_lhs.groupBy("fd")
        .agg(
            F.sum("n_l").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_lhs"),
            (F.sum("n_l") - F.sum("keep_l"))
            .cast("long")
            .alias("n_violating_rows"),
        )
        .withColumn("holds", F.col("n_violating_rows") == 0)
    )
