"""Session path analysis: top common event-type journeys.

Product-analytics path mining: for each session (here: entity-day),
take the first ``depth`` events in time order, render the journey as a
``a>b>c`` path string, and count sessions per path — "what do users
actually do first?". The PREFIX restriction is what keeps this
computable at scale: full-path cardinality explodes combinatorially,
but depth-k prefixes are bounded by |event types|^k and dominated in
practice by a few hot journeys (the funnel-discovery complement to
:mod:`.funnel`, which checks ONE prescribed journey; this op finds the
journeys worth prescribing, and :mod:`.markov` gives their one-step
conditional structure).

Spark shape (100 TB):
  ONE shuffle on the session key — the row_number window and the
  per-session aggregation both partition by (entity, day), so
  Catalyst reuses the Exchange (window, filter to rank <= depth, then
  groupBy on the same key = no second corpus shuffle). The per-path
  count is a second aggregation over O(sessions) rows that collapses
  map-side to O(|paths|). Path assembly is row-local: collect the
  (rank, type) structs, array_sort (rank leads the struct, so struct
  ordering == rank ordering), project the type, join with '>'.

Determinism: equal-timestamp events order by the unique tie column —
the same discipline as :mod:`.markov` (sub-second bursts are the
common case in click logs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def session_paths(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tie_col: str = "event_id",
    depth: int = 4,
) -> DataFrame:
    """(path, depth, n_sessions) — sessions sharing each depth-limited
    opening journey, where a session is an (entity, calendar day) and
    ``path`` joins its first ``depth`` event types with '>'.
    Sessions shorter than ``depth`` keep their full (shorter) path;
    ``depth`` reports the actual prefix length."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1 (got {depth})")
    day = F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd")
    w = Window.partitionBy(entity_col, "_day").orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    ranked = (
        events.withColumn("_day", day)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= depth)
    )
    per_session = ranked.groupBy(entity_col, "_day").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_rn", F.col(state_col)))
                ),
                lambda s: s[state_col],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("_len"),
    )
    return per_session.groupBy("path").agg(
        F.max("_len").cast("long").alias("depth"),
        F.count(F.lit(1)).alias("n_sessions"),
    )
