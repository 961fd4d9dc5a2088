"""Cooldown-throttled alerting: the monitoring-pipeline dedup rule.

Every alerting system suppresses repeats: after an alert fires for a
key, further qualifying events within a cooldown window are swallowed,
and the NEXT alert fires only once the cooldown has elapsed since the
last EMITTED alert (not since the last event — that distinction is
what makes the rule a sequential recurrence: whether event i fires
depends on which of events 1..i-1 fired).

No window function expresses that recurrence (lag() sees the previous
EVENT, not the previous EMISSION), and a driver-side loop would not
distribute — so, like timeseries.ewma_daily, the per-key event-time
sequence is collected sorted (bounded by the key's activity in the
alerting horizon, not by the corpus) and folded ROW-LOCALLY with one
higher-order ``aggregate`` in whole-stage codegen.

The fold state is ONE packed BIGINT — ``acc = n_alerts * 2^40 +
last_emit_sec`` — so the accumulator type stays primitive on both
engines (DuckDB ``list_reduce`` mirrors the same packing). Epoch
seconds stay below 2^40 until year ~36812; the alert count field
holds 2^22 ≈ 4.1M alerts per key per call, enforced with an in-plan
raise (the batching_waste convention: guards live inside the consumed
expression, never in a prunable side column).

Scale shape: one (key) aggregate — one shuffle with map-side combine
on a uniform key — then O(events-per-key) integer ops per row, no
Python, no join. Keys whose horizon exceeds the array bound belong in
the streaming variant (applyInPandasWithState); this is the batch
backfill/audit form.

Reference parity note: the reference throttles per-client request
bursts (`src/middlewares`, disabled in its config); this is the batch
analytics twin of the same suppression semantics over event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SHIFT = 1 << 40
_MAX_EVENTS = 4_000_000


def throttled_alerts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    cooldown_s: int,
) -> DataFrame:
    """Per-key alert/suppression accounting under a ``cooldown_s``
    throttle: the first event always fires; a later event fires iff
    at least ``cooldown_s`` seconds passed since the last FIRED
    event. Output one row per key: n_events, n_alerts, n_suppressed,
    first_sec (first event), last_alert_sec (last fired event), all
    in epoch seconds.

    Deterministic: same-second events collapse into the sorted long
    array in a stable way (equal keys are interchangeable in the
    fold — a tie can never both fire, the second is always inside
    the cooldown of the first)."""
    if cooldown_s < 1:
        raise ValueError("cooldown_s must be >= 1")
    # NTZ timestamps cannot cast straight to long; the hop through
    # TIMESTAMP is exact under the session's pinned UTC zone
    # (session.py), matching DuckDB floor(epoch(ts))
    sec = F.col(ts_col).cast("timestamp").cast("long")
    arr = events.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_sort(F.collect_list(sec)).alias("xs"),
    )
    # packed-state overflow guard: in-plan, inside the consumed
    # expression (a side column would be pruned and never evaluated)
    xs = F.when(
        F.size("xs") < F.lit(_MAX_EVENTS),
        F.col("xs"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "throttled_alerts: key exceeds "
                    f"{_MAX_EVENTS} events per call (packed-state "
                    "bound); shard the horizon: "
                ),
                F.col("key").cast("string"),
            )
        )
    )
    shift = F.lit(_SHIFT).cast("long")
    cool = F.lit(int(cooldown_s)).cast("long")
    # seed: the first event always fires -> one alert, emitted at xs[1]
    seed = shift + F.element_at(xs, 1)
    step = lambda acc, x: F.when(  # noqa: E731
        x - acc % shift >= cool,
        (F.call_function("div", acc, shift) + 1) * shift + x,
    ).otherwise(acc)
    # slice bound must stay a real array length: start + INT_MAX
    # overflows int32 slice arithmetic into an EMPTY slice (the
    # ewma_daily pinning)
    folded = F.aggregate(
        F.slice(xs, F.lit(2), F.greatest(F.size(xs) - 1, F.lit(0))),
        seed,
        step,
    )
    return arr.select(
        F.col("key").alias(key_col),
        "n_events",
        F.call_function("div", folded, shift).alias("n_alerts"),
        (
            F.col("n_events") - F.call_function("div", folded, shift)
        ).alias("n_suppressed"),
        F.element_at(F.col("xs"), 1).alias("first_sec"),
        (folded % shift).alias("last_alert_sec"),
    )
