"""Incremental view maintenance for JOIN views (delta joins).

``rollup_incremental`` maintains AGGREGATE views with mergeable
partials; the other classic IVM discipline is the JOIN view. For an
inner equi-join view V = A |x| B and insert-only deltas dA, dB, the
delta-rule identity (Blakeley/Larson/Tompa, SIGMOD'86; the same
algebra behind every streaming materialized view since) is

    dV = (dA |x| B) U (A |x| dB) U (dA |x| dB)
    V' = V U dV

— every term joins a DELTA against a base or a delta, so the work is
O(|delta| x join fan-out), never a recompute of A |x| B. The old view
V itself is only UNIONED with, not re-joined.

Scale shape: the three delta joins share the view's join key; with
the base tables bucketed/pre-partitioned on that key they are
co-located probes (the repo's bucketed-layout story), and AQE
broadcasts genuinely small deltas. The base tables are scanned once
each per refresh (as join probe sides) — the identity's whole point
is that |A| x |B| work never happens again.

Correctness is the delta rule itself, so the value oracle recomputes
the FULL join of (A U dA) |x| (B U dB) — equality with V U dV IS the
theorem (the cc_incremental convention: incremental == full).

Contract: insert-only deltas, and dA/dB must be disjoint from A/B on
the rows themselves (re-inserted duplicates would double-count —
upsert/delete maintenance needs keyed retraction counts, a different
operator; documented, not silently absorbed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def join_view_delta(
    a_old: DataFrame,
    delta_a: DataFrame | None,
    b_old: DataFrame,
    delta_b: DataFrame | None,
    on: list[str] | str,
) -> DataFrame | None:
    """dV for the inner equi-join view on ``on``: the three-term
    delta rule. Either delta may be None (one-sided refresh); both
    None returns None (nothing to do)."""
    keys = [on] if isinstance(on, str) else list(on)
    parts = []
    if delta_a is not None:
        parts.append(delta_a.join(b_old, keys))
    if delta_b is not None:
        parts.append(a_old.join(delta_b, keys))
    if delta_a is not None and delta_b is not None:
        parts.append(delta_a.join(delta_b, keys))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def refresh_join_view(
    view_old: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame | None,
    b_old: DataFrame,
    delta_b: DataFrame | None,
    on: list[str] | str,
) -> DataFrame:
    """V' = V U dV. Column order follows the old view's schema."""
    d = join_view_delta(a_old, delta_a, b_old, delta_b, on)
    if d is None:
        return view_old
    return view_old.unionByName(d.select(*view_old.columns))
