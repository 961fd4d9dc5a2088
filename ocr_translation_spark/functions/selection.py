"""Exact per-group quantiles at corpus scale by iterative histogram
narrowing (distributed selection).

The existing percentile paths trade off exactness against state:
``percentile(...)`` buffers a whole group's values on one task
(exact, unbounded state) and the sampled variant bounds state but
answers for a sample. This operator is the third point the scale
story needs: EXACT discrete quantiles with per-round state bounded at
O(groups x bins) — the classic selection-by-histogram algorithm
(Blum et al. selection generalized to one histogram pass per round,
cf. the iterative approach in Munro-Paterson '80 selection with
limited storage).

Algorithm (driver-coordinated loop, the repo's CC/BPE precedent):
  round 0   one aggregate per group: (count, min, max); the target
            rank r = max(1, ceil(q * n)) is derived with exact
            Fraction arithmetic (percentile_disc semantics: the
            smallest value whose cumulative count reaches q * n).
  round k   every still-open (group, q) state carries an inclusive
            value range [lo, hi] and a remaining rank. ONE job joins
            the base table to the broadcast bounds, buckets matching
            rows into `bins` equal-width bins, and aggregates
            (count, min, max) per (group, q, bin) — O(states x bins)
            rows collected. The bin containing the rank becomes the
            new range, with the NEW BOUNDS TAKEN FROM THE BIN'S OWN
            MIN/MAX (actual data values, so float boundary arithmetic
            can never disagree with membership), and the rank is
            reduced by the counts below. A bin whose min == max IS
            the answer (all values equal — the rank inside ties is
            irrelevant).
  final     states whose remaining count fits `limit` are resolved in
            one job: filter to the final ranges, per-state rank
            selection via a row_number window bounded at `limit` rows
            per state.

Rounds are O(log_bins(n / limit)): a 10^12-row group narrows in ~4
rounds at bins=1024. Each round re-scans the base table with a
highly selective range predicate — on range-sorted or min/max-
footered layouts (sources/layout.py) later rounds open only the
files overlapping the surviving ranges.

Monotonicity note: the bin index floor((v - lo) * bins / (hi - lo))
is monotone in v even when the multiply saturates to +inf (floor/cast
clamps to the top bin), so cumulative bin counts are always a valid
rank decomposition. The one non-finite hazard — hi - lo overflowing
to inf, whose division would mint NaN bins — is detected driver-side
and that round degrades to an exact midpoint 2-way split. A round
that makes no progress at all (bounds and count unchanged — not
reachable with data-valued bounds, kept as a guard) force-finalizes
the state rather than looping.

Reference parity: the reference exposes per-job progress percentiles
only implicitly (BullMQ job counts, `src/services/job.js`); this is
the corpus-analytics generalization its operators feed.
"""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

#: above this many surviving groups the per-group OR envelope would
#: bloat the plan; fall back to the single global range (still
#: pushable, still correct — the exact check rides the bounds join)
_PREFILTER_GROUP_CAP = 64


def _range_prefilter(states: dict) -> Column:
    """LITERAL range predicate covering every open state — unlike the
    bounds-join filter (whose lo/hi are join columns), literals push
    down to parquet row-group stats / cached-batch stats, so later
    narrowing rounds scan O(selectivity) of the base table instead of
    all of it. Coarse by design (per-group envelope over that group's
    states, or one global envelope past the cap); the exact per-state
    range check still happens after the bounds join."""
    per_group: dict[str, list[float]] = {}
    for (g, _), s in states.items():
        if g in per_group:
            per_group[g][0] = min(per_group[g][0], s["lo"])
            per_group[g][1] = max(per_group[g][1], s["hi"])
        else:
            per_group[g] = [s["lo"], s["hi"]]
    if len(per_group) > _PREFILTER_GROUP_CAP:
        glo = min(v[0] for v in per_group.values())
        ghi = max(v[1] for v in per_group.values())
        return (F.col("v") >= F.lit(glo)) & (F.col("v") <= F.lit(ghi))
    pred = F.lit(False)
    for g, (lo, hi) in per_group.items():
        pred = pred | (
            (F.col("grp") == F.lit(g))
            & (F.col("v") >= F.lit(lo))
            & (F.col("v") <= F.lit(hi))
        )
    return pred


def group_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[str, ...] = ("0.5", "0.9", "0.99"),
    bins: int = 128,
    limit: int = 131072,
    max_rounds: int = 64,
    weight_col: str | None = None,
    rank_for=None,
) -> DataFrame:
    """One row per (group, q): (grp, q, rank, n, value).

    ``value`` is the exact rank-``max(1, ceil(q*n))``-th smallest
    non-null ``value_col`` within the group (a real data element,
    never an interpolation), where ``n`` and the rank count WEIGHT
    when ``weight_col`` is given (positive integer weights; the
    weighted discrete quantile "smallest v whose cumulative weight
    reaches ceil(q*W)" — e.g. token-weighted document percentiles)
    and plain rows otherwise. ``qs`` are decimal strings, parsed
    exactly. NULL values are ignored; empty groups yield no row.
    Rows with a NULL group key are dropped up front — the narrowing
    rounds route state through an equi-join on the group key, which
    NULL can never match (a NULL-keyed group would otherwise loop to
    max_rounds instead of narrowing) — as are rows with NULL or
    non-positive weight. ``limit`` bounds final-selection ROWS per
    state regardless of their weight.

    ``rank_for`` generalizes the target beyond fixed quantiles: a
    callable ``(label, n) -> rank`` invoked per (group, label) with
    that group's total weight ``n``, returning the 1-based target
    rank directly (clamped nowhere — out-of-range ranks raise). The
    ``qs`` entries are then opaque labels, not parsed as fractions.
    This is how data-dependent order statistics (e.g. the split-
    conformal rank ceil((n+1)*(1-alpha)), functions/conformal.py)
    reuse the narrowing machinery.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    spark = df.sparkSession
    w_expr = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    base = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("double").alias("v"),
        w_expr.alias("w"),
    ).filter(
        F.col("v").isNotNull()
        & F.col("grp").isNotNull()
        & F.col("w").isNotNull()
        & (F.col("w") > 0)
    )
    # persist lazily: only a narrowing round re-scans `base`; when
    # every state resolves within `limit` (the common case once groups
    # fit the final-selection bound) the cache materialization pass is
    # pure overhead — the stats agg and the final selection each scan
    # the source once either way.
    persisted = False
    try:
        stats = base.groupBy("grp").agg(
            F.sum("w").alias("n"),
            F.count(F.lit(1)).alias("rows"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ).collect()

        # state: (grp, q_label) -> dict(lo, hi, rank, cnt, n)
        open_states: dict[tuple[str, str], dict] = {}
        resolved: list[tuple[str, str, int, int, float]] = []
        for row in stats:
            n = row["n"]
            for q in qs:
                if rank_for is not None:
                    rank = int(rank_for(q, n))
                    if not 1 <= rank <= n:
                        raise ValueError(
                            f"rank_for({q!r}, {n}) = {rank} outside "
                            f"[1, {n}]"
                        )
                else:
                    fq = Fraction(q)
                    if not 0 <= fq <= 1:
                        raise ValueError(f"q out of [0,1]: {q}")
                    rank = max(1, -((-fq.numerator * n) // fq.denominator))
                if row["mn"] == row["mx"]:
                    resolved.append((row["grp"], q, rank, n, row["mn"]))
                else:
                    open_states[(row["grp"], q)] = {
                        "lo": row["mn"], "hi": row["mx"],
                        # rank = remaining WEIGHT rank inside [lo, hi];
                        # grank = the reported global rank ceil(q*n);
                        # cnt = ROWS in range (bounds the final sort)
                        "rank": rank, "grank": rank,
                        "cnt": row["rows"], "n": n,
                    }

        rounds = 0
        while any(s["cnt"] > limit for s in open_states.values()):
            if not persisted:
                base = base.persist(StorageLevel.MEMORY_AND_DISK)
                persisted = True
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"quantile narrowing exceeded {max_rounds} rounds"
                )
            work = {k: s for k, s in open_states.items()
                    if s["cnt"] > limit}
            bounds = spark.createDataFrame(
                [(g, q, s["lo"], s["hi"]) for (g, q), s in work.items()],
                "grp string, q string, lo double, hi double",
            )
            joined = (
                base.filter(_range_prefilter(work))
                .join(F.broadcast(bounds), "grp")
                .filter(
                    (F.col("v") >= F.col("lo"))
                    & (F.col("v") <= F.col("hi"))
                )
            )
            # per-state bin index; driver-detected inf width degrades
            # to an exact midpoint 2-way split for that round
            widths_finite = all(
                math.isfinite(s["hi"] - s["lo"]) for s in work.values()
            )
            if widths_finite:
                b = F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("v") - F.col("lo"))
                        * F.lit(float(bins))
                        / (F.col("hi") - F.col("lo"))
                    ),
                )
            else:
                mid = F.col("lo") / 2.0 + F.col("hi") / 2.0
                b = F.when(F.col("v") < mid, F.lit(0)).otherwise(F.lit(1))
            hist = joined.groupBy("grp", "q", b.alias("b")).agg(
                F.sum("w").alias("c"),       # weight mass per bin
                F.count(F.lit(1)).alias("rc"),  # rows per bin
                F.min("v").alias("bmn"),
                F.max("v").alias("bmx"),
            ).collect()

            cells: dict[tuple[str, str], list] = {}
            for r in hist:
                cells.setdefault((r["grp"], r["q"]), []).append(r)
            for key, rows in cells.items():
                s = work[key]
                rows.sort(key=lambda r: r["b"])
                cum = 0
                for r in rows:
                    if cum + r["c"] >= s["rank"]:
                        new_rank = s["rank"] - cum
                        if r["bmn"] == r["bmx"]:
                            resolved.append(
                                (key[0], key[1], s["grank"], s["n"],
                                 r["bmn"])
                            )
                            del open_states[key]
                        elif (
                            r["bmn"] == s["lo"] and r["bmx"] == s["hi"]
                            and r["rc"] == s["cnt"]
                        ):
                            # no progress (guard; see module docstring)
                            s["cnt"] = 0  # force-finalize
                            s["rank"] = new_rank
                        else:
                            s.update(lo=r["bmn"], hi=r["bmx"],
                                     rank=new_rank, cnt=r["rc"])
                        break
                    cum += r["c"]

        out_schema = (
            "grp string, q string, rank long, n long, value double"
        )
        parts = []
        if resolved:
            parts.append(spark.createDataFrame(
                [(g, q, r, n, v) for g, q, r, n, v in resolved],
                out_schema,
            ))
        if open_states:
            fin = spark.createDataFrame(
                [
                    (g, q, s["lo"], s["hi"], s["rank"], s["grank"],
                     s["n"])
                    for (g, q), s in open_states.items()
                ],
                "grp string, q string, lo double, hi double,"
                " rank long, grank long, n long",
            )
            cand = (
                base.filter(_range_prefilter(open_states))
                .join(F.broadcast(fin), "grp")
                .filter(
                    (F.col("v") >= F.col("lo"))
                    & (F.col("v") <= F.col("hi"))
                )
            )
            # smallest v whose cumulative weight reaches the rank
            # (with unit weights this is exactly the rank-th row)
            win = (
                Window.partitionBy("grp", "q")
                .orderBy(F.col("v").asc())
                .rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)
            )
            parts.append(
                cand.withColumn("_cw", F.sum("w").over(win))
                .filter(F.col("_cw") >= F.col("rank"))
                .groupBy("grp", "q", "grank", "n")
                .agg(F.min("v").alias("value"))
                .select("grp", "q", F.col("grank").alias("rank"), "n",
                        "value")
            )
        if not parts:
            return spark.createDataFrame([], out_schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # eagerly checkpoint (stays distributed) so the returned frame
        # outlives the unpersist of the loop-scanned base
        return out.localCheckpoint(eager=True)
    finally:
        if persisted:
            base.unpersist()
