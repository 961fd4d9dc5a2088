"""Time-series operators Spark lacks as primitives, built scale-first.

``asof_backward`` — backward as-of join (for each left row, the
latest right row with the same key and ts <= left ts, ties included).
Spark has no ASOF JOIN; the naive formulations are a range join
(quadratic fan-out per key) or a per-key collect. The scalable shape
used here is the union-tag trick:

    union(left tagged 1, right tagged 0)
      -> ONE shuffle: window partitionBy(key) orderBy(ts, tag)
      -> last(right_value, ignoreNulls) over rows unbounded..current
      -> keep tag=1 rows

Cost is a single hash shuffle on the key plus a linear per-partition
sort-scan — the same budget as any windowed aggregate, with no range
explosion and no skew amplification beyond the key distribution
itself. Right rows sort BEFORE left rows at equal ts (tag 0 < 1), so
the join is inclusive (ts >= right ts), matching DuckDB's native
``ASOF LEFT JOIN`` which serves as the value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach, to every left row, the latest right row at-or-before its
    timestamp (per key): the right timestamp lands in
    ``{ts_col}{suffix}`` and each of ``value_cols`` in
    ``{col}{suffix}``; all NULL when no right row precedes. The right
    side should be unique per (key, ts) — pre-aggregate it otherwise
    (which of several equal-ts rows wins is undefined in any as-of
    engine).
    """
    value_cols = value_cols or []
    carried = [F.col(ts_col).alias(f"{ts_col}{suffix}")] + [
        F.col(c).alias(f"{c}{suffix}") for c in value_cols
    ]
    r = right.select(F.col(key_col), F.col(ts_col), *carried).withColumn(
        "_tag", F.lit(0)
    )
    l = left.withColumn("_tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in [f"{ts_col}{suffix}"] + [f"{c}{suffix}" for c in value_cols]:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_tag") == 1).drop("_tag")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 600,
) -> DataFrame:
    """Attach to each event the same-key intervals CONTAINING its
    timestamp (``start <= ts <= end``, inclusive both ends).

    Spark has no range-join primitive; the naive theta-join degenerates
    to a per-key cross product (every event against every interval of
    the key — quadratic in dense keys). Scale shape used here: bin time
    into fixed ``bin_seconds`` windows, EXPLODE each interval across
    only the bins it overlaps, equi-join events on (key, bin), then
    refine exact containment. An event meets only the intervals
    overlapping its own bin, so candidate fan-out is bounded by
    interval density per bin rather than per key; each (event,
    interval) pair meets in exactly one bin (the event's), so no
    dedup pass is needed. Pick ``bin_seconds`` near the typical
    interval length: explode cost is ~interval_length/bin_seconds rows
    per interval, candidate cost shrinks as bins get finer.
    """
    bin_us = int(bin_seconds) * 1_000_000
    ev = events.withColumn(
        "_bin",
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / bin_us),
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_micros(F.col(start_col).cast("timestamp")) / bin_us
                ),
                F.floor(
                    F.unix_micros(F.col(end_col).cast("timestamp")) / bin_us
                ),
            )
        ),
    )
    return (
        ev.join(iv, [key_col, "_bin"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bin")
    )


def trend_slopes(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key ordinary-least-squares trend of DAILY EVENT COUNTS as
    an EXACT RATIONAL: the closed form

        slope = (n * sum(x*y) - sum(x) * sum(y))
              / (n * sum(x^2) - sum(x)^2)

    over (x = epoch day, y = that day's row count) is pure integer
    arithmetic, so the slope is emitted as ``slope_num / slope_den``
    plus a human-readable ``slope_micro`` — floor-divided toward zero
    EXPLICITLY (``sign * (|num| * scale div den)``) because Spark's
    ``div`` truncates toward zero while DuckDB's ``//`` floors, and a
    negative slope would otherwise differ by one ulp between engines.
    No float regression (libm would break the value oracle), no
    window: two hash aggregates (day rollup, then key rollup).

    Products are DECIMAL(38,0): at 1e12 rows/day and 3k days,
    ``n * sum(x*y)`` tops 6e19 — past BIGINT, well inside 38 digits.
    Keys with a single distinct day have an undefined slope and are
    emitted with NULL slope fields (den = 0), never dropped
    silently."""
    dec = "decimal(38,0)"
    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.datediff(
                F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    s = daily.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("day").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        F.sum(F.col("day").cast(dec) * F.col("y").cast(dec))
        .cast(dec)
        .alias("sxy"),
        F.sum(F.col("day").cast(dec) * F.col("day").cast(dec))
        .cast(dec)
        .alias("sxx"),
    )
    n = F.col("n_days").cast(dec)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    mag = F.call_function(
        "div", F.abs(num) * F.lit(scale).cast(dec), den
    ).cast("long")

    # the rational components are emitted as BIGINT; past ~9.2e18
    # (reachable around 1e12 rows/day x 3k days, where num ~ n^2*cov)
    # a silent cast would return NULL — indistinguishable from the
    # single-day NULL contract — while the DuckDB twin's ::BIGINT
    # raises. Fail LOUDLY on both engines instead; slope_micro (the
    # reduced ratio) stays representable long past that point.
    lmax = F.lit(9223372036854775807).cast(dec)

    def _loud_long(c, name):
        return F.when(F.abs(c) <= lmax, c.cast("long")).otherwise(
            F.raise_error(
                F.lit(
                    f"trend_slopes: {name} exceeds BIGINT — emit "
                    "slope_micro only at this scale"
                )
            ).cast("long")
        )

    return s.select(
        F.col("key").alias(key_col),
        "n_days",
        F.col("sy").cast("long").alias("total_rows"),
        F.when(F.col("n_days") > 1, _loud_long(num, "slope_num")).alias(
            "slope_num"
        ),
        F.when(F.col("n_days") > 1, _loud_long(den, "slope_den")).alias(
            "slope_den"
        ),
        F.when(F.col("n_days") > 1, sgn * mag).alias("slope_micro"),
    )


def coalesce_intervals(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    disjoint islands: ``(key, island_start, island_end, n_merged)``.

    The gaps-and-islands fold behind session stitching, validity-
    period compaction, on-time accounting, and coverage dedup (e.g.
    "how much wall-clock was this user active", where raw activity
    intervals overlap heavily). Touching intervals (next.start ==
    current max end) MERGE; strictly later starts open a new island.
    NULL starts/ends are rejected loudly — a NULL endpoint silently
    sorted to one end would corrupt every downstream island.

    Spark shape (100 TB): ONE hash shuffle on the key. Both windows
    (the running max-end that detects gaps, the island counter) and
    the final per-island aggregate are keyed by the key or a superset
    of it, so they all reuse that single exchange's layout; per-key
    window state is O(1) (running max + running sum). Intervals of
    one key land in one task — keys are users/devices/docs, whose
    per-key row counts are bounded; hot keys are the documented
    salting candidates.

    Deterministic: islands are a pure function of the interval SET
    (the sort tie-breaks by end then start ordinal, and merged spans
    do not depend on tie order) — the DuckDB twin restates the same
    fold through its own window engine.
    """
    k, s, e = F.col(key_col), F.col(start_col), F.col(end_col)
    guarded = intervals.select(
        k.alias("k"),
        F.when(
            s.isNull() | e.isNull() | (e < s),
            F.raise_error(
                F.lit(
                    "coalesce_intervals: NULL or inverted interval "
                    f"(need {start_col} <= {end_col}, non-NULL)"
                )
            ).cast(intervals.schema[start_col].dataType),
        )
        .otherwise(s)
        .alias("s"),
        e.alias("e"),
    )
    wo = Window.partitionBy("k").orderBy("s", "e")
    # running max of PRIOR ends; a start strictly past it opens an
    # island. rowsBetween excludes the current row so a row never
    # compares against its own end.
    prior_max = F.max("e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = guarded.select(
        "k",
        "s",
        "e",
        F.when(prior_max.isNull() | (F.col("s") > prior_max), 1)
        .otherwise(0)
        .alias("_new"),
    )
    island = F.sum("_new").over(
        wo.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.select("k", "s", "e", island.alias("_isl"))
        .groupBy("k", "_isl")
        .agg(
            F.min("s").alias("island_start"),
            F.max("e").alias("island_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(
            F.col("k").alias(key_col),
            "island_start",
            "island_end",
            "n_merged",
        )
    )


def seasonality_index(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Multiplicative day-of-week seasonality per series, in exact
    ppm: ``index_ppm = (dow mean daily count) / (overall mean daily
    count) * 1e6`` — the classical ratio-to-overall-average seasonal
    index (1e6 = no weekday effect), the profile capacity planning
    and anomaly baselines divide by before comparing days.

    Exactness: both means are rational; the ratio is computed CROSS-
    MULTIPLIED in DECIMAL(38,0) — ``(S_d * n * 1e6) div (n_d * S)``
    — no float division, so the DuckDB twin (HUGEINT ``//``) is
    bit-exact. The weekday key is ``epoch_day % 7`` (0 = Thursday:
    1970-01-01), pure integer arithmetic identical on any engine —
    never an engine-specific dayofweek() whose week origin differs.

    Spark shape (100 TB): ONE corpus shuffle for the (series, day)
    daily rollup; everything after runs on O(series x days) rows —
    the dow rollup, the per-series totals (derived from the dow
    rollup, NOT a second corpus scan), and a broadcast join back.
    """
    s, t = F.col(series_col), F.col(ts_col)
    daily = (
        events.filter(s.isNotNull() & t.isNotNull())
        .groupBy(
            s.alias("series"),
            F.datediff(t.cast("date"), F.lit("1970-01-01")).alias(
                "_day"
            ),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dow = (
        daily.groupBy(
            "series", (F.col("_day") % 7).cast("long").alias("dow")
        )
        .agg(
            F.sum("c").alias("dow_events"),
            F.count(F.lit(1)).alias("dow_days"),
        )
    )
    totals = dow.groupBy("series").agg(
        F.sum("dow_events").alias("_S"),
        F.sum("dow_days").alias("_n"),
    )
    d38 = "decimal(38,0)"
    return (
        dow.join(F.broadcast(totals), "series")
        .select(
            "series",
            "dow",
            "dow_days",
            "dow_events",
            F.call_function(
                "div",
                F.col("dow_events").cast(d38)
                * F.col("_n").cast(d38)
                * F.lit(1_000_000).cast(d38),
                F.col("dow_days").cast(d38) * F.col("_S").cast(d38),
            )
            .cast("long")
            .alias("index_ppm"),
        )
    )


def decayed_topk(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    k: int = 50,
    horizon_days: int = 40,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Trending keys by exponentially time-decayed count (half-life =
    1 day): top-``k`` rows of
    ``decayed_score = sum(scale >> age_days)`` per key, ties broken
    by the key columns ascending.

    The per-event weight ``scale >> age`` IS ``scale * 2^-age`` in
    EXACT integer arithmetic (one right shift — no float pow, no libm
    ulps), with events older than ``horizon_days`` contributing 0, so
    the ranking is value-oracle-checkable and order-insensitive.
    ``age`` is measured in whole days against the corpus max day,
    computed IN-PLAN as a single-row aggregate broadcast back
    (no driver collect), so the operator stays a pure function of the
    input.  Scale shape: one scan + broadcast of a 1-row relation +
    ONE key-hash aggregation (map-side partials collapse events per
    key) + TakeOrderedAndProject for the bounded final ordering —
    never a global sort.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0 <= horizon_days <= 62:
        raise ValueError("horizon_days must be in [0, 62] (BIGINT shift)")
    now = df.select(F.max(F.to_date(ts_col)).alias("_now"))
    aged = df.crossJoin(F.broadcast(now)).withColumn(
        "_age", F.datediff(F.col("_now"), F.to_date(ts_col))
    )
    w = F.when(
        F.col("_age") <= horizon_days,
        F.expr(f"shiftright(cast({int(scale)} as bigint), "
               f"cast(_age as int))"),
    ).otherwise(F.lit(0).cast("long"))
    scored = (
        aged.groupBy(*key_cols)
        .agg(
            F.sum(w).alias("decayed_score"),
            F.count("*").alias("n_events"),
        )
    )
    return scored.orderBy(
        F.col("decayed_score").desc(), *[F.col(c) for c in key_cols]
    ).limit(k)


def interpolate_hourly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_mu_col: str,
) -> DataFrame:
    """Dense hourly spine per key with LINEAR interpolation of missing
    hours, in exact integer micro-units — the imputation step of every
    sensor/metric feature pipeline, where the usual float lerp would
    break a value oracle on libm/rounding differences.

    Input rows are (key, ts, value_mu) observations (``value_mu``
    already integer micro-units; pre-aggregate per hour upstream or
    rows in the same hour are summed here). For every key the spine
    runs from its first to its last observed hour; each missing hour
    gets

        v = v_prev + sign * (|(v_next - v_prev) * (h - h_prev)|
                             div (h_next - h_prev))

    — the exact rational lerp truncated TOWARD ZERO explicitly
    (Spark ``div`` truncates, DuckDB ``//`` floors; a downward slope
    would otherwise differ by one ulp between engines; the
    trend_slopes convention). Observed hours pass through; hours
    before the first / after the last observation cannot exist by
    spine construction, so every emitted row is 'obs' or 'interp' —
    the ``src`` column makes imputation auditable downstream.

    Scale shape: one (key, hour) aggregate, one per-key bounds
    aggregate + spine explode (fan-out = hours spanned, data-bounded),
    and two frame-bounded window passes over ONE key-hash shuffle —
    no self-join, no Python.  Interpolation products stay in BIGINT:
    |dv| * gap < 2^63 for micro-unit metrics and month-scale gaps;
    the multiply is guarded loudly at DECIMAL precision.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = df.groupBy(
        F.col(key_col).alias("key"), hour.alias("h")
    ).agg(F.sum(F.col(value_mu_col)).cast("long").alias("v"))

    bounds = hourly.groupBy("key").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "key",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    joined = spine.join(hourly, ["key", "h"], "left").withColumn(
        # integer div, not /3600.0: exact regardless of session tz
        "hn",
        F.call_function(
            "div", F.unix_timestamp("h"), F.lit(3600).cast("long")
        ),
    )

    w = Window.partitionBy("key").orderBy("hn")
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    after = w.rowsBetween(1, Window.unboundedFollowing)
    prev_v = F.last(F.col("v"), ignorenulls=True).over(before)
    prev_h = F.last(
        F.when(F.col("v").isNotNull(), F.col("hn")), ignorenulls=True
    ).over(before)
    next_v = F.first(F.col("v"), ignorenulls=True).over(after)
    next_h = F.first(
        F.when(F.col("v").isNotNull(), F.col("hn")), ignorenulls=True
    ).over(after)

    dec = "decimal(38,0)"
    dv = (next_v - prev_v).cast(dec)
    num = dv * (F.col("hn") - prev_h).cast(dec)
    den = (next_h - prev_h).cast(dec)
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    lmax = F.lit(9223372036854775807).cast(dec)
    mag = F.when(
        F.abs(num) <= lmax,
        F.call_function("div", F.abs(num), den).cast("long"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "interpolate_hourly: lerp product exceeds BIGINT — "
                "rescale value_mu"
            )
        ).cast("long")
    )
    lerp = prev_v + sgn * mag

    return (
        joined.select(
            F.col("key").alias(key_col),
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.when(F.col("v").isNotNull(), F.col("v"))
            .otherwise(lerp)
            .cast("long")
            .alias("value_mu"),
            F.when(F.col("v").isNotNull(), F.lit("obs"))
            .otherwise(F.lit("interp"))
            .alias("src"),
        )
    )


def ewma_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    alpha_den: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key exponentially weighted moving average of DAILY EVENT
    COUNTS in exact scaled integers — the smoothing step of every
    volume-monitoring pipeline, with the recursion

        s_t = s_{t-1} + (x_t * scale - s_{t-1}) / alpha_den

    (alpha = 1/alpha_den) evaluated as a row-local ARRAY FOLD: the
    day series is collected sorted per key (bounded by the calendar,
    not the corpus — document-days, not documents) and folded with
    one higher-order ``aggregate`` in whole-stage codegen, because a
    sequential recurrence cannot be a window function and a
    driver-side loop would not distribute. Division truncates TOWARD
    ZERO explicitly (sign * (|num| div den)) — the trend_slopes
    engine-pinning — since an upward step is positive and a downward
    step negative.

    Missing days count as x = 0 (the spine runs from the key's first
    to last day), so the decay sees real gaps. Output: one row per
    key with n_days (spine length), last_day, last_n (final day's
    raw count), ewma_scaled (the fold result, in ``scale`` units).

    Scale shape: one (key, day) aggregate + one key aggregate; the
    fold is O(spine length) integer ops per key, no Python, no extra
    shuffle. Keys whose spine would exceed ~100k days belong in a
    windowed variant; this one targets the monitoring horizon.
    """
    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
    ).cast("long")
    daily = df.groupBy(
        F.col(key_col).alias("key"), day.alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))

    per_key = daily.groupBy("key").agg(
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("d", "x")))
        ).alias("m"),
    )
    # dense spine as an array of scaled counts (0 for missing days)
    xs = F.transform(
        F.sequence(F.col("d0"), F.col("d1")),
        lambda dd: F.coalesce(
            F.element_at(F.col("m"), dd), F.lit(0).cast("long")
        )
        * F.lit(scale).cast("long"),
    )
    den = F.lit(alpha_den).cast("long")
    step = lambda acc, x: acc + F.when(  # noqa: E731
        x >= acc,
        F.call_function("div", x - acc, den),
    ).otherwise(-F.call_function("div", acc - x, den))
    # slice length must stay a real array bound: start + INT_MAX
    # overflows the int32 slice arithmetic and yields an EMPTY slice
    folded = F.aggregate(
        F.slice(xs, F.lit(2), F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        step,
    )
    return per_key.select(
        F.col("key").alias(key_col),
        (F.col("d1") - F.col("d0") + 1).cast("long").alias("n_days"),
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"),
                       F.col("d1").cast("int")),
            "yyyy-MM-dd",
        ).alias("last_day"),
        F.element_at(F.col("m"), F.col("d1")).alias("last_n"),
        folded.alias("ewma_scaled"),
    )
