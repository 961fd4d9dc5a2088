"""Shared LSH plumbing: exclusive persist pinning + hot-bucket caps.

Both LSH candidate generators (MinHash banding in dedup.py, SRP tables
in similarity.py) persist their signature subtree and self-join on
bucket keys. This module holds the two cross-cutting guards:

* ``pin_exclusive`` — persist a DataFrame while RELEASING the subtree
  pinned by the previous call. A bare ``persist()`` inside a function
  leaks cached blocks for the session lifetime when the function is
  invoked repeatedly (benchmark loops showed repeated "Asked to cache
  already cached data" warnings); exactly one pinned subtree per call
  site keeps warm re-runs fast without unbounded cache growth.
* ``cap_buckets`` — drop LSH buckets with more members than a caller
  chosen cap from candidate generation, LOGGING the drop (bucket and
  member counts) so truncation is never silent. The self-equi-join on
  bucket keys costs sum(bucket_size^2); one pathological bucket of B
  members is a B^2 candidate task. Because callers collapse exact
  duplicates BEFORE banding, only genuine sketch collisions between
  DISTINCT payloads can trip the cap — the common web-data hot bucket
  (a huge exact-duplicate class) never reaches it.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame, functions as F

_LOG = logging.getLogger("ocr_translation_spark.lsh")

# one pinned subtree per call-site key; the lock serializes swap
# decisions so concurrent callers can't race the dict or double-pin
_PINNED: dict[str, DataFrame] = {}
# driver-side scalars memoized per pin (invalidated on pin swap): a
# warm repeat of the same plan must not pay a separate Spark job to
# re-learn a property of data it already has cached
_PIN_META: dict[str, object] = {}
_PIN_LOCK = threading.Lock()


def pin_exclusive(df: DataFrame, site: str) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK: spills, never OOMs), releasing
    whatever the previous call at this ``site`` pinned — UNLESS the new
    plan is canonically identical to the pinned one, in which case the
    existing cache entry is kept and simply served again (Spark's
    CacheManager substitutes cached fragments into any matching plan),
    so repeat invocations of the same query stay warm. A call with a
    different input/parameters swaps the pin: exactly one cached
    subtree per site, no session-lifetime growth.

    Caveat (by design): a DIFFERENT-plan call at the same site
    unpersists the previous call's subtree even if that result hasn't
    been consumed yet — results stay correct (Spark recomputes), only
    the cache benefit is lost. Materialize a call's output before
    issuing another call at the same site when the speedup matters.
    """
    from pyspark import StorageLevel

    with _PIN_LOCK:
        old = _PINNED.get(site)
        if old is not None:
            try:
                same = (
                    old._jdf.queryExecution()
                    .analyzed()
                    .sameResult(df._jdf.queryExecution().analyzed())
                )
            except Exception:
                same = False
            if same:
                return df  # execution picks up the pinned cache by plan match
            try:
                old.unpersist()
            except Exception:
                pass
            _PINNED.pop(site, None)
            _PIN_META.pop(site, None)
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        _PINNED[site] = df
        return df


def pin_scalar(site: str, df: DataFrame, compute):
    """Memoized driver-side scalar tied to the pin at ``site``: when the
    pinned plan still matches ``df`` and a value was recorded, return it
    without running a job; otherwise run ``compute(df)`` once and record
    it. ``pin_exclusive(df, site)`` must have been called first.

    Caveat (by design, same as ``pin_exclusive``): the memo is keyed on
    the CANONICAL PLAN only. If the files behind an identical-looking
    plan are rewritten between calls (same path, new data), the stale
    scalar is returned — stronger staleness than Spark's own plan-keyed
    cache, which would at least recompute values. Sources are assumed
    immutable for the life of the pin; callers that rewrite source
    paths must call :func:`invalidate` (or :func:`unpin`) first."""
    with _PIN_LOCK:
        pinned = _PINNED.get(site)
        if pinned is not None and site in _PIN_META:
            try:
                same = (
                    pinned._jdf.queryExecution()
                    .analyzed()
                    .sameResult(df._jdf.queryExecution().analyzed())
                )
            except Exception:
                same = False
            if same:
                return _PIN_META[site]
    val = compute(df)
    with _PIN_LOCK:
        pinned = _PINNED.get(site)
        if pinned is not None:
            # record ONLY if the pin still matches the plan we computed
            # over — a concurrent caller may have swapped the pin to a
            # different corpus between compute and record, and blindly
            # recording would poison the memo with this corpus's value
            # under that corpus's pin
            try:
                same = (
                    pinned._jdf.queryExecution()
                    .analyzed()
                    .sameResult(df._jdf.queryExecution().analyzed())
                )
            except Exception:
                same = False
            if same:
                _PIN_META[site] = val
    return val


# prepared-plan reuse: site -> (source DataFrame, params, built result).
# Building a near-dup plan costs real driver time (hundreds of Catalyst
# expressions constructed through Py4J, then re-analyzed for the pin
# checks — ~0.5-0.8 s per call measured at sf0.1); a repeat call with
# the SAME source plan and parameters returns the previously built
# DataFrame outright, like a prepared statement. DataFrames are
# immutable, so reuse is always sound; the source match is canonical
# (sameResult on the analyzed SOURCE plan — cheap, the source is just
# a scan/projection, not the big derived plan).
_PREPARED: dict[str, tuple] = {}


def _same_plan(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    try:
        return (
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return False


def prepared(site: str, src, params: tuple, build):
    """Return the memoized result of ``build()`` for (``src``,
    ``params``) at this call site, rebuilding only when the source plan
    or the parameters changed. ``src`` is a DataFrame or a tuple of
    DataFrames/None (every element must match canonically).

    Caveat (by design): the match is on the CANONICAL SOURCE PLAN only.
    If the files behind an identical-looking plan are rewritten between
    calls (same path, new data), the memoized result is structurally
    stale — e.g. a dup fan-out built for the old corpus is returned for
    the new one — which goes beyond Spark's plan-keyed cache (that
    would at least recompute values). Sources are assumed immutable for
    the session; callers that rewrite source paths must call
    :func:`invalidate` for the site (or :func:`invalidate_all`) first.
    """
    srcs = src if isinstance(src, tuple) else (src,)
    with _PIN_LOCK:
        entry = _PREPARED.get(site)
    if (
        entry is not None
        and entry[1] == params
        and len(entry[0]) == len(srcs)
        and all(_same_plan(a, b) for a, b in zip(entry[0], srcs))
    ):
        return entry[2]
    res = build()
    with _PIN_LOCK:
        _PREPARED[site] = (srcs, params, res)
    return res


def invalidate(site: str) -> None:
    """Forget memoized state for ``site``: the prepared plan and the
    pin scalar. Call when the files behind a source path were
    rewritten in place — the canonical-plan matching of
    :func:`prepared` / :func:`pin_scalar` cannot see data changes
    behind an unchanged plan. Does NOT release the pinned cache
    (:func:`unpin` does that and also drops the scalar)."""
    with _PIN_LOCK:
        _PREPARED.pop(site, None)
        _PIN_META.pop(site, None)


def invalidate_all() -> None:
    """:func:`invalidate` for every site (e.g. after a bulk fixture
    rewrite in tests)."""
    with _PIN_LOCK:
        _PREPARED.clear()
        _PIN_META.clear()


def unpin(site: str) -> None:
    """Release the subtree pinned at ``site`` (no-op when none)."""
    with _PIN_LOCK:
        old = _PINNED.pop(site, None)
        _PIN_META.pop(site, None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass


def collapse_exact(
    members: DataFrame, site: str, payload: tuple[str, ...] = ()
):
    """One-pass exact-duplicate collapse shared by the three LSH
    near-dup generators (MinHash, SimHash, SRP).

    ``members`` is ``(_id, _fp, *payload)`` — a SINGLE scan of the
    corpus computing the id, the exact-duplicate fingerprint (content
    hash / sketch / the vector itself), and any payload the signature
    stage needs (e.g. the text). Returns ``(reps, dup_expand)``:

    * ``reps`` — one row per distinct ``_fp``: the representative
      (min ``_id``) with ITS payload (``min_by(payload, _id)``), so the
      expensive signature work downstream runs once per distinct
      payload. Backed by a pinned aggregate, so every downstream
      consumer (band explode, verify joins) reads the cache, not the
      corpus.
    * ``dup_expand`` — ``(_rep, _id)`` membership rows restricted to
      groups with >1 member, pinned; or **None when the corpus has no
      exact duplicates at all** — the overwhelmingly common case for a
      pre-deduped corpus — in which case callers skip the fan-out joins
      and the within-group self-join entirely and the plan collapses to
      the unguarded shape. The emptiness check is one driver-side
      aggregate over the already-pinned group counts (it doubles as the
      action that materializes the pin).

    Fan-out cost therefore scales with the duplicate groups, not the
    corpus: the full membership map never rides a join.
    """
    aggs = [F.min("_id").alias("_id"), F.count("*").alias("_n")]
    for c in payload:
        aggs.append(F.min_by(c, "_id").alias(c))
    grp = pin_exclusive(members.groupBy("_fp").agg(*aggs), f"{site}:grp")
    # memoized with the pin: a warm repeat of the same corpus answers
    # "any exact duplicates?" from the driver, not from a Spark job
    max_n = pin_scalar(
        f"{site}:grp",
        grp,
        lambda d: d.agg(F.max("_n")).collect()[0][0],
    )
    reps = grp.drop("_n")
    if max_n is None or max_n <= 1:
        unpin(f"{site}:dup")  # no stale membership pin from a prior corpus
        return reps, None
    dup_fps = grp.filter(F.col("_n") > 1).select(
        "_fp", F.col("_id").alias("_rep")
    )
    # join against the dup-groups-only slice (AQE broadcasts it when
    # small); singleton members — the common case — never ride a join
    dup_expand = pin_exclusive(
        members.select("_id", "_fp")
        .join(dup_fps, "_fp")
        .select("_rep", "_id"),
        f"{site}:dup",
    )
    return reps, dup_expand


def fan_out_pairs(
    rep_pairs: DataFrame, dup_expand: DataFrame, metric_col: str
) -> DataFrame:
    """Expand representative-level near-dup pairs to member-level pairs
    (cross-group fan-out): every member of ``id_a``'s exact-dup group
    pairs with every member of ``id_b``'s, inheriting the verified
    ``metric_col`` (identical payload => identical similarity). LEFT
    joins against the dup-groups-only map: a singleton rep coalesces to
    itself, so cost scales with duplicate groups, not the corpus."""
    return (
        rep_pairs.join(
            dup_expand.select(
                F.col("_rep").alias("id_a"), F.col("_id").alias("_ma")
            ),
            "id_a",
            "left",
        )
        .join(
            dup_expand.select(
                F.col("_rep").alias("id_b"), F.col("_id").alias("_mb")
            ),
            "id_b",
            "left",
        )
        .select(
            F.least(
                F.coalesce("_ma", F.col("id_a")),
                F.coalesce("_mb", F.col("id_b")),
            ).alias("id_a"),
            F.greatest(
                F.coalesce("_ma", F.col("id_a")),
                F.coalesce("_mb", F.col("id_b")),
            ).alias("id_b"),
            metric_col,
        )
    )


def within_group_pairs(dup_expand: DataFrame) -> DataFrame:
    """All ordered within-group pairs ``(id_a < id_b, _rep)`` of the
    exact-duplicate groups. The caller attaches the operator's metric
    (Jaccard 1.0 / Hamming 0 / cosine of the shared vector). A B-member
    group inherently emits B^2/2 rows; the self-join distributes across
    the cluster (AQE skew split), unlike a single LSH bucket task."""
    return (
        dup_expand.alias("x")
        .join(dup_expand.alias("y"), "_rep")
        .filter(F.col("x._id") < F.col("y._id"))
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            "_rep",
        )
    )


def cap_buckets(
    banded: DataFrame,
    keys: tuple[str, ...],
    max_bucket_size: int,
    what: str,
) -> tuple[DataFrame, int]:
    """Remove rows belonging to buckets with more than
    ``max_bucket_size`` members, logging how many buckets/rows were
    dropped (never silently). Returns (filtered, n_dropped_buckets).

    The size scan is one aggregate over the (ids-only) banded rows —
    cheap relative to the B^2 candidate join it prevents. Callers
    enable this only when a bounded candidate budget matters more than
    perfect recall; the drop count is the recall accounting.
    """
    sizes = banded.groupBy(*keys).agg(F.count("*").alias("_bsz"))
    big = sizes.filter(F.col("_bsz") > max_bucket_size)
    stats = big.agg(
        F.count("*").alias("nb"),
        F.coalesce(F.sum("_bsz"), F.lit(0)).alias("nrows"),
    ).collect()[0]
    if not stats["nb"]:
        return banded, 0
    _LOG.warning(
        "%s: dropping %d LSH bucket(s) over cap %d (%d member rows) "
        "from candidate generation — recall is reduced accordingly",
        what, stats["nb"], max_bucket_size, int(stats["nrows"]),
    )
    filtered = banded.join(
        F.broadcast(big.select(*keys)), list(keys), "left_anti"
    )
    return filtered, int(stats["nb"])
