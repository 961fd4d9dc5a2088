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
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        _PINNED[site] = df
        return df


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
