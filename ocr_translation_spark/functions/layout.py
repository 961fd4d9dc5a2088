"""Input-layout guards for compute-heavy map stages.

A Spark scan parallelizes at file/row-group granularity: a corpus that
arrives as ONE small parquet file yields ONE input split, so a heavy
per-row expression (SimHash's 64-vote fold, 32-way MinHash signatures,
language-ID n-gram scoring) runs on a single task while the rest of
the cluster idles — measured 4.6x on the sf0.1 corpus (one 584 KB
file) at local[32].

``spread_small_input`` repartitions such inputs up to the session's
default parallelism. It is deliberately conservative so that at
production scale it is a no-op:

* only fires when the scan resolves to a known, small set of files
  (fewer files than cores) AND their total size is verifiably tiny
  (< ``SMALL_INPUT_BYTES``, local stat) — a 100 TB table has thousands
  of splits and never qualifies;
* an unresolvable layout (in-memory relation, remote store where the
  size can't be cheaply stat'ed) is left untouched — correctness never
  depends on it, only single-task latency.

The round-robin shuffle it introduces moves the RAW rows once — orders
of magnitude cheaper than serializing the per-row compute.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

SMALL_INPUT_BYTES = 256 << 20  # spread only verifiably tiny inputs


def spread_small_input(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    file scan would yield fewer splits than cores AND the input is
    verifiably small; otherwise return ``df`` unchanged."""
    try:
        sess = df.sparkSession
        target = int(
            min_parallelism or sess.sparkContext.defaultParallelism
        )
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return df  # remote store: don't stat, don't guess
        try:
            total += os.path.getsize(p.path or f)
        except OSError:
            return df
        if total >= SMALL_INPUT_BYTES:
            return df
    return df.repartition(target)
