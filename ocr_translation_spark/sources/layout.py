"""Range-sorted file layout + data-skipping evidence.

The third leg of the repo's storage-layout story:

* hash-BUCKETED layout (`catalog.write_bucketed_documents`) makes
  id-keyed joins shuffle-free (`snapshot_diff`'s plan test);
* the append/compact cache layout (`catalog.merge_cache`) makes
  incremental writes O(new);
* this module makes RANGE-PREDICATE scans O(selectivity): a
  `repartitionByRange(col).sortWithinPartitions(col)` write produces
  parquet files whose per-file (and per-row-group) min/max statistics
  on ``col`` are pairwise disjoint, so a ``WHERE col BETWEEN lo AND
  hi`` scan opens only the files whose range intersects — the
  time-partitioned layout every event/log table at 100 TB needs
  (Spark skips via pushed filters against footer stats; table formats
  via their manifest min/max, same mechanism one level up).

Nothing here is a new execution operator — the point is the LAYOUT
CONTRACT and the measurable evidence for it:

* :func:`write_range_sorted` — the writer (one range shuffle, global
  order across files, sorted within each);
* :func:`file_stats` — per-file footer min/max read back via pyarrow
  (no Spark job);
* :func:`skipping_report` — for a predicate interval, how many files
  a stats-aware reader must open under this layout, alongside the
  total (what an unsorted layout — every file overlapping the full
  domain — would open). The pytest pins disjointness, the <=2-file
  bound for a sub-range probe, and Spark's `PushedFilters` on the
  scan.

`repartitionByRange` samples partition bounds (reservoir per
partition), so FILE BOUNDARIES can shift between runs on the same
data; the layout contract (sortedness, disjointness, pruning bound)
is deterministic even though the exact split points are not — tests
assert the contract, never the boundaries.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by ``col`` — globally ordered across files, so per-file
    min/max intervals are pairwise disjoint (modulo duplicate boundary
    values, which range partitioning keeps in one partition)."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(path: str, col: str) -> list[dict[str, Any]]:
    """Per-file footer (min, max, rows) for ``col``, smallest-min
    first — read with pyarrow directly from the parquet metadata, the
    same statistics a pruning reader consults. Empty files (a range
    partition can be empty) are skipped."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        if md.num_rows == 0:
            continue
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
            col
        ]
        lo, hi = None, None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:  # pragma: no cover
                raise ValueError(f"{name} has no min/max stats for {col}")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append(
            {"file": name, "min": lo, "max": hi, "rows": md.num_rows}
        )
    out.sort(key=lambda s: s["min"])
    return out


def skipping_report(
    path: str, col: str, lo: Any, hi: Any
) -> dict[str, int]:
    """How many files a footer-stats-aware reader opens for
    ``col BETWEEN lo AND hi`` under this layout: a file is opened iff
    its [min, max] intersects [lo, hi]. ``files_total`` is what a
    layout with no usable stats (every file spanning the domain)
    would open."""
    stats = file_stats(path, col)
    opened = sum(1 for s in stats if s["max"] >= lo and s["min"] <= hi)
    return {
        "files_total": len(stats),
        "files_opened": opened,
        "rows_total": sum(s["rows"] for s in stats),
    }


def pushed_filters(
    spark: SparkSession, path: str, predicate: str
) -> str:
    """The optimized-plan scan line for ``predicate`` over ``path`` —
    callers assert ``PushedFilters: [...]`` mentions their column, the
    contract that row-group skipping actually engages at read time."""
    df = spark.read.parquet(path).where(predicate)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan
