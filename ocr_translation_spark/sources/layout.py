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


# --------------------------------------------------------------------------
# Z-order (Morton) layout: multi-dimensional clustering
# --------------------------------------------------------------------------
#
# Range-sorting makes ONE column's file stats tight; a scan filtered on
# a second column still opens every file. Interleaving the bits of k
# columns (Morton order, the mechanism behind Delta/Iceberg OPTIMIZE
# ZORDER BY) keeps every file's bounding BOX small on all k dimensions
# simultaneously, so a predicate selective in several dimensions prunes
# multiplicatively from the same footer min/max stats — no new reader
# machinery, just a better sort key at write time.


def zorder_key(cols, bits: int = 16):
    """Morton interleave of ``cols`` (Columns or names) into one LONG:
    bit i of column j lands at position ``i * k + j``. Values are
    masked to the low ``bits`` bits — callers map their domain into
    [0, 2**bits) first (modulo, epoch-bucket, quantile rank...); the
    mask keeps an out-of-domain row from corrupting neighbours' bit
    planes. Pure whole-stage-codegen bit arithmetic, no Python."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits * k > 63:
        raise ValueError(f"bits*k = {bits * k} exceeds a positive LONG")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit((1 << bits) - 1)
        )
        for c in cols
    ]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return out


def zorder_key_sql(cols, bits: int = 16) -> str:
    """The IDENTICAL bit arithmetic as a DuckDB/ANSI SQL expression —
    the value-oracle twin of :func:`zorder_key`."""
    k = len(cols)
    mask = (1 << bits) - 1
    terms = [
        f"(((({c} & {mask}) >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame, path: str, cols, bits: int, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Morton key of ``cols``: one range shuffle on the key, sorted
    within each file, key dropped before write (the pruning stats
    live on the ORIGINAL columns — small per-file boxes on every
    dimension). Same single-shuffle cost as ``write_range_sorted``."""
    z = df.withColumn("_zkey", zorder_key(cols, bits))
    (
        z.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats_multi(
    path: str, cols: list[str]
) -> list[dict[str, Any]]:
    """Per-file footer (min, max) for EVERY column in ``cols`` plus the
    row count, in ONE metadata pass per file (a per-column
    ``file_stats`` loop would reopen and rescan each footer once per
    column). Empty files are skipped."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        if md.num_rows == 0:
            continue
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rec: dict[str, Any] = {"file": name, "rows": md.num_rows}
        for col in cols:
            lo, hi = None, None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[col]).statistics
                if st is None or not st.has_min_max:  # pragma: no cover
                    raise ValueError(
                        f"{name} has no min/max stats for {col}"
                    )
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rec[col] = (lo, hi)
        out.append(rec)
    return out


def skipping_report_2d(
    path: str, col_x: str, col_y: str, box: tuple
) -> dict[str, int]:
    """How many files a footer-stats-aware reader opens for the 2-D
    box predicate ``col_x BETWEEN lo_x AND hi_x AND col_y BETWEEN
    lo_y AND hi_y``: a file is opened iff its per-file [min, max]
    intersects the box on BOTH dimensions. One footer pass per file
    (both columns read together)."""
    lo_x, hi_x, lo_y, hi_y = box
    stats = file_stats_multi(path, [col_x, col_y])
    opened = sum(
        1
        for s in stats
        if s[col_x][1] >= lo_x
        and s[col_x][0] <= hi_x
        and s[col_y][1] >= lo_y
        and s[col_y][0] <= hi_y
    )
    return {
        "files_total": len(stats),
        "files_opened": opened,
        "rows_total": sum(s["rows"] for s in stats),
    }
