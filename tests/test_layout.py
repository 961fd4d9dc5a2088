"""Range-sorted layout: disjoint footer stats, bounded file opens,
filter pushdown — the data-skipping contract, not exact boundaries
(repartitionByRange samples split points)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.sources.layout import (
    file_stats,
    pushed_filters,
    skipping_report,
    write_range_sorted,
)

N_FILES = 16


@pytest.fixture(scope="module")
def sorted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("layout") / "events_by_ts")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    write_range_sorted(ev, d, "ts", N_FILES)
    return d


@pytest.fixture(scope="module")
def domain(spark):
    row = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .selectExpr("min(ts) lo", "max(ts) hi", "count(*) n")
        .collect()[0]
    )
    return row["lo"], row["hi"], row["n"]


def test_files_are_pairwise_disjoint_and_cover_all_rows(
    sorted_dir, domain
):
    stats = file_stats(sorted_dir, "ts")
    assert 2 <= len(stats) <= N_FILES
    assert sum(s["rows"] for s in stats) == domain[2]
    for a, b in zip(stats, stats[1:]):
        # globally range-partitioned: sorted-by-min files never
        # overlap (boundary duplicates stay in one partition)
        assert a["max"] <= b["min"]


def test_narrow_probe_opens_at_most_two_files(sorted_dir, domain):
    lo, hi, _ = domain
    span = hi - lo
    probe_lo = lo + span * 7 // 16
    probe_hi = lo + span * 7 // 16 + span // (4 * N_FILES)
    rep = skipping_report(sorted_dir, "ts", probe_lo, probe_hi)
    # a quarter-file-width interval intersects 1 file, 2 if it
    # straddles a boundary — never more under disjoint stats
    assert rep["files_opened"] <= 2
    assert rep["files_total"] >= 8


def test_full_domain_probe_opens_everything(sorted_dir, domain):
    lo, hi, _ = domain
    rep = skipping_report(sorted_dir, "ts", lo, hi)
    assert rep["files_opened"] == rep["files_total"]


def test_skipped_files_lose_no_rows(spark, sorted_dir, domain):
    """The pruning is sound: reading WITH the predicate over the
    sorted layout returns exactly the rows the unsorted source has
    in the interval."""
    lo, hi, _ = domain
    span = hi - lo
    a, b = lo + span // 3, lo + span // 2
    got = (
        spark.read.parquet(sorted_dir)
        .where(F.col("ts").between(a, b))
        .count()
    )
    want = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .where(F.col("ts").between(a, b))
        .count()
    )
    assert got == want > 0


def test_predicate_reaches_the_scan(spark, sorted_dir, domain):
    lo, hi, _ = domain
    plan = pushed_filters(
        spark, sorted_dir, f"ts >= timestamp'{lo}' AND ts <= timestamp'{hi}'"
    )
    assert "PushedFilters: [" in plan
    assert "ts" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
