"""Z-order (Morton) layout: exact interleave arithmetic, and the
multi-dimensional data-skipping contract — a 2-D box probe must open
FEWER files than a single-column range sort can, and pruning must be
sound (skipped files hold no matching rows)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.sources.layout import (
    skipping_report_2d,
    write_range_sorted,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)

N_FILES = 64
BITS = 10  # domain [0, 1024) per dimension


def _morton_py(vals, bits):
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    rng = random.Random(20260818)
    rows = [
        (rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r.z
        for r in df.select(zorder_key(["x", "y"], bits=16).alias("z"))
        .collect()
    ]
    want = [_morton_py([x & 0xFFFF, y & 0xFFFF], 16) for x, y in rows]
    assert got == want


def test_zorder_key_sql_twin_is_identical(spark):
    import duckdb

    rng = random.Random(7)
    rows = [(rng.randrange(1 << 12), rng.randrange(1 << 12)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(
        r.z
        for r in df.select(zorder_key(["x", "y"], bits=12).alias("z"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {zorder_key_sql(['x', 'y'], bits=12)} FROM t"
        ).fetchall()
    )
    assert got == want


def test_zorder_key_three_columns_and_guards(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    z = df.select(zorder_key(["a", "b", "c"], bits=8).alias("z")).collect()
    assert z[0].z == _morton_py([1, 2, 3], 8)
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key(["a"], bits=8)
    with pytest.raises(ValueError, match="LONG"):
        zorder_key(["a", "b"], bits=32)


def test_zorder_key_is_pure_codegen(spark):
    df = spark.createDataFrame([(5, 9)], "x long, y long")
    plan = (
        df.select(zorder_key(["x", "y"]).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


@pytest.fixture(scope="module")
def grids(spark, tmp_path_factory):
    """The same uniform 2-D corpus written two ways: range-sorted on x
    only, and z-ordered on (x, y)."""
    base = tmp_path_factory.mktemp("zorder")
    n = 200_000
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            (
                F.conv(F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 8), 16, 10)
                .cast("long") % (1 << BITS)
            ).alias("x"),
            (
                F.conv(F.substring(F.sha2(F.col("id").cast("string"), 256), 9, 8), 16, 10)
                .cast("long") % (1 << BITS)
            ).alias("y"),
        )
    )
    by_x = str(base / "by_x")
    by_z = str(base / "by_z")
    write_range_sorted(df, by_x, "x", N_FILES)
    write_zordered(df, by_z, ["x", "y"], BITS, N_FILES)
    return by_x, by_z, n


def test_zorder_prunes_2d_box_better_than_single_column(grids):
    by_x, by_z, _ = grids
    # a box covering 1/8 of each dimension = 1/64 of the area
    side = (1 << BITS) // 8
    box = (0, side - 1, 0, side - 1)
    rep_x = skipping_report_2d(by_x, "x", "y", box)
    rep_z = skipping_report_2d(by_z, "x", "y", box)
    assert rep_x["files_total"] == rep_z["files_total"] == N_FILES
    # x-sorted layout: prunes on x only (~1/8 of files), y stats are
    # useless (every file spans the full y domain)
    assert rep_x["files_opened"] >= N_FILES // 8
    # z-ordered layout: both dimensions prune; strictly better, and by
    # a wide margin (the contract, with slack for boundary files)
    assert rep_z["files_opened"] < rep_x["files_opened"]
    assert rep_z["files_opened"] <= N_FILES // 4


def test_zorder_pruning_is_sound(spark, grids):
    by_x, by_z, _ = grids
    side = (1 << BITS) // 8
    lo_x, hi_x, lo_y, hi_y = 0, side - 1, 0, side - 1
    import os

    stats_all = spark.read.parquet(by_z)
    want = stats_all.filter(
        (F.col("x").between(lo_x, hi_x)) & (F.col("y").between(lo_y, hi_y))
    ).count()
    # read ONLY the files a stats-aware reader would open
    from ocr_translation_spark.sources.layout import file_stats_multi

    opened = [
        os.path.join(by_z, s["file"])
        for s in file_stats_multi(by_z, ["x", "y"])
        if s["x"][1] >= lo_x
        and s["x"][0] <= hi_x
        and s["y"][1] >= lo_y
        and s["y"][0] <= hi_y
    ]
    got = (
        spark.read.parquet(*opened)
        .filter(
            (F.col("x").between(lo_x, hi_x))
            & (F.col("y").between(lo_y, hi_y))
        )
        .count()
    )
    assert got == want > 0
