"""Incremental mergeable-rollup maintenance (functions/rollup).

The invariant under test: merge(build(part1), ..., build(partK)) ==
build(whole), for any split and any merge order — including when the
stored rollup is read back from parquet (the real maintenance path,
where the base corpus is never rescanned).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ocr_translation_spark.functions.rollup import (
    build_rollup,
    merge_rollups,
)

KEYS = ["k"]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k string, amt decimal(18,4), ts timestamp"
    )


def _rollup(df):
    return build_rollup(df, KEYS, sums=["amt"], mins=["ts"], maxs=["ts"])


def _snap(df):
    return {
        r.k: (r.n_rows, r.sum_amt, r.min_ts, r.max_ts)
        for r in df.collect()
    }


def _rand_rows(rng, n, keys=("a", "b", "c", "d")):
    import datetime
    from decimal import Decimal

    return [
        (
            rng.choice(keys),
            Decimal(rng.randrange(-500000, 5000000)) / 10000,
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(seconds=rng.randrange(10**6)),
        )
        for _ in range(n)
    ]


def test_merge_of_split_equals_full_build(spark):
    rng = random.Random(42)
    rows = _rand_rows(rng, 300)
    full = _snap(_rollup(_mk(spark, rows)))
    for cut in (1, 150, 299):
        merged = merge_rollups(
            _rollup(_mk(spark, rows[:cut])),
            _rollup(_mk(spark, rows[cut:])),
            KEYS,
        )
        assert _snap(merged) == full, f"cut={cut}"


def test_iterated_merges_match_and_keep_schema(spark):
    rng = random.Random(7)
    rows = _rand_rows(rng, 400)
    full = _rollup(_mk(spark, rows))
    acc = _rollup(_mk(spark, rows[:100]))
    for lo in (100, 200, 300):
        acc = merge_rollups(acc, _rollup(_mk(spark, rows[lo:lo + 100])), KEYS)
    # dtypes must not drift across merge generations (DECIMAL widening
    # is re-cast inside merge_rollups); nullability may differ
    assert acc.dtypes == full.dtypes
    assert _snap(acc) == _snap(full)


def test_merge_from_parquet_never_rescans_base(spark, tmp_path):
    rng = random.Random(3)
    base_rows, delta_rows = _rand_rows(rng, 250), _rand_rows(rng, 50)
    stored = str(tmp_path / "rollup.parquet")
    _rollup(_mk(spark, base_rows)).write.parquet(stored)
    old = spark.read.parquet(stored)
    merged = merge_rollups(old, _rollup(_mk(spark, delta_rows)), KEYS)
    # the maintenance plan reads the STORED VIEW from parquet (one
    # FileScan); the only other input is the delta's in-memory rows —
    # the base corpus never appears
    plan = merged._jdf.queryExecution().toString()
    assert "FileScan parquet" in plan and plan.count("Scan ExistingRDD") == 1
    assert _snap(merged) == _snap(_rollup(_mk(spark, base_rows + delta_rows)))


def test_new_and_disappearing_keys_merge_correctly(spark):
    import datetime
    from decimal import Decimal as D

    t = datetime.datetime(2024, 6, 1)
    a = _rollup(_mk(spark, [("old", D("1.0"), t), ("both", D("2.0"), t)]))
    b = _rollup(_mk(spark, [("new", D("5.0"), t), ("both", D("3.0"), t)]))
    got = _snap(merge_rollups(a, b, KEYS))
    assert set(got) == {"old", "both", "new"}
    assert got["both"][0] == 2 and float(got["both"][1]) == 5.0


def test_shape_mismatch_and_unknown_column_error(spark):
    import datetime
    import pytest
    from decimal import Decimal as D

    t = datetime.datetime(2024, 6, 1)
    a = _rollup(_mk(spark, [("x", D("1.0"), t)]))
    b = build_rollup(_mk(spark, [("x", D("1.0"), t)]), KEYS, sums=["amt"])
    with pytest.raises(ValueError, match="shapes differ"):
        merge_rollups(a, b, KEYS)
    bad = a.withColumnRenamed("sum_amt", "avg_amt")
    with pytest.raises(ValueError, match="non-mergeable"):
        merge_rollups(bad, bad, KEYS)
