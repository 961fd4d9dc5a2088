"""Grouped top-k pushdown (functions/topk.py): row-set equality with
the plain (unpruned) rank window on randomized data with heavy ties,
partition invariance, ascending mode, NULL drops, the pruning-
actually-bounds property, and the k guard."""

import random

import pytest

from pyspark.sql import Window, functions as F

from ocr_translation_spark.functions.topk import grouped_topk


def _plain_window(df, group, order, tie, k, ascending=False):
    o = F.col(order).asc() if ascending else F.col(order).desc()
    w = Window.partitionBy(group).orderBy(o, F.col(tie).asc())
    return (
        df.filter(F.col(group).isNotNull() & F.col(order).isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_equals_plain_window_with_ties(spark):
    rng = random.Random(5)
    rows = [
        (i, f"g{rng.randrange(6)}", float(rng.randrange(10)))
        for i in range(3000)
    ]  # value range 0..9: massive ties, tiebreak must carry
    df = spark.createDataFrame(
        rows, "id long, g string, v double"
    ).repartition(11)
    got = _rows(grouped_topk(df, "g", "v", "id", k=4))
    want = _rows(_plain_window(df, "g", "v", "id", 4))
    assert got == want
    assert len(got) == 6 * 4


def test_ascending_mode(spark):
    rows = [(i, "g", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = grouped_topk(df, "g", "v", "id", k=3, ascending=True)
    assert [(r["v"], r["rank"]) for r in
            sorted(got.collect(), key=lambda r: r["rank"])] == [
        (0.0, 1), (1.0, 2), (2.0, 3)]


def test_partition_invariance(spark):
    rng = random.Random(9)
    rows = [(i, f"g{i % 4}", rng.uniform(0, 1)) for i in range(800)]
    a = _rows(grouped_topk(
        spark.createDataFrame(rows, "id long, g string, v double")
        .coalesce(1), "g", "v", "id", k=5))
    b = _rows(grouped_topk(
        spark.createDataFrame(rows, "id long, g string, v double")
        .repartition(13), "g", "v", "id", k=5))
    assert a == b


def test_null_groups_and_values_dropped(spark):
    rows = [(1, "g", 5.0), (2, None, 9.0), (3, "g", None), (4, "g", 7.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = _rows(grouped_topk(df, "g", "v", "id", k=2))
    assert [r[0] for r in sorted(got, key=lambda r: r[3])] == [4, 1]


def test_prune_bounds_shuffled_rows(spark):
    # the pruned relation must carry <= k rows per (partition, group):
    # with P partitions and one hot group, at most k*P rows reach the
    # window — not the group's full size
    from ocr_translation_spark.functions.topk import _local_prune

    rows = [(i, "hot", float(i)) for i in range(5000)]
    df = spark.createDataFrame(
        rows, "id long, g string, v double"
    ).repartition(8)
    assert _local_prune(df, "g", "v", "id", 3, False).count() <= 3 * 8
    out = grouped_topk(df, "g", "v", "id", k=3)
    assert [int(r["v"]) for r in
            sorted(out.collect(), key=lambda r: r["rank"])] == [
        4999, 4998, 4997]


def test_k_guard(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, g string, v double")
    with pytest.raises(ValueError):
        grouped_topk(df, "g", "v", "id", k=0)
