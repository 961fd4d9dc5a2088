"""Association-rule mining (functions/assoc)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_translation_spark.functions.assoc import association_rules


def _items(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_hand_computed_support_confidence_lift(spark):
    # 4 baskets; x in 1,2,3; y in 1,2; z in 3,4. Pair (x,y) supp 2,
    # (x,z) supp 1.
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "z"),
    ]
    out = {
        (r.item_a, r.item_b): r
        for r in association_rules(
            _items(spark, rows),
            item_lo=(1, 100),   # floor 1% — everything passes
            item_hi=(1, 1),     # ceiling 100%
            pair_min=(1, 100),  # pair floor 1% — everything passes
        ).collect()
    }
    xy = out[("x", "y")]
    assert (xy.supp_ab, xy.supp_a, xy.supp_b) == (2, 3, 2)
    assert xy.conf_ab_micro == (2 * 10**6) // 3  # 666666 truncated
    assert xy.conf_ba_micro == 10**6
    assert xy.lift_micro == (2 * 4 * 10**6) // (3 * 2)  # 1333333
    xz = out[("x", "z")]
    assert (xz.supp_ab, xz.supp_a, xz.supp_b) == (1, 3, 2)
    assert xz.lift_micro == (1 * 4 * 10**6) // (3 * 2)  # 666666 < 1e6
    # y and z never co-occur -> no row
    assert ("y", "z") not in out


def test_band_thresholds_are_exact_cross_products(spark):
    # 10 baskets; "rare" df=1 (10%), "mid" df=5, "stop" df=10 (100%)
    rows = []
    for b in range(10):
        rows.append((b, "stop"))
        if b < 5:
            rows.append((b, "mid"))
    rows.append((0, "rare"))
    out = association_rules(
        _items(spark, rows),
        item_lo=(1, 5),   # floor 20% -> "rare" (10%) pruned
        item_hi=(1, 2),   # ceiling 50% -> "stop" pruned
        pair_min=(1, 100),
    ).collect()
    items_seen = {r.item_a for r in out} | {r.item_b for r in out}
    assert items_seen == set()  # only "mid" survives -> no pairs
    # widen the ceiling: (mid, stop) pairs appear
    out2 = association_rules(
        _items(spark, rows),
        item_lo=(1, 5),
        item_hi=(1, 1),
        pair_min=(1, 100),
    ).collect()
    assert {(r.item_a, r.item_b) for r in out2} == {("mid", "stop")}
    assert out2[0].supp_ab == 5


def test_per_basket_cap_keeps_rarest_items(spark):
    # one basket with items of df 1..5 (via extra baskets), cap 3:
    # only the 3 rarest items of basket 0 pair up
    rows = [(0, f"i{d}") for d in range(1, 6)]
    for d in range(1, 6):
        for b in range(1, d):
            rows.append((b * 100 + d, f"i{d}"))  # df(i_d) = d
    out = association_rules(
        _items(spark, rows),
        item_lo=(1, 1000),
        item_hi=(1, 1),
        pair_min=(1, 1000),
        per_basket_cap=3,
    ).collect()
    pairs = {(r.item_a, r.item_b) for r in out}
    # rarest three in basket 0 are i1 (df1), i2 (df2), i3 (df3)
    assert pairs == {("i1", "i2"), ("i1", "i3"), ("i2", "i3")}
    with pytest.raises(ValueError, match="cap"):
        association_rules(_items(spark, rows), per_basket_cap=1)


def test_duplicates_and_nulls_collapse(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, None), (2, "y")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = association_rules(
        df, item_lo=(1, 100), item_hi=(1, 1), pair_min=(1, 100)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.supp_ab, r.supp_a, r.supp_b) == (
        "x", "y", 2, 2, 2,
    )
    assert r.lift_micro == 10**6  # perfectly dependent, n=2


def test_partition_invariance(spark):
    rows = [
        (b, f"i{(b * 7 + j) % 13}") for b in range(40) for j in range(6)
    ]
    df = _items(spark, rows)
    kw = dict(item_lo=(1, 100), item_hi=(1, 1), pair_min=(1, 100))
    a = {tuple(r) for r in association_rules(df, **kw).collect()}
    b = {
        tuple(r)
        for r in association_rules(df.repartition(11), **kw).collect()
    }
    assert a == b and a
