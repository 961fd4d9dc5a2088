"""Grid-bucketed spatial join: hand-computed containment answers,
inclusive boundaries, cell-straddling zones, multi-zone points, the
inverted-rectangle guard, a no-nested-loop plan assertion, and a
brute-force Python parity sweep over the registered query."""

from __future__ import annotations

import pytest
from pyspark.errors import PySparkException
from pyspark.sql import Row, functions as F

from ocr_translation_spark.functions.spatial import (
    grid_point_in_rect_join,
)


def _zones(spark, rows):
    return spark.createDataFrame(
        [
            Row(zone_id=i, x0=a, x1=b, y0=c, y1=d)
            for i, (a, b, c, d) in enumerate(rows)
        ],
        "zone_id int, x0 long, x1 long, y0 long, y1 long",
    )


def _points(spark, pts):
    return spark.createDataFrame(
        [Row(pid=i, x=x, y=y) for i, (x, y) in enumerate(pts)],
        "pid int, x long, y long",
    )


def test_containment_pairs_and_boundaries(spark):
    # zone 0 straddles the 256-cell boundary; zone 1 nests inside it
    zones = _zones(
        spark, [(200, 600, 200, 600), (300, 400, 300, 400)]
    )
    pts = _points(
        spark,
        [
            (200, 200),  # zone 0's inclusive lower corner
            (600, 600),  # zone 0's inclusive upper corner
            (300, 400),  # inside both zones
            (601, 300),  # just outside x1
            (199, 300),  # just outside x0
            (None, 5),  # NULL coordinates match nothing
        ],
    )
    got = sorted(
        (r["pid"], r["zone_id"])
        for r in grid_point_in_rect_join(pts, zones, cell_bits=8)
        .select("pid", "zone_id")
        .collect()
    )
    assert got == [(0, 0), (1, 0), (2, 0), (2, 1)]


def test_cell_bits_granularity_invariance(spark):
    """The pair set is independent of the grid granularity — the grid
    only routes candidates; the exact predicate decides."""
    zones = _zones(spark, [(10, 1000, 10, 1000), (0, 15, 0, 15)])
    pts = _points(
        spark, [(x * 37 % 1100, x * 91 % 1100) for x in range(200)]
    )
    expect = None
    for bits in (2, 6, 10):
        got = sorted(
            (r["pid"], r["zone_id"])
            for r in grid_point_in_rect_join(
                pts, zones, cell_bits=bits
            )
            .select("pid", "zone_id")
            .collect()
        )
        if expect is None:
            expect = got
        assert got == expect, f"cell_bits={bits} changed the pairs"
    assert expect  # non-degenerate


def test_inverted_rectangle_fails_loudly(spark):
    zones = _zones(spark, [(600, 200, 0, 10)])  # x0 > x1
    pts = _points(spark, [(300, 5)])
    with pytest.raises(PySparkException, match="sequence"):
        grid_point_in_rect_join(pts, zones).collect()


def test_no_nested_loop_join(spark):
    """The whole point: a hash equi-join on the cell key, never
    BroadcastNestedLoopJoin / CartesianProduct."""
    zones = _zones(spark, [(0, 500, 0, 500)])
    pts = _points(spark, [(i, i) for i in range(50)])
    plan = (
        grid_point_in_rect_join(pts, zones)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_parity_with_python_reference_on_planted_zones(spark):
    import hashlib

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    qdf = entry_mod.queries()["geo_grid_join"](spark, sf).collect()

    zones = []
    for n in range(25):
        for r in range(4):
            x0 = ((n * 97 + r * 53) % 64) * 64
            y0 = ((n * 71 + r * 29) % 64) * 64
            x1 = min(x0 + 64 * (1 + (n + r) % 8) - 1, 4095)
            y1 = min(y0 + 64 * (1 + (n * 2 + r) % 8) - 1, 4095)
            zones.append((n * 4 + r, f"NATION_{n}", x0, x1, y0, y1))
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "user_id")
        .collect()
    )
    agg: dict = {}
    for row in ev:
        h = hashlib.sha256(str(row["event_id"]).encode()).hexdigest()
        x, y = int(h[8:11], 16), int(h[11:14], 16)
        hit = False
        for zid, owner, x0, x1, y0, y1 in zones:
            if x0 <= x <= x1 and y0 <= y <= y1:
                hit = True
                cnt, users = agg.get((zid, owner), (0, set()))
                users.add(row["user_id"])
                agg[(zid, owner)] = (cnt + 1, users)
        if not hit:
            cnt, users = agg.get((-1, "(none)"), (0, set()))
            users.add(row["user_id"])
            agg[(-1, "(none)")] = (cnt + 1, users)
    expect = {k: (c, len(u)) for k, (c, u) in agg.items()}
    got = {
        (r["zone_id"], r["owner"]): (r["n_points"], r["n_users"])
        for r in qdf
    }
    assert got == expect
