"""Grid-DBSCAN density clusters, exact hourly linear interpolation,
and equi-width histogram drift vs pure-Python mirrors."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from ocr_translation_spark.functions.drift import histogram_drift
from ocr_translation_spark.functions.spatial import (
    grid_density_clusters,
)
from ocr_translation_spark.functions.timeseries import (
    interpolate_hourly,
)


# ------------------------------------------------------- grid-DBSCAN


def _mirror_clusters(points, min_pts, bits=6):
    from collections import Counter, deque

    cells = Counter(((x >> bits, y >> bits) for x, y in points))
    core = {c for c, n in cells.items() if n >= min_pts}
    seen, rows = set(), []
    stride = (1 << bits) * 4
    for c in core:
        if c in seen:
            continue
        comp, q = [], deque([c])
        seen.add(c)
        while q:
            cur = q.popleft()
            comp.append(cur)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cur[0] + dx, cur[1] + dy)
                    if nb in core and nb not in seen:
                        seen.add(nb)
                        q.append(nb)
        rows.append(
            (
                min(cx * stride + cy for cx, cy in comp),
                len(comp),
                sum(cells[c2] for c2 in comp),
                min(c2[0] for c2 in comp),
                max(c2[0] for c2 in comp),
                min(c2[1] for c2 in comp),
                max(c2[1] for c2 in comp),
            )
        )
    noise_cells = [c for c in cells if c not in core]
    rows.append(
        (
            -1,
            len(noise_cells),
            sum(cells[c] for c in noise_cells),
            None,
            None,
            None,
            None,
        )
    )
    return sorted(rows)


def _spark_clusters(spark, points, min_pts):
    df = spark.createDataFrame(points, "x long, y long")
    got = grid_density_clusters(
        df, min_pts_expr=F.lit(min_pts).cast("long")
    ).collect()
    return sorted(tuple(r) for r in got)


def test_two_blobs_and_noise(spark):
    rng = random.Random(3)
    pts = []
    # blob A: 60 points in a 40x40 square straddling a cell border
    pts += [
        (100 + rng.randrange(40), 50 + rng.randrange(40))
        for _ in range(60)
    ]
    # blob B: 50 points, far away
    pts += [
        (900 + rng.randrange(30), 900 + rng.randrange(30))
        for _ in range(50)
    ]
    # background noise
    pts += [
        (rng.randrange(4096), rng.randrange(4096)) for _ in range(40)
    ]
    assert _spark_clusters(spark, pts, 8) == _mirror_clusters(pts, 8)


def test_diagonal_adjacency_merges(spark):
    # two dense cells touching only at a corner: 8-adjacency joins them
    pts = [(63, 63)] * 10 + [(64, 64)] * 10
    got = _spark_clusters(spark, pts, 8)
    assert got == _mirror_clusters(pts, 8)
    clusters = [r for r in got if r[0] != -1]
    assert len(clusters) == 1 and clusters[0][1] == 2  # one, 2 cells


def test_out_of_domain_points_raise(spark):
    # (cx, -1) would alias the REAL cell (cx-1, stride-1) under the
    # packed id; the domain guard raises instead of silently merging
    import pytest
    from pyspark.sql import functions as SF
    from pyspark.sql.utils import CapturedException

    df = spark.createDataFrame([(5, -3)] * 10, "x long, y long")
    with pytest.raises(CapturedException):
        grid_density_clusters(
            df, min_pts_expr=SF.lit(1).cast("long")
        ).collect()
    big = spark.createDataFrame([(5, 1 << 20)] * 10, "x long, y long")
    with pytest.raises(CapturedException):
        grid_density_clusters(
            big, min_pts_expr=SF.lit(1).cast("long")
        ).collect()


def test_all_noise(spark):
    pts = [(i * 97 % 4096, i * 53 % 4096) for i in range(30)]
    got = _spark_clusters(spark, pts, 8)
    assert got == _mirror_clusters(pts, 8)
    assert got[0][0] == -1 and got[0][2] == 30  # all points accounted


# --------------------------------------------- linear interpolation


def _mirror_interp(obs):
    """obs: {(key, hour_index): value}. Returns mirror rows."""
    out = []
    keys = {k for k, _ in obs}
    for k in sorted(keys):
        hs = sorted(h for kk, h in obs if kk == k)
        lo, hi = hs[0], hs[-1]
        for h in range(lo, hi + 1):
            if (k, h) in obs:
                out.append((k, h, obs[(k, h)], "obs"))
            else:
                hp = max(x for x in hs if x < h)
                hn = min(x for x in hs if x > h)
                vp, vn = obs[(k, hp)], obs[(k, hn)]
                num = (vn - vp) * (h - hp)
                den = hn - hp
                mag = abs(num) // den
                out.append(
                    (k, h, vp + (1 if num >= 0 else -1) * mag, "interp")
                )
    return sorted(out)


def _spark_interp(spark, obs):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(hours=h), v)
        for (k, h), v in obs.items()
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, v long"
    )
    got = interpolate_hourly(df, "key", "ts", "v").collect()
    out = []
    for r in got:
        h = dt.datetime.strptime(r["hour"], "%Y-%m-%d %H:%M:%S")
        out.append(
            (
                r["key"],
                int((h - base).total_seconds()) // 3600,
                r["value_mu"],
                r["src"],
            )
        )
    return sorted(out)


def test_interp_gap_descending_and_truncation(spark):
    obs = {
        ("a", 0): 10,
        ("a", 4): 3,  # descending: -7 over 4 hours, toward-zero div
        ("b", 2): 5,
        ("b", 3): 6,  # no gap
    }
    assert _spark_interp(spark, obs) == _mirror_interp(obs)


def test_interp_randomized(spark):
    rng = random.Random(9)
    obs = {}
    for k in ("x", "y", "z"):
        for h in sorted(rng.sample(range(48), rng.randint(2, 9))):
            obs[(k, h)] = rng.randint(-500, 500)
    assert _spark_interp(spark, obs) == _mirror_interp(obs)


def test_interp_same_hour_rows_sum(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("k", base, 3),
            ("k", base + dt.timedelta(minutes=30), 4),  # same hour
            ("k", base + dt.timedelta(hours=2), 1),
        ],
        "key string, ts timestamp, v long",
    )
    got = {
        r["hour"]: (r["value_mu"], r["src"])
        for r in interpolate_hourly(df, "key", "ts", "v").collect()
    }
    assert got["2024-01-01 00:00:00"] == (7, "obs")
    assert got["2024-01-01 01:00:00"] == (4, "interp")  # 7 + (1-7)*1//2
    assert got["2024-01-01 02:00:00"] == (1, "obs")


# ---------------------------------------------------- histogram drift


def _mirror_drift(vals, n_bins=16):
    valid = [(v, a) for v, a in vals if v is not None and a is not None]
    excl = [(v, a) for v, a in vals if v is None or a is None]
    vmin, vmax = min(v for v, _ in valid), max(v for v, _ in valid)
    width = vmax - vmin + 1
    cells = {}
    for v, a in valid:
        b = min(n_bins - 1, (v - vmin) * n_bins // width)
        cells.setdefault(b, [0, 0])[0 if a else 1] += 1
    ta = sum(1 for _, a in valid if a)
    tb = len(valid) - ta
    out = []
    for b in range(n_bins):
        an, bn = cells.get(b, (0, 0))
        ap = an * 1_000_000 // ta if ta else 0
        bp = bn * 1_000_000 // tb if tb else 0
        out.append((b, an, bn, ap, bp, abs(ap - bp)))
    ea = sum(1 for _, a in excl if a is True)
    out.insert(0, (-1, ea, len(excl) - ea, None, None, None))
    return out


def test_histogram_drift_matches_mirror(spark):
    rng = random.Random(21)
    vals = [(rng.randint(0, 999), rng.random() < 0.5) for _ in range(400)]
    vals += [(rng.randint(800, 999), False) for _ in range(80)]  # shift
    df = spark.createDataFrame(vals, "v long, early boolean")
    got = sorted(
        tuple(r) for r in histogram_drift(df, "v", "early").collect()
    )
    assert got == _mirror_drift(vals)


def test_histogram_drift_null_accounting_row(spark):
    # NULL value / NULL flag rows land in the bin=-1 accounting row
    # (never silently dropped), excluded from the shares
    vals = [(10, True), (20, False), (None, True), (30, None),
            (None, None)]
    df = spark.createDataFrame(vals, "v long, early boolean")
    got = sorted(
        (tuple(r) for r in histogram_drift(df, "v", "early").collect()),
        key=lambda t: t[0],
    )
    assert got == _mirror_drift(vals)
    assert got[0] == (-1, 1, 2, None, None, None)
    assert sum(r[1] + r[2] for r in got) == len(vals)


def test_histogram_drift_single_value_domain(spark):
    # vmax == vmin: everything lands in bin 0, no div-by-zero
    df = spark.createDataFrame(
        [(5, True), (5, False), (5, False)], "v long, early boolean"
    )
    got = {r["bin"]: (r["a_n"], r["b_n"]) for r in
           histogram_drift(df, "v", "early").collect()}
    assert got[0] == (1, 2) and all(
        got[b] == (0, 0) for b in range(1, 16)
    )
