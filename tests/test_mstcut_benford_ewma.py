"""single_linkage_cut, benford_deviation, ewma_daily vs pure-Python
mirrors."""

from __future__ import annotations

import datetime as dt
import random

from ocr_translation_spark.functions.audit import (
    BENFORD_PPM,
    benford_deviation,
)
from ocr_translation_spark.functions.mst import single_linkage_cut
from ocr_translation_spark.functions.timeseries import ewma_daily

# ------------------------------------------------- single-linkage cut


def _mirror_cut(edges, n_cuts, extra_nodes=()):
    norm = sorted(
        {(w, min(u, v), max(u, v)) for u, v, w in edges if u != v}
    )
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    msf = []
    for w, u, v in norm:
        if find(u) != find(v):
            parent[find(u)] = find(v)
            msf.append((u, v, w))
    cut = sorted(msf, key=lambda e: (e[2], e[0], e[1]))[::-1][:n_cuts]
    kept = [e for e in msf if e not in cut]
    parent = {}
    for u, v, _ in kept:
        parent[find(u)] = find(v)
    nodes = {n for u, v, _ in msf for n in (u, v)} | set(extra_nodes)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {frozenset(c) for c in comp.values()}


def test_cut_splits_into_expected_clusters(spark):
    # path 0-1-2-3-4-5 with weights 1,9,2,8,3: cutting 2 heaviest
    # (9 then 8) yields {0,1},{2,3},{4,5}
    edges = [(0, 1, 1), (1, 2, 9), (2, 3, 2), (3, 4, 8), (4, 5, 3)]
    df = spark.createDataFrame(edges, "u long, v long, w long")
    got = single_linkage_cut(df, n_cuts=2).collect()
    clusters = {}
    for r in got:
        clusters.setdefault(r["cluster_id"], set()).add(r["node"])
    assert {frozenset(c) for c in clusters.values()} == _mirror_cut(
        edges, 2
    )


def test_cut_randomized_with_isolated_nodes(spark):
    rng = random.Random(13)
    edges = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(1, 30))
        for _ in range(40)
    ]
    df = spark.createDataFrame(edges, "u long, v long, w long")
    iso = spark.createDataFrame([(97,), (98,)], "node long")
    got = single_linkage_cut(df, n_cuts=3, nodes=iso).collect()
    clusters = {}
    for r in got:
        clusters.setdefault(r["cluster_id"], set()).add(r["node"])
    assert {frozenset(c) for c in clusters.values()} == _mirror_cut(
        edges, 3, extra_nodes=(97, 98)
    )
    assert {97} in [set(c) for c in clusters.values()]


# ----------------------------------------------------------- Benford


def test_benford_planted_distribution(spark):
    rng = random.Random(5)
    # amounts whose first digits follow a known skew + sub-1 rows
    amounts = (
        [float(f"1{rng.randrange(100):02d}") for _ in range(60)]
        + [float(f"9{rng.randrange(10)}") for _ in range(10)]
        + [0.25, 0.9]  # < 1: digit-0 accounting row
    )
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    rows = {r["digit"]: r for r in
            benford_deviation(df, "amt").collect()}
    assert rows[0]["n"] == 2 and rows[0]["obs_ppm"] is None
    assert rows[1]["n"] == 60 and rows[9]["n"] == 10
    total = 70
    assert rows[1]["obs_ppm"] == 60 * 1_000_000 // total
    assert rows[1]["exp_ppm"] == BENFORD_PPM[0]
    assert rows[1]["dev_ppm"] == abs(
        60 * 1_000_000 // total - BENFORD_PPM[0]
    )
    assert rows[2]["n"] == 0 and rows[2]["obs_ppm"] == 0
    assert len(rows) == 10


# -------------------------------------------------------------- EWMA


def _mirror_ewma(day_counts, den=4, scale=10**6):
    days = sorted(day_counts)
    lo, hi = days[0], days[-1]
    xs = [day_counts.get(d, 0) * scale for d in range(lo, hi + 1)]
    s = xs[0]
    for x in xs[1:]:
        d = x - s
        s += (d // den) if d >= 0 else -((-d) // den)
    return hi - lo + 1, day_counts[hi], s


def test_ewma_matches_mirror_with_gaps(spark):
    rng = random.Random(7)
    rows, expected = [], {}
    base = dt.date(2024, 1, 1)
    for key in ("a", "b"):
        counts = {}
        for d in rng.sample(range(30), 8):
            c = rng.randint(1, 9)
            counts[d] = c
            for i in range(c):
                rows.append(
                    (key, dt.datetime.combine(
                        base + dt.timedelta(days=d),
                        dt.time(hour=i % 24),
                    ))
                )
        day0 = (base - dt.date(1970, 1, 1)).days
        expected[key] = _mirror_ewma(
            {day0 + d: c for d, c in counts.items()}
        )
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        r["k"]: (r["n_days"], r["last_n"], r["ewma_scaled"])
        for r in ewma_daily(df, "k", "ts").collect()
    }
    assert got == expected


def test_ewma_single_day_key(spark):
    df = spark.createDataFrame(
        [("k", dt.datetime(2024, 3, 1, 5))], "k string, ts timestamp"
    )
    r = ewma_daily(df, "k", "ts").collect()[0]
    assert (r["n_days"], r["last_n"], r["ewma_scaled"]) == (
        1,
        1,
        1_000_000,
    )
    assert r["last_day"] == "2024-03-01"
