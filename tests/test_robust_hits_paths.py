"""Units for MAD outlier days, HITS scores, and session path mining."""

from __future__ import annotations

import datetime as dt

import pytest

from ocr_translation_spark.functions.graph import hits_scores
from ocr_translation_spark.functions.paths import session_paths
from ocr_translation_spark.functions.robust import mad_outlier_days


def _ev(day, h, user, typ, eid):
    return (eid, dt.datetime(2024, 1, day, h), user, typ)


_EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def test_mad_flags_only_the_spike(spark):
    # series 'a': volumes 2,2,2,2,50 over five days -> med 2, MAD 0,
    # only the spike day deviates; 'b' constant -> nothing flagged
    rows = []
    eid = 0
    for day, n in [(1, 2), (2, 2), (3, 2), (4, 2), (5, 50)]:
        for _ in range(n):
            rows.append(_ev(day, 1, 1, "a", eid))
            eid += 1
    for day in range(1, 6):
        for _ in range(3):
            rows.append(_ev(day, 2, 2, "b", eid))
            eid += 1
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {
        (r.series, r.day): r for r in mad_outlier_days(df, k=3).collect()
    }
    assert out[("a", "2024-01-05")].is_outlier
    assert out[("a", "2024-01-05")].med == 2
    assert out[("a", "2024-01-05")].mad == 0
    assert out[("a", "2024-01-05")].deviation == 48
    assert not any(
        r.is_outlier for k, r in out.items() if k != ("a", "2024-01-05")
    )
    assert out[("b", "2024-01-03")].n_events == 3


def test_mad_low_median_is_rank_selected(spark):
    # even day count: volumes 1,2,3,4 -> LOW median 2 (never 2.5)
    rows = []
    eid = 0
    for day, n in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for _ in range(n):
            rows.append(_ev(day, 1, 1, "a", eid))
            eid += 1
    out = mad_outlier_days(
        spark.createDataFrame(rows, _EV_SCHEMA), k=3
    ).collect()
    assert {r.med for r in out} == {2}
    # deviations |1-2|,|2-2|,|3-2|,|4-2| = 0,1,1,2 -> low median 1
    assert {r.mad for r in out} == {1}


def _hits_reference(edges, nodes, iterations=2, scale=1_000_000):
    from collections import defaultdict

    auth = {v: scale for v in {d for _, d in edges}}
    hub = {}
    for _ in range(iterations):
        raw = defaultdict(int)
        for s, d in edges:
            if d in auth:
                raw[s] += auth[d]
        mx = max(raw.values())
        hub = {u: (r * scale) // mx for u, r in raw.items()}
        raw = defaultdict(int)
        for s, d in edges:
            if s in hub:
                raw[d] += hub[s]
        mx = max(raw.values())
        auth = {v: (r * scale) // mx for v, r in raw.items()}
    return {
        n: (hub.get(n, 0), auth.get(n, 0)) for n in nodes
    }


def test_hits_hub_and_authority_separate(spark):
    # 0 and 1 are pure hubs pointing at {2,3}; 2 also points at 3.
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    nodes = [0, 1, 2, 3, 9]  # 9 is isolated -> (0, 0)
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    got = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in hits_scores(e, n, iterations=2).collect()
    }
    assert got == _hits_reference(edges, nodes)
    # structure: 0/1 are the best hubs (score = scale), 3 the best
    # authority; the isolated node scores zero on both axes
    assert got[0][0] == 1_000_000 and got[1][0] == 1_000_000
    assert got[3][1] == 1_000_000
    assert got[9] == (0, 0)
    assert got[3][0] == 0  # 3 points at nothing -> no hub score


def test_hits_matches_reference_on_pseudorandom_graph(spark):
    import hashlib

    n = 40
    edges = sorted(
        {
            (i, int(hashlib.sha256(f"{i}:{k}".encode()).hexdigest()[:8], 16) % n)
            for i in range(n)
            for k in (1, 2, 3)
        }
        - {(i, i) for i in range(n)}
    )
    nodes = list(range(n))
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(x,) for x in nodes], "node long")
    got = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in hits_scores(e, nd, iterations=2).collect()
    }
    assert got == _hits_reference(edges, nodes)


def test_session_paths_prefix_and_counts(spark):
    rows = [
        # user 1 day 1: a,b,c,d,e -> prefix a>b>c>d (depth 4)
        _ev(1, 1, 1, "a", 1), _ev(1, 2, 1, "b", 2), _ev(1, 3, 1, "c", 3),
        _ev(1, 4, 1, "d", 4), _ev(1, 5, 1, "e", 5),
        # user 2 day 1: same opening -> same path
        _ev(1, 1, 2, "a", 6), _ev(1, 2, 2, "b", 7), _ev(1, 3, 2, "c", 8),
        _ev(1, 4, 2, "d", 9),
        # user 1 day 2: short session a>b (depth 2)
        _ev(2, 1, 1, "a", 10), _ev(2, 2, 1, "b", 11),
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    got = {
        r.path: (r.depth, r.n_sessions)
        for r in session_paths(df, depth=4).collect()
    }
    assert got == {"a>b>c>d": (4, 2), "a>b": (2, 1)}


def test_session_paths_equal_ts_tie_break(spark):
    rows = [_ev(1, 1, 1, "b", 2), _ev(1, 1, 1, "a", 1)]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    got = [r.path for r in session_paths(df, depth=4).collect()]
    assert got == ["a>b"]


def test_session_paths_rejects_bad_depth(spark):
    df = spark.createDataFrame([_ev(1, 1, 1, "a", 1)], _EV_SCHEMA)
    with pytest.raises(ValueError):
        session_paths(df, depth=0)
