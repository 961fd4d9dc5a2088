"""Unit tests for running-distinct growth accounting
(functions/growth.py): pure-Python reference parity on randomized
multi-visit data, partition invariance, and the day-with-no-new-users
edge (returning-only days)."""

import datetime
import random

from ocr_translation_spark.functions.growth import cumulative_new_users


def _ref(rows):
    days = {}
    for u, ts in rows:
        if u is None or ts is None:
            continue
        days.setdefault(ts.strftime("%Y-%m-%d"), set()).add(u)
    first = {}
    for d in sorted(days):
        for u in days[d]:
            first.setdefault(u, d)
    seen, out = set(), {}
    for d in sorted(days):
        new = sum(1 for u in days[d] if first[u] == d)
        seen |= days[d]
        out[d] = (len(days[d]), new, len(days[d]) - new, len(seen))
    return out


def _got(df):
    return {
        r["day"]: (
            r["dau"], r["new_users"], r["returning_users"],
            r["cum_users"],
        )
        for r in df.collect()
    }


def _mk(rng, n, n_users=25, n_days=12):
    base = datetime.datetime(2024, 3, 1)
    return [
        (
            rng.randrange(n_users),
            base + datetime.timedelta(
                days=rng.randrange(n_days),
                seconds=rng.randrange(86400),
            ),
        )
        for _ in range(n)
    ]


def test_matches_python_reference(spark):
    rng = random.Random(11)
    rows = _mk(rng, 400) + [(None, datetime.datetime(2024, 3, 2)),
                            (3, None)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    assert _got(cumulative_new_users(df)) == _ref(rows)


def test_partition_invariance_and_returning_only_day(spark):
    base = datetime.datetime(2024, 3, 1)
    # day 0: users 1,2; day 1: users 1,2 again (zero new)
    rows = [
        (1, base), (2, base),
        (1, base + datetime.timedelta(days=1)),
        (2, base + datetime.timedelta(days=1)),
        (2, base + datetime.timedelta(days=1, hours=2)),
        (3, base + datetime.timedelta(days=2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    a = _got(cumulative_new_users(df.coalesce(1)))
    b = _got(cumulative_new_users(df.repartition(7)))
    assert a == b
    assert a["2024-03-02"] == (2, 0, 2, 2)  # returning-only day
    assert a["2024-03-03"] == (1, 1, 0, 3)
