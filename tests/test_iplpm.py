"""Longest-prefix-match CIDR enrichment: hand-computed LPM answers,
override chains, the duplicate-block guard, /32 host routes, and a
pure-Python brute-force parity sweep over the registered query's
planted block table."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from ocr_translation_spark.functions.iplpm import lpm_enrich


def _ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


def _blocks(spark, rows):
    return spark.createDataFrame(
        [Row(prefix_len=ln, prefix_bits=bits, owner=o) for ln, bits, o in rows],
        "prefix_len int, prefix_bits long, owner string",
    )


def _facts(spark, ips):
    return spark.createDataFrame(
        [Row(fid=i, ip32=v) for i, v in enumerate(ips)],
        "fid int, ip32 long",
    )


BLOCKS = [
    (8, _ip(10, 0, 0, 0), "A"),
    (16, _ip(10, 20, 0, 0), "B"),
    (24, _ip(10, 20, 30, 0), "C"),
    (32, _ip(10, 20, 30, 40), "D"),
    (8, _ip(192, 0, 0, 0), "E"),
]


def test_longest_match_overrides_covering_blocks(spark):
    got = {
        r["fid"]: (r["matched_owner"], r["matched_len"])
        for r in lpm_enrich(
            _facts(
                spark,
                [
                    _ip(10, 20, 30, 40),  # /32 host route wins
                    _ip(10, 20, 30, 41),  # /24 beats /16 and /8
                    _ip(10, 20, 99, 1),  # /16 beats /8
                    _ip(10, 99, 0, 1),  # /8 only
                    _ip(192, 1, 2, 3),  # disjoint /8
                    _ip(172, 0, 0, 1),  # no block covers it
                    None,  # NULL address passes through
                ],
            ),
            _blocks(spark, BLOCKS),
        ).collect()
    }
    assert got == {
        0: ("D", 32),
        1: ("C", 24),
        2: ("B", 16),
        3: ("A", 8),
        4: ("E", 8),
        5: (None, None),
        6: (None, None),
    }


def test_duplicate_blocks_raise(spark):
    dup = BLOCKS + [(24, _ip(10, 20, 30, 0), "X")]
    with pytest.raises(ValueError, match="duplicate"):
        lpm_enrich(_facts(spark, [0]), _blocks(spark, dup))


def test_empty_block_table_leaves_all_unmatched(spark):
    out = lpm_enrich(
        _facts(spark, [_ip(10, 20, 30, 40)]),
        _blocks(spark, []),
    ).collect()
    assert [(r["matched_owner"], r["matched_len"]) for r in out] == [
        (None, None)
    ]


def test_out_of_range_prefix_len_raises(spark):
    with pytest.raises(ValueError, match="out of"):
        lpm_enrich(
            _facts(spark, [0]), _blocks(spark, [(33, 0, "A")])
        )


def test_broadcast_hash_joins_no_shuffle(spark):
    """The enrichment itself must add ZERO exchanges: every per-length
    join is a broadcast HASH join on the truncated address (a
    theta-join would show BroadcastNestedLoopJoin here)."""
    out = lpm_enrich(
        _facts(spark, [_ip(10, 20, 30, 40)] * 10),
        _blocks(spark, BLOCKS),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning" not in plan


def test_parity_with_python_reference_on_planted_blocks(spark):
    """Brute-force Python LPM over the registered query's planted
    nested block table agrees with the join-chain operator for every
    sha-derived event address at unit scale."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    qdf = entry_mod.queries()["ip_lpm_enrich"](spark, sf).collect()

    # rebuild blocks + ips in plain Python
    import hashlib

    blocks = []
    for n in range(25):
        blocks.append((8, n << 24, f"NATION_{n}"))
        blocks.append(
            (16, ((n * 7) % 25) << 24 | (n << 16), f"NATION_{n}")
        )
        j = (n * 3) % 25
        blocks.append(
            (
                24,
                ((j * 7) % 25) << 24 | (j << 16) | ((n % 4) << 8),
                f"NATION_{n}",
            )
        )
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    agg = {}
    for r in ev:
        h = int(
            hashlib.sha256(str(r["event_id"]).encode()).hexdigest()[:8],
            16,
        )
        ip = (
            (((h >> 24) & 31) << 24)
            | (((h >> 16) & 31) << 16)
            | (((h >> 8) & 3) << 8)
            | (h & 255)
        )
        best = ("(unmatched)", 0)
        for ln, bits, owner in blocks:
            if (ip >> (32 - ln)) << (32 - ln) == bits and ln > best[1]:
                best = (owner, ln)
        key = best
        cnt, users = agg.get(key, (0, set()))
        users.add(r["user_id"])
        agg[key] = (cnt + 1, users)
    expect = {
        k: (cnt, len(users)) for k, (cnt, users) in agg.items()
    }
    got = {
        (r["owner"], r["prefix_len"]): (r["n_events"], r["n_users"])
        for r in qdf
    }
    assert got == expect
